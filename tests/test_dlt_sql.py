"""DLT SQL-text front-end: the reference's `4  Delta Live Tables
(SQL).sql` surface parsed and executed on the pipeline runner."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.pipeline.dlt_sql import (
    parse_statement,
    pipeline_from_sql,
)

_REF_N4 = "/root/reference/4  Delta Live Tables (SQL).sql"


def test_parse_statement_full_header():
    spec = parse_statement(
        'CREATE INCREMENTAL LIVE TABLE silver_x (\n'
        "  CONSTRAINT `Location has to be 5 characters long` EXPECT (length(store_id) = 5),\n"
        "  CONSTRAINT `state ok` EXPECT (s IN ('A', 'B')) ON VIOLATION DROP ROW,\n"
        "  CONSTRAINT hard_stop EXPECT (v > 0) ON VIOLATION FAIL UPDATE\n"
        ')\nTBLPROPERTIES ("quality" = "silver")\n'
        'COMMENT "Silver table" AS\n  SELECT * from STREAM(live.bronze_x)'
    )
    assert spec["name"] == "silver_x" and spec["incremental"]
    assert not spec["temporary"] and not spec["view"]
    assert spec["properties"] == {"quality": "silver"}
    assert spec["comment"] == "Silver table"
    e = spec["expectations"]
    assert [x.mode for x in e] == ["warn", "drop", "fail"]
    assert e[0].name == "Location has to be 5 characters long"
    assert e[1].predicate == "s IN ('A', 'B')"
    assert spec["sql"].lower().startswith("select")


def test_parse_statement_no_as_and_temporary():
    # gold tables in the reference omit AS entirely (N4:177-190)
    spec = parse_statement(
        "CREATE LIVE TABLE gold_x\nselect a, count(*) n from live.s group by a"
    )
    assert spec["sql"].startswith("select a")
    spec2 = parse_statement(
        'CREATE TEMPORARY LIVE TABLE dim_x\nTBLPROPERTIES ("quality" = "lookup")\n'
        'COMMENT "dim" AS SELECT * FROM json.`/tmp/x.json`'
    )
    assert spec2["temporary"] and not spec2["incremental"]


def test_parse_rejects_out_of_surface():
    with pytest.raises(ValueError, match="not in the DLT SQL surface"):
        parse_statement("CREATE TABLE plain AS SELECT 1")
    with pytest.raises(ValueError, match="expected SELECT"):
        parse_statement("CREATE LIVE TABLE x AS DELETE FROM y")


@pytest.mark.skipif(not os.path.exists(_REF_N4), reason="reference not present")
def test_reference_notebook_parses_verbatim():
    """Every CREATE statement of the reference's DLT SQL notebook parses
    into the exact dataset specs its prose describes."""
    from dataengineeringworkshop_spark.pipeline.dlt_sql import _strip_notebook

    text = open(_REF_N4).read().replace("${mypipeline.data_path}", "demo")
    specs = [parse_statement(s) for s in _strip_notebook(text)]
    by_name = {s["name"]: s for s in specs}
    assert len(specs) == 9  # bronze, 3 dims, 2 silvers, 3 golds
    assert by_name["bronze_sales_dlt"]["incremental"]
    assert by_name["dim_users_dlt"]["temporary"]
    assert by_name["dim_products_dlt"]["temporary"] is False
    silver = by_name["silver_sales_dlt"]
    assert silver["incremental"] and len(silver["expectations"]) == 2
    assert all(e.mode == "warn" for e in silver["expectations"])
    items = by_name["silver_sale_items_dlt"]
    assert len(items["expectations"]) == 1
    assert "posexplode" in items["sql"]
    assert by_name["country_sales_dlt"]["sql"].startswith("select")
    assert by_name["user_profile_dlt"]["comment"].startswith("All current")
    assert by_name["bronze_sales_dlt"]["properties"] == {"quality": "bronze"}


def test_dlt_sql_pipeline_end_to_end(spark, tmp_path):
    """A workshop-shaped DLT SQL script (cloud_files bronze, direct-path
    temp dim, constraint-gated incremental silver via STREAM, gold
    without AS) runs on the runner: metrics recorded, drops applied,
    incremental rerun picks up only new files."""
    landing = tmp_path / "landing"
    landing.mkdir()
    rows = [
        {"sale_id": f"s{i:03d}", "store": ["SYD01", "MEL01", "BAD"][i % 3], "amount": i}
        for i in range(30)
    ]
    with open(landing / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(tmp_path / "stores.json", "w") as f:
        for sid, cc in [("SYD01", "AUS"), ("MEL01", "AUS"), ("BAD", "XX")]:
            f.write(json.dumps({"id": sid, "country_code": cc}) + "\n")

    script = f"""
-- COMMAND ----------
CREATE INCREMENTAL LIVE TABLE bronze_dlt
TBLPROPERTIES ("quality" = "bronze")
COMMENT "raw feed"
AS
SELECT *
FROM
cloud_files( '{landing}' , "json")

-- COMMAND ----------
CREATE TEMPORARY LIVE TABLE dim_stores_dlt
COMMENT "store dim - not published"
AS
SELECT * FROM json.`{tmp_path / "stores.json"}`;

-- COMMAND ----------
CREATE INCREMENTAL LIVE TABLE silver_dlt (
  CONSTRAINT `store id is 5 chars` EXPECT (length(store) = 5) ON VIOLATION DROP ROW,
  CONSTRAINT `amount known` EXPECT (amount IS NOT NULL)
)
COMMENT "clean sales" AS
  SELECT sale_id, store, amount from STREAM(live.bronze_dlt)

-- COMMAND ----------
CREATE LIVE TABLE gold_dlt
select d.country_code, count(*) as n_sales, CAST(sum(amount) AS BIGINT) as total
from live.silver_dlt s join live.dim_stores_dlt d on s.store = d.id
group by d.country_code
"""
    p = pipeline_from_sql(
        "dltsql", str(tmp_path / "pl"), script,
        schema_hints={"bronze_dlt": "amount long"},
    )
    r1 = p.run(spark)
    assert r1["bronze_dlt"]["rows_appended"] == 30
    # drop-mode constraint removed the 3-char stores, warn recorded metrics
    m = {x["name"]: x for x in r1["silver_dlt"]["expectations"]}
    assert m["store id is 5 chars"]["dropped_records"] == 10
    assert m["amount known"]["failed_records"] == 0
    gold = {r.country_code: (r.n_sales, r.total)
            for r in p.read_dataset(spark, "gold_dlt").collect()}
    assert set(gold) == {"AUS"} and gold["AUS"][0] == 20
    # incremental rerun: one new file, only its rows enter bronze/silver
    with open(landing / "batch2.json", "w") as f:
        for i in range(6):
            f.write(json.dumps({"sale_id": f"n{i}", "store": "SYD01", "amount": 100}) + "\n")
    r2 = p.run(spark)
    assert r2["bronze_dlt"]["rows_appended"] == 6
    gold2 = p.read_dataset(spark, "gold_dlt")
    assert gold2.filter(F.col("country_code") == "AUS").first().n_sales == 26


def test_dlt_sql_comment_inside_literal_preserved(spark, tmp_path):
    """A '--' inside a COMMENT string literal is data; a trailing
    '-- note' after the statement is stripped."""
    from dataengineeringworkshop_spark.pipeline.dlt_sql import pipeline_from_sql

    (tmp_path / "d.json").write_text('{"v": 1}\n{"v": 2}\n')
    script = f"""
CREATE LIVE TABLE gated
COMMENT "range a--b check"  -- trailing note; should vanish
AS SELECT * FROM json.`{tmp_path / "d.json"}`
"""
    p = pipeline_from_sql("qc", str(tmp_path / "pl"), script)
    assert p.datasets["gated"].comment == "range a--b check"
    p.run(spark)
    assert p.read_dataset(spark, "gated").count() == 2
