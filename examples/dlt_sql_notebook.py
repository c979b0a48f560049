#!/usr/bin/env python
"""Run a DLT SQL notebook verbatim on this engine — executable
documentation for the SQL-text pipeline surface (`4  Delta Live Tables
(SQL).sql` parity): ``CREATE [TEMPORARY] [INCREMENTAL] LIVE TABLE``
with constraint clauses, ``cloud_files`` incremental ingestion,
direct-path scans, ``STREAM(live.x)`` references, and a gold table
declared without ``AS``.

Run: ``python examples/dlt_sql_notebook.py``.  The script lands a batch
of sales JSON, executes the notebook text twice (the second run picks
up only the newly landed file — Auto-Loader-style), and prints the gold
table plus the expectation metrics from the event log.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


NOTEBOOK = """
-- Databricks-style DLT SQL notebook: cells separated by COMMAND markers
-- COMMAND ----------
CREATE INCREMENTAL LIVE TABLE bronze_sales
TBLPROPERTIES ("quality" = "bronze")
COMMENT "raw sales feed"
AS
SELECT * FROM cloud_files( '${data_path}/landing' , "json")

-- COMMAND ----------
CREATE TEMPORARY LIVE TABLE dim_stores
COMMENT "store dimension - pipeline-local"
AS
SELECT * FROM json.`${data_path}/stores.json`;

-- COMMAND ----------
CREATE INCREMENTAL LIVE TABLE silver_sales (
  CONSTRAINT `store id is 5 characters` EXPECT (length(store) = 5) ON VIOLATION DROP ROW,
  CONSTRAINT `amount present` EXPECT (amount IS NOT NULL)
)
COMMENT "clean sales" AS
  SELECT sale_id, store, amount from STREAM(live.bronze_sales)

-- COMMAND ----------
CREATE LIVE TABLE gold_country_sales
select d.country_code, count(*) as n_sales, CAST(sum(amount) AS BIGINT) as total
from live.silver_sales s join live.dim_stores d on s.store = d.id
group by d.country_code
"""


def main() -> dict:
    from dataengineeringworkshop_spark.engine import Lakehouse

    root = Path(tempfile.mkdtemp(prefix="dew_dlt_example_"))
    (root / "landing").mkdir()
    with open(root / "landing" / "batch1.json", "w") as f:
        for i in range(40):
            f.write(json.dumps({
                "sale_id": f"s{i:03d}",
                "store": ["SYD01", "MEL01", "X"][i % 3],
                "amount": 5 + i,
            }) + "\n")
    with open(root / "stores.json", "w") as f:
        for sid, cc in [("SYD01", "AUS"), ("MEL01", "AUS"), ("AKL01", "NZL")]:
            f.write(json.dumps({"id": sid, "country_code": cc}) + "\n")

    lh = Lakehouse(str(root / "lake"))
    pipe = lh.pipeline_from_sql(
        "apj_dlt", NOTEBOOK,
        params={"data_path": str(root)},
        schema_hints={"bronze_sales": "amount long"},
    )
    r1 = pipe.run(lh.spark)
    print("run 1:", {k: v.get("rows", v.get("rows_appended")) for k, v in r1.items()})

    # land one more file; the rerun ingests ONLY the unseen file
    with open(root / "landing" / "batch2.json", "w") as f:
        for i in range(10):
            f.write(json.dumps(
                {"sale_id": f"n{i}", "store": "MEL01", "amount": 100}) + "\n")
    r2 = pipe.run(lh.spark)
    print("run 2 (incremental):", r2["bronze_sales"])

    gold = pipe.read_dataset(lh.spark, "gold_country_sales")
    gold.show()
    metrics = {
        m["name"]: m for m in r2["silver_sales"]["expectations"]
    }
    print("expectation metrics:", metrics)
    return {
        "gold": {r.country_code: (r.n_sales, r.total) for r in gold.collect()},
        "appended_run2": r2["bronze_sales"]["rows_appended"],
        "metrics": metrics,
    }


if __name__ == "__main__":
    main()
