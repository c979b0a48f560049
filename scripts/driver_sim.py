#!/usr/bin/env python
"""Driver simulation — the /verify harness for this repo.

Mimics the external driver: fresh SparkSession with hostile defaults
(non-UTC timezone, no legacy confs), imports __spark_entry__ by file path,
runs entry() and a representative sample of queries() vs oracle_sql()
through DuckDB at sf0.01, comparing row sets exactly (floats via repr).
"""

from __future__ import annotations

import importlib.util
import sys

import duckdb
from pyspark.sql import SparkSession

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)
SAMPLE = [
    "flagship_region_month_revenue",
    "f2_from_unixtime",
    "e_hourly_type_stats",
    "sim_cosine_topk",
    "d_ngram_jaccard_pairs",
    "a5_group_by_expression",
    "ws_expectation_metrics",
    "w1_dedup_keep_latest",
    "tj_asof_click_view",
    "tj_sessionize_gap30",
    "tj_range_click_purchase",
    "sim_cosine_neardup",
    "st_windowed_event_counts",
    "vt_update_json_path",
    "ddl_ctas_lifecycle",
    "f15_schema_of_json",
    "cp_stratified_sample",
    "cp_split_assignment",
    "cp_bigram_lm_score",
    "cp_bm25_search",
    "sd_semantic_dedup",
    "sim_embed_quantize",
    "cl_kmeans_two_rounds",
    "pp_partition_pruned_events",
    "cp_corpus_pipeline",
    "vt_table_changes",
    "st_apply_changes_latest",
    "rag_chunk_topk",
    "ws_expectation_quarantine",
    "f19_date_arithmetic",
]


def norm(v):
    return repr(v) if isinstance(v, float) else str(v)


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    df = m.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "entry() returned no rows"
    print(f"entry rows: {len(rows)} schema: {df.columns}")

    qs, orc = m.queries(), m.oracle_sql()
    assert set(orc) <= set(qs), "oracle keys not subset of query keys"
    print(f"queries: {len(qs)} oracles: {len(orc)}")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    failures = []
    for name in SAMPLE:
        if name not in qs:
            continue
        sp = qs[name](spark, SF_DIR).toPandas()
        if name not in orc:
            print(f"{name}: rows-only ({len(sp)})")
            continue
        du = con.execute(orc[name]).fetchdf()
        cols = sorted(sp.columns)
        if cols != sorted(du.columns):
            failures.append(f"{name}: columns {cols} vs {sorted(du.columns)}")
            continue
        a = sorted(tuple(norm(v) for v in r) for r in sp[cols].itertuples(index=False, name=None))
        b = sorted(tuple(norm(v) for v in r) for r in du[cols].itertuples(index=False, name=None))
        ok = a == b
        print(f"{name}: rows {len(a)} match: {ok}")
        if not ok:
            failures.append(name)

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("DRIVER-SIM ALL OK")


if __name__ == "__main__":
    main()
