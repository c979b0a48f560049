#!/usr/bin/env python
"""Measure the round-11 file-pruned copy-on-write win: a selective
UPDATE (0.1% of keys) against an sf0.1-orders versioned table, pruned
path vs forced full rewrite, plus bytes rewritten.  Prints one JSON
line; the committed number lands in SCALE.md."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _dir_bytes(path: str, rel_dirs: list[str]) -> int:
    total = 0
    for d in rel_dirs:
        p = os.path.join(path, d)
        if os.path.isdir(p):
            for fn in os.listdir(p):
                total += os.path.getsize(os.path.join(p, fn))
        elif os.path.isfile(p):
            total += os.path.getsize(p)
    return total


def main() -> None:
    from pyspark.sql import SparkSession

    from dataengineeringworkshop_spark.tables.versioned import VersionedTable

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("cow_rewrite_demo")
        .getOrCreate()
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n = orders.count()
    # a contiguous key range — the layout-correlated selective update
    # (late-arriving partition repair, backfill of one tenant/day) that
    # rewrite-set pruning exists for
    lo, hi = orders.selectExpr(
        "min(o_orderkey)", "max(o_orderkey)"
    ).collect()[0]
    cond = f"o_orderkey < {lo + (hi - lo) // 16}"  # ≈ 1/16 of the key span

    def fresh_table(nfiles: int) -> VersionedTable:
        t = VersionedTable(spark, tempfile.mkdtemp(prefix="dew_cowdemo_") + "/t")
        t.write(orders.repartitionByRange(nfiles, "o_orderkey"))
        return t

    out = {"sf_dir": SF_DIR, "rows": n, "condition": cond}
    # pruned path (16-file table; stats absent, probe uses pushdown only)
    t = fresh_table(16)
    t0 = time.perf_counter()
    t.update({"o_totalprice": "o_totalprice + 1"}, condition=cond)
    out["pruned_sec"] = round(time.perf_counter() - t0, 3)
    c = t._commits()[-1]
    out["files_rewritten"] = c.metrics.get("files_rewritten")
    out["files_carried"] = c.metrics.get("files_carried")
    new_dirs = [d for d in c.data_dirs if not d.endswith(".parquet")]
    out["bytes_rewritten"] = _dir_bytes(t.path, new_dirs)
    out["bytes_table"] = _dir_bytes(t.path, t._commits()[0].data_dirs)
    # stats-assisted pruned path: after OPTIMIZE ZORDER the commit log
    # carries per-file min/max, so the PROBE itself skips 15/16 files
    # before reading a row
    t3 = fresh_table(16)
    t3.optimize(zorder_by=["o_orderkey"], target_files=16)
    t0 = time.perf_counter()
    t3.update({"o_totalprice": "o_totalprice + 1"}, condition=cond)
    out["pruned_with_stats_sec"] = round(time.perf_counter() - t0, 3)
    c3 = t3._commits()[-1]
    out["files_rewritten_with_stats"] = c3.metrics.get("files_rewritten")
    out["probe_candidates_with_stats"] = len(
        t3.scan_files(version=c3.version - 1, where=cond)
    )
    # forced full rewrite (unconditional UPDATE with a CASE — the old
    # behavior for ANY update): same table shape, same touched rows
    t2 = fresh_table(16)
    t0 = time.perf_counter()
    t2.update({
        "o_totalprice": f"CASE WHEN {cond} THEN o_totalprice + 1 "
                        "ELSE o_totalprice END"
    })
    out["full_rewrite_sec"] = round(time.perf_counter() - t0, 3)
    c2 = t2._commits()[-1]
    out["bytes_rewritten_full"] = _dir_bytes(t2.path, c2.data_dirs)
    out["io_reduction"] = round(
        out["bytes_rewritten_full"] / max(out["bytes_rewritten"], 1), 1
    )
    # merge-on-read path (round 12): the same selective UPDATE via a
    # deletion vector writes ONLY the updated rows + a KB-scale sidecar
    # — all counters read straight from history(), now queryable
    t4 = fresh_table(16)
    t4.optimize(zorder_by=["o_orderkey"], target_files=16)
    t0 = time.perf_counter()
    t4.update({"o_totalprice": "o_totalprice + 1"}, condition=cond, mode="mor")
    out["mor_update_sec"] = round(time.perf_counter() - t0, 3)
    c4 = t4._commits()[-1]
    out["mor_rows_updated"] = c4.metrics.get("rows_updated")
    out["mor_bytes_added"] = c4.metrics.get("bytes_added")
    out["mor_io_reduction_vs_full"] = round(
        out["bytes_rewritten_full"] / max(out["mor_bytes_added"] or 0, 1), 1
    )
    out["mor_io_reduction_vs_pruned_cow"] = round(
        out["bytes_rewritten"] / max(out["mor_bytes_added"] or 0, 1), 1
    )
    # the scenario DVs exist for: a SCATTERED point update (one row per
    # ~file, layout-uncorrelated — GDPR erasure, late fact corrections).
    # File pruning can't help (every file holds a match), so COW
    # rewrites the whole table; MOR writes the matched rows + a sidecar.
    cond_s = "o_orderkey % 10000 = 1"
    t5 = fresh_table(16)
    t0 = time.perf_counter()
    t5.update({"o_totalprice": "o_totalprice + 1"}, condition=cond_s)
    out["scattered_cow_sec"] = round(time.perf_counter() - t0, 3)
    c5 = t5._commits()[-1]
    out["scattered_cow_files_rewritten"] = c5.metrics.get("files_rewritten")
    out["scattered_cow_bytes_rewritten"] = c5.metrics.get("bytes_rewritten")
    t6 = fresh_table(16)
    t0 = time.perf_counter()
    t6.update({"o_totalprice": "o_totalprice + 1"}, condition=cond_s, mode="mor")
    out["scattered_mor_sec"] = round(time.perf_counter() - t0, 3)
    c6 = t6._commits()[-1]
    out["scattered_mor_rows"] = c6.metrics.get("rows_updated")
    out["scattered_mor_bytes_added"] = c6.metrics.get("bytes_added")
    out["scattered_mor_io_reduction"] = round(
        (out["scattered_cow_bytes_rewritten"] or 0)
        / max(out["scattered_mor_bytes_added"] or 0, 1),
        1,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
