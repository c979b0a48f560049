"""Partition-layout invariance of the determinism contract.

The driver hashes query outputs bit-for-bit against DuckDB, so results
must not depend on HOW Spark happened to partition the work: a
different ``spark.sql.shuffle.partitions`` or different input-split
sizing must yield byte-identical values.  The contract
(plans/registry.py) earns this by construction — DECIMAL-accumulated
float sums, ROUND(...,6) on derived chains, integer arithmetic, unique
tiebreakers — but nothing previously EXERCISED it: every oracle run
used the session default (32 shuffle partitions, default split
packing), so an order-dependent float accumulation (plain SUM(double),
a first()-without-order, a float fold sensitive to partition count)
would pass the whole suite and still flake on a cluster.

This suite re-runs the float-heaviest oracle-paired representatives —
one per float-emitting family — under a HOSTILE layout: a prime,
non-default shuffle-partition count and tiny input splits (every
parquet file fractured into many read partitions).  Values must still
match DuckDB exactly.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connection

# one representative per float-emitting family: dsum/davg aggregation,
# join+agg breadth, sequential EWMA chain, iterative power method,
# TF-IDF log weights, bigram log-prob sums, pooled z statistic,
# histogram-walk median, window moments, cosine similarity, MV delta
# merge, chi-square
FLOAT_REPS = (
    "flagship_region_month_revenue",
    "rb_join_agg_breadth",
    "ts_ewma_dyadic",
    "sim_power_iteration_pc1",
    "t_tfidf_topk",
    "cp_bigram_lm_score",
    "e_two_proportion_ztest",
    "a17_exact_median_twopass",
    "e_rolling_zscore_anomaly",
    "sd_semantic_dedup",
    "mv_incremental_agg",
    "e_chi_square_independence",
)

HOSTILE_CONFS = {
    "spark.sql.shuffle.partitions": "7",  # prime, != the 32 default
    "spark.sql.files.maxPartitionBytes": "65536",  # fracture every scan
    "spark.sql.files.openCostInBytes": "0",  # don't re-pack the splits
}


@pytest.fixture(scope="module")
def hostile_layout(spark):
    saved = {k: spark.conf.get(k) for k in HOSTILE_CONFS}
    for k, v in HOSTILE_CONFS.items():
        spark.conf.set(k, v)
    try:
        yield spark
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", FLOAT_REPS)
def test_values_survive_hostile_partitioning(hostile_layout, duck, name):
    from dataengineeringworkshop_spark.plans.registry import load_all

    spec = load_all()[name]
    df = spec.fn(hostile_layout, SF_SMOKE)
    problems = compare(df, duck, spec.oracle, name)
    assert not problems, "\n".join(problems)
