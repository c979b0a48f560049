"""operators.fanout — the round-13 scale-adaptive map-parallelism repair.

Pins the two properties the optimization relies on:

1. the GATE: a frame whose planned parallelism is already >= the core
   count is returned untouched (no repartition exchange added — the
   production-scale no-op), while a single-partition scan is widened to
   the session's default parallelism;
2. result identity: fan-out changes row placement only, never content.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringworkshop_spark.operators.fanout import fan_out

SF = "/root/testdata/sf0.001"


def test_fanout_widens_single_partition_scan(spark):
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, SF, "documents")
    assert d.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    out = fan_out(d)
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # content identical (order-insensitive)
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in d.select("doc_id").collect()
    )


def test_fanout_is_noop_when_already_wide(spark):
    wide = spark.range(0, 1000, 1, spark.sparkContext.defaultParallelism)
    out = fan_out(wide)
    # same object back — no exchange added on the production-shaped input
    assert out is wide


def test_fanout_respects_explicit_target(spark):
    narrow = spark.range(0, 100, 1, 1)
    assert fan_out(narrow, target=4).rdd.getNumPartitions() == 4


def test_fanned_word_vocab_matches_unfanned_counts(spark):
    """The BPE vocabulary (the fan-out's heaviest consumer) is a pure
    aggregate — fanning the explode must not change a single count."""
    from dataengineeringworkshop_spark.llmops.bpe import _word_vocab
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, SF, "documents")
    got = {r.w: r.weight for r in _word_vocab(d, "text").collect()}
    # independent reference: plain (unfanned) explode + groupBy
    ref = {
        r.w: r.weight
        for r in d.select(
            F.explode(F.split(F.lower("text"), " ")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("weight"))
        .collect()
    }
    assert got == ref
