"""Scale-path guards for the semantic near-dup family: above their
thresholds, sd_semantic_dedup / sim_cosine_neardup must block on TRAINED
√N IVF cells (llmops.semdedup), and the within-cell pair space must be
bounded by the quantizer — the round-2 verdict's two scale-killers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_scale_nlist_grows_with_corpus():
    from dataengineeringworkshop_spark.llmops.semdedup import scale_nlist

    assert scale_nlist(0) == 8
    assert scale_nlist(100) == 10
    assert scale_nlist(1_000_000) == 1000
    # 100 TB of 1 KB docs ≈ 1e11 rows → ~316k cells, cell size ~316k:
    # pair work Σcell² ≈ N^1.5, not N²/const
    assert scale_nlist(10**11) == 316_227


def test_semantic_dedup_trained_path_flags_planted_dups(spark):
    from dataengineeringworkshop_spark.llmops.semdedup import (
        assign_trained_cells,
        semantic_dedup,
    )

    # 4 well-separated clusters of 30 vectors + one planted exact dup pair
    base = {0: [10.0, 0.0, 0.0], 1: [0.0, 10.0, 0.0], 2: [0.0, 0.0, 10.0], 3: [-10.0, 0.0, 0.0]}
    rows = []
    for i in range(120):
        c = i % 4
        jit = 0.01 * (i % 7)
        rows.append((i, [v + jit if j == 1 else v for j, v in enumerate(base[c])]))
    rows.append((1000, [10.0, 0.05, 0.0]))
    rows.append((1001, [10.0, 0.05, 0.0]))  # exact dup of 1000
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")

    out = semantic_dedup(df, "vec_id", "embedding", tau=0.999, nlist=4)
    got = {r.vec_id: (r.cell, r.is_dup) for r in out.collect()}
    assert len(got) == 122
    # the higher-id member of the planted exact-dup pair is marked
    assert got[1001][1] == 1
    assert got[1000][0] == got[1001][0]  # same trained cell
    assert set(v for _, v in got.values()) <= {0, 1}

    # bounded pair space: Σ cell² must be far below the all-pairs N²
    assigned = assign_trained_cells(df, "vec_id", "embedding", nlist=4)
    sizes = [r.n for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()]
    n = len(rows)
    assert sum(s * s for s in sizes) < n * n / 2
    assert len(sizes) > 1  # the quantizer actually split the space


def test_sd_semantic_dedup_routes_to_trained_quantizer(spark, monkeypatch):
    import dataengineeringworkshop_spark.plans.searchq as searchq

    monkeypatch.setattr(searchq, "SD_SCALE_THRESHOLD", 0)
    out = searchq.sd_semantic_dedup(spark, SF_SMOKE)
    assert out.columns == ["vec_id", "cell", "is_dup"]
    rows = out.collect()
    n = rows and len(rows)
    assert n == 500  # one row per embedding, scale path included
    # √500 → 22 trained cells requested; assert the blocking key really
    # has more than the 8 fixed seeds (the round-2 scale-killer)
    n_cells = len({r.cell for r in rows})
    assert n_cells > 8


def test_sim_cosine_neardup_routes_to_cell_blocking(spark, monkeypatch):
    import dataengineeringworkshop_spark.plans.simops as simops

    monkeypatch.setattr(simops, "NEARDUP_SCALE_THRESHOLD", 0)
    out = simops.sim_cosine_neardup(spark, SF_SMOKE)
    assert out.columns == ["id1", "id2", "label", "cosine"]
    rows = out.collect()
    for r in rows:
        assert r.id1 < r.id2
        assert r.cosine >= 0.3 - 1e-9


def test_thresholds_keep_driver_scale_on_oracle_path():
    """The driver runs at sf0.01 (500 embeddings) — both thresholds must
    keep that regime on the oracle-exact fixed-block path."""
    import dataengineeringworkshop_spark.plans.searchq as searchq
    import dataengineeringworkshop_spark.plans.simops as simops

    assert searchq.SD_SCALE_THRESHOLD >= 10_000
    assert simops.NEARDUP_SCALE_THRESHOLD >= 10_000


def test_knuth_bucket_no_overflow_at_64bit_ids(spark):
    """The split/sample hash ``((id % 1000000007) * 2654435761) % M`` must
    evaluate for ANY 64-bit id.  The unreduced form ``(id * K) % M``
    overflows long at id ≈ 3.5e9 — ANSI Spark raises, non-ANSI silently
    wraps to wrong buckets; either way the training split is broken at
    corpus scale.  Caught by the sf1 scaling smoke (offset keys ≥ 1e9).
    DuckDB must agree bit-for-bit: it is the driver's oracle engine."""
    import duckdb

    ids = [0, 1, 999_999_999, 3_500_000_000, 2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    frag = "((doc_id % 1000000007) * 2654435761) % 1000"
    got = {
        r.doc_id: r.bucket
        for r in df.selectExpr("doc_id", f"{frag} AS bucket").collect()
    }
    con = duckdb.connect()
    for i in ids:
        want = con.execute(
            f"SELECT (({i} % 1000000007) * 2654435761) % 1000"
        ).fetchone()[0]
        assert got[i] == want, (i, got[i], want)
    # regression: the UNREDUCED form must actually overflow for the big
    # ids (proving the guard is load-bearing, not decorative).  The
    # raise only happens under ANSI arithmetic — force it for this leg,
    # else a non-ANSI session would wrap silently and fail the raises
    # check as a false positive.
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception):
            df.selectExpr("(doc_id * 2654435761) % 1000 AS b").collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)


def test_knuth_multiplier_always_guarded_in_source():
    """Every occurrence of the Knuth multiplier in the package — including
    the plain-SQL strings that can't call registry.kbucket — must carry
    the % 1000000007 pre-reduction.  An unguarded copy reintroduces the
    int64 overflow this suite's other test proves is real."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "dataengineeringworkshop_spark"
    bad = []
    for py in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if "2654435761" not in line:
                continue
            ok = (
                "% 1000000007) * 2654435761" in line
                # pure comment lines only — a code line with a trailing
                # comment still needs the guard on its code part
                or line.lstrip().startswith("#")
            )
            if not ok:
                bad.append(f"{py.name}:{i}: {line.strip()}")
    assert not bad, "unguarded Knuth multiplier:\n" + "\n".join(bad)


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """AQE's skew-join mitigation — the runtime complement to the
    engine's explicit salting (pp_salted_skew_agg): a sort-merge join
    whose left side puts ~98% of rows on ONE key must come out of
    execution with the join marked skew=true and an AQEShuffleRead that
    split the hot partition.  Thresholds are lowered so the ~300k-row
    hot key trips them at test scale; broadcast is disabled on both
    planning paths so the join cannot dodge the shuffle."""
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "20000",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "10000",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 300_000, 1, 8)
            .select(F.lit(1).alias("k"), F.col("id").alias("payload"))
            .union(
                spark.range(0, 5_000, 1, 8).select(
                    (F.col("id") % 50 + 2).alias("k"), F.col("id").alias("payload")
                )
            )
        )
        right = spark.range(0, 60, 1, 4).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 305_000  # hot key matches k=1, rest 2..51
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
        assert "skewed" in plan, plan[:1500]  # the AQEShuffleRead split
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning — the join-driven complement to the
    static pruning pp_partition_pruned_events proves: a date-partitioned
    fact joined to a FILTERED dim must plan with a dynamicpruning
    subquery inside the scan's PartitionFilters, so only the dim's
    surviving dates are ever read.  At 100 TB this is the difference
    between scanning one day and scanning the table."""
    import contextlib
    import io

    from dataengineeringworkshop_spark.plans.tables import load_table

    e = load_table(spark, SF_SMOKE, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    e.write.partitionBy("event_date").mode("overwrite").parquet(
        str(tmp_path / "fact")
    )
    fact = spark.read.parquet(str(tmp_path / "fact"))
    dim = (
        e.select("event_date")
        .distinct()
        .filter(F.expr("day(event_date) = 5"))
    )
    j = fact.join(dim, "event_date")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        j.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "PartitionFilters" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Injected runtime bloom filter: with a selective filter on the
    orders side of lineitem⋈orders, the optimizer must plant a
    bloom_filter_agg on the build side and a might_contain guard on the
    probe-side scan — rows that cannot join die before the shuffle.
    Thresholds lowered to fire at test scale (the 10 GB default
    application-side bar is cluster-sized)."""
    import contextlib
    import io

    from dataengineeringworkshop_spark.plans.tables import load_table

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, SF_SMOKE, "lineitem")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            "o_orderstatus = 'F' AND o_totalprice > 100000"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
