"""Unit-scale pins for the cross-engine determinism defects the round-7
sf0.1/sf1 oracle sweeps surfaced (SCALE.md "sf1 sweep" section).  Each
test reconstructs the failure landscape with a handful of rows so the
regression fires in seconds, not at a 10x fixture:

1. rank ratios on exact decimal rounding ties (Spark ROUND is HALF_UP,
   DuckDB's is HALF_EVEN) -> ppm integers must agree;
2. cosine top-k rank ties between DISTINCT raw cosines that round equal
   -> tie-break by neighbor id, identically in both engines;
3. integer-moment accumulation on ~1e10-scale ids -> no decimal
   overflow, and covariance free of double-cancellation divergence.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_round_half_modes_differ_and_ppm_agrees(spark):
    """The premise (engines' ROUND disagrees on a decimal tie) and the
    contract's remedy (FLOOR(x*1e6+0.5) ppm) in one place: 0.5203125 is
    the sf0.1 value w5 actually hit."""
    con = duckdb.connect()
    tie = 333.0 / 640.0  # 0.5203125 exactly in decimal; a double nearby
    duck_round = con.execute(f"SELECT ROUND({tie!r}::DOUBLE, 6)").fetchone()[0]
    spark_round = spark.sql(f"SELECT ROUND(CAST({tie!r} AS DOUBLE), 6) AS r").first().r
    assert duck_round != spark_round, (
        "engines now agree on ROUND ties — the ppm workaround may be droppable"
    )
    # the remedy: FLOOR(x*1e6 + 0.5) is pure IEEE arithmetic on the
    # actual binary value (the double for 333/640 sits just BELOW the
    # decimal tie, so floor lands at 520312 — Spark's ROUND said 520313
    # because it rounds the SHORTEST DECIMAL REPR of the double, not the
    # binary value).  What matters is that both engines agree with each
    # other and with the host's IEEE reference.
    import math

    ref = math.floor(tie * 1000000 + 0.5)
    duck_ppm = con.execute(
        f"SELECT CAST(FLOOR({tie!r}::DOUBLE * 1000000 + 0.5) AS BIGINT)"
    ).fetchone()[0]
    spark_ppm = spark.sql(
        f"SELECT CAST(FLOOR(CAST({tie!r} AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS r"
    ).first().r
    assert duck_ppm == spark_ppm == ref == 520312


def test_cosine_topk_tiebreaks_rounded_equals_by_id(spark):
    """Duplicate-heavy corpus: neighbors 2 and 3 are IDENTICAL vectors
    (exactly equal cosine to the query) and neighbor 4 differs from them
    only past the 6th decimal (rounds equal).  The rank must order the
    whole rounded-equal group by neighbor_id — the rule the DuckDB
    oracle applies — not by the raw doubles."""
    from dataengineeringworkshop_spark.llmops.similarity import exact_cosine_topk

    base = [1.0, 2.0, 3.0, 4.0]
    near = [1.0 + 1e-9, 2.0, 3.0, 4.0]  # cosine differs ~1e-10: rounds equal
    far = [4.0, 3.0, 2.0, 1.0]
    rows = [(1, base), (2, base), (3, base), (4, near), (5, far)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") == 1).selectExpr(
        "vec_id", "embedding"
    )
    got = {
        r.neighbor_id: (r.sim_rank, r.cosine)
        for r in exact_cosine_topk(df, q.withColumnRenamed("vec_id", "vec_id"),
                                   "vec_id", "embedding", k=4).collect()
    }
    # rounded-equal group {2, 3, 4} must rank 1, 2, 3 in id order
    assert got[2][0] == 1 and got[3][0] == 2 and got[4][0] == 3, got
    assert got[2][1] == got[3][1] == got[4][1] == 1.0
    assert got[5][0] == 4


def test_corr_covar_survives_huge_ids(spark, tmp_path):
    """a12's moment algebra on 1e10-scale ids: the old formulation
    overflowed DECIMAL(28,14) on the squared ids, and a double-side
    subtraction diverges between engines under the ~1e10 condition
    number.  Reconstruct both hazards with 6 rows and require a
    bit-exact DuckDB match."""
    from dataengineeringworkshop_spark.plans.eventsq import _CORR_SQL

    rows = [
        (9_000_000_001, 10.25, "a"), (9_000_000_402, 11.50, "a"),
        (9_000_000_803, 9.75, "a"), (9_000_001_204, 12.00, "a"),
        (9_000_001_605, 8.25, "a"), (9_000_002_006, 13.75, "a"),
    ]
    df = spark.createDataFrame(rows, "user_id long, value double, event_type string")
    p = str(tmp_path / "huge_ids.parquet")
    df.coalesce(1).write.parquet(p)

    spark.read.parquet(p).createOrReplaceTempView("dew_huge")
    got = spark.sql(_CORR_SQL.format(table="dew_huge", guard="")).collect()[0]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW huge AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = con.execute(_CORR_SQL.format(table="huge", guard="")).fetchone()

    assert (got.event_type, got.n) == (want[0], want[1])
    assert repr(float(got.covar_pop)) == repr(float(want[2])), (got, want)
    assert repr(float(got.corr)) == repr(float(want[3])), (got, want)


def test_corr_covar_overflow_guard_fires(spark):
    """Round-8 ADVICE fix, pinned: past the documented moment headroom
    the a12 query's Spark side must fail LOUDLY in the default
    (non-ANSI) session — the assert_true WHERE guard raises instead of
    letting a decimal overflow silently NULL the covariance.
    |Sy| >= 1e18 is the easiest bound to trip: six 2e17-scale ids sum
    past it."""
    import pytest

    from dataengineeringworkshop_spark.plans.eventsq import _CORR_GUARD, _CORR_SQL

    rows = [
        (200_000_000_000_000_001 + i, 10.0 + i, "a") for i in range(6)
    ]
    df = spark.createDataFrame(rows, "user_id long, value double, event_type string")
    df.createOrReplaceTempView("dew_guard_trip")
    try:
        with pytest.raises(Exception, match="moment headroom exceeded"):
            spark.sql(
                _CORR_SQL.format(table="dew_guard_trip", guard=_CORR_GUARD)
            ).collect()
        # and the same guarded SQL stays transparent under the bounds
        ok_rows = [(9_000_000_001 + i, 10.0 + i, "a") for i in range(6)]
        spark.createDataFrame(
            ok_rows, "user_id long, value double, event_type string"
        ).createOrReplaceTempView("dew_guard_ok")
        got = spark.sql(
            _CORR_SQL.format(table="dew_guard_ok", guard=_CORR_GUARD)
        ).collect()
        assert len(got) == 1 and got[0].n == 6
    finally:
        spark.catalog.dropTempView("dew_guard_trip")
        spark.catalog.dropTempView("dew_guard_ok")
