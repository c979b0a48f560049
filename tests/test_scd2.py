"""SCD Type-2 semantics: close-out + new-version rows, point-in-time
snapshots, idempotent re-apply (row-hash change guard)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from dataengineeringworkshop_spark.tables.scd2 import as_of, scd2_apply, scd2_init
from dataengineeringworkshop_spark.tables.versioned import VersionedTable


def _vt(spark):
    return VersionedTable(spark, tempfile.mkdtemp(prefix="dew_scd2_t_") + "/dim")


def test_scd2_close_open_and_snapshots(spark):
    vt = _vt(spark)
    base = spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 200.0), (3, "carol", 300.0)],
        "id INT, name STRING, bal DOUBLE",
    )
    scd2_init(vt, base, key="id", batch_ts="2024-01-01 00:00:00")

    updates = spark.createDataFrame(
        [(2, "bob", 250.0), (4, "dave", 400.0)], "id INT, name STRING, bal DOUBLE"
    )
    scd2_apply(vt, updates, key="id", batch_ts="2024-02-01 00:00:00")

    full = vt.read()
    assert full.count() == 5  # 3 originals + bob closed/reopened + dave
    cur = {r.id: r.bal for r in full.filter("is_current").collect()}
    assert cur == {1: 100.0, 2: 250.0, 3: 300.0, 4: 400.0}
    closed = full.filter(~F.col("is_current")).collect()
    assert len(closed) == 1 and closed[0].id == 2 and closed[0].bal == 200.0
    assert str(closed[0].valid_to) == "2024-02-01 00:00:00"

    # point-in-time: mid-January sees the original world, no dave
    jan = {r.id: r.bal for r in as_of(vt, "2024-01-15 00:00:00").collect()}
    assert jan == {1: 100.0, 2: 200.0, 3: 300.0}
    mar = {r.id: r.bal for r in as_of(vt, "2024-03-01 00:00:00").collect()}
    assert mar == {1: 100.0, 2: 250.0, 3: 300.0, 4: 400.0}


def test_scd2_reapply_is_noop(spark):
    vt = _vt(spark)
    base = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], "id INT, name STRING, bal DOUBLE")
    scd2_init(vt, base, key="id", batch_ts="2024-01-01 00:00:00")
    batch = spark.createDataFrame([(1, "a", 9.0)], "id INT, name STRING, bal DOUBLE")
    scd2_apply(vt, batch, key="id", batch_ts="2024-02-01 00:00:00")
    n_after_first = vt.read().count()
    # same content again: the row-hash guard must not close/reopen anything
    scd2_apply(vt, batch, key="id", batch_ts="2024-03-01 00:00:00")
    assert vt.read().count() == n_after_first == 3
    assert vt.read().filter("is_current").count() == 2


def test_scd2_apply_ignores_legacy_stored_hash(spark):
    """A dimension persisted under an OLDER hash definition (the
    original concat_ws row hash) must not churn on the first apply
    after an upgrade: change detection recomputes the target hash
    fresh from the stored bare columns, so an identical update batch
    is still a no-op."""
    from dataengineeringworkshop_spark.operators.rowhash import with_row_hash

    vt = _vt(spark)
    base = spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", 200.0)], "id INT, name STRING, bal DOUBLE"
    )
    # simulate a pre-upgrade table: LEGACY concat_ws hash in row_hash
    vt.write(
        with_row_hash(base).withColumns(
            {
                "valid_from": F.lit("2024-01-01 00:00:00").cast("timestamp"),
                "valid_to": F.lit("2100-01-01 00:00:00").cast("timestamp"),
                "is_current": F.lit(True),
            }
        )
    )
    scd2_apply(vt, base, key="id", batch_ts="2024-02-01 00:00:00")
    got = vt.read()
    assert got.count() == 2, "legacy-hash rows were spuriously closed+reopened"
    assert got.filter(~F.col("is_current")).count() == 0

    # and a REAL change is still detected
    upd = spark.createDataFrame([(2, "bob", 999.0)], "id INT, name STRING, bal DOUBLE")
    scd2_apply(vt, upd, key="id", batch_ts="2024-03-01 00:00:00")
    cur = vt.read().filter("is_current")
    assert {(r.id, r.bal) for r in cur.collect()} == {(1, 100.0), (2, 999.0)}
