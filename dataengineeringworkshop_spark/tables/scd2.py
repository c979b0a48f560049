"""SCD Type-2 (history-keeping) merge on a VersionedTable.

The reference's MERGE (N2:534-540) is SCD Type-1: matched rows are
overwritten and their prior state survives only via time travel.  SCD2
is the standard lakehouse extension when history must be *queryable*
relationally: every change CLOSES the current row (``valid_to`` set,
``is_current`` false) and INSERTS a new current row.

Implementation is one pass of DataFrame ops + a single table rewrite
(copy-on-write, like the underlying VersionedTable DML):

1. join current rows to the update batch on the business key;
2. changed rows (``row_hash`` differs — the reference's change-detection
   idiom, N2:353/537, hardened to the unambiguous struct hash so
   NULL-shifted updates can't be misread as unchanged) are closed out
   at ``batch_ts``;
3. changed + brand-new keys produce new open rows;
4. untouched rows (incl. all already-closed history) pass through.

Scale: one equi join keyed on the business key + one write.  History
grows append-only; the active set is the ``is_current`` partition (at
100 TB: partition the storage by ``is_current`` so point-in-time scans
prune).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.operators.rowhash import with_struct_hash
from dataengineeringworkshop_spark.tables.versioned import VersionedTable

OPEN_TS = "2100-01-01 00:00:00"  # within pandas ns-timestamp range (sentinel "open")


def scd2_init(vt: VersionedTable, df: DataFrame, key: str, batch_ts: str) -> None:
    """Create the dimension with SCD2 bookkeeping columns."""
    vt.write(
        with_struct_hash(df).withColumns(
            {
                "valid_from": F.lit(batch_ts).cast("timestamp"),
                "valid_to": F.lit(OPEN_TS).cast("timestamp"),
                "is_current": F.lit(True),
            }
        )
    )


def scd2_apply(
    vt: VersionedTable, updates: DataFrame, key: str, batch_ts: str
) -> None:
    """Apply an update batch: close changed current rows at ``batch_ts``,
    open new versions, insert unseen keys.  ``updates`` carries the bare
    business columns (same schema as ``scd2_init``'s ``df``)."""
    cur = vt.read()
    bare_cols = [
        c for c in cur.columns
        if c not in ("row_hash", "valid_from", "valid_to", "is_current")
    ]
    # change detection recomputes the target-side hash FRESH from the
    # stored bare columns instead of trusting the persisted row_hash —
    # a dimension written under an older hash definition (the original
    # concat_ws form) would otherwise mismatch on every unchanged row
    # and spuriously close+reopen the whole table on the first apply
    # after an upgrade.  The hash is derived data; recomputing it is one
    # projection over rows the full-outer join reads anyway.
    cur = cur.drop("row_hash")
    cur = with_struct_hash(cur, bare_cols)
    src = with_struct_hash(updates.select(*bare_cols)).withColumnRenamed(
        "row_hash", "src_hash"
    )
    src_keyed = src.select(
        F.col(key).alias("src_key"),
        "src_hash",
        *[F.col(c).alias(f"src_{c}") for c in bare_cols if c != key],
    )
    j = cur.join(src_keyed, cur[key] == src_keyed["src_key"], "full_outer")

    # 1) history + current rows with no update → unchanged
    untouched = j.filter(
        F.col("src_key").isNull()
        | (~F.col("is_current"))
        | (F.col("row_hash") == F.col("src_hash"))
    ).filter(F.col(key).isNotNull()).select(*cur.columns)

    # 2) current rows whose hash changed → closed out
    closed = (
        j.filter(
            F.col("src_key").isNotNull()
            & F.col("is_current")
            & (F.col("row_hash") != F.col("src_hash"))
        )
        .select(*cur.columns)
        .withColumns(
            {
                "valid_to": F.lit(batch_ts).cast("timestamp"),
                "is_current": F.lit(False),
            }
        )
    )

    # 3) new open rows: changed keys + never-seen keys
    fresh_keys = j.filter(
        F.col("src_key").isNotNull()
        & (
            F.col(key).isNull()  # brand new
            | (F.col("is_current") & (F.col("row_hash") != F.col("src_hash")))
        )
    ).select("src_key")
    opened = (
        src.join(fresh_keys, src[key] == fresh_keys["src_key"])
        .select(*bare_cols, F.col("src_hash").alias("row_hash"))
        .withColumns(
            {
                "valid_from": F.lit(batch_ts).cast("timestamp"),
                "valid_to": F.lit(OPEN_TS).cast("timestamp"),
                "is_current": F.lit(True),
            }
        )
        .select(*cur.columns)
    )

    vt.write(untouched.unionByName(closed).unionByName(opened), mode="overwrite")


def as_of(vt: VersionedTable, ts: str) -> DataFrame:
    """Point-in-time snapshot: rows valid at ``ts`` (SCD2's query-side
    payoff — relational time travel without the commit log)."""
    t = F.lit(ts).cast("timestamp")
    cur = vt.read()
    return cur.filter((F.col("valid_from") <= t) & (F.col("valid_to") > t))
