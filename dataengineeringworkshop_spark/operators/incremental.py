"""Incremental-maintenance rules for NON-invertible aggregates.

count/sum form a group (mv_incremental_delete subtracts retractions
exactly); MIN/MAX form only a monoid — a deleted row cannot be
subtracted.  This module holds the targeted-repair rule both the
registered query (plans/analyticsq.py mv_incremental_minmax) and its
ground-truth test exercise, so the rule has exactly one definition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def minmax_delete_repair(
    rows: DataFrame,
    deleted: DataFrame,
    group_cols: str | Sequence[str],
    val_col: str,
    key_col: str,
) -> DataFrame:
    """Maintain per-group ``(n, mn, mx)`` under a delete batch without a
    full recompute.

    ``rows`` is the pre-delete table (whose aggregate is the standing
    MV), ``deleted`` the retracted subset.  A group is recomputed from
    its SURVIVING rows ONLY if a deleted value EQUALS the stored
    extreme — a conservative rule: a tie elsewhere in the group makes
    the recompute return the same extreme (correct, never wrong), and
    a non-extreme delete can never change MIN/MAX.  Counts stay
    group-retractable everywhere.  Repair cost is proportional to
    groups-with-deleted-extremes (broadcast semi on the bounded repair
    list), never to table size.  ``key_col`` is the unique row id the
    survivors anti-join uses (never a full-row comparison, whose NULL
    semantics would silently keep deleted rows)."""
    groups = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    v = F.col(val_col)
    mv = rows.groupBy(*groups).agg(
        F.count("*").alias("n"), F.min(v).alias("mn"), F.max(v).alias("mx")
    )
    dagg = deleted.groupBy(*groups).agg(
        F.count("*").alias("dn"), F.min(v).alias("dmn"), F.max(v).alias("dmx")
    )
    j = mv.join(dagg, groups, "left")
    needs_repair = j.filter(
        (F.col("dmn") == F.col("mn")) | (F.col("dmx") == F.col("mx"))
    ).select(*groups)
    survivors = rows.join(deleted.select(key_col), key_col, "left_anti")
    repaired = (
        survivors.join(F.broadcast(needs_repair), groups, "left_semi")
        .groupBy(*groups)
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min(v).alias("mn"),
            F.max(v).alias("mx"),
        )
    )
    untouched = (
        j.join(F.broadcast(needs_repair), groups, "left_anti")
        .select(
            *groups,
            (F.col("n") - F.coalesce(F.col("dn"), F.lit(0))).cast("long").alias("n"),
            "mn",
            "mx",
        )
        .filter(F.col("n") > 0)
    )
    return repaired.unionByName(untouched)
