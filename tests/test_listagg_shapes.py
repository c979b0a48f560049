"""Pins the Spark 4.1 listagg planner defect and the registry's
workaround shape (a22_listagg_distinct).

Defect: two ``listagg(DISTINCT …)`` aggregates with DIFFERENT
``WITHIN GROUP`` sort orders in one Aggregate node crash planning with
``ClassCastException: AttributeReference cannot be cast to SortOrder``
inside RewriteDistinctAggregates.  If a Spark upgrade fixes it, the
xfail below starts XPASSing — the signal to simplify a22 back to the
direct two-DISTINCT form.
"""

from __future__ import annotations

import pytest

_FOUR_ROWS = (
    "SELECT 1 AS g, 'x' AS s UNION ALL SELECT 1, 'y' "
    "UNION ALL SELECT 1, 'x' UNION ALL SELECT 2, 'z'"
)


def test_workaround_shape_plans_and_runs(spark):
    """The a22 shape: plain listagg + ONE DISTINCT listagg (different
    orders) over a pre-collapsed DISTINCT CTE — one Aggregate, no
    crash, deterministic output."""
    spark.sql(_FOUR_ROWS).createOrReplaceTempView("listagg_probe")
    rows = spark.sql(
        """
        WITH d AS (SELECT DISTINCT g, s FROM listagg_probe)
        SELECT g,
               listagg(s, '|') WITHIN GROUP (ORDER BY s) AS asc_l,
               listagg(DISTINCT s, ',') WITHIN GROUP (ORDER BY s DESC) AS desc_l,
               COUNT(*) AS n
        FROM d GROUP BY g ORDER BY g
        """
    ).collect()
    assert [tuple(r) for r in rows] == [(1, "x|y", "y,x", 2), (2, "z", "z", 1)]


def test_two_distinct_orders_still_broken(spark):
    """Narrow pin on the Spark 4.1 planner defect: the failure must be
    THE known ClassCastException inside RewriteDistinctAggregates — an
    analysis error, fixture problem, or unrelated regression raises a
    different message and FAILS this test loudly instead of hiding
    behind a broad xfail.  If Spark fixes the defect, ``pytest.raises``
    reports DID NOT RAISE — the signal that a22_listagg_distinct can be
    simplified back to the direct two-DISTINCT form."""
    spark.sql(_FOUR_ROWS).createOrReplaceTempView("listagg_probe")
    with pytest.raises(
        Exception,
        match=r"(?is)ClassCastException.*SortOrder"
        r"|RewriteDistinctAggregates",
    ):
        spark.sql(
            """
            SELECT g,
                   listagg(DISTINCT s, '|') WITHIN GROUP (ORDER BY s) AS a,
                   listagg(DISTINCT s, ',') WITHIN GROUP (ORDER BY s DESC) AS b
            FROM listagg_probe GROUP BY g
            """
        ).collect()
