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


@pytest.mark.xfail(
    reason="SPARK listagg planner defect: two DISTINCT listaggs with "
    "different WITHIN GROUP orders crash RewriteDistinctAggregates "
    "(ClassCastException AttributeReference -> SortOrder); an XPASS "
    "here means the Spark upgrade fixed it and a22 can use the direct "
    "form",
    raises=Exception,
    strict=True,
)
def test_two_distinct_orders_still_broken(spark):
    spark.sql(_FOUR_ROWS).createOrReplaceTempView("listagg_probe")
    spark.sql(
        """
        SELECT g,
               listagg(DISTINCT s, '|') WITHIN GROUP (ORDER BY s) AS a,
               listagg(DISTINCT s, ',') WITHIN GROUP (ORDER BY s DESC) AS b
        FROM listagg_probe GROUP BY g
        """
    ).collect()
