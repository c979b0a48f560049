"""Keep examples/analytics_demo.py honest: run it and pin its
invariants (funnel monotonicity, cohort coverage, deterministic paths,
MV merge == recompute)."""

from __future__ import annotations


def test_analytics_demo_invariants(spark):
    import examples.analytics_demo as demo

    out = demo.main()
    f = out["funnel"]
    # funnel stages are monotone non-increasing and non-trivial
    assert f["view"] >= f["click"] >= f["purchase"]
    assert f["view"] > 0
    # every active user appears in their own cohort's week 0
    assert out["week0_users"] > 0
    assert out["n_cohort_cells"] > 0
    # paths come ranked, deterministic tiebreaks
    counts = [n for _, n in out["top_paths"]]
    assert counts == sorted(counts, reverse=True)
    assert all(p for p, _ in out["top_paths"])
    assert out["max_trailing_7d_revenue"] > 0
    # incremental merge is indistinguishable from a recompute
    assert out["mv_merge_equals_recompute"] is True
