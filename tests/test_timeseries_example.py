"""Keep examples/timeseries_curation_demo.py honest: run it and pin
its invariants (conservation under gap-fill, bounded sampling,
half-kept gating, Z-order two-dimensional locality)."""

from __future__ import annotations


def test_timeseries_curation_demo_invariants(spark):
    import examples.timeseries_curation_demo as demo

    out = demo.main()

    # forward fill: unfillable rows (leading gaps) never exceed gaps
    f = out["fill"]
    assert 0 <= f["unfillable"] <= f["gaps"] <= f["rows"]

    # spine: complete axis with explicit zero cells, event-count
    # conservation vs the histogram's independent total
    assert out["spine_cells"] > 0
    assert out["spine_event_total"] == out["hist_event_total"]

    # robust outliers: the flagged set can never reach half (at least
    # half of all deviations sit at or below the MAD itself)
    for n_events, n_outliers in out["mad"].values():
        assert 0 <= n_outliers <= n_events / 2

    # weighted sample: bounded per stratum and exactly repeatable
    assert out["sample_per_source"]
    assert all(1 <= n <= 20 for n in out["sample_per_source"].values())
    assert out["sample_repeatable"] is True

    # gate keeps the top half (ceil) of every source
    for n_docs, n_kept in out["gate"].values():
        assert n_kept == (n_docs + 1) // 2, (n_docs, n_kept)

    # tf-idf: up to 3 deterministic salient terms for doc 0
    assert 1 <= len(out["doc0_terms"]) <= 3

    # Morton layout: 16 files, and the MEAN per-file span is a small
    # fraction of each dimension's range on BOTH axes (a lexicographic
    # sort would leave the trailing dimension's span at ~1.0)
    assert out["zorder_files"] == 16
    assert out["zorder_ck_span_frac"] < 0.5
    assert out["zorder_day_span_frac"] < 0.5
