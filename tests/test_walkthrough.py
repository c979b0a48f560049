"""Integration: the workshop walkthrough example (Lakehouse facade) —
batch dim + DDL/DML repair, incremental ingest with rescue, dedup/shred
silver, gold aggregates, history + time travel (SURVEY.md §5.1.3)."""

from __future__ import annotations


def test_workshop_walkthrough_end_to_end(spark, tmp_path):
    from examples.workshop_walkthrough import main

    out = main(str(tmp_path))
    assert out["first_batch_rows"] == 40
    # second run processed ONLY the fix file (exactly-once): 40 + 5
    assert out["bronze_rows"] == 45
    # the 5 drifted-ts rows were field-rescued
    assert out["rescued_rows"] == 5
    # dedup-latest collapses the 5 re-sent sales onto their originals
    assert out["silver_rows"] == 40
    # and the re-sent (higher exported_ts) CANCELED state won
    assert out["canceled_after_merge"] == 5
    assert out["item_rows"] == 79
    # gold: both countries present, sales counted distinct, costs exact
    assert out["gold_country"][("AUS", "2021-10")] == (24, 200.0)
    assert out["gold_country"][("NZL", "2021-10")] == (16, 128.5)
    assert out["top_rank_max"] == 3
    # table history records the full DDL/DML sequence, and version 0
    # predates the ADD COLUMN (time travel)
    assert out["history_ops"] == [
        "CREATE TABLE AS SELECT", "ADD COLUMNS", "UPDATE", "UPDATE"
    ]
    assert out["v0_has_country"] is False
