"""The corpus-pipeline example is executable documentation — run it and
assert its invariants hold."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMOKE


def test_corpus_example_invariants(spark):
    from examples.corpus_pipeline import main

    out = main(SF_SMOKE)
    assert out["kept"] + out["quarantined"] == out["input_docs"]
    assert 0 < out["after_dedup"] <= out["kept"]
    assert out["train_docs"] > 0
    assert out["chunks"] >= out["input_docs"]  # >=1 chunk per doc


def test_dlt_sql_example_invariants(spark):
    """The DLT SQL notebook example runs end to end: drop-mode
    constraint removes the 1-char stores, the rerun ingests only the
    new file, and the gold join reflects both batches."""
    from examples.dlt_sql_notebook import main

    out = main()
    assert out["appended_run2"] == 10
    n_sales, total = out["gold"]["AUS"]
    assert n_sales == 37  # 27 valid from batch1 + 10 from batch2
    assert out["metrics"]["store id is 5 characters"]["dropped_records"] == 0
