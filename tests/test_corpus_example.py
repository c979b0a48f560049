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
