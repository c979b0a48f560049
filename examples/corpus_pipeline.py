#!/usr/bin/env python
"""End-to-end LLM training-corpus build on this engine — executable
documentation for the north-star extensions (BASELINE.json): quality
gating with quarantine, exact + MinHash near-dup dedup, benchmark
decontamination, deterministic splits, chunking for retrieval, and the
final mix accounting — all over the driver's ``documents`` testdata.

Run: ``python examples/corpus_pipeline.py`` (defaults to sf0.001).
The test suite executes ``main()`` and asserts the invariants
(tests/test_corpus_example.py), so this file stays honest.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.001"


def main(sf_dir: str = SF_DIR) -> dict:
    from dataengineeringworkshop_spark.llmops.clusters import dedup_survivors
    from dataengineeringworkshop_spark.llmops.minhash import minhash_dedup_pairs
    from dataengineeringworkshop_spark.operators.expectations import (
        Expectation,
        quarantine_split,
    )
    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.plans.tables import load_table
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="corpus-example")
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate with quarantine — nothing silently dropped
    kept, quarantined = quarantine_split(
        docs,
        [
            Expectation("min_chars", "LENGTH(text) >= 120", mode="drop"),
            Expectation("min_words", "size(split(text, ' ')) >= 20", mode="drop"),
            Expectation("lang_allowed", "lang IN ('en', 'de', 'fr')", mode="drop"),
        ],
    )

    # 2. near-dup dedup: MinHash+LSH candidate pairs -> connected
    #    components -> one survivor per cluster
    pairs = minhash_dedup_pairs(
        kept, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3,
        index_key=f"example:{sf_dir}",
    ).select("d1", "d2")
    survivors = dedup_survivors(kept.select("doc_id", "lang", "source"), "doc_id", pairs)
    deduped = kept.join(survivors.select("doc_id"), "doc_id")

    # 3. decontaminate + split + accounting via the registry's DAG query
    #    (the same path the driver's correctness gate checks)
    mix = load_all()["cp_corpus_pipeline"].fn(spark, sf_dir)

    # 4. chunk the kept docs for the retrieval index
    chunks = load_all()["cp_chunk_documents"].fn(spark, sf_dir)

    out = {
        "input_docs": docs.count(),
        "kept": kept.count(),
        "quarantined": quarantined.count(),
        "after_dedup": deduped.count(),
        "mix_rows": mix.count(),
        "train_docs": (
            mix.filter(F.col("split") == "train")
            .agg(F.sum("n_docs").cast("long").alias("n")).collect()[0]["n"]
        ),
        "chunks": chunks.count(),
    }
    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else SF_DIR)
