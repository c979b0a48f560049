"""Connected-components dedup clusters vs a python union-find reference,
on both hand-built graphs and real LSH pair output."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_components_on_chain_and_islands(spark):
    from dataengineeringworkshop_spark.llmops.clusters import connected_components

    # chain 1-2-3-4 (transitively one cluster), island pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "d1 BIGINT, d2 BIGINT"
    )
    got = {r.member: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_components_match_union_find_on_lsh_pairs(spark):
    from dataengineeringworkshop_spark.llmops.clusters import (
        connected_components,
        dedup_survivors,
    )
    from dataengineeringworkshop_spark.llmops.minhash import minhash_dedup_pairs
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    pairs_df = minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.2
    ).select("d1", "d2")
    pairs = [(r.d1, r.d2) for r in pairs_df.collect()]
    want = _union_find(pairs)
    got = {r.member: r.component for r in connected_components(pairs_df).collect()}
    assert got == want

    surv = dedup_survivors(d.select("doc_id"), "doc_id", pairs_df)
    total = d.count()
    losers = sum(1 for v, c in want.items() if v != c)
    assert surv.count() == total - losers
    # every cluster keeps exactly its min member
    kept = {r.doc_id for r in surv.collect()}
    for v, c in want.items():
        assert (v in kept) == (v == c)
