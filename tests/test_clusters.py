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


def test_pagerank_ground_truth_and_invariants(spark):
    """3-iteration PageRank on a known graph vs a pure-python
    recomputation with the SAME decimal quantization, plus the mass
    invariant: per round, sum(r) = 0.15 + 0.85·sum(prev) when every
    node has out-edges, so after any round the total stays within
    quantization error of 1."""
    from decimal import Decimal

    from dataengineeringworkshop_spark.llmops.clusters import pagerank

    raw = [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)]
    pairs = spark.createDataFrame(raw, ["d1", "d2"])

    # python twin with the identical DECIMAL(18,8) accumulate
    edges = [(u, v) for u, v in raw] + [(v, u) for u, v in raw]
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    n = len(deg)
    r = {u: 1.0 / n for u in deg}
    q = Decimal("0.00000001")
    for _ in range(3):
        s: dict[int, Decimal] = {}
        for u, v in edges:
            contrib = Decimal(repr(r[u] / deg[u])).quantize(q)
            s[v] = s.get(v, Decimal(0)) + contrib
        r = {v: 0.15 / n + 0.85 * float(sv) for v, sv in s.items()}

    got = {row.u: row.r for row in pagerank(pairs).collect()}
    assert set(got) == set(r)
    for u in r:
        assert abs(got[u] - r[u]) < 1e-12, (u, got[u], r[u])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # centrality signal: node 3 (degree 3) outranks leaf node 4
    assert got[3] > got[4]
