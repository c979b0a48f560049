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


def test_triangle_count_ground_truth(spark):
    """Known graph: a 4-clique {1,2,3,4} (every vertex in C(3,2)=3
    triangles), a pendant edge 4-5 (no triangle), and a separate
    triangle {10,11,12} (1 each).  Enumeration must count each
    triangle once and attribute it to all three corners."""
    from dataengineeringworkshop_spark.llmops.clusters import triangle_counts

    clique = [(a, b) for a in (1, 2, 3, 4) for b in (1, 2, 3, 4) if a < b]
    edges = clique + [(4, 5), (10, 11), (10, 12), (11, 12)]
    e = spark.createDataFrame(edges, "d1 long, d2 long")
    got = {r.doc_id: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 10: 1, 11: 1, 12: 1}
    assert sum(got.values()) == 15  # 5 triangles x 3 corners


def test_bloom_prefilter_semi_equals_plain_semi(spark):
    """The bucket prefilter + exact join must equal the plain semi join
    on adversarial keys (bucket collisions between hot and cold keys,
    keys larger than 2^32, empty build side)."""
    from dataengineeringworkshop_spark.operators.joins import bloom_prefilter_semi

    m = 64  # tiny bucket space -> guaranteed collisions
    probe = spark.createDataFrame(
        [(k,) for k in list(range(1000)) + [2**40 + 7, 2**40 + 71]], "k long"
    )
    build = spark.createDataFrame(
        [(b,) for b in (3, 67, 131, 2**40 + 7)], "bk long"  # 67=3+64 collides
    )
    got = sorted(
        r.k for r in bloom_prefilter_semi(probe, build, "k", "bk", m=m).collect()
    )
    want = sorted(
        r.k for r in probe.join(build, probe.k == build.bk, "left_semi").collect()
    )
    assert got == want == [3, 67, 131, 2**40 + 7]

    empty = build.filter("bk < 0")
    assert bloom_prefilter_semi(probe, empty, "k", "bk", m=m).count() == 0
