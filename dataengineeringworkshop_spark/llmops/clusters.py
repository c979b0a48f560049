"""Duplicate-cluster formation: connected components over a pair list.

LSH/MinHash emit PAIRS (a,b); production dedup needs CLUSTERS — if
a~b and b~c, {a,b,c} dedupes to one survivor even though (a,c) was
never emitted.  That closure is a connected-components problem, the
prompt-class "iterative algorithm" SQL can't express.

Algorithm: plain min-label propagation — every vertex holds a label
(min vertex id seen); each round propagates the min label across edges.
Converges in O(graph diameter) rounds, which for near-dup graphs is
tiny (dup clusters are cliques-ish); the loop RAISES if ``max_iter``
rounds are exhausted rather than returning split clusters silently.

Scale posture: each iteration is one join + one aggregate on the edge
list (shuffle keyed by vertex); the DRIVER loop only checks the
converged flag (a count), never touches vertex data.  Iterations are
bounded (``max_iter``) and the loop exits early on fixpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.operators.materialize import materialize


def connected_components(
    pairs: DataFrame, a: str = "d1", b: str = "d2", max_iter: int = 15
) -> DataFrame:
    """(member, component) — component = min vertex id reachable.

    ``pairs`` is an undirected edge list; isolated vertices absent from
    it are their own components by definition (callers union them in)."""
    edges = materialize(
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .union(pairs.select(F.col(b).alias("u"), F.col(a).alias("v")))
        .distinct(),
        "cc_edges",
    )
    # label(v) = min(v, min neighbor) to start
    labels = edges.groupBy("u").agg(F.min("v").alias("lbl")).select(
        "u", F.least("u", "lbl").alias("lbl")
    )
    for _ in range(max_iter):
        # propagate: candidate label for v = min over neighbors' labels
        prop = (
            edges.alias("e")
            .join(labels.alias("l"), F.col("e.u") == F.col("l.u"))
            .select(F.col("e.v").alias("u"), F.col("l.lbl").alias("lbl"))
            .groupBy("u")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(prop, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
        )
        new_labels = materialize(new_labels, "cc_labels")
        changed = (
            labels.withColumnRenamed("lbl", "old")
            .join(new_labels, "u")
            .filter(F.col("old") != F.col("lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(graph diameter exceeds max_iter) — raise max_iter"
        )
    return labels.select(F.col("u").alias("member"), F.col("lbl").alias("component"))


def dedup_survivors(
    df: DataFrame, id_col: str, pairs: DataFrame, a: str = "d1", b: str = "d2"
) -> DataFrame:
    """Keep one row per duplicate cluster (the min-id member) plus every
    row not implicated in any pair — the end-to-end LSH→clusters→dedup
    contract."""
    comp = connected_components(pairs, a, b)
    losers = comp.filter(F.col("member") != F.col("component")).select(
        F.col("member").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def pagerank(
    pairs: DataFrame,
    a: str = "d1",
    b: str = "d2",
    iters: int = 3,
    scale: int = 8,
) -> DataFrame:
    """PageRank over an undirected pair list — ``iters`` synchronous
    power-iteration rounds with damping 0.85, returning
    (u, outdeg, r).

    Determinism (the registry's decimal-accumulate rule): each
    neighbor contribution r/outdeg is ONE double division (exact and
    identical in any engine), cast to DECIMAL(18, ``scale``) (same
    nearest-value in both engines), summed exactly in decimal (order
    independent), and cast back to double once.  The teleport and
    damping steps are single double ops.  So the final ranks are
    bit-identical to an unrolled SQL recomputation — which is exactly
    how the oracle checks them.

    Scale posture: one join + one grouped decimal-sum per iteration,
    shuffled on the vertex key; degree and rank ride the same row so no
    per-iteration re-join against a degree table; the node count enters
    as a broadcast 1-row aggregate, never a driver scalar."""
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).union(
        pairs.select(F.col(b).alias("u"), F.col(a).alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count("*").alias("outdeg"))
    nn = deg.agg(F.count("*").alias("n_nodes"))
    r = deg.crossJoin(nn).select(
        "u", "outdeg", F.expr("CAST(1 AS DOUBLE) / n_nodes").alias("r")
    )
    for _ in range(iters):
        s = (
            edges.join(r, "u")
            .groupBy(F.col("v"))
            .agg(
                F.expr(
                    f"CAST(SUM(CAST(r / outdeg AS DECIMAL(18,{scale})))"
                    " AS DOUBLE)"
                ).alias("s")
            )
            .select(F.col("v").alias("su"), F.col("s"))
        )
        r = (
            s.join(deg, F.col("su") == F.col("u"))
            .crossJoin(nn)
            .select(
                "u",
                "outdeg",
                F.expr(
                    "CAST(0.15 AS DOUBLE) / n_nodes"
                    " + CAST(0.85 AS DOUBLE) * s"
                ).alias("r"),
            )
        )
    return r


def triangle_counts(pairs: DataFrame, a: str = "d1", b: str = "d2") -> DataFrame:
    """Per-vertex triangle participation ``(doc_id, n_triangles)`` over
    an ordered undirected edge list (``a < b`` per row).

    Ordered enumeration — wedge equi-join on the shared middle vertex +
    a closing-edge equi-join — counts every triangle exactly once as
    a < b < c (no /6 cleanup, never a cartesian), then attributes it to
    all three corners.  The edge list is materialized once: it feeds
    three join aliases, and without the artifact Spark would recompute
    the (potentially expensive) pair-mining subtree per alias.  Wedge
    fan-out is bounded by whatever degree cap the pair stage enforces."""
    e = materialize(
        pairs.select(F.col(a).alias("a"), F.col(b).alias("b")), "tri_edges"
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .select(
            F.col("e1.a").alias("a"),
            F.col("e1.b").alias("b"),
            F.col("e2.b").alias("c"),
        )
    )
    verts = (
        tri.select(F.col("a").alias("doc_id"))
        .unionAll(tri.select(F.col("b").alias("doc_id")))
        .unionAll(tri.select(F.col("c").alias("doc_id")))
    )
    return verts.groupBy("doc_id").agg(F.count("*").alias("n_triangles"))
