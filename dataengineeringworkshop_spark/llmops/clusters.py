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
