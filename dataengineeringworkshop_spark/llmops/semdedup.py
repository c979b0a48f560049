"""Scale path for semantic near-duplicate blocking: a TRAINED coarse
quantizer (the IVF k-means from ``llmops.ivf``) as the blocking key.

Why this exists: blocking on a fixed-cardinality key (a handful of seed
vectors, or a categorical ``label`` column) makes the within-block
all-pairs join O(N²/blocks) — quadratic at any fixed block count.  With
``nlist ≈ √N`` trained cells the expected cell size is √N and the pair
space is Σ cell² ≈ N^1.5: the standard SemDeDup (Abbas et al. 2023,
arXiv:2303.09540) / FAISS-IVF sizing, and the only shape that survives a
100× corpus scale-up.

The oracle-exact fixed-seed variants stay registered for driver-scale
correctness (``plans/searchq.py:sd_semantic_dedup``,
``plans/simops.py:sim_cosine_neardup``); those queries route here once
the corpus crosses their scale threshold.
"""

from __future__ import annotations

from math import isqrt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.llmops.expr import DOT_DOUBLE as _DOT
from dataengineeringworkshop_spark.llmops.ivf import _nearest_cells, _train_centroid_rows


def scale_nlist(n_rows: int) -> int:
    """``nlist ≈ √N`` (floor 8): expected cell size √N, expected pair
    work Σ cell² ≈ N^1.5 — grows with the corpus instead of pinning the
    block count."""
    return max(8, isqrt(max(1, n_rows)))


def assign_trained_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    nlist: int,
    seed: int = 42,
    index_key: str | None = None,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(vec_id, embedding, nrm, cell[, keep_cols…]) with ``cell`` the
    nearest trained centroid — a PURE MAP over the corpus (centroids
    inlined as one SQL literal), zero shuffle, exactly the IVF
    index-build step."""
    rows = _train_centroid_rows(
        df, vec_col, nlist, seed, max_iter=5, max_train_rows=100_000,
        cache_key=index_key,
    )
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.element_at(_nearest_cells(F.col(vec_col), rows, 1), 1)
        .getField("cell_id")
        .alias("cell"),
        *[F.col(c) for c in keep_cols],
    ).withColumn("nrm", F.expr(_DOT.format(a="embedding", b="embedding")))


def cell_neardup_pairs(assigned: DataFrame, tau: float) -> DataFrame:
    """(id1, id2, cell, cosine ≥ tau) within-cell pairs.  The join key is
    the trained cell, so per-cell fan-out is cell_size² and the total is
    Σ cell² — bounded by the quantizer, not the corpus."""
    a = assigned.select(
        F.col("vec_id").alias("id1"), "cell",
        F.col("embedding").alias("v1"), F.col("nrm").alias("n1"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id2"), "cell",
        F.col("embedding").alias("v2"), F.col("nrm").alias("n2"),
    )
    pairs = a.join(b, ["cell"]).filter(F.col("id1") < F.col("id2"))
    cos = F.expr(_DOT.format(a="v1", b="v2")) / F.nullif(
        F.sqrt(F.col("n1") * F.col("n2")), F.lit(0.0)
    )
    return (
        pairs.withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= tau)
        .select("id1", "id2", "cell", F.round("cosine_raw", 6).alias("cosine"))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float = 0.3,
    nlist: int | None = None,
    seed: int = 42,
    index_key: str | None = None,
) -> DataFrame:
    """SemDeDup at scale: (vec_id, cell, is_dup) — is_dup=1 for every
    vector that is the higher-id member of some within-cell pair with
    cosine ≥ tau (lowest id of each near-dup group survives)."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    if nlist is None:
        nlist = scale_nlist(df.count())
    assigned = materialize(
        assign_trained_cells(df, id_col, vec_col, nlist, seed, index_key),
        label="semdedup_trained_cells",
        cache_key=(
            f"{index_key}:k{nlist}:s{seed}:sdcells:v{vec_col}:id{id_col}"
            if index_key
            else None
        ),
    )
    dups = (
        cell_neardup_pairs(assigned, tau)
        .select(F.col("id2").alias("dup_id"))
        .distinct()
    )
    return assigned.join(dups, assigned.vec_id == dups.dup_id, "left").select(
        "vec_id",
        "cell",
        F.when(F.col("dup_id").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_dup"),
    )
