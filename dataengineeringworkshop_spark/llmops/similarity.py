"""Similarity search over embedding columns.

- ``exact_cosine_topk``: brute-force baseline — broadcast the query set,
  stream the corpus once, JVM higher-order-function dot products, window
  top-k.  O(|Q|·N·d), the right tool when |Q| is small.
- ``ann_topk_lsh``: the scale path — random-hyperplane LSH: each vector
  gets a ``nbits``-bit signature (sign of projection onto fixed seeded
  hyperplanes, computed vectorized in a Pandas UDF via numpy); vectors
  sharing a signature band land in the same bucket; candidates are
  rerank-scored with the exact JVM dot product.  The corpus is touched
  once to build signatures; the candidate join is a bucket join, never a
  cross join — at 100 TB the bucket join shuffles (id, band_key) pairs
  only, and probing cost scales with bucket occupancy, not corpus size.

Determinism: hyperplanes come from a fixed-seed numpy RandomState, so
signatures (and therefore candidates) are reproducible run-to-run.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from dataengineeringworkshop_spark.llmops.expr import DOT_DOUBLE as _DOT
from dataengineeringworkshop_spark.operators.fanout import fan_out


def exact_cosine_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """(query_id, neighbor_id, cosine, sim_rank) — brute force baseline.

    ``queries`` is broadcast; requires query_id != neighbor id."""
    nrm = F.expr(_DOT.format(a=vec_col, b=vec_col))
    # fan the corpus side out (gated, operators.fanout): the per-row dot
    # products are the query's CPU, and a one-row-group embeddings file
    # would otherwise run them all on one core
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    ).withColumn("c_nrm", F.expr(_DOT.format(a="c_vec", b="c_vec")))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_nrm", F.expr(_DOT.format(a="q_vec", b="q_vec")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            # nullif guard: a zero-norm vector would give 0/0 = NaN, and NaN
            # sorts ABOVE every real cosine in desc order — null sorts last
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("c_nrm")), F.lit(0.0)),
        )
    )
    # rank on the ROUNDED cosine — the emitted value and the oracle's
    # rank key: distinct raw cosines that round equal (duplicate-heavy
    # corpora hit this) must tie-break by neighbor_id in BOTH engines,
    # and raw doubles are not engine-stable at the 14th digit (decimal
    # cast rounding modes differ), so the 6-decimal value is the only
    # cross-engine-deterministic sort key
    w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cosine"), 6).desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())  # zero-norm pairs: no result
        .withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "sim_rank")
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    return np.random.RandomState(seed).randn(nbits, dim).astype(np.float64)


def lsh_signatures(
    df: DataFrame, id_col: str, vec_col: str, dim: int, nbits: int = 32,
    bands: int = 4, seed: int = 42,
) -> DataFrame:
    """(id, band, band_key): sign-bit signatures split into bands.

    The projection is numpy matmul inside an Arrow-batched Pandas UDF —
    the documented slow path, used because a 32×64 matmul per row is
    exactly what BLAS is for."""
    planes = _hyperplanes(dim, nbits, seed)
    bits_per_band = nbits // bands

    @F.pandas_udf(ArrayType(IntegerType()))
    def band_keys(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, nbits)
        keys = []
        weights = (1 << np.arange(bits_per_band)).astype(np.int64)
        for row in bits:
            ks = [
                int(row[b * bits_per_band:(b + 1) * bits_per_band] @ weights)
                for b in range(bands)
            ]
            keys.append(ks)
        return pd.Series(keys)

    return df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(band_keys(F.col(vec_col))).alias("band", "band_key"),
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    nbits: int = 32,
    bands: int = 4,
    max_bucket: int = 2048,
    index_key: str | None = None,
) -> DataFrame:
    """Approximate top-k: LSH bucket candidates → exact cosine rerank.

    With ``index_key``, the corpus-side bucket table (signatures with
    oversized buckets dropped) is built ONCE and materialized to parquet
    — an LSH index is built at ingest time and probed many times; only
    the (tiny) query set is signed per call.  Recall improves with more
    bands (more candidates); verify against ``exact_cosine_topk`` in
    tests."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    def build_index() -> DataFrame:
        # deliberately NOT fanned out: fanning a pandas-UDF stage to 32
        # partitions forces 32 simultaneous cold Python-worker spawns
        # (~15-20 s measured, OPTIMIZATION_r13.md) while the BLAS matmul
        # itself is trivial at the scale where the fan-out gate fires —
        # and at production scale the scan is already wide, so the
        # fan-out would be a no-op there too; it has no winning case here
        sig = lsh_signatures(corpus, id_col, vec_col, dim, nbits, bands)
        ok = sig.groupBy("band", "band_key").count().filter(
            F.col("count") <= max_bucket
        ).select("band", "band_key")
        return sig.join(ok, ["band", "band_key"])

    if index_key:
        c_sig = materialize(
            build_index(),
            label="lsh_buckets",
            cache_key=f"{index_key}:d{dim}:n{nbits}:b{bands}:m{max_bucket}"
            f":v{vec_col}:id{id_col}",
        )
    else:
        c_sig = build_index()
    q_sig = lsh_signatures(queries, id_col, vec_col, dim, nbits, bands).withColumnRenamed(
        "vid", "qid"
    )
    cand = (
        q_sig.join(c_sig, ["band", "band_key"])
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid")
        .distinct()
    )
    # vector store half of the index artifact: (vid, vector, squared
    # norm), norms computed ONCE at build time — the rerank then does a
    # single dot product per candidate pair instead of three, and a
    # probe joins the cached parquet artifact rather than re-scanning
    # the corpus table (same build/serve split as the IVF index)
    c_vec = fan_out(
        corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec"))
    ).withColumn("c_nrm", F.expr(_DOT.format(a="c_vec", b="c_vec")))
    if index_key:
        c_vec = materialize(
            c_vec,
            label="lsh_vectors",
            cache_key=f"{index_key}:vecs:v{vec_col}:id{id_col}",
        )
    q_vec = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_nrm", F.expr(_DOT.format(a="q_vec", b="q_vec")))
    scored = (
        cand.join(c_vec, "vid")
        .join(F.broadcast(q_vec), "qid")
        .withColumn(
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("c_nrm")), F.lit(0.0)),
        )
    )
    # rounded-cosine rank key: same tie rule as exact_cosine_topk
    w = Window.partitionBy("qid").orderBy(
        F.round(F.col("cosine"), 6).desc_nulls_last(), F.col("vid")
    )
    return (
        scored.filter(F.col("cosine").isNotNull())  # zero-norm pairs: no result
        .withColumn("sim_rank", F.row_number().over(w))
        .filter(F.col("sim_rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "sim_rank",
        )
    )
