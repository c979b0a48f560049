"""Product quantization (PQ) ANN — the memory-bound scale path.

IVF/LSH cut how many vectors a probe SCANS; PQ cuts how many bytes each
scanned vector COSTS: a d-dim float vector (d×8 bytes) becomes ``m``
one-byte codes (here m=8 → 64× smaller), and approximate dot products
against a query need only table lookups.  At 100 TB of embeddings this
is the difference between an index that fits the cluster's disks and
one that doesn't — the FAISS ``IVFADC`` construction, done relationally:

1. **Train** (once, bounded sample): split the dimension into ``m``
   subspaces of ``dsub = d/m``; per subspace, k-means (MLlib, fixed
   seed) learns ``ksub`` centroids.  The codebook is m×ksub×dsub doubles
   of driver metadata.
2. **Encode** (pure map, zero shuffle): each vector's code_j = argmin-L2
   centroid of its j-th slice, via the same inlined-literal
   transform/sort_array expressions the IVF assigner uses.  The encoded
   corpus (vid, codes array<tinyint-sized ints>, true norm) is the
   materialized index artifact.
3. **ADC probe**: per query, the partial dot products against every
   (subspace, centroid) form a |Q|·m·ksub lookup table — built as a
   small DataFrame, collapsed to a per-query map, and BROADCAST.
   approx_dot(q, x) = Σ_j LUT_q[j, code_j] — an ``aggregate`` over the
   code array, JVM-side, no Python.  Candidates ranked by approx score,
   then the top ``rerank`` per query are reranked with EXACT cosine
   against the true vectors (a bounded join back to the corpus), so
   reported cosines are exact and only the candidate CHOICE is
   approximate (the standard ADC + rerank serving shape).

Recall is measured in tests/test_llmops.py against the brute-force
exact top-k on the same fixed query batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.llmops.expr import DOT_DOUBLE as _DOT

#: codebook cache: key -> list[m][ksub] centroid lists (same shape
#: discipline as the IVF coarse-quantizer cache: train once, serve many)
_CODEBOOK_CACHE: dict[str, list] = {}


def train_codebooks(
    corpus: DataFrame,
    vec_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    max_iter: int = 5,
    max_train_rows: int = 100_000,
    cache_key: str | None = None,
) -> list:
    """m per-subspace codebooks, each ksub centroids of dim/m doubles —
    trained on a bounded sample, deterministic (fixed seed)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    # key every input that determines the codebooks — dim, the training
    # sample bound, and the vector column all change the result (round-9
    # fix; pinned in tests/test_materialize_cache.py)
    full_key = (
        f"{cache_key}:pq{m}x{ksub}:s{seed}:i{max_iter}:d{dim}"
        f":r{max_train_rows}:v{vec_col}"
        if cache_key
        else None
    )
    if full_key is not None and full_key in _CODEBOOK_CACHE:
        return _CODEBOOK_CACHE[full_key]
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = corpus.select(F.col(vec_col).cast("array<double>").alias("v")).limit(
        max_train_rows
    )
    # one pass materializes every slice; m small fits driver? NO — train
    # each subspace from the distributed slice, never collecting vectors
    books = []
    for j in range(m):
        sub = sample.select(
            array_to_vector(F.slice("v", j * dsub + 1, dsub)).alias("features")
        )
        model = KMeans(k=ksub, seed=seed + j, maxIter=max_iter).fit(sub)
        books.append([[float(x) for x in c] for c in model.clusterCenters()])
    if full_key is not None:
        _CODEBOOK_CACHE[full_key] = books
    return books


def _codebook_sql(books: list) -> str:
    """m×ksub×dsub nested array literal as ONE SQL expression."""
    return "array({})".format(
        ", ".join(
            "array({})".format(
                ", ".join(
                    "array({})".format(", ".join(repr(float(x)) for x in cent))
                    for cent in book
                )
            )
            for book in books
        )
    )


def encode_pq(df: DataFrame, id_col: str, vec_col: str, books: list) -> DataFrame:
    """(vid, codes array<int>, nrm) — pure map: per subspace, argmin-L2
    centroid id via transform/sort_array over the inlined codebook
    literal.  No join, no shuffle; the 100 TB encode is embarrassingly
    parallel and the output is the 64×-smaller index artifact."""
    m = len(books)
    dsub = len(books[0][0])
    cb = F.expr(_codebook_sql(books))
    v = F.col(vec_col).cast("array<double>")
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.element_at(
            F.sort_array(
                F.transform(
                    F.element_at(cb, j + 1),
                    lambda cent, c: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.slice(v, j * F.lit(dsub) + 1, dsub),
                                cent,
                                lambda x, y: (x - y) * (x - y),
                            ),
                            F.lit(0.0),
                            lambda acc, d2: acc + d2,
                        ).alias("d"),
                        c.cast("int").alias("code"),
                    ),
                )
            ),
            1,
        ).getField("code"),
    )
    return df.select(
        F.col(id_col).alias("vid"),
        codes.alias("codes"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("nrm"),
    )


def _finalize_topk(
    exact: DataFrame, k: int, vid_col: str, decimal_rescore: bool
) -> DataFrame:
    """Final top-k cut shared by the PQ serve paths (``exact`` carries
    qid, q_vec, c_vec, <vid_col>, cosine).  With ``decimal_rescore`` the
    double-ranked top k+30 survivors are rescored with the exact
    DECIMAL(28,14) fold — dot and both norms — and re-ranked before the
    final cut (the same two-phase device as ``ivf.ann_topk_ivf``), so
    reported cosines are bit-identical to a DuckDB decimal oracle.

    The FINAL rank key is the ROUNDED cosine (the emitted value and the
    oracle's rank key) so rounded ties break by id in both engines; the
    k+30 prefilter still ranks on the raw double (margin logic)."""
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc_nulls_last(), F.col(vid_col)
    )
    if decimal_rescore:
        from dataengineeringworkshop_spark.llmops.expr import DOT_DECIMAL

        exact = (
            exact.withColumn("pre2", F.row_number().over(w))
            .filter(F.col("pre2") <= k + 30)
            .withColumn(
                "cosine",
                F.expr(DOT_DECIMAL.format(a="q_vec", b="c_vec"))
                / F.sqrt(
                    F.expr(DOT_DECIMAL.format(a="q_vec", b="q_vec"))
                    * F.expr(DOT_DECIMAL.format(a="c_vec", b="c_vec"))
                ),
            )
        )
    w_final = Window.partitionBy("qid").orderBy(
        F.round(F.col("cosine"), 6).desc_nulls_last(), F.col(vid_col)
    )
    return (
        exact.withColumn("sim_rank", F.row_number().over(w_final))
        .filter(F.col("sim_rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col(vid_col).alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "sim_rank",
        )
    )


def ann_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 50,
    seed: int = 42,
    index_key: str | None = None,
    decimal_rescore: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, sim_rank) — ADC candidate scan
    over PQ codes + exact-cosine rerank of the top ``rerank`` candidates
    per query.  Cosines in the output are EXACT (computed against true
    vectors); PQ only chooses which candidates reach the rerank."""
    dsub = dim // m
    books = train_codebooks(
        corpus, vec_col, dim, m, ksub, seed, cache_key=index_key
    )
    index = encode_pq(corpus, id_col, vec_col, books)
    if index_key:
        from dataengineeringworkshop_spark.operators.materialize import materialize

        index = materialize(
            index,
            label="pq_index",
            cache_key=f"{index_key}:pq{m}x{ksub}:s{seed}:d{dim}"
            f":v{vec_col}:id{id_col}",
        )
    # per-query ADC lookup table: |Q|·m·ksub partial dots, built as a
    # DataFrame (map-only explode over the codebook literal), collapsed
    # to ONE map per query and broadcast — bounded by the query batch
    cb = F.expr(_codebook_sql(books))
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("q_nrm"),
    )
    entries = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.element_at(cb, j + 1),
                lambda cent, c: F.struct(
                    (j * F.lit(ksub) + c).cast("int").alias("slot"),
                    F.aggregate(
                        F.zip_with(
                            F.slice(F.col("q_vec"), j * F.lit(dsub) + 1, dsub),
                            cent,
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ).alias("pdot"),
                ),
            ),
        )
    )
    q_lut = q.select(
        "qid", "q_vec", "q_nrm", F.map_from_entries(entries).alias("lut")
    )
    # ADC scan: every (query, corpus) pair costs m map lookups on the
    # 1-byte-per-subspace codes — no vector arithmetic until the rerank
    m_lit = F.lit(m)
    approx = (
        index.join(F.broadcast(q_lut), F.col("vid") != F.col("qid"))
        .withColumn(
            "adc",
            F.aggregate(
                F.sequence(F.lit(0), m_lit - 1),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    F.col("lut"),
                    (j * F.lit(ksub) + F.element_at(F.col("codes"), j + 1)).cast(
                        "int"
                    ),
                ),
            ),
        )
    )
    w_pre = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("vid"))
    cand = approx.withColumn("pre_rank", F.row_number().over(w_pre)).filter(
        F.col("pre_rank") <= rerank
    )
    # exact rerank: true vectors fetched for the bounded candidate set
    true_vecs = corpus.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec")
    )
    exact = (
        cand.select("qid", "q_vec", "q_nrm", "vid", "nrm")
        .join(true_vecs, "vid")
        .withColumn(
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("nrm")), F.lit(0.0)),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return _finalize_topk(exact, k, "vid", decimal_rescore)


def _centroids_sql(centroid_rows: list) -> str:
    """nlist×dim array literal (same device as the IVF assigner)."""
    return "array({})".format(
        ", ".join(
            "array({})".format(", ".join(repr(float(x)) for x in c))
            for _, c in sorted(centroid_rows)
        )
    )


def ann_topk_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 50,
    seed: int = 42,
    index_key: str | None = None,
    decimal_rescore: bool = False,
) -> DataFrame:
    """IVF-PQ (the full FAISS ``IVFADC`` construction, relational):
    coarse cells bound how many vectors a probe SCANS (nprobe/nlist of
    the corpus), PQ residual codes bound what each scanned vector COSTS
    (m byte-sized code lookups).  dot(q, x) = dot(q, centroid(cell)) +
    dot(q, residual) — the first term is one per (query, probed cell),
    the second is the per-query LUT sum over the RESIDUAL codebooks
    (trained on x − centroid, the standard variance-reduction trick
    that makes PQ codes much tighter than raw-vector codes).  Exact
    cosine rerank of the top ``rerank`` ADC candidates, so reported
    scores are exact."""
    from dataengineeringworkshop_spark.llmops.ivf import (
        _nearest_cells,
        _train_centroid_rows,
    )

    dsub = dim // m
    centroid_rows = _train_centroid_rows(
        corpus, vec_col, nlist, seed, max_iter=5, max_train_rows=100_000,
        cache_key=index_key,
    )
    cents = F.expr(_centroids_sql(centroid_rows))
    v = F.col(vec_col).cast("array<double>")
    cell = (
        F.element_at(_nearest_cells(F.col(vec_col), centroid_rows, 1), 1)
        .getField("cell_id")
    )
    residual = F.zip_with(v, F.element_at(cents, cell + 1), lambda x, y: x - y)
    residuals = corpus.select(
        F.col(id_col).alias("rid"),
        F.col(vec_col).alias("orig_vec"),
        cell.alias("cell_id"),
        residual.alias("rvec"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("nrm"),
    )
    if index_key:
        # the residual projection (argmin over nlist centroids + vector
        # subtraction) feeds m sequential KMeans fits — each of which
        # re-evaluates its UNCACHED input once per iteration — plus the
        # encode pass: left lazy, the projection recomputes ~m×iters
        # times (round-9 sf1 sweep: 455 s, almost all of it here).
        # Materialize it once: it IS the residual table an IVFADC build
        # writes before codebook training.
        from dataengineeringworkshop_spark.operators.materialize import materialize

        residuals = materialize(
            residuals,
            label="ivfpq_residuals",
            cache_key=f"{index_key}:ivfpq{nlist}:s{seed}:d{dim}"
            f":v{vec_col}:id{id_col}:resid",
        )
    books = train_codebooks(
        residuals, "rvec", dim, m, ksub, seed,
        cache_key=f"{index_key}:ivf{nlist}resid" if index_key else None,
    )
    enc = encode_pq(residuals, "rid", "rvec", books).withColumnRenamed(
        "vid", "rid"
    ).drop("nrm")
    index = residuals.select("rid", "cell_id", "nrm").join(enc, "rid")
    if index_key:
        from dataengineeringworkshop_spark.operators.materialize import materialize

        index = materialize(
            index,
            label="ivfpq_index",
            cache_key=f"{index_key}:ivfpq{nlist}x{m}x{ksub}:s{seed}:d{dim}"
            f":v{vec_col}:id{id_col}",
        )
    # probe side: nprobe cells per query, dot(q, centroid) per probed
    # cell, and the residual-codebook LUT per query — all bounded by |Q|
    cb = F.expr(_codebook_sql(books))
    qv = F.col(vec_col).cast("array<double>")
    q = queries.select(
        F.col(id_col).alias("qid"),
        qv.alias("q_vec"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("q_nrm"),
        F.explode(
            F.transform(
                _nearest_cells(F.col(vec_col), centroid_rows, nprobe),
                lambda s: s.getField("cell_id"),
            )
        ).alias("cell_id"),
    ).withColumn(
        "q_dot_cent",
        F.aggregate(
            F.zip_with(
                F.col("q_vec"),
                F.element_at(F.expr(_centroids_sql(centroid_rows)), F.col("cell_id") + 1),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, d: acc + d,
        ),
    )
    entries = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.transform(
                F.element_at(cb, j + 1),
                lambda cent, c: F.struct(
                    (j * F.lit(ksub) + c).cast("int").alias("slot"),
                    F.aggregate(
                        F.zip_with(
                            F.slice(F.col("q_vec"), j * F.lit(dsub) + 1, dsub),
                            cent,
                            lambda x, y: x * y,
                        ),
                        F.lit(0.0),
                        lambda acc, d: acc + d,
                    ).alias("pdot"),
                ),
            ),
        )
    )
    q_probe = q.select(
        "qid", "q_vec", "q_nrm", "cell_id", "q_dot_cent",
        F.map_from_entries(entries).alias("lut"),
    )
    scored = (
        index.join(F.broadcast(q_probe), "cell_id")
        .filter(F.col("rid") != F.col("qid"))
        .withColumn(
            "adc",
            F.col("q_dot_cent")
            + F.aggregate(
                F.sequence(F.lit(0), F.lit(m - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + F.element_at(
                    F.col("lut"),
                    (j * F.lit(ksub) + F.element_at(F.col("codes"), j + 1)).cast(
                        "int"
                    ),
                ),
            ),
        )
    )
    w_pre = Window.partitionBy("qid").orderBy(F.col("adc").desc(), F.col("rid"))
    cand = scored.withColumn("pre_rank", F.row_number().over(w_pre)).filter(
        F.col("pre_rank") <= rerank
    )
    true_vecs = corpus.select(
        F.col(id_col).alias("rid"), F.col(vec_col).alias("c_vec")
    )
    exact = (
        cand.select("qid", "q_vec", "q_nrm", "rid", "nrm")
        .join(true_vecs, "rid")
        .withColumn(
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("nrm")), F.lit(0.0)),
        )
        .filter(F.col("cosine").isNotNull())
    )
    return _finalize_topk(exact, k, "rid", decimal_rescore)
