"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantization scale path, complementing the hyperplane-LSH variant in
``similarity.py``.

Construction (FAISS IVF-Flat shape, relational):

1. **Train**: k-means (MLlib, fixed seed → deterministic) over the corpus
   embeddings gives ``nlist`` centroids — tiny driver-side model.
2. **Assign**: every corpus vector joins the broadcast centroid table and
   keeps its argmin-L2 cell → the inverted lists are just a (cell_id)
   column; at scale you ``repartition(cell_id)`` / partition the parquet
   by cell so a probe is a partition-pruned scan.
3. **Probe**: each query picks its ``nprobe`` nearest cells, then
   candidates come from an EQUI join on cell_id (never a cross join);
   exact JVM-expression cosine reranks and a window takes top-k.

Scan fraction ≈ nprobe/nlist of the corpus per query — the classic IVF
trade: recall vs cells probed (measured in tests/test_llmops.py against
the brute-force baseline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: trained-quantizer cache: key -> [(cell_id, centroid)].  An IVF index's
#: coarse quantizer is trained once and SERVED many times — rebuilding it
#: per query would be like rebuilding a b-tree per lookup.
_CENTROID_CACHE: dict[str, list] = {}

from dataengineeringworkshop_spark.llmops.expr import DOT_DOUBLE as _DOT


def train_centroids(
    corpus: DataFrame,
    vec_col: str,
    nlist: int = 16,
    seed: int = 42,
    max_iter: int = 5,
    max_train_rows: int = 100_000,
    cache_key: str | None = None,
) -> DataFrame:
    """k-means centroids as a (cell_id, centroid array<double>) DataFrame.

    MLlib's k-means|| init with a fixed seed is deterministic; the model
    itself is nlist×dim doubles — broadcastable metadata, not data.
    Training reads at most ``max_train_rows`` vectors: coarse-quantizer
    quality needs a representative sample, not the full corpus (at 100 TB
    you never fit k-means on every vector)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = corpus.sparkSession
    full_key = f"{cache_key}:k{nlist}:s{seed}:i{max_iter}" if cache_key else None
    if full_key is not None and full_key in _CENTROID_CACHE:
        rows = _CENTROID_CACHE[full_key]
    else:
        train = corpus.select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
        ).limit(max_train_rows)
        model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(train)
        rows = [
            (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
        ]
        if full_key is not None:
            _CENTROID_CACHE[full_key] = rows
    return spark.createDataFrame(rows, "cell_id INT, centroid ARRAY<DOUBLE>")


def assign_cells(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, n_cells: int = 1
) -> DataFrame:
    """(id, cell_id, cell_rank): each vector's ``n_cells`` nearest
    centroids by L2.  Broadcast join (centroid table is tiny) + window
    argmin — the blowup is nlist× on a two-column projection only."""
    sq_dist = F.expr(
        "aggregate(zip_with(CAST(v AS ARRAY<DOUBLE>), centroid, (x, y) -> (x - y) * (x - y)), "
        "CAST(0.0 AS DOUBLE), (acc, d) -> acc + d)"
    )
    w = Window.partitionBy("vid").orderBy(F.col("sq_dist").asc(), F.col("cell_id").asc())
    return (
        df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
        .join(F.broadcast(centroids))
        .withColumn("sq_dist", sq_dist)
        .withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= n_cells)
        .select("vid", "cell_id", "cell_rank")
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    index_key: str | None = None,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, sim_rank) — IVF probe + exact rerank."""
    centroids = train_centroids(
        corpus, vec_col, nlist=nlist, seed=seed, cache_key=index_key
    )
    c_cells = assign_cells(corpus, centroids, id_col, vec_col, n_cells=1).select(
        "vid", "cell_id"
    )
    q_cells = assign_cells(queries, centroids, id_col, vec_col, n_cells=nprobe).select(
        F.col("vid").alias("qid"), "cell_id"
    )
    c_vec = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("c_vec"))
    q_vec = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("q_vec"))

    cand = (
        q_cells.join(c_cells, "cell_id")  # equi join on cell — the IVF probe
        .filter(F.col("qid") != F.col("vid"))
        .select("qid", "vid")
        .distinct()
    )
    scored = (
        cand.join(c_vec, "vid")
        .join(F.broadcast(q_vec), "qid")
        .withColumn("q_nrm", F.expr(_DOT.format(a="q_vec", b="q_vec")))
        .withColumn("c_nrm", F.expr(_DOT.format(a="c_vec", b="c_vec")))
        .withColumn(
            # zero-norm guard: 0/0 = NaN would outrank every real cosine
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("c_nrm")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc_nulls_last(), F.col("vid"))
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
