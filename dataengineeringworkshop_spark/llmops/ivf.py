"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantization scale path, complementing the hyperplane-LSH variant in
``similarity.py``.

Construction (FAISS IVF-Flat shape, relational):

1. **Train**: k-means (MLlib, fixed seed → deterministic) over a bounded
   corpus sample gives ``nlist`` centroids — tiny driver-side model
   (nlist×dim doubles: broadcastable metadata, not data).
2. **Assign**: cell assignment is a PURE MAP — the centroid table is
   inlined as an array literal and each vector computes its argmin-L2
   cell with ``transform``/``sort_array`` JVM expressions.  No join, no
   window, zero shuffle; at 100 TB this is embarrassingly parallel and
   the materialized index can be parquet-partitioned by cell_id so a
   probe is a partition-pruned scan.
3. **Probe**: queries pick their ``nprobe`` nearest cells the same
   map-only way; candidates come from BROADCASTING the (small) probe set
   against the materialized index on cell_id — never a cross join, never
   a corpus shuffle.  Exact JVM-expression cosine reranks and a window
   takes top-k: the ONLY shuffle in the whole probe is the final
   per-query top-k.

Scan fraction ≈ nprobe/nlist of the corpus per query — the classic IVF
trade: recall vs cells probed (measured in tests/test_llmops.py against
the brute-force baseline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: trained-quantizer cache: key -> [(cell_id, centroid)].  An IVF index's
#: coarse quantizer is trained once and SERVED many times — rebuilding it
#: per query would be like rebuilding a b-tree per lookup.
_CENTROID_CACHE: dict[str, list] = {}

from dataengineeringworkshop_spark.llmops.expr import DOT_DOUBLE as _DOT


def _train_centroid_rows(
    corpus: DataFrame,
    vec_col: str,
    nlist: int,
    seed: int,
    max_iter: int,
    max_train_rows: int,
    cache_key: str | None,
) -> list:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # the key must encode EVERY input that determines the centroids —
    # omitting max_train_rows/vec_col here served stale centroids to a
    # caller that varied them (round-9 fix; pinned in
    # tests/test_materialize_cache.py)
    full_key = (
        f"{cache_key}:k{nlist}:s{seed}:i{max_iter}:r{max_train_rows}:v{vec_col}"
        if cache_key
        else None
    )
    if full_key is not None and full_key in _CENTROID_CACHE:
        return _CENTROID_CACHE[full_key]
    train = corpus.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    ).limit(max_train_rows)
    model = KMeans(k=nlist, seed=seed, maxIter=max_iter).fit(train)
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
    if full_key is not None:
        _CENTROID_CACHE[full_key] = rows
    return rows


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

    MLlib's k-means|| init with a fixed seed is deterministic.  Training
    reads at most ``max_train_rows`` vectors: coarse-quantizer quality
    needs a representative sample, not the full corpus (at 100 TB you
    never fit k-means on every vector)."""
    rows = _train_centroid_rows(
        corpus, vec_col, nlist, seed, max_iter, max_train_rows, cache_key
    )
    # Arrow local relation, not a pickled-row parallelize: the list form
    # plans as a Python-RDD scan whose tasks each need a plain Python
    # worker (measured 2-18 s of worker-spawn wait for nlist rows —
    # OPTIMIZATION_r13.md); the Arrow conversion is driver-side and the
    # executors see JVM rows only
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["cell_id", "centroid"])
    return corpus.sparkSession.createDataFrame(
        pdf, "cell_id INT, centroid ARRAY<DOUBLE>"
    )


#: parsed centroid-literal memo: the array<array<double>> literal for a
#: trained quantizer is identical on every probe, but ``F.expr`` re-parses
#: it through py4j per call (~50-90 ms for nlist×dim doubles — measured
#: round-14).  Columns are immutable plan fragments, so reusing the parsed
#: literal is sound within one SparkContext; the memo is dropped wholesale
#: when the context changes (the fragments wrap JVM objects that die with
#: it).  Bounded by the number of distinct trained quantizers.
_CENT_LITERAL_MEMO: dict[tuple, Column] = {}


def _nearest_cells(vec: Column, centroid_rows: list, n_cells: int) -> Column:
    """array<struct<d,cell_id>> of the ``n_cells`` nearest centroids —
    pure expression, no shuffle.  Sorted by (sq_dist asc, cell_id asc):
    struct ordering gives the deterministic tiebreak for free."""
    # ONE SQL-parsed literal, not nlist×dim F.lit() Py4J round-trips —
    # building the literal column-by-column costs more driver time than
    # the whole probe
    cents_sql = "array({})".format(
        ", ".join(
            "array({})".format(", ".join(repr(float(x)) for x in centroid))
            for _, centroid in sorted(centroid_rows)
        )
    )
    # key on the live SparkContext too: the parsed Column wraps a JVM
    # object, which dies with the context (tests stop/start sessions)
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context  # noqa: SLF001
    ctx_key = ctx.applicationId if ctx is not None else None  # unique per context
    if any(k[0] != ctx_key for k in _CENT_LITERAL_MEMO):
        _CENT_LITERAL_MEMO.clear()  # old context's fragments are dead
    memo_key = (ctx_key, cents_sql)
    cents = _CENT_LITERAL_MEMO.get(memo_key)
    if cents is None:
        cents = F.expr(cents_sql)
        _CENT_LITERAL_MEMO[memo_key] = cents
    v = vec.cast("array<double>")
    dist_structs = F.transform(
        cents,
        lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, d: acc + d,
            ).alias("d"),
            i.cast("int").alias("cell_id"),
        ),
    )
    return F.slice(F.sort_array(dist_structs), 1, n_cells)


def assign_cells(
    df: DataFrame, centroids: DataFrame, id_col: str, vec_col: str, n_cells: int = 1
) -> DataFrame:
    """(vid, cell_id, cell_rank): each vector's ``n_cells`` nearest
    centroids by L2 — map-only (centroids inlined as a literal; argmin
    via transform/sort_array), so assignment never shuffles the corpus."""
    rows = [(r.cell_id, list(r.centroid)) for r in centroids.collect()]
    nearest = _nearest_cells(F.col(vec_col), rows, n_cells)
    return (
        df.select(
            F.col(id_col).alias("vid"),
            F.posexplode(nearest).alias("rank0", "cell"),
        )
        .select(
            "vid",
            F.col("cell.cell_id").alias("cell_id"),
            (F.col("rank0") + 1).alias("cell_rank"),
        )
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
    decimal_rescore: bool = False,
) -> DataFrame:
    """(query_id, neighbor_id, cosine, sim_rank) — IVF probe + exact rerank.

    With ``index_key`` the inverted lists (vid, cell_id, vector) are
    built once and materialized to parquet — index-build vs serve
    separation; the probe then touches only the index artifact.

    ``decimal_rescore``: rescore the double-ranked top (k+30) candidates
    per query with the exact DECIMAL(28,14) fold (dot AND both norms) and
    re-rank before the final cut — the same two-phase device as
    ``sim_cosine_topk``, making cosines bit-identical to a DuckDB decimal
    oracle.  Rescore cost is O(|Q|·(k+30)·d), probe-set-bounded."""
    centroid_rows = _train_centroid_rows(
        corpus, vec_col, nlist, seed, max_iter=5, max_train_rows=100_000,
        cache_key=index_key,
    )
    # index BUILD: map-only cell assignment carried with the vector, so a
    # probe needs no join back to the corpus table.  The vector's squared
    # norm is part of the index artifact: computed once per vector at
    # build time, not once per (query, vector) pair at probe time —
    # probe-side pair work drops from 3 dot products to 1
    from dataengineeringworkshop_spark.operators.fanout import fan_out

    # index-build map (argmin over nlist centroids + the norm fold per
    # vector) fans out behind the one-row-group testdata scan — gated,
    # no-op on a wide production scan (guide §2.5)
    c_index = fan_out(corpus.select(id_col, vec_col)).select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(_nearest_cells(F.col(vec_col), centroid_rows, 1), 1)
        .getField("cell_id")
        .alias("cell_id"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("c_nrm"),
    )
    if index_key:
        from dataengineeringworkshop_spark.operators.materialize import materialize

        c_index = materialize(
            c_index,
            label="ivf_index",
            cache_key=f"{index_key}:k{nlist}:s{seed}:cells:v{vec_col}:id{id_col}",
        )
    # PROBE: queries assigned to their nprobe cells map-only, then
    # broadcast against the index — a corpus vector lives in exactly one
    # cell, so (qid, vid) pairs are already unique: no distinct needed
    q_probe = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("q_vec"),
        F.expr(_DOT.format(a=vec_col, b=vec_col)).alias("q_nrm"),
        F.explode(
            F.transform(
                _nearest_cells(F.col(vec_col), centroid_rows, nprobe),
                lambda s: s.getField("cell_id"),
            )
        ).alias("cell_id"),
    )
    scored = (
        c_index.join(F.broadcast(q_probe), "cell_id")
        .filter(F.col("qid") != F.col("vid"))
        .withColumn(
            # zero-norm guard: 0/0 = NaN would outrank every real cosine
            "cosine",
            F.expr(_DOT.format(a="q_vec", b="c_vec"))
            / F.nullif(F.sqrt(F.col("q_nrm") * F.col("c_nrm")), F.lit(0.0)),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc_nulls_last(), F.col("vid"))
    # final rank key = the ROUNDED cosine (the emitted value and the
    # oracle's rank key): distinct raw cosines that round equal must
    # tie-break by vid in both engines; raw doubles are not
    # engine-stable at the 14th digit (decimal cast rounding modes)
    w_final = Window.partitionBy("qid").orderBy(
        F.round(F.col("cosine"), 6).desc_nulls_last(), F.col("vid")
    )
    if decimal_rescore:
        from dataengineeringworkshop_spark.llmops.expr import DOT_DECIMAL

        # double ranking prefilters with a 3× rank margin (double-vs-
        # decimal disagreement is ~1e-13 relative; the k → k+30 cosine
        # gap is orders larger), then the survivors alone pay the exact
        # decimal arithmetic
        cand = (
            scored.filter(F.col("cosine").isNotNull())
            .withColumn("pre_rank", F.row_number().over(w))
            .filter(F.col("pre_rank") <= k + 30)
        )
        exact = cand.withColumn(
            "cosine",
            F.expr(DOT_DECIMAL.format(a="q_vec", b="c_vec"))
            / F.sqrt(
                F.expr(DOT_DECIMAL.format(a="q_vec", b="q_vec"))
                * F.expr(DOT_DECIMAL.format(a="c_vec", b="c_vec"))
            ),
        )
        w2 = Window.partitionBy("qid").orderBy(
            F.round(F.col("cosine"), 6).desc_nulls_last(), F.col("vid")
        )
        return (
            exact.withColumn("sim_rank", F.row_number().over(w2))
            .filter(F.col("sim_rank") <= k)
            .select(
                F.col("qid").alias("query_id"),
                F.col("vid").alias("neighbor_id"),
                F.round("cosine", 6).alias("cosine"),
                "sim_rank",
            )
        )
    return (
        scored.filter(F.col("cosine").isNotNull())  # zero-norm pairs: no result
        .withColumn("sim_rank", F.row_number().over(w_final))
        .filter(F.col("sim_rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            F.round("cosine", 6).alias("cosine"),
            "sim_rank",
        )
    )
