"""LLM-ops registry entries.  MinHash/SimHash/ANN are not expressible in
portable SQL (xxhash64/numpy hyperplanes) → registered WITHOUT oracle
(driver rows-only check); their correctness is pytest-verified against
brute-force ground truth (tests/test_llmops.py).  Quality score and
multimodal metadata are deterministic built-in expressions → oracle-paired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import kbucket, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views


@query("mh_minhash_lsh_dedup", bench=True, tags=("ext-dedup",))
def mh_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidates + exact-Jaccard verify
    (threshold 0.3) over documents.  Rows-only driver check; pytest
    verifies against brute-force Jaccard."""
    from dataengineeringworkshop_spark.llmops.minhash import minhash_dedup_pairs

    d = load_table(spark, sf_dir, "documents")
    return minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3,
        index_key=f"documents:{sf_dir}",
    )


from dataengineeringworkshop_spark.plans.textops import (  # noqa: E402
    _JACCARD_DUCK,
    _JACCARD_MAXDF,
)


@query(
    "d_dup_clusters",
    oracle=f"""
        WITH RECURSIVE pairs AS (
            {_JACCARD_DUCK.format(maxdf=_JACCARD_MAXDF)}
        ),
        edges AS (
            SELECT d1 AS u, d2 AS v FROM pairs
            UNION SELECT d2, d1 FROM pairs
        ),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        )
        SELECT u AS member, LEAST(u, MIN(v)) AS component
        FROM reach GROUP BY u
    """,
    tags=("ext-dedup", "iterative"),
)
def d_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the word-3-gram Jaccard pair list:
    iterative min-label propagation (map-reduce connected components) on
    the Spark side vs a recursive-CTE transitive closure in DuckDB — an
    iterative algorithm with a genuine independent oracle."""
    from dataengineeringworkshop_spark.llmops.clusters import connected_components
    from dataengineeringworkshop_spark.plans.textops import d_ngram_jaccard_pairs

    pairs = d_ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    return connected_components(pairs)


@query("d_dedup_survivors", tags=("ext-dedup", "iterative"))
def d_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup contract: MinHash-LSH pairs → components → keep
    one survivor per cluster + all unimplicated docs.  Rows-only check;
    pytest verifies against a python union-find on the same pairs."""
    from dataengineeringworkshop_spark.llmops.clusters import dedup_survivors
    from dataengineeringworkshop_spark.llmops.minhash import minhash_dedup_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3,
        index_key=f"documents:{sf_dir}",
    ).select("d1", "d2")
    return dedup_survivors(d.select("doc_id", "lang", "source"), "doc_id", pairs)


@query("sh_simhash_fingerprints", tags=("ext-dedup",))
def sh_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash fingerprint per document (token-frequency weighted)."""
    from dataengineeringworkshop_spark.llmops.simhash import simhash

    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text")


def _query_sample(e, n: int = 32):
    """Fixed-size deterministic query batch (overflow-free Knuth hash
    order, ties by id).  A query set defined as a PERCENTAGE of the
    corpus (the old ``vec_id % 100 == 0``) grows with the data, so
    probe work scales O(N·|Q|) = O(N²/100) — the sf1 smoke measured
    ann_ivf_topk at 56× on 10× data.  ANN serving has a bounded query
    batch against a growing corpus; a fixed sample restores O(N) and
    makes the broadcast-the-queries contract true by construction."""
    return (
        e.orderBy(
            F.expr(kbucket("CAST(vec_id AS BIGINT)", 1000000007)),
            F.col("vec_id"),
        )
        .limit(n)
        .select("vec_id", "embedding")
    )


@query("ann_lsh_topk", bench=True, tags=("ext-sim",))
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucket candidates + exact rerank, top-10
    for a fixed 32-vector deterministic query batch.  Pytest measures
    recall vs the brute-force oracle-paired sim_cosine_topk."""
    from dataengineeringworkshop_spark.llmops.similarity import ann_topk_lsh

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_lsh(
        e, q, "vec_id", "embedding", dim=64, k=10, nbits=32, bands=8,
        index_key=f"embeddings:{sf_dir}",
    )


@query("ann_ivf_topk", bench=True, tags=("ext-sim", "ivf"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: k-means coarse quantizer (MLlib, fixed seed),
    inverted-list probe as an equi join on cell_id, exact cosine rerank
    over a fixed 32-vector deterministic query batch (norms precomputed
    in the index/probe, one dot product per scored pair).  Scan fraction
    ≈ nprobe/nlist per query.  Pytest measures recall vs the brute-force
    oracle-paired sim_cosine_topk."""
    from dataengineeringworkshop_spark.llmops.ivf import ann_topk_ivf

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_ivf(
        e, q, "vec_id", "embedding", k=10, nlist=16, nprobe=4,
        index_key=f"embeddings:{sf_dir}",
    )


@query(
    "mm_media_metadata",
    oracle="""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
               octet_length(CAST(text AS BLOB)) AS n_bytes,
               n_chars AS declared_bytes
        FROM documents
    """,
    tags=("ext-mm",),
)
def mm_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary content column + typed metadata
    extraction (byte length vs declared size) — the schema/partitioning
    layer under the stubbed decoders."""
    from dataengineeringworkshop_spark.llmops.multimodal import documents_as_media

    d = load_table(spark, sf_dir, "documents")
    m = documents_as_media(d)
    return m.select(
        "media_id",
        "media_type",
        F.length("content").cast("long").alias("n_bytes"),
        "declared_bytes",
    )


@query("mm_resize_fake", tags=("ext-mm",))
def mm_resize_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas resize plumbing (deterministic stub — no image libs in
    this container): fixed 32×32×3 output payloads."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        documents_as_media,
        resize_media,
    )

    d = load_table(spark, sf_dir, "documents")
    return resize_media(documents_as_media(d), width=32, height=32, fake=True)


@query("mm_byte_features", tags=("ext-mm",))
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real binary-content features: 64-bin byte histogram + Shannon
    entropy per payload (numpy inside mapInPandas, Arrow-batched).
    Rows-only driver check; pytest asserts normalization + determinism."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        byte_histogram_features,
        documents_as_media,
    )

    d = load_table(spark, sf_dir, "documents")
    return byte_histogram_features(documents_as_media(d), dim=64)


@query("mm_decode_fake", tags=("ext-mm",))
def mm_decode_fake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode stub: deterministic fake metadata per media row
    (real decoders are stubbed — container has no media libs)."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        decode_media,
        documents_as_media,
    )

    d = load_table(spark, sf_dir, "documents")
    return decode_media(documents_as_media(d), fake=True)


@query(
    "t_quality_score",
    oracle="""
        SELECT doc_id,
               ROUND(
                 0.4 * least(LENGTH(text) / 500.0, 1.0)
               + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0)
               + 0.3 * (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.5 END), 6) AS quality_score
        FROM documents
    """,
    tags=("ext-text",),
)
def t_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (length + richness + lang prior)
    — the filter signal a training-data pipeline thresholds on."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT doc_id,
               ROUND(CAST(
                 CAST(0.4 AS DOUBLE) * least(LENGTH(text) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * least(size(split(text, ' ')) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * (CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
               AS DOUBLE), 6) AS quality_score
        FROM dew_documents
        """
    )
