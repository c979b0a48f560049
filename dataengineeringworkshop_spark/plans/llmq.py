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


#: exhaustive word-3-gram shingle intersection CTEs (DuckDB) — the exact
#: pair machinery shared by the minhash-dedup oracle and the
#: dedup-survivors oracle built on top of those pairs
_MH_SHINGLE_PAIRS_CTE = """
        tok AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN []
                                           ELSE [array_to_string(list_slice(w, i, i + 2), ' ')
                                                 FOR i IN range(1, len(w) - 1)] END) AS shingle
                FROM tok
            )
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        rawpairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
"""


@query(
    "mh_minhash_lsh_dedup",
    oracle=f"""
        WITH {_MH_SHINGLE_PAIRS_CTE}
        SELECT d1, d2,
               ROUND(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6) AS jaccard
        FROM rawpairs
        JOIN sizes s1 ON d1 = s1.doc_id
        JOIN sizes s2 ON d2 = s2.doc_id
        WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.3
    """,
    bench=True,
    tags=("ext-dedup",),
)
def mh_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(64) + 16-band LSH candidates + exact-Jaccard verify
    (threshold 0.3) over documents, hash-checked against a DuckDB oracle
    computing EXHAUSTIVE all-pairs word-3-gram Jaccard (no LSH, no df
    cap).  Oracle equality is a real recall statement: every true pair
    in the testdata sits at j ≥ 0.89 (P(LSH miss at b=16, r=4) < 1e-7
    per pair, and xxhash64 minhashing is deterministic, so the result is
    a fixed set — verified equal at sf0.001 and sf0.01).  In a corpus
    with pairs barely above the threshold, banded LSH can drop them —
    raise bands (b=64, r=1) when exhaustive recall at low thresholds
    matters more than candidate volume."""
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


@query(
    "d_dedup_survivors",
    # the LSH pair set provably equals the exhaustive-Jaccard pair set on
    # this testdata (see mh_minhash_lsh_dedup: every true pair sits at
    # j >= 0.89, P(LSH miss) < 1e-7), so survivors derived from it are
    # directly oracle-able: transitive closure of the exact pairs ->
    # drop every non-minimum cluster member
    oracle=f"""
        WITH RECURSIVE {_MH_SHINGLE_PAIRS_CTE},
        mp AS (
            SELECT d1, d2
            FROM rawpairs
            JOIN sizes s1 ON d1 = s1.doc_id
            JOIN sizes s2 ON d2 = s2.doc_id
            WHERE CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) >= 0.3
        ),
        edges AS (SELECT d1 AS u, d2 AS v FROM mp UNION SELECT d2, d1 FROM mp),
        reach(u, v) AS (
            SELECT u, v FROM edges
            UNION
            SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
        ),
        losers AS (
            SELECT u AS member FROM reach GROUP BY u
            HAVING u <> LEAST(u, MIN(v))
        )
        SELECT doc_id, lang, source FROM documents
        WHERE doc_id NOT IN (SELECT member FROM losers)
    """,
    tags=("ext-dedup", "iterative"),
)
def d_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup contract: MinHash-LSH pairs → components → keep
    one survivor per cluster + all unimplicated docs.  Hash-checked
    against a DuckDB oracle that recomputes the pairs exhaustively
    (exact Jaccard, no LSH), closes them transitively with a recursive
    CTE, and anti-selects non-minimum cluster members; pytest
    additionally verifies against a python union-find on the same
    pairs."""
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
    """64-bit SimHash fingerprint per document (token-frequency weighted).
    Raw xxhash64-derived fingerprints are not SQL-expressible → rows-only
    driver check; ``sh_simhash_dup_pairs`` is the hash-oracled driver row
    for this family, and pytest pins distance-0 ground truth."""
    from dataengineeringworkshop_spark.llmops.simhash import simhash

    d = load_table(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text")


#: planted-duplicate id gap for sh_simhash_dup_pairs — the actual plant
#: offset is MAX(doc_id) + this gap, computed from the data, so plant
#: ids can NEVER collide with real ids regardless of the corpus's id
#: space (a fixed 1e7 offset collided with the ~1e9-offset replica ids
#: of the scaled sf1 fixture and silently dropped pairs)
_SH_PLANT_GAP = 10_000_000


@query(
    "sh_simhash_dup_pairs",
    oracle=f"""
        SELECT CAST(doc_id AS BIGINT) AS d1,
               CAST(doc_id AS BIGINT)
                   + (SELECT CAST(MAX(doc_id) AS BIGINT) + {_SH_PLANT_GAP}
                      FROM documents) AS d2
        FROM documents WHERE doc_id % 7 = 0
    """,
    tags=("ext-dedup",),
)
def sh_simhash_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash end-to-end recall check with a DuckDB hash oracle: every
    7th document is re-planted under doc_id+10M, the full pipeline
    (tokenize → weighted bit-sum fingerprint → 4×16-bit band bucketing →
    hamming filter at distance 0) runs over the augmented corpus, and
    the output is the (original, plant) pairs found.  The oracle is the
    planting rule itself — any bug that loses a fingerprint bit, drops a
    band bucket, or mis-assembles the 64-bit word loses pairs and breaks
    the hash.  (Identical text ⇒ identical fingerprint is exact, so this
    checks recall; hamming-0 collisions between *different* near-dup
    texts are a documented property of SimHash, not a defect, and are
    excluded by the d2 = d1+offset filter.)"""
    from dataengineeringworkshop_spark.llmops.simhash import simhash_near_pairs

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # bounded scalar collect: the plant offset is data-derived so plant
    # ids sit strictly above every real id (see _SH_PLANT_GAP note)
    offset = int(d.agg(F.max("doc_id")).first()[0]) + _SH_PLANT_GAP
    planted = d.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(offset)
    )
    aug = d.unionByName(planted)
    # max_bucket=4096: recall of the banded pair search is complete only
    # for pairs whose band buckets pass the quadratic guard; replica-
    # heavy fixtures (the scaled sf1 corpus measures a 2032-max bucket)
    # trip the 256 production default and silently lose plant pairs.
    # 4096 keeps the guard (worst bucket 16.7M candidate pairs, bounded)
    # while covering every fixture with 2x headroom.
    pairs = simhash_near_pairs(aug, "doc_id", "text", max_hamming=0, max_bucket=4096)
    return pairs.filter(
        F.col("d2") == F.col("d1") + F.lit(offset)
    ).select(F.col("d1").cast("long").alias("d1"), F.col("d2").cast("long").alias("d2"))


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


@query("ann_pq_topk", tags=("ext-sim", "pq"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (FAISS ADC shape, relational): 8×16
    codebooks quantize each 64-d vector to 8 one-byte codes (64×
    compression — the memory-bound 100 TB serving path), approximate
    dots are per-query lookup-table sums over the code arrays (JVM
    ``aggregate``, broadcast LUT), and the top-60 ADC candidates per
    query are reranked with exact cosine against true vectors.  Learned
    codebooks are not SQL-expressible → rows-only driver check; pytest
    measures recall vs the brute-force exact answer and pins the
    encode's per-subspace argmin."""
    from dataengineeringworkshop_spark.llmops.pq import ann_topk_pq

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_pq(
        e, q, "vec_id", "embedding", dim=64, k=10, rerank=60,
        index_key=f"embeddings:{sf_dir}",
    )


@query("ann_ivfpq_topk", tags=("ext-sim", "ivf", "pq"))
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (FAISS IVFADC, relational): coarse cells bound how many
    vectors a probe scans (nprobe/nlist), PQ RESIDUAL codes bound what
    each scanned vector costs (8 byte-sized lookups instead of a 64-d
    dot product) — dot(q,x) decomposes as dot(q, cell centroid) +
    LUT-sum over the residual codebooks.  Exact-cosine rerank of the
    top ADC candidates.  Learned quantizers → rows-only driver check;
    pytest measures recall vs brute force."""
    from dataengineeringworkshop_spark.llmops.pq import ann_topk_ivfpq

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_ivfpq(
        e, q, "vec_id", "embedding", dim=64, k=10, nlist=16, nprobe=4,
        rerank=60, index_key=f"embeddings:{sf_dir}",
    )


#: brute-force exact cosine top-10 over the deterministic 32-query batch —
#: the shared oracle for every "exact serve" ANN variant (IVF full-probe,
#: PQ full-rerank, IVF-PQ full-probe+full-rerank): each must reproduce
#: this answer bit-for-bit when its approximation knob is opened fully
_EXACT_COSINE_TOPK_ORACLE = f"""
        WITH ex AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS nrm
            FROM ex GROUP BY vec_id
        ),
        qsel AS (
            SELECT vec_id FROM embeddings
            ORDER BY {kbucket('CAST(vec_id AS BIGINT)', 1000000007)}, vec_id
            LIMIT 32
        ),
        qx AS (SELECT vec_id AS qid, i, v FROM ex
               WHERE vec_id IN (SELECT vec_id FROM qsel)),
        dot AS (
            SELECT qx.qid, ex.vec_id AS nid,
                   CAST(SUM(CAST(CAST(qx.v AS DOUBLE) * CAST(ex.v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS dot
            FROM qx JOIN ex ON qx.i = ex.i AND qx.qid <> ex.vec_id
            GROUP BY qx.qid, ex.vec_id
        ),
        scored AS (
            SELECT dot.qid AS query_id, dot.nid AS neighbor_id,
                   ROUND(dot.dot / sqrt(n1.nrm * n2.nrm), 6) AS cosine
            FROM dot JOIN nrm n1 ON dot.qid = n1.vec_id
                     JOIN nrm n2 ON dot.nid = n2.vec_id
        )
        SELECT query_id, neighbor_id, cosine, sim_rank FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cosine DESC, neighbor_id ASC) AS sim_rank
            FROM scored
        ) WHERE sim_rank <= 10
    """


@query(
    "ann_ivf_fullprobe_exact",
    oracle=_EXACT_COSINE_TOPK_ORACLE,
    tags=("ext-sim", "ivf"),
)
def ann_ivf_fullprobe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF served at nprobe = nlist (probe every cell) — the losslessness
    proof for the IVF machinery, hash-checked against the brute-force
    DuckDB cosine oracle.  A vector lives in exactly one cell, so a full
    probe must reproduce exact top-k: any bug in cell assignment, the
    index's carried norms, list union, or ranking breaks the hash.
    Final candidates are decimal-rescored (same two-phase device as
    sim_cosine_topk) so cosines are bit-identical to the oracle's
    DECIMAL(28,14) folds.  ``ann_ivf_topk`` (nprobe=4) is the production
    approximate serve path; its recall vs this exact answer is measured
    in pytest."""
    from dataengineeringworkshop_spark.llmops.ivf import ann_topk_ivf

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_ivf(
        e, q, "vec_id", "embedding", k=10, nlist=16, nprobe=16,
        index_key=f"embeddings:{sf_dir}", decimal_rescore=True,
    )


@query(
    "ann_pq_fullrerank_exact",
    oracle=_EXACT_COSINE_TOPK_ORACLE,
    tags=("ext-sim", "pq"),
)
def ann_pq_fullrerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ served with the rerank window opened to the whole corpus — the
    losslessness proof for the PQ machinery (codebook encode, broadcast
    ADC LUT, code-array aggregate, candidate plumbing, exact-rerank
    join): when every ADC candidate is exact-reranked the output must be
    the brute-force top-k, hash-checked against the DuckDB decimal
    oracle.  Any bug in the encode/LUT indexing or the rerank join
    breaks the hash.  ``ann_pq_topk`` (rerank=60) is the production
    serve path; pytest measures its recall against this exact answer."""
    from dataengineeringworkshop_spark.llmops.pq import ann_topk_pq

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_pq(
        e, q, "vec_id", "embedding", dim=64, k=10, rerank=1_000_000_000,
        index_key=f"embeddings:{sf_dir}", decimal_rescore=True,
    )


@query(
    "ann_ivfpq_fullprobe_exact",
    oracle=_EXACT_COSINE_TOPK_ORACLE,
    tags=("ext-sim", "ivf", "pq"),
)
def ann_ivfpq_fullprobe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with BOTH approximation knobs opened — nprobe = nlist
    (probe every cell) and rerank = corpus (exact-rerank every ADC
    candidate) — so the full IVFADC pipeline (cell assignment, residual
    codebooks, per-cell centroid dot + residual LUT sum, rerank join)
    must reproduce the brute-force top-k bit-for-bit against the DuckDB
    decimal oracle.  ``ann_ivfpq_topk`` (nprobe=4, rerank=60) is the
    production path; pytest measures its recall vs this exact answer."""
    from dataengineeringworkshop_spark.llmops.pq import ann_topk_ivfpq

    e = load_table(spark, sf_dir, "embeddings")
    q = _query_sample(e)
    return ann_topk_ivfpq(
        e, q, "vec_id", "embedding", dim=64, k=10, nlist=16, nprobe=16,
        rerank=1_000_000_000, index_key=f"embeddings:{sf_dir}",
        decimal_rescore=True,
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


@query(
    "mm_resize_roundtrip",
    oracle="""
        SELECT doc_id AS media_id,
               16 AS width, 16 AS height, 3 AS channels,
               CAST(54 + 48 * 16 AS BIGINT) AS n_bytes
        FROM documents WHERE doc_id % 2 = 0
    """,
    tags=("ext-mm",),
)
def mm_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize, hash-checked: synthesize genuine BMPs from documents,
    nearest-neighbor-resize them to 16×16 with pure numpy
    (decode grid → index-sample → re-encode), then DECODE the resized
    payloads — the decoded header must report exactly the requested
    geometry and the container size must be the exact BMP layout
    (54-byte headers + 4-byte-aligned rows: 48 bytes/row at width 16).
    Any bug in either codec direction or the sampling math breaks the
    hash."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        decode_media,
        resize_media,
        synthesize_media,
    )

    d = load_table(spark, sf_dir, "documents")
    media = synthesize_media(d).filter(F.col("media_type") == "image")
    resized = resize_media(media, width=16, height=16)
    back = resized.select(
        "media_id",
        F.lit("image").alias("media_type"),
        "content",
        F.lit("resized").alias("source"),
        F.length("content").cast("long").alias("declared_bytes"),
    )
    dec = decode_media(back, fake=False)
    return dec.filter(F.col("ok")).select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
    )


@query(
    "mm_audio_features",
    oracle="""
        SELECT doc_id AS media_id,
               CAST((doc_id % 50) + 10 AS BIGINT) AS n_frames,
               CAST(doc_id % 100 AS DOUBLE) AS rms,
               CAST(doc_id % 100 AS INT) AS peak,
               CAST(CASE WHEN doc_id % 100 = 0 THEN 0
                         ELSE (doc_id % 50) + 9 END AS BIGINT) AS zero_crossings
        FROM documents
    """,
    tags=("ext-mm",),
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio feature extraction, hash-checked: deterministic ±v
    square-wave PCM WAVs are synthesized per document (amplitude
    v = doc_id%100, (doc_id%50)+10 frames), then the int16 samples are
    decoded from the raw bytes (numpy, no audio lib) and RMS / peak /
    zero-crossing features computed.  The oracle is the closed-form
    signal math: RMS of an alternating ±v wave is exactly v (perfect
    squares are exact in float64), crossings = frames−1 (0 when v = 0).
    A byte-order, frame-alignment, or chunk-offset bug in the WAV codec
    shifts every decoded amplitude and breaks the hash."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        synthesize_tone_wavs,
        wav_sample_features,
    )

    d = load_table(spark, sf_dir, "documents")
    return wav_sample_features(synthesize_tone_wavs(d)).select(
        "media_id",
        F.col("n_frames").cast("long").alias("n_frames"),
        F.round("rms", 6).alias("rms"),
        F.col("peak").cast("int").alias("peak"),
        F.col("zero_crossings").cast("long").alias("zero_crossings"),
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


@query(
    "mm_byte_features",
    # deterministic byte math — DuckDB recomputes the same 64-bin
    # histogram from character code points (testdata text is pure ASCII,
    # so code point == UTF-8 byte; the Spark side hashes real bytes).
    # Probabilities are exact count/total double divisions (bit-identical
    # in both engines); entropy is rounded to 6 decimals on both sides
    # because log2-sum bit patterns depend on summation order.
    # Round-6 lesson (CORRECTNESS_r06): the external driver's pandas
    # canonicalizer cannot hash array<double> cells — this query emits the
    # histogram UNNESTED to 64 scalar rows per payload (media_id, bkt, p);
    # the array-valued operator itself stays as-is and is pytest-covered.
    oracle="""
        WITH src AS (
            -- empty/null text maps to a single NUL byte, mirroring the
            -- Spark side's np.frombuffer(b or b"\\x00") substitution
            SELECT doc_id,
                   CASE WHEN text IS NULL OR text = '' THEN chr(0) ELSE text END AS text
            FROM documents
        ),
        pos AS (
            SELECT doc_id, unnest(range(1, length(text) + 1)) AS i, text
            FROM src
        ),
        bytes AS (
            SELECT doc_id, (ord(substr(text, CAST(i AS INT), 1)) * 64) // 256 AS bkt
            FROM pos
        ),
        counts AS (SELECT doc_id, bkt, COUNT(*) AS c FROM bytes GROUP BY 1, 2),
        totals AS (SELECT doc_id, CAST(length(text) AS DOUBLE) AS total FROM src),
        grid AS (SELECT doc_id, unnest(range(0, 64)) AS bkt FROM src),
        p AS (
            SELECT g.doc_id, g.bkt,
                   CAST(COALESCE(c.c, 0) AS DOUBLE) / t.total AS p
            FROM grid g
            LEFT JOIN counts c ON g.doc_id = c.doc_id AND g.bkt = c.bkt
            JOIN totals t ON g.doc_id = t.doc_id
        )
        SELECT p.doc_id AS media_id, CAST(p.bkt AS INT) AS bkt, p.p AS p,
               e.byte_entropy
        FROM p
        JOIN (SELECT doc_id, ROUND(-SUM(p * log2(p)), 6) AS byte_entropy
              FROM p WHERE p > 0 GROUP BY doc_id) e
        ON p.doc_id = e.doc_id
    """,
    tags=("ext-mm",),
)
def mm_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real binary-content features: 64-bin byte histogram + Shannon
    entropy per payload (numpy inside mapInPandas, Arrow-batched),
    hash-checked against a DuckDB oracle recomputing the histogram from
    code points (valid because the testdata text is pure ASCII — the
    Spark side operates on true UTF-8 bytes).  Emitted unnested —
    (media_id, bkt, p, byte_entropy), 64 rows per payload — because the
    driver's evidence hasher cannot canonicalize array<double> columns
    (the round-6 finding); the array-valued operator output is
    pytest-covered in tests/test_llmops.py
    (test_byte_histogram_features_normalized_deterministic), which also
    asserts normalization + determinism."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        byte_histogram_features,
        documents_as_media,
    )

    d = load_table(spark, sf_dir, "documents")
    feat = byte_histogram_features(documents_as_media(d), dim=64)
    return feat.select(
        "media_id",
        F.posexplode("features").alias("bkt", "p"),
        "byte_entropy",
    )


@query(
    "mm_decode_roundtrip",
    oracle="""
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS media_type,
               CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id % 31) + 1 AS INT)
                    ELSE 0 END AS width,
               CASE WHEN doc_id % 2 = 0 THEN CAST((doc_id % 17) + 1 AS INT)
                    ELSE 0 END AS height,
               CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS channels,
               CASE WHEN doc_id % 2 = 0 THEN CAST(0 AS BIGINT)
                    ELSE CAST(((octet_length(CAST(text AS BLOB)) // 2) * 1000) // 8000
                              AS BIGINT) END AS duration_ms,
               true AS ok
        FROM documents
    """,
    tags=("ext-mm",),
)
def mm_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode, hash-checked: documents are packed into genuine
    uncompressed-BMP / PCM-WAV payloads on executors
    (multimodal.synthesize_media), then decode_media's pure-Python
    header parsers recover width/height/channels/duration from the raw
    bytes.  The DuckDB oracle recomputes the expected metadata from the
    generation rule, so any bug in the 54-byte BMP header layout, row
    padding, RIFF chunk walk, or block-align math breaks the hash.
    Compressed formats remain honestly NotImplementedError (no codec
    libs in this container) — this query covers the codec-free slice
    for real."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        decode_media,
        synthesize_media,
    )

    d = load_table(spark, sf_dir, "documents")
    dec = decode_media(synthesize_media(d), fake=False)
    return dec.select(
        "media_id", "media_type",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("channels").cast("int").alias("channels"),
        F.col("duration_ms").cast("long").alias("duration_ms"),
        "ok",
    )


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


@query(
    "mm_frame_sample",
    # ASCII corpus: byte slices == char slices, so DuckDB can recompute
    # each frame's md5 from substr() while Spark hashes real binary
    oracle="""
        WITH vids AS (
            SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
        ),
        idx AS (
            SELECT media_id, text,
                   unnest(range(1,
                       greatest(CAST(ceil(length(text) / 64.0) AS BIGINT), 1) + 1
                   )) AS i
            FROM vids
        )
        SELECT media_id,
               CAST(i - 1 AS INT) AS frame_no,
               CAST(length(substr(text, CAST((i - 1) * 64 + 1 AS BIGINT), 64)) AS BIGINT)
                   AS frame_len,
               md5(substr(text, CAST((i - 1) * 64 + 1 AS BIGINT), 64)) AS frame_md5
        FROM idx
    """,
    tags=("ext-mm",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling PLUMBING, hash-checked: slice each video
    payload's byte stream into fixed 64-byte frames with positions
    (llmops.multimodal.frame_sample — pure JVM array ops, zero shuffle;
    a real pipeline swaps the slicer for a codec UDF with the same
    shape).  Output fingerprints every frame with md5 so the oracle
    verifies the exact BYTES of each slice, not just counts."""
    from dataengineeringworkshop_spark.llmops.multimodal import (
        documents_as_media,
        frame_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample(documents_as_media(d), every_n_bytes=64)
    return frames.select(
        "media_id",
        "frame_no",
        "frame_len",
        F.md5("frame_bytes").alias("frame_md5"),
    )


def _dedup_stage_oracle() -> str:
    from dataengineeringworkshop_spark.plans.registry import REGISTRY

    survivors = REGISTRY["d_dedup_survivors"].oracle
    return f"""
        WITH s1 AS (SELECT COUNT(*) AS n FROM documents),
        s2 AS (SELECT COUNT(DISTINCT text) AS n FROM documents),
        s3 AS (SELECT COUNT(*) AS n FROM ({survivors}) surv)
        SELECT 1 AS stage, 'input' AS stage_name,
               CAST(s1.n AS BIGINT) AS n_docs,
               CAST(0 AS BIGINT) AS removed,
               0.0 AS removal_pct
        FROM s1
        UNION ALL
        SELECT 2, 'after_exact_dedup', CAST(s2.n AS BIGINT),
               CAST(s1.n - s2.n AS BIGINT),
               ROUND(CAST(s1.n - s2.n AS DOUBLE) / s1.n, 6)
        FROM s1 CROSS JOIN s2
        UNION ALL
        SELECT 3, 'after_near_dedup', CAST(s3.n AS BIGINT),
               CAST(s2.n - s3.n AS BIGINT),
               ROUND(CAST(s2.n - s3.n AS DOUBLE) / s1.n, 6)
        FROM s1 CROSS JOIN s2 CROSS JOIN s3
    """


@query(
    "cp_dedup_stage_report",
    oracle=_dedup_stage_oracle(),
    tags=("ext-dedup", "ext-corpus"),
)
def cp_dedup_stage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup cascade funnel every corpus build publishes: input →
    after exact dedup (distinct text, keep-first) → after near-dedup
    (MinHash-LSH pairs closed transitively, one survivor per cluster —
    the exact d_dedup_survivors contract, whose oracle recomputes the
    pairs exhaustively).  Near-dedup subsumes exact (identical text is
    Jaccard 1.0), so the funnel is monotone by construction.  Each
    stage count is a bounded scalar (3 numbers reach the driver); the
    heavy lifting reuses the standing MinHash index artifacts."""
    from dataengineeringworkshop_spark.llmops.clusters import dedup_survivors
    from dataengineeringworkshop_spark.llmops.minhash import minhash_dedup_pairs

    d = load_table(spark, sf_dir, "documents")
    n1 = d.count()
    n2 = d.select("text").distinct().count()
    pairs = minhash_dedup_pairs(
        d, "doc_id", "text", num_hashes=64, bands=16, jaccard_threshold=0.3,
        index_key=f"documents:{sf_dir}",
    ).select("d1", "d2")
    n3 = dedup_survivors(d.select("doc_id"), "doc_id", pairs).count()
    rows = [
        (1, "input", n1, 0, 0.0),
        (2, "after_exact_dedup", n2, n1 - n2, round((n1 - n2) / n1, 6)),
        (3, "after_near_dedup", n3, n2 - n3, round((n2 - n3) / n1, 6)),
    ]
    return spark.createDataFrame(
        rows,
        "stage INT, stage_name STRING, n_docs BIGINT, removed BIGINT, "
        "removal_pct DOUBLE",
    )


@query(
    "g_pagerank_dupgraph",
    # unrolled 3-iteration recomputation — every contribution follows the
    # decimal-accumulate rule (ONE double division, DECIMAL(18,8) cast,
    # exact sum, one cast back), so the iterative DataFrame loop must
    # match the oracle bit-for-bit
    oracle=f"""
        WITH jp AS (
            {_JACCARD_DUCK.format(maxdf=_JACCARD_MAXDF)}
        ),
        edges AS (
            SELECT d1 AS u, d2 AS v FROM jp
            UNION ALL SELECT d2, d1 FROM jp
        ),
        deg AS (SELECT u, COUNT(*) AS outdeg FROM edges GROUP BY u),
        nn AS (SELECT COUNT(*) AS n_nodes FROM deg),
        r0 AS (
            SELECT deg.u, deg.outdeg, CAST(1 AS DOUBLE) / nn.n_nodes AS r
            FROM deg CROSS JOIN nn
        ),
        s1 AS (
            SELECT e.v AS u,
                   CAST(SUM(CAST(r.r / r.outdeg AS DECIMAL(18,8))) AS DOUBLE) AS s
            FROM edges e JOIN r0 r ON e.u = r.u GROUP BY e.v
        ),
        r1 AS (
            SELECT d.u, d.outdeg,
                   CAST(0.15 AS DOUBLE) / nn.n_nodes
                       + CAST(0.85 AS DOUBLE) * s1.s AS r
            FROM s1 JOIN deg d ON s1.u = d.u CROSS JOIN nn
        ),
        s2 AS (
            SELECT e.v AS u,
                   CAST(SUM(CAST(r.r / r.outdeg AS DECIMAL(18,8))) AS DOUBLE) AS s
            FROM edges e JOIN r1 r ON e.u = r.u GROUP BY e.v
        ),
        r2 AS (
            SELECT d.u, d.outdeg,
                   CAST(0.15 AS DOUBLE) / nn.n_nodes
                       + CAST(0.85 AS DOUBLE) * s2.s AS r
            FROM s2 JOIN deg d ON s2.u = d.u CROSS JOIN nn
        ),
        s3 AS (
            SELECT e.v AS u,
                   CAST(SUM(CAST(r.r / r.outdeg AS DECIMAL(18,8))) AS DOUBLE) AS s
            FROM edges e JOIN r2 r ON e.u = r.u GROUP BY e.v
        ),
        r3 AS (
            SELECT d.u, d.outdeg,
                   CAST(0.15 AS DOUBLE) / nn.n_nodes
                       + CAST(0.85 AS DOUBLE) * s3.s AS r
            FROM s3 JOIN deg d ON s3.u = d.u CROSS JOIN nn
        )
        SELECT u AS doc_id, outdeg, r AS pagerank FROM r3
    """,
    tags=("ext-dedup", "iterative"),
)
def g_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the near-duplicate graph (3 power
    iterations, damping 0.85): which documents sit at the CENTER of a
    duplication cluster — the canonical-representative signal a smarter
    dedup keeps, versus min-id survivors.  An iterative DataFrame loop
    whose every float step is pinned deterministic (one division → 
    DECIMAL(18,8) accumulate → one cast), hash-checked against a fully
    unrolled 3-iteration SQL recomputation in DuckDB.  Per iteration:
    one vertex-keyed join + one grouped decimal sum; degree rides the
    rank row (no per-round degree re-join); the node count is a
    broadcast 1-row aggregate.  At 100 TB the edge list comes from the
    LSH pair stage and the iteration cost is |edges| per round,
    independent of corpus size."""
    from dataengineeringworkshop_spark.llmops.clusters import pagerank
    from dataengineeringworkshop_spark.plans.textops import d_ngram_jaccard_pairs

    pairs = d_ngram_jaccard_pairs(spark, sf_dir).select("d1", "d2")
    return pagerank(pairs).select(
        F.col("u").alias("doc_id"), "outdeg", F.col("r").alias("pagerank")
    )


@query(
    "g_triangle_count",
    # same ordered-enumeration algebra over the SAME df-capped pair list
    # (a<b<c exactly once per triangle); counts are integers
    oracle=f"""
        WITH jp AS (
            {_JACCARD_DUCK.format(maxdf=_JACCARD_MAXDF)}
        ),
        e AS (SELECT d1 AS a, d2 AS b FROM jp),
        tri AS (
            SELECT e1.a AS a, e1.b AS b, e2.b AS c
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (
            SELECT a AS doc_id FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        )
        GROUP BY doc_id
    """,
    tags=("ext-dedup", "graph"),
)
def g_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation over the near-duplicate
    graph — the local clustering signal that separates a tight
    mutual-duplicate CLIQUE (template spam: every pair similar) from a
    hub-and-spoke STAR (one popular doc others quote), which
    component id (d_dup_clusters) and centrality (g_pagerank_dupgraph)
    cannot distinguish.  Ordered enumeration: every edge is stored
    once as (a < b), a triangle is counted exactly once as a < b < c
    via two equi joins (wedge build on the shared middle vertex +
    closing-edge check) — never a cartesian, no double counting, no
    division-by-6 cleanup.  The edge list is materialized once inside
    the operator (llmops/clusters.py triangle_counts) — it feeds three
    join aliases, and an uncached alias would re-run the whole
    pair-mining subtree (shingle self-join + sort + limit) per alias.
    At 100 TB the edge list is already df-capped by the pair stage;
    wedge counts are bounded by the per-node degree cap the same stage
    enforces."""
    from dataengineeringworkshop_spark.llmops.clusters import triangle_counts
    from dataengineeringworkshop_spark.plans.textops import d_ngram_jaccard_pairs

    return triangle_counts(d_ngram_jaccard_pairs(spark, sf_dir))


@query(
    "mm_payload_dedup",
    # DuckDB hashes the same bytes: testdata text is pure ASCII, so
    # VARCHAR substr/sha256 see byte-identical input to Spark's binary
    # substring/sha2 (same convention mm_byte_features relies on)
    oracle="""
        SELECT sha256(substr(text, 1, 32)) AS prefix_sha,
               COUNT(*) AS n_docs,
               MIN(doc_id) AS survivor_id,
               CAST(COUNT(DISTINCT sha256(text)) AS BIGINT) AS n_distinct_full,
               CAST(SUM(length(text)) AS BIGINT) AS total_bytes
        FROM documents
        WHERE text IS NOT NULL
        GROUP BY 1
    """,
    tags=("ext-mm", "ext-dedup"),
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup over OPAQUE binary payloads — the first
    stage of any multimodal corpus build (identical images/audio ship
    thousands of times under different names): group by the sha256 of
    a fixed 32-byte payload prefix (the cheap block key), keep the
    min-id survivor, and report how many distinct FULL payload hashes
    share each block key (prefix collisions = near-variants worth a
    byte-level diff).  All JVM built-ins over the binary column —
    substring and sha2 work on raw bytes, no decode, no Python; one
    partial-agg shuffle on the 32-byte digest.  At 100 TB this is the
    map-side-combine dedup: payload bytes never shuffle, only digests
    do."""
    from dataengineeringworkshop_spark.llmops.multimodal import documents_as_media

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    m = documents_as_media(d)
    return (
        m.select(
            F.col("media_id"),
            F.sha2(F.expr("substring(content, 1, 32)"), 256).alias("prefix_sha"),
            F.sha2(F.col("content"), 256).alias("full_sha"),
            F.length("content").alias("nbytes"),
        )
        .groupBy("prefix_sha")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("media_id").alias("survivor_id"),
            F.countDistinct("full_sha").alias("n_distinct_full"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
        )
    )
