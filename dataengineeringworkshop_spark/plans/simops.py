"""Embedding similarity search (SURVEY.md §7 extension; BASELINE north
star): brute-force cosine top-k with an exact-decimal dot product so the
result hash-matches the DuckDB oracle bit-for-bit.

Determinism: float dot products are accumulated as DECIMAL(28,14) (exact,
order-independent) and only cast to double at the end — Spark folds the
array with ``aggregate``; the oracle unnests with index and SUMs the same
decimals.  Both engines then divide identical doubles → identical cosines
→ identical ranks.

Scale posture: the brute-force path broadcasts the (small) query set and
streams the corpus — one pass, no shuffle of the corpus, O(|Q|·N·d) JVM
work inside whole-stage codegen.  For 100 TB you bound |Q| and use the
LSH-bucketed variant in ``llmops.similarity`` to prune candidates first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import kbucket, query
from dataengineeringworkshop_spark.plans.tables import load_table

# exact decimal fold of sum(x_i * y_i) over two float arrays, as Spark SQL
_DOT = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,14))), "
    "CAST(0 AS DECIMAL(28,14)), (acc, v) -> CAST(acc + v AS DECIMAL(28,14))) AS DOUBLE)"
)


def _norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dataengineeringworkshop_spark.operators.fanout import fan_out

    # embeddings ship as a one-row-group file (single-partition scan);
    # the decimal norm fold and every downstream per-pair dot product
    # would run on one core without the gated repartition (guide §2.5 —
    # no-op once the scan is wider than the core count)
    e = fan_out(load_table(spark, sf_dir, "embeddings"))
    return e.withColumn("nrm", F.expr(_DOT.format(a="embedding", b="embedding")))


#: above this many embedding rows, sim_cosine_neardup reblocks from the
#: fixed-cardinality ``label`` onto trained √N IVF cells (llmops.semdedup).
NEARDUP_SCALE_THRESHOLD = 100_000


@query(
    "sim_cosine_topk",
    oracle=f"""
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
            LIMIT 16
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
    """,
    bench=True,
    tags=("ext-sim",),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors for a FIXED-k query set: the
    16 vectors ranked first by a portable multiplicative hash of vec_id
    (deterministic, engine-independent, spread across the id space).
    Query set broadcast; corpus streamed once.

    The query set is k=16 regardless of corpus size, so the broadcast
    and the O(k·N·d) scan cost stay corpus-proportional — not O(N²) —
    at any scale.  Brute force remains the recall oracle for the ANN
    variants (``ann_topk_lsh`` / ``ann_topk_ivf``), which are the scale
    path for large query sets.

    Two-phase scoring: a cheap DOUBLE dot product prefilters to the top
    40 candidates per query, then only those are rescored with the exact
    DECIMAL fold that guarantees bit-identical oracle cosines.  The 4×
    rank margin makes the prefilter lossless: double-vs-decimal disagree
    at ~1e-13 relative, while the #10 → #41 cosine gap is orders of
    magnitude larger.  Cuts the decimal arithmetic (the dominant cost)
    from O(N·|Q|·d) to O(40·|Q|·d)."""
    from pyspark.sql import Window

    fast_dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    e = _norms(spark, sf_dir)
    q = (
        e.orderBy(
            F.expr(kbucket("CAST(vec_id AS BIGINT)", 1000000007)),
            F.col("vec_id"),
        )
        .limit(16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm").alias("q_nrm"),
        )
    )
    joined = e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
    pre = joined.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        "q_emb",
        "q_nrm",
        "nrm",
        (
            F.expr(fast_dot.format(a="q_emb", b="embedding"))
            / F.sqrt(F.col("q_nrm") * F.col("nrm"))
        ).alias("approx_cos"),
    )
    w_pre = Window.partitionBy("query_id").orderBy(
        F.col("approx_cos").desc(), F.col("neighbor_id").asc()
    )
    cand = pre.withColumn("pre_rank", F.row_number().over(w_pre)).filter(
        F.col("pre_rank") <= 40
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(
            F.expr(_DOT.format(a="q_emb", b="embedding"))
            / F.sqrt(F.col("q_nrm") * F.col("nrm")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("sim_rank", F.row_number().over(w)).filter(F.col("sim_rank") <= 10)


@query(
    "sim_cosine_neardup",
    oracle="""
        WITH ex AS (
            SELECT vec_id, label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS nrm
            FROM ex GROUP BY vec_id
        ),
        dot AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2, a.label AS label,
                   CAST(SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS dot
            FROM ex a JOIN ex b
              ON a.label = b.label AND a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY a.vec_id, b.vec_id, a.label
        )
        SELECT dot.id1, dot.id2, dot.label,
               ROUND(dot.dot / sqrt(n1.nrm * n2.nrm), 6) AS cosine
        FROM dot JOIN nrm n1 ON dot.id1 = n1.vec_id
                 JOIN nrm n2 ON dot.id2 = n2.vec_id
        WHERE dot.dot / sqrt(n1.nrm * n2.nrm) >= 0.3
    """,
    tags=("ext-dedup", "ext-sim"),
)
def sim_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine ≥ 0.3) within a
    blocking key.

    At driver scale (≤ ``NEARDUP_SCALE_THRESHOLD`` rows) the block is
    ``label`` — exact within blocks, oracle-matched.  Above it, blocking
    on a fixed-cardinality key is O(N²/blocks), so the query reblocks on
    trained IVF cells with ``nlist ≈ √N`` (``llmops.semdedup``): the
    pair space becomes Σ cell² ≈ N^1.5.  The scale path reports each
    pair's id1-side label (pairs may cross labels within a cell)."""
    e = _norms(spark, sf_dir)
    n = e.count()
    if n > NEARDUP_SCALE_THRESHOLD:
        from dataengineeringworkshop_spark.llmops.semdedup import (
            assign_trained_cells,
            cell_neardup_pairs,
            scale_nlist,
        )

        assigned = assign_trained_cells(
            e, "vec_id", "embedding", nlist=scale_nlist(n),
            index_key=f"embeddings:{sf_dir}", keep_cols=("label",),
        )
        labels = assigned.select(F.col("vec_id").alias("id1"), "label")
        return (
            cell_neardup_pairs(assigned, tau=0.3)
            .join(labels, "id1")
            .select("id1", "id2", "label", "cosine")
        )
    a = e.select(
        F.col("vec_id").alias("id1"), F.col("label"),
        F.col("embedding").alias("v1"), F.col("nrm").alias("n1"),
    )
    b = e.select(
        F.col("vec_id").alias("id2"), F.col("label"),
        F.col("embedding").alias("v2"), F.col("nrm").alias("n2"),
    )
    pairs = a.join(b, ["label"]).filter(F.col("id1") < F.col("id2"))
    cos = F.expr(_DOT.format(a="v1", b="v2")) / F.sqrt(F.col("n1") * F.col("n2"))
    return (
        pairs.withColumn("cosine_raw", cos)
        .filter(F.col("cosine_raw") >= 0.3)
        .select("id1", "id2", "label", F.round("cosine_raw", 6).alias("cosine"))
    )


@query(
    "sim_label_centroid_dist",
    oracle="""
        WITH ex AS (
            SELECT vec_id, label, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
            FROM embeddings
        ),
        cent AS (
            SELECT label, i,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS c
            FROM ex GROUP BY label, i
        )
        SELECT ex.label, ex.vec_id,
               ROUND(CAST(SUM(CAST((CAST(ex.v AS DOUBLE) - cent.c) * (CAST(ex.v AS DOUBLE) - cent.c)
                                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS sq_dist
        FROM ex JOIN cent ON ex.label = cent.label AND ex.i = cent.i
        GROUP BY ex.label, ex.vec_id
    """,
    tags=("ext-sim",),
)
def sim_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid + squared distance of each vector to its own
    centroid (the k-means E-step shape, relationally).  Exercises
    element-wise aggregation across vectors — the building block for
    IVF-style coarse quantization."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "embeddings")
    return spark.sql(
        """
        WITH ex AS (
            SELECT vec_id, label, posexplode(embedding) AS (i0, v) FROM dew_embeddings
        ),
        ex1 AS (SELECT vec_id, label, i0 + 1 AS i, v FROM ex),
        cent AS (
            SELECT label, i,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS c
            FROM ex1 GROUP BY label, i
        )
        SELECT ex1.label, ex1.vec_id,
               ROUND(CAST(SUM(CAST((CAST(ex1.v AS DOUBLE) - cent.c) * (CAST(ex1.v AS DOUBLE) - cent.c)
                                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS sq_dist
        FROM ex1 JOIN cent ON ex1.label = cent.label AND ex1.i = cent.i
        GROUP BY ex1.label, ex1.vec_id
        """
    )


def _knn_oracle() -> str:
    """Wrap the sim_cosine_topk oracle (already registered) as the
    neighbor source: 5-NN majority vote per query, ties broken toward
    the smaller label, compared against the query's true label."""
    from dataengineeringworkshop_spark.plans.registry import REGISTRY

    topk = REGISTRY["sim_cosine_topk"].oracle
    return f"""
        WITH topk AS (SELECT * FROM ({topk}) t0 WHERE sim_rank <= 5),
        votes AS (
            SELECT t.query_id, e.label, COUNT(*) AS votes
            FROM topk t JOIN embeddings e ON t.neighbor_id = e.vec_id
            GROUP BY t.query_id, e.label
        ),
        pred AS (
            SELECT query_id, label AS predicted_label, votes,
                   row_number() OVER (
                       PARTITION BY query_id ORDER BY votes DESC, label ASC
                   ) AS rn
            FROM votes
        )
        SELECT p.query_id, p.predicted_label, CAST(p.votes AS BIGINT) AS votes,
               q.label AS true_label
        FROM pred p JOIN embeddings q ON p.query_id = q.vec_id
        WHERE p.rn = 1
    """


@query(
    "sim_knn_classify",
    oracle=_knn_oracle(),
    tags=("ext-sim", "knn"),
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding column: exact cosine 5-NN
    per query vector (reusing the two-phase decimal-exact top-k scan),
    majority label vote with deterministic tie-break (votes DESC, label
    ASC), reported against the true label.  The label lookup joins are
    on vec_id (broadcast-able dimension access); the vote is a
    |Q|·k-row aggregate — negligible next to the scan.  At scale the
    neighbor source swaps for the IVF/PQ serve path unchanged."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    topk = sim_cosine_topk(spark, sf_dir).filter(F.col("sim_rank") <= 5)
    votes = (
        topk.join(
            e.select(F.col("vec_id").alias("neighbor_id"), "label"),
            "neighbor_id",
        )
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
    )
    return pred.join(
        e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")),
        "query_id",
    ).select("query_id", "predicted_label", "votes", "true_label")


_POWER_ITER_SPARK = """
WITH ex AS (
    SELECT vec_id, i, CAST(v AS DOUBLE) AS v
    FROM dew_embeddings LATERAL VIEW posexplode(embedding) t AS i, v
),
gram AS (
    SELECT a.i AS i, b.i AS j,
           CAST(SUM(CAST(a.v * b.v AS DECIMAL(28,14))) AS DOUBLE) AS c
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id
    GROUP BY a.i, b.i
),
w1 AS (
    SELECT i, CAST(SUM(CAST(c AS DECIMAL(28,14))) AS DOUBLE) AS w
    FROM gram GROUP BY i
),
n1 AS (
    SELECT CAST(sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,14))) AS DOUBLE))
           AS DOUBLE) AS nrm FROM w1
),
v1 AS (SELECT i, w / n1.nrm AS v FROM w1 CROSS JOIN n1),
u AS (
    SELECT g.i, CAST(SUM(CAST(g.c * v1.v AS DECIMAL(28,14))) AS DOUBLE) AS u
    FROM gram g JOIN v1 ON g.j = v1.i
    GROUP BY g.i
),
n2 AS (
    SELECT CAST(sqrt(CAST(SUM(CAST(u * u AS DECIMAL(28,14))) AS DOUBLE))
           AS DOUBLE) AS nrm FROM u
)
SELECT CAST(u.i AS INT) AS dim,
       ROUND(u.u / n2.nrm, 6) AS eigvec,
       ROUND(n2.nrm, 6) AS lambda_est
FROM u CROSS JOIN n2
"""

_POWER_ITER_DUCK = """
WITH ex AS (
    SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
           CAST(unnest(embedding) AS DOUBLE) AS v
    FROM embeddings
),
gram AS (
    SELECT a.i AS i, b.i AS j,
           CAST(SUM(CAST(a.v * b.v AS DECIMAL(28,14))) AS DOUBLE) AS c
    FROM ex a JOIN ex b ON a.vec_id = b.vec_id
    GROUP BY a.i, b.i
),
w1 AS (
    SELECT i, CAST(SUM(CAST(c AS DECIMAL(28,14))) AS DOUBLE) AS w
    FROM gram GROUP BY i
),
n1 AS (
    SELECT CAST(sqrt(CAST(SUM(CAST(w * w AS DECIMAL(28,14))) AS DOUBLE))
           AS DOUBLE) AS nrm FROM w1
),
v1 AS (SELECT i, w / n1.nrm AS v FROM w1 CROSS JOIN n1),
u AS (
    SELECT g.i, CAST(SUM(CAST(g.c * v1.v AS DECIMAL(28,14))) AS DOUBLE) AS u
    FROM gram g JOIN v1 ON g.j = v1.i
    GROUP BY g.i
),
n2 AS (
    SELECT CAST(sqrt(CAST(SUM(CAST(u * u AS DECIMAL(28,14))) AS DOUBLE))
           AS DOUBLE) AS nrm FROM u
)
SELECT CAST(u.i AS INT) AS dim,
       ROUND(u.u / n2.nrm, 6) AS eigvec,
       ROUND(n2.nrm, 6) AS lambda_est
FROM u CROSS JOIN n2
"""


@query(
    "sim_power_iteration_pc1",
    oracle=_POWER_ITER_DUCK,
    tags=("ext-sim", "iterative"),
)
def sim_power_iteration_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO power-iteration steps toward the top principal direction of
    the embedding gram matrix — iterative linear algebra without
    leaving SQL: the d×d gram matrix is ONE partial-agg self-join
    (Σ x·xᵀ, d²=4096 cells regardless of corpus size), each iteration
    is a d²-row matrix-vector join, and every float accumulation folds
    through DECIMAL so the output is bit-identical across engines
    (sign fixed by the deterministic all-ones start).  This is the PCA
    primitive of embedding whitening / spectral dedup: corpus-sized
    work is the single gram pass; iterations touch only d² cells, so
    running it to convergence just repeats the cheap step.  Convergence
    RATE depends on the spectral gap (pytest proves >0.99 alignment
    with numpy's eigenvector on planted-spectrum data; this corpus's
    near-isotropic embeddings exercise the arithmetic, which the
    cross-engine hash pins exactly).  λ-estimate = ‖C·v₁‖, ‖v₁‖=1."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "embeddings")
    return spark.sql(_POWER_ITER_SPARK)


_MATRYOSHKA_ORACLE = f"""
    WITH ex AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               unnest(embedding) AS v
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id,
               CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                             AS DECIMAL(28,14))) AS DOUBLE) AS nrm_full,
               CAST(SUM(CASE WHEN i <= 32 THEN
                        CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)
                             AS DECIMAL(28,14)) END) AS DOUBLE) AS nrm_trunc
        FROM ex GROUP BY vec_id
    ),
    qsel AS (
        SELECT vec_id FROM embeddings
        ORDER BY {{kb}}, vec_id
        LIMIT 16
    ),
    qx AS (SELECT vec_id AS qid, i, v FROM ex
           WHERE vec_id IN (SELECT vec_id FROM qsel)),
    dot AS (
        SELECT qx.qid, ex.vec_id AS nid,
               CAST(SUM(CAST(CAST(qx.v AS DOUBLE) * CAST(ex.v AS DOUBLE)
                             AS DECIMAL(28,14))) AS DOUBLE) AS dot_full,
               CAST(SUM(CASE WHEN qx.i <= 32 THEN
                        CAST(CAST(qx.v AS DOUBLE) * CAST(ex.v AS DOUBLE)
                             AS DECIMAL(28,14)) END) AS DOUBLE) AS dot_trunc
        FROM qx JOIN ex ON qx.i = ex.i AND qx.qid <> ex.vec_id
        GROUP BY qx.qid, ex.vec_id
    ),
    scored AS (
        SELECT dot.qid AS query_id, dot.nid AS neighbor_id,
               ROUND(dot.dot_full / sqrt(n1.nrm_full * n2.nrm_full), 6)
                   AS cos_full,
               ROUND(dot.dot_trunc / sqrt(n1.nrm_trunc * n2.nrm_trunc), 6)
                   AS cos_trunc
        FROM dot JOIN nrm n1 ON dot.qid = n1.vec_id
                 JOIN nrm n2 ON dot.nid = n2.vec_id
    ),
    rk AS (
        SELECT *,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_full DESC, neighbor_id ASC)
                   AS r_full,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos_trunc DESC, neighbor_id ASC)
                   AS r_trunc
        FROM scored
    )
    SELECT query_id,
           CAST(COUNT(CASE WHEN r_full <= 10 AND r_trunc <= 10 THEN 1 END)
                AS BIGINT) AS n_overlap,
           CAST(MIN(CASE WHEN r_trunc = 1 THEN neighbor_id END) AS BIGINT)
               AS trunc_top1,
           MIN(CASE WHEN r_trunc = 1 THEN cos_trunc END) AS trunc_top1_cosine
    FROM rk GROUP BY query_id
"""


@query(
    "sim_matryoshka_overlap",
    oracle=_MATRYOSHKA_ORACLE.format(
        kb=kbucket("CAST(vec_id AS BIGINT)", 1000000007)
    ),
    tags=("ext-sim", "matryoshka"),
)
def sim_matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-embedding retrieval quality: rank the same 16-query
    top-10 twice — once on the full 64-dim vectors, once on the FIRST
    32 dims renormalized (the MRL truncation an embedding store uses to
    cut serving cost 2x) — and report per-query top-10 overlap plus the
    truncated top-1 neighbor.  The measurement every
    matryoshka-deployment decision needs: how much recall does the
    cheap prefix buy?

    Determinism: both dot products and both norms fold in
    DECIMAL(28,14) in ONE pair pass (the truncated sums are the same
    fold with i <= 32 — prefix sums of the full fold's terms); ranks
    order by the ROUNDed cosine with neighbor-id tiebreak per the
    repo contract; the overlap count and top-1 id are integers.

    Scale: the query set is fixed (|Q| = 16 by the portable kbucket
    hash), so the pair space is O(|Q| x N) streamed once with the
    broadcast query set — both rankings come out of the SAME single
    pass (no second scan for the truncated variant), then two window
    ranks over |Q| x N scored rows."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        F.expr(_DOT.format(a="embedding", b="embedding")).alias("nrm_full"),
        F.expr(_DOT.format(
            a="slice(embedding, 1, 32)", b="slice(embedding, 1, 32)"
        )).alias("nrm_trunc"),
    )
    q = (
        e.orderBy(
            F.expr(kbucket("CAST(vec_id AS BIGINT)", 1000000007)),
            F.col("vec_id"),
        )
        .limit(16)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("q_emb"),
            F.col("nrm_full").alias("q_nrm_full"),
            F.col("nrm_trunc").alias("q_nrm_trunc"),
        )
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.expr(_DOT.format(a="q_emb", b="embedding"))
                / F.sqrt(F.col("q_nrm_full") * F.col("nrm_full")),
                6,
            ).alias("cos_full"),
            F.round(
                F.expr(_DOT.format(
                    a="slice(q_emb, 1, 32)", b="slice(embedding, 1, 32)"
                ))
                / F.sqrt(F.col("q_nrm_trunc") * F.col("nrm_trunc")),
                6,
            ).alias("cos_trunc"),
        )
    )
    w_full = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id").asc()
    )
    w_trunc = Window.partitionBy("query_id").orderBy(
        F.col("cos_trunc").desc(), F.col("neighbor_id").asc()
    )
    rk = scored.select(
        "query_id", "neighbor_id", "cos_trunc",
        F.row_number().over(w_full).alias("r_full"),
        F.row_number().over(w_trunc).alias("r_trunc"),
    )
    return rk.groupBy("query_id").agg(
        F.count(
            F.when((F.col("r_full") <= 10) & (F.col("r_trunc") <= 10), 1)
        ).cast("long").alias("n_overlap"),
        F.min(F.when(F.col("r_trunc") == 1, F.col("neighbor_id")))
        .cast("long").alias("trunc_top1"),
        F.min(F.when(F.col("r_trunc") == 1, F.col("cos_trunc")))
        .alias("trunc_top1_cosine"),
    )
