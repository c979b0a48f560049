"""Retrieval scoring + embedding-representation operators — the last
mile of a training-data pipeline after cleaning/dedup: statistical LM
quality filtering (CCNet-style), BM25 keyword retrieval, SemDeDup-style
semantic dedup, and int8 scalar quantization of embeddings.

No reference counterpart (the workshop ends at gold reporting tables);
these are north-star extensions per BASELINE.json, built from the same
determinism toolkit as the rest of the registry:

- integer/count arithmetic stays integral until one explicit
  ``CAST(... AS DOUBLE)`` division (IEEE-exact, identical in Spark and
  DuckDB);
- double sums always go through a DECIMAL fold (order-independent);
- transcendentals are avoided entirely — BM25 uses the *rational* idf
  ``(N - df + 0.5) / (df + 0.5)`` (the argument of the classic
  ``ln``-idf) so ranks hash-match across engines, and the LM score is a
  mean conditional probability rather than log-perplexity.  Both are
  monotone in the usual variants, so thresholds/rankings are preserved;
  the deviation is documented here on purpose.

Scale posture (100 TB):

- the bigram model and BM25 statistics are Zipf-distributed — at scale
  cap the model to the top-K bigrams / query-term rows and broadcast;
  here they flow through ordinary shuffled joins with map-side partial
  aggregation (shuffle carries (gram, partial count), never raw text).
- SemDeDup's cell assignment is a map-only broadcast cross join
  (centroids are tiny); the pairwise stage is bounded per cell —
  sum(cell²) not N².  Seed-vector centroids keep the oracle exact; on a
  cluster you'd swap in the trained k-means quantizer from
  ``llmops.ivf`` (same assignment shape).
- quantization is a pure map over vectors (one pass, no shuffle) — the
  4× storage cut is what makes a 100 TB embedding store scannable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringworkshop_spark.plans.registry import query
from dataengineeringworkshop_spark.plans.tables import register_views

_BM25_TERMS = "('spark', 'join', 'window', 'hash')"
_K1 = "CAST(1.2 AS DOUBLE)"
_B = "CAST(0.75 AS DOUBLE)"

#: above this many embedding rows, sd_semantic_dedup swaps its 8-seed
#: oracle-exact quantizer for the trained √N-cell quantizer
#: (llmops.semdedup) — fixed block counts are quadratic at scale.
SD_SCALE_THRESHOLD = 100_000


@query(
    "cp_bigram_lm_score",
    oracle="""
        WITH ex AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS i,
                   unnest(string_split(text, ' ')) AS wd
            FROM documents
        ),
        big AS (
            SELECT a.doc_id, a.wd AS w1, b.wd AS w2
            FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        ),
        docbig AS (
            SELECT doc_id, w1, w2, COUNT(*) AS n FROM big GROUP BY doc_id, w1, w2
        ),
        bc AS (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c12 FROM docbig GROUP BY w1, w2),
        pc AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1 FROM docbig GROUP BY w1),
        voc AS (SELECT COUNT(DISTINCT wd) AS v FROM ex),
        scored AS (
            SELECT d.doc_id, d.n,
                   CAST(d.n AS DOUBLE) *
                   (CAST(bc.c12 + 1 AS DOUBLE) / CAST(pc.c1 + voc.v AS DOUBLE)) AS np
            FROM docbig d
            JOIN bc ON d.w1 = bc.w1 AND d.w2 = bc.w2
            JOIN pc ON d.w1 = pc.w1
            CROSS JOIN voc
        )
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(CAST(np AS DECIMAL(28,14))) AS DOUBLE) / SUM(n), 6) AS lm_score
        FROM scored GROUP BY doc_id
    """,
    bench=True,
    tags=("ext-text", "ext-corpus"),
)
def cp_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM quality score (CCNet-style filter): the
    corpus itself is the training set; each document is scored by its
    mean add-one-smoothed conditional bigram probability
    ``avg((C(w1,w2)+1) / (C(w1)+|V|))``.  Low scores = text unlike the
    corpus (gibberish / boilerplate) — the thresholding signal CCNet
    gets from a KenLM perplexity, in exact rational arithmetic.

    Spark shape (round-8 rework): the (doc, w1, w2, n) bigram table
    feeds THREE consumers (the c12 model, the c1 marginals, and the
    per-occurrence scoring join), and Spark inlines SQL CTEs — the
    original single statement ran the corpus explode+aggregate three
    times (plus once more for |V|): four full corpus passes, zero
    ReusedExchange (measured).  Now the bigram table is built in ONE
    explode pass and ``materialize()``d (the checkpointed derived-model
    table a 100 TB pipeline maintains anyway, sf-keyed like the minhash
    signature and shingle indexes), the model aggregates and the
    scoring join read the artifact, and |V| is the one remaining raw
    pass — 4 corpus scans down to 2, and the two model groupBys now
    aggregate the collapsed bigram table instead of raw occurrences.
    """
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "documents")
    docbig = materialize(
        spark.sql(
            """
            WITH ws AS (
                SELECT doc_id, split(text, ' ') AS w FROM dew_documents
            ),
            big AS (
                SELECT doc_id, element_at(w, i) AS w1, element_at(w, i + 1) AS w2
                FROM (SELECT * FROM ws WHERE size(w) >= 2)
                LATERAL VIEW explode(sequence(1, size(w) - 1)) t AS i
            )
            SELECT doc_id, w1, w2, COUNT(*) AS n FROM big GROUP BY doc_id, w1, w2
            """
        ),
        "docbig",
        cache_key=f"bigram_lm:{sf_dir}",
    )
    docbig.createOrReplaceTempView("dew_bigram_docbig")
    return spark.sql(
        """
        WITH bc AS (SELECT w1, w2, CAST(SUM(n) AS BIGINT) AS c12
                    FROM dew_bigram_docbig GROUP BY w1, w2),
        pc AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS c1
               FROM dew_bigram_docbig GROUP BY w1),
        voc AS (
            SELECT COUNT(DISTINCT wd) AS v
            FROM (SELECT explode(split(text, ' ')) AS wd FROM dew_documents)
        ),
        scored AS (
            SELECT d.doc_id, d.n,
                   CAST(d.n AS DOUBLE) *
                   (CAST(bc.c12 + 1 AS DOUBLE) / CAST(pc.c1 + voc.v AS DOUBLE)) AS np
            FROM dew_bigram_docbig d
            JOIN bc ON d.w1 = bc.w1 AND d.w2 = bc.w2
            JOIN pc ON d.w1 = pc.w1
            CROSS JOIN voc
        )
        SELECT doc_id,
               CAST(SUM(n) AS BIGINT) AS n_bigrams,
               ROUND(CAST(SUM(CAST(np AS DECIMAL(28,14))) AS DOUBLE) / SUM(n), 6) AS lm_score
        FROM scored GROUP BY doc_id
        """
    )


@query(
    "cp_bm25_search",
    oracle=f"""
        WITH ex AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS wd FROM documents
        ),
        dl AS (
            SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
        ),
        corpus AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, wd, COUNT(*) AS tf
            FROM ex WHERE wd IN {_BM25_TERMS}
            GROUP BY doc_id, wd
        ),
        df AS (SELECT wd, COUNT(*) AS df FROM tf GROUP BY wd),
        term_scores AS (
            SELECT tf.doc_id, tf.wd,
                   ((CAST(corpus.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * ((CAST(tf.tf AS DOUBLE) * ({_K1} + CAST(1 AS DOUBLE)))
                      / (CAST(tf.tf AS DOUBLE)
                         + {_K1} * ((CAST(1 AS DOUBLE) - {_B})
                                    + {_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))) AS s
            FROM tf
            JOIN df ON tf.wd = df.wd
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN corpus
        ),
        ranked AS (
            SELECT doc_id,
                   COUNT(*) AS n_terms_matched,
                   ROUND(CAST(SUM(CAST(s AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25
            FROM term_scores GROUP BY doc_id
        )
        SELECT doc_id, n_terms_matched, bm25, bm25_rank FROM (
            SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS bm25_rank
            FROM ranked
        ) WHERE bm25_rank <= 20
    """,
    bench=True,
    tags=("ext-text", "ext-corpus"),
)
def cp_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 keyword retrieval over documents for a fixed query
    term set (k1=1.2, b=0.75).  Uses the *rational* idf
    ``(N-df+0.5)/(df+0.5)`` (the argument of the classic log-idf —
    rank-order identical for any single term, and hash-deterministic
    across engines, unlike ``ln``).

    Spark shape (round-8 rework): the tf posting table feeds BOTH the
    df aggregate and the scoring join, and the doc-length table feeds
    both avgdl and the scoring join — CTE inlining re-ran the corpus
    explode and the length scan once per consumer (measured: 4
    documents scans, 2 Generates).  Both are now built once and
    ``materialize()``d (exactly the standing posting-list + doc-length
    tables a production BM25 index maintains, sf-keyed like the
    minhash/shingle/bigram artifacts); every consumer reads the
    artifacts and the scoring statement touches the raw corpus zero
    times.  df/avgdl are tiny aggregates broadcast into the scoring
    join; global top-20 is ORDER BY … LIMIT 20 — Catalyst's
    TakeOrderedAndProject (per-partition heaps merged on the driver),
    NOT a single-partition window over every matched doc, so it stays
    O(k) per partition however many docs match the query terms; the
    rank window then runs over just the 20 survivors.
    """
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "documents")
    tf = materialize(
        spark.sql(
            f"""
            SELECT doc_id, wd, COUNT(*) AS tf
            FROM (SELECT doc_id, explode(split(text, ' ')) AS wd
                  FROM dew_documents)
            WHERE wd IN {_BM25_TERMS}
            GROUP BY doc_id, wd
            """
        ),
        "bm25_tf",
        cache_key=f"bm25_tf:{sf_dir}",
    )
    dl = materialize(
        spark.sql(
            "SELECT doc_id, size(split(text, ' ')) AS dl FROM dew_documents"
        ),
        "bm25_dl",
        cache_key=f"bm25_dl:{sf_dir}",
    )
    tf.createOrReplaceTempView("dew_bm25_tf")
    dl.createOrReplaceTempView("dew_bm25_dl")
    return spark.sql(
        f"""
        WITH dl AS (SELECT doc_id, dl FROM dew_bm25_dl),
        corpus AS (
            SELECT COUNT(*) AS n_docs,
                   CAST(CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avgdl
            FROM dl
        ),
        tf AS (SELECT doc_id, wd, tf FROM dew_bm25_tf),
        df AS (SELECT wd, COUNT(*) AS df FROM tf GROUP BY wd),
        term_scores AS (
            SELECT tf.doc_id, tf.wd,
                   ((CAST(corpus.n_docs - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * ((CAST(tf.tf AS DOUBLE) * ({_K1} + CAST(1 AS DOUBLE)))
                      / (CAST(tf.tf AS DOUBLE)
                         + {_K1} * ((CAST(1 AS DOUBLE) - {_B})
                                    + {_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))) AS s
            FROM tf
            JOIN df ON tf.wd = df.wd
            JOIN dl ON tf.doc_id = dl.doc_id
            CROSS JOIN corpus
        ),
        ranked AS (
            SELECT doc_id,
                   COUNT(*) AS n_terms_matched,
                   ROUND(CAST(SUM(CAST(s AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25
            FROM term_scores GROUP BY doc_id
        ),
        topk AS (
            SELECT * FROM ranked ORDER BY bm25 DESC, doc_id ASC LIMIT 20
        )
        SELECT doc_id, n_terms_matched, bm25,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS bm25_rank
        FROM topk
        """
    )


@query(
    "sd_semantic_dedup",
    oracle="""
        WITH ex AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
            FROM embeddings
        ),
        nrm AS (
            SELECT vec_id,
                   CAST(SUM(CAST(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS nrm
            FROM ex GROUP BY vec_id
        ),
        cents AS (SELECT vec_id AS cell, i, v FROM ex WHERE vec_id < 8),
        cdot AS (
            SELECT ex.vec_id, c.cell,
                   CAST(SUM(CAST(CAST(ex.v AS DOUBLE) * CAST(c.v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS dot
            FROM ex JOIN cents c ON ex.i = c.i
            GROUP BY ex.vec_id, c.cell
        ),
        assigned AS (
            SELECT vec_id, cell FROM (
                SELECT cdot.vec_id, cdot.cell,
                       row_number() OVER (
                           PARTITION BY cdot.vec_id
                           ORDER BY ((n1.nrm - (CAST(2 AS DOUBLE) * cdot.dot)) + n2.nrm) ASC,
                                    cdot.cell ASC
                       ) AS rn
                FROM cdot
                JOIN nrm n1 ON cdot.vec_id = n1.vec_id
                JOIN nrm n2 ON cdot.cell = n2.vec_id
            ) WHERE rn = 1
        ),
        pdot AS (
            SELECT a.vec_id AS id1, b.vec_id AS id2,
                   CAST(SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE) AS dot
            FROM ex a JOIN ex b ON a.i = b.i AND a.vec_id < b.vec_id
            JOIN assigned x ON a.vec_id = x.vec_id
            JOIN assigned y ON b.vec_id = y.vec_id AND x.cell = y.cell
            GROUP BY a.vec_id, b.vec_id
        ),
        dups AS (
            SELECT DISTINCT pdot.id2 AS vec_id
            FROM pdot JOIN nrm n1 ON pdot.id1 = n1.vec_id
                      JOIN nrm n2 ON pdot.id2 = n2.vec_id
            WHERE pdot.dot / sqrt(n1.nrm * n2.nrm) >= 0.3
        )
        SELECT a.vec_id, a.cell,
               CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
        FROM assigned a LEFT JOIN dups d ON a.vec_id = d.vec_id
    """,
    bench=True,
    tags=("ext-dedup", "ext-sim"),
)
def sd_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) shape: coarse-cluster the embedding
    space, then mark within-cell cosine near-duplicates (τ=0.3), keeping
    the lowest vec_id of each near-dup pair as the survivor.

    Two regimes, same plan shape (broadcast/inline centroids → map-side
    argmin → bounded within-cell pair join):

    - ≤ ``SD_SCALE_THRESHOLD`` rows: the coarse quantizer is 8
      deterministic seed vectors (vec_id < 8) so the DuckDB oracle
      reproduces the assignment exactly — the driver-checked path.
    - above it: trained MLlib k-means (``llmops.semdedup``) with
      ``nlist ≈ √N``, so the within-cell pair space is Σ cell² ≈ N^1.5
      instead of O(N²/8) — the 100 TB path.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.materialize import materialize
    from dataengineeringworkshop_spark.plans.simops import _DOT, _norms

    e = _norms(spark, sf_dir)
    n = e.count()
    if n > SD_SCALE_THRESHOLD:
        from dataengineeringworkshop_spark.llmops.semdedup import (
            scale_nlist,
            semantic_dedup,
        )

        return semantic_dedup(
            e, "vec_id", "embedding", tau=0.3, nlist=scale_nlist(n),
            index_key=f"embeddings:{sf_dir}",
        )
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    crossed = e.join(F.broadcast(cents))
    dist2 = (
        F.col("nrm")
        - (F.lit(2).cast("double") * F.expr(_DOT.format(a="embedding", b="c_emb")))
    ) + F.col("c_nrm")
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cell").asc())
    # The assignment feeds three branches (both pair-join sides + the
    # final output); materialize it once — one corpus pass, and exactly
    # the persisted cell-assignment table a production SemDeDup keeps.
    assigned = materialize(
        crossed.withColumn("dist2", dist2)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cell", "embedding", "nrm"),
        label="semdedup_cells",
        cache_key=f"semdedup:{sf_dir}",
    )
    a = assigned.select(
        F.col("vec_id").alias("id1"), F.col("cell"),
        F.col("embedding").alias("v1"), F.col("nrm").alias("n1"),
    )
    b = assigned.select(
        F.col("vec_id").alias("id2"), F.col("cell"),
        F.col("embedding").alias("v2"), F.col("nrm").alias("n2"),
    )
    pairs = a.join(b, ["cell"]).filter(F.col("id1") < F.col("id2"))
    cos = F.expr(_DOT.format(a="v1", b="v2")) / F.sqrt(F.col("n1") * F.col("n2"))
    dups = pairs.filter(cos >= 0.3).select(F.col("id2").alias("dup_id")).distinct()
    return (
        assigned.join(dups, assigned.vec_id == dups.dup_id, "left")
        .select(
            "vec_id",
            "cell",
            F.when(F.col("dup_id").isNull(), F.lit(0)).otherwise(F.lit(1)).alias("is_dup"),
        )
    )


@query(
    "sim_embed_quantize",
    oracle="""
        WITH ex AS (
            SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings
        ),
        mm AS (
            SELECT vec_id, MIN(v) AS mn, MAX(v) AS mx,
                   (MAX(v) - MIN(v)) / CAST(255 AS DOUBLE) AS scale
            FROM ex GROUP BY vec_id
        ),
        q AS (
            SELECT ex.vec_id, ex.v, mm.mn, mm.scale,
                   CASE WHEN mm.scale = 0 THEN 0
                        ELSE CAST(LEAST(CAST(255 AS DOUBLE), GREATEST(CAST(0 AS DOUBLE),
                             FLOOR((ex.v - mm.mn) / mm.scale + CAST(0.5 AS DOUBLE)))) AS INT)
                   END AS qv
            FROM ex JOIN mm ON ex.vec_id = mm.vec_id
        )
        SELECT vec_id,
               COUNT(*) AS n_dims,
               MIN(qv) AS q_min,
               MAX(qv) AS q_max,
               ROUND(CAST(SUM(CAST(
                   (v - (mn + (qv * scale))) * (v - (mn + (qv * scale)))
                   AS DECIMAL(28,14))) AS DOUBLE), 6) AS sse
        FROM q GROUP BY vec_id
    """,
    tags=("ext-sim",),
)
def sim_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-range scalar quantization of embeddings (per-vector min/max
    affine code, 0..255) with exact reconstruction SSE — the 4× storage
    cut that makes a 100 TB embedding store scannable.  The Spark plan
    is a PURE MAP: per-vector min/max, the per-element code, and the
    DECIMAL SSE fold are all array higher-order functions inside one
    projection — ONE scan, ZERO shuffle, no join (round-9 scan audit:
    the explode→groupBy→join-back form scanned embeddings twice and
    shuffled dim× rows; the oracle keeps that relational form, which is
    how DuckDB expresses it).

    FLOOR(x + 0.5) instead of ROUND keeps the code point identical in
    both engines (ROUND's half-even/half-up behavior differs on
    doubles); all arithmetic is single-rounding IEEE ops on identical
    operand trees, and the SSE accumulates in DECIMAL(28,14) — exact,
    so fold order is irrelevant.

    NULL/empty-vector contract (ADVICE r9): the oracle's relational
    unnest form emits NO row for a NULL or zero-length embedding; the
    pure-map form would emit an (n_dims=0, NULL min/max) row for it, so
    the scan filters those vectors out explicitly to keep the output
    row set identical.  The generator never produces them today — the
    guard pins the contract against future data.
    """
    register_views(spark, sf_dir, "embeddings")
    return spark.sql(
        """
        WITH coded AS (
            SELECT vec_id,
                   transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
                   array_min(transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
                   (array_max(transform(embedding, x -> CAST(x AS DOUBLE)))
                    - array_min(transform(embedding, x -> CAST(x AS DOUBLE))))
                       / CAST(255 AS DOUBLE) AS scale
            FROM dew_embeddings
            WHERE embedding IS NOT NULL AND size(embedding) > 0
        ),
        q AS (
            SELECT vec_id, v, mn, scale,
                   transform(v, x ->
                       CASE WHEN scale = 0 THEN 0
                            ELSE CAST(LEAST(CAST(255 AS DOUBLE),
                                 GREATEST(CAST(0 AS DOUBLE),
                                 FLOOR((x - mn) / scale + CAST(0.5 AS DOUBLE))))
                                 AS INT)
                       END) AS qv
            FROM coded
        )
        SELECT vec_id,
               CAST(size(v) AS BIGINT) AS n_dims,
               array_min(qv) AS q_min,
               array_max(qv) AS q_max,
               ROUND(CAST(aggregate(
                   zip_with(v, qv, (x, c) ->
                       (x - (mn + (c * scale))) * (x - (mn + (c * scale)))),
                   CAST(0 AS DECIMAL(28,14)),
                   (acc, d) -> CAST(acc + CAST(d AS DECIMAL(28,14))
                               AS DECIMAL(28,14))
               ) AS DOUBLE), 6) AS sse
        FROM q
        """
    )


@query(
    "cl_kmeans_two_rounds",
    oracle="""
        WITH ex AS (
            SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                   CAST(unnest(embedding) AS DOUBLE) AS v
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS cell, i, v AS c FROM ex WHERE vec_id < 8),
        d1 AS (
            SELECT ex.vec_id, c0.cell,
                   CAST(SUM(CAST((ex.v - c0.c) * (ex.v - c0.c) AS DECIMAL(28,14))) AS DOUBLE) AS dist2
            FROM ex JOIN c0 ON ex.i = c0.i
            GROUP BY ex.vec_id, c0.cell
        ),
        a1 AS (
            SELECT vec_id, cell FROM (
                SELECT vec_id, cell,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cell ASC) AS rn
                FROM d1
            ) WHERE rn = 1
        ),
        c1 AS (
            SELECT a1.cell, ex.i,
                   CAST(SUM(CAST(ex.v AS DECIMAL(28,14))) AS DOUBLE) / COUNT(*) AS c
            FROM ex JOIN a1 ON ex.vec_id = a1.vec_id
            GROUP BY a1.cell, ex.i
        ),
        d2 AS (
            SELECT ex.vec_id, c1.cell,
                   CAST(SUM(CAST((ex.v - c1.c) * (ex.v - c1.c) AS DECIMAL(28,14))) AS DOUBLE) AS dist2
            FROM ex JOIN c1 ON ex.i = c1.i
            GROUP BY ex.vec_id, c1.cell
        ),
        a2 AS (
            SELECT vec_id, cell, dist2 FROM (
                SELECT vec_id, cell, dist2,
                       row_number() OVER (PARTITION BY vec_id ORDER BY dist2 ASC, cell ASC) AS rn
                FROM d2
            ) WHERE rn = 1
        )
        SELECT cell, COUNT(*) AS n_members,
               ROUND(CAST(SUM(CAST(dist2 AS DECIMAL(28,14))) AS DOUBLE), 6) AS inertia
        FROM a2 GROUP BY cell
    """,
    tags=("ext-sim", "iterative"),
)
def cl_kmeans_two_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations (k=8, seed centroids = vec_id < 8)
    with an EXACT DuckDB oracle — assignment → mean update → reassignment,
    reporting per-cell size and inertia.  Demonstrates iterative ML as
    pure relational algebra with cross-engine bit-identical results
    (decimal-fold distances, argmin tie-broken on cell id).

    Spark shape: centroids stay DataFrames the whole way — 8-row tables
    broadcast into zip_with distance folds (map-side), mean update is one
    partial-agg groupBy, and the corpus is never collected to the driver.
    The production many-round path with convergence checks is MLlib
    k-means in ``llmops.ivf``; this query is the auditable relational
    round."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.plans.tables import load_table

    _SQDIST = (
        "CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
        "CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) AS DECIMAL(28,14))), "
        "CAST(0 AS DECIMAL(28,14)), (acc, v) -> CAST(acc + v AS DECIMAL(28,14))) AS DOUBLE)"
    )
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    w = Window.partitionBy("vec_id").orderBy(F.col("dist2").asc(), F.col("cell").asc())

    def assign(centroids: DataFrame) -> DataFrame:
        crossed = e.join(F.broadcast(centroids))
        return (
            crossed.withColumn("dist2", F.expr(_SQDIST.format(a="embedding", b="c_emb")))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "cell", "dist2")
        )

    c0 = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("c_emb"),
    )
    a1 = assign(c0)
    # mean update: explode members, decimal-exact mean per (cell, dim),
    # re-pack into ordered centroid arrays (sort on dim index -> the
    # collect_list order is made deterministic before transform).
    c1 = (
        a1.select("cell", F.posexplode("embedding").alias("i", "x"))
        .groupBy("cell", "i")
        .agg(
            (
                F.expr("CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14))) AS DOUBLE)")
                / F.count("*")
            ).alias("c")
        )
        .groupBy("cell")
        .agg(
            F.expr("transform(array_sort(collect_list(struct(i, c))), s -> s.c)").alias("c_emb")
        )
    )
    a2 = assign(c1)
    return a2.groupBy("cell").agg(
        F.count("*").alias("n_members"),
        F.round(
            F.expr("CAST(SUM(CAST(dist2 AS DECIMAL(28,14))) AS DOUBLE)"), 6
        ).alias("inertia"),
    )


@query(
    "cp_chunk_documents",
    oracle="""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id, s,
                   array_to_string(list_slice(w, s, s + 63), ' ') AS chunk_text,
                   len(list_slice(w, s, s + 63)) AS n_tokens
            FROM ws, unnest(generate_series(1, len(w), 48)) AS t(s)
        )
        SELECT doc_id,
               CAST((s - 1) / 48 AS INT) AS chunk_idx,
               n_tokens,
               chunk_text
        FROM chunks
    """,
    tags=("ext-corpus", "ext-text"),
)
def cp_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-ingestion chunking: 64-word windows with stride 48 (16-word
    overlap) per document — the chunk table an embedding/index stage
    consumes.  Pure map + explode over an index sequence (no shuffle at
    all until a downstream stage groups or joins); chunk identity
    (doc_id, chunk_idx) is deterministic so re-runs are idempotent."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        WITH ws AS (
            SELECT doc_id, split(text, ' ') AS w FROM dew_documents
        ),
        chunks AS (
            SELECT doc_id, s,
                   array_join(slice(w, s, 64), ' ') AS chunk_text,
                   size(slice(w, s, 64)) AS n_tokens
            FROM ws
            LATERAL VIEW explode(sequence(1, size(w), 48)) t AS s
        )
        SELECT doc_id,
               CAST((s - 1) / 48 AS INT) AS chunk_idx,
               n_tokens,
               chunk_text
        FROM chunks
        """
    )


@query(
    "rag_chunk_topk",
    oracle=f"""
        WITH ws AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        chunks AS (
            SELECT doc_id, CAST((s - 1) / 48 AS INT) AS chunk_idx,
                   list_slice(w, s, s + 63) AS cw
            FROM ws, unnest(generate_series(1, len(w), 48)) AS t(s)
        ),
        ex AS (
            SELECT doc_id, chunk_idx, unnest(cw) AS wd FROM chunks
        ),
        dl AS (SELECT doc_id, chunk_idx, len(cw) AS dl FROM chunks),
        corpus AS (
            SELECT COUNT(*) AS n_chunks,
                   CAST(CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, chunk_idx, wd, COUNT(*) AS tf
            FROM ex WHERE wd IN {_BM25_TERMS}
            GROUP BY doc_id, chunk_idx, wd
        ),
        df AS (SELECT wd, COUNT(*) AS df FROM tf GROUP BY wd),
        term_scores AS (
            SELECT tf.doc_id, tf.chunk_idx,
                   ((CAST(corpus.n_chunks - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * ((CAST(tf.tf AS DOUBLE) * ({_K1} + CAST(1 AS DOUBLE)))
                      / (CAST(tf.tf AS DOUBLE)
                         + {_K1} * ((CAST(1 AS DOUBLE) - {_B})
                                    + {_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))) AS s
            FROM tf
            JOIN df ON tf.wd = df.wd
            JOIN dl ON tf.doc_id = dl.doc_id AND tf.chunk_idx = dl.chunk_idx
            CROSS JOIN corpus
        ),
        ranked AS (
            SELECT doc_id, chunk_idx,
                   ROUND(CAST(SUM(CAST(s AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25
            FROM term_scores GROUP BY doc_id, chunk_idx
        )
        SELECT doc_id, chunk_idx, bm25, chunk_rank FROM (
            SELECT *, row_number() OVER (
                ORDER BY bm25 DESC, doc_id ASC, chunk_idx ASC) AS chunk_rank
            FROM ranked
        ) WHERE chunk_rank <= 20
    """,
    tags=("ext-corpus", "ext-text"),
)
def rag_chunk_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG retrieval over CHUNKS: strided 64/48 chunking →
    per-chunk BM25 against the query terms → global top-20 chunks.
    Retrieval granularity is the chunk, not the document — the shape a
    RAG serving index answers.  Same rational-idf determinism as
    ``cp_bm25_search``; only term-matching chunks reach the final
    window."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH ws AS (
            SELECT doc_id, split(text, ' ') AS w FROM dew_documents
        ),
        chunks AS (
            SELECT doc_id, CAST((s - 1) / 48 AS INT) AS chunk_idx,
                   slice(w, s, 64) AS cw
            FROM ws
            LATERAL VIEW explode(sequence(1, size(w), 48)) t AS s
        ),
        ex AS (
            SELECT doc_id, chunk_idx, explode(cw) AS wd FROM chunks
        ),
        dl AS (SELECT doc_id, chunk_idx, size(cw) AS dl FROM chunks),
        corpus AS (
            SELECT COUNT(*) AS n_chunks,
                   CAST(CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, chunk_idx, wd, COUNT(*) AS tf
            FROM ex WHERE wd IN {_BM25_TERMS}
            GROUP BY doc_id, chunk_idx, wd
        ),
        df AS (SELECT wd, COUNT(*) AS df FROM tf GROUP BY wd),
        term_scores AS (
            SELECT tf.doc_id, tf.chunk_idx,
                   ((CAST(corpus.n_chunks - df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                    / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   * ((CAST(tf.tf AS DOUBLE) * ({_K1} + CAST(1 AS DOUBLE)))
                      / (CAST(tf.tf AS DOUBLE)
                         + {_K1} * ((CAST(1 AS DOUBLE) - {_B})
                                    + {_B} * (CAST(dl.dl AS DOUBLE) / corpus.avgdl)))) AS s
            FROM tf
            JOIN df ON tf.wd = df.wd
            JOIN dl ON tf.doc_id = dl.doc_id AND tf.chunk_idx = dl.chunk_idx
            CROSS JOIN corpus
        ),
        ranked AS (
            SELECT doc_id, chunk_idx,
                   ROUND(CAST(SUM(CAST(s AS DECIMAL(28,14))) AS DOUBLE), 6) AS bm25
            FROM term_scores GROUP BY doc_id, chunk_idx
        )
        SELECT doc_id, chunk_idx, bm25, chunk_rank FROM (
            SELECT *, row_number() OVER (
                ORDER BY bm25 DESC, doc_id ASC, chunk_idx ASC) AS chunk_rank
            FROM ranked
        ) WHERE chunk_rank <= 20
        """
    )
