"""Corpus curation queries (round 6, wave 4): deterministic weighted
sampling, per-source relative quality gating, and TF-IDF salient terms.

Training-data curation needs sampling that is (a) weighted — long/good
documents should be drawn proportionally more often, (b) stratified —
every source keeps representation, and (c) REPRODUCIBLE — the same
corpus must yield the same sample on every engine and every run.
Pseudo-random keys fail (c) across engines, so the sampler here is
systematic: exact integer cumulative weights with evenly spaced integer
thresholds — the classic systematic/PPS design, expressed as one window
plus a filter.

Scale shapes:
- Weighted sample: one window per source partition (cumulative integer
  sum) + a map-side threshold filter.  No global sort, no RNG, no
  collect; per-source parallelism is the stratification axis.
- Percentile gate: percent_rank inside each source partition — relative
  thresholds auto-adapt to per-source score distributions (an absolute
  threshold would empty strict sources and pass everything from lax
  ones).
- TF-IDF: tf/df are two grouped counts off ONE token explode; the
  1-row corpus size joins by broadcast; top-k per doc is a bounded
  window over the (already reduced) per-(doc, term) table.

Determinism: weights and thresholds are integers (exact); the idf is
the RATIONAL (N+1)/(df+1) — a single integer-product division, the
searchq.py no-transcendentals rule; every ranking carries a unique
tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dataengineeringworkshop_spark.plans.registry import query
from dataengineeringworkshop_spark.plans.tables import register_views

#: systematic-sampling target per source stratum
_K_PER_SOURCE = 20


@query(
    "cp_weighted_sample",
    # a doc is selected iff an integer threshold i*total/k (i = 1..k)
    # falls inside its cumulative-weight interval (cum-w, cum] —
    # equivalently the floor-division bucket index advances at the doc.
    # All-integer arithmetic: engine-independent by construction.
    oracle=f"""
        WITH w AS (
            SELECT doc_id, source, n_chars,
                   SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(n_chars) OVER (PARTITION BY source) AS total
            FROM documents
        )
        SELECT doc_id, source, n_chars,
               CAST((cum * {_K_PER_SOURCE}) // total AS BIGINT) AS slot
        FROM w
        WHERE (cum * {_K_PER_SOURCE}) // total
              > ((cum - n_chars) * {_K_PER_SOURCE}) // total
    """,
    tags=("ext-corpus", "sampling"),
)
def cp_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted (PPS) systematic sample, stratified by
    source: inside each source, documents are selected where an evenly
    spaced weight threshold (k = 20 per stratum, weight = n_chars)
    lands in the document's cumulative-weight interval — selection
    probability proportional to length, exactly reproducible, no RNG.
    One cumulative-sum window per source partition plus a map-side
    filter; a 100 TB corpus pays one shuffle on source (or zero if the
    layout is already source-partitioned).  Oversized documents that
    straddle several thresholds are selected once (their slot is the
    last threshold passed), so the sample size is ≤ k per stratum —
    the standard systematic-sampling behavior."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH w AS (
            SELECT doc_id, source, n_chars,
                   SUM(n_chars) OVER (
                       PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum,
                   SUM(n_chars) OVER (PARTITION BY source) AS total
            FROM dew_documents
        )
        SELECT doc_id, source, n_chars,
               CAST((cum * {_K_PER_SOURCE}) div total AS BIGINT) AS slot
        FROM w
        WHERE (cum * {_K_PER_SOURCE}) div total
              > ((cum - n_chars) * {_K_PER_SOURCE}) div total
        """
    )


@query(
    "cp_quality_percentile_gate",
    # same composite score as t_quality_score; the gate keeps each
    # source's top half by PER-SOURCE percent_rank (unique (score,
    # doc_id) order -> engine-independent rank rationals).
    oracle="""
        WITH scored AS (
            SELECT doc_id, source,
                   ROUND(
                     0.4 * least(LENGTH(text) / 500.0, 1.0)
                   + 0.3 * least(len(string_split(text, ' ')) / 100.0, 1.0)
                   + 0.3 * (CASE WHEN lang = 'en' THEN 1.0 ELSE 0.5 END),
                   6) AS quality_score
            FROM documents
        ),
        ranked AS (
            SELECT source, quality_score,
                   percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY quality_score DESC, doc_id ASC
                   ) AS pr
            FROM scored
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE pr <= 0.5) AS n_kept,
               MIN(CASE WHEN pr <= 0.5 THEN quality_score END)
                   AS cutoff_score
        FROM ranked
        GROUP BY source
    """,
    tags=("ext-corpus", "ext-text"),
)
def cp_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source RELATIVE quality gate: keep each source's top half by
    percent_rank of the composite quality score (t_quality_score's
    formula) — the curation pattern when sources have incomparable
    score distributions and an absolute threshold would gut one source
    while passing all of another.  One window per source partition over
    already-scored rows; the report is a per-source reduction (kept
    count + realized cutoff), so the output is |sources| rows at any
    corpus size."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        WITH scored AS (
            SELECT doc_id, source,
                   ROUND(CAST(
                     CAST(0.4 AS DOUBLE)
                       * least(LENGTH(text) / CAST(500.0 AS DOUBLE),
                               CAST(1.0 AS DOUBLE))
                   + CAST(0.3 AS DOUBLE)
                       * least(size(split(text, ' ')) / CAST(100.0 AS DOUBLE),
                               CAST(1.0 AS DOUBLE))
                   + CAST(0.3 AS DOUBLE)
                       * (CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
                               ELSE CAST(0.5 AS DOUBLE) END)
                   AS DOUBLE), 6) AS quality_score
            FROM dew_documents
        ),
        ranked AS (
            SELECT source, quality_score,
                   percent_rank() OVER (
                       PARTITION BY source
                       ORDER BY quality_score DESC, doc_id ASC
                   ) AS pr
            FROM scored
        )
        SELECT source,
               COUNT(*) AS n_docs,
               COUNT(*) FILTER (WHERE pr <= 0.5) AS n_kept,
               MIN(CASE WHEN pr <= 0.5 THEN quality_score END)
                   AS cutoff_score
        FROM ranked
        GROUP BY source
        """
    )


@query(
    "t_tfidf_topk",
    # rational idf (N+1)/(df+1): integer product then ONE division —
    # bit-identical across engines (searchq.py's BM25 determinism rule).
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, COUNT(*) AS tf
            FROM tok GROUP BY doc_id, term
        ),
        df AS (
            SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1)
                       AS tfidf
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC
                   ) AS rn
            FROM scored
        ) r WHERE rn <= 3
    """,
    tags=("ext-text", "ext-corpus"),
)
def t_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by TF-IDF with the rational idf
    (N+1)/(df+1) — the per-document keyword/topic signal (BM25 in
    searchq.py is the query-serving twin; this is the corpus-wide
    labeling pass).  The (doc, term, tf) table feeds both the
    document-frequency aggregate and the scoring join, and Spark
    inlines CTEs — so the token explode would run twice (round-8 scan
    audit); it is built once and ``materialize()``d (the standing term
    index this labeling pass shares conceptually with the BM25 posting
    table), and df collapses FROM it (tf is already distinct per
    (doc, term), so COUNT(*) per term IS the document frequency — no
    second explode, no COUNT(DISTINCT)).  The dictionary-sized df table
    joins back on term (AQE broadcasts it while it fits, hash-join
    beyond); the 1-row corpus count is a broadcast cross join; top-k is
    a window over the per-(doc, term) table, which is already reduced
    far below token volume.  (term ASC, score DESC) with integer tf/df
    makes the cut engine-independent."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "documents")
    tf = materialize(
        spark.sql(
            """
            SELECT doc_id, term, COUNT(*) AS tf
            FROM (SELECT doc_id, explode(split(text, ' ')) AS term
                  FROM dew_documents)
            GROUP BY doc_id, term
            """
        ),
        "tfidf_tf",
        cache_key=f"tfidf_tf:{sf_dir}",
    )
    tf.createOrReplaceTempView("dew_tfidf_tf")
    return spark.sql(
        """
        WITH tf AS (SELECT doc_id, term, tf FROM dew_tfidf_tf),
        df AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT COUNT(*) AS n_docs FROM dew_documents),
        scored AS (
            SELECT tf.doc_id, tf.term, tf.tf, df.df,
                   CAST(tf.tf * (n.n_docs + 1) AS DOUBLE) / (df.df + 1)
                       AS tfidf
            FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, tfidf
        FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY doc_id
                       ORDER BY tfidf DESC, term ASC
                   ) AS rn
            FROM scored
        ) r WHERE rn <= 3
        """
    )


# TABLESAMPLE parity, done the way that actually reproduces at scale.
# Spark's `TABLESAMPLE (x PERCENT) REPEATABLE(seed)` draws its randoms
# PER PARTITION in partition order — the selected set changes whenever
# the file layout, split size, or cluster width changes, and no other
# engine replays Spark's RNG, so a seeded TABLESAMPLE can never be
# oracle-paired nor used for a stable train/eval split.  The portable
# equivalent is HASH-TICKET sampling: ticket = md5(key) prefix, keep
# rows whose ticket falls below the rate threshold.  Membership is a
# pure function of the KEY — stable across engines, partitionings,
# cluster sizes, and corpus growth (a document never migrates in or
# out of the sample as data is appended — the property train/test
# splits require).
_HEX4_5PCT = "0ccd"  # 0x0ccd / 0x10000 = 3277/65536 ≈ 5.0% keep rate


@query(
    "cp_hash_sample_deterministic",
    oracle=f"""
        SELECT 'bernoulli' AS method, doc_id, source, n_chars,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS ticket
        FROM documents
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_HEX4_5PCT}'
        UNION ALL
        SELECT 'system_block', doc_id, source, n_chars,
               substr(md5(CAST(doc_id // 100 AS VARCHAR)), 1, 4)
        FROM documents
        WHERE substr(md5(CAST(doc_id // 100 AS VARCHAR)), 1, 4) < '{_HEX4_5PCT}'
    """,
    tags=("ext-corpus", "sampling", "tablesample"),
)
def cp_hash_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic TABLESAMPLE twin — both flavors, no RNG: the
    BERNOULLI row-level sample keeps documents whose md5(doc_id) hex
    ticket lands under the 5% threshold; the SYSTEM block-level
    analogue tickets the 100-key BLOCK (doc_id div 100) instead, so
    whole contiguous key ranges are kept or dropped together —
    reproducing SYSTEM's clustered-IO behavior (at real scale the
    block key is the file/partition id) while staying a pure function
    of the data.  Seeded ``TABLESAMPLE … REPEATABLE`` cannot do this:
    Spark draws per-partition in layout order, so the sample mutates
    under repartitioning and is unreproducible on any other engine
    (see module-top note).  Extension surface: the reference notebooks
    never sample, but a 100 TB curation pipeline cannot explore or
    split without this.  Scale: ONE scan — both methods' tickets are
    emitted per row by a ``stack`` generator and filtered map-side
    (the oracle's UNION ALL form would scan the corpus twice); zero
    shuffles, zero driver involvement; the ticket costs one md5 over
    an 8-byte key, and sampling composes with appends (membership
    never flips)."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        SELECT method, doc_id, source, n_chars, ticket
        FROM (
            SELECT doc_id, source, n_chars,
                   stack(2,
                         'bernoulli',
                         substr(md5(CAST(doc_id AS STRING)), 1, 4),
                         'system_block',
                         substr(md5(CAST(doc_id div 100 AS STRING)), 1, 4)
                   ) AS (method, ticket)
            FROM dew_documents
        )
        WHERE ticket < '{_HEX4_5PCT}'
        """
    )
