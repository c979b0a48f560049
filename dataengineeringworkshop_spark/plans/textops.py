"""Documents-table queries: generators (§2.9), array functions (F13), and
the LLM-pipeline text-analysis/dedup extensions (SURVEY.md §7, BASELINE
north star): token stats, language guess, quality score, fingerprinting,
exact dedup, n-gram Jaccard near-dup pairs.

Dialect discipline for oracle parity:
- No backslash escapes in regexes (Spark SQL and DuckDB unescape string
  literals differently) — character classes only.
- Ratios compared via integer cross-multiplication, never float division
  inside predicates.
- posexplode (0-based) ↔ DuckDB ``generate_subscripts(arr,1)-1`` + unnest.

Scale posture: everything is explode → hash-aggregate / inverted-index
join — no cross joins, no driver loops.  The Jaccard candidate join caps
shingle document-frequency (``maxdf``) so hot shingles can't quadratically
explode the pair space — the standard trick at 100 TB, where you'd also
band with MinHash first (see llmops.minhash for the oracle-less scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import pack_id_sql, query
from dataengineeringworkshop_spark.plans.tables import register_views


def _sql(spark: SparkSession, sf_dir: str, tables: tuple[str, ...], sql: str) -> DataFrame:
    register_views(spark, sf_dir, *tables)
    return spark.sql(sql)


@query(
    "g1_posexplode_tokens",
    oracle="""
        SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS token
        FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
    """,
    tags=("G1", "F13"),
)
def g1_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode(array) with parent columns preserved (N2:383-394)."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        "SELECT doc_id, posexplode(split(text, ' ')) AS (pos, token) FROM dew_documents",
    )


@query(
    "g2_explode_token_freq",
    oracle="""
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS token FROM documents
        ) GROUP BY token
    """,
    bench=True,
    tags=("G2", "A2"),
)
def g2_explode_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + aggregate: corpus token frequency (N3:148-150 explode
    idiom).  Partial aggregation happens map-side before the shuffle."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        SELECT token, COUNT(*) AS cnt FROM (
            SELECT explode(split(text, ' ')) AS token FROM dew_documents
        ) GROUP BY token
        """,
    )


@query(
    "f13_size_split",
    oracle="SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents",
    tags=("F13",),
)
def f13_size_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size(array) (N4:122) — whitespace token count per document."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        "SELECT doc_id, CAST(size(split(text, ' ')) AS BIGINT) AS n_tokens FROM dew_documents",
    )


@query(
    "t_text_stats",
    oracle="""
        SELECT doc_id, n_chars,
               LENGTH(text) AS len_chars,
               len(string_split(text, ' ')) AS n_words,
               len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]')) AS n_digits
        FROM documents
    """,
    tags=("ext-text",),
)
def t_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality-scoring features: char/word/punct/digit counts."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        SELECT doc_id, n_chars,
               CAST(LENGTH(text) AS BIGINT) AS len_chars,
               CAST(size(split(text, ' ')) AS BIGINT) AS n_words,
               CAST(size(regexp_extract_all(text, '([.,!?;:])', 1)) AS BIGINT) AS n_punct,
               CAST(size(regexp_extract_all(text, '([0-9])', 1)) AS BIGINT) AS n_digits
        FROM dew_documents
        """,
    )


@query(
    "t_token_count_regex",
    oracle="""
        SELECT doc_id,
               len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens_bpeish
        FROM documents
    """,
    tags=("ext-text",),
)
def t_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer-regex token count (letters run | digits run |
    single other symbol) — the cheap pre-tokenization count used to budget
    LLM training data."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        SELECT doc_id,
               CAST(size(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)) AS BIGINT)
                   AS n_tokens_bpeish
        FROM dew_documents
        """,
    )


@query(
    "t_bpe_pair_counts",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        pairs AS (
            SELECT unnest(CASE WHEN len(w) < 2 THEN []
                               ELSE [array_to_string(list_slice(w, i, i + 1), ' ')
                                     FOR i IN range(1, len(w))] END) AS pair
            FROM toks
        )
        SELECT pair, COUNT(*) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT 200
    """,
    tags=("ext-text",),
)
def t_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-token pair frequencies, top-200 — one merge iteration of
    BPE/WordPiece tokenizer training, corpus-wide.  Map-side explode +
    partial-agg groupBy: the shuffle carries (pair, partial count), never
    raw pairs, so cost scales with distinct pairs, not corpus tokens."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        WITH toks AS (
            SELECT doc_id, split(text, ' ') AS w FROM dew_documents
        ),
        pairs AS (
            SELECT explode(CASE WHEN size(w) < 2 THEN array()
                                ELSE transform(sequence(1, size(w) - 1),
                                               i -> concat_ws(' ', slice(w, i, 2))) END) AS pair
            FROM toks
        )
        SELECT pair, COUNT(*) AS n
        FROM pairs GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT 200
        """,
    )


@query(
    "t_lang_guess",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_words,
                   SUM(CASE WHEN w IN ('the','a','of','and','to','in','is','that','for','it')
                            THEN 1 ELSE 0 END) AS en_hits
            FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang,
               CASE WHEN h.en_hits * 20 >= h.n_words THEN 'en' ELSE 'other' END AS lang_guess
        FROM documents d JOIN hits h ON d.doc_id = h.doc_id
    """,
    tags=("ext-text",),
)
def t_lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language ID heuristic: guess 'en' when >=5% of tokens
    are English stopwords (integer cross-multiply — no float ratios)."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        WITH tok AS (
            SELECT doc_id, explode(split(lower(text), ' ')) AS w FROM dew_documents
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_words,
                   SUM(CASE WHEN w IN ('the','a','of','and','to','in','is','that','for','it')
                            THEN 1 ELSE 0 END) AS en_hits
            FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang,
               CASE WHEN h.en_hits * 20 >= h.n_words THEN 'en' ELSE 'other' END AS lang_guess
        FROM dew_documents d JOIN hits h ON d.doc_id = h.doc_id
        """,
    )


@query(
    "t_fingerprint",
    oracle="""
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                       '  +', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    tags=("ext-text",),
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-text fingerprint: lowercase → strip non-alnum → collapse
    whitespace → md5.  The canonical-form dedup key."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        SELECT doc_id,
               md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ''),
                                       '  +', ' '))) AS fingerprint
        FROM dew_documents
        """,
    )


@query(
    "d_exact_dedup_keep_first",
    oracle="""
        SELECT doc_id, n_chars FROM (
            SELECT doc_id, n_chars,
                   row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    """,
    tags=("ext-dedup",),
)
def d_exact_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash text, keep lowest doc_id per hash.  One shuffle on
    the 128-bit hash (never on raw text — at 100 TB you shuffle 16-byte
    keys, not document bodies)."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.dedup import dedup_exact
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents").withColumn("__h", F.md5("text"))
    return dedup_exact(d, keys=["__h"], keep_by="doc_id").select("doc_id", "n_chars")


@query(
    "d_dup_group_stats",
    oracle="""
        SELECT n_dups, COUNT(*) AS n_groups FROM (
            SELECT md5(text) AS h, COUNT(*) AS n_dups FROM documents GROUP BY h
        ) GROUP BY n_dups
    """,
    tags=("ext-dedup",),
)
def d_dup_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster histogram: how many exact-dup groups of each size."""
    return _sql(
        spark,
        sf_dir,
        ("documents",),
        """
        SELECT n_dups, COUNT(*) AS n_groups FROM (
            SELECT md5(text) AS h, COUNT(*) AS n_dups FROM dew_documents GROUP BY h
        ) GROUP BY n_dups
        """,
    )


# word-3-gram shingle Jaccard near-dup pairs, df-capped inverted-index join.
_JACCARD_SPARK = """
WITH tok AS (
    SELECT doc_id, split(text, ' ') AS w FROM dew_documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               explode(CASE WHEN size(w) < 3 THEN array()
                            ELSE transform(sequence(1, size(w) - 2),
                                           i -> concat_ws(' ', slice(w, i, 3))) END) AS shingle
        FROM tok
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {maxdf}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare ON sh.shingle = rare.shingle),
pairs AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
    FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, inter,
       s1.sz + s2.sz - inter AS uni,
       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
FROM pairs
JOIN sizes s1 ON pairs.d1 = s1.doc_id
JOIN sizes s2 ON pairs.d2 = s2.doc_id
WHERE inter * 10 >= (s1.sz + s2.sz - inter) * 1
ORDER BY jaccard DESC, d1 ASC, d2 ASC
LIMIT 200
"""

_JACCARD_DUCK = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN []
                                   ELSE [array_to_string(list_slice(w, i, i + 2), ' ')
                                         FOR i IN range(1, len(w) - 1)] END) AS shingle
        FROM tok
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {maxdf}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare ON sh.shingle = rare.shingle),
pairs AS (
    SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
    FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, inter,
       s1.sz + s2.sz - inter AS uni,
       CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter) AS jaccard
FROM pairs
JOIN sizes s1 ON pairs.d1 = s1.doc_id
JOIN sizes s2 ON pairs.d2 = s2.doc_id
WHERE inter * 10 >= (s1.sz + s2.sz - inter) * 1
ORDER BY jaccard DESC, d1 ASC, d2 ASC
LIMIT 200
"""

_JACCARD_MAXDF = 100


def _shingle_artifacts(spark: SparkSession, sf_dir: str):
    """(sh, shf): the materialized word-3-gram inverted index over
    documents, and its df-capped variant — BOTH cached artifacts
    (cache_key), because every consumer (batch pair mining, incremental
    probe) reads them at least twice per plan.  The df cap is applied
    with a window count on the index's own (shingle) partitioning and
    persisted, so the groupBy-df + join cost is paid once at artifact
    build, not once per query — the standing-index maintenance shape of
    a production dedup service."""
    from pyspark.sql import Window

    from dataengineeringworkshop_spark.llmops.minhash import word_shingles
    from dataengineeringworkshop_spark.operators.materialize import materialize
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    sh = materialize(
        word_shingles(d, "doc_id", "text", 3),
        "jaccard_sh",
        cache_key=f"documents:{sf_dir}:sh3",
    )
    shf = materialize(
        sh.withColumn(
            "df", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= _JACCARD_MAXDF)
        .drop("df"),
        "jaccard_shf",
        cache_key=f"documents:{sf_dir}:sh3:df{_JACCARD_MAXDF}",
    )
    return sh, shf

# incremental dedup: "new" docs (doc_id % 10 = 0) probed against the
# standing corpus index — best corpus match per new doc by 3-gram Jaccard
_INCR_DUCK = """
WITH tok AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN []
                                   ELSE [array_to_string(list_slice(w, i, i + 2), ' ')
                                         FOR i IN range(1, len(w) - 1)] END) AS shingle
        FROM tok
    )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {maxdf}),
shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare ON sh.shingle = rare.shingle),
pairs AS (
    SELECT n.doc_id AS new_doc, c.doc_id AS corpus_doc, COUNT(*) AS inter
    FROM shf n JOIN shf c ON n.shingle = c.shingle
    WHERE n.doc_id % 10 = 0 AND c.doc_id % 10 <> 0
    GROUP BY n.doc_id, c.doc_id
),
scored AS (
    SELECT new_doc, corpus_doc, inter,
           ROUND(CAST(inter AS DOUBLE) / (s1.sz + s2.sz - inter), 6) AS jaccard
    FROM pairs
    JOIN sizes s1 ON pairs.new_doc = s1.doc_id
    JOIN sizes s2 ON pairs.corpus_doc = s2.doc_id
    WHERE inter * 10 >= (s1.sz + s2.sz - inter) * 1
),
ranked AS (
    SELECT new_doc, corpus_doc, inter, jaccard,
           row_number() OVER (PARTITION BY new_doc
                              ORDER BY jaccard DESC, corpus_doc ASC) AS rn
    FROM scored
)
SELECT new_doc, corpus_doc, inter, jaccard FROM ranked WHERE rn = 1
"""


@query(
    "d_incremental_dedup_probe",
    oracle=_INCR_DUCK.format(maxdf=_JACCARD_MAXDF),
    tags=("ext-dedup", "ext-corpus"),
)
def d_incremental_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup, production shape: newly-arrived documents
    (doc_id % 10 = 0) probe the STANDING shingle index of the corpus —
    best existing match per new doc by 3-gram Jaccard, or absent if no
    candidate clears the 0.1 floor.

    Scale shape: the shingle index is the same materialized artifact the
    batch near-dup queries use (built once, served here); the probe
    joins only the new docs' shingles against it — cost scales with the
    BATCH size, never the corpus.  This is the nightly-ingest dedup gate:
    batch in, matches out, no corpus rescan."""
    from pyspark.sql import Window

    sh, shf = _shingle_artifacts(spark, sf_dir)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    new_sh = shf.filter(F.col("doc") % 10 == 0)
    corpus_sh = shf.filter(F.col("doc") % 10 != 0)
    pairs = (
        new_sh.alias("n")
        .join(corpus_sh.alias("c"), F.col("n.shingle") == F.col("c.shingle"))
        .groupBy(F.col("n.doc").alias("new_doc"), F.col("c.doc").alias("corpus_doc"))
        .agg(F.count("*").alias("inter"))
    )
    scored = (
        pairs.join(sizes.select(F.col("doc").alias("new_doc"), F.col("sz").alias("sz1")), "new_doc")
        .join(sizes.select(F.col("doc").alias("corpus_doc"), F.col("sz").alias("sz2")), "corpus_doc")
        .withColumn("uni", F.col("sz1") + F.col("sz2") - F.col("inter"))
        .filter(F.col("inter") * 10 >= F.col("uni") * 1)
        .withColumn("jaccard", F.round(F.col("inter").cast("double") / F.col("uni"), 6))
    )
    w = Window.partitionBy("new_doc").orderBy(F.col("jaccard").desc(), F.col("corpus_doc").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("new_doc", "corpus_doc", "inter", "jaccard")
    )


@query(
    "d_ngram_jaccard_pairs",
    oracle=_JACCARD_DUCK.format(maxdf=_JACCARD_MAXDF),
    bench=True,
    tags=("ext-dedup",),
)
def d_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs by word-3-gram Jaccard (df-capped inverted-
    index self-join — no cross join).  Top-200 pairs with Jaccard >= 0.1,
    deterministic tiebreak (jaccard desc, d1, d2).

    DataFrame form (not the SQL in ``_JACCARD_SPARK``): Spark inlines
    CTEs, so the 4 references to the shingle index would re-scan and
    re-explode the corpus 4×; here the index is built once and persisted
    — at 100 TB it's a checkpointed intermediate table."""
    from pyspark.sql import functions as F

    sh, shf = _shingle_artifacts(spark, sf_dir)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        shf.alias("a")
        .join(
            shf.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.select(F.col("doc").alias("d1"), F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col("doc").alias("d2"), F.col("sz").alias("sz2")), "d2")
        .withColumn("uni", F.col("sz1") + F.col("sz2") - F.col("inter"))
        .filter(F.col("inter") * 10 >= F.col("uni") * 1)
        .withColumn("jaccard", F.col("inter").cast("double") / F.col("uni"))
        .select("d1", "d2", "inter", "uni", "jaccard")
        .orderBy(F.col("jaccard").desc(), F.col("d1").asc(), F.col("d2").asc())
        .limit(200)
    )
    return out


from dataengineeringworkshop_spark.llmops.bpe import (  # noqa: E402
    bpe_oracle_sql,
    bpe_vocab_stats_oracle_sql,
)


@query(
    "t_bpe_learn_merges",
    oracle=bpe_oracle_sql(n_merges=8),
    tags=("ext-text", "iterative"),
)
def t_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE tokenizer-training loop (8 merge rounds), hash-checked:
    the Spark side is a driver loop of partial-agg pair-count rounds
    over the weighted word vocabulary (llmops/bpe.py — only the per-
    round argmax row ever reaches the driver), the oracle is the SAME
    algorithm UNROLLED as 8 CTE triples in DuckDB.  Extends
    ``t_bpe_pair_counts`` (one counting pass) to the real iterative
    training product: the ranked merge table a tokenizer ships."""
    from dataengineeringworkshop_spark.llmops.bpe import learn_bpe_merges
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return learn_bpe_merges(d, "text", n_merges=8)


@query(
    "t_bpe_vocab_stats",
    oracle=bpe_vocab_stats_oracle_sql(n_merges=8),
    tags=("ext-text", "iterative"),
)
def t_bpe_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPLY side of BPE, hash-checked: learn 8 merges, apply them
    to the word vocabulary (chained JVM replaces — ``apply_bpe``'s
    engine), and report the symbols-per-word distribution.  The oracle
    reuses the unrolled training CTEs' post-merge vocabulary (seq9), so
    any divergence between the Spark apply path and the training loop's
    own sequence state breaks the hash."""
    from dataengineeringworkshop_spark.llmops.bpe import (
        _word_vocab,
        learn_bpe_merges,
    )
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in learn_bpe_merges(d, "text", n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    vocab = _word_vocab(d, "text")
    seq = F.regexp_replace("w", "(.)", "<$1>")
    for l, r in merges:
        seq = F.replace(seq, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    return (
        vocab.select(seq.alias("s"), "weight")
        .select(
            F.expr("size(split(substr(s, 2, length(s) - 2), '><'))").alias(
                "n_symbols"
            ),
            "weight",
        )
        .groupBy("n_symbols")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("weight").cast("long").alias("total_weight"),
        )
    )


# Winnowing (Schleimer/Wilkerson/Aiken, MOSS): hash every k-gram, keep
# the minimum hash of each sliding window of w consecutive k-gram hashes
# — the selected fingerprints are guaranteed to share at least one hash
# with any other document containing a matching substring of length
# >= w + k - 1.  Hashes are an md5-hex prefix, identical in both engines.
_WINNOW_K = 8
_WINNOW_W = 4


@query(
    "t_winnowing_fingerprint",
    oracle=f"""
        WITH src AS (
            SELECT doc_id, text, length(text) - {_WINNOW_K} + 1 AS n_g
            FROM documents WHERE length(text) >= {_WINNOW_K}
        ),
        g AS (
            SELECT doc_id, n_g, unnest(range(1, n_g + 1)) AS i, text
            FROM src
        ),
        h AS (
            SELECT doc_id, n_g, i,
                   substr(md5(substr(text, CAST(i AS INT), {_WINNOW_K})), 1, 8) AS h
            FROM g
        ),
        wins AS (
            SELECT doc_id, n_g, i,
                   MIN(h) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING
                   ) AS wmin
            FROM h
        )
        SELECT doc_id,
               CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
               MIN(wmin) AS min_fp, MAX(wmin) AS max_fp
        FROM wins WHERE i <= n_g - {_WINNOW_W} + 1
        GROUP BY doc_id
    """,
    tags=("ext-text", "fingerprint"),
)
def t_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (the MOSS algorithm): md5-prefix
    hash of every 8-char k-gram, minimum per sliding window of 4 —
    per-doc distinct fingerprint count plus min/max fingerprint, so the
    oracle pins the actual selected-hash SET boundaries, not just sizes.

    Scale shape: position explode is per-doc char-linear (same cost
    class as the byte-histogram features), the window min partitions by
    doc_id (embarrassingly parallel), and the grouped distinct is the
    only shuffle.  100 TB variant: fingerprints feed the same
    inverted-index join the shingle dedup family uses."""
    from dataengineeringworkshop_spark.plans.tables import register_views

    register_views(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH src AS (
            SELECT doc_id, text, length(text) - {_WINNOW_K} + 1 AS n_g
            FROM dew_documents WHERE length(text) >= {_WINNOW_K}
        ),
        g AS (
            SELECT doc_id, n_g, i, text
            FROM src LATERAL VIEW explode(sequence(1, n_g)) AS i
        ),
        h AS (
            SELECT doc_id, n_g, i,
                   substr(md5(substr(text, i, {_WINNOW_K})), 1, 8) AS h
            FROM g
        ),
        wins AS (
            SELECT doc_id, n_g, i,
                   MIN(h) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND {_WINNOW_W - 1} FOLLOWING
                   ) AS wmin
            FROM h
        )
        SELECT doc_id,
               CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
               MIN(wmin) AS min_fp, MAX(wmin) AS max_fp
        FROM wins WHERE i <= n_g - {_WINNOW_W} + 1
        GROUP BY doc_id
        """
    )


@query(
    "d_containment_pairs",
    # containment (inter / min size) catches SUBSET duplicates that
    # Jaccard misses: a doc pasted inside a larger one scores ~1.0 here
    # but low Jaccard.  Same df-capped inverted index as the Jaccard
    # query; the division is an exact int/int double ratio.
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        sh AS (
            SELECT DISTINCT doc_id, shingle FROM (
                SELECT doc_id, unnest(CASE WHEN len(w) < 3 THEN []
                                           ELSE [array_to_string(list_slice(w, i, i + 2), ' ')
                                                 FOR i IN range(1, len(w) - 1)] END) AS shingle
                FROM tok
            )
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
        rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {{maxdf}}),
        shf AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare ON sh.shingle = rare.shingle),
        pairs AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
            FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT d1, d2, inter,
               LEAST(s1.sz, s2.sz) AS min_sz,
               CAST(inter AS DOUBLE) / LEAST(s1.sz, s2.sz) AS containment
        FROM pairs
        JOIN sizes s1 ON pairs.d1 = s1.doc_id
        JOIN sizes s2 ON pairs.d2 = s2.doc_id
        WHERE inter * 2 >= LEAST(s1.sz, s2.sz)
        ORDER BY containment DESC, d1 ASC, d2 ASC
        LIMIT 200
    """.format(maxdf=_JACCARD_MAXDF),
    tags=("ext-dedup",),
)
def d_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-containment near-dup pairs: |A∩B| / min(|A|,|B|) >= 0.5
    — the measure that catches a document EMBEDDED in a larger one
    (quote-expansion, boilerplate wrapping), where symmetric Jaccard
    stays low.  Reuses the standing df-capped 3-gram inverted index
    (one materialized artifact shared across the dedup family), so the
    pair space stays bounded by key selectivity, never n²; the integer
    pre-filter (inter*2 >= min_sz) keeps the division off the hot path."""

    sh, shf = _shingle_artifacts(spark, sf_dir)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("sz"))
    pairs = (
        shf.alias("a")
        .join(
            shf.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(F.count("*").alias("inter"))
    )
    scored = (
        pairs.join(sizes.select(F.col("doc").alias("d1"), F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col("doc").alias("d2"), F.col("sz").alias("sz2")), "d2")
        .withColumn("min_sz", F.least("sz1", "sz2"))
        .filter(F.col("inter") * 2 >= F.col("min_sz"))
        .withColumn(
            "containment", F.col("inter").cast("double") / F.col("min_sz")
        )
        .select("d1", "d2", "inter", "min_sz", "containment")
    )
    return scored.orderBy(
        F.col("containment").desc(), F.col("d1").asc(), F.col("d2").asc()
    ).limit(200)


_BPE_MERGE_MEMO: dict[tuple, list[tuple[str, str]]] = {}


def _corpus_key(sf_dir: str) -> tuple:
    """Memo key = (path, filesystem fingerprint of documents.parquet):
    name/size/mtime of the file (or of every top-level entry when it is
    a directory).  A regenerated corpus under a REUSED path therefore
    misses the memo instead of silently serving merges learned from
    data that no longer exists."""
    import os

    p = os.path.join(sf_dir, "documents.parquet")
    try:
        if os.path.isdir(p):
            parts = tuple(
                (e.name, e.stat().st_size, e.stat().st_mtime_ns)
                for e in sorted(os.scandir(p), key=lambda e: e.name)
            )
        else:
            st = os.stat(p)
            parts = ((os.path.basename(p), st.st_size, st.st_mtime_ns),)
    except OSError:
        parts = ()
    return (sf_dir, parts)


def _bpe_merge_list(spark: SparkSession, sf_dir: str) -> list[tuple[str, str]]:
    """Learn the standard 8-merge table over documents (bounded collect:
    8 rows of scalars — the merge table IS the model artifact).
    Memoized per corpus FINGERPRINT (path + file stats, see
    ``_corpus_key``): the merges are a deterministic function of the
    corpus, and the driver runs several BPE-family queries against the
    same directory in one process — train once, apply everywhere (which
    is also how a real pipeline ships a tokenizer)."""
    key = _corpus_key(sf_dir)
    got = _BPE_MERGE_MEMO.get(key)
    if got is not None:
        return got
    from dataengineeringworkshop_spark.llmops.bpe import learn_bpe_merges
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    merges = [
        (r.left, r.right)
        for r in learn_bpe_merges(d, "text", n_merges=8)
        .orderBy("merge_rank")
        .collect()
    ]
    _BPE_MERGE_MEMO[key] = merges
    return merges


def _bpe_token_ids_oracle() -> str:
    from dataengineeringworkshop_spark.llmops.bpe import (
        bpe_cte_prologue,
        bpe_doc_apply_cte,
    )

    return (
        bpe_cte_prologue(8, "documents")
        + bpe_doc_apply_cte(8, "documents")
        + """
        , syms AS (
            SELECT doc_id, word_idx, toks,
                   unnest(range(1, len(toks) + 1)) AS sym_idx
            FROM (SELECT doc_id, word_idx,
                         string_split(substr(s, 2, length(s) - 2), '><') AS toks
                  FROM enc9
                  WHERE doc_id % 50 = 0)
        )
        SELECT y.doc_id,
               CAST(y.word_idx - 1 AS INT) AS word_idx,
               CAST(y.sym_idx - 1 AS INT) AS sym_idx,
               CAST(COALESCE(v.tid, ord(y.sym)) AS INT) AS token_id
        FROM (SELECT doc_id, word_idx, sym_idx,
                     toks[CAST(sym_idx AS INT)] AS sym FROM syms) y
        LEFT JOIN vocab v ON y.sym = v.sym
        """
    )


@query(
    "t_bpe_token_ids",
    oracle=_bpe_token_ids_oracle(),
    tags=("ext-text", "bpe"),
)
def t_bpe_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL token-id emission from the learned BPE tokenizer: every
    50th document tokenized to integer ids under the merge-rank
    vocabulary (single chars → code point, merge rank r → 255 + r,
    earlier rank wins on collisions).  The oracle replays learning AND
    application as one unrolled CTE chain and re-derives every id — so
    the driver hash pins the exact token stream, position by position.
    Apply side stays a pure map (plan-shape-pinned for the shared
    apply path in tests/test_plan_quality.py)."""
    from dataengineeringworkshop_spark.llmops.bpe import bpe_token_ids
    from dataengineeringworkshop_spark.plans.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 50 == 0)
    toks = bpe_token_ids(
        d.select("doc_id", "text"), _bpe_merge_list(spark, sf_dir)
    )
    return toks.select(
        "doc_id",
        F.col("__word_idx").cast("int").alias("word_idx"),
        F.posexplode("token_ids").alias("sym_idx", "token_id"),
    ).select(
        "doc_id", "word_idx", F.col("sym_idx").cast("int").alias("sym_idx"),
        F.col("token_id").cast("int").alias("token_id"),
    )


def _bpe_pack_oracle() -> str:
    from dataengineeringworkshop_spark.llmops.bpe import (
        bpe_cte_prologue,
        bpe_doc_apply_cte,
    )

    return (
        bpe_cte_prologue(8, "documents")
        + bpe_doc_apply_cte(8, "documents")
        + """
        , per_doc AS (
            SELECT doc_id, source,
                   CAST(SUM(len(string_split(substr(s, 2, length(s) - 2), '><')))
                        AS BIGINT) AS n_tokens
            FROM enc9 GROUP BY doc_id, source
        ),
        packed AS (
            SELECT source, doc_id, n_tokens,
                   {PACK_ID}
            FROM per_doc
        )
        SELECT source, pack_id,
               COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM packed GROUP BY source, pack_id
        """.format(PACK_ID=pack_id_sql())
    )


@query(
    "t_bpe_tokenize_pack",
    oracle=_bpe_pack_oracle(),
    bench=True,
    tags=("ext-text", "bpe", "ext-corpus"),
)
def t_bpe_tokenize_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tokenize → pack chain of a real training-shard build:
    documents are tokenized with the LEARNED BPE merges (not the
    whitespace proxy), per-doc true token counts feed the same
    4096-token sequence-packing window cp_sequence_packing uses, and
    the oracle replays the whole chain (learning included) in one
    unrolled CTE.  Scale shape: learning scans the corpus once
    (cached vocab table); apply is a map; per-doc counts one shuffle;
    packing one window partitioned by source."""
    from dataengineeringworkshop_spark.llmops.bpe import apply_bpe
    from dataengineeringworkshop_spark.plans.tables import load_table

    from dataengineeringworkshop_spark.operators.fanout import fan_out

    d = load_table(spark, sf_dir, "documents")
    # the tokenize map (regexp char-wrap + 8 chained replaces per word)
    # is the query's CPU; behind the one-row-group testdata scan it ran
    # as ONE 56 s task (round-13 profile) — gated fan-out restores the
    # map parallelism and is a no-op on a wide production scan
    tok = apply_bpe(
        fan_out(d.select("doc_id", "source", "text")), _bpe_merge_list(spark, sf_dir)
    )
    per_doc = tok.groupBy("source", "doc_id").agg(
        F.sum(F.size("bpe_tokens")).cast("long").alias("n_tokens")
    )
    return per_doc.selectExpr(
        "source",
        "doc_id",
        "n_tokens",
        pack_id_sql(),
    ).groupBy("source", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


@query(
    "t_url_parse",
    # the oracle re-parses the SAME synthesized URL with regexes —
    # an independent formulation of parse_url's component grammar
    oracle="""
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
            FROM documents
        )
        SELECT doc_id, url,
               regexp_extract(url, '^([a-z]+)://', 1) AS proto,
               regexp_extract(url, '^[a-z]+://([^/?]+)', 1) AS host,
               regexp_extract(url, '^[a-z]+://[^/?]+(/[^?]*)', 1) AS path,
               regexp_extract(url, '[?](.*)$', 1) AS query
        FROM u
    """,
    tags=("ext-text", "F16"),
)
def t_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL component extraction with Spark's ``parse_url`` — the
    domain/path/query split every web-corpus pipeline runs for source
    attribution and domain-level mixing (cp_source_mix consumes the
    host).  URLs are synthesized deterministically from (source,
    doc_id, lang) so both engines see identical inputs; Spark parses
    with the real java.net grammar, the oracle with regexes — two
    independent parsers agreeing on every component.  Pure map, no
    shuffle."""
    return _sql(
        spark, sf_dir, ("documents",),
        """
        WITH u AS (
            SELECT doc_id,
                   'https://' || source || '.example.com/docs/'
                       || CAST(doc_id AS STRING) || '?lang=' || lang AS url
            FROM dew_documents
        )
        SELECT doc_id, url,
               parse_url(url, 'PROTOCOL') AS proto,
               parse_url(url, 'HOST') AS host,
               parse_url(url, 'PATH') AS path,
               parse_url(url, 'QUERY') AS query
        FROM u
        """
    )


@query(
    "t_collocation_dice",
    # Dice = 2·c12 / (c1 + c2): integer counts, ONE division to double —
    # bit-identical across engines (the t_tfidf_topk rational-score rule)
    # and overflow-free at any corpus size (no integer products).
    oracle="""
        WITH ex AS (
            SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS i,
                   unnest(string_split(text, ' ')) AS wd
            FROM documents
        ),
        uni AS (SELECT wd, COUNT(*) AS c FROM ex GROUP BY wd),
        big AS (
            SELECT a.wd AS w1, b.wd AS w2, COUNT(*) AS c12
            FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1
            GROUP BY a.wd, b.wd
        ),
        scored AS (
            SELECT big.w1, big.w2, big.c12, u1.c AS c1, u2.c AS c2,
                   CAST(2 * big.c12 AS DOUBLE) / (u1.c + u2.c) AS dice
            FROM big JOIN uni u1 ON big.w1 = u1.wd
                     JOIN uni u2 ON big.w2 = u2.wd
            WHERE big.c12 >= 10
        )
        SELECT w1, w2, c12, c1, c2, dice
        FROM scored
        ORDER BY dice DESC, w1 ASC, w2 ASC
        LIMIT 50
    """,
    tags=("ext-text", "ext-corpus"),
)
def t_collocation_dice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide collocation mining: top-50 adjacent word pairs by the
    Dice association score 2·c(w1w2)/(c(w1)+c(w2)) with a count floor —
    the multi-word-expression detector ("new york"-style units) every
    tokenizer-curation pipeline runs before vocabulary decisions.  Dice
    is chosen over PMI deliberately: it needs no logarithm (the
    determinism contract bans transcendentals) and no integer products
    that could overflow at corpus scale — two integer counts, one
    division.  Scale shape: bigrams come from a lag window over the
    positional explode — never a positional self-join of the token
    stream — and every aggregate partial-reduces to dictionary size
    before its shuffle; the unigram table joins back per word (AQE
    broadcasts it) and the global top-50 compiles to
    TakeOrderedAndProject.  The CTE re-executes per reference (pruned
    columnar re-scans); at corpus scale the token table would be
    materialized once, the minhash signature-table pattern.  (dice, w1,
    w2) is a unique sort key, so the cut is engine-independent."""
    return _sql(
        spark, sf_dir, ("documents",),
        """
        WITH ex AS (
            SELECT doc_id, pos, wd
            FROM dew_documents
            LATERAL VIEW posexplode(split(text, ' ')) AS pos, wd
        ),
        uni AS (SELECT wd, COUNT(*) AS c FROM ex GROUP BY wd),
        big AS (
            SELECT w1, w2, COUNT(*) AS c12
            FROM (
                SELECT lag(wd) OVER (PARTITION BY doc_id ORDER BY pos) AS w1,
                       wd AS w2
                FROM ex
            ) WHERE w1 IS NOT NULL
            GROUP BY w1, w2
        ),
        scored AS (
            SELECT big.w1, big.w2, big.c12, u1.c AS c1, u2.c AS c2,
                   CAST(2 * big.c12 AS DOUBLE) / (u1.c + u2.c) AS dice
            FROM big JOIN uni u1 ON big.w1 = u1.wd
                     JOIN uni u2 ON big.w2 = u2.wd
            WHERE big.c12 >= 10
        )
        SELECT w1, w2, c12, c1, c2, dice
        FROM scored
        ORDER BY dice DESC, w1 ASC, w2 ASC
        LIMIT 50
        """
    )


_RAKE_STOPS = "('the', 'a', 'is', 'of', 'and')"

# Shared RAKE skeleton (dialect bits injected): stopword-delimited runs
# become candidate phrases via ONE cumsum window (phrase_id = running
# stopword count), word scores are the classic degree/frequency ratio
# (ONE division, ROUND 6), and phrase scores fold the rounded word
# scores through DECIMAL so accumulation order can't perturb the hash.
#: tok → stopword-run segmentation → (doc, phrase, pos, wd) candidate
#: words.  On the Spark side this is built ONCE and materialized (the
#: ``pw`` table feeds FOUR downstream consumers — plen, wstat, pscore,
#: ptext — and Spark inlines CTEs, so the single-statement form
#: re-exploded the corpus four times; round-9 scan audit); the DuckDB
#: oracle keeps the single combined statement.
_RAKE_PW_BODY = """
WITH tok AS (
    {tok_cte}
),
seg AS (
    SELECT doc_id, pos, wd,
           CASE WHEN wd IN {stops} THEN 1 ELSE 0 END AS is_stop,
           SUM(CASE WHEN wd IN {stops} THEN 1 ELSE 0 END) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS phrase_id
    FROM tok
)
SELECT doc_id, phrase_id, pos, wd FROM seg WHERE is_stop = 0
"""

_RAKE_SCORE_BODY = """
WITH plen AS (
    SELECT doc_id, phrase_id, COUNT(*) AS phrase_len
    FROM {pw} GROUP BY doc_id, phrase_id
),
wstat AS (
    SELECT pw.wd, COUNT(*) AS freq, CAST(SUM(plen.phrase_len) AS BIGINT) AS deg
    FROM {pw} pw JOIN plen ON pw.doc_id = plen.doc_id
                     AND pw.phrase_id = plen.phrase_id
    GROUP BY pw.wd
),
wscore AS (
    SELECT wd, freq, deg, ROUND(CAST(deg AS DOUBLE) / freq, 6) AS wscore
    FROM wstat
),
pscore AS (
    SELECT pw.doc_id, pw.phrase_id,
           CAST(SUM(CAST(ws.wscore AS DECIMAL(18,6))) AS DOUBLE) AS score
    FROM {pw} pw JOIN wscore ws ON pw.wd = ws.wd
    GROUP BY pw.doc_id, pw.phrase_id
),
ptext AS (
    SELECT doc_id, phrase_id, {phrase_agg} AS phrase
    FROM {pw} GROUP BY doc_id, phrase_id
),
agg AS (
    SELECT p.doc_id, t.phrase, MAX(p.score) AS score, COUNT(*) AS n_occur
    FROM pscore p JOIN ptext t ON p.doc_id = t.doc_id
                              AND p.phrase_id = t.phrase_id
    GROUP BY p.doc_id, t.phrase
)
SELECT doc_id, phrase, n_occur, score
FROM (
    SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, phrase ASC
           ) AS rn
    FROM agg
) r WHERE rn <= 5
"""


def _rake_combined_oracle(tok_cte: str, phrase_agg: str) -> str:
    """Single-statement PW+SCORE twin for the DuckDB oracle (DuckDB
    evaluates each CTE once, so the combined form is fine there).

    Both rewrites below are exact-substring surgery on the shared
    template bodies; a silent no-op (e.g. after a whitespace reformat
    of the template) would produce malformed SQL that only fails at
    sweep time, so each replacement is ASSERTED to have landed — the
    failure then happens loudly at import time (ADVICE r9)."""
    pw_src = _RAKE_PW_BODY.format(tok_cte=tok_cte, stops=_RAKE_STOPS)
    pw_tail = ")\nSELECT doc_id, phrase_id, pos, wd FROM seg WHERE is_stop = 0"
    assert pw_tail in pw_src, "_RAKE_PW_BODY tail drifted; fix the rewrite"
    pw_part = pw_src.replace(
        pw_tail,
        "),\npw AS (\n    SELECT doc_id, phrase_id, pos, wd "
        "FROM seg WHERE is_stop = 0\n)",
    )
    assert "pw AS (" in pw_part
    assert _RAKE_SCORE_BODY.startswith(
        "\nWITH plen AS ("
    ) or _RAKE_SCORE_BODY.startswith(
        "WITH plen AS ("
    ), "_RAKE_SCORE_BODY head drifted; fix the rewrite"
    score_part = _RAKE_SCORE_BODY.replace("WITH plen AS (", ", plen AS (", 1)
    assert ", plen AS (" in score_part
    return pw_part + score_part.format(pw="pw", phrase_agg=phrase_agg)


@query(
    "t_rake_keywords",
    oracle=_rake_combined_oracle(
        tok_cte="""SELECT doc_id,
                   generate_subscripts(string_split(text, ' '), 1) AS pos,
                   unnest(string_split(text, ' ')) AS wd
            FROM documents""",
        phrase_agg="string_agg(wd, ' ' ORDER BY pos)",
    ),
    tags=("ext-text", "ext-corpus"),
)
def t_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs, each word scores degree/frequency
    (degree = total length of the phrases it appears in), and a phrase
    scores the sum of its words — top-5 phrases per document.  The
    multi-word upgrade over t_tfidf_topk's unigram keywords, and the
    third member of the keyword family (tf-idf = rarity, Dice = pair
    association, RAKE = phrase centrality).

    Scale shape: run-length segmentation is ONE cumsum window per doc
    (phrase_id = running stopword count — the sessionize idiom applied
    to token streams); every downstream aggregate is grouped on
    (doc, phrase) or the dictionary-sized word table (AQE broadcasts
    it); the per-doc top-5 is a window over already-reduced phrase
    rows.  Determinism: word score = ONE integer division ROUND(6);
    phrase score folds through DECIMAL(18,6); (score DESC, phrase ASC)
    is unique per doc, so the cut is engine-independent; Spark pins
    in-phrase word order by sorting (pos, wd) structs — DuckDB's
    ORDER BY inside string_agg is the same contract.

    The (doc, phrase, pos, wd) candidate-word table feeds FOUR
    downstream consumers and Spark inlines CTEs — the single-statement
    form re-exploded the corpus four times (round-9 scan audit) — so it
    is built once and ``materialize()``d, the persisted phrase index of
    a keyword pipeline."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    register_views(spark, sf_dir, "documents")
    pw = materialize(
        spark.sql(
            _RAKE_PW_BODY.format(
                tok_cte="""SELECT doc_id, pos, wd
            FROM dew_documents
            LATERAL VIEW posexplode(split(text, ' ')) AS pos, wd""",
                stops=_RAKE_STOPS,
            )
        ),
        label="rake_pw",
        cache_key=f"rake_pw:{sf_dir}",
    )
    pw.createOrReplaceTempView("dew_rake_pw")
    return spark.sql(
        _RAKE_SCORE_BODY.format(
            pw="dew_rake_pw",
            phrase_agg=(
                "array_join(transform(array_sort("
                "collect_list(struct(pos, wd))), s -> s.wd), ' ')"
            ),
        )
    )
