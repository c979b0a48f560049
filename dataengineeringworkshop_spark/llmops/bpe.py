"""BPE merge learning — the tokenizer-training primitive of an LLM data
pipeline, done relationally.

Classic byte-pair encoding (Sennrich et al. 2016): start from the
per-word character sequences weighted by word frequency, repeatedly
(1) count adjacent symbol pairs corpus-wide, (2) merge the most frequent
pair everywhere.  Each round here is ONE partial-aggregated groupBy over
the (distinct-word, weight) vocabulary table; the only driver-side state
is the per-round argmax row — O(n_merges) scalars, never corpus data —
so the loop structure survives 100 TB unchanged (the vocabulary table is
distinct words, orders of magnitude smaller than the corpus, and pair
counting is map-side-combined).

Symbol sequences are carried as marker-delimited strings
(``<h><e><l><l><o>``) so a merge is a plain left-to-right
``replace('<l><r>', '<lr>')`` — exactly the non-overlapping greedy
semantics reference BPE uses, and bit-identical between Spark and a SQL
oracle (no regex, no lookarounds).  Valid while symbols can't contain
``<``/``>`` (the testdata corpus is lowercase alphanumeric; callers with
arbitrary bytes should remap first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGES_SCHEMA = "merge_rank int, left string, right string, pair_count long"


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    from dataengineeringworkshop_spark.operators.fanout import fan_out

    # project to the text column, then restore map parallelism: the
    # corpus ships as a one-row-group file, so without the (gated,
    # scale-adaptive) repartition the whole explode + partial-agg map
    # side runs on a single core (guide §2.5 input skew; measured 43 s
    # single-task at sf0.1 in the round-13 profile)
    return (
        fan_out(docs.select(F.col(text_col).alias("__t")))
        .select(F.explode(F.split(F.lower(F.col("__t")), " ")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("weight"))
    )


def _adjacent_pairs(seqs: DataFrame) -> DataFrame:
    """(l, r, cnt) — corpus-wide weighted adjacent-pair counts from the
    marker-string sequences.  One explode + one partial-agg groupBy."""
    return (
        seqs.select(
            F.expr("split(substr(s, 2, length(s) - 2), '><')").alias("toks"),
            "weight",
        )
        .select(
            F.explode(
                # CASE guard: Spark's sequence(1, 0) counts DOWN, so a
                # fully-merged 1-symbol word would index out of bounds
                F.expr(
                    "CASE WHEN size(toks) < 2 THEN array() "
                    "ELSE transform(sequence(1, size(toks) - 1), i -> "
                    "struct(element_at(toks, i) AS l, element_at(toks, i + 1) AS r)) END"
                )
            ).alias("p"),
            "weight",
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("weight").alias("cnt"))
    )


def _learn_local(
    seqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge loop over a COLLECTED (marker-string, weight)
    word-frequency table — semantically identical to the distributed
    rounds: overlapping pair counts weighted by word frequency, argmax
    tiebreak (count DESC, left ASC, right ASC), non-overlapping greedy
    left-to-right replace.  Python string comparison is code-point
    order == UTF-8 binary order, matching Spark's string sort."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for s, w in seqs:
            toks = s[1:-1].split("><")
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                counts[k] = counts.get(k, 0) + w
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, l, r, cnt))
        pat, rep = f"<{l}><{r}>", f"<{l}{r}>"
        seqs = [(s.replace(pat, rep), w) for s, w in seqs]
    return merges


# Above this many distinct words the word-frequency table stays on the
# executors and learning runs as distributed rounds; below it, the table
# is collected and the merge loop runs driver-side (the architecture HF
# tokenizers / SentencePiece use: the corpus scan is the distributed
# part, the merge loop runs over the bounded word-count model input).
LOCAL_VOCAB_CAP = 1_000_000

#: byte budget for the driver-side merge loop: the collected rows'
#: marker-wrapped string payload (sum of length(s)) must fit this
#: alongside the row-count cap.  256 MB of payload inflates to ~1-1.5 GB
#: of Python string objects — safe on an 8g driver, and a corpus of
#: few-but-huge distinct words (the case a pure row-count gate misses)
#: now falls through to the distributed loop.
LOCAL_VOCAB_BYTES = 256 * 1024 * 1024


def _fits_local(
    seqs0: DataFrame, vocab_cap: int, byte_budget: int
) -> bool:
    """ONE bounded job decides the merge-loop path: count and payload
    bytes over at most ``vocab_cap + 1`` rows (never the full table,
    never a collect).  Local only when BOTH the row count and the
    estimated collected bytes fit."""
    probe = (
        seqs0.limit(vocab_cap + 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.length("s")), F.lit(0)).alias("payload"),
        )
        .collect()[0]
    )
    return int(probe.n) <= vocab_cap and int(probe.payload) <= byte_budget


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    local_vocab_cap: int = LOCAL_VOCAB_CAP,
    local_vocab_bytes: int = LOCAL_VOCAB_BYTES,
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the corpus.

    Returns (merge_rank, left, right, pair_count) — the merge table a
    tokenizer ships.  Deterministic: argmax tiebreak is (count DESC,
    left ASC, right ASC) over binary string order.

    Scale shape: ONE distributed corpus scan builds the distinct-word
    frequency table (the only corpus-sized work — at 100 TB this is the
    part that must be a map-side-combined groupBy, and it is).  The
    merge loop itself only ever touches that table: when it fits under
    ``local_vocab_cap`` rows AND ``local_vocab_bytes`` of string
    payload (one bounded probe job checks both) it is collected and the loop runs
    driver-side (zero extra jobs — word counts ARE the model input, as
    in HF tokenizers / SentencePiece); above the cap the loop runs as
    per-round distributed pair-count jobs over the cached table, never
    re-reading the corpus.  Both paths produce identical merges (pinned
    by tests/test_llmops.py::test_local_and_distributed_learning_agree).
    """
    spark = docs.sparkSession
    seqs0 = _word_vocab(docs, text_col).select(
        F.regexp_replace("w", "(.)", "<$1>").alias("s"), "weight"
    ).persist()
    merges: list[tuple[int, str, str, int]] = []
    try:
        # cheap bounded probe decides the path first — collecting the
        # rows only to discover the vocab is over budget would pull up
        # to cap+1 marker strings onto the driver for nothing.  The
        # gate is row count AND payload bytes: a corpus of few-but-huge
        # distinct words must fall through to the distributed loop too.
        if _fits_local(seqs0, local_vocab_cap, local_vocab_bytes):
            head = seqs0.collect()
            merges = _learn_local(
                [(r.s, int(r.weight)) for r in head], n_merges
            )
        else:
            seqs = seqs0
            for rank in range(1, n_merges + 1):
                best = (
                    _adjacent_pairs(seqs)
                    .orderBy(
                        F.col("cnt").desc(), F.col("l").asc(), F.col("r").asc()
                    )
                    .limit(1)
                    .collect()
                )
                if not best or best[0].cnt is None:
                    break
                l, r, cnt = best[0].l, best[0].r, int(best[0].cnt)
                merges.append((rank, l, r, cnt))
                seqs = seqs.select(
                    F.replace(
                        F.col("s"), F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>")
                    ).alias("s"),
                    "weight",
                )
    finally:
        seqs0.unpersist()
    # local relation via the Arrow path (pandas input), NOT a pickled-row
    # parallelize: createDataFrame(list-of-tuples) plans as a Python-RDD
    # scan whose every task needs a plain (non-Arrow) Python worker —
    # the round-13 profile measured the first such job in a session at
    # 18-60 s of pure worker-spawn wait for these 8 rows (guide §4: keep
    # the Python boundary out of plans that don't need it).  The Arrow
    # conversion happens driver-side; executors see only JVM rows.
    import pandas as pd

    pdf = pd.DataFrame(
        merges, columns=["merge_rank", "left", "right", "pair_count"]
    )
    return spark.createDataFrame(pdf, MERGES_SCHEMA)


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, wrap
    characters in markers and apply every merge in rank order (the
    standard greedy apply), then emit the word's symbol array.  Pure
    map — chained JVM ``replace`` calls, no shuffle, no Python."""
    expr = F.regexp_replace(F.col("__w"), "(.)", "<$1>")
    for l, r in merges:
        expr = F.replace(expr, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    # strip the outer markers, split on the inter-symbol boundary
    seq = F.expr("substr(__seq, 2, length(__seq) - 2)")
    return (
        df.select(
            "*",
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("__w"),
        )
        .filter(F.length("__w") > 0)
        .withColumn("__seq", expr)
        .withColumn(out_col, F.split(seq, "><"))
        .drop("__w", "__seq")
    )


def token_id_map(merges: list[tuple[str, str]]) -> dict[str, int]:
    """The merge-rank vocabulary: single-char symbols take their code
    point as id (byte-fallback, like every BPE tokenizer's base vocab);
    the symbol produced by merge rank r takes id 255 + r.  If two merges
    produce the same concatenated string (e.g. (a,bc) and (ab,c) both
    yield 'abc'), the EARLIER rank wins — mirrored by MIN(merge_rank)
    in the SQL oracle's vocab CTE."""
    ids: dict[str, int] = {}
    for rank, (l, r) in enumerate(merges, start=1):
        ids.setdefault(l + r, 255 + rank)
    return ids


def bpe_token_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """apply_bpe + merge-rank vocabulary lookup → ``array<int>`` token
    ids per word (plus ``__word_idx`` for the in-document word order).
    Still a pure map: the vocabulary is a literal in-plan map (bounded
    by n_merges), symbol→id is a JVM map lookup with an ``ascii()``
    byte fallback for unmerged single chars — no shuffle, no Python."""
    vocab = token_id_map(merges)
    expr = F.regexp_replace(F.col("__w"), "(.)", "<$1>")
    for l, r in merges:
        expr = F.replace(expr, F.lit(f"<{l}><{r}>"), F.lit(f"<{l}{r}>"))
    seq = F.expr("substr(__seq, 2, length(__seq) - 2)")
    if vocab:
        pairs = [x for kv in vocab.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
        vmap = F.create_map(*pairs)
        lookup = "coalesce(element_at(__vmap, t), ascii(t))"
    else:
        lookup = "ascii(t)"
    out = (
        df.select(
            "*",
            F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
                "__wi", "__w"
            ),
        )
        .filter(F.length("__w") > 0)
        .withColumn("__seq", expr)
        .withColumn("__syms", F.split(seq, "><"))
    )
    if vocab:
        out = out.withColumn("__vmap", vmap)
    return (
        out.withColumn(out_col, F.expr(f"transform(__syms, t -> {lookup})"))
        .withColumn("__word_idx", F.col("__wi"))
        .drop("__wi", "__w", "__seq", "__syms", *(["__vmap"] if vocab else []))
    )


def bpe_cte_prologue(n_merges: int = 8, table: str = "documents") -> str:
    """The unrolled DuckDB CTE chain: words → seq1 → (pairs/best/seq)×n
    — ends having defined ``best1..best{n}`` and ``seq{n+1}`` (the
    post-merge vocabulary).  Shared by the merge-table oracle and the
    apply-side vocabulary-stats oracle."""
    parts = [
        f"""
        WITH words AS (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS weight
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM {table})
            WHERE length(w) > 0 GROUP BY w
        ),
        seq1 AS (SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS s, weight FROM words)"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
        toks{i} AS (
            SELECT string_split(substr(s, 2, length(s) - 2), '><') AS toks, weight
            FROM seq{i}
        ),
        pairs{i} AS (
            SELECT toks[i] AS l, toks[i + 1] AS r, CAST(SUM(weight) AS BIGINT) AS cnt
            FROM (SELECT toks, weight, unnest(range(1, len(toks))) AS i FROM toks{i})
            GROUP BY 1, 2
        ),
        best{i} AS (
            SELECT {i} AS merge_rank, l, r, cnt FROM pairs{i}
            ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
        ),
        seq{i + 1} AS (
            -- LEFT JOIN pass-through: if this round found no pair
            -- (vocabulary fully merged early), the cross join would
            -- annihilate every later seq; instead carry seq{i} forward
            SELECT COALESCE(replace(s, '<' || b.l || '><' || b.r || '>',
                                       '<' || b.l || b.r || '>'), s) AS s, weight
            FROM seq{i} LEFT JOIN best{i} b ON TRUE
        )"""
        )
    return "".join(parts)


def bpe_doc_apply_cte(n_merges: int = 8, table: str = "documents") -> str:
    """DuckDB CTE suffix (appended after :func:`bpe_cte_prologue`) that
    APPLIES the learned merges to every document's words: defines
    ``vocab`` (merged-symbol → token id, earlier rank wins) and
    ``enc{n+1}`` — (doc_id, source, word_idx, s) with the fully-merged
    marker string per word."""
    parts = [
        f""",
        doc_words AS (
            SELECT doc_id, source, ws, unnest(range(1, len(ws) + 1)) AS word_idx
            FROM (SELECT doc_id, source, string_split(lower(text), ' ') AS ws
                  FROM {table})
        ),
        dw AS (
            SELECT doc_id, source, word_idx, ws[CAST(word_idx AS INT)] AS w
            FROM doc_words WHERE length(ws[CAST(word_idx AS INT)]) > 0
        ),
        vocab AS (
            SELECT sym, 255 + MIN(merge_rank) AS tid FROM (
                {" UNION ALL ".join(f"SELECT merge_rank, l || r AS sym FROM best{i}" for i in range(1, n_merges + 1))}
            ) GROUP BY sym
        ),
        enc1 AS (
            SELECT doc_id, source, word_idx,
                   regexp_replace(w, '(.)', '<\\1>', 'g') AS s
            FROM dw
        )"""
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
        enc{i + 1} AS (
            SELECT doc_id, source, word_idx,
                   COALESCE(replace(s, '<' || b.l || '><' || b.r || '>',
                                       '<' || b.l || b.r || '>'), s) AS s
            FROM enc{i} LEFT JOIN best{i} b ON TRUE
        )"""
        )
    return "".join(parts)


def bpe_oracle_sql(n_merges: int = 8, table: str = "documents") -> str:
    """The DuckDB twin of :func:`learn_bpe_merges`, UNROLLED: one
    pairs/best/seq CTE triple per merge round, same marker-string
    replace, same tiebreak — an independent re-derivation the driver
    hash-compares against."""
    union = "\n        UNION ALL ".join(
        f'SELECT merge_rank, l AS "left", r AS "right", cnt AS pair_count FROM best{i}'
        for i in range(1, n_merges + 1)
    )
    return bpe_cte_prologue(n_merges, table) + "\n        " + union


def bpe_vocab_stats_oracle_sql(n_merges: int = 8, table: str = "documents") -> str:
    """Symbols-per-word distribution of the post-merge vocabulary
    (``seq{n+1}`` of the unrolled chain) — the oracle for the APPLY
    side of BPE."""
    return (
        bpe_cte_prologue(n_merges, table)
        + f"""
        SELECT n_symbols, CAST(COUNT(*) AS BIGINT) AS n_words,
               CAST(SUM(weight) AS BIGINT) AS total_weight
        FROM (SELECT len(string_split(substr(s, 2, length(s) - 2), '><')) AS n_symbols,
                     weight
              FROM seq{n_merges + 1})
        GROUP BY n_symbols
    """
    )
