"""Composite "breadth" queries — one driver-checked query per operator
FAMILY, each exercising several SURVEY.md §2 rows at once.

Why these exist: the external driver records correctness rows for a
bounded prefix of the registry.  The fine-grained per-row queries
(``p1_select_star`` … ``f18_struct_access``) remain registered — and
locally oracle-tested — but the evidence budget is spent on composites
that prove whole families per driver row.  COVERAGE.md maps each §2 row
to the composite that proves it.

Every query here follows the determinism contract (plans/registry.py):
DECIMAL-fold for float sums, unique-id tiebreakers under rank/limit,
identical column aliases on both sides, dialect-portable regexes only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import davg, dsum, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views

# ---- f21 shared XML sanitizer (single source of truth; the hostile
# probe in tests/test_xml_escape.py composes through these SAME
# constants, so a sanitizer change cannot silently diverge from the
# test).  The class strips every XML metacharacter PLUS the
# XML-1.0-illegal C0 control range (0x00-0x08, 0x0b, 0x0c, 0x0e-0x1f —
# everything below 0x20 except TAB/LF/CR, which are legal in content).
XML_SANITIZE_PATTERN = r"""[&<>"'\x00-\x08\x0b\x0c\x0e-\x1f]"""


def _lit_spark(s: str) -> str:
    """Spark SQL single-quoted literal (backslash escapes active)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _lit_duck(s: str) -> str:
    """DuckDB single-quoted literal (standard SQL: only '' is special)."""
    return "'" + s.replace("'", "''") + "'"


F21_SANITIZE_SPARK = (
    f"regexp_replace(event_type, {_lit_spark(XML_SANITIZE_PATTERN)}, '_')"
)
F21_SANITIZE_DUCK = (
    f"regexp_replace(event_type, {_lit_duck(XML_SANITIZE_PATTERN)}, '_', 'g')"
)
F21_COMPOSE_SPARK = (
    "concat('<e><k>', CAST(event_id % 100 AS STRING), '</k><t>', "
    + F21_SANITIZE_SPARK
    + ", '</t><u uid=\"', CAST(user_id % 10 AS STRING), '\"/></e>')"
)


@query(
    "rb_projection_breadth",
    oracle="""
        SELECT c.*, c_name AS customer_name, 'crm' AS source_system, 1 AS schema_version
        FROM (SELECT * FROM customer) c
    """,
    tags=("P1", "P2", "P3", "P4"),
)
def rb_projection_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection family in one pass (N4:37-68): SELECT * (P1), column
    alias (P2), mixed ``col, *`` projection (P3), literal columns (P4)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("*").select(
        "*",
        F.col("c_name").alias("customer_name"),
        F.lit("crm").alias("source_system"),
        F.lit(1).alias("schema_version"),
    )


@query(
    "rb_predicate_breadth",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
               CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 'expedite' ELSE 'standard' END AS priority_class,
               (o_custkey IS NULL) AS custkey_missing
        FROM orders
        WHERE o_orderstatus = 'O'
          AND o_totalprice > 1000
          AND o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
          AND o_orderdate IS NOT NULL
          AND NOT (o_orderstatus <> 'O' AND o_totalprice < 0)
    """,
    tags=("P5", "P6", "P7", "P8", "P10", "P11", "P12"),
)
def rb_predicate_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate family in one WHERE clause (N4:70-101): equality (P5),
    conjunction (P6), IN-list (P7), IS [NOT] NULL (P8), CASE WHEN … IN
    projection (P10), NOT/AND boolean expression (P11), ``<>`` (P12).
    All predicates push to the parquet scan (plan-asserted)."""
    o = load_table(spark, sf_dir, "orders")
    keep = (
        (F.col("o_orderstatus") == "O")
        & (F.col("o_totalprice") > 1000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        & F.col("o_orderdate").isNotNull()
        & ~((F.col("o_orderstatus") != "O") & (F.col("o_totalprice") < 0))
    )
    return o.filter(keep).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
        .otherwise("standard")
        .alias("priority_class"),
        F.col("o_custkey").isNull().alias("custkey_missing"),
    )


@query(
    "rb_join_agg_breadth",
    oracle=f"""
        SELECT r_name, n_name,
               COUNT(*) AS n_orders,
               COUNT(o_orderpriority) AS n_with_priority,
               {dsum("o_totalprice", "sum_totalprice")},
               COUNT(DISTINCT o_custkey) AS n_buyers
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN orders ON o_custkey = c_custkey
        WHERE r_name IS NOT NULL
        GROUP BY r_name, n_name
    """,
    tags=("J1", "J2", "J3", "A1", "A2", "A3", "A4", "A6"),
)
def rb_join_agg_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + aggregate families together (N2:570-599): 2-way equi join
    (J1, customer⋈nation) extended 3-way (J2, ⋈region) plus a fact join
    with null filter (J3), aggregated with count(col) (A1), count(*)
    (A2), exact-decimal SUM (A3), count(distinct) (A4), multi-column
    GROUP BY (A6).  Dimension sides broadcast; one shuffle total."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .join(o, F.col("c_custkey") == o.o_custkey)
        .filter(F.col("r_name").isNotNull())
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.expr(
                "CAST(SUM(CAST((o_totalprice) AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("sum_totalprice"),
            F.countDistinct("o_custkey").alias("n_buyers"),
        )
    )


@query(
    "rb_window_order_breadth",
    oracle="""
        WITH ranked AS (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY c_mktsegment
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS price_rank
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment, o_orderkey, o_totalprice, price_rank
        FROM ranked WHERE price_rank <= 3
        ORDER BY upper(c_mktsegment) ASC, o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    tags=("W2", "O1", "O2", "O3", "O4"),
)
def rb_window_order_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank + ordering family (N2:594-599): rank() top-k per group
    (W2/O4), global ORDER BY on an expression (O1) over multiple columns
    (O2), LIMIT (O3).  Fully deterministic: rank and sort both tie-break
    on the unique o_orderkey; the final sort is TakeOrdered (limit-
    pushdown), not a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("price_rank", F.rank().over(w))
        .filter(F.col("price_rank") <= 3)
        .orderBy(
            F.upper(F.col("c_mktsegment")).asc(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(10)
    )


@query(
    "rb_cte_subquery_breadth",
    oracle=f"""
        WITH seg_stats AS (
            SELECT c_mktsegment, {davg("c_acctbal", "avg_bal")}
            FROM customer GROUP BY c_mktsegment
        ),
        rich AS (
            SELECT c.c_custkey, c.c_mktsegment
            FROM customer c JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
            WHERE c.c_acctbal > s.avg_bal
        )
        SELECT c_mktsegment, COUNT(*) AS n_above_avg,
               (SELECT COUNT(*) FROM customer) AS n_total
        FROM rich GROUP BY c_mktsegment
    """,
    tags=("C1", "C2"),
)
def rb_cte_subquery_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CTE family (N4:127-160): multi-CTE chain where the second CTE
    consumes the first (C1), plus an uncorrelated scalar subquery in the
    final projection (C2).  The per-segment average uses the exact
    DECIMAL fold so the > comparison is bit-identical cross-engine."""
    register_views(spark, sf_dir, "customer")
    return spark.sql(
        f"""
        WITH seg_stats AS (
            SELECT c_mktsegment, {davg("c_acctbal", "avg_bal")}
            FROM dew_customer GROUP BY c_mktsegment
        ),
        rich AS (
            SELECT c.c_custkey, c.c_mktsegment
            FROM dew_customer c JOIN seg_stats s ON c.c_mktsegment = s.c_mktsegment
            WHERE c.c_acctbal > s.avg_bal
        )
        SELECT c_mktsegment, COUNT(*) AS n_above_avg,
               (SELECT COUNT(*) FROM dew_customer) AS n_total
        FROM rich GROUP BY c_mktsegment
        """
    )


@query(
    "rb_string_funcs_breadth",
    oracle="""
        SELECT p_partkey,
               COALESCE(NULLIF(p_brand, ''), 'unknown') AS brand_clean,
               CAST(p_partkey AS VARCHAR) || '-' || p_type AS part_code,
               sha256(concat_ws('||', CAST(p_partkey AS VARCHAR), p_name, p_brand)) AS row_hash,
               LENGTH(p_name) AS name_len,
               len(string_split(p_name, ' ')) AS n_name_words
        FROM part
    """,
    tags=("F1", "F8", "F9", "F10", "F11", "F12", "F13"),
)
def rb_string_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family in one projection (N2:331-411): coalesce/
    nullif (F1), ``||`` concat (F8), cast-to-string (F9), concat_ws
    row-hash input (F10), sha2-256 (F11), length (F12), size(split)
    (F13).  Pure map — no shuffle, whole-stage codegen end to end."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("")), F.lit("unknown")).alias(
            "brand_clean"
        ),
        F.concat(
            F.col("p_partkey").cast("string"), F.lit("-"), F.col("p_type")
        ).alias("part_code"),
        F.sha2(
            F.concat_ws(
                "||", F.col("p_partkey").cast("string"), F.col("p_name"), F.col("p_brand")
            ),
            256,
        ).alias("row_hash"),
        F.length("p_name").cast("long").alias("name_len"),
        F.size(F.split(F.col("p_name"), " ")).cast("long").alias("n_name_words"),
    )


@query(
    "rb_time_funcs_breadth",
    oracle="""
        SELECT event_id,
               strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str,
               strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d') AS event_day,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
               CAST(floor(epoch(ts)) AS BIGINT) AS epoch_rt
        FROM events
    """,
    tags=("F2", "F3", "F4", "F5", "F9"),
)
def rb_time_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-function family (N2:268-339, Utils/Define-Functions.py:27):
    from_unixtime default format (F2), custom format (F3),
    unix_timestamp on a timestamp (F4), unix_timestamp STRING parse (F5,
    via the format→parse round-trip epoch_rt == epoch_s).

    The round-trip is only unambiguous because ``load_table`` →
    ``ensure_session_defaults`` pins ``spark.sql.session.timeZone=UTC``
    (runtime-settable, so it holds even when the driver builds the
    session under another zone): UTC has no DST fold, so every epoch
    formats to a unique wall-clock string."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_unixtime(F.unix_timestamp("ts")).alias("ts_str"),
        F.from_unixtime(F.unix_timestamp("ts"), "yyyy-MM-dd").alias("event_day"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.unix_timestamp(F.from_unixtime(F.unix_timestamp("ts"))).alias("epoch_rt"),
    )


@query(
    "rb_json_funcs_breadth",
    oracle="""
        SELECT event_id,
               json_extract_string(props, '$.k') AS k_str,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
        FROM events
    """,
    tags=("F14", "F16", "F18"),
)
def rb_json_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family (N2:387-390, N3:147-151): get_json_object path
    extraction (F16, the OSS ``col:path`` stand-in), from_json with a
    DDL schema (F14), struct field access on the parsed value (F18)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_val"),
    )


@query(
    "f19_variant_type_breadth",
    oracle="""
        WITH v AS (
            SELECT event_id, props,
                   '{"a":' || CAST(event_id % 100 AS VARCHAR)
                       || ',"b":{"c":"' || event_type || '"},"arr":[1,'
                       || CAST(user_id % 10 AS VARCHAR) || ']}' AS composed
            FROM events
        )
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               json_extract_string(composed, '$.b.c') AS c,
               CAST(json_extract(composed, '$.arr[1]') AS BIGINT) AS arr1,
               CAST(NULL AS BIGINT) AS missing,
               'OBJECT<k: BIGINT>' AS vschema
        FROM v
    """,
    tags=("F14", "F16", "F18", "variant"),
)
def f19_variant_type_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT type family: parse_json into the shredded binary
    VARIANT, typed path extraction with variant_get (top-level key,
    nested object path, array index), try_variant_get's NULL on a
    missing path, and schema_of_variant's inferred type string.  The
    nested/array paths run against a JSON composed deterministically
    from (event_id, event_type, user_id) so both engines parse
    identical documents; the oracle re-extracts with DuckDB's JSON
    operators and pins schema inference as the literal it must infer.

    VARIANT is the 100 TB answer to semi-structured columns: parsed
    once into a binary encoding, path access without re-parsing, and
    (on storage that supports it) shredded stats for pushdown — versus
    get_json_object re-parsing the string per call
    (rb_json_funcs_breadth covers that legacy family).  Pure map, one
    scan, no shuffle."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH v AS (
            SELECT event_id, props,
                   parse_json(concat('{"a":', CAST(event_id % 100 AS STRING),
                       ',"b":{"c":"', event_type, '"},"arr":[1,',
                       CAST(user_id % 10 AS STRING), ']}')) AS composed
            FROM dew_events
        )
        SELECT event_id,
               variant_get(parse_json(props), '$.k', 'bigint') AS k,
               variant_get(composed, '$.b.c', 'string') AS c,
               variant_get(composed, '$.arr[1]', 'bigint') AS arr1,
               try_variant_get(parse_json(props), '$.missing', 'bigint')
                   AS missing,
               schema_of_variant(parse_json(props)) AS vschema
        FROM v
        """
    )


@query(
    "rb_explode_breadth",
    oracle="""
        WITH tok AS (
            SELECT doc_id, generate_subscripts(arr, 1) - 1 AS pos, unnest(arr) AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
        )
        SELECT token, COUNT(*) AS freq, CAST(MIN(pos) AS BIGINT) AS first_pos
        FROM tok WHERE LENGTH(token) >= 4
        GROUP BY token
        ORDER BY freq DESC, token ASC LIMIT 100
    """,
    tags=("G1", "G2", "F13", "A2"),
)
def rb_explode_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator family (N2:383-394, N3:148-150): posexplode with parent
    columns (G1; explode G2 is posexplode minus the position), feeding
    the token-frequency aggregate (A2) with a deterministic top-100.
    Partial aggregation runs map-side; the final sort is TakeOrdered."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        WITH tok AS (
            SELECT doc_id, posexplode(split(text, ' ')) AS (pos, token) FROM dew_documents
        )
        SELECT token, COUNT(*) AS freq, CAST(MIN(pos) AS BIGINT) AS first_pos
        FROM tok WHERE LENGTH(token) >= 4
        GROUP BY token
        ORDER BY freq DESC, token ASC LIMIT 100
        """
    )


@query(
    "rb_text_analysis_breadth",
    oracle="""
        WITH tok AS (
            SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_words_tok,
                   SUM(CASE WHEN w IN ('the','a','of','and','to','in','is','that','for','it')
                            THEN 1 ELSE 0 END) AS en_hits
            FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang,
               CASE WHEN h.en_hits * 20 >= h.n_words_tok THEN 'en' ELSE 'other' END AS lang_guess,
               LENGTH(d.text) AS len_chars,
               len(string_split(d.text, ' ')) AS n_words,
               len(regexp_extract_all(d.text, '[.,!?;:]')) AS n_punct,
               len(regexp_extract_all(d.text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_tokens_bpeish,
               ROUND(
                 0.4 * least(LENGTH(d.text) / 500.0, 1.0)
               + 0.3 * least(len(string_split(d.text, ' ')) / 100.0, 1.0)
               + 0.3 * (CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.5 END), 6) AS quality_score,
               md5(trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9 ]', '', 'g'),
                                       '  +', ' ', 'g'))) AS fingerprint,
               (regexp_matches(d.text, '[A-Za-z0-9._]+@[A-Za-z0-9.]+')
                OR regexp_matches(d.text, '[0-9]{3}-[0-9]{3,4}-[0-9]{4}')) AS has_pii
        FROM documents d JOIN hits h ON d.doc_id = h.doc_id
    """,
    tags=("ext-text", "ext-corpus"),
)
def rb_text_analysis_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-analysis suite per document, one corpus scan: stopword-ratio
    language ID, char/word/punct counts, BPE-ish token count, composite
    quality score, canonical-form md5 fingerprint, PII pattern flag.
    One explode→agg for the stopword ratio joined back to a single
    per-row projection — everything JVM-side, dialect-portable regexes
    (character classes only, integer cross-multiplied ratios)."""
    register_views(spark, sf_dir, "documents")
    return spark.sql(
        """
        WITH tok AS (
            SELECT doc_id, explode(split(lower(text), ' ')) AS w FROM dew_documents
        ),
        hits AS (
            SELECT doc_id, COUNT(*) AS n_words_tok,
                   SUM(CASE WHEN w IN ('the','a','of','and','to','in','is','that','for','it')
                            THEN 1 ELSE 0 END) AS en_hits
            FROM tok GROUP BY doc_id
        )
        SELECT d.doc_id, d.lang,
               CASE WHEN h.en_hits * 20 >= h.n_words_tok THEN 'en' ELSE 'other' END AS lang_guess,
               CAST(LENGTH(d.text) AS BIGINT) AS len_chars,
               CAST(size(split(d.text, ' ')) AS BIGINT) AS n_words,
               CAST(size(regexp_extract_all(d.text, '([.,!?;:])', 1)) AS BIGINT) AS n_punct,
               CAST(size(regexp_extract_all(d.text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])', 1)) AS BIGINT)
                   AS n_tokens_bpeish,
               ROUND(CAST(
                 CAST(0.4 AS DOUBLE) * least(LENGTH(d.text) / CAST(500.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * least(size(split(d.text, ' ')) / CAST(100.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
               + CAST(0.3 AS DOUBLE) * (CASE WHEN d.lang = 'en' THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
               AS DOUBLE), 6) AS quality_score,
               md5(trim(regexp_replace(regexp_replace(lower(d.text), '[^a-z0-9 ]', ''),
                                       '  +', ' '))) AS fingerprint,
               (d.text RLIKE '[A-Za-z0-9._]+@[A-Za-z0-9.]+'
                OR d.text RLIKE '[0-9]{3}-[0-9]{3,4}-[0-9]{4}') AS has_pii
        FROM dew_documents d JOIN hits h ON d.doc_id = h.doc_id
        """
    )


@query(
    "rb_array_hof_breadth",
    # DuckDB's list lambdas mirror Spark's array HOFs; the only
    # float-accumulating output (l1 component sum) goes through the
    # engine-order-independent DECIMAL fold (simops.py's _DOT rule).
    # The unnest aggregate LEFT JOINs back onto the base table so a row
    # with an EMPTY array still appears (comp_sum 0.0, like Spark's
    # aggregate() fold over []) instead of vanishing with its unnest.
    oracle="""
        WITH sums AS (
            SELECT vec_id,
                   ROUND(CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(28,14)))
                              AS DOUBLE), 6) AS comp_sum
            FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) u
            GROUP BY vec_id
        )
        SELECT e.vec_id,
               len(embedding) AS dim,
               len(list_filter(embedding, x -> x > 0)) AS n_pos,
               len(list_filter(embedding, x -> x > 0.25)) > 0 AS any_big,
               len(list_filter(embedding, x -> NOT (abs(x) < 1.0))) = 0
                   AS all_unit,
               CAST(COALESCE(list_position(
                   list_transform(embedding, x -> x > 0.25), true
               ), 0) AS BIGINT) AS first_big_idx,
               COALESCE(s.comp_sum, CAST(0.0 AS DOUBLE)) AS comp_sum
        FROM embeddings e LEFT JOIN sums s ON e.vec_id = s.vec_id
    """,
    tags=("extra", "F-hof"),
)
def rb_array_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function family in one projection: filter,
    exists, forall, transform + array_position, and the DECIMAL-folded
    aggregate — the lambda surface the similarity/multimodal operators
    build on (simops.py, llmq.py), proven here in isolation.  Every
    expression is a per-row JVM lambda over the array column: pure map,
    no shuffle, no Python.  The oracle recomputes exists/forall as
    list_filter cardinalities and the component sum from an unnest
    aggregation — independent formulations of the same semantics.
    array_position returns 0 (not NULL) when no element matches, in
    BOTH engines."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.size(F.expr("filter(embedding, x -> x > 0)")).cast("long").alias("n_pos"),
        F.expr("exists(embedding, x -> x > 0.25)").alias("any_big"),
        F.expr("forall(embedding, x -> abs(x) < 1.0)").alias("all_unit"),
        F.expr(
            "CAST(array_position(transform(embedding, x -> x > 0.25), true)"
            " AS BIGINT)"
        ).alias("first_big_idx"),
        F.expr(
            "ROUND(CAST(aggregate(embedding, CAST(0 AS DECIMAL(28,14)),"
            " (acc, x) -> CAST(acc + CAST(CAST(x AS DOUBLE) AS DECIMAL(28,14))"
            " AS DECIMAL(28,14))) AS DOUBLE), 6)"
        ).alias("comp_sum"),
    )


@query(
    "rb_map_funcs_breadth",
    # the oracle recomputes every final scalar RELATIONALLY (DuckDB maps
    # have different semantics, so nothing map-typed crosses the wire):
    # per-user type-count profile, its size, filtered size, argmax entry,
    # and a canonical 'k:v' serialization
    oracle="""
        WITH tc AS (
            SELECT user_id, event_type, COUNT(*) AS n,
                   MAX(COUNT(*)) OVER (PARTITION BY user_id) AS mx
            FROM events GROUP BY user_id, event_type
        )
        SELECT user_id,
               COUNT(*) AS n_types,
               CAST(SUM(n) AS BIGINT) AS total_events,
               COUNT(*) FILTER (WHERE n >= 5) AS n_frequent_types,
               MAX(n) AS top_type_n,
               MIN(CASE WHEN n = mx THEN event_type END) AS top_type,
               string_agg(event_type || ':' || CAST(n AS VARCHAR), ';'
                          ORDER BY event_type) AS profile
        FROM tc
        GROUP BY user_id
    """,
    tags=("breadth", "F-map"),
)
def rb_map_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MAP-function family in one pass: each user's event-type
    profile is materialized as a real MapType column
    (map_from_entries over a sorted entry array, so iteration order is
    canonical), then interrogated with size/map_entries/map_filter/
    map_values/element_at — and every probe is reduced to a scalar or
    string the driver can hash, checked against a purely relational
    DuckDB recomputation (two independent formulations of the same
    facts).  Map construction is one per-user aggregate; all map ops
    are JVM expressions on the grouped row — no shuffle after the
    groupBy, no Python."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH src AS (
            -- REPARTITION(user_id) on the INPUT: hashpartitioning(user_id)
            -- satisfies the clustered distribution of BOTH aggregates
            -- (grouping by (user_id, event_type) only needs same-user
            -- co-location), so the whole query runs on ONE exchange
            SELECT /*+ REPARTITION(user_id) */ user_id, event_type
            FROM dew_events
        ),
        tc AS (
            SELECT user_id, event_type, COUNT(*) AS n
            FROM src GROUP BY user_id, event_type
        ),
        m AS (
            SELECT user_id,
                   map_from_entries(
                       array_sort(collect_list(struct(event_type, n)))
                   ) AS profile_map
            FROM tc GROUP BY user_id
        )
        SELECT user_id,
               CAST(size(profile_map) AS BIGINT) AS n_types,
               CAST(aggregate(map_values(profile_map), 0L, (a, x) -> a + x)
                    AS BIGINT) AS total_events,
               CAST(size(map_filter(profile_map, (k, v) -> v >= 5))
                    AS BIGINT) AS n_frequent_types,
               array_max(map_values(profile_map)) AS top_type_n,
               array_min(map_keys(map_filter(profile_map,
                   (k, v) -> v = array_max(map_values(profile_map)))))
                   AS top_type,
               array_join(transform(map_entries(profile_map),
                   e -> concat(e.key, ':', CAST(e.value AS STRING))), ';')
                   AS profile
        FROM m
        """
    )


@query(
    "rb_setops_breadth",
    oracle="""
        WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             b AS (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
        SELECT 'union_distinct' AS op,
               (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n
        UNION ALL SELECT 'union_all',
               (SELECT COUNT(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b))
        UNION ALL SELECT 'union_by_name_missing',
               (SELECT COUNT(*) FROM b)
        UNION ALL SELECT 'intersect_distinct',
               (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b))
        UNION ALL SELECT 'intersect_all',
               (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
        UNION ALL SELECT 'except_distinct',
               (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b))
        UNION ALL SELECT 'except_all',
               (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b))
    """,
    tags=("breadth", "setops", "C"),
)
def rb_setops_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full set-operator family in one pass, DataFrame-API side:
    union/unionAll, unionByName with allowMissingColumns (the
    schema-evolution union — its measured scalar is the count of rows
    whose missing column was null-filled, i.e. exactly the right side),
    intersect vs intersectAll and subtract vs exceptAll (DISTINCT-set vs
    multiset bag semantics — the ALL variants preserve multiplicity, so
    over orders with repeated custkeys the two counts genuinely differ).
    ``c3_union_except_intersect`` pins the distinct trio; this row adds
    the bag variants and by-name union.  Each branch reduces to one
    (op, n) scalar row — seven tiny aggregates unioned, no collect.
    Scale: every branch is one shuffle on o_custkey at most; the ALL
    variants compile to the same hash-aggregate + join shapes a manual
    multiplicity-compare would need, but stay whole-stage-codegen."""
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    a_tagged = a.withColumn("src", F.lit("a"))

    def one(op: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(op).alias("op"), F.count(F.lit(1)).cast("long").alias("n")
        )

    branches = [
        one("union_distinct", a.union(b).distinct()),
        one("union_all", a.unionAll(b)),
        # rows contributed by the src-less right side arrive null-filled
        one(
            "union_by_name_missing",
            a_tagged.unionByName(b, allowMissingColumns=True).filter(
                F.col("src").isNull()
            ),
        ),
        one("intersect_distinct", a.intersect(b)),
        one("intersect_all", a.intersectAll(b)),
        one("except_distinct", a.subtract(b)),
        one("except_all", a.exceptAll(b)),
    ]
    out = branches[0]
    for br in branches[1:]:
        out = out.unionByName(br)
    return out


@query(
    "rb_group_by_all_breadth",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST((o_totalprice) AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
    """,
    tags=("breadth", "A6", "group-by-all"),
)
def rb_group_by_all_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` + ``ORDER BY ALL`` — the SQL text is IDENTICAL
    in Spark (3.4+/4.x) and DuckDB, which both resolve ALL to the
    non-aggregate select-list columns (group) and the full select list
    (order).  The one engine-twin row in the registry where the Spark
    query and the oracle are byte-for-byte the same statement.  Scale:
    compiles to exactly the explicit-column plan (one partial-agg
    shuffle on the two group columns); ALL is pure resolution sugar,
    so nothing changes at 100 TB versus spelling the columns out."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST((o_totalprice) AS DECIMAL(18,4))) AS DOUBLE) AS sum_totalprice
        FROM dew_orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )


@query(
    "f20_try_arith_breadth",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_custkey % 3 = 0 THEN NULL
                    ELSE o_totalprice / CAST(o_custkey % 3 AS DOUBLE) END AS safe_ratio,
               o_orderkey + 1000000 AS add_ok,
               CASE WHEN o_orderkey <= 0 THEN 9223372036854775807 + o_orderkey
                    ELSE NULL END AS add_overflow,
               CAST(CASE WHEN CAST(o_orderkey AS HUGEINT) * 4611686018427387904
                              BETWEEN -9223372036854775808 AND 9223372036854775807
                         THEN CAST(o_orderkey AS HUGEINT) * 4611686018427387904
                    END AS BIGINT) AS mul_overflow,
               CAST(CASE WHEN CAST(-9223372036854775807 AS HUGEINT) - o_orderkey
                              BETWEEN -9223372036854775808 AND 9223372036854775807
                         THEN CAST(-9223372036854775807 AS HUGEINT) - o_orderkey
                    END AS BIGINT) AS sub_overflow,
               TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_head,
               TRY_CAST(o_orderpriority AS INTEGER) AS prio_full,
               list_extract(string_split(o_orderpriority, '-'), 1) AS first_part,
               list_extract(string_split(o_orderpriority, '-'), 3) AS no_third
        FROM orders
    """,
    tags=("breadth", "F", "ansi-safety"),
)
def f20_try_arith_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_`` error-safe expression family (Spark 3.2+/4.x):
    try_divide (NULL on zero divisor — floating division, IEEE-exact in
    both engines so the non-NULL doubles hash identically), try_add /
    try_multiply / try_subtract (NULL on BIGINT overflow instead of the
    ANSI runtime error; o_orderkey starts at 0, so each column carries
    both a non-NULL witness and an overflowing row), try_cast (full
    string fails -> NULL, leading digit parses), and try_element_at
    (out-of-range list index -> NULL).  This is the ANSI-mode safety
    surface a 100 TB batch job relies on: one malformed row must yield
    NULL, not kill a 10-hour job at stage 40.  The oracle emulates
    overflow detection in HUGEINT and divide-by-zero with CASE.  Pure
    map over one scan, no shuffle; every expression stays inside
    whole-stage codegen."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey,
               try_divide(o_totalprice, CAST(o_custkey % 3 AS DOUBLE)) AS safe_ratio,
               try_add(o_orderkey, 1000000) AS add_ok,
               try_add(9223372036854775807, o_orderkey) AS add_overflow,
               try_multiply(o_orderkey, 4611686018427387904) AS mul_overflow,
               try_subtract(-9223372036854775807L, o_orderkey) AS sub_overflow,
               try_cast(substring(o_orderpriority, 1, 1) AS INT) AS prio_head,
               try_cast(o_orderpriority AS INT) AS prio_full,
               try_element_at(split(o_orderpriority, '-'), 1) AS first_part,
               try_element_at(split(o_orderpriority, '-'), 3) AS no_third
        FROM dew_orders
        """
    )


@query(
    "ddl_sql_udf_variables",
    oracle="""
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(substring(o_orderpriority, 1, 1) AS INTEGER)) AS BIGINT)
                   AS prio_rank_sum,
               CAST(5000.0 AS DOUBLE) AS threshold_used
        FROM orders
        WHERE o_totalprice >= 5000.0
          AND CAST(substring(o_orderpriority, 1, 1) AS INTEGER) <= 3
        GROUP BY o_orderstatus
    """,
    tags=("breadth", "DDL", "sql-udf", "session-variables"),
)
def ddl_sql_udf_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scripting surface (Spark 4.x): a SQL-body scalar
    UDF (``CREATE OR REPLACE TEMPORARY FUNCTION … RETURN expr`` — the
    declarative replacement for the notebook-era Python UDF the
    reference defines at `Utils/Define-Functions.py:12-22`), a session
    variable (``DECLARE … SET VAR``) read directly inside the query
    both as a predicate threshold and as an emitted column, and
    ``EXECUTE IMMEDIATE … USING ?`` binding a positional parameter.
    The oracle inlines the function body and the variable's value —
    that inlining is exactly what Catalyst does too (SQL UDFs are
    expression-substituted, NOT black boxes), which is why this beats a
    Python UDF at 100 TB: the substituted expression stays inside
    whole-stage codegen and its predicates still push down."""
    register_views(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION dew_prio_rank(p STRING) "
        "RETURNS INT RETURN CAST(substring(p, 1, 1) AS INT)"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE dew_min_total DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR dew_min_total = 5000.0")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
        'SELECT o_orderstatus,
                COUNT(*) AS n_orders,
                CAST(SUM(dew_prio_rank(o_orderpriority)) AS BIGINT) AS prio_rank_sum,
                CAST(MIN(dew_min_total) AS DOUBLE) AS threshold_used
         FROM dew_orders
         WHERE o_totalprice >= dew_min_total AND dew_prio_rank(o_orderpriority) <= ?
         GROUP BY o_orderstatus'
        USING 3
        """
    )


@query(
    "f21_xml_funcs_breadth",
    oracle=f"""
        SELECT event_id,
               CAST(event_id % 100 AS BIGINT) AS k,
               {F21_SANITIZE_DUCK} AS t,
               CAST(event_id % 100 AS INTEGER) AS k2,
               CAST(user_id % 10 AS VARCHAR) AS uid,
               'STRUCT<k: BIGINT, t: STRING>' AS xsch
        FROM events
    """,
    tags=("breadth", "F", "xml"),
)
def f21_xml_funcs_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML function family (built into Spark 4 after the spark-xml
    merge): from_xml with a DDL schema + struct field access, xpath
    element extraction (string and typed int), xpath ATTRIBUTE
    extraction (``@uid``), and schema_of_xml inference pinned as the
    literal it must produce.  The documents are composed
    deterministically from (event_id, event_type, user_id) — the
    values survive a compose→parse roundtrip, so the oracle (DuckDB
    has no XML support) re-derives each extracted value from the same
    source columns: parse(compose(x)) == x is exactly the contract an
    XML ingestion stage needs.  XML metacharacters AND the
    XML-1.0-illegal C0 control range in event_type are sanitized to
    '_' by the SAME shared pattern (``XML_SANITIZE_PATTERN``, module
    top) on both engines, so the roundtrip stays well-formed under
    arbitrary string data — every remaining character is legal XML
    content.  Pure map over one scan, no shuffle; from_xml evaluates
    JVM-side (no Python boundary), unlike the UDF detour pre-merge
    spark-xml users needed."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        f"""
        WITH x AS (
            SELECT event_id, event_type, user_id,
                   {F21_COMPOSE_SPARK} AS doc
            FROM dew_events
        )
        SELECT event_id,
               from_xml(doc, 'k BIGINT, t STRING').k AS k,
               xpath_string(doc, '/e/t') AS t,
               xpath_int(doc, '/e/k') AS k2,
               xpath_string(doc, '/e/u/@uid') AS uid,
               schema_of_xml('<e><k>1</k><t>x</t></e>') AS xsch
        FROM x
        """
    )


@query(
    "f22_timezone_convert_breadth",
    oracle="""
        SELECT event_id,
               strftime(timezone('America/New_York', timezone('UTC', ts)),
                        '%Y-%m-%d %H:%M:%S') AS ny_wall,
               strftime(timezone('America/New_York', timezone('UTC', ts)),
                        '%Y-%m-%d') AS ny_date,
               strftime(timezone('Asia/Tokyo', timezone('UTC', ts)),
                        '%Y-%m-%d %H:%M:%S') AS tokyo_wall,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS utc_rt
        FROM events
    """,
    tags=("breadth", "F", "timezone"),
)
def f22_timezone_convert_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-conversion family: from_utc_timestamp (UTC instant →
    local wall clock, the display/partition-by-local-date operation),
    convert_timezone (Spark 3.4+ three-arg form), and a
    local→UTC→format roundtrip via to_utc_timestamp.  Cross-engine
    hazard pinned here: Spark consults the JVM tz database, DuckDB its
    bundled ICU — they agree on these zones/dates (both track IANA),
    and UTC→local is ALWAYS unambiguous, so ny_wall/tokyo_wall hash
    identically.  The roundtrip leg deliberately uses Asia/Tokyo (no
    DST): a local→UTC conversion in a DST zone is ambiguous during the
    fall-back fold hour, where engines may legally disagree — the
    docstring IS the contract: never roundtrip through a DST zone's
    local wall time in a cross-engine pipeline.  Pure map, one scan,
    no shuffle; tz conversion is a per-row offset lookup that stays in
    whole-stage codegen."""
    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT event_id,
               date_format(from_utc_timestamp(ts, 'America/New_York'),
                           'yyyy-MM-dd HH:mm:ss') AS ny_wall,
               date_format(from_utc_timestamp(ts, 'America/New_York'),
                           'yyyy-MM-dd') AS ny_date,
               date_format(convert_timezone('UTC', 'Asia/Tokyo', ts),
                           'yyyy-MM-dd HH:mm:ss') AS tokyo_wall,
               date_format(to_utc_timestamp(
                               from_utc_timestamp(ts, 'Asia/Tokyo'),
                               'Asia/Tokyo'),
                           'yyyy-MM-dd HH:mm:ss') AS utc_rt
        FROM dew_events
        """
    )
