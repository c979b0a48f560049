"""Plan-quality regression tests (SCALE.md): assert the physical plan
SHAPE each operator was designed for — broadcastable joins broadcast,
filters/columns pushed to the scan, no accidental cartesian products,
single-exchange window constructions.  A correctness-preserving change
that regresses one of these would silently cost 10-100× at scale."""

from __future__ import annotations

import contextlib
import io
import re
from collections import Counter

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _ops(plan: str) -> Counter:
    return Counter(re.findall(r"\(\d+\) ([A-Za-z]+)", plan))


@pytest.fixture(scope="module")
def registry():
    from dataengineeringworkshop_spark.plans.registry import load_all

    return load_all()


def test_flagship_broadcasts_dims_and_prunes_columns(spark, registry):
    df = registry["flagship_region_month_revenue"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    ops = _ops(plan)
    # all four joins broadcast at this scale; never a cartesian product
    assert ops["BroadcastHashJoin"] >= 3, ops
    assert ops["CartesianProduct"] == 0 and ops["BroadcastNestedLoopJoin"] == 0
    # column pruning reaches the lineitem scan: 3 columns, not 16
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m and len(m.group(1).split(",")) == 3, m and m.group(1)
    # join-key null filters are pushed into every scan
    assert plan.count("PushedFilters: [IsNotNull") >= 5


def test_point_filter_is_pushed_to_scan(spark, registry):
    df = registry["p5_eq_filter"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert re.search(r"PushedFilters: \[.*EqualTo", plan), plan[:800]


def test_asof_join_is_single_exchange_no_pair_blowup(spark, registry):
    df = registry["tj_asof_click_view"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    # union+window construction: exactly one shuffle, one window pass,
    # and NO join operator at all
    assert ops["Window"] == 1, ops
    assert ops["Exchange"] == 1, ops
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops[j] == 0, (j, ops)


def test_range_join_is_equi_not_nested_loop(spark, registry):
    df = registry["tj_range_click_purchase"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    equi = ops["BroadcastHashJoin"] + ops["SortMergeJoin"] + ops["ShuffledHashJoin"]
    assert equi >= 1, ops
    assert ops["BroadcastNestedLoopJoin"] == 0 and ops["CartesianProduct"] == 0, ops


def test_sessionize_windows_share_one_exchange(spark, registry):
    df = registry["tj_sessionize_gap30"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    # lag + running-sum + final agg reuse the (user_id) partitioning:
    # at most 2 exchanges total (window partitioning + agg output),
    # never one per window function
    assert ops["Exchange"] <= 2, ops


def test_grouped_agg_has_map_side_partial(spark, registry):
    plan = _plan(registry["a6_multi_col_group"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    # partial + final HashAggregate around a single exchange
    assert ops["HashAggregate"] == 2 and ops["Exchange"] == 1, ops
    assert ops["SortAggregate"] == 0, ops


def test_cosine_topk_broadcasts_query_side_only(spark, registry):
    plan = _plan(registry["sim_cosine_topk"].fn(spark, SF_SMOKE))
    # the nested-loop is INTENTIONAL (inequality predicate) but must be
    # broadcast-driven (small query set), never a shuffled cartesian
    ops = _ops(plan)
    assert ops["BroadcastNestedLoopJoin"] == 1 and ops["CartesianProduct"] == 0, ops
    # the broadcast side is a FIXED-k query sample (GlobalLimit 16), so
    # its size is corpus-INdependent — the O(N²) trap stays closed
    assert ops["TakeOrderedAndProject"] + ops["GlobalLimit"] >= 1, ops
    q = registry["sim_cosine_topk"].fn(spark, SF_SMOKE)
    assert q.select("query_id").distinct().count() <= 16


def test_relational_core_stays_jvm_side(spark, registry):
    """Vectorized parquet scans, and no Python row evaluation anywhere in
    the relational/temporal/window plans — Python appears only in the
    explicitly Arrow-batched LLM-ops (LSH signatures, decode stubs)."""
    for name in (
        "j2_three_way_inner",
        "flagship_region_month_revenue",
        "w2_topk_per_group",
        "tj_asof_click_view",
        "tj_sessionize_gap30",
        "t_token_count_regex",
    ):
        plan = _plan(registry[name].fn(spark, SF_SMOKE))
        assert "Batched: true" in plan, (name, plan[:400])
        for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
            assert marker not in plan, (name, marker)


def test_ivf_probe_single_shuffle_no_python(spark, registry):
    """IVF probe (warm index): map-only cell assignment — no join, no
    window, no Python — feeding a broadcast probe join; the ONLY
    exchange is the final per-query top-k window."""
    df = registry["ann_ivf_topk"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    ops = _ops(plan)
    # probe join is broadcast-driven; assignment added no extra joins
    assert ops["BroadcastHashJoin"] == 1, ops
    assert ops["CartesianProduct"] == 0 and ops["BroadcastNestedLoopJoin"] == 0, ops
    # one shuffle total: the top-k window partitioning
    assert ops["Window"] == 1, ops
    assert ops["Exchange"] == 1, ops
    # cell assignment is pure JVM expressions, not pandas
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_decontaminate_broadcasts_eval_grams(spark, registry):
    """The contamination check joins the corpus gram index against the
    (bounded) eval gram set — eval side must broadcast, corpus must not
    reshuffle into a sort-merge join."""
    plan = _plan(registry["cp_decontaminate"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["BroadcastHashJoin"] >= 1, ops
    assert ops["SortMergeJoin"] == 0 and ops["CartesianProduct"] == 0, ops


def test_bpe_pairs_partial_agg_before_shuffle(spark, registry):
    """Pair counting must map-side combine: partial + final HashAggregate
    so the shuffle carries (pair, partial count), not raw exploded pairs."""
    ops = _ops(_plan(registry["t_bpe_pair_counts"].fn(spark, SF_SMOKE)))
    assert ops["HashAggregate"] >= 2, ops
    assert ops["SortAggregate"] == 0, ops


def test_incremental_probe_no_cartesian(spark, registry):
    """New-batch dedup probe: equi joins on the shingle only — a missing
    join key here would silently cross-join batch × corpus."""
    ops = _ops(_plan(registry["d_incremental_dedup_probe"].fn(spark, SF_SMOKE)))
    assert ops["CartesianProduct"] == 0 and ops["BroadcastNestedLoopJoin"] == 0, ops


def test_semdedup_assignment_materialized_once(spark, registry):
    """SemDeDup: the cell assignment feeds three branches — it must be
    materialized (scans of a parquet intermediate), not recomputed as
    three broadcast-cross-join subtrees over the corpus."""
    df = registry["sd_semantic_dedup"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    ops = _ops(plan)
    # assignment already ran at materialize time: no cross join left
    assert ops["BroadcastNestedLoopJoin"] == 0 and ops["CartesianProduct"] == 0, ops
    # pair join is the only heavyweight join; its sides scan the artifact
    assert ops["SortMergeJoin"] <= 1, ops


def test_bigram_lm_no_self_join_for_bigrams(spark, registry):
    """Bigram construction must be one explode pass (Generate over an
    index sequence), NOT a token self-join on (doc, i) = (doc, i+1);
    model lookups partial-agg before their shuffles."""
    plan = _plan(registry["cp_bigram_lm_score"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["Generate"] >= 1, ops
    assert ops["CartesianProduct"] == 0, ops
    # map-side combine on every counting aggregate
    assert ops["HashAggregate"] >= 4, ops
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_bm25_stats_broadcast_into_scoring(spark, registry):
    """BM25: df/avgdl/N are tiny aggregates — they must broadcast into
    the per-(doc,term) scoring join rather than reshuffle the tf side."""
    plan = _plan(registry["cp_bm25_search"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["BroadcastHashJoin"] >= 1, ops
    assert ops["CartesianProduct"] == 0, ops


def test_quantize_single_explode_agg_pass(spark, registry):
    """Scalar quantization is a per-vector map: explode + two aggs that
    share one hash partitioning on vec_id — no Python, no extra joins."""
    plan = _plan(registry["sim_embed_quantize"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["SortMergeJoin"] + ops["BroadcastHashJoin"] <= 1, ops
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_partitioned_layout_prunes_directories(spark, registry):
    """Date-partitioned layout: the 3-day window must appear as
    PartitionFilters on the artifact scan (directory pruning), not as a
    row-level data filter over all partitions."""
    df = registry["pp_partition_pruned_events"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan[:2000]
    assert ">=" in m.group(1) and "<=" in m.group(1), m.group(1)


def test_bm25_global_topk_is_take_ordered_not_global_window(spark, registry):
    plan = _plan(registry["cp_bm25_search"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    # global top-20 must be TakeOrderedAndProject (per-partition heaps,
    # driver merge): the ranked set never lands in one partition.  The
    # single Window that remains runs AFTER the LIMIT, over ≤20 rows.
    assert ops["TakeOrderedAndProject"] >= 1, ops
    assert ops["Window"] == 1, ops


def test_pq_encode_is_map_only(spark, registry):
    """PQ encoding must be a pure map: inlined codebook literal, zero
    Exchange, zero Python — the embarrassingly-parallel 100 TB encode."""
    from dataengineeringworkshop_spark.llmops.pq import encode_pq, train_codebooks
    from dataengineeringworkshop_spark.plans.tables import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    books = train_codebooks(e, "embedding", dim=64, m=8, ksub=4)
    plan = _plan(encode_pq(e, "vec_id", "embedding", books))
    ops = _ops(plan)
    assert ops.get("Exchange", 0) == 0, ops
    assert "Python" not in plan and "MapInPandas" not in plan
    assert "Scan parquet" in plan or "Scan" in plan


def test_pq_adc_probe_broadcasts_lut_single_topk_shuffle(spark, registry):
    """ADC probe: the per-query LUT side is BROADCAST (never the coded
    corpus), and aside from the bounded rerank joins the only shuffles
    rank per-query top-k."""
    df = registry["ann_pq_topk"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    ops = _ops(plan)
    assert ops.get("BroadcastExchange", 0) >= 1
    assert "MapInPandas" not in plan  # ADC scoring is JVM expressions
    # windows for pre-rank + final rank; no cartesian product label
    assert "CartesianProduct" not in plan


def test_cdc_chunking_single_window_exchange(spark, registry):
    """Content-defined chunking: one shuffle partitions words by doc for
    the boundary cumsum; the fingerprint groupBy reuses that
    partitioning prefix — no extra corpus-wide exchange beyond the
    aggregate's own."""
    df = registry["cp_cdc_passage_chunks"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    # explode -> window exchange (doc_id) -> window -> hash agg; the agg
    # on (doc_id, chunk_id) can piggyback the doc_id partitioning
    assert ops.get("Exchange", 0) <= 2, ops
    assert ops.get("Window", 0) == 1, ops


def test_shared_passages_no_pairwise_join(spark, registry):
    """The copied-passage report must be a pure aggregate over the chunk
    table — a fingerprint self-join would reintroduce quadratic pair
    formation for viral passages."""
    df = registry["cp_shared_passages"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    ops = _ops(plan)
    assert ops.get("SortMergeJoin", 0) + ops.get("BroadcastHashJoin", 0) == 0, ops
    assert ops.get("HashAggregate", 0) >= 2  # partial+final


def test_fuzzy_levenshtein_blocked_equi_join(spark, registry):
    """t_fuzzy_match_levenshtein candidates come from a deletion-
    neighborhood EQUI-join on the block key — never an all-pairs
    BroadcastNestedLoopJoin over the `a.nm < b.nm` theta condition
    (the O(n²) shape the dedup brief bans)."""
    df = registry["t_fuzzy_match_levenshtein"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops["BroadcastNestedLoopJoin"] == 0 and ops["CartesianProduct"] == 0
    assert ops["BroadcastHashJoin"] + ops["SortMergeJoin"] + ops["ShuffledHashJoin"] >= 1, ops


def test_sql_script_temporal_idioms_single_exchange(spark, registry):
    """The SQL-text sessionize and as-of idioms must compile to the same
    single-exchange window shapes as their Python-API twins — no extra
    shuffle, no join at all for the as-of (it's union+window)."""
    sess = _ops(_plan(registry["tj_sessionize_sql_script"].fn(spark, SF_SMOKE)))
    # lag + cumsum share ONE user_id exchange; the rollup adds its own
    assert sess.get("Window", 0) >= 1 and sess.get("CartesianProduct", 0) == 0
    asof = _ops(_plan(registry["tj_asof_sql_script"].fn(spark, SF_SMOKE)))
    joins = (
        asof.get("BroadcastHashJoin", 0)
        + asof.get("SortMergeJoin", 0)
        + asof.get("ShuffledHashJoin", 0)
        + asof.get("BroadcastNestedLoopJoin", 0)
        + asof.get("CartesianProduct", 0)
    )
    assert joins == 0, asof  # as-of is union+window, never a pair join
    assert asof.get("Window", 0) == 1 and asof.get("Exchange", 0) == 1, asof


def test_bucketed_join_agg_pays_no_join_shuffle(spark, registry):
    """pp_bucketed_join_agg: the bucketed layout eliminates BOTH join
    shuffles — the only Exchange left in the plan is the final
    aggregate's.  This is the pay-the-shuffle-once contract the query
    exists to demonstrate."""
    df = registry["pp_bucketed_join_agg"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops["SortMergeJoin"] == 1, ops
    assert ops.get("Exchange", 0) <= 1, ops  # agg only — none for the join


def test_salted_skew_join_no_nested_loop(spark, registry):
    """pp_salted_skew_agg joins on (key, salt) — an equi join (never a
    nested loop), with the small dim side carrying the salt explode."""
    df = registry["pp_salted_skew_agg"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0
    assert ops.get("CartesianProduct", 0) == 0
    assert (
        ops.get("SortMergeJoin", 0)
        + ops.get("ShuffledHashJoin", 0)
        + ops.get("BroadcastHashJoin", 0)
        >= 1
    ), ops


def test_orc_roundtrip_prunes_columns(spark, registry):
    """The ORC scan must read only the 3 projected columns."""
    df = registry["s_orc_roundtrip"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "p_partkey", "p_name", "p_retailprice"
    }, (m and m.group(1))


def test_apply_bpe_is_map_only(spark):
    """apply_bpe = explode + chained JVM replaces: zero Exchange, zero
    joins, no Python in the plan."""
    from dataengineeringworkshop_spark.llmops.bpe import apply_bpe

    docs = spark.createDataFrame([("low lower newest",)], "text STRING")
    out = apply_bpe(docs, [("l", "o"), ("lo", "w"), ("e", "s")], "text")
    plan = _plan(out)
    ops = _ops(plan)
    assert ops.get("Exchange", 0) == 0, ops
    assert not any("Join" in k for k in ops), ops
    # no Python-UDF eval operators (the local createDataFrame scan node
    # itself may mention python — that's the test input, not the op)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_bpe_token_ids_is_map_only(spark):
    """Token-id emission (apply_bpe + literal vocab-map lookup) must
    stay a pure map like apply_bpe itself: the vocabulary is an in-plan
    literal map, so NO Exchange, no joins, no Python appears."""
    from dataengineeringworkshop_spark.llmops.bpe import bpe_token_ids

    docs = spark.createDataFrame([(1, "low lower newest")], "doc_id INT, text STRING")
    out = bpe_token_ids(docs, [("l", "o"), ("lo", "w"), ("e", "s")], "text")
    plan = _plan(out)
    ops = _ops(plan)
    assert ops.get("Exchange", 0) == 0, ops
    assert not any("Join" in k for k in ops), ops
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_funnel_has_no_cartesian(spark, registry):
    """The funnel chains user_id equi-joins — no nested-loop fallback
    from the scalar-subquery counts."""
    df = registry["e_funnel_conversion"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) <= 3, ops  # scalar count joins only


def test_mv_incremental_single_scan_per_branch(spark, registry):
    """MV maintenance reads orders twice (base + delta filters) but must
    not shuffle more than the two partial aggs + final merge need."""
    df = registry["mv_incremental_agg"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops.get("Exchange", 0) <= 3, ops


def test_range_sql_script_is_equi_join(spark, registry):
    """The SQL-text banded range join must plan as an equi join on
    (user_id, band) — no nested loop, no cartesian."""
    df = registry["tj_range_sql_script"].fn(spark, SF_SMOKE)
    ops = _ops(_plan(df))
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops
    assert ops.get("CartesianProduct", 0) == 0, ops


def test_session_paths_topk_is_take_ordered(spark, registry):
    """The global top-20 paths must compile to TakeOrderedAndProject
    (per-partition heaps), never a single-partition global sort."""
    plan = _plan(registry["e_session_topk_paths"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_shard_manifest_single_window(spark, registry):
    """Packing + shard rollup share one source-partitioned window —
    exactly one Window operator in the plan."""
    ops = _ops(_plan(registry["cp_shard_manifest"].fn(spark, SF_SMOKE)))
    assert ops.get("Window", 0) == 1, ops


def test_forward_fill_reuses_window_partitioning(spark, registry):
    """The per-user fill window and the per-user reduction share ONE
    shuffle: groupBy(user_id) must reuse the window's hash
    partitioning, so exactly one Exchange appears in the plan."""
    ops = _ops(_plan(registry["ts_forward_fill"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) == 1, ops
    assert ops.get("Window", 0) == 1, ops


def test_weighted_sample_single_exchange_two_windows(spark, registry):
    """Cumulative weight and stratum total share the source partition:
    one Exchange feeds both Window passes, the threshold test is a
    map-side Filter (no join, no second shuffle)."""
    ops = _ops(_plan(registry["cp_weighted_sample"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) == 1, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops


def test_percentile_gate_single_exchange(spark, registry):
    """Score → per-source percent_rank → per-source report rides one
    source-hash Exchange end to end."""
    ops = _ops(_plan(registry["cp_quality_percentile_gate"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) == 1, ops


def test_histogram_is_partial_agg_single_exchange(spark, registry):
    """Bin id is a map-side expression; the histogram is partial+final
    HashAggregate around a single tiny Exchange — the one-scan shape
    that survives 100 TB."""
    ops = _ops(_plan(registry["a15_value_histogram"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) == 1, ops
    assert ops.get("HashAggregate", 0) == 2, ops


def test_tfidf_topk_uses_window_group_limit(spark, registry):
    """The per-doc top-3 must compile with WindowGroupLimit (rank
    pushdown: per-partition heaps before the window sort) and the df
    side must join hash/broadcast — the only nested-loop allowed is
    the 1-row corpus-count broadcast."""
    plan = _plan(registry["t_tfidf_topk"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert "WindowGroupLimit" in plan, plan[:2000]
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) <= 1, ops


def test_zorder_layout_is_map_side_plus_tiny_aggs(spark, registry):
    """Morton coding is a map-side integer expression: the plan may
    contain only the 1-row bounds aggregate and the 16-group report
    aggregate (2 Exchanges), with the bounds row broadcast back."""
    ops = _ops(_plan(registry["pp_zorder_layout"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) <= 2, ops
    assert ops.get("SortMergeJoin", 0) == 0, ops


def test_mad_outliers_broadcasts_median_stats(spark, registry):
    """The median/MAD stats table is |event types| rows — it must come
    back onto the scan as a broadcast join, never sort-merge.  (Since
    the round-9 materialization the final statement joins ONE combined
    stats artifact; the median stage is a separate build.)"""
    ops = _ops(_plan(registry["e_mad_outliers"].fn(spark, SF_SMOKE)))
    assert ops.get("SortMergeJoin", 0) == 0, ops
    assert ops.get("BroadcastHashJoin", 0) >= 1, ops


def test_spine_gapfill_generates_from_scalar_bounds(spark, registry):
    """The spine derives from a 1-row bounds aggregate (Generate over a
    scalar sequence), NOT from exploding raw rows: exactly one Generate,
    and the raw scan count stays bounded (hourly rollup + types)."""
    ops = _ops(_plan(registry["ts_spine_gapfill"].fn(spark, SF_SMOKE)))
    assert ops.get("Generate", 0) == 1, ops
    assert ops.get("CartesianProduct", 0) == 0, ops


def test_array_hof_breadth_is_map_only(spark, registry):
    """Every higher-order array function is a per-row JVM lambda: the
    plan must be scan+project with zero exchanges and no Python eval."""
    plan = _plan(registry["rb_array_hof_breadth"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Exchange", 0) == 0, ops
    assert "Python" not in plan, plan[:1500]


def test_count_min_sketch_single_scan_build(spark, registry):
    """All four hash rows ride ONE posexplode of one scan (pinned:
    exactly one Generate); probe keys come from TakeOrderedAndProject
    and the 1024-cell sketch joins back as a broadcast."""
    plan = _plan(registry["a18_count_min_sketch"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Generate", 0) == 1, ops
    assert "TakeOrderedAndProject" in plan
    assert ops.get("SortMergeJoin", 0) == 0, ops


def test_exact_median_pass2_is_filtered_sliver(spark, registry):
    """The returned (pass-2) plan must be a filtered scan + one window
    over the bin sliver — a single Exchange, never a full-table sort
    feeding percentile."""
    ops = _ops(_plan(registry["a17_exact_median_twopass"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) <= 2, ops
    assert ops.get("Window", 0) == 1, ops


def test_interval_overlap_is_banded_equi_join(spark, registry):
    """The interval-overlap join must gate candidates through the
    band-equality shuffle — never a nested loop or cartesian — and the
    session/incident windows each keep their own single partitioning."""
    ops = _ops(_plan(registry["tj_interval_overlap"].fn(spark, SF_SMOKE)))
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops
    assert ops.get("CartesianProduct", 0) == 0, ops


def test_interval_overlap_incident_windows_are_banded(spark, registry):
    """No PER-EVENT window may run on a single partition: the incident
    derivation must local-sessionize per time band (partitioned window
    over the raw error events), and the O(#bands) boundary merge must
    never see event-scale data.  r14 form: the boundary fold runs
    DRIVER-side (metadata-scale, capped), so the default plan contains
    NO SinglePartition exchange at all — the strongest version of the
    r12 pin.  The distributed fallback above the cap keeps the original
    summary-only SinglePartition shape; that path is pinned separately
    in test_global_session_fold_input_is_boundary_subset."""
    plan = _plan(registry["tj_interval_overlap"].fn(spark, SF_SMOKE))
    # the banded local-sessionize must be present: per-event rows shuffle
    # by hashpartitioning(__band), i.e. the raw error events never feed a
    # single-partition window
    assert re.search(r"hashpartitioning\(__band", plan), plan
    # the driver fold returns the merged chains / numbering offsets as
    # local relations, so no single-partition exchange survives anywhere
    assert "SinglePartition" not in plan, (
        "unexpected SinglePartition exchange (driver band fold should "
        "have removed the summary merge exchange):\n" + plan
    )
    assert re.search(r"LocalTableScan|ExistingRDD", plan), plan


def test_global_session_fold_input_is_boundary_subset(spark):
    """r12 (VERDICT r11 #4), r14 form: the O(#bands) boundary merge must
    never see event-scale data.  Round 14 folds the band summary
    driver-side (metadata-scale, capped, exact integer arithmetic) and
    returns the merged chains + numbering offsets as local relations —
    the plan then contains NO single-partition exchange at all; above
    the cap the original distributed fold runs and its pins hold."""
    from pyspark.sql import functions as F

    import dataengineeringworkshop_spark.operators.temporal as temporal

    df = spark.range(5000).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.col("id") * 3).alias("ts"),
    )

    def build():
        return temporal.global_session_intervals(
            df, ts="ts", gap_seconds=60, band_seconds=3600
        )

    # default: driver fold — merged/offsets are local relations, and no
    # SinglePartition exchange exists anywhere in the plan
    plan = _plan(build())
    assert re.search(r"LocalTableScan|ExistingRDD", plan), plan
    assert re.search(r"hashpartitioning\(__band", plan), plan
    assert "SinglePartition" not in plan, plan

    # fallback above the cap: the distributed boundary fold, with the
    # original pins — boundary rows explode from the band summary and no
    # SinglePartition exchange carries per-event attributes
    old_cap = temporal.BANDS_DRIVER_CAP
    temporal.BANDS_DRIVER_CAP = 0
    try:
        plan = _plan(build())
    finally:
        temporal.BANDS_DRIVER_CAP = old_cap
    assert "Generate" in plan and re.search(r"explode", plan, re.I), plan
    assert re.search(r"hashpartitioning\(__band", plan), plan
    blocks = re.split(r"\n\n", plan)
    single = [
        b for b in blocks
        if "Exchange" in b and "SinglePartition" in b and "Input" in b
    ]
    assert single, "expected the bounded boundary-merge exchange:\n" + plan
    for b in single:
        inp = next(ln for ln in b.split("\n") if ln.startswith("Input"))
        assert "event_id" not in inp and "__tus" not in inp, (
            "per-event attributes crossing a SinglePartition exchange:\n" + b
        )


def test_global_session_intervals_matches_single_pass(spark):
    """Ground truth: the two-level banded sessionize must be
    row-identical (ids included) to the naive single-partition
    sessionize, across band-edge merges, multi-band chains, skipped
    bands, and exact-gap boundaries."""
    from pyspark.sql import functions as F

    from dataengineeringworkshop_spark.operators.temporal import (
        global_session_intervals,
        sessionize,
    )

    rows = []
    eid = 0
    # incident A: chain crossing 3 one-hour bands via <=gap steps
    for s in range(0, 3 * 3600, 500):
        rows.append((eid, s)); eid += 1
    # incident B: starts 601 s after A ends (gap 600 is the merge limit,
    # 601 splits)
    b0 = rows[-1][1] + 601
    for s in range(b0, b0 + 1200, 600):  # exact-gap internal steps merge
        rows.append((eid, s)); eid += 1
    # incident C: after a fully EMPTY band (tests band-skip logic)
    c0 = rows[-1][1] + 2 * 3600
    rows.append((eid, c0)); eid += 1
    df = spark.createDataFrame(
        [(e, s) for e, s in rows], "event_id long, secs long"
    ).withColumn("ts", F.timestamp_seconds("secs"))

    got = global_session_intervals(
        df, ts="ts", gap_seconds=600, order_tiebreak="event_id",
        band_seconds=3600,
    )
    naive = (
        sessionize(
            df.withColumn("__g", F.lit(1)), key="__g", ts="ts",
            gap_seconds=600, order_tiebreak="event_id",
        )
        .groupBy("session_id")
        .agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("end_us"),
        )
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, naive.collect()))
    assert a == b, (a, b)
    assert len(a) == 3  # A, B, C


def test_rollup_cascade_scans_raw_once(spark, registry):
    """The daily grain must derive from hourly partials: exactly one
    scan of the raw events file in the whole plan."""
    ops = _ops(_plan(registry["ts_rollup_cascade"].fn(spark, SF_SMOKE)))
    assert ops.get("Scan", 0) == 1, ops


def test_ewma_lags_share_one_window_exchange(spark, registry):
    """All 16 decay lags must ride ONE user_id sort/partitioning —
    16 separate window exchanges would be a 16× shuffle regression."""
    ops = _ops(_plan(registry["ts_ewma_dyadic"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) <= 3, ops


def test_collocation_bigrams_via_lag_not_self_join(spark, registry):
    """Bigrams come from a lag window over the positional explode, not
    a positional self-join (which would hash-shuffle the token stream
    against itself); the unigram joins stay hash/broadcast and the
    global cut is TakeOrderedAndProject.  The CTE re-executes per
    reference (3 pruned columnar scans — the materialize-once upgrade
    at corpus scale is the minhash signature-table pattern)."""
    plan = _plan(registry["t_collocation_dice"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Generate", 0) <= 3, ops
    assert ops.get("SortMergeJoin", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops
    assert "TakeOrderedAndProject" in plan


def test_incremental_join_never_rescans_base_join(spark, registry):
    """The bilinear delta plan contains the three delta joins plus the
    stored-partials branch — but no join may be a nested loop, and the
    per-branch aggregates must partial-reduce before their shuffle."""
    ops = _ops(_plan(registry["mv_incremental_join"].fn(spark, SF_SMOKE)))
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops
    assert ops.get("CartesianProduct", 0) == 0, ops


def test_bloom_prefilter_semi_broadcasts_bucket_set(spark, registry):
    """The j9 prefilter must be a BROADCAST semi join on the bounded
    bucket set (never a shuffled join for the prefilter step), and the
    probe side must not cartesian against anything."""
    plan = _plan(registry["j9_bloom_prefilter_semi"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops


def test_map_funcs_breadth_single_aggregation_exchange(spark, registry):
    """All map interrogations are row-local expressions on the grouped
    profile: one user_id exchange for the two aggregates, no join, no
    extra shuffle after the map is built."""
    ops = _ops(_plan(registry["rb_map_funcs_breadth"].fn(spark, SF_SMOKE)))
    # the REPARTITION(user_id) hint is the only exchange: both
    # aggregations' clustered distributions are satisfied by it
    assert ops.get("Exchange", 0) <= 1, ops
    assert ops.get("SortMergeJoin", 0) == 0, ops


def test_triangle_count_is_equi_join_only(spark, registry):
    """Ordered triangle enumeration must plan as equi joins (wedge +
    closing edge) — any nested-loop/cartesian means the ordering
    predicate fell out of the join keys."""
    ops = _ops(_plan(registry["g_triangle_count"].fn(spark, SF_SMOKE)))
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops


def test_seasonal_naive_two_shuffles(spark, registry):
    """Hourly partial-agg, the lag-24 self equi-join, and the per-type
    reduce — nothing else: no window over raw events, no sort."""
    ops = _ops(_plan(registry["ts_seasonal_naive_forecast"].fn(spark, SF_SMOKE)))
    assert ops.get("Window", 0) == 0, ops
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("Exchange", 0) <= 4, ops


def test_payload_dedup_shuffles_digests_not_payloads(spark, registry):
    """The dedup aggregate must partial-reduce before its exchange
    (map-side combine: payload bytes never cross the wire, digests do)
    — formatted plans show this as two HashAggregates around one
    Exchange whose input carries the sha columns only."""
    plan = _plan(registry["mm_payload_dedup"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    # exactly the two-phase exact-count-distinct shape: partial distinct
    # on (prefix_sha, full_sha) + final per-prefix reduce = 2 exchanges
    assert ops.get("Exchange", 0) <= 2, ops
    assert ops.get("HashAggregate", 0) >= 2, ops
    blocks = [b for b in plan.split("\n\n") if b.startswith("(") and "Exchange" in b.split("\n")[0]]
    for b in blocks:
        inp = next((ln for ln in b.split("\n") if ln.startswith("Input")), "")
        assert "content" not in inp, "raw payload bytes crossing the shuffle:\n" + b


def test_m4_downsample_one_exchange_four_sorts(spark, registry):
    """All four M4 rank windows must share one (event_type, bkt) hash
    partitioning — one exchange, in-partition re-sorts only."""
    ops = _ops(_plan(registry["ts_m4_downsample"].fn(spark, SF_SMOKE)))
    assert ops.get("Exchange", 0) == 1, ops
    assert ops.get("CartesianProduct", 0) == 0, ops


def test_minmax_repair_joins_broadcast(spark, registry):
    """The repair-group list and the untouched-group anti join are both
    broadcast-driven (bounded by |groups|); the survivors rescan must
    not sort-merge against anything."""
    ops = _ops(_plan(registry["mv_incremental_minmax"].fn(spark, SF_SMOKE)))
    assert ops.get("SortMergeJoin", 0) == 0, ops
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastHashJoin", 0) >= 2, ops


def test_rolling_zscore_single_window_exchange(spark, registry):
    """count/sum/sumsq ride ONE trailing frame over one (user_id)
    partitioning — three moments must not plan three exchanges."""
    ops = _ops(_plan(registry["e_rolling_zscore_anomaly"].fn(spark, SF_SMOKE)))
    assert ops.get("Window", 0) == 1, ops
    assert ops.get("Exchange", 0) <= 1, ops


def test_setops_breadth_no_nested_loops(spark, registry):
    """Every set-op branch (union/intersectAll/exceptAll and friends)
    must compile to hash-based shapes over the one shared orders scan —
    a nested-loop or cartesian anywhere means a multiset compare fell
    out of the equi-key path.  The orders scan must also be pruned to
    the filter columns + o_custkey, never the full table."""
    plan = _plan(registry["rb_setops_breadth"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("CartesianProduct", 0) == 0, ops
    assert ops.get("BroadcastNestedLoopJoin", 0) == 0, ops
    for m in re.finditer(r"ReadSchema: struct<(o_[^>]*)>", plan):
        assert len(m.group(1).split(",")) <= 3, m.group(1)


def test_weighted_median_window_runs_over_collapsed_table(spark, registry):
    """a21's cumulative-weight window must run over the partial-agg
    (group, price) collapse, never the raw lineitem rows: plan order is
    HashAggregate pair -> one window sort -> final agg, with no join
    and no extra exchange beyond the agg + window pair."""
    plan = _plan(registry["a21_weighted_median"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("HashAggregate", 0) >= 2, ops  # partial + final collapse
    assert ops.get("SortMergeJoin", 0) == 0 and ops.get("BroadcastHashJoin", 0) == 0, ops
    assert ops.get("Exchange", 0) <= 3, ops


def test_value_range_window_no_self_join(spark, registry):
    """w13's price +/- 1000 neighborhood must be a RANGE frame (one
    exchange on the partition key, bounded sliding frame), never the
    naive per-row self-join a +/-delta predicate invites."""
    plan = _plan(registry["w13_value_range_window"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Window", 0) == 1, ops
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops.get(j, 0) == 0, (j, ops)
    assert ops.get("Exchange", 0) <= 1, ops
    # the price filter reaches the scan
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_totalprice" in plan, plan


def test_hll_bounds_single_aggregation_pass(spark, registry):
    """a20 computes exact distinct + the HLL sketch in one grouped
    aggregation pipeline — no join between an exact branch and a sketch
    branch, no more exchanges than the distinct-agg's two-phase shape."""
    plan = _plan(registry["a20_hll_distinct_bounds"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("SortMergeJoin", 0) == 0 and ops.get("BroadcastHashJoin", 0) == 0, ops
    assert ops.get("Exchange", 0) <= 2, ops


def test_bigram_lm_scores_from_materialized_model(spark, registry):
    """cp_bigram_lm_score's scoring statement must read the materialized
    bigram artifact, not rebuild it per consumer: exactly ONE raw-corpus
    explode remains in the returned plan (the |V| pass) — the original
    CTE-inlined form ran four (measured: 4 Generates, 0 ReusedExchange)."""
    plan = _plan(registry["cp_bigram_lm_score"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Generate", 0) == 1, ops
    assert plan.count("documents.parquet") == 1, plan.count("documents.parquet")


def test_bm25_scores_from_materialized_postings(spark, registry):
    """cp_bm25_search's scoring statement must read the materialized
    posting + doc-length artifacts: zero raw documents scans and zero
    Generates remain (the CTE-inlined form ran the corpus explode twice
    and the length scan twice — measured 4 documents scans)."""
    plan = _plan(registry["cp_bm25_search"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Generate", 0) == 0, ops
    assert plan.count("documents.parquet") == 0, plan.count("documents.parquet")


def test_tfidf_explodes_corpus_once(spark, registry):
    """t_tfidf_topk's scoring statement reads the materialized
    (doc, term, tf) artifact: zero Generates remain (df collapses FROM
    tf — no second explode, no COUNT(DISTINCT)); the only raw documents
    scan left is the 1-row corpus count."""
    plan = _plan(registry["t_tfidf_topk"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops.get("Generate", 0) == 0, ops
    assert plan.count("documents.parquet") <= 1, plan.count("documents.parquet")


def test_seasonal_naive_aggregates_raw_events_once(spark, registry):
    """ts_seasonal_naive_forecast's backtest statement self-joins the
    materialized hourly table — zero raw events scans remain (the
    CTE-inlined form ran the corpus partial-agg once per join side)."""
    plan = _plan(registry["ts_seasonal_naive_forecast"].fn(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 0, plan.count("events.parquet")


def test_profile_stats_single_scan(spark, registry):
    """prof_column_stats computes every column's profile in ONE
    aggregation over ONE scan (multi-distinct Expand + stack) — the
    UNION ALL form re-scanned lineitem once per column (5 scans,
    round-9 scan audit)."""
    plan = _plan(registry["prof_column_stats"].fn(spark, SF_SMOKE))
    assert plan.count("lineitem.parquet") == 1, plan.count("lineitem.parquet")
    ops = _ops(plan)
    assert ops.get("Union", 0) == 0, ops


def test_rake_scores_from_materialized_candidates(spark, registry):
    """t_rake_keywords' scoring statement reads the materialized
    candidate-word table: zero raw documents scans and zero Generates
    remain (the CTE-inlined form re-exploded the corpus four times)."""
    plan = _plan(registry["t_rake_keywords"].fn(spark, SF_SMOKE))
    assert plan.count("documents.parquet") == 0, plan.count("documents.parquet")
    assert _ops(plan).get("Generate", 0) == 0


def test_mixture_queries_read_token_ledger(spark, registry):
    """cp_mix_temperature / cp_source_mix read the materialized
    doc_sizes token ledger — zero raw documents scans remain (the
    CTE-inlined forms re-tokenized the corpus 4x / 3x)."""
    for name in ("cp_mix_temperature", "cp_source_mix"):
        plan = _plan(registry[name].fn(spark, SF_SMOKE))
        assert plan.count("documents.parquet") == 0, (
            name, plan.count("documents.parquet"))
        assert _ops(plan).get("Generate", 0) == 0, name


def test_mad_outlier_statement_single_event_scan(spark, registry):
    """e_mad_outliers' final statement is ONE events scan against the
    broadcast median/MAD artifacts (exact MAD needs 3 passes total —
    the two tiny stage builds happen at materialize time; the
    CTE-inlined form ran FOUR)."""
    plan = _plan(registry["e_mad_outliers"].fn(spark, SF_SMOKE))
    assert plan.count("events.parquet") == 1, plan.count("events.parquet")


def test_embed_quantize_is_pure_map(spark, registry):
    """sim_embed_quantize is ONE scan with ZERO exchanges: min/max,
    coding, and the DECIMAL SSE fold are all array HOFs inside one
    projection (the explode/groupBy/join form scanned embeddings twice
    and shuffled dim-times rows)."""
    plan = _plan(registry["sim_embed_quantize"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("embeddings.parquet") == 1, plan.count("embeddings.parquet")
    assert ops.get("Exchange", 0) == 0, ops
    assert ops.get("Generate", 0) == 0, ops


def test_fuzzy_match_joins_materialized_key_index(spark, registry):
    """t_fuzzy_match_levenshtein self-joins the materialized FastSS
    deletion-key index: zero raw supplier scans remain (the CTE form
    re-built the neighborhood on all four scan sides)."""
    plan = _plan(registry["t_fuzzy_match_levenshtein"].fn(spark, SF_SMOKE))
    assert plan.count("supplier.parquet") == 0, plan.count("supplier.parquet")


def test_ewma_single_scan_single_sort(spark, registry):
    """ts_ewma_dyadic: the per-user event count rides the same window
    partition as the decay — one events scan, no join back (the
    correlated COUNT subquery form scanned events twice)."""
    plan = _plan(registry["ts_ewma_dyadic"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("events.parquet") == 1, plan.count("events.parquet")
    for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert ops.get(j, 0) == 0, (j, ops)


def test_full_registry_scan_audit_is_clean(spark):
    """Every >1-scan-per-table plan in the registry is either fixed or
    in scan_audit.CLEARED with a reason; a NEW multi-scan plan (the
    CTE-recompute defect class) or a stale clearance fails.  Builds all
    registry plans — slow, but it is the one guard that keeps the
    defect class dead for every FUTURE query too."""
    from dataengineeringworkshop_spark.plans.scan_audit import CLEARED, audit_registry

    flagged = audit_registry(spark, SF_SMOKE)
    new = sorted(set(flagged) - set(CLEARED))
    stale = sorted(set(CLEARED) - set(flagged))
    assert not new, f"NEW multi-scan plans needing audit: {new}"
    assert not stale, f"stale clearances: {stale}"


def test_left_join_lateral_decorrelated_with_partial_topk(spark, registry):
    """j10_left_join_lateral must stay DECORRELATED: the per-customer
    top-2 runs as a WindowGroupLimit pair with the Partial stage BEFORE
    the exchange (each map task forwards at most 2 orders per customer),
    the outer join survives as a single LeftOuter hash join, and each
    table is scanned exactly once — never a re-executed subquery per
    outer row."""
    plan = _plan(registry["j10_left_join_lateral"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("customer.parquet") == 1, plan.count("customer.parquet")
    assert plan.count("orders.parquet") == 1, plan.count("orders.parquet")
    assert "WindowGroupLimit" in ops, ops
    assert ", Partial" in plan, "map-side partial top-k missing"
    assert "LeftOuter" in plan, "outer lateral must stay an outer join"


# ---- round-10 continuation rows: plan pins for the new SQL-surface
# queries (listagg, try_*, GROUP BY ALL, SQL UDF + session variables) ----


def test_group_by_all_compiles_to_partial_agg(spark, registry):
    """GROUP BY ALL must be pure resolution sugar: the plan is the
    explicit-column shape — partial + final HashAggregate around one
    hash exchange (plus the ORDER BY ALL range exchange), no join."""
    ops = _ops(_plan(registry["rb_group_by_all_breadth"].fn(spark, SF_SMOKE)))
    assert ops["HashAggregate"] == 2, ops
    assert ops["Exchange"] == 2, ops  # agg hash + global-sort range
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops[j] == 0, (j, ops)


def test_try_arith_is_pure_map_single_codegen(spark, registry):
    """The try_* family must stay a map-only projection: one scan, one
    Project inside whole-stage codegen, zero exchanges — NULL-on-error
    semantics cost nothing at 100 TB."""
    plan = _plan(registry["f20_try_arith_breadth"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["Exchange"] == 0 and ops["Project"] == 1, ops
    assert "codegen id" in plan  # the projection is whole-stage compiled
    assert "EvalPython" not in plan


def test_sql_udf_inlines_and_pushes_variable_threshold(spark, registry):
    """The SQL-body UDF and the session-variable threshold must be
    expression-substituted by Catalyst, NOT evaluated as a black box:
    the variable's value appears as a pushed parquet filter and no
    Python evaluation node exists anywhere in the plan."""
    plan = _plan(registry["ddl_sql_udf_variables"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert re.search(
        r"PushedFilters: \[.*GreaterThanOrEqual\(o_totalprice,5000\.0\)", plan
    ), plan[:1200]
    assert "EvalPython" not in plan
    assert ops["HashAggregate"] == 2, ops  # partial + final


def test_listagg_distinct_collapses_before_string_agg(spark, registry):
    """a22's safety shape: the DISTINCT collapse (partial + final
    HashAggregate) runs BEFORE the listagg ObjectHashAggregate pair, so
    at most |distinct domain| strings per group ever cross the wire —
    and the NULL guard is pushed to the scan."""
    plan = _plan(registry["a22_listagg_distinct"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["HashAggregate"] >= 2, ops  # distinct collapse partial+final
    assert ops["ObjectHashAggregate"] >= 2, ops  # listagg partial+final
    assert ops["Exchange"] == 2, ops  # one per aggregate, none extra
    assert re.search(r"PushedFilters: \[.*IsNotNull\(o_orderpriority\)", plan)


def test_xml_family_is_jvm_side_pure_map(spark, registry):
    """from_xml/xpath must evaluate JVM-side (post spark-xml merge):
    no Python eval node, no exchange — one scan, one projection."""
    plan = _plan(registry["f21_xml_funcs_breadth"].fn(spark, SF_SMOKE))
    assert "EvalPython" not in plan
    assert _ops(plan)["Exchange"] == 0, _ops(plan)


def test_limit_offset_compiles_to_take_ordered(spark, registry):
    """LIMIT 20 OFFSET 40 must run as TakeOrderedAndProject(60) with
    per-partition partial top-k — never a full global sort."""
    plan = _plan(registry["o6_limit_offset_page"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert ops["TakeOrderedAndProject"] == 1, ops
    assert ops["Sort"] == 0, ops  # no global sort node


def test_timezone_family_is_pure_map(spark, registry):
    """from_utc_timestamp/convert_timezone are per-row offset lookups:
    one scan, zero exchanges, no Python eval."""
    plan = _plan(registry["f22_timezone_convert_breadth"].fn(spark, SF_SMOKE))
    assert "EvalPython" not in plan
    assert _ops(plan)["Exchange"] == 0, _ops(plan)


# ---- round-11 rows: plan pins for the new surface (full-sync MERGE,
# deterministic hash-ticket sampling) ----


def test_hash_sample_single_scan_map_only(spark, registry):
    """cp_hash_sample_deterministic must be ONE corpus scan feeding a
    stack generator + map-side ticket filter: zero exchanges, zero
    joins, no Python eval — the 100 TB sampling path is pure scan."""
    plan = _plan(registry["cp_hash_sample_deterministic"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("documents.parquet") == 1, plan.count("documents.parquet")
    assert ops["Exchange"] == 0, ops
    assert ops["Generate"] == 1, ops  # the stack() generator
    assert "EvalPython" not in plan
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops[j] == 0, (j, ops)


def test_merge_full_sync_result_single_snapshot_scan(spark, registry):
    """vt_merge_full_sync's returned frame reads ONE materialized
    snapshot — the two merges happened at write time, each as one
    full-outer key join (pinned semantically in
    tests/test_merge_full_sync.py); the read side must not re-join or
    re-scan the base table."""
    plan = _plan(registry["vt_merge_full_sync"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("orders.parquet") == 0, "base table must not be re-read"
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops[j] == 0, (j, ops)


def test_merge_schema_evolution_result_single_snapshot_scan(spark, registry):
    """vt_merge_schema_evolution reads ONE materialized snapshot with
    the evolved schema; no base-table re-scan, no join on the read."""
    plan = _plan(registry["vt_merge_schema_evolution"].fn(spark, SF_SMOKE))
    ops = _ops(plan)
    assert plan.count("orders.parquet") == 0
    for j in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
              "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert ops[j] == 0, (j, ops)


def test_dv_read_is_broadcast_anti_join_no_data_shuffle(spark, tmp_path):
    """r12: a deletion-vector read must plan as scan -> broadcast
    LeftAnti against the KB-scale sidecar — the 100 TB data side never
    shuffles, and the scan stays a single pass.  A shuffled anti-join
    here would turn every read of a DV-bearing table into a full
    exchange of the fact data."""
    from dataengineeringworkshop_spark.tables.versioned import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "dvplan"))
    t.write(spark.range(50000).selectExpr("id AS k", "id AS v").repartition(4))
    t.delete("k % 4999 = 1", mode="mor")
    plan = _plan(t.read())
    ops = _ops(plan)
    assert ops.get("BroadcastHashJoin", 0) == 1, ops
    assert "LeftAnti" in plan, plan
    assert ops.get("Exchange", 0) <= 1, ops  # the broadcast side only
    assert re.search(r"Exchange hashpartitioning", plan) is None, plan
    # no-DV table: zero join, zero overhead
    t2 = VersionedTable(spark, str(tmp_path / "nodv"))
    t2.write(spark.range(100).selectExpr("id AS k"))
    p2 = _plan(t2.read())
    assert _ops(p2).get("BroadcastHashJoin", 0) == 0, p2
