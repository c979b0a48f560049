"""The driver records correctness for a bounded prefix of the registry —
pin the prefix composition so a stray import reorder can't silently waste
the evidence budget again (round-2 postmortem: plans/breadth.py shipped
unimported)."""

from __future__ import annotations

from dataengineeringworkshop_spark.plans.registry import DRIVER_PREFIX, _PRIORITY, load_all


def test_priority_names_all_registered():
    reg = load_all()
    missing = [n for n in _PRIORITY if n not in reg]
    assert not missing, f"_PRIORITY names not in registry: {missing}"


def test_prefix_is_exactly_priority():
    reg = load_all()
    assert len(_PRIORITY) == DRIVER_PREFIX
    assert list(reg)[: len(_PRIORITY)] == list(_PRIORITY)


def test_prefix_covers_every_family():
    """Every SURVEY §2 family + extension family has a row in the prefix."""
    reg = load_all()
    prefix = list(reg)[:DRIVER_PREFIX]
    families = {
        "P": "rb_projection_breadth",
        "J/A": "rb_join_agg_breadth",
        "W/O": "rb_window_order_breadth",
        "C": "rb_cte_subquery_breadth",
        "F-string": "rb_string_funcs_breadth",
        "F-time": "rb_time_funcs_breadth",
        "F-json": "rb_json_funcs_breadth",
        "G": "rb_explode_breadth",
        "text": "rb_text_analysis_breadth",
        "D-merge": "vt_merge_upsert",
        "D-timetravel": "vt_time_travel",
        "D-history": "vt_history_ops",
        "D-optimize": "vt_optimize_roundtrip",
        "S-ddl": "ddl_ctas_lifecycle",
        "S-csv": "s1_csv_roundtrip",
        "S-json": "s2_json_roundtrip",
        "E-expect": "ws_expectation_metrics",
        "E-drop": "ws_expectation_drop",
        "pipeline": "pl_dag_gold",
        "ST-window": "st_windowed_event_counts",
        "ST-stateful": "st_stateful_user_totals",
        "dedup-minhash": "mh_minhash_lsh_dedup",
        "dedup-exact": "d_exact_dedup_keep_first",
        "dedup-jaccard": "d_ngram_jaccard_pairs",
        "dedup-simhash": "sh_simhash_fingerprints",
        "sim-topk": "sim_cosine_topk",
        "ann-ivf": "ann_ivf_topk",
        "ann-lsh": "ann_lsh_topk",
        "semdedup": "sd_semantic_dedup",
        "multimodal": "mm_media_metadata",
        "asof": "tj_asof_click_view",
        "corpus": "cp_corpus_pipeline",
        "bm25": "cp_bm25_search",
    }
    absent = {fam: q for fam, q in families.items() if q not in prefix}
    assert not absent, f"families missing from driver prefix: {absent}"


def test_oracle_density_in_prefix():
    """Most prefix rows should carry a real DuckDB oracle (strong check);
    only genuinely non-SQL-expressible ops may be rows-only."""
    reg = load_all()
    prefix = list(reg)[:DRIVER_PREFIX]
    rows_only = [n for n in prefix if reg[n].oracle is None]
    assert len(rows_only) <= 8, f"too many rows-only rows in prefix: {rows_only}"
