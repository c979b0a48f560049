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


def _past_green() -> set[str]:
    """Names with full rows+schema+hash evidence in a committed
    CORRECTNESS_r*.json — the driver's green files persist round over
    round, so past evidence keeps counting for family coverage."""
    import glob
    import json
    import os

    root = os.path.join(os.path.dirname(__file__), "..")
    green: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        for name, rec in json.load(open(path)).items():
            if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
                green.add(name)
    return green


def test_every_family_has_prefix_or_past_green_evidence():
    """Every SURVEY §2 family + extension family must have a row in the
    CURRENT prefix or green hash evidence from a prior round — rotating
    the evidence budget must never orphan a family."""
    reg = load_all()
    covered = set(list(reg)[:DRIVER_PREFIX]) | _past_green()
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
        "D-sql-dml": "vt_sql_dml_verbatim",
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
        "dedup-simhash": "sh_simhash_dup_pairs",
        "sim-topk": "sim_cosine_topk",
        "ann-ivf": "ann_ivf_fullprobe_exact",
        "semdedup": "sd_semantic_dedup",
        "multimodal": "mm_media_metadata",
        "asof": "tj_asof_click_view",
        "corpus": "cp_corpus_pipeline",
        "bm25": "cp_bm25_search",
        "analytics": "e_funnel_conversion",
        "mv-incremental": "mv_incremental_agg",
        "bpe-apply": "t_bpe_token_ids",
    }
    absent = {fam: q for fam, q in families.items() if q not in covered}
    assert not absent, f"families with neither prefix slot nor past evidence: {absent}"


def test_oracle_density_in_prefix():
    """Every prefix row must carry a real DuckDB oracle — rows-only ops
    (raw fingerprints, approximate ANN) live AFTER the evidence window."""
    reg = load_all()
    prefix = list(reg)[:DRIVER_PREFIX]
    rows_only = [n for n in prefix if reg[n].oracle is None]
    assert not rows_only, f"rows-only rows in prefix: {rows_only}"


def test_prefix_outputs_are_driver_hashable(spark):
    """Round-6 lesson, made permanent: the external driver's pandas
    canonicalizer crashes on array/map/struct cells (sort_values →
    factorize → unhashable type), so NO query in the evidence prefix
    may return a complex-typed column.  Only the schema is ASSERTED,
    but building it EXECUTES each prefix fn (several are eager:
    streaming memory-sink runs, BPE training, CTAS lifecycles) — this
    is effectively a mini driver run at SF_SMOKE; keep it out of fast
    suites."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from tests.conftest import SF_SMOKE

    reg = load_all()
    bad = {}
    for name in list(reg)[:DRIVER_PREFIX]:
        df = reg[name].fn(spark, SF_SMOKE)
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"driver-unhashable columns in prefix outputs: {bad}"


def test_driver_sim_extra_names_registered_and_unique():
    """driver_sim's EXTRA spot-check list is the holding pen for every
    rotated-out and not-yet-rotated-in query — a typo'd or stale name
    there silently skips its regression check (driver_sim ignores
    unknown names by design).  Pin: every EXTRA name resolves in the
    registry, no duplicates, and no EXTRA name wastes a slot by also
    sitting in the prefix."""
    import os
    import re

    path = os.path.join(os.path.dirname(__file__), "..", "scripts", "driver_sim.py")
    src = open(path).read()
    block = src.split("EXTRA = [")[1].split("]")[0]
    names = re.findall(r'"([a-z0-9_]+)"', block)
    reg = load_all()
    assert len(names) == len(set(names)), [n for n in names if names.count(n) > 1]
    missing = [n for n in names if n not in reg]
    assert not missing, f"EXTRA names not in registry: {missing}"
    overlap = [n for n in names if n in _PRIORITY]
    assert not overlap, f"EXTRA names duplicated in the prefix: {overlap}"
