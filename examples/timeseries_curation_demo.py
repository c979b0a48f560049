#!/usr/bin/env python
"""Time-series hygiene + corpus curation walkthrough — executable
documentation for the round-6 wave-4 surface: forward fill across
sensor gaps, hourly spine densification, distribution histograms,
median/MAD outlier flagging, deterministic weighted sampling, the
per-source quality gate, TF-IDF salient terms, and the 2-D Morton
layout report — all over the driver's ``events``/``documents``/
``orders`` testdata.

Run: ``python examples/timeseries_curation_demo.py`` (defaults to
sf0.001).  The test suite executes ``main()`` and asserts the
invariants (tests/test_timeseries_example.py), so this file stays
honest.
"""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.001"


def main(sf_dir: str = SF_DIR) -> dict:
    from dataengineeringworkshop_spark.plans.registry import load_all
    from dataengineeringworkshop_spark.session import get_spark

    spark = get_spark(app_name="timeseries-curation-demo")
    reg = load_all()
    out: dict = {}

    # 1. forward fill: error rows lose their reading; the fill carries
    #    the last good one forward per user
    ff = reg["ts_forward_fill"].fn(spark, sf_dir)
    out["fill"] = ff.agg(
        F.sum("n_rows").alias("rows"),
        F.sum("n_gaps").alias("gaps"),
        F.sum("n_unfillable").alias("unfillable"),
    ).first().asDict()

    # 2. spine gap-fill: the hourly axis is complete, zeros included
    spine = reg["ts_spine_gapfill"].fn(spark, sf_dir)
    out["spine_cells"] = spine.count()
    out["spine_zero_cells"] = spine.filter(F.col("n_events") == 0).count()
    out["spine_event_total"] = spine.agg(F.sum("n_events")).first()[0]

    # 3. histogram: per-type value distribution in width-10 bins
    hist = reg["a15_value_histogram"].fn(spark, sf_dir)
    out["hist_event_total"] = hist.agg(F.sum("n_events")).first()[0]

    # 4. robust outliers: median/MAD per event type
    mad = reg["e_mad_outliers"].fn(spark, sf_dir)
    out["mad"] = {
        r.event_type: (r.n_events, r.n_outliers) for r in mad.collect()
    }

    # 5. deterministic weighted sample: ≤20 docs per source, repeatable
    samp = reg["cp_weighted_sample"].fn(spark, sf_dir)
    per_src = {
        r.source: r.n for r in samp.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    out["sample_per_source"] = per_src
    out["sample_repeatable"] = sorted(
        r.doc_id for r in samp.collect()
    ) == sorted(r.doc_id for r in reg["cp_weighted_sample"].fn(spark, sf_dir).collect())

    # 6. per-source quality gate: keep each source's top half
    gate = reg["cp_quality_percentile_gate"].fn(spark, sf_dir)
    out["gate"] = {r.source: (r.n_docs, r.n_kept) for r in gate.collect()}

    # 7. TF-IDF: top salient terms of the first document
    tfidf = reg["t_tfidf_topk"].fn(spark, sf_dir)
    out["doc0_terms"] = [
        r.term
        for r in tfidf.filter(F.col("doc_id") == 0)
        .orderBy(F.col("tfidf").desc(), "term")
        .collect()
    ]

    # 8. Morton layout: per-file spans stay bounded on BOTH dimensions
    z = reg["pp_zorder_layout"].fn(spark, sf_dir)
    rows = z.collect()
    ck_lo = min(r.min_ck for r in rows)
    ck_hi = max(r.max_ck for r in rows)
    day_lo = min(r.min_day for r in rows)
    day_hi = max(r.max_day for r in rows)
    out["zorder_files"] = len(rows)
    # average per-file span as a fraction of the full range, per dim
    out["zorder_ck_span_frac"] = sum(
        (r.max_ck - r.min_ck + 1) / (ck_hi - ck_lo + 1) for r in rows
    ) / len(rows)
    out["zorder_day_span_frac"] = sum(
        (r.max_day - r.min_day + 1) / (day_hi - day_lo + 1) for r in rows
    ) / len(rows)

    for k, v in out.items():
        print(f"{k}: {v}")
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else SF_DIR)
