"""Data-quality expectations (DLT parity — SURVEY.md §2.13, reference
`4  Delta Live Tables (SQL).sql:86-123`).

Modes (N4:86-95):
- ``warn`` (plain EXPECT): violating rows kept; metrics recorded.
- ``drop`` (ON VIOLATION DROP ROW): violating rows filtered out; counted.
- ``fail`` (ON VIOLATION FAIL UPDATE): any violation raises.

Metrics are computed with ``df.observe`` (aggregates piggyback on the
action that materializes the DataFrame — zero extra scans) when attached
to a write, or with a single LAZY agg pass in ``expectation_metrics``.
Nothing in this module runs a Spark action: metrics ride whatever action
the caller executes, and fail-mode enforcement is a row-level guard that
aborts that same action — the observe path, with no second plan
execution anywhere.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    predicate: str  # SQL boolean expression over the dataset's columns
    # warn | drop | fail | quarantine (quarantine is honored by the
    # pipeline runner: violating rows are dropped from the dataset AND
    # routed to a side table — N4:98's roadmap mode)
    mode: str = "warn"


class ExpectationFailed(Exception):
    pass


# unique token emitted by fail_guard's raise_error message; the pipeline
# runner matches exactly this when deciding whether a write failure was an
# expectation violation (see runner._translate_fail_guard)
FAIL_SENTINEL = "__dew_expectation_violated__:"
FAIL_SENTINEL_END = ":__"


_METRIC_SCHEMA = "constraint_name string, passed_records long, failed_records long"


def fail_guard(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Attach a row-level guard for every ``fail``-mode expectation: the
    first violating row aborts whatever action materializes the frame
    (DLT's ON VIOLATION FAIL UPDATE fails the flow *during* processing —
    same semantics, and it costs zero extra scans because the check rides
    the caller's own action).

    Implemented as a filter over ``CASE WHEN NOT (pred) THEN
    raise_error(...) ELSE true END`` — a filter cannot be pruned by the
    optimizer, and ``raise_error`` is non-foldable, so the guard survives
    Catalyst intact."""
    import re

    out = df
    for e in expectations:
        if e.mode != "fail":
            continue
        # the name is interpolated into a SQL string literal — keep only
        # literal-safe characters (constraint names may be arbitrary
        # backtick-quoted text; a quote would break or inject SQL)
        safe = re.sub(r"[^A-Za-z0-9 _.\-]", "_", e.name)
        # FAIL_SENTINEL makes the guard's runtime error uniquely
        # recognizable: the runner translates ONLY messages carrying this
        # token back to ExpectationFailed, so an unrelated failure whose
        # text happens to say "ON VIOLATION FAIL UPDATE" (user data, a
        # user raise_error) is never mis-wrapped.
        msg = (
            f"{FAIL_SENTINEL}{safe}{FAIL_SENTINEL_END} "
            "(ON VIOLATION FAIL UPDATE)"
        )
        out = out.filter(
            F.expr(
                f"CASE WHEN NOT coalesce(({e.predicate}), false) "
                f"THEN raise_error('{msg}') ELSE true END"
            )
        )
    return out


def expectation_metrics(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """One row per expectation: (constraint_name, passed_records,
    failed_records) — the event-log schema of `3 Delta Live Tables
    Setup.py:138-151`.  Lazy, single scan; empty list -> empty frame."""
    if not expectations:
        return df.sparkSession.createDataFrame([], _METRIC_SCHEMA)
    return _lazy_metrics(df, expectations)


def _lazy_metrics(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Lazy single-scan metrics: one agg row unpivoted with stack() —
    no job runs unless the caller materializes the frame."""
    aggs = []
    for e in expectations:
        pred = F.expr(e.predicate)
        aggs.append(F.sum(F.when(pred, 1).otherwise(0)).cast("long").alias(f"__p_{e.name}"))
        aggs.append(F.sum(F.when(pred, 0).otherwise(1)).cast("long").alias(f"__f_{e.name}"))
    stack_args = ", ".join(
        f"'{e.name}', coalesce(__p_{e.name}, 0L), coalesce(__f_{e.name}, 0L)"
        for e in expectations
    )
    return df.agg(*aggs).select(
        F.expr(
            f"stack({len(expectations)}, {stack_args}) "
            "AS (constraint_name, passed_records, failed_records)"
        )
    )


def apply_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Return (dataset, metrics).  ``drop`` expectations filter the dataset;
    ``fail`` expectations abort the caller's materializing action on the
    first violating row (via :func:`fail_guard`); ``warn`` only record.

    Fully LAZY — no Spark job runs here.  Metrics cost ONE scan when the
    caller materializes them; the fail check rides the caller's own
    action on the returned dataset (the observe discipline: never a
    second execution of the node plan)."""
    if not expectations:
        return df, df.sparkSession.createDataFrame([], _METRIC_SCHEMA)
    metrics = _lazy_metrics(df, expectations)
    out = fail_guard(df, expectations)
    for e in expectations:
        if e.mode == "drop":
            out = out.filter(F.expr(e.predicate))
    return out, metrics


def quarantine_split(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Quarantine pattern: instead of silently dropping violations, route
    them to a side table for repair/audit (the production alternative to
    ON VIOLATION DROP ROW — nothing is lost, the main table stays clean).

    Returns ``(kept, quarantined)`` where ``quarantined`` carries a
    ``violated`` column: the comma-joined names of the failed
    expectations in definition order.  One scan, no shuffle — the split
    is two filters over the same tagged frame.

    A predicate that evaluates NULL (e.g. ``amount > 0`` on a null
    ``amount``) counts as a VIOLATION — consistent with the runner's
    drop filter (``filter(pred)`` removes NULL rows) and its metrics
    (``failed = total - passed``, which counts NULLs as failed).
    Without the coalesce, a NULL-evaluating row would be untagged here
    yet dropped by the main-table filter: removed from the dataset but
    never routed to quarantine — silently lost."""
    if not expectations:
        return df, df.limit(0).withColumn("violated", F.lit(""))
    tags = F.concat_ws(
        ",",
        *[
            F.when(~F.coalesce(F.expr(e.predicate), F.lit(False)), F.lit(e.name))
            for e in expectations
        ],
    )
    tagged = df.withColumn("violated", tags)
    kept = tagged.filter(F.col("violated") == "").drop("violated")
    quarantined = tagged.filter(F.col("violated") != "")
    return kept, quarantined
