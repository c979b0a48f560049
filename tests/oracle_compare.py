"""Local replica of the driver's DuckDB-oracle comparison so mismatches
are caught in pytest before the driver's verify runs.

Compare semantics: row count, sorted column-name set, and an
order-insensitive comparison of values (rows sorted by all columns).
Floats must match EXACTLY (the engine's determinism contract — see
plans/registry.py); allowing tolerance here would hide hash mismatches
the driver would still flag.
"""

from __future__ import annotations

import math

import duckdb

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        # exact repr — determinism contract says bits must match
        return ("float", repr(v))
    if hasattr(v, "isoformat"):  # datetime/date
        # tz-awareness is PART of the comparison: the external driver
        # stringifies values, so a DuckDB TIMESTAMPTZ ('…+00:00') never
        # hashes equal to Spark's naive timestamp — stripping tzinfo
        # here once hid exactly that mismatch (w9_sliding, round 6)
        return ("ts", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm_cell(x) for x in v))
    if type(v).__name__ == "ndarray":  # array columns (Spark & DuckDB both
        return ("list", tuple(_norm_cell(x.item()) for x in v))  # yield numpy)
    if isinstance(v, bytes):
        return ("bytes", v)
    return (type(v).__name__, v)


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str, name: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()

    if len(sp) != len(du):
        problems.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")

    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    if sp_cols != du_cols:
        problems.append(f"{name}: columns spark={sp_cols} duckdb={du_cols}")
        return problems

    sp = sp[sp_cols]
    du = du[du_cols]
    sp_rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in sp.itertuples(index=False, name=None))
    )
    du_rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in du.itertuples(index=False, name=None))
    )
    if sp_rows != du_rows:
        diff_sp = [r for r in sp_rows if r not in set(du_rows)][:3]
        diff_du = [r for r in du_rows if r not in set(sp_rows)][:3]
        problems.append(
            f"{name}: value mismatch; spark-only(sample)={diff_sp} duckdb-only(sample)={diff_du}"
        )
    return problems
