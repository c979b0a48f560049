#!/usr/bin/env python
"""Generate a scaled-up copy of a testdata sf dir for scaling smokes.

Replicates each FACT table R times with consistent key offsets (joins
stay valid within each replica: both sides of every FK edge are offset
by the same amount), keeps the fixed dimension tables (region, nation)
as-is, and perturbs text/embedding content per replica so dedup and
similarity workloads see realistic near-dup distributions rather than
R exact copies of everything.

Usage:  python scripts/gen_scaled_data.py [SRC_DIR] [DST_DIR] [R]
Default: /root/testdata/sf0.1 -> /tmp/dew_sf1 at R=10 (i.e. ~sf1).

The output lives under /tmp — driver testdata is read-only and this
derived data is disposable (bench.py just points SPARK_GRAFT_SF_DIR at
it).  DuckDB writes plain µs-timestamp parquet, which Spark reads as
timestamp_ntz — the same type plans/tables.py normalizes the original
nanos column to, so every registered query runs unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb

# key-offset strides: > max key in the source table at any plausible sf
K_CUST = 10**9
K_SUPP = 10**9
K_PART = 10**9
K_ORD = 10**9
K_EVT = 10**9
K_DOC = 10**9
K_VEC = 10**9


def gen(src: str, dst: str, r: int) -> None:
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def copy(name: str, select_sql: str | None = None) -> None:
        q = select_sql or f"SELECT * FROM src"
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM read_parquet('{src}/{name}.parquet')")
        con.execute(f"CREATE OR REPLACE VIEW reps AS SELECT UNNEST(range({r})) AS rep")
        con.execute(
            f"COPY ({q}) TO '{dst}/{name}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)"
        )

    # fixed dims: pass through
    copy("region")
    copy("nation")

    copy(
        "customer",
        f"""SELECT c_custkey + rep*{K_CUST} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM src CROSS JOIN reps""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + rep*{K_SUPP} AS s_suppkey, s_name, s_nationkey, s_acctbal
            FROM src CROSS JOIN reps""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + rep*{K_PART} AS p_partkey, p_name, p_brand, p_type,
                   p_size, p_retailprice
            FROM src CROSS JOIN reps""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + rep*{K_ORD} AS o_orderkey,
                   o_custkey + rep*{K_CUST} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src CROSS JOIN reps""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + rep*{K_ORD} AS l_orderkey,
                   l_partkey + rep*{K_PART} AS l_partkey,
                   l_suppkey + rep*{K_SUPP} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM src CROSS JOIN reps""",
    )
    copy(
        "events",
        f"""SELECT event_id + rep*{K_EVT} AS event_id,
                   ts + to_microseconds(rep) AS ts,
                   user_id + rep*{K_CUST} AS user_id,
                   event_type, value, props
            FROM src CROSS JOIN reps""",
    )
    # perturb text per replica: tail token makes replicas NEAR-dups (same
    # shingle mass, one shingle differs) instead of R exact copies
    copy(
        "documents",
        f"""SELECT doc_id + rep*{K_DOC} AS doc_id,
                   CASE WHEN rep = 0 THEN text
                        ELSE text || ' rep' || rep END AS text,
                   lang, source,
                   n_chars + CASE WHEN rep = 0 THEN 0
                                  ELSE LENGTH(' rep' || rep) END AS n_chars
            FROM src CROSS JOIN reps""",
    )
    # perturb embeddings per replica: small deterministic shift keeps the
    # cosine structure while avoiding R-way exact ties in top-k
    copy(
        "embeddings",
        f"""SELECT vec_id + rep*{K_VEC} AS vec_id,
                   list_transform(embedding, x -> CAST(x + rep * 0.001 AS FLOAT)) AS embedding,
                   label
            FROM src CROSS JOIN reps""",
    )

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dew_sf1"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    gen(src, dst, r)
