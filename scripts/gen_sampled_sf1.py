#!/usr/bin/env python
"""Deterministic sampled-subcorpus of the homemade sf1 — closes the
cross-engine evidence gap for the QUADRATIC-ORACLE queries (VERDICT r7
item 3).

The pair-forming queries (minhash/jaccard/containment pair CTEs,
transitive closures, cell-pairwise SemDeDup) have DuckDB oracles that
are quadratic by construction: feasible at the driver's sf0.01
(500 docs), infeasible at sf0.1+ — which is exactly why the engine-side
plans are banded/bucketed.  Their >sf0.01 correctness therefore rested
on small-SF evidence only, missing precisely the failure class the
round-7 sf1 sweep caught elsewhere (1e10-scale id overflow, rounding-tie
density, guard caps silently eating pairs).

This script builds a subcorpus with **sf0.01-sized pair space but sf1
data characteristics**:

- `gen_scaled_data.py` makes sf1 as 10 key-offset replicas of every
  sf0.1 row, with per-replica text/embedding perturbation — so a
  document's near-dup family is exactly the docs sharing its BASE id
  (``doc_id % 1e9``).
- Sampling selects whole FAMILIES via the engine's one deterministic
  sampling device (``kbucket`` — guarded multiplicative hash, identical
  arithmetic in Spark SQL and DuckDB) on the base id: every kept family
  arrives with all 10 replicas, so the near-dup pair structure the
  quadratic queries exist to find is preserved, ids still span the full
  1e10 range, and the replica-tie density is sf1's, not sf0.01's.
- Non-doc/embedding tables pass through from sf0.01 (tiny): the
  quadratic set reads only documents/embeddings, and the other tables
  just have to exist for view registration.

Usage:
    python scripts/gen_sampled_sf1.py [SF1_DIR] [DST_DIR] [KEEP_PCT]
    python scripts/sweep_oracles.py /tmp/dew_sf1_sample --only-quadratic

Defaults: /tmp/dew_sf1 -> /tmp/dew_sf1_sample keeping 2% of document
families (~100 families = ~1000 docs → ~0.5M raw pairs, inside the
sweep's DuckDB budget) and 5% of embedding families (~1000 vectors).
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SMALL_SRC = "/root/testdata/sf0.01"
BASE = 10**9  # gen_scaled_data.py replica key stride


def kbucket(expr: str, m: int) -> str:
    # the engine's ONE sampling device (plans/registry.py:kbucket):
    # pre-reduction mod the prime keeps the product under 2^63
    return f"((({expr}) % 1000000007) * 2654435761) % {m}"


def gen(sf1: str, dst: str, doc_pct: int = 2, vec_pct: int = 5) -> None:
    # Both samples use the SAME kbucket on the base id, so doc_pct <=
    # vec_pct guarantees every kept document's embedding is also kept —
    # the invariant every doc⋈embedding quadratic query relies on.  A
    # larger doc_pct would silently orphan documents.
    if doc_pct > vec_pct:
        raise ValueError(
            f"doc_pct ({doc_pct}) must be <= vec_pct ({vec_pct}): kept "
            "documents must be a subset of kept embeddings"
        )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")

    def sample(name: str, key: str, pct: int) -> None:
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{sf1}/{name}.parquet')
                      WHERE {kbucket(f"{key} % {BASE}", 100)} < {pct})
                TO '{dst}/{name}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)"""
        )

    sample("documents", "doc_id", doc_pct)
    sample("embeddings", "vec_id", vec_pct)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events"):
        shutil.copyfile(f"{SMALL_SRC}/{t}.parquet", f"{dst}/{t}.parquet")

    for t in ("documents", "embeddings"):
        n, fam = con.execute(
            f"""SELECT count(*), count(DISTINCT {'doc_id' if t == 'documents' else 'vec_id'} % {BASE})
                FROM read_parquet('{dst}/{t}.parquet')"""
        ).fetchone()
        print(f"{t}: {n} rows in {fam} replica families")


if __name__ == "__main__":
    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dew_sf1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dew_sf1_sample"
    pct = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    # scale the embedding sample with the CLI doc pct so the
    # subset invariant (docs ⊆ embeddings) holds for any requested size
    gen(sf1, dst, doc_pct=pct, vec_pct=max(5, pct))
