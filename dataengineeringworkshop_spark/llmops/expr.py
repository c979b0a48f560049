"""Shared SQL expression fragments for the embedding operators.

``DOT_DOUBLE`` is the fast JVM dot product (double accumulation) used in
ANN candidate scoring.  ``DOT_DECIMAL`` accumulates the per-element
products exactly in DECIMAL(28,14) (order-independent) and casts the
exact result to double — the precision contract that makes a cosine
bit-identical to a DuckDB oracle computing the same decimal sum; used
only on small rescore sets (top-k candidates), never corpus-wide."""

from __future__ import annotations

DOT_DOUBLE = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)

DOT_DECIMAL = (
    "CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
    "CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS DECIMAL(28,14))), "
    "CAST(0 AS DECIMAL(28,14)), (acc, v) -> CAST(acc + v AS DECIMAL(28,14))) AS DOUBLE)"
)
