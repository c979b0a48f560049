"""Shared SQL expression fragments for the embedding operators.

``DOT_DOUBLE`` is the fast JVM dot product (double accumulation) used in
ANN candidate scoring; the DECIMAL-exact variant used for oracle-matched
queries lives in ``plans/simops.py`` (different precision contract —
keep them distinct on purpose)."""

from __future__ import annotations

DOT_DOUBLE = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
