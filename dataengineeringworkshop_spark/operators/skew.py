"""Skew-mitigation joins: explicit key salting.

AQE's skew-join splitting (on in `session.py`) handles most skew for
sort-merge joins at runtime; explicit salting is the structural fix for
the pathological case — a handful of keys carrying a large fraction of
all rows (the power-law user, the null-ish default key), where even a
split partition re-skews.

``salted_join`` spreads each skewed-side key across ``n_salts``
sub-partitions and replicates the build side once per salt: shuffle
balance improves by ~n_salts at the cost of an n_salts× blowup of the
(small) build side only.  Result is IDENTICAL to the plain equi join —
the salt participates in partitioning, not in the join predicate's
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    build: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi join with the skewed side salted across ``n_salts`` buckets.

    ``build`` must be the smaller side (it is replicated n_salts×).
    ``how`` supports inner/left — semantics preserved because every
    (key, salt) pair exists on the build side."""
    keys = [on] if isinstance(on, str) else list(on)
    f = skewed.withColumn("__salt", (F.rand(seed) * n_salts).cast("int"))
    d = build.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return f.join(d, [*keys, "__salt"], how).drop("__salt")
