"""Join accelerators: hand-built runtime filters.

The automatic variants (AQE skew split, dynamic partition pruning,
injected bloom filters) are regression-pinned in
tests/test_scale_paths.py; this module is the MANUAL form for plans or
engines where injection declines — the same pattern, expressed as
relational operators, so the optimizer still sees a plain broadcast
semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.plans.registry import kbucket


def bloom_prefilter_semi(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 8192,
) -> DataFrame:
    """Semi join ``probe ⋉ build`` behind a one-hash Bloom-style
    prefilter: the build side reduces to its DISTINCT kbucket set
    (<= ``m`` rows REGARDLESS of build-side cardinality), the probe
    keeps only bucket-matching rows via a broadcast semi join, and the
    surviving sliver goes through the exact semi join.

    Result-identical to ``probe.join(build, key, "left_semi")``:
    false negatives are impossible (both sides hash the key with the
    same function), false positives die in the exact join —
    tests/test_clusters.py forces bucket collisions and proves the
    identity; the j9 registry query hash-proves it against a plain
    EXISTS oracle.  At 100 TB the broadcast is bounded by ``m`` and
    non-candidate probe rows die before the shuffle."""
    buckets = build.select(
        F.expr(kbucket(build_key, m)).alias("__bkt")
    ).distinct()
    pre = probe.withColumn("__bkt", F.expr(kbucket(probe_key, m))).join(
        F.broadcast(buckets), "__bkt", "left_semi"
    )
    return pre.join(
        build, pre[probe_key] == build[build_key], "left_semi"
    ).drop("__bkt")
