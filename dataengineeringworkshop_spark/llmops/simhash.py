"""SimHash near-duplicate fingerprints.

simhash(doc) = 64-bit fingerprint where bit i = sign of
sum over tokens of (±1 depending on bit i of xxhash64(token)), weighted
by term frequency (a token appearing twice contributes twice).

Computed as 64 conditional-sum aggregates in ONE hash aggregation over
exploded tokens (JVM codegen, single shuffle on doc id), then assembled
into a long with a 64-term bit sum.  Near-dup candidates come from
splitting the fingerprint into 4×16-bit bands (documents within hamming
distance 3 share at least one band by pigeonhole) and bucket-joining —
the same no-cross-join discipline as MinHash LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, simhash long)."""
    tok = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), " ")).alias("token"),
    ).withColumn("h", F.xxhash64("token"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("doc").agg(*aggs)
    # assemble: bit i set where the signed sum is positive; build as a sum
    # of powers of two (bit 63 via negative long to stay in two's complement)
    terms = []
    for i in range(64):
        weight = F.lit(-(2 ** 63)) if i == 63 else F.lit(2 ** i).cast("long")
        terms.append(F.when(F.col(f"b{i}") > 0, weight).otherwise(F.lit(0).cast("long")))
    fingerprint = terms[0]
    for t in terms[1:]:
        fingerprint = fingerprint + t
    return sums.select("doc", fingerprint.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    max_bucket: int = 256,
) -> DataFrame:
    """(d1, d2, hamming) pairs with hamming(simhash) <= max_hamming,
    found via 4×16-bit band buckets (complete for max_hamming <= 3).

    The fingerprint table is MATERIALIZED before banding: the two-pass
    bucket gate below evaluates its input twice (exchanges canonicalize
    differently — ReuseExchange can't help), and from a parquet artifact
    each pass is a map-only scan instead of a second run of the 64-way
    bit-sum aggregation."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    fp = materialize(simhash(df, id_col, text_col), "simhash_fp")
    bands = fp.select(
        "doc",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * b).bitwiseAND(F.lit(0xFFFF)).cast("int")
                    for b in range(4)
                ]
            )
        ).alias("band", "band_key"),
    )
    # two-pass: count buckets, keep small ones, then self-join entries
    # within surviving buckets — never a collect_list whose array could
    # grow with a degenerate boilerplate bucket before the size filter
    # runs; both passes are map-only scans of the materialized
    # fingerprint artifact (see minhash.lsh_candidate_pairs)
    sizes = bands.groupBy("band", "band_key").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") >= 2) & (F.col("n") <= max_bucket)).select(
        "band", "band_key"
    )
    b_ok = bands.join(ok, ["band", "band_key"])
    pairs = (
        b_ok.select(
            "band", "band_key", F.col("doc").alias("d1"), F.col("simhash").alias("s1")
        )
        .join(
            b_ok.select(
                "band", "band_key", F.col("doc").alias("d2"), F.col("simhash").alias("s2")
            ),
            ["band", "band_key"],
        )
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "s1", "d2", "s2")
        .distinct()
    )
    hamming = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return (
        pairs.withColumn("hamming", hamming.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("d1", "d2", "hamming")
        .distinct()
    )
