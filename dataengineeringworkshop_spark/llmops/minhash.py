"""MinHash + banded LSH near-duplicate detection.

Pipeline (the standard shingle→minhash→band→bucket-join construction):

1. **Shingle**: word n-grams per document (distinct), via JVM array ops.
2. **Signatures**: k independent hash functions simulated as
   ``xxhash64(shingle, j)`` for j in 0..k-1; the signature is the
   elementwise min — computed as k ``min()`` aggregates in ONE hash
   aggregation over (doc, shingle) rows: no k-fold row blowup, one
   shuffle on doc_id.
3. **LSH bands**: split the k-vector into b bands of r rows; band key =
   hash of the band slice.  Documents sharing any band key are
   candidates — a self-join on (band, key), never a cross join.
4. **Verify** (optional): exact Jaccard on candidates only, routed
   through the candidate pair list (pairs ⋈ shingles(d1) ⋈ shingles(d2))
   so hot boilerplate shingles can't fan out quadratically.

Scale: for b bands the candidate join shuffles (doc, band_key) pairs —
b rows per doc regardless of document size.  Hot buckets (boilerplate
text) are capped with ``max_bucket`` (standard at 100 TB: a bucket with
10^6 docs is boilerplate, handled separately, not pairwise).

P(candidate) = 1 - (1 - j^r)^b: defaults (b=16, r=4, k=64) catch
jaccard≥0.5 with p≈0.88, ≥0.7 with p≈0.99.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) distinct word n-grams — all JVM array built-ins.

    The input is projected to (id, text) and fanned out before the
    explode: the corpus arrives as a one-row-group parquet file (a
    single-partition scan), and the split+slice+concat explode is the
    CPU-heavy half of every dedup index build — without the gated
    repartition it runs on one core (guide §2.5; no-op at real scale
    where the scan is already wide)."""
    from dataengineeringworkshop_spark.operators.fanout import fan_out

    w = F.split(F.col("__t"), " ")
    shingles = F.when(F.size(w) < n, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        )
    )
    return (
        fan_out(df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")))
        .select("doc", F.explode(shingles).alias("shingle"))
        .distinct()
    )


def _signatures_from_shingles(sh: DataFrame, num_hashes: int) -> DataFrame:
    """(doc, sig array<long>) — k min-aggregates in a single groupBy."""
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(j))).alias(f"h{j}")
        for j in range(num_hashes)
    ]
    sigs = sh.groupBy("doc").agg(*aggs)
    return sigs.select(
        "doc", F.array(*[F.col(f"h{j}") for j in range(num_hashes)]).alias("sig")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """(doc, sig array<long>) from raw text."""
    return _signatures_from_shingles(
        word_shingles(df, id_col, text_col, shingle_n), num_hashes
    )


def minhash_signatures_materialized(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
    index_key: str | None = None,
) -> DataFrame:
    """Signatures written once to a parquet artifact and re-scanned —
    the form every multi-consumer pipeline stage (LSH banding runs TWO
    passes over it) must use, so the expensive shingle→minhash
    aggregation never executes more than once per corpus.  With
    ``index_key`` the artifact is cached across calls (index
    maintenance)."""
    from dataengineeringworkshop_spark.operators.materialize import materialize

    return materialize(
        minhash_signatures(df, id_col, text_col, num_hashes, shingle_n),
        "minhash_sigs",
        cache_key=(
            f"{index_key}:sh{shingle_n}:mh{num_hashes}:id{id_col}:t{text_col}"
            if index_key
            else None
        ),
    )


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 16, rows_per_band: int = 4, max_bucket: int = 64
) -> DataFrame:
    """(d1, d2) candidate pairs sharing at least one LSH band bucket.

    Bucket join on (band, band_key); buckets larger than ``max_bucket``
    are dropped (boilerplate guard against quadratic blowup).
    """
    band_entries = sigs.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.transform(
                        F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    )),
                ),
            )
        ).alias("band", "band_key"),
    )
    # two-pass shape: COUNT buckets first, keep the small ones, THEN
    # self-join entries restricted to surviving buckets.  A
    # collect_list-per-bucket would materialize a degenerate boilerplate
    # bucket's entire member array in one aggregation task BEFORE the
    # size filter could drop it — an executor OOM at corpus scale; the
    # count aggregate carries only (band, key, n) however hot the key.
    # band_entries is evaluated by BOTH passes (their exchanges
    # canonicalize differently, so ReuseExchange cannot dedupe them, and
    # AQE's broadcast conversion breaks reuse anyway) — which is why
    # every caller hands this function signatures read from a
    # MATERIALIZED artifact: each pass is then a map-only projection of
    # a parquet scan, never a second run of the shingle→minhash
    # aggregation (see minhash_signatures_materialized).
    sizes = band_entries.groupBy("band", "band_key").agg(F.count("*").alias("n"))
    ok = sizes.filter((F.col("n") >= 2) & (F.col("n") <= max_bucket)).select(
        "band", "band_key"
    )
    entries_ok = band_entries.join(ok, ["band", "band_key"])
    pairs = (
        entries_ok.select("band", "band_key", F.col("doc").alias("d1"))
        .join(
            entries_ok.select("band", "band_key", F.col("doc").alias("d2")),
            ["band", "band_key"],
        )
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    return pairs


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float | None = 0.5,
    index_key: str | None = None,
) -> DataFrame:
    """Candidates via LSH, then (optionally) EXACT-Jaccard verification
    restricted to the candidate set.  Returns (d1, d2[, jaccard]).

    The verify step routes the intersection join THROUGH the candidate
    pair list instead of self-joining the shingle inverted index: pairs
    ⋈ shingles(d1) ⋈ shingles(d2).  A shingle self-join fans out O(df²)
    rows for a boilerplate shingle shared by df docs (and capping df
    there either over- or under-estimates jaccard depending on which
    side of the ratio the cap touches); the pair-routed join is exact
    and its size is structurally bounded at
    ``|candidates| × shingles_per_doc`` — and the candidate set is
    already bounded by the LSH ``max_bucket`` guard (≤ bands·max_bucket
    pairs per doc), independent of corpus-wide shingle frequencies."""
    rows_per_band = num_hashes // bands
    if jaccard_threshold is None:
        sigs = minhash_signatures_materialized(
            df, id_col, text_col, num_hashes, shingle_n, index_key=index_key
        )
        return lsh_candidate_pairs(sigs, bands, rows_per_band)
    # the shingle index feeds BOTH the signature branch and the exact-
    # Jaccard verify branch — materialize it once instead of re-scanning
    # and re-exploding the corpus (at 100 TB this is the checkpointed
    # inverted-index table; materialize() spills to parquet instead of
    # pinning executor memory like persist())
    from dataengineeringworkshop_spark.operators.materialize import materialize

    sh = materialize(
        word_shingles(df, id_col, text_col, shingle_n),
        "shingles",
        cache_key=(
            f"{index_key}:sh{shingle_n}:id{id_col}:t{text_col}"
            if index_key
            else None
        ),
    )
    sigs = materialize(
        _signatures_from_shingles(sh, num_hashes),
        "minhash_sigs",
        cache_key=(
            f"{index_key}:sh{shingle_n}:mh{num_hashes}:id{id_col}:t{text_col}"
            if index_key
            else None
        ),
    )
    # the candidate pair set feeds both verify joins and the doc filter
    # — materialize so the LSH band pipeline runs once, not per consumer
    cand = materialize(
        lsh_candidate_pairs(sigs, bands, rows_per_band), "minhash_cand"
    )
    # restrict the shingle index to docs that appear in any candidate
    # pair; sizes are exact (uncapped) per-doc distinct-shingle counts.
    # NO broadcast hint: the candidate-doc set grows with corpus size
    # and dup rate (unbounded at 100 TB) — AQE broadcasts it at runtime
    # when it is actually small, and falls back to a shuffle join when
    # it is not.  The restricted index is NOT written out: the verify
    # consumers each re-scan the (already materialized) shingle artifact
    # and restrict through their candidate join — the intersection joins
    # restrict via ``cand`` itself, only ``sizes`` needs the distinct
    # doc set — so the per-call verify pays zero parquet round-trips
    # (round-14: the write+read job and its exchanges were pure driver
    # overhead per serve; guide §1.2 — remove passes you don't need).
    cand_docs = cand.select(F.col("d1").alias("doc")).union(
        cand.select("d2")
    ).distinct()
    sizes = sh.join(cand_docs, "doc").groupBy("doc").agg(
        F.count("*").alias("sz")
    )
    # exact intersection, routed through the pair list:
    #   (d1, d2) ⋈ sh(d1) → (d1, d2, shingle) ⋈ sh(d2) → count
    inter = (
        cand.join(sh.withColumnRenamed("doc", "d1"), "d1")
        .join(
            sh.select(F.col("doc").alias("d2"), "shingle"),
            ["d2", "shingle"],
        )
        .groupBy("d1", "d2")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "d1").withColumnRenamed("sz", "sz1"), "d1")
        .join(sizes.withColumnRenamed("doc", "d2").withColumnRenamed("sz", "sz2"), "d2")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("d1", "d2", F.round("jaccard", 6).alias("jaccard"))
    )
    return out
