"""LLM-training-data pipeline operators (BASELINE north star):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard),
similarity search (brute-force + LSH-bucketed ANN), text analysis,
multimodal column plumbing.

Design rules: JVM built-ins for all hot paths (hashing, explosion,
aggregation); Pandas UDFs only where arrays meet numpy (hyperplane
projections); no cross joins — candidate generation is always a bucket
join; no driver-side collects.
"""

from dataengineeringworkshop_spark.llmops.minhash import (
    minhash_signatures,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
)
from dataengineeringworkshop_spark.llmops.simhash import simhash, simhash_near_pairs
from dataengineeringworkshop_spark.llmops.similarity import ann_topk_lsh, exact_cosine_topk

__all__ = [
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_near_pairs",
    "ann_topk_lsh",
    "exact_cosine_topk",
]
