"""Reusable DataFrame operator builders (SURVEY.md §2 idioms).

Each operator is a pure function DataFrame -> DataFrame declaring a logical
plan — Catalyst picks the physical strategy.  Nothing here collects to the
driver or loops row-at-a-time.
"""

from dataengineeringworkshop_spark.operators.dedup import dedup_exact, dedup_latest
from dataengineeringworkshop_spark.operators.rowhash import with_row_hash, with_struct_hash
from dataengineeringworkshop_spark.operators.shred import shred_json_array
from dataengineeringworkshop_spark.operators.topk import top_k_per_group
from dataengineeringworkshop_spark.operators.expectations import Expectation, apply_expectations

__all__ = [
    "dedup_latest",
    "dedup_exact",
    "with_row_hash",
    "with_struct_hash",
    "shred_json_array",
    "top_k_per_group",
    "Expectation",
    "apply_expectations",
]
