"""Query plans: table loaders, the query/oracle registry, and the named
query definitions that back ``__spark_entry__.queries()``.
"""

from dataengineeringworkshop_spark.plans.registry import REGISTRY, QuerySpec, query
from dataengineeringworkshop_spark.plans.tables import load_table, register_views

__all__ = ["REGISTRY", "QuerySpec", "query", "load_table", "register_views"]
