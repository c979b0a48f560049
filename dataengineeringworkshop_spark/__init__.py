"""dataengineeringworkshop_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the workload semantics of the
reference repo (RosaNoel/DataEngineeringWorkshop, a Databricks "APJuice
Lakehouse" workshop): batch ingestion, medallion ETL, incremental/streaming
ingestion with schema hints + rescued data, window dedup, JSON shredding,
MERGE upserts, time travel, table maintenance, declarative pipelines with
data-quality expectations — plus LLM-scale data ops (dedup, similarity
search, text analysis, multimodal plumbing) over documents/embeddings.

Everything is DataFrame/SQL-first: logical plans are declared via the
PySpark DataFrame API or Spark SQL and optimized by Catalyst; Python only
orchestrates.  No RDD hot paths, no row-at-a-time Python UDFs.
"""

__version__ = "0.1.0"

from dataengineeringworkshop_spark.session import get_spark, ensure_session_defaults

__all__ = ["get_spark", "ensure_session_defaults", "__version__"]
