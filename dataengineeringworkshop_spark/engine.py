"""Lakehouse — the one-import facade tying the engine together.

A user of the reference workshop drives four surfaces: ad-hoc
SQL/DataFrame cells, batch ingestion (`1 Data ingestion.py`), the
medallion DML layer — MERGE / UPDATE / time travel / OPTIMIZE
(`2 Medaillon architecture.py`), and declarative pipelines with
expectations (`3/4 Delta Live Tables`).  ``Lakehouse`` exposes each as
one method over the same SparkSession, replacing the notebooks' session
dance (N1:33-56) with a constructor.

    lh = Lakehouse(storage_dir="/data/lake")
    stores = lh.read_csv("/landing/stores.csv")
    lh.create_table("stores", stores)                    # CTAS
    lh.sql("SELECT store_country, count(*) FROM stores GROUP BY 1")
    lh.table("stores").merge(updates, on="t.id = s.id")  # Delta-style DML
    feed = lh.auto_ingest("/landing/sales", target="bronze_sales",
                          fmt="json", schema_hints="ts long")
    pipe = lh.pipeline("medallion")                      # DLT-style DAG
    ...
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dataengineeringworkshop_spark.pipeline.runner import Pipeline
from dataengineeringworkshop_spark.session import ensure_session_defaults, get_spark
from dataengineeringworkshop_spark.sources import batch as batch_io
from dataengineeringworkshop_spark.streaming.autoingest import AutoIngest
from dataengineeringworkshop_spark.tables.backend import TableBackend


class Lakehouse:
    """Session + storage-rooted catalog of versioned tables + pipelines."""

    def __init__(
        self,
        storage_dir: str,
        spark: SparkSession | None = None,
        app_name: str = "dew-lakehouse",
        table_backend: str | None = None,
    ):
        """``table_backend``: force ``"versioned"`` / ``"delta"`` for
        every table this lakehouse opens (None = auto-select per
        tables/backend.py).  Pin it when behavior must be
        backend-stable — e.g. oracle-checked tests that assert
        VersionedTable history op names."""
        self.spark = ensure_session_defaults(spark) if spark else get_spark(app_name)
        self.storage_dir = storage_dir
        self.table_backend = table_backend
        os.makedirs(storage_dir, exist_ok=True)

    # ---- ad-hoc query surface (workshop %sql / display cells) ----
    def sql(self, statement: str) -> DataFrame:
        """Run SQL verbatim, including the workshop's Databricks-only
        surface: ``col:json.path`` extraction (N2:516, N3:147-151) is
        translated to ``get_json_object``, and UPDATE / DELETE / MERGE
        INTO / ALTER TABLE ADD COLUMN / DESCRIBE HISTORY / VERSION AS OF
        statements (N1:146-212, N2:511-540) are dispatched to the
        versioned-table API (see ``sqldml``)."""
        from dataengineeringworkshop_spark.sqldml import execute

        return execute(self, statement)

    def sql_script(self, script: str) -> list[DataFrame]:
        """Run a multi-statement SQL script (statements separated by
        ``;`` outside quotes — a whole ``%sql`` cell or .sql file),
        each through :meth:`sql`.  Returns the per-statement results;
        the last entry is what a notebook cell would display."""
        from dataengineeringworkshop_spark.sqldml import split_statements

        return [self.sql(stmt) for stmt in split_statements(script)]

    # ---- batch ingestion (N1:86-93, N2:116-126) ----
    def read_csv(self, path: str, **opts) -> DataFrame:
        return batch_io.read_csv(self.spark, path, **opts)

    def read_json(self, path: str, **opts) -> DataFrame:
        return batch_io.read_json(self.spark, path, **opts)

    # ---- versioned tables (Delta-parity DML, N1/N2) ----
    def _table_path(self, name: str) -> str:
        return os.path.join(self.storage_dir, "tables", name)

    def table(self, name: str) -> TableBackend:
        """Open the named table through the backend seam: parquet +
        commit-log VersionedTable here; DeltaBackend automatically when
        delta-spark is importable (tables/backend.py)."""
        from dataengineeringworkshop_spark.tables.backend import open_table

        return open_table(
            self.spark, self._table_path(name), backend=self.table_backend
        )

    def create_table(
        self, name: str, df: DataFrame, register_view: bool = True
    ) -> TableBackend:
        """CTAS (N1:125-130): materialize df as version 0 of a versioned
        table; optionally expose it to ``sql()`` as a temp view."""
        vt = self.table(name)
        vt.write(df)
        if register_view:
            vt.read().createOrReplaceTempView(name)
        return vt

    def refresh_view(self, name: str) -> None:
        """Re-point the temp view at the table's latest version (after DML)."""
        self.table(name).read().createOrReplaceTempView(name)

    # ---- incremental ingestion (Auto Loader parity, N2:262-274) ----
    def auto_ingest(
        self,
        source_dir: str,
        target: str,
        fmt: str = "json",
        schema_hints: str | None = None,
        run: bool = True,
    ) -> AutoIngest:
        ing = AutoIngest(
            source_dir=source_dir,
            fmt=fmt,
            target_dir=os.path.join(self.storage_dir, "ingest", target),
            checkpoint_dir=os.path.join(self.storage_dir, "checkpoints", target),
            schema_hints=schema_hints,
        )
        if run:
            ing.run_once(self.spark)
            ing.read_target(self.spark).createOrReplaceTempView(target)
        return ing

    def read_ingested(self, target: str) -> DataFrame:
        return AutoIngest(
            source_dir="",
            target_dir=os.path.join(self.storage_dir, "ingest", target),
            checkpoint_dir=os.path.join(self.storage_dir, "checkpoints", target),
        ).read_target(self.spark)

    # ---- declarative pipelines (DLT parity, N3/N4) ----
    def pipeline(self, name: str) -> Pipeline:
        return Pipeline(name, os.path.join(self.storage_dir, "pipelines", name))

    def pipeline_from_sql(
        self,
        name: str,
        sql_text: str,
        params: dict[str, str] | None = None,
        schema_hints: dict[str, str] | None = None,
    ) -> Pipeline:
        """A DLT SQL notebook/script (`4  Delta Live Tables (SQL).sql`
        dialect) parsed into a ready-to-run pipeline rooted in this
        lakehouse's storage (see ``pipeline.dlt_sql``)."""
        from dataengineeringworkshop_spark.pipeline.dlt_sql import pipeline_from_sql

        return pipeline_from_sql(
            name,
            os.path.join(self.storage_dir, "pipelines", name),
            sql_text,
            params=params,
            schema_hints=schema_hints,
        )
