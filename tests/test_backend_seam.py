"""The table-backend seam: callers program against TableBackend +
open_table(); VersionedTable (this container) and DeltaBackend (cluster)
both satisfy the protocol, and a merge scenario runs through the seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineeringworkshop_spark.tables.backend import (
    DeltaBackend,
    TableBackend,
    delta_available,
    open_table,
)
from tests.conftest import SF_SMOKE


def test_open_table_resolves_here_to_versioned(spark, tmp_path):
    t = open_table(spark, str(tmp_path / "t"))
    from dataengineeringworkshop_spark.tables.versioned import VersionedTable

    if delta_available():  # pragma: no cover - not this container
        assert isinstance(t, DeltaBackend)
    else:
        assert isinstance(t, VersionedTable)
    assert isinstance(t, TableBackend)  # structural protocol check


def test_both_backends_satisfy_protocol():
    # runtime_checkable only inspects attribute presence, so DeltaBackend
    # conformance is checkable without delta-spark installed
    for method in (
        "exists", "write", "read", "update", "delete",
        "merge", "optimize", "add_column", "history",
    ):
        assert callable(getattr(DeltaBackend, method)), method


def test_unknown_backend_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        open_table(spark, str(tmp_path / "t"), backend="iceberg")


def test_merge_scenario_through_seam(spark, tmp_path):
    """The reference's medallion MERGE (`2 Medaillon architecture.py:
    534-540`) driven purely through open_table() + the protocol."""
    from dataengineeringworkshop_spark.plans.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    t = open_table(spark, str(tmp_path / "orders"), backend="versioned")
    assert not t.exists()
    t.write(o)
    assert t.exists()

    src = o.filter(F.col("o_orderkey") % 5 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1
    )
    t.merge(src, on="t.o_orderkey = s.o_orderkey")
    got = t.read()
    assert got.count() == o.count()
    bumped = got.join(o.select("o_orderkey", F.col("o_totalprice").alias("old")),
                      "o_orderkey").filter(F.col("o_totalprice") != F.col("old"))
    assert bumped.count() == o.filter(F.col("o_orderkey") % 5 == 0).count()

    # time travel + history through the same protocol surface
    assert t.read(version=0).exceptAll(o).count() == 0
    ops = [r.operation for r in t.history().collect()]
    assert ops == ["CREATE TABLE AS SELECT", "MERGE"]
