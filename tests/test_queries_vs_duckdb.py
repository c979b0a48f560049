"""Every oracle-paired registry query must match DuckDB at sf0.001
(fast gate — the driver runs the same shape at sf0.01)."""

from __future__ import annotations

import os

import pytest

from tests.conftest import SF_SMOKE
from tests.oracle_compare import compare, duck_connection

SF_DIR = os.environ.get("DEW_TEST_SF_DIR", SF_SMOKE)


def _registry():
    from dataengineeringworkshop_spark.plans.registry import load_all

    return load_all()


NAMES = sorted(_registry().keys())


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, duck, name):
    spec = _registry()[name]
    df = spec.fn(spark, SF_DIR)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only smoke
        return
    problems = compare(df, duck, spec.oracle, name)
    assert not problems, "\n".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) == 4
