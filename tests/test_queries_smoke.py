"""Smoke: every registered query runs at sf0.001 with a stable schema, and
every oracle key refers to a real query. (Value-level parity vs DuckDB is
covered by tools/compare_oracle.py and the driver's t2 gate.)"""

from __future__ import annotations

import pytest

from taico_data_integration_spark.queries import all_oracles, all_queries

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_runs(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert len(df.columns) > 0
    assert df.count() >= 0


def test_oracles_subset_of_queries():
    assert set(all_oracles()) <= set(_QUERIES)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
