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


def test_sketch_rollup_union_is_lossless(spark):
    """HLL registers are per-bucket maxima, so unioning per-day sketches
    must give EXACTLY the same estimate as one sketch over all rows — the
    property that makes sketch tables roll up without rescanning raw data."""
    from pyspark.sql import functions as F

    from taico_data_integration_spark.catalog import load_table

    e = load_table(spark, "/root/testdata/sf0.001", "events")
    direct = (
        e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"))
    )
    rolled = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    d = {r.event_type: r.est for r in direct.collect()}
    r = {r.event_type: r.est for r in rolled.collect()}
    assert d == r and len(d) > 0
