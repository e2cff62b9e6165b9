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


def test_skyline_planted_dominance(spark):
    """Planted Pareto case: only the non-dominated (price, size) points
    survive; duplicates of a skyline point all survive (no strict edge)."""
    from taico_data_integration_spark.queries.extended import skyline_parts
    import taico_data_integration_spark.queries.extended as ext
    from pyspark.sql import functions as F

    rows = [
        (1, "a", 10.00, 5),   # skyline (cheapest)
        (2, "b", 12.00, 8),   # skyline (bigger, pricier)
        (3, "c", 12.00, 8),   # duplicate of 2 -> also survives
        (4, "d", 12.00, 3),   # dominated by 2 (same price, smaller)
        (5, "e", 15.00, 8),   # dominated by 2 (pricier, same size)
        (6, "f", 20.00, 9),   # skyline (biggest)
        (7, "g", 25.00, 1),   # dominated by everything cheaper+bigger
    ]
    df = spark.createDataFrame(
        rows, ["p_partkey", "p_name", "p_retailprice", "p_size"]
    )

    # run the same formulation against the in-memory frame by monkeypatching T
    orig_t = ext.T
    try:
        ext.T = lambda _s, _d, _n: df
        got = {r.p_partkey for r in skyline_parts(spark, "unused").collect()}
    finally:
        ext.T = orig_t
    assert got == {1, 2, 3, 6}
