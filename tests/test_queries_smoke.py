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


def test_registry_rotation_least_graded_first(tmp_path, monkeypatch):
    """The driver grades a fixed-size prefix of all_queries(); the registry
    orders least-driver-graded queries first so the prefix rotates through
    the full surface across rounds (VERDICT r2, 'Next round' #1)."""
    import json

    import taico_data_integration_spark.queries as q

    # Synthesize two rounds of driver grading in a fake repo root. Names
    # 0..4 green twice, 5..7 green once, name 8 graded but RED (must keep
    # never-graded priority), rest never graded.
    reg_names = list(q._registry())
    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    red = {"rows_match": False, "schema_match": True, "hash_match": False, "err": None}
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({n: green for n in reg_names[:5]})
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {**{n: green for n in reg_names[:8]}, reg_names[8]: red}
        )
    )

    def fake_counts():
        counts: dict[str, int] = {}
        for p in sorted(tmp_path.glob("CORRECTNESS_r*.json")):
            for n, row in json.loads(p.read_text()).items():
                if row.get("rows_match") and row.get("schema_match") and row.get("hash_match") and row.get("err") is None:
                    counts[n] = counts.get(n, 0) + 1
        return counts

    real_counts = q._grade_counts
    monkeypatch.setattr(q, "_grade_counts", fake_counts)
    try:
        ordered = list(q.all_queries())
    finally:
        monkeypatch.setattr(q, "_grade_counts", real_counts)

    # Red/never-graded queries first (registry order, incl. the red name 8),
    # then once-green (5..7), then twice-green (0..4).
    assert ordered[: len(reg_names) - 8] == reg_names[8:]
    assert ordered[-8:-5] == reg_names[5:8]
    assert ordered[-5:] == reg_names[:5]
    assert set(ordered) == set(reg_names)


def test_registry_rotation_prefix_is_ungraded():
    """With the real CORRECTNESS files present, the driver's 50-query prefix
    must consist entirely of queries it has graded the fewest times."""
    from taico_data_integration_spark.queries import _grade_counts

    counts = _grade_counts()
    if not counts:
        pytest.skip("no driver CORRECTNESS files in repo root")
    names = list(_QUERIES)
    prefix_max = max(counts.get(n, 0) for n in names[:50])
    rest_min = min(counts.get(n, 0) for n in names[50:])
    assert prefix_max <= rest_min


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


def test_er_blocking_cardinality_scales_with_rows(spark):
    """ADVICE r2: the old substr(name,1,9) block was the constant 'Supplier#'
    for every TPC-H supplier — an all-pairs cross join hashed to one key.
    The deletion-neighborhood keys must instead grow with the input and have
    no hot block: distinct keys >= rows, max block size a small collision
    constant."""
    from pyspark.sql import functions as F

    from taico_data_integration_spark.catalog import load_table
    from taico_data_integration_spark.queries.extended import er_deletion_variants

    s = load_table(spark, "/root/testdata/sf0.01", "supplier")
    n_rows = s.count()
    v = er_deletion_variants(s.select(F.col("s_name").alias("canonical")), "canonical")
    stats = v.groupBy("del_variant").count().agg(
        F.count(F.lit(1)).alias("n_blocks"), F.max("count").alias("max_block")
    ).collect()[0]
    assert stats.n_blocks >= n_rows  # O(rows·len) distinct keys, not O(1)
    # max block = #canonicals one insertion away from a variant string,
    # bounded by len·|alphabet| regardless of corpus size (observed 19 on
    # the zero-padded digit names) — never O(rows)
    assert stats.max_block <= 64 and stats.max_block < n_rows / 2


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
