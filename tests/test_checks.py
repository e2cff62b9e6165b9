"""Check engine tested against known-bad fixtures (SURVEY.md §5: nulls,
dupes, negatives, bad domains, short tables)."""

from __future__ import annotations

from pyspark.sql import Row

from taico_data_integration_spark.checks.engine import Check, run_checks, schema_check


def _bad_df(spark):
    rows = [
        Row(id=1, name="a", company_id=10, cost=5.0, cluster="Digital"),
        Row(id=2, name=None, company_id=10, cost=-1.0, cluster="Bogus"),
        Row(id=2, name="a", company_id=10, cost=2.0, cluster="CRM"),
        Row(id=3, name="a", company_id=10, cost=900.0, cluster="Classical"),
    ]
    return spark.createDataFrame(rows)


def test_run_checks_flags_all_failures(spark):
    df = _bad_df(spark)
    checks = [
        Check("not_null", "name_not_null", {"column": "name"}),
        Check("unique", "id_unique", {"columns": ["id"]}),
        Check("unique", "name_company_unique", {"columns": ["name", "company_id"]}),
        Check("min_rows", "min_rows_100", {"n": 100}),
        Check("non_negative", "cost_non_negative", {"column": "cost"}),
        Check("accepted_values", "cluster_domain", {"column": "cluster", "values": ["Classical", "CRM", "Digital"]}),
        Check("in_range", "cost_range", {"column": "cost", "lo": 0, "hi": 100}),
        Check("cross_column", "cost_lt_1000", {"predicate": "cost < 1000"}),
    ]
    res = {r["name"]: r for r in run_checks(df, checks)}
    assert res["name_not_null"]["metric"] == 1 and not res["name_not_null"]["ok"]
    assert res["id_unique"]["metric"] == 1 and not res["id_unique"]["ok"]
    assert res["name_company_unique"]["metric"] == 2  # three rows share (a, 10)
    assert not res["min_rows_100"]["ok"]
    assert res["cost_non_negative"]["metric"] == 1
    assert res["cluster_domain"]["metric"] == 1
    assert res["cost_range"]["metric"] == 2  # -1 and 900
    assert res["cost_lt_1000"]["ok"]


def test_checks_pass_on_clean_data(spark):
    df = spark.createDataFrame([Row(id=i, name=f"n{i}") for i in range(150)])
    checks = [
        Check("not_null", "nn", {"column": "name"}),
        Check("unique", "uq", {"columns": ["id"]}),
        Check("min_rows", "mr", {"n": 100}),
    ]
    assert all(r["ok"] for r in run_checks(df, checks))


def test_schema_check_sets_and_types(spark):
    df = spark.createDataFrame([Row(id=1, name="x")])
    ok = schema_check(df, {"id", "name"}, {"id": "bigint", "name": "string"})
    assert ok["ok"]
    bad = schema_check(df, {"id", "name", "extra"})
    assert not bad["ok"] and bad["missing_columns"] == ["extra"]
    bad_type = schema_check(df, {"id", "name"}, {"id": "int", "name": "string"})
    assert not bad_type["ok"] and "id" in bad_type["type_mismatches"]


def test_unique_check_no_sentinel_or_separator_collisions(spark):
    """NULL components must not collide with literal sentinel values, and
    values containing the old '|' separator must not alias across columns."""
    rows = [
        Row(a=None, b=" "),   # NULL vs single-space: distinct keys
        Row(a=" ", b=" "),
        Row(a="1|2", b="3"),  # '1|2','3' vs '1','2|3': distinct keys
        Row(a="1", b="2|3"),
        Row(a="x", b="y"),
        Row(a="x", b="y"),    # the only real duplicate
    ]
    df = spark.createDataFrame(rows)
    res = {r["name"]: r for r in run_checks(df, [Check("unique", "uq", {"columns": ["a", "b"]})])}
    assert res["uq"]["metric"] == 1


def test_observed_checks_ride_along_with_action(spark, tmp_path):
    """attach_observed_checks yields identical results to the dedicated
    run_checks pass, but collected as a side effect of the caller's own
    write action — zero extra scans; unique checks are rejected loudly."""
    import pytest as _pytest

    from taico_data_integration_spark.checks.engine import (
        Check,
        attach_observed_checks,
        run_checks,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    suite = [
        Check("not_null", "orderkey_not_null", {"column": "l_orderkey"}),
        Check("min_rows", "enough_rows", {"n": 100}),
        Check("non_negative", "qty_non_negative", {"column": "l_quantity"}),
        Check("accepted_values", "returnflag_domain", {"column": "l_returnflag", "values": ["A", "N", "R"]}),
        Check("in_range", "discount_range", {"column": "l_discount", "lo": 0.0, "hi": 0.2}),
        Check("cross_column", "price_positive_when_qty", {"predicate": "l_extendedprice >= 0 OR l_quantity = 0"}),
    ]
    observed, evaluate = attach_observed_checks(df, suite)
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))  # the caller's action
    got = evaluate()
    expected = run_checks(df, suite)
    assert got == expected
    assert all(r["ok"] for r in got)

    with _pytest.raises(ValueError, match="unique"):
        attach_observed_checks(df, [Check("unique", "u", {"columns": ["l_orderkey"]})])


def test_checks_fuzz_matches_python_model(spark):
    """All seven check kinds over random null-riddled data vs a pure-Python
    evaluator — pinning the SQL three-valued-logic edges: accepted_values /
    non_negative / in_range ignore NULLs, unique is null-safe on composite
    keys, cross_column counts rows where the predicate is FALSE (not NULL)."""
    import random

    for seed in (3, 13, 43):
        rng = random.Random(seed)
        rows = [
            (
                rng.choice([None, rng.randint(-5, 5)]),
                rng.choice([None, rng.randint(-5, 5)]),
                rng.choice([None, "x", "y", "z", "w"]),
            )
            for _ in range(rng.randint(1, 60))
        ]
        df = spark.createDataFrame(rows, "a long, b long, s string")
        lo, hi = sorted(rng.sample(range(-5, 6), 2))
        min_n = rng.randint(1, 80)
        checks = [
            Check("not_null", "c1", {"column": "a"}),
            Check("unique", "c2", {"columns": ["a", "b"]}),
            Check("min_rows", "c3", {"n": min_n}),
            Check("accepted_values", "c4", {"column": "s", "values": ["x", "y"]}),
            Check("non_negative", "c5", {"column": "a"}),
            Check("in_range", "c6", {"column": "b", "lo": lo, "hi": hi}),
            Check("cross_column", "c7", {"predicate": "a IS NULL OR b IS NULL OR a <= b"}),
        ]
        got = {r["name"]: (r["metric"], r["ok"]) for r in run_checks(df, checks)}
        n = len(rows)
        m = {
            "c1": sum(1 for a, _, _ in rows if a is None),
            "c2": n - len({(a, b) for a, b, _ in rows}),
            "c3": n,
            "c4": sum(1 for _, _, s in rows if s is not None and s not in ("x", "y")),
            "c5": sum(1 for a, _, _ in rows if a is not None and a < 0),
            "c6": sum(1 for _, b, _ in rows if b is not None and not (lo <= b <= hi)),
            "c7": sum(
                1 for a, b, _ in rows if a is not None and b is not None and a > b
            ),
        }
        expected = {
            name: (v, v >= min_n if name == "c3" else v == 0) for name, v in m.items()
        }
        assert got == expected, f"seed {seed}"
