"""Planted-case tests for deterministic stratified sampling."""

from __future__ import annotations

from taico_data_integration_spark.ops.sampling import stratified_hash_sample


def _df(spark):
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(200)]
    return spark.createDataFrame(rows, "id long, stratum string")


def test_extremes_are_exact(spark):
    df = _df(spark)
    out = stratified_hash_sample(df, "id", "stratum", {"a": 100.0, "b": 0.0})
    got = {r.stratum for r in out.select("stratum").distinct().collect()}
    assert got == {"a"}
    assert out.count() == 100


def test_membership_is_content_stable(spark):
    df = _df(spark)
    frac = {"a": 30.0, "b": 70.0}
    a = {r.id for r in stratified_hash_sample(df, "id", "stratum", frac).collect()}
    b = {
        r.id
        for r in stratified_hash_sample(
            df.repartition(7, "stratum"), "id", "stratum", frac
        ).collect()
    }
    assert a == b and a  # same membership regardless of layout


def test_default_fraction_drops_unlisted_strata(spark):
    df = _df(spark)
    out = stratified_hash_sample(df, "id", "stratum", {"a": 100.0})
    assert out.where("stratum = 'b'").count() == 0
