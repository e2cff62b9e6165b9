"""Bucketing: pre-partitioned co-located joins (SCALE.md star-join notes).
Writing both fact tables bucketed by the join key removes the shuffle from
the join entirely — the plan must contain zero exchanges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taico_data_integration_spark.catalog import load_table
from taico_data_integration_spark.plans.explain import exchange_count, join_kinds

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    (
        orders.write.mode("overwrite")
        .option("path", str(wh / "orders_bucketed"))
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_bucketed")
    )
    (
        lineitem.write.mode("overwrite")
        .option("path", str(wh / "lineitem_bucketed"))
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_bucketed")
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.table("orders_bucketed")
        l = spark.table("lineitem_bucketed")
        j = l.join(o, l.l_orderkey == o.o_orderkey).select("l_orderkey", "o_totalprice")
        j.write.format("noop").mode("overwrite").save()
        assert "SortMergeJoin" in join_kinds(j)
        assert exchange_count(j) == 0, "bucketed join must not shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_unbucketed_join_shuffles(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, SF_DIR, "orders")
        l = load_table(spark, SF_DIR, "lineitem")
        j = l.join(o, l.l_orderkey == o.o_orderkey).select("l_orderkey", "o_totalprice")
        j.write.format("noop").mode("overwrite").save()
        assert exchange_count(j) >= 2  # both sides shuffle on the key
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
