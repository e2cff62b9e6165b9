"""Physical-plan assertions: pushdown, pruning, broadcast — the 100 TB
design contract (SURVEY.md §4). A scan that reads all columns for a 2-column
projection, or a shuffle join against a 25-row dim, is a regression."""

from __future__ import annotations

from pyspark.sql import functions as F

from taico_data_integration_spark.catalog import load_table
from taico_data_integration_spark.queries.core import q1_pricing_summary, q5_nation_revenue

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    df = l.where(F.col("l_shipdate") <= "2000-09-02").select("l_quantity")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_column_pruning_reaches_scan(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    df = l.select("l_returnflag").distinct()
    plan = _formatted(df)
    # ReadSchema restricted to the single projected column
    assert "l_returnflag" in plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_q1_uses_partial_aggregation(spark):
    plan = _plan(q1_pricing_summary(spark, SF_DIR))
    assert "partial" in plan.lower()  # map-side combine before shuffle


def test_q5_broadcasts_small_dims(spark):
    plan = _plan(q5_nation_revenue(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region


def test_anti_join_is_distributed_join(spark):
    from taico_data_integration_spark.queries.core import customers_without_orders

    plan = _plan(customers_without_orders(spark, SF_DIR))
    assert "LeftAnti" in plan


def test_no_join_antipatterns_across_all_queries(spark):
    """Scale guard over the ENTIRE query surface: no CartesianProduct
    anywhere, and BroadcastNestedLoopJoin only where the non-streamed side
    is 1-row/scalar or an intentionally-broadcast query set. A new query
    that accidentally cross-joins two fact-sized frames fails here, not at
    100 TB."""
    import __spark_entry__ as em

    # name -> why BNLJ is legitimate there (non-streamed side cardinality)
    bnlj_ok = {
        "q22_idle_rich_customers": "scalar avg-acctbal subquery (1 row)",
        "watermark_incremental": "1-row max-watermark aggregate",
        "q11_important_suppliers": "1-row global-total aggregate",
        "fuzzy_name_match": "dim-sized fuzzy side, inequality join by design",
        "ann_topk": "broadcast query set (documented brute-force baseline)",
        "multimodal_feature_ann": "broadcast query set (same brute-force baseline over decoded features)",
        "text_top_terms": "broadcast 1-row corpus-size aggregate",
        "basket_association_rules": "broadcast 1-row order-total aggregate",
    }
    sf = "/root/testdata/sf0.001"
    offenders = {}
    for name, fn in em.queries().items():
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            offenders[name] = "BroadcastNestedLoopJoin (not allowlisted)"
    assert not offenders, f"join anti-patterns: {offenders}"


def test_aqe_splits_planted_skew(spark):
    """SCALE.md claims AQE handles residual key skew; pin it (VERDICT r3
    #5): a planted hot key (3/4 of all left rows) forced through a
    sort-merge join must come out of adaptive execution with the skewed
    partition actually split — 'skew=true' on the join in the FINAL
    (post-execution) adaptive plan — with the skew thresholds lowered to
    test scale. This is the runtime half of the skew story; the manual
    salting half is pinned by salted_priority_join/salted_event_counts."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "262144",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "65536",
    }
    old = {}
    for k in confs:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 120_000).select(
            F.when(F.col("id") % 4 != F.lit(0), F.lit(0).cast("bigint"))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 96), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(0, 1_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        j = left.join(right, "k").select("k", "v", "payload")
        # Execute j ITSELF (collect, not count) so ITS adaptive plan is the
        # finalized one. k=0: 90_000 hot rows (id%4!=0) + id=0 itself; plus
        # ids 4..996 step 4 (249 rows) matching their own key < 1000.
        assert len(j.collect()) == 90_001 + 249
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
