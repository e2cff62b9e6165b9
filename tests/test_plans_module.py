"""plans.explain helper tests over real queries."""

from __future__ import annotations

from taico_data_integration_spark.plans.explain import (
    join_kinds,
    plan_summary,
    pushed_filters,
)
from taico_data_integration_spark.queries.core import q1_pricing_summary, q5_nation_revenue

SF_DIR = "/root/testdata/sf0.001"


def test_plan_summary_shape(spark):
    s = plan_summary(q1_pricing_summary(spark, SF_DIR))
    assert s["partial_agg"] is True
    assert s["exchanges"] >= 1
    assert any("l_shipdate" in f for f in s["pushed_filters"])


def test_join_kinds_q5(spark):
    kinds = join_kinds(q5_nation_revenue(spark, SF_DIR))
    assert kinds.count("BroadcastHashJoin") >= 3
