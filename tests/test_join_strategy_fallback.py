"""Join-strategy robustness: results must be identical when broadcast
joins are unavailable (autoBroadcastJoinThreshold=-1 forces shuffle joins
for every non-hinted join). On a real cluster this is the regime a 100 TB
fact-fact join lives in — correctness can't depend on AQE picking BHJ.
"""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

JOIN_HEAVY = [
    "q5_nation_revenue",
    "q9_product_profit",
    "q21_sole_returning_supplier",
    "media_relations_rebuild",
    "scd2_customer_orders",
    "cdc_orders_final_state",
    "dedup_lsh_verified_pairs",
    "dedup_incremental_lsh",
    "leakage_safe_split",
]


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", JOIN_HEAVY)
def test_same_result_without_broadcast(spark, name):
    from taico_data_integration_spark.queries import all_queries

    fn = all_queries()[name]
    default = _canon(fn(spark, SF))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced = _canon(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert default == forced
