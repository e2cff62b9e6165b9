"""The driver runs `__spark_entry__` under a VANILLA SparkSession — Spark 4
defaults (ANSI on, no nanosAsLong conf, no session tuning). Every table-load
path must self-heal via catalog.ensure_runtime_confs. This test replays that
environment in a clean subprocess (fresh JVM, no engine session factory)."""

from __future__ import annotations

import subprocess
import sys

PROBE = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-probe")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

assert len(e.entry(spark).collect()) > 0

qs = e.queries()
# events table is the nanos-timestamp hazard; orders exercises ANSI casts;
# round-2 additions: sketch aggs, mapInPandas decode, kmeans quantized path
for name in (
    "tumbling_events",
    "golden_record_users",
    "cdc_orders_final_state",
    "sketch_distinct_rollup",
    "multimodal_decode",
    "revenue_trend_by_nation",
    "text_top_terms",
    "kmeans_embedding_clusters",
):
    rows = qs[name](spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0, name
print("VANILLA-OK")
"""


def test_entry_and_queries_under_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", PROBE],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "VANILLA-OK" in out.stdout, out.stderr[-2000:]
