"""Skew-join evidence at sf10 volume (VERDICT r6 #5).

The salted join/agg operators are property-tested for result-invariance,
but no measured run showed them beating the unsalted plan on a genuinely
skewed key at scale. This probe generates a zipfian events-shaped fixture
at sf10 volume (10M rows by default; --rows to scale) with one hot tenant
key carrying 30% of all rows and a log-uniform (zipf-like) tail over 100k
keys, joins it to a 100k-row tenant dim — deliberately NON-broadcastable
(autoBroadcastJoinThreshold=-1, merge hint), the shape where skew hurts —
and measures wall-time for:

  1. unsalted sort-merge join, AQE skew-join OFF  (the naive plan)
  2. unsalted sort-merge join, AQE skew-join ON   (Spark's runtime fix)
  3. ops.skew.salted_join (16 buckets), AQE OFF   (the deterministic fix)
  4. salted_join, AQE ON                          (both together)

plus the aggregation twin (groupBy(key).agg(sum, count) plain vs the
two-phase salted pattern) to record honestly whether map-side partial
aggregation already neutralizes agg skew at this shape.

Every variant's row count is asserted identical — a fast wrong answer is
not a result. Deterministic fixture (xxhash64 of the row id — no RNG), so
runs are comparable across boxes. Results go to SCALE.md by hand with the
box load noted.

Usage: python tools/skew_probe.py [--rows N] [--hot 0.30] [--buckets 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def build_fixture(spark, rows: int, hot_frac: float, n_keys: int):
    """Events-shaped skewed fact + tenant dim. Hot key 0 carries
    ``hot_frac`` of rows; the rest are log-uniform over [1, n_keys] — the
    zipf-like tail (rank-frequency slope ~ -1 in the head)."""
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)) + F.lit(0.5)) / F.lit(1_000_000.0)
    hot = F.pmod(F.xxhash64(F.col("id") + F.lit(7)), F.lit(1000)) < F.lit(
        int(hot_frac * 1000)
    )
    tail_key = F.floor(F.exp(F.log(F.lit(float(n_keys))) * u)).cast("long")
    fact = (
        spark.range(rows)
        .withColumn("tenant_id", F.when(hot, F.lit(0)).otherwise(tail_key))
        .withColumn("value", (F.pmod(F.xxhash64("id"), F.lit(10_000)) / F.lit(100.0)))
        .select("id", "tenant_id", "value")
    )
    dim = spark.range(0, n_keys + 1).select(
        F.col("id").alias("tenant_id"),
        F.concat(F.lit("tenant_"), F.col("id")).alias("tenant_name"),
        F.pmod(F.col("id"), F.lit(50)).alias("tier"),
    )
    return fact, dim


def timed(label: str, df: DataFrame) -> tuple[float, int]:
    t0 = time.time()
    # count() after an agg is cheap and forces full execution of the join;
    # use noop write for the row-preserving variants
    n = df.count()
    dt = round(time.time() - t0, 2)
    print(f"  {label:42s} {dt:8.2f}s  rows={n}")
    return dt, n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--hot", type=float, default=0.30)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    from taico_data_integration_spark.ops.skew import salted_join
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"loadavg at start: {os.getloadavg()}")

    fact, dim = build_fixture(spark, args.rows, args.hot, args.keys)
    # persist the fixture as parquet so every variant reads identical bytes
    # (and the generation cost is excluded from the timings)
    base = "/tmp/taico_skew_probe"
    fact.repartition(32).write.mode("overwrite").parquet(f"{base}/fact")
    dim.write.mode("overwrite").parquet(f"{base}/dim")
    fact = spark.read.parquet(f"{base}/fact")
    dim = spark.read.parquet(f"{base}/dim")
    hot_rows = fact.where("tenant_id = 0").count()
    print(f"rows={args.rows}  hot_key_rows={hot_rows} ({hot_rows/args.rows:.1%})")

    # force the shuffle-join shape where skew hurts: no broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def joined_plain() -> DataFrame:
        return fact.join(dim.hint("merge"), "tenant_id", "inner")

    def joined_salted() -> DataFrame:
        return salted_join(fact, dim, ["tenant_id"], salt_buckets=args.buckets)

    def agg_after(df: DataFrame) -> DataFrame:
        return df.groupBy("tenant_id", "tier").agg(
            F.sum("value").alias("v"), F.count(F.lit(1)).alias("n")
        )

    results: dict[str, tuple[float, int]] = {}
    scenarios = [
        ("join unsalted, AQE skew OFF", "false", joined_plain),
        ("join unsalted, AQE skew ON", "true", joined_plain),
        (f"join salted x{args.buckets}, AQE skew OFF", "false", joined_salted),
        (f"join salted x{args.buckets}, AQE skew ON", "true", joined_salted),
    ]
    print("\n-- join + aggregate (count forces full join execution) --")
    for label, aqe, make in scenarios:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe)
        results[label] = timed(label, agg_after(make()))

    # aggregation twin: does map-side partial agg neutralize agg skew?
    print("\n-- aggregation only (no join) --")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    plain_agg = fact.groupBy("tenant_id").agg(
        F.sum("value").alias("v"), F.count(F.lit(1)).alias("n")
    )
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64("id"), F.lit(args.buckets)).cast("int")
    )
    partial = salted.groupBy("tenant_id", "__salt").agg(
        F.sum("value").alias("pv"), F.count(F.lit(1)).alias("pn")
    )
    salted_agg = partial.groupBy("tenant_id").agg(
        F.sum("pv").alias("v"), F.sum("pn").alias("n")
    )
    results["agg plain"] = timed("agg plain (partial agg on)", plain_agg)
    results["agg salted"] = timed("agg salted two-phase", salted_agg)

    counts = {n for _, n in list(results.values())[:4]}
    if len(counts) != 1:
        raise SystemExit(f"VARIANT ROW COUNTS DIVERGED: {counts}")
    agg_counts = {results["agg plain"][1], results["agg salted"][1]}
    if len(agg_counts) != 1:
        raise SystemExit(f"AGG ROW COUNTS DIVERGED: {agg_counts}")

    print("\n" + json.dumps({k: v[0] for k, v in results.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
