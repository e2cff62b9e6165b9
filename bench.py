"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with the noop sink (full execution, no driver
collect) so timings reflect distributed work, not result transfer.

Per-query timings are MEDIANS over --repeat passes (default 3, override
with --repeat N or $SPARK_GRAFT_BENCH_REPEAT; VERDICT r7 #5: single-pass
totals on a shared box spanned 41-93s on identical code from host steal —
the median converges to the floor without a solo re-run). `value` is the
sum of medians; provenance records the box load before the JVM boots AND
at the start of every pass, plus each pass's raw total, so a
load-confounded pass is visible in the artifact itself.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    # core relational
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_nation_revenue",
    "computed_key_left_join",
    "customer_order_ranks",
    "quality_checks_lineitem",
    "rollup_revenue",
    "q9_product_profit",
    "q21_sole_returning_supplier",
    # sync/lifecycle
    "merge_upsert_orders",
    "watermark_incremental",
    "events_sessionize",
    "tumbling_events",
    "event_funnel",
    # reference-domain pipelines
    "retail_fct_invoices",
    "fb_ads_transformed",
    "media_relations_rebuild",
    # llm ops
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_bands",
    "dedup_lsh_verified_pairs",
    "dedup_canonical_keepers",
    "dedup_simhash",
    "embedding_neardup",
    "ann_topk",
    "text_langid",
    "multimodal_metadata",
    "contamination_check",
    "curation_pipeline",
    # warehouse lifecycle + analytics
    "scd2_customer_orders",
    "cdc_orders_final_state",
    "resample_user_values",
    "cohort_retention",
    "stratified_mixture_sample",
]


def _provenance() -> dict:
    """Box-load provenance so round-over-round numbers are self-adjudicating
    from the JSON alone (VERDICT r6: driver runs land on a loaded box and
    read 10-25% above solo floors; this records the load they ran under)."""
    prov: dict = {}
    try:
        la1, la5, la15 = os.getloadavg()
        prov["loadavg"] = [round(la1, 2), round(la5, 2), round(la15, 2)]
    except OSError:
        pass
    try:  # resident JVMs = other Spark/driver processes competing for CPU
        import subprocess

        out = subprocess.run(
            ["ps", "-eo", "comm="], capture_output=True, text=True, timeout=10
        ).stdout
        prov["resident_jvms"] = sum(1 for line in out.splitlines() if "java" in line)
    except Exception:
        pass
    try:
        prov["cpus"] = os.cpu_count()
    except Exception:
        pass
    return prov


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--repeat",
        type=int,
        default=int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3")),
        help="timed passes per query; the reported timing is the median",
    )
    args = ap.parse_args()
    repeat = max(1, args.repeat)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from taico_data_integration_spark.queries import all_queries
    from taico_data_integration_spark.session import get_spark

    provenance = _provenance()  # sampled BEFORE our own JVM boots
    spark = get_spark("taico-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Record the EFFECTIVE execution shape, not just os.cpu_count(): the
    # driver re-runs the bench at a lower $SPARK_GRAFT_CPUS to measure
    # scaling, and os.cpu_count() reads the same 32 either way — master /
    # defaultParallelism / shuffle partitions are what actually changed
    # (VERDICT r12 #2: the scaling probe flagged suspect_cpus_ignored
    # because provenance could not show the master it ran under).
    provenance["master"] = spark.sparkContext.master
    provenance["default_parallelism"] = spark.sparkContext.defaultParallelism
    provenance["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
    qs = all_queries()

    # Warm the JVM/codegen/parquet paths: run every benchmark query once at
    # the smoke scale factor so whole-stage-codegen compilation (identical
    # plan shapes, cached generated classes) isn't billed to the timed runs.
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    for name in BENCH_QUERIES:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    passes: list[dict[str, float]] = []
    pass_prov: list[dict] = []
    for _ in range(repeat):
        try:
            la1, la5, la15 = os.getloadavg()
            load = [round(la1, 2), round(la5, 2), round(la15, 2)]
        except OSError:
            load = []
        timings: dict[str, float] = {}
        for name in BENCH_QUERIES:
            fn = qs[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.time() - t0, 3)
        passes.append(timings)
        pass_prov.append(
            {"loadavg": load, "total": round(sum(timings.values()), 3)}
        )

    medians = {
        name: round(statistics.median(p[name] for p in passes), 3)
        for name in BENCH_QUERIES
    }
    total = round(sum(medians.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    provenance["repeat"] = repeat
    provenance["passes"] = pass_prov
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": medians,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "provenance": provenance,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
