"""Per-query profiling for the optimization rounds: for each headline query,
time (a) DataFrame construction + analysis (driver/Python side) and (b) the
noop-sink execution, separately, and dump .explain('formatted') to
plans/<tag>/<query>_<suffix>.txt.

Usage: python tools/profile_queries.py [--sf-dir DIR] [--repeat N]
         [--tag r12] [--suffix before] [query ...]

Timings print as one JSON line per query plus a summary JSON line, so runs
are diffable. The bench contract itself is untouched (bench.py).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="")
    ap.add_argument("--no-plans", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from taico_data_integration_spark.queries import all_queries
    from taico_data_integration_spark.session import get_spark

    names = args.queries or BENCH_QUERIES
    spark = get_spark("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(plans_dir, exist_ok=True)

    # Warm codegen/parquet paths at the smoke scale factor (same as bench.py).
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")
    for name in names:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    results = {}
    for name in names:
        fn = qs[name]
        build_times, exec_times = [], []
        for _ in range(args.repeat):
            t0 = time.time()
            df = fn(spark, args.sf_dir)
            t1 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            build_times.append(t1 - t0)
            exec_times.append(t2 - t1)
        rec = {
            "build": round(statistics.median(build_times), 3),
            "exec": round(statistics.median(exec_times), 3),
            "total": round(statistics.median(b + e for b, e in zip(build_times, exec_times)), 3),
        }
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        if not args.no_plans and args.suffix:
            from taico_data_integration_spark.plans.explain import formatted_plan

            df = fn(spark, args.sf_dir)
            plan = formatted_plan(df)
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)

    print(
        json.dumps(
            {
                "metric": "profile_total",
                "build_total": round(sum(r["build"] for r in results.values()), 3),
                "exec_total": round(sum(r["exec"] for r in results.values()), 3),
                "value": round(sum(r["total"] for r in results.values()), 3),
                "sf_dir": args.sf_dir,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
