"""sf10 before/after for the chain-compaction POLICY (VERDICT r10 #2).

Round 10 measured read-plan growth under reference chains (12 chained
merges -> 15 scan branches) and left compaction as operator guidance.
Round 11 makes it an engine policy (TableStore(max_chain_branches=...)).
This probe builds the same sf10-scale store twice from replicated sf0.1
lineitem (~60M rows) and runs the same 12 chained single-key merges:

- budget OFF: branch count grows one generation per merge (the r10
  baseline shape) — record final branches, full-count latency;
- budget ON (max_chain_branches=4): the policy compacts inline the
  moment a commit exceeds the budget — record per-merge branch counts
  (never above the budget), the number of inline compacts the policy
  paid, total merge-loop wall time, and the same final count latency.

Results land in SCALE.md (round 11 section).

Usage: python tools/chain_budget_probe.py [sf_dir] [replicas] [out_root]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from taico_data_integration_spark.ops.incremental import TableStore  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    out_root = sys.argv[3] if len(sys.argv) > 3 else "/tmp/chain_budget_probe"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("chain-budget-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out_root, ignore_errors=True)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    # unique synthetic key per replicated row: (orderkey, linenumber, rep)
    big = (
        li.crossJoin(F.broadcast(rep))
        .select(
            (
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * replicas
                + F.col("rep")
            ).alias("k"),
            F.col("l_quantity").cast("double").alias("v"),
            F.col("l_shipdate").alias("d"),
        )
    )

    def build(name: str, **store_kw) -> TableStore:
        store = TableStore(spark, os.path.join(out_root, name), **store_kw)
        t0 = time.time()
        store.write("t", big)
        store.optimize_layout("t", ["k"], num_files=16)
        print(f"[{name}] build+cluster {time.time() - t0:.1f}s", flush=True)
        return store

    def merge_loop(store: TableStore, name: str, n_merges: int = 12) -> dict:
        n0 = store.read("t").count()
        branch_trace, t0 = [], time.time()
        for i in range(1, n_merges + 1):
            batch = spark.createDataFrame(
                [(int(i * 997), -float(i), "1996-01-01")], "k bigint, v double, d string"
            ).withColumn("d", F.col("d").cast("date"))
            store.merge_in("t", batch, "k")
            branch_trace.append(store.chain_branches("t"))
        loop_s = time.time() - t0
        tc = time.time()
        n1 = store.read("t").count()
        count_s = time.time() - tc
        entry = next(
            e
            for e in store._read_meta("t")["versions"]
            if e["v"] == store._read_meta("t")["current"]
        )
        files = len(store._version_filemap("t", entry))
        out = {
            "name": name,
            "rows": n1,
            "rows_delta": n1 - n0,
            "branch_trace": branch_trace,
            "final_branches": branch_trace[-1],
            "files": files,
            "merge_loop_s": round(loop_s, 2),
            "full_count_s": round(count_s, 2),
        }
        print(json.dumps(out), flush=True)
        return out

    free = build("free")
    r_free = merge_loop(free, "budget-off")

    capped = build("capped", max_chain_branches=4)
    r_capped = merge_loop(capped, "budget-on(4)")
    # inline compacts the policy paid = committed versions beyond the
    # mutation commits themselves (each compact publishes one version)
    versions_free = len(free._read_meta("t")["versions"])
    versions_capped = len(capped._read_meta("t")["versions"])
    r_capped["inline_compacts"] = versions_capped - versions_free

    same = r_free["rows"] == r_capped["rows"]
    print(
        json.dumps(
            {
                "rows_equal": same,
                "free": r_free,
                "capped": r_capped,
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
