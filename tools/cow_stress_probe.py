"""sf10-scale multi-process COW/vacuum stress (VERDICT r10 #5).

The CI test (tests/test_storage_commit.py::
test_multiprocess_cow_stress_on_conditional_put) runs 3 processes x 8
ops over a 5k-row base — bounded for the suite. This probe runs the
SAME worker (tests/_tablestore_worker.py cow_stress) against an
sf10-scale base table (~7.8M rows, replicated sf0.1 lineitem keys,
cluster-optimized into 32 files) with more writers and more ops, on one
shared ConditionalPutCommit(LocalEmulatedBackend) store. Asserts the
same invariants — zero lost updates, zero torn reads,
ConcurrentWriteError-retry the only failure — and prints the wall/
conflict numbers for SCALE.md.

Usage: python tools/cow_stress_probe.py [sf_dir] [replicas] [workers] [ops]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from taico_data_integration_spark.ops.incremental import TableStore  # noqa: E402
from taico_data_integration_spark.ops.storage_commit import (  # noqa: E402
    ConditionalPutCommit,
    LocalEmulatedBackend,
)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    n_workers = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_ops = int(sys.argv[4]) if len(sys.argv) > 4 else 12
    out_root = "/tmp/cow_stress_probe"
    shutil.rmtree(out_root, ignore_errors=True)
    os.makedirs(out_root)
    root = os.path.join(out_root, "store")

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "32g")
        .appName("cow-stress-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    # base keys NEGATIVE: worker key ranges (wid*1M..) can never collide
    base = li.crossJoin(F.broadcast(rep)).select(
        (
            -(
                (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * replicas
                + F.col("rep")
            )
        ).alias("k"),
        F.col("l_quantity").cast("double").alias("v"),
    )
    store = TableStore(
        spark, root, commit=ConditionalPutCommit(LocalEmulatedBackend())
    )
    t0 = time.time()
    store.write("t", base)
    store.optimize_layout("t", ["k"], num_files=32)
    store.collect_file_stats("t", ["k"])
    base_rows = store.read("t").count()
    print(f"base: {base_rows} rows, build {time.time() - t0:.1f}s", flush=True)

    worker = os.path.join("/root/repo/tests", "_tablestore_worker.py")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    procs, results = [], {}
    t1 = time.time()
    for wid in range(1, n_workers + 1):
        results[wid] = os.path.join(out_root, f"w{wid}.json")
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, "cow_stress", root, str(wid), str(n_ops), results[wid]],
                env=env,
            )
        )
    for p in procs:
        rc = p.wait(timeout=3600)
        if rc != 0:
            print(f"worker exited {rc}", flush=True)
            return 1
    wall = time.time() - t1

    expected = None  # verify via counts: base untouched + ledger union
    total_conflicts, total_final = 0, set()
    ok = True
    for wid in range(1, n_workers + 1):
        with open(results[wid]) as f:
            r = json.load(f)
        if not r["ok"] or r["torn"]:
            print(f"worker {wid} FAILED: {json.dumps(r)[:500]}", flush=True)
            ok = False
        total_conflicts += r["conflicts"]
        total_final |= set(r["final_keys"])
    got_pos = {
        r.k for r in store.read("t").where(F.col("k") >= 0).select("k").collect()
    }
    n_base_now = store.read("t").where(F.col("k") < 0).count()
    if got_pos != total_final:
        print(
            f"LOST UPDATES: missing {sorted(total_final - got_pos)[:5]} "
            f"phantom {sorted(got_pos - total_final)[:5]}",
            flush=True,
        )
        ok = False
    if n_base_now != base_rows:
        print(f"BASE CORRUPTED: {n_base_now} != {base_rows}", flush=True)
        ok = False
    print(
        json.dumps(
            {
                "ok": ok,
                "base_rows": base_rows,
                "workers": n_workers,
                "ops_each": n_ops,
                "wall_s": round(wall, 1),
                "conflicts_retried": total_conflicts,
                "live_versions": len(store.history("t")),
                "worker_keys_final": len(total_final),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
