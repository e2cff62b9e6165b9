"""Measure the round-9 COW surfaces on a PARTITIONED store at sf10.

Loads lineitem (60 M rows at sf10) into a TableStore partitioned by a
derived tenant column (8 Hive dirs, orderkey-range-clustered files inside
each), then times:

  tenant-del   delete_where on the PARTITION column (one tenant dies) —
               the round-9 partition-value stats must isolate exactly
               that tenant's files; everything else hard-links.
  key-del      delete_in of 10 scattered l_orderkey values — per-tenant
               range files prune by stats; <= 10 files rewrite.
  comp-merge   merge_in of a 100-key COMPOSITE (l_orderkey, l_linenumber)
               update batch — the reference's sync-key shape on the
               partitioned layout.
  full         write(filter(...)) — the anti-join full-rewrite baseline
               the fast paths are supposed to beat.

Usage: python tools/cow_partitioned_probe.py [sf10_dir] [store_dir]
       python tools/cow_partitioned_probe.py --condput [sf10_dir] [store_dir]
Defaults: /tmp/taico_sf10  /tmp/taico_cowp_store (reused if present;
condput mode defaults to /tmp/taico_cowp_condput).
``--condput`` runs the SAME lifecycle through ConditionalPutCommit on
the local emulated object backend (VERDICT r9 #7) and reports the
object-store REQUEST/BYTE accounting per mutation — with round-10
share-by-reference manifests a COW commit copies only its rewrite
outputs, so the parquet_copies column is the proof that commit cost is
O(changed files) in requests, not just bytes.
Run alone — concurrent load inflates every number.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taico_data_integration_spark.ops.incremental import TableStore, merge_upsert  # noqa: E402
from taico_data_integration_spark.ops.storage_commit import (  # noqa: E402
    ConditionalPutCommit,
    LocalEmulatedBackend,
)
from taico_data_integration_spark.session import get_spark  # noqa: E402

ARGS = [a for a in sys.argv[1:] if a != "--condput"]
CONDPUT = "--condput" in sys.argv[1:]
SF_DIR = ARGS[0] if len(ARGS) > 0 else "/tmp/taico_sf10"
STORE = ARGS[1] if len(ARGS) > 1 else (
    "/tmp/taico_cowp_condput" if CONDPUT else "/tmp/taico_cowp_store"
)


class _CountingBackend(LocalEmulatedBackend):
    """Counts object-store requests/bytes per mutation window."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.copies = 0
        self.copy_bytes = 0
        self.parquet_copies = 0
        self.puts = 0

    def snapshot(self) -> dict:
        return {
            "copies": self.copies,
            "parquet_copies": self.parquet_copies,
            "copy_mb": round(self.copy_bytes / 1e6, 1),
            "puts": self.puts,
        }

    def copy(self, src, dst):
        self.copies += 1
        try:
            self.copy_bytes += os.path.getsize(src)
        except OSError:
            pass
        if src.endswith(".parquet"):
            self.parquet_copies += 1
        super().copy(src, dst)

    def put(self, key, data):
        self.puts += 1
        super().put(key, data)

    def put_if_absent(self, key, data=b""):
        self.puts += 1
        return super().put_if_absent(key, data)


def main() -> None:
    spark = get_spark()
    backend = _CountingBackend() if CONDPUT else None
    store = TableStore(
        spark,
        STORE,
        commit=ConditionalPutCommit(backend) if CONDPUT else None,
    )

    def io_snapshot() -> dict:
        if backend is None:
            return {}
        snap = backend.snapshot()
        backend.reset()
        return {"io": snap}
    t0 = time.time()
    if not store.exists("li"):
        li = (
            spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
            .select(
                "l_orderkey",
                "l_linenumber",
                F.col("l_quantity").cast("double").alias("qty"),
                F.col("l_extendedprice").cast("double").alias("price"),
            )
            .withColumn("tenant", (F.col("l_orderkey") % 8).cast("int"))
        )
        store.write("li", li.repartitionByRange(4, "l_orderkey"), partition_by=["tenant"])
        print(f"load: {time.time() - t0:.1f}s")
    if backend is not None:
        backend.reset()
    n = store.read("li").count()
    stats = store.collect_file_stats("li", ["l_orderkey", "tenant"])
    print(f"rows {n}, files {len(stats['files'])}")

    results: dict[str, dict] = {}

    # tenant-scoped delete on the PARTITION column
    t0 = time.time()
    v, rep = store.delete_where("li", "tenant", lo=3, hi=3)
    dt = time.time() - t0
    results["tenant_delete_where"] = {
        "secs": round(dt, 2),
        **io_snapshot(),
        "files_rewritten": rep["files_rewritten"],
        "files_linked": rep["files_linked"],
        "rows_deleted": rep["rows_deleted"],
    }
    print(f"tenant-del: {dt:.2f}s {rep}")
    store.rollback("li", v - 1)

    # 10 scattered keys via delete_in
    keys = [
        int(r.l_orderkey)
        for r in store.read("li")
        .select("l_orderkey")
        .distinct()
        .orderBy(F.xxhash64("l_orderkey"))
        .limit(10)
        .collect()
    ]
    t0 = time.time()
    v, rep = store.delete_in("li", "l_orderkey", keys)
    dt = time.time() - t0
    results["key_delete_in_10"] = {
        "secs": round(dt, 2),
        **io_snapshot(),
        "files_rewritten": rep["files_rewritten"],
        "files_linked": rep["files_linked"],
        "rows_deleted": rep["rows_deleted"],
    }
    print(f"key-del: {dt:.2f}s {rep}")
    store.rollback("li", v - 1)

    # 100-key composite merge (layout-matched low keys: stats can isolate)
    low = (
        store.read("li")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.max("qty").alias("qty"),
            F.max("price").alias("price"),
            F.max("tenant").alias("tenant"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
        .localCheckpoint()
    )
    ups = low.withColumn("qty", F.col("qty") + F.lit(100.0))
    t0 = time.time()
    v, rep = store.merge_in("li", ups, ["l_orderkey", "l_linenumber"])
    dt = time.time() - t0
    results["composite_merge_100"] = {
        "secs": round(dt, 2),
        **io_snapshot(),
        "files_rewritten": rep["files_rewritten"],
        "files_linked": rep["files_linked"],
        "rows_replaced": rep["rows_replaced"],
    }
    print(f"comp-merge: {dt:.2f}s {rep}")
    store.rollback("li", v - 1)

    # full-rewrite baseline: the anti-join form of the 10-key delete
    t0 = time.time()
    cleaned = store.read("li").where(~F.col("l_orderkey").isin(keys))
    store.write("li_full", cleaned, partition_by=["tenant"])
    dt = time.time() - t0
    results["full_rewrite_baseline"] = {"secs": round(dt, 2), **io_snapshot()}
    print(f"full: {dt:.2f}s")
    shutil.rmtree(os.path.join(STORE, "li_full"), ignore_errors=True)

    print(json.dumps({"rows": n, "results": results}))


if __name__ == "__main__":
    main()
