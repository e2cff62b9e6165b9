"""Measure TableStore data skipping at scale (sf10 by default).

Loads lineitem (60 M rows at sf10) into a TableStore, clusters it on
l_shipdate with optimize_layout, then times a one-month revenue query
three ways:

  full       store.read() + filter        (Spark opens every file's footer;
                                           row-group pushdown still applies)
  pruned     store.read_pruned()          (manifest prunes the file list
                                           driver-side; Spark never touches
                                           non-matching files)
  cold both  after dropping the manifest  (first pruned read pays the
                                           one-time footer sweep)

Usage: python tools/skipping_probe.py [sf_dir] [store_dir]
Defaults: /tmp/taico_sf10  /tmp/taico_skip_store (reused if present).
Run alone — concurrent load inflates every number.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taico_data_integration_spark.ops.incremental import TableStore  # noqa: E402
from taico_data_integration_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/taico_sf10"
STORE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/taico_skip_store"
LO, HI = "1998-06-01 00:00:00", "1998-07-01 00:00:00"


def revenue(df):
    # decimal arithmetic so the three differently-planned scans (different
    # file sets, different partition orders) sum EXACTLY equal — double
    # addition is order-dependent and would fail the parity assert spuriously
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,4)")
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(price * (F.lit(1).cast("decimal(18,4)") - disc)).alias("rev"),
    ).collect()[0]


def main() -> None:
    spark = get_spark("skipping-probe")
    store = TableStore(spark, STORE)
    if not store.exists("lineitem"):
        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        t0 = time.time()
        store.write("lineitem", li)
        v = store.optimize_layout("lineitem", ["l_shipdate"], num_files=32)
        print(f"# load+cluster {time.time() - t0:.1f}s -> v{v}", file=sys.stderr)
        store.vacuum("lineitem", keep_latest=1)

    import datetime as dt

    lo = dt.datetime.fromisoformat(LO)
    hi = dt.datetime.fromisoformat(HI)

    # warm the JVM + page cache on an unrelated aggregate so the timed runs
    # measure plan cost, not first-fault
    store.read("lineitem").agg(F.max("l_orderkey")).collect()

    t0 = time.time()
    full = revenue(
        store.read("lineitem").where(F.col("l_shipdate").between(F.lit(lo), F.lit(hi)))
    )
    t_full = time.time() - t0

    # cold pruned read: manifest not built yet (or dropped) -> pays the
    # one-time footer sweep
    sp = store._stats_path("lineitem", store._read_meta("lineitem")["current"])
    if os.path.exists(sp):
        os.remove(sp)
    t0 = time.time()
    df, rep_cold = store.read_pruned("lineitem", "l_shipdate", lo=lo, hi=hi)
    cold = revenue(df)
    t_cold = time.time() - t0

    t0 = time.time()
    df, rep = store.read_pruned("lineitem", "l_shipdate", lo=lo, hi=hi)
    pruned = revenue(df)
    t_pruned = time.time() - t0

    assert full == pruned == cold, (full, pruned, cold)
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "rows_matched": full["n"],
                "full_scan_sec": round(t_full, 2),
                "pruned_cold_sec": round(t_cold, 2),
                "pruned_warm_sec": round(t_pruned, 2),
                "files_total": rep["files_total"],
                "files_read": rep["files_read"],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
