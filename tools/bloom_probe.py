"""Measure bloom-index point-lookup skipping at scale (round 7).

Min/max stats prune range predicates on the CLUSTERED column; a point
lookup on any other column sees every file's [min, max] span the domain
and reads everything. This probe builds a 20M-row table (32 files,
clustered on k so the probe column u — ~8M distinct values — is uniformly
interleaved), then times an equality lookup on u three ways:

  full        store.read() + filter     (every file opened)
  point cold  read_point()              (first call pays the one-pass
                                         bloom build — reported separately)
  point warm  read_point()              (manifest cached: driver-side
                                         membership test, then only the
                                         matching files are opened)

plus an ABSENT value (the common case for ingest dedup / GDPR lookups:
most probes miss) where the bloom should skip every file.

Row parity with the full scan is asserted for the present value; the
absent value must return zero rows. Deterministic data (xxhash64 of id).

Usage: python tools/bloom_probe.py [--rows N] [--files N]
Run alone — concurrent load inflates every number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from taico_data_integration_spark.ops.incremental import TableStore  # noqa: E402
from taico_data_integration_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--store", default=None)
    args = ap.parse_args()
    if args.store is None:
        # per-shape store: reusing a cached table built for a DIFFERENT
        # --rows silently mis-sizes the bloom (saturation, zero skipping)
        args.store = f"/tmp/taico_bloom_store_{args.rows}x{args.files}"

    spark = get_spark("bloom-probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"# loadavg at start: {os.getloadavg()}", file=sys.stderr)

    store = TableStore(spark, args.store)
    if not store.exists("t"):
        df = spark.range(args.rows).selectExpr(
            "id % 1000 AS k",
            f"CONCAT('user_', CAST(pmod(xxhash64(id), {args.rows // 2}) AS STRING)) AS u",
            "id AS payload",
        )
        t0 = time.time()
        store.write("t", df.repartition(args.files))
        store.optimize_layout("t", ["k"], num_files=args.files)
        store.vacuum("t", keep_latest=1)
        print(f"# load+cluster {time.time() - t0:.1f}s", file=sys.stderr)

    per_file_distinct = args.rows // args.files  # ~ one distinct per row
    present = store.read("t").where("payload = 1234567").first().u
    absent = "user_never_was"

    # warm JVM + page cache on an unrelated aggregate
    store.read("t").agg(F.max("payload")).collect()

    t0 = time.time()
    full = store.read("t").where(F.col("u") == present).count()
    t_full = time.time() - t0

    bp = store._bloom_path("t", store._read_meta("t")["current"])
    if os.path.isdir(bp):  # r8: the distributed writer's sidecar is a dir
        import shutil

        shutil.rmtree(bp)
    elif os.path.exists(bp):
        os.remove(bp)
    t0 = time.time()
    df, rep_cold = store.read_point(
        "t", "u", present, expected_items_per_file=per_file_distinct
    )
    cold = df.count()
    t_cold = time.time() - t0

    t0 = time.time()
    df, rep = store.read_point("t", "u", present)
    warm = df.count()
    t_warm = time.time() - t0

    t0 = time.time()
    df_a, rep_a = store.read_point("t", "u", absent)
    n_absent = df_a.count()
    t_absent = time.time() - t0

    assert full == cold == warm > 0, (full, cold, warm)
    assert n_absent == 0
    print(
        json.dumps(
            {
                "rows": args.rows,
                "rows_matched": full,
                "full_scan_sec": round(t_full, 2),
                "point_cold_sec": round(t_cold, 2),
                "point_warm_sec": round(t_warm, 2),
                "point_absent_sec": round(t_absent, 2),
                "files_total": rep["files_total"],
                "files_read_present": rep["files_read"],
                "files_read_absent": rep_a["files_read"],
                "skipped_by_bloom_present": rep["skipped_by_bloom"],
                "manifest_bytes": (
                    sum(
                        os.path.getsize(os.path.join(r, f))
                        for r, _, fs in os.walk(bp)
                        for f in fs
                    )
                    if os.path.isdir(bp)
                    else os.path.getsize(bp)
                ),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
