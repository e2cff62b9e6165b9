"""Manifest metadata at high file counts (VERDICT r11 #1).

The north-star question: `_MANIFEST.json` is ONE json record listing
every live file of a version; at ~100 TB a table holds 10^5-10^6 files,
so what does the driver actually pay per COLD table load, and where?

Two parts:

1. **Pure-metadata scaling** (no Spark): fabricate manifest records at
   1k/10k/100k/1M entries and measure, per cold load,
   - json.loads of the record (the parse the LRU hides after first hit)
   - `_version_filemap` dict build
   - json.dumps (the write-side cost every commit pays)
   This isolates the O(files) driver parse the verdict flagged.

2. **End-to-end cold read-plan latency** (Spark, real files): build a
   store whose current version references N real parquet files
   (default 4096 — buildable in minutes; scaling is visibly linear),
   then on a FRESH TableStore (empty LRU) measure
   - time to a ready DataFrame (`read()` returns — plan built)
   - time of the first `count()` (scan execution, for scale context)
   The plan-build number contains manifest fetch+parse AND the py4j
   cost of shipping N explicit paths into the JVM reader — at high N
   the path-marshalling dominates the JSON parse (measured), which is
   why the read path groups by physical version and passes file lists,
   not globs.

Results land in SCALE.md's round-12 section. Decision rule from the
verdict: if the JSON parse dominates cold load at 100k files, move the
manifest to parquet/sharded form; if plan-build (JVM-side) dominates,
the JSON format is not the bottleneck and a format migration buys
nothing.

Usage: python tools/manifest_probe.py [n_files_real] [--skip-spark]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def synth_record(n: int) -> bytes:
    files = [
        {"rel": f"part-{i:06d}-{'ab' * 8}{i % 97:02d}.snappy.parquet", "v": 1 + (i % 7)}
        for i in range(n)
    ]
    rec = {
        "format": 1,
        "schema": json.dumps({"type": "struct", "fields": []}),
        "partition_by": [],
        "files": files,
    }
    return json.dumps(rec).encode()


def pure_metadata_part() -> list[dict]:
    out = []
    for n in (1_000, 10_000, 100_000, 1_000_000):
        raw = synth_record(n)
        t0 = time.time()
        man = json.loads(raw)
        t_parse = time.time() - t0
        t0 = time.time()
        fm = {f["rel"]: f["v"] for f in man["files"]}
        t_filemap = time.time() - t0
        t0 = time.time()
        json.dumps(man)
        t_dumps = time.time() - t0
        out.append(
            {
                "n_files": n,
                "bytes": len(raw),
                "parse_s": round(t_parse, 4),
                "filemap_s": round(t_filemap, 4),
                "dumps_s": round(t_dumps, 4),
            }
        )
        del man, fm
        print(json.dumps(out[-1]), flush=True)
    return out


def spark_part(n_files: int) -> dict:
    from pyspark.sql import SparkSession

    from taico_data_integration_spark.ops.incremental import TableStore

    root = f"/tmp/taico_manifest_probe_{n_files}"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("manifest-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(root, "t")):
        shutil.rmtree(root, ignore_errors=True)
        store = TableStore(spark, root)
        df = spark.range(0, n_files * 100).selectExpr(
            "id AS k", "CAST(id AS DOUBLE) AS v"
        )
        store.write("t", df.repartition(n_files))
    # FRESH store instance: empty manifest LRU = the cold-load path
    t0 = time.time()
    cold = TableStore(spark, root)
    df = cold.read("t")
    t_plan = time.time() - t0
    # isolate the metadata half: manifest fetch + parse + filemap on a
    # second fresh instance (no Spark plan built)
    t0 = time.time()
    cold2 = TableStore(spark, root)
    meta = cold2._read_meta("t")
    entry = next(e for e in meta["versions"] if e["v"] == meta["current"])
    fm = cold2._version_filemap("t", entry)
    t_meta = time.time() - t0
    t0 = time.time()
    n = df.count()
    t_scan = time.time() - t0
    rep = {
        "n_files_real": len(fm),
        "rows": n,
        "cold_plan_s": round(t_plan, 3),
        "meta_only_s": round(t_meta, 3),
        "jvm_plan_s": round(t_plan - t_meta, 3),
        "first_scan_s": round(t_scan, 3),
        "manifest_bytes": os.path.getsize(
            os.path.join(entry["path"], "_MANIFEST.json")
        ),
    }
    print(json.dumps(rep), flush=True)
    return rep


def main() -> int:
    n_files = 4096
    skip_spark = "--skip-spark" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if args:
        n_files = int(args[0])
    print("== part 1: pure metadata scaling ==", flush=True)
    meta = pure_metadata_part()
    rep = {"pure_metadata": meta}
    if not skip_spark:
        print(f"== part 2: cold read-plan at {n_files} real files ==", flush=True)
        rep["cold_load"] = spark_part(n_files)
    print("RESULT " + json.dumps(rep), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
