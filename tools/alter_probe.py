"""sf10 measurements for the metadata-only ALTER surface (round 11).

Builds the same 60M-row store as tools/chain_budget_probe.py (sf0.1
lineitem ×100, clustered into 16 files) and times each schema
operation plus the reads that prove the contract:

- add_columns (one plain, one DEFAULT) — expected O(1): two object
  writes regardless of table size;
- full count + defaulted-predicate count after the add;
- rename_columns + a stats-pruned range read on the RENAMED name
  (the skipping-survives-rename claim at scale);
- drop_columns + count;
- a single-key merge_in after all the alters (the evolved read path in
  the COW probe/rewrite);
- compact() — the one O(table) price, paid only when materializing.

Usage: python tools/alter_probe.py [sf_dir] [replicas]
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
    out_root = "/tmp/alter_probe"
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .appName("alter-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(out_root, ignore_errors=True)

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    rep = spark.range(replicas).select(F.col("id").alias("rep"))
    big = li.crossJoin(F.broadcast(rep)).select(
        (
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")) * replicas
            + F.col("rep")
        ).alias("k"),
        F.col("l_quantity").cast("double").alias("v"),
        F.col("l_linenumber").cast("int").alias("ln"),
    )
    store = TableStore(spark, out_root)
    t0 = time.time()
    store.write("t", big)
    store.optimize_layout("t", ["k"], num_files=16)
    store.collect_file_stats("t", ["k"])
    n = store.read("t").count()
    out = {"rows": n, "build_s": round(time.time() - t0, 1)}

    def timed(name, fn):
        t = time.time()
        r = fn()
        out[name] = round(time.time() - t, 3)
        return r

    timed("add_columns_s", lambda: store.add_columns(
        "t", {"note": "string", "lang": ("string", "en")}
    ))
    out["count_after_add"] = timed(
        "count_after_add_s", lambda: store.read("t").count()
    )
    out["lang_en_count"] = timed(
        "defaulted_predicate_s",
        lambda: store.read("t").where("lang = 'en'").count(),
    )
    timed("rename_s", lambda: store.rename_columns("t", {"k": "key_id"}))

    def pruned():
        df, rep_ = store.read_pruned("t", "key_id", lo=1000, hi=2000)
        c = df.count()
        out["pruned_files"] = f"{rep_['files_read']}/{rep_['files_total']}"
        return c

    out["pruned_rows"] = timed("pruned_read_after_rename_s", pruned)
    timed("drop_s", lambda: store.drop_columns("t", ["note"]))
    out["count_after_drop"] = timed(
        "count_after_drop_s", lambda: store.read("t").count()
    )
    up = spark.createDataFrame(
        [(997, -1.0, 1, "de")], "key_id bigint, v double, ln int, lang string"
    )
    timed("merge_after_alters_s", lambda: store.merge_in("t", up, "key_id"))
    out["merged_row"] = store.read("t").where("lang = 'de'").count()

    # round 12: drop + RE-ADD with a default over 60M rows — the retired
    # history must serve the default at read time with no rewrite, and
    # the per-generation event replay must not tax the scan measurably
    timed("drop_lang_s", lambda: store.drop_columns("t", ["lang"]))
    timed("readd_lang_default_s", lambda: store.add_columns(
        "t", {"lang": ("string", "xx")}
    ))
    out["readd_default_count"] = timed(
        "readd_default_predicate_s",
        lambda: store.read("t").where("lang = 'xx'").count(),
    )
    # round 12: type widening, metadata-only at 60M rows; the stats-
    # pruned range read must keep skipping through the per-branch cast
    timed("widen_s", lambda: store.alter_column_type("t", {"ln": "bigint"}))

    def pruned_widened():
        df, rep_ = store.read_pruned("t", "key_id", lo=1000, hi=2000)
        c = df.where("ln >= 0").count()
        out["pruned_files_after_widen"] = (
            f"{rep_['files_read']}/{rep_['files_total']}"
        )
        return c

    out["pruned_rows_after_widen"] = timed(
        "pruned_read_after_widen_s", pruned_widened
    )
    # round 12: partition evolution at 60M rows — metadata-only spec
    # change; the next single-key merge pays only its rewrite, landing
    # under the new spec
    up3 = spark.createDataFrame(
        [(2003, -3.0, 2, "de")], "key_id bigint, v double, ln bigint, lang string"
    )
    timed("evolve_spec_s", lambda: store.alter_partition_spec("t", ["ln"]))
    timed("merge_under_new_spec_s", lambda: store.merge_in("t", up3, "key_id"))
    out["count_after_evolution"] = timed(
        "count_after_evolution_s", lambda: store.read("t").count()
    )

    timed("compact_materialize_s", lambda: store.compact("t"))
    out["final_count"] = store.read("t").count()
    # round 12: shallow clone at 60M rows — O(1) objects written, zero
    # data moved, whatever the table size; the clone's first count pays
    # only the read; a single-key merge on the clone COWs one file; a
    # source delete + vacuum with the live clone must tombstone
    # (cross-table refcount) in metadata time and the clone reads on.
    # the once-per-version bloom build on the freshly-compacted source
    # (stats cannot prune the cluster key after the ln-partitioned
    # compact, so the probe would otherwise build this implicitly inside
    # the NEXT merge — source or clone alike, O(table) scan either way)
    timed("src_bloom_build_s", lambda: store.collect_file_blooms(
        "t", ["key_id"], expected_items_per_file=4_000_000
    ))
    timed("src_merge_warm_s", lambda: store.merge_in(
        "t",
        spark.createDataFrame(
            [(3001, -4.0, 1, "wm")],
            "key_id bigint, v double, ln bigint, lang string",
        ),
        "key_id",
    ))
    timed("clone_s", lambda: store.clone("t", "t2"))
    out["clone_count"] = timed(
        "clone_count_s", lambda: store.read("t2").count()
    )
    up5 = spark.createDataFrame(
        [(4005, -5.0, 3, "cl")],
        "key_id bigint, v double, ln bigint, lang string",
    )
    timed("clone_merge_s", lambda: store.merge_in("t2", up5, "key_id"))
    timed(
        "src_delete_s",
        lambda: store.delete_where("t", "key_id", lo=None, hi=5000),
    )
    timed(
        "src_vacuum_with_clone_s",
        lambda: store.vacuum("t", keep_latest=1, stage_ttl_seconds=3600.0),
    )
    out["clone_count_after_src_vacuum"] = timed(
        "clone_count_after_src_vacuum_s", lambda: store.read("t2").count()
    )
    print(json.dumps(out), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
