"""Generate an sfN-equivalent fixture set from the sf0.1 testdata by key-
offset replication (every key column shifted by a fixed stride per replica
so FK relationships hold). Region/nation stay fixed (TPC-H dims don't
scale); documents get a per-replica text tag so the corpus is
near-dup-dense rather than exact-copy-degenerate.

With `block_size` (replicas > block_size, e.g. sf10 = 100 replicas,
block_size 10), replicas are grouped into decade blocks and the fixture
keeps NEAR-DUP DENSITY CONSTANT per unit data instead of letting planted
similarity go quadratic in the replica count:
- documents: every 'e' in the text gains a block suffix, so tokens (and
  hence shingles/minhashes) only overlap within a block — each doc has
  block_size-1 near-dups at any scale, like the sf1 fixture.
- embeddings: `label` gains a per-block offset (label + blk*10). The
  engine queries block pair enumeration on `label`; a constant-cardinality
  blocking key over growing data is the classic quadratic trap, and a real
  deployment re-clusters as the corpus grows — the fixture models that.

Output: /tmp/taico_sf1/<table>.parquet (directory-parquet). Used by
tools/bench_vs_duckdb.py for the sf1 amortization run (VERDICT r2 #7) and
the r5 sf10 spot-check (VERDICT r4 #5) — not part of the driver gate
(testdata is read-only; derived fixtures live in /tmp).

Usage: python tools/make_sf1.py [src_sf_dir] [out_dir] [replicas] [block_size]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

STRIDE = 10_000_000  # larger than any sf0.1 key value


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/taico_sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    block_size = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from pyspark.sql import functions as F

    from taico_data_integration_spark.session import get_spark

    spark = get_spark("make-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)

    # key columns shifted by replica * STRIDE, per table
    key_cols = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }

    rep = spark.range(replicas).select(F.col("id").alias("__r"))
    for table in ("region", "nation"):
        df = spark.read.parquet(f"{src}/{table}.parquet")
        df.write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {df.count()} rows (copied)")
    for table, keys in key_cols.items():
        df = spark.read.parquet(f"{src}/{table}.parquet").crossJoin(rep)
        for kc in keys:
            df = df.withColumn(kc, F.col(kc) + F.col("__r") * STRIDE)
        blk = (F.col("__r") / F.lit(block_size)).cast("bigint") if block_size else None
        if table == "documents":
            # per-replica tag keeps replicas near-dups, not exact copies
            df = df.withColumn(
                "text", F.concat(F.col("text"), F.lit(" rep"), F.col("__r").cast("string"))
            )
            if block_size:
                # block-salt every 'e' so token/shingle overlap — and hence
                # planted near-dup groups — stay within one decade block
                df = df.withColumn(
                    "text",
                    F.regexp_replace(F.col("text"), "e", F.concat(F.lit("e"), blk.cast("string"))),
                )
        if table == "embeddings" and block_size:
            # blocking-key cardinality grows with the corpus (see module doc);
            # stride = max(label)+1 measured from the SOURCE so a wider label
            # domain can't silently alias across blocks (ADVICE r5)
            label_stride = (
                spark.read.parquet(f"{src}/{table}.parquet")
                .agg(F.max("label").cast("long").alias("m"))
                .first()["m"]
                + 1
            )
            df = df.withColumn(
                "label", (F.col("label") + blk * F.lit(label_stride)).cast("int")
            )
        df = df.drop("__r")
        # the crossJoin inherits the (single-file) source's partitioning —
        # rebalance so the sf1 layout has realistic scan parallelism
        df.repartition(32).write.mode("overwrite").parquet(f"{out}/{table}.parquet")
        print(f"{table}: {df.count()} rows")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
