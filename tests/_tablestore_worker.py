"""Subprocess workers for the TableStore cross-PROCESS concurrency tests
(VERDICT r5 #2). The r5 race tests ran threads in one interpreter; these
workers are launched as real OS processes so the O_CREAT|O_EXCL claim, the
_SUCCESS commit gate and the os.replace pointer swap are exercised across
process boundaries — the semantics they were designed for.

Modes (dispatched on argv[1]):

- ``promote <root> <key> <ready> <go> <result>`` — boot a PRIVATE
  SparkSession (own JVM), build the key's frame, touch <ready>, spin-wait
  for <go> (the parent's barrier), run promote_with_validation against the
  shared store root, dump {"ok": bool} JSON to <result>.
- ``hang <root> <sentinel>`` — claim the next version, create the version
  directory with a partial task file but NO _SUCCESS marker (the exact
  window a hard-killed writer dies in), touch <sentinel>, sleep until the
  parent SIGKILLs us.
"""

import json
import os
import sys
import time


def promote_main(root: str, key: str, ready: str, go: str, result: str) -> int:
    from pyspark.sql import Row, SparkSession

    from taico_data_integration_spark.ops.incremental import TableStore

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"tablestore-xproc-{key}")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "1500m")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    n = {"a": 3, "b": 4}[key]
    df = spark.createDataFrame([Row(id=i, s=key) for i in range(1, n + 1)])
    store = TableStore(spark, root)
    open(ready, "w").close()
    deadline = time.time() + 120
    while not os.path.exists(go):
        if time.time() > deadline:
            return 3
        time.sleep(0.05)
    ok = store.promote_with_validation("t", df, validate=lambda d: d.count() > 0)
    with open(result, "w") as f:
        json.dump({"ok": bool(ok)}, f)
    spark.stop()
    return 0


def hang_main(root: str, sentinel: str) -> int:
    from taico_data_integration_spark.ops.incremental import TableStore

    store = TableStore(None, root)  # claim path never touches the session
    v = store._claim_version("t")
    p = os.path.join(root, "t", f"v{v:04d}")
    os.makedirs(p)
    # partial task output, committer never reached _SUCCESS
    open(os.path.join(p, "part-00000-partial.parquet"), "w").close()
    open(sentinel, "w").close()
    time.sleep(3600)  # parent SIGKILLs us here
    return 0


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "promote":
        sys.exit(promote_main(*sys.argv[2:7]))
    elif mode == "hang":
        sys.exit(hang_main(*sys.argv[2:4]))
    sys.exit(2)
