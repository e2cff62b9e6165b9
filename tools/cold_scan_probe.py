"""Split the sf10 cold-start delta into JVM-warmup vs first-IO (VERDICT
r5 #3). Runs ONE query in a fresh JVM per invocation and prints a JSON
line; the caller controls the OS page-cache state between invocations:

    sync; echo 3 > /proc/sys/vm/drop_caches   # cold IO
    cat <fixture files> > /dev/null           # warm IO

Usage: python tools/cold_scan_probe.py <sf_dir> <query> [n_repeats]

The first timing in `runs` is the fresh-JVM number; later entries rerun
the same query in the SAME JVM (warm everything) so one cold invocation
also yields the warm floor.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1]
    qname = sys.argv[2]
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    t_boot = time.perf_counter()
    from taico_data_integration_spark.session import get_spark

    spark = get_spark()
    boot = time.perf_counter() - t_boot

    import __spark_entry__ as entry

    q = entry.queries()[qname]
    runs = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        n = q(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "query": qname, "sf_dir": sf_dir, "rows": n,
        "jvm_boot_sec": round(boot, 3), "runs": runs,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
