"""Full driver rehearsal: the ENTIRE oracle gate under a VANILLA session.

tools/compare_oracle*.py run under the engine's session factory (ANSI off,
tuned shuffle partitions). The driver brings its own SparkSession with
Spark 4 defaults — ANSI ON is the big one — so a query that only works
under the engine session would pass locally and fail the gate.
test_vanilla_session covers a sample; this rehearses everything.

Usage: python tools/driver_rehearsal.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod
    from tools.compare_oracle import canon, table_hash

    spark = (
        SparkSession.builder.master("local[8]").appName("driver-rehearsal").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if __import__("os").path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols, srows = sdf.columns, [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark(vanilla) error: {str(e)[:160]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)}")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = (
            len(srows) == len(drows)
            and sorted(scols) == sorted(dcols)
            and table_hash(scols, srows) == table_hash(dcols, drows)
        )
        if not ok:
            print(f"FAIL {name}: mismatch under vanilla session")
            failures.append(name)
        else:
            print(f"OK   {name}")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
