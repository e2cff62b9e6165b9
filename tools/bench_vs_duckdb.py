"""Head-to-head single-node throughput: every bench query that has a DuckDB
oracle is timed on BOTH engines over the same parquet at the same SF —
DuckDB runs the oracle SQL (all threads), Spark runs the DataFrame plan to
a noop sink. Writes BENCH_VS_DUCKDB.md.

Usage: python tools/bench_vs_duckdb.py [sf_dir] [section_label]
With a section_label, results are APPENDED as a "## <label>" section
(e.g. the sf1 run) instead of rewriting the whole file.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    label = sys.argv[2] if len(sys.argv) > 2 else None

    import duckdb

    from bench import BENCH_QUERIES
    from taico_data_integration_spark.queries import all_oracles, all_queries
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = all_queries(), all_oracles()

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            glob = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    def t_spark(fn) -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        return statistics.median(ts)

    def t_duck(sql: str) -> float:
        ts = []
        for _ in range(3):
            t0 = time.time()
            con.execute(sql).fetchall()
            ts.append(time.time() - t0)
        return statistics.median(ts)

    rows = []
    names = [n for n in BENCH_QUERIES if n in oracles]
    for name in names:
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        s = t_spark(qs[name])
        d = t_duck(oracles[name])
        rows.append((name, s, d))
        print(f"{name}: spark={s:.2f}s duckdb={d:.2f}s", flush=True)

    total_s = sum(r[1] for r in rows)
    total_d = sum(r[2] for r in rows)
    mode = "a" if label else "w"
    with open("/root/repo/BENCH_VS_DUCKDB.md", mode) as f:
        if label:
            f.write(f"\n## {label} ({sf_dir})\n\n")
        else:
            f.write(
                "# Spark vs DuckDB single-node throughput\n\n"
                f"Same parquet, same SF ({sf_dir}), same machine (32 threads both), "
                "median of 3 after warmup. DuckDB executes the oracle SQL and "
                "materializes results; Spark executes the DataFrame plan to a noop "
                "sink (no driver transfer on either path's hot loop).\n\n"
                "Spark carries fixed per-job overhead (~0.2-0.5s scheduling/codegen) "
                "that DuckDB doesn't — at this toy SF that overhead dominates the "
                "small queries; it amortizes to noise at cluster scale, which is "
                "what the engine is designed for (SCALE.md).\n\n"
            )
        f.write("| query | spark s | duckdb s | ratio (spark/duck) |\n|---|---|---|---|\n")
        for name, s, d in rows:
            f.write(f"| {name} | {s:.2f} | {d:.2f} | {s / max(d, 1e-9):.1f}x |\n")
        f.write(
            f"| **total** | **{total_s:.2f}** | **{total_d:.2f}** | "
            f"**{total_s / max(total_d, 1e-9):.1f}x** |\n"
        )
    print(f"total: spark={total_s:.1f}s duckdb={total_d:.1f}s -> BENCH_VS_DUCKDB.md")


if __name__ == "__main__":
    main()
