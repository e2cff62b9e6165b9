"""sf10 spot-check (VERDICT r4 #5): oracle-verify the heaviest registry
queries on a 100x fixture (~60 M lineitem, 100 M events, 500 k documents,
200 k embeddings) built by `make_sf1.py src out 100 10`.

Most spot queries have bounded or linear outputs and go through the exact
compare_oracle machinery (full collect + order-insensitive value hash).
The two fact-width outputs (retail_fct_invoices ~60 M rows,
fb_ads_transformed ~100 M rows) are too large to materialize row-by-row in
Python on BOTH engines, so they are graded by:
  1. full-output COUNT equality (each engine runs the complete pipeline), and
  2. an exact value-hash compare of a deterministic subsample applied AFTER
     the full transform on both engines (md5-prefix / minted-id modulus —
     uniform, engine-independent, and for fb_ads sensitive to any global
     id-assignment drift since a single mis-ordered row shifts every id).

Usage: python tools/sf10_check.py [sf10_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from compare_oracle import canon, table_hash  # noqa: E402

# bounded/linear-output heavy hitters: exact full compare
SPOT_EXACT = [
    "dedup_ngram_jaccard",
    "dedup_minhash_bands",
    "dedup_lsh_verified_pairs",
    "dedup_canonical_keepers",
    "dedup_clusters",
    "dedup_simhash",
    "embedding_neardup",
    "ann_topk",
    "ann_topk_ivf",
    "kmeans_embedding_clusters",
    "q21_sole_returning_supplier",
]

# fact-width outputs: count compare + deterministic-subsample hash compare.
# Predicates are valid, identical SQL in Spark and DuckDB and are applied
# OUTSIDE the full pipeline (subquery wrap / DataFrame.where on the result).
SPOT_SAMPLED = {
    "retail_fct_invoices": "substr(invoice_id, 1, 2) = '00'",
    "fb_ads_transformed": "id % 997 = 0",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/taico_sf10"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("sf10-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{sf_dir}/{t}.parquet"
        glob = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{glob}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []

    def run_exact(name):
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        ts = time.time() - t0
        t0 = time.time()
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        td = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        elif sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value-hash mismatch")
        return problems, len(srows), ts, td

    def run_sampled(name, pred):
        from pyspark.sql import functions as F

        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        n_spark = sdf.count()
        samp = sdf.where(F.expr(pred))
        srows = [tuple(r) for r in samp.collect()]
        scols = samp.columns
        ts = time.time() - t0
        t0 = time.time()
        n_duck = con.execute(f"SELECT count(*) FROM ({oracles[name]})").fetchone()[0]
        res = con.execute(f"SELECT * FROM ({oracles[name]}) WHERE {pred}")
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        td = time.time() - t0
        problems = []
        if n_spark != n_duck:
            problems.append(f"FULL rowcount spark={n_spark} duck={n_duck}")
        if len(srows) != len(drows):
            problems.append(f"sample rowcount spark={len(srows)} duck={len(drows)}")
        elif sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("sample value-hash mismatch")
        return problems, f"{n_spark} full / {len(srows)} sampled", ts, td

    for name in SPOT_EXACT + list(SPOT_SAMPLED):
        if only and name not in only:
            continue
        try:
            if name in SPOT_SAMPLED:
                problems, rows, ts, td = run_sampled(name, SPOT_SAMPLED[name])
            else:
                problems, rows, ts, td = run_exact(name)
        except Exception as e:
            print(f"FAIL {name}: error: {e}", flush=True)
            failures.append(name)
            continue
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems), flush=True)
            failures.append(name)
        else:
            print(f"OK   {name}: {rows} rows (spark {ts:.1f}s, duckdb {td:.1f}s)", flush=True)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
