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

# bounded/linear-output heavy hitters: exact full compare, cheapest first so
# a late failure doesn't cost the earlier evidence.
#
# The n-gram Jaccard family at sf10 (both measured, BENCH_NOTES_r05.md):
# - UNCAPPED (dedup_ngram_jaccard) is O(df^2) per shingle; the block-salted
#   fixture's e-less shingles (df ~ 100x) blow the pair join past this box's
#   disk on Spark AND past its RAM on DuckDB. That cliff is the reason the
#   df-capped variant exists; at 100 TB the cap is not optional.
# - CAPPED (dedup_jaccard_capped) completes on Spark, but its DuckDB oracle
#   still needs > 75 GB of spill — single-node-oracle-infeasible here. The
#   Jaccard kernel is nevertheless sf10-verified through
#   dedup_lsh_verified_pairs (same tokenize->shingle->jaccard machinery,
#   millions of pairs hash-matched); the df-cap filter itself is a trivial
#   groupBy+semi-join pinned green at sf0.01/0.1/1.
SPOT_EXACT = [
    "q21_sole_returning_supplier",
    "ann_topk",
    "ann_topk_ivf",
    "kmeans_embedding_clusters",
    "dedup_simhash",
    "dedup_minhash_bands",
    "dedup_lsh_verified_pairs",
    "embedding_neardup",
]

# Connected-components entries: DuckDB's recursive-CTE reachability oracle
# needs > 75 GB of spill at sf10 (measured — the single-node oracle engine
# falls over a decade before the Spark plan does). sf10 grades them against
# an INDEPENDENT oracle instead: the verified pair set (itself hash-verified
# above via dedup_lsh_verified_pairs) is pulled once from DuckDB and
# clustered by a Python union-find — different algorithm, different engine,
# exact row compare.
SPOT_PYCC = ["dedup_clusters", "dedup_canonical_keepers"]

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
    # an oracle that outgrows RAM must spill, not OOM-kill the harness
    os.makedirs("/tmp/duckdb_spill", exist_ok=True)
    con.execute("SET memory_limit='48GB'")
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
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

    _pair_cache: dict = {}

    def _cc_labels():
        """Union-find over the jaccard-filtered verified pair set -> per-node
        min-id component label. Cached: the DuckDB pair query is the
        expensive part and both CC entries share it."""
        if "labels" in _pair_cache:
            return _pair_cache["labels"]
        from taico_data_integration_spark.queries.llm import (
            _CLUSTER_MIN_JACCARD,
            LSH_VERIFIED_SQL,
        )

        pairs = con.execute(
            f"SELECT doc_a, doc_b FROM ({LSH_VERIFIED_SQL}) z"
            f" WHERE jaccard >= {_CLUSTER_MIN_JACCARD}"
        ).fetchall()
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] != r:
                r = parent[r]
            while parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for a, b in pairs:
            for v in (a, b):
                if v not in parent:
                    parent[v] = v
            ra, rb = find(a), find(b)
            if ra != rb:
                # union by min id keeps the label the component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        labels = {v: find(v) for v in parent}
        _pair_cache["labels"] = labels
        return labels

    def run_pycc(name):
        t0 = time.time()
        sdf = qs[name](spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = sdf.columns
        ts = time.time() - t0
        t0 = time.time()
        labels = _cc_labels()
        if name == "dedup_clusters":
            dcols = ["doc_id", "cluster_id", "is_representative"]
            drows = [(v, c, v == c) for v, c in labels.items()]
        else:  # dedup_canonical_keepers
            docs = con.execute("SELECT doc_id, n_chars FROM documents").fetchall()
            by_cluster: dict = {}
            for doc_id, n_chars in docs:
                cid = labels.get(doc_id, doc_id)
                by_cluster.setdefault(cid, []).append((doc_id, n_chars))
            dcols = ["doc_id", "cluster_id", "n_chars", "keep"]
            drows = []
            for cid, members in by_cluster.items():
                members.sort(key=lambda m: (-m[1], m[0]))
                for i, (doc_id, n_chars) in enumerate(members):
                    drows.append((doc_id, cid, n_chars, i == 0))
        td = time.time() - t0
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} pycc={len(drows)}")
        elif sorted(scols) != sorted(dcols):
            problems.append(f"cols spark={sorted(scols)} pycc={sorted(dcols)}")
        elif table_hash(scols, srows) != table_hash(dcols, drows):
            problems.append("value-hash mismatch vs python union-find")
        return problems, len(srows), ts, td

    for name in SPOT_EXACT + SPOT_PYCC + list(SPOT_SAMPLED):
        if only and name not in only:
            continue
        try:
            if name in SPOT_SAMPLED:
                problems, rows, ts, td = run_sampled(name, SPOT_SAMPLED[name])
            elif name in SPOT_PYCC:
                problems, rows, ts, td = run_pycc(name)
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
