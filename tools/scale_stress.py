"""Scale-stress the dedup/ANN candidate generation (VERDICT r2 #4).

Generates synthetic corpora with CONTROLLED dup density at sf0.01-, sf0.1-
and sf1-equivalent sizes (500 / 5k / 50k documents; 2k / 20k / 100k
vectors), then measures:

- LSH banding: wall time of band-key generation + candidate join, planted
  near-dup recall, and the candidate-pair count vs the planted-collision
  count (the O(collisions) claim — candidates must track plants, not n^2);
- IVF ANN: wall time of index build + 100-query probe at each corpus size.

Prints per-size rows and fitted scaling exponents
(log(t2/t1) / log(n2/n1) between successive sizes; 1.0 = linear). Results
land in SCALE.md's "Measured scaling" section.

Usage: python tools/scale_stress.py [--quick | --big]

``--big`` (VERDICT r5 #5) runs the LSH candidate-generation leg alone one
more decade up — 50k / 500k / 5M synthetic docs — to pin the measured
candidate-growth exponent and planted recall across four decades total.
Synthetic-only by design: the invariant is the exponent and the recall vs
planted dups, no oracle involved.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    quick = "--quick" in sys.argv
    big = "--big" in sys.argv

    from pyspark.sql import functions as F

    from taico_data_integration_spark.llm.dedup import (
        lsh_candidate_pairs,
        minhash_band_keys_fast,
    )
    from taico_data_integration_spark.llm.similarity import cosine_topk_ivf
    from taico_data_integration_spark.llm.synth import synth_documents, synth_embeddings
    from taico_data_integration_spark.session import get_spark

    spark = get_spark("scale-stress")
    spark.sparkContext.setLogLevel("ERROR")

    if big:
        doc_sizes = [50_000, 500_000, 5_000_000]
        vec_sizes = []  # LSH leg only: the decade being extended
    elif quick:
        doc_sizes, vec_sizes = [500, 5_000], [2_000, 20_000]
    else:
        doc_sizes, vec_sizes = [500, 5_000, 50_000], [2_000, 20_000, 100_000]
    out: dict = {"lsh": [], "ivf": []}

    print("== LSH banding / candidate generation ==")
    for n in doc_sizes:
        docs = synth_documents(spark, n, dup_every=10).localCheckpoint()
        planted = docs.where("is_planted_dup").count()
        t0 = time.time()
        bands = minhash_band_keys_fast(docs)
        cands = lsh_candidate_pairs(bands).localCheckpoint()
        n_cands = cands.count()
        dt = time.time() - t0
        hits = (
            cands.where(
                (F.col("doc_b") - F.col("doc_a") == 1) & (F.col("doc_b") % 10 == 1)
            ).count()
        )
        row = {
            "n_docs": n,
            "planted_pairs": planted,
            "candidate_pairs": n_cands,
            "recall": round(hits / planted, 4) if planted else None,
            "cands_per_doc": round(n_cands / n, 4),
            "secs": round(dt, 2),
        }
        out["lsh"].append(row)
        print(row)

    print("== IVF ANN probe (100 queries) ==")
    for n in vec_sizes:
        corpus = synth_embeddings(spark, n).localCheckpoint()
        queries = synth_embeddings(spark, 100, seed=99).localCheckpoint()
        t0 = time.time()
        topk = cosine_topk_ivf(corpus, queries, k=5, n_lists=16, nprobe=2)
        n_rows = topk.count()
        dt = time.time() - t0
        row = {"n_vecs": n, "result_rows": n_rows, "secs": round(dt, 2)}
        out["ivf"].append(row)
        print(row)

    def exponents(rows, nkey):
        exps = []
        for a, b in zip(rows, rows[1:]):
            if a["secs"] > 0 and b["secs"] > 0:
                exps.append(
                    round(
                        math.log(b["secs"] / a["secs"]) / math.log(b[nkey] / a[nkey]), 3
                    )
                )
        return exps

    out["lsh_time_exponents"] = exponents(out["lsh"], "n_docs")
    out["ivf_time_exponents"] = exponents(out["ivf"], "n_vecs")
    # candidate growth exponent: 1.0 = O(n) (plants scale linearly), 2.0 = n^2
    out["lsh_candidate_exponents"] = [
        round(
            math.log(b["candidate_pairs"] / a["candidate_pairs"])
            / math.log(b["n_docs"] / a["n_docs"]),
            3,
        )
        for a, b in zip(out["lsh"], out["lsh"][1:])
    ]
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
