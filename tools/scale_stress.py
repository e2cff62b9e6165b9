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

Usage: python tools/scale_stress.py [--quick | --big | --vec-big]

``--big`` (VERDICT r5 #5) runs the LSH candidate-generation leg alone one
more decade up — 50k / 500k / 5M synthetic docs — to pin the measured
candidate-growth exponent and planted recall across four decades total.
Synthetic-only by design: the invariant is the exponent and the recall vs
planted dups, no oracle involved.

``--vec-big`` (VERDICT r7 #6) extends the same harness to VECTORS: at 1M
and 5M synthetic embeddings (dim 16, 256 latent clusters) it measures,
against a brute-force exact top-10 ground truth over 100 queries,
(a) IVF recall@10 at two nprobe settings, and (b) int8-quantized
agreement — the brute-force top-10 overlap after per-vector affine int8
round-trip, plus the cosine error on the pairs both rankings share.
Results land in SCALE.md's ANN section.
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
    vec_big = "--vec-big" in sys.argv

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

    if vec_big:
        return _vec_big(spark)
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


def _vec_big(spark) -> int:
    """ANN recall + quantized agreement at 1M / 5M vectors (VERDICT r7 #6).

    Ground truth is the EXACT brute-force top-10 (crossJoin + JVM dot —
    affordable offline for 100 queries, never the serving path). Query ids
    are offset out of the corpus id range so the self-pair exclusion never
    removes a true neighbor. The quantized leg round-trips every vector
    through the same per-vector affine int8 scheme the gated
    embedding_quantization query uses, then re-ranks brute-force: its
    overlap with the exact top-10 is the 'agreement', and the cosine delta
    on the pairs both rankings share bounds the score distortion."""
    import time as _time

    from pyspark.sql import functions as F

    from taico_data_integration_spark.llm.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
    )
    from taico_data_integration_spark.llm.synth import synth_embeddings

    K, NQ = 10, 100
    out = {"vec_big": []}
    for n in (1_000_000, 5_000_000):
        corpus = synth_embeddings(spark, n, n_clusters=256).localCheckpoint()
        # two query regimes: in-distribution (same latent centers as the
        # corpus — the realistic serving case) and shifted (independent
        # centers, seed=99 — every query off-manifold, the adversarial
        # case where true neighbors straddle IVF list boundaries)
        regimes = {
            "in_dist": synth_embeddings(spark, NQ, n_clusters=256, seed=11),
            "shifted": synth_embeddings(spark, NQ, n_clusters=256, seed=99),
        }
        for regime, qdf in regimes.items():
            queries = qdf.withColumn(
                "vec_id", F.col("vec_id") + F.lit(10_000_000_000)
            ).localCheckpoint()
            t0 = _time.time()
            exact = cosine_topk_bruteforce(corpus, queries, k=K).localCheckpoint()
            n_exact = exact.count()
            t_exact = _time.time() - t0
            exact_pairs = exact.select("query_id", "neighbor_id")
            row: dict = {
                "n_vecs": n,
                "regime": regime,
                "k": K,
                "n_queries": NQ,
                "exact_rows": n_exact,
                "exact_secs": round(t_exact, 2),
                "ivf": [],
            }
            for n_lists, nprobe in ((64, 4), (64, 8), (64, 16)):
                t0 = _time.time()
                ivf = cosine_topk_ivf(
                    corpus, queries, k=K, n_lists=n_lists, nprobe=nprobe
                ).localCheckpoint()
                ivf.count()
                dt = _time.time() - t0
                hits = ivf.join(exact_pairs, ["query_id", "neighbor_id"]).count()
                row["ivf"].append(
                    {
                        "n_lists": n_lists,
                        "nprobe": nprobe,
                        "recall_at_10": round(hits / (NQ * K), 4),
                        "secs": round(dt, 2),
                    }
                )
            if regime == "in_dist":
                # quantized-vs-exact agreement, once per corpus size on
                # the realistic query regime
                def _dequant(df):
                    v = F.transform("embedding", lambda x: x.cast("double"))
                    d = df.select("vec_id", v.alias("v"))
                    d = d.withColumn("vmin", F.array_min("v")).withColumn(
                        "scale",
                        (F.array_max("v") - F.array_min("v")) / F.lit(255.0),
                    )
                    deq = F.transform(
                        "v",
                        lambda x: F.col("vmin")
                        + F.least(
                            F.lit(255.0),
                            F.floor((x - F.col("vmin")) / F.col("scale")),
                        )
                        * F.col("scale"),
                    )
                    return d.where(F.col("scale") > 0).select(
                        "vec_id", deq.alias("embedding")
                    )

                t0 = _time.time()
                quant = cosine_topk_bruteforce(
                    _dequant(corpus), _dequant(queries), k=K
                ).localCheckpoint()
                quant.count()
                t_quant = _time.time() - t0
                agree = quant.join(exact_pairs, ["query_id", "neighbor_id"]).count()
                err = (
                    exact.alias("e")
                    .join(quant.alias("q"), ["query_id", "neighbor_id"])
                    .select(F.abs(F.col("e.cosine") - F.col("q.cosine")).alias("d"))
                    .agg(F.max("d").alias("mx"), F.avg("d").alias("av"))
                    .first()
                )
                row.update(
                    {
                        "quant_overlap_at_10": round(agree / (NQ * K), 4),
                        "quant_secs": round(t_quant, 2),
                        "quant_cos_err_max_common": round(float(err.mx), 6),
                        "quant_cos_err_mean_common": round(float(err.av), 6),
                    }
                )
            out["vec_big"].append(row)
            print(row)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
