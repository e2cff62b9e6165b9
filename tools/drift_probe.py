"""IVF centroid-drift recall measurement (nprobe=1, k-means refined quantizer) (VERDICT r11 #3, round 12).

Quantifies WHY the drift watchdog exists: build an IVF index on one
embedding distribution, append a batch drawn from a DIFFERENT
distribution (fresh cluster centers), and measure recall@10 of the
pinned-centroid probe against brute-force cosine for queries drawn
from the drifted distribution — before and after an on_drift='rebuild'
append. Also prints the dispersion statistics the watchdog tracks.

Usage: python tools/drift_probe.py [n_corpus] [n_drift]
Results -> SCALE.md round-12 section.
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def recall_at_k(store, index_table, queries, k=10, nprobe=1) -> float:
    from taico_data_integration_spark.llm import ivf_store
    from taico_data_integration_spark.llm.similarity import cosine_topk_bruteforce

    got = ivf_store.probe(store, index_table, queries, k=k, nprobe=nprobe)
    corpus = store.read(ivf_store.pin_info(store, index_table)["corpus_table"])
    truth = cosine_topk_bruteforce(corpus, queries, k=k)
    g = {(r.query_id, r.neighbor_id) for r in got.collect()}
    t = {(r.query_id, r.neighbor_id) for r in truth.collect()}
    return len(g & t) / max(len(t), 1)


def main() -> int:
    n_corpus = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_drift = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    root = "/tmp/taico_drift_probe"
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .appName("drift-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(root, ignore_errors=True)

    from taico_data_integration_spark.llm import ivf_store
    from taico_data_integration_spark.llm.synth import synth_embeddings
    from taico_data_integration_spark.ops.incremental import TableStore

    store = TableStore(spark, root)
    base = synth_embeddings(spark, n_corpus, dim=32, n_clusters=64, seed=11)
    drifted = (
        synth_embeddings(spark, n_drift, dim=32, n_clusters=64, seed=999)
        .withColumn("vec_id", F.col("vec_id") + 10_000_000)
        .localCheckpoint()
    )
    drift_queries = drifted.where(
        F.col("vec_id") < 10_000_000 + 32
    ).localCheckpoint()

    store.write("corpus", base.repartition(8))
    rec = ivf_store.build(store, "corpus", "idx", n_lists=32, refine_iterations=3)
    out = {"n_corpus": n_corpus, "n_drift": n_drift,
           "build_dispersion": round(rec["build_dispersion"], 4)}

    # drifted batch appended under the PINNED quantizer
    store.merge_in("corpus", drifted, "vec_id", max_keys=n_drift + 1)
    import warnings

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rec2 = ivf_store.append(store, "idx", max_keys=n_drift + 1)
    out["append_dispersion"] = round(
        ivf_store.pin_info(store, "idx")["last_dispersion"], 4
    )
    out["watchdog_warned"] = any("drifted" in str(x.message) for x in w)
    out["recall_at10_drifted_queries_stale_quantizer"] = round(
        recall_at_k(store, "idx", drift_queries), 4
    )

    # rebuild (what on_drift='rebuild' runs) and re-measure
    ivf_store.build(store, "corpus", "idx", n_lists=32, refine_iterations=3)
    out["recall_at10_drifted_queries_after_rebuild"] = round(
        recall_at_k(store, "idx", drift_queries), 4
    )
    out["rebuild_dispersion"] = round(
        ivf_store.pin_info(store, "idx")["build_dispersion"], 4
    )
    print("RESULT " + json.dumps(out), flush=True)
    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
