"""Synthetic corpus / embedding generators for scale-stress testing.

Spark-native: pure Column expressions over ``spark.range`` — no driver-side
row materialization, so the same generator produces 500 docs or 50M docs.
Content is deterministic in (id, seed) via md5, hence content-stable under
any partitioning / re-run (the repo-wide determinism contract).

Dup density is CONTROLLED: every ``dup_every``-th document is a planted
near-duplicate of its predecessor (same base words plus a tiny
id-dependent tail — word-3-shingle jaccard ~0.93), everything else draws
its words independently from a ``vocab``-sized space, so cross-doc shingle
collisions (LSH false-positive fuel) are rare and quantifiable. This is
what lets tests pin "candidate pairs = O(planted collisions)" instead of
hoping."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_mod(parts, mod: int):
    """Deterministic integer in [0, mod) from md5 of the joined parts."""
    return F.conv(F.substring(F.md5(F.concat_ws("_", *parts)), 1, 12), 16, 10).cast(
        "bigint"
    ) % mod


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    dup_every: int = 10,
    words_per_doc: int = 60,
    vocab: int = 50_000,
    seed: int = 7,
) -> DataFrame:
    """(doc_id, text, is_planted_dup). Doc i with i % dup_every == 1 is a
    near-duplicate of doc i-1; planted pair count = #{i : i % dup_every == 1}."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = (F.col("doc_id") % dup_every == 1) & (F.col("doc_id") > 0)
    src = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id")).cast("string")
    words = F.transform(
        F.sequence(F.lit(1), F.lit(words_per_doc)),
        lambda p: F.concat(
            F.lit("w"), _hash_mod([src, p.cast("string"), F.lit(str(seed))], vocab).cast("string")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        is_dup, F.concat(text, F.lit(" tail"), F.col("doc_id").cast("string"), F.lit(" end"))
    ).otherwise(text)
    return base.select("doc_id", text.alias("text"), is_dup.alias("is_planted_dup"))


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int,
    dim: int = 16,
    n_clusters: int = 32,
    seed: int = 11,
) -> DataFrame:
    """(vec_id, embedding array<double>) drawn around n_clusters synthetic
    centers (vec_id % n_clusters) with small per-vector jitter — clustered
    structure so IVF list assignment is meaningful, deterministic in
    (vec_id, seed)."""
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    cl = (F.col("vec_id") % n_clusters).cast("string")
    vid = F.col("vec_id").cast("string")
    emb = F.transform(
        F.sequence(F.lit(1), F.lit(dim)),
        lambda j: (
            _hash_mod([cl, j.cast("string"), F.lit(f"c{seed}")], 2000).cast("double") / 1000.0
            - 1.0
            + _hash_mod([vid, j.cast("string"), F.lit(f"n{seed}")], 200).cast("double") / 1000.0
        ),
    )
    return base.select("vec_id", emb.alias("embedding"))
