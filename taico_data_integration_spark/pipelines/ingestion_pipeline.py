"""Corpus-ingestion pipeline: the LLM-data operators composed end-to-end.

Flow per arriving batch (the batch twin of the stream-static path in
streaming.joins.stream_lsh_dedup_against_index):

1. exact dedup WITHIN the batch (md5 fingerprint, keep min doc_id);
2. near-dup LSH pass, two-sided: (a) incremental probe against the STORED
   corpus band index (queries.llm.dedup_incremental_lsh shape) and (b) a
   within-batch band self-join so two near-duplicates arriving in the SAME
   batch (including the corpus-seeding first batch) cannot both enter the
   corpus. Within-batch survivorship is pairwise min-id: a doc is dropped
   iff it verifies against a smaller-id doc of the same batch (the full
   connected-components canonical resolution is the batch path,
   queries.llm.dedup_canonical_keepers);
3. one-pass curation gate (llm.curation.curation_flags);
4. deterministic split assignment for the survivors;
5. append survivors to the corpus table and their band keys to the band
   index (TableStore versioned writes), so the NEXT batch probes an index
   that already contains this batch.

Everything is set-based: the only driver-side values are row counts for
the summary. At cluster scale the corpus/band tables are the persisted
index this pipeline maintains incrementally — re-ingesting the same batch
accepts nothing (see tests/test_pipelines.py round-trip invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm.curation import curation_flags, dataset_split
from ..llm.dedup import materialized_shingles, minhash_band_keys_fast, normalized_text
from ..ops.formats import TableFormat
from .callbacks import PipelineCallbacks

CORPUS_TABLE = "corpus_docs"
BANDS_TABLE = "corpus_bands"

_MIN_JACCARD = 0.5


def _verified_near_dups(new_bands: DataFrame, corpus_bands: DataFrame,
                        new_shingled: DataFrame, corpus_shingled: DataFrame) -> DataFrame:
    """(new_doc_id) of batch docs whose LSH candidates verify at >= the
    jaccard threshold against any corpus doc — band equi-join then
    array_intersect on the candidates only."""
    cands = (
        new_bands.select(F.col("doc_id").alias("new_doc_id"), "band_id", "band_key")
        .join(
            corpus_bands.select(F.col("doc_id").alias("corpus_doc_id"), "band_id", "band_key"),
            ["band_id", "band_key"],
        )
        .select("new_doc_id", "corpus_doc_id")
        .distinct()
    )
    sa = new_shingled.select(F.col("doc_id").alias("new_doc_id"), F.col("__sh").alias("sh_a"))
    sb = corpus_shingled.select(F.col("doc_id").alias("corpus_doc_id"), F.col("__sh").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.size("sh_a") + F.size("sh_b") - common).cast("double")
    return (
        cands.join(sa, "new_doc_id")
        .join(sb, "corpus_doc_id")
        .where(jac >= _MIN_JACCARD)
        .select("new_doc_id")
        .distinct()
    )


def _within_batch_near_dups(new_bands: DataFrame, new_shingled: DataFrame) -> DataFrame:
    """(doc_id) of batch docs dropped by within-batch survivorship: any doc
    whose LSH candidates verify at >= the jaccard threshold against a
    SMALLER-id doc of the same batch. Band equi-join (doc_a < doc_b keeps
    each unordered pair once), verify on the candidates only."""
    a = new_bands.select(F.col("doc_id").alias("doc_a"), "band_id", "band_key")
    b = new_bands.select(F.col("doc_id").alias("doc_b"), "band_id", "band_key")
    cands = (
        a.join(b, ["band_id", "band_key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = new_shingled.select(F.col("doc_id").alias("doc_a"), F.col("__sh").alias("sh_a"))
    sb = new_shingled.select(F.col("doc_id").alias("doc_b"), F.col("__sh").alias("sh_b"))
    common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = common.cast("double") / (F.size("sh_a") + F.size("sh_b") - common).cast("double")
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(jac >= _MIN_JACCARD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def ingest_batch(
    spark: SparkSession,
    store: TableFormat,
    batch: DataFrame,
    callbacks: PipelineCallbacks | None = None,
) -> dict:
    """Ingest one batch of documents (doc_id, text, ...) into the stored
    corpus. Returns a summary dict with per-stage drop accounting."""
    callbacks = callbacks or PipelineCallbacks()
    n_in = batch.count()

    # 1. exact dedup within the batch AND against the stored corpus
    batch_fp = batch.withColumn("__fp", F.md5(normalized_text("text")))
    keepers = batch_fp.groupBy("__fp").agg(F.min("doc_id").alias("doc_id"))
    batch_exact = batch_fp.join(keepers, ["__fp", "doc_id"], "left_semi")
    if store.exists(CORPUS_TABLE):
        corpus = store.read(CORPUS_TABLE)
        corpus_fps = corpus.select(F.md5(normalized_text("text")).alias("__fp")).distinct()
        batch_exact = batch_exact.join(corpus_fps, "__fp", "left_anti")
    batch_exact = batch_exact.drop("__fp").localCheckpoint()
    n_exact = n_in - batch_exact.count()

    # 2. near-dup LSH pass: within-batch self-probe + incremental probe vs
    # the stored band index (the seeding batch gets the self-probe too)
    new_shingled = materialized_shingles(batch_exact, "text", "doc_id", 3)
    new_bands = minhash_band_keys_fast(batch_exact, shingled=new_shingled)
    drop = _within_batch_near_dups(new_bands, new_shingled)
    if store.exists(BANDS_TABLE):
        corpus_bands = store.read(BANDS_TABLE)
        corpus_shingled = materialized_shingles(store.read(CORPUS_TABLE), "text", "doc_id", 3)
        near = _verified_near_dups(new_bands, corpus_bands, new_shingled, corpus_shingled)
        drop = drop.unionByName(near.withColumnRenamed("new_doc_id", "doc_id")).distinct()
    deduped = batch_exact.join(drop, "doc_id", "left_anti").localCheckpoint()
    n_near = batch_exact.count() - deduped.count()

    # 3. curation gate
    flags = curation_flags(deduped)
    accepted = deduped.join(flags.where("keep").select("doc_id"), "doc_id", "left_semi")
    accepted = accepted.withColumn("split", dataset_split("doc_id")).localCheckpoint()
    n_accepted = accepted.count()
    n_curation = deduped.count() - n_accepted

    # 4. append survivors to corpus + band index (versioned writes), with
    # quality metrics riding the write itself (Observation — no extra scan)
    quality: list[dict] = []
    if n_accepted > 0:
        from ..checks.engine import Check, attach_observed_checks

        acc_docs = accepted.drop("split")  # corpus keeps the batch schema
        acc_docs, evaluate = attach_observed_checks(
            acc_docs,
            [
                Check("not_null", "doc_id_not_null", {"column": "doc_id"}),
                Check("not_null", "text_not_null", {"column": "text"}),
                Check("min_rows", "accepted_nonempty", {"n": 1}),
            ],
        )
        new_corpus = (
            store.read(CORPUS_TABLE).unionByName(acc_docs)
            if store.exists(CORPUS_TABLE)
            else acc_docs
        )
        store.write(CORPUS_TABLE, new_corpus)
        quality = evaluate()
        acc_bands = minhash_band_keys_fast(accepted)
        new_bands_tab = (
            store.read(BANDS_TABLE).unionByName(acc_bands)
            if store.exists(BANDS_TABLE)
            else acc_bands
        )
        store.write(BANDS_TABLE, new_bands_tab)

    summary = {
        "ok": all(r["ok"] for r in quality),
        "quality": quality,
        "n_in": n_in,
        "n_exact_dup": n_exact,
        "n_near_dup": n_near,
        "n_curation_reject": n_curation,
        "n_accepted": n_accepted,
        "corpus_rows": store.read(CORPUS_TABLE).count() if store.exists(CORPUS_TABLE) else 0,
    }
    callbacks.report("ingestion", summary)
    return summary
