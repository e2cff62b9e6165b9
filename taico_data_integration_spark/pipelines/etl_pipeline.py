"""Entry point A (SURVEY.md §3.1): the hourly dimension-sync pipeline.

Reference flow (dags/etl.py:118-190): per dimension column — staging table
rebuild, distinct extract from the warehouse, row-at-a-time NOT-EXISTS
insert + delete-missing sweep into Postgres, validation, then the
media-combinations bridge rebuild. Here: per dimension — distinct extract
-> mirror sync against the stored dim (one anti-join each way, id-stable)
-> single-pass validation -> versioned write; then one declarative bridge
rebuild (M7). Zero driver-side loops over rows; the only Python loop is
over the handful of dimension NAMES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..checks.engine import run_checks
from ..checks.suites import dimension_suite
from ..ops.dims import distinct_extract, mint_ids, mirror_sync, validate_sync
from ..ops.formats import TableFormat
from ..ops.incremental import TableStore
from ..ops.relations import rebuild_relations


def sync_dimension(
    store: TableFormat,
    table: str,
    incoming_names: DataFrame,
    company_id: int,
) -> DataFrame:
    """M2 mirror sync with stable ids: keep matching rows, mint new ids above
    the current max for new names, drop names absent from the source."""
    if store.exists(table):
        existing = store.read(table)
        kept, added = mirror_sync(existing, incoming_names, ["name"])
        start = (existing.agg(F.max("id")).collect()[0][0] or 0) + 1
        minted = mint_ids(added.select("name"), ["name"], start_at=start).withColumn(
            "company_id", F.lit(company_id)
        )
        synced = kept.unionByName(minted.select("id", "name", "company_id"))
    else:
        synced = mint_ids(incoming_names.select("name"), ["name"]).withColumn(
            "company_id", F.lit(company_id)
        ).select("id", "name", "company_id")
    store.write(table, synced)
    return store.read(table)


def run_etl_pipeline(
    spark: SparkSession,
    fact: DataFrame,
    dim_columns: list[str],
    store_root: str,
    company_id: int = 1,
    bridge_keep_cols: list[str] | None = None,
    callbacks=None,
) -> dict:
    """Sync every dimension column of `fact`, validate, rebuild the bridge.

    ``callbacks`` (pipelines.callbacks.PipelineCallbacks) receives the run
    summary via on_success/on_failure — the S15 notification seam."""
    store = TableStore(spark, store_root)
    results: dict[str, object] = {}
    dims: dict[str, DataFrame] = {}

    for col in dim_columns:
        incoming = distinct_extract(fact, col)
        if incoming.isEmpty():  # branch-on-empty (dags/etl.py:53-61)
            results[col] = {"status": "skipped_empty"}
            continue
        dim = sync_dimension(store, f"dim_{col}", incoming, company_id)
        checks = run_checks(dim, dimension_suite())
        sync_ok = (
            validate_sync(incoming, dim, ["name"]).agg(F.sum("missing_count")).collect()[0][0] == 0
        )
        results[col] = {"status": "synced", "checks": checks, "in_sync": bool(sync_ok)}
        dims[col] = dim

    bridge = rebuild_relations(fact, dims, keep_cols=bridge_keep_cols or [])
    store.write("media_relations", bridge.withColumn("company_id", F.lit(company_id)))
    results["bridge_rows"] = store.read("media_relations").count()

    ok = all(
        (isinstance(r, dict) and r.get("status") == "skipped_empty")
        or (isinstance(r, dict) and r.get("in_sync") and all(c["ok"] for c in r["checks"]))
        for k, r in results.items()
        if k != "bridge_rows"
    )
    summary = {"ok": ok, "results": results}
    if callbacks is not None:
        callbacks.report("etl_pipeline", summary)
    return summary
