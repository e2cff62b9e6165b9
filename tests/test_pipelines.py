"""End-to-end pipeline tests for the three reference entry points
(SURVEY.md §3.1-§3.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from taico_data_integration_spark.catalog import load_table
from taico_data_integration_spark.ops.incremental import TableStore
from taico_data_integration_spark.pipelines.etl_pipeline import run_etl_pipeline
from taico_data_integration_spark.pipelines.facebook_pipeline import run_facebook_pipeline
from taico_data_integration_spark.pipelines.retail_pipeline import run_retail_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_retail_pipeline_end_to_end(spark, tmp_path):
    out = run_retail_pipeline(spark, SF_DIR, str(tmp_path))
    assert out["ok"], out
    store = TableStore(spark, str(tmp_path))
    assert store.read("fct_invoices").count() > 0
    assert store.read("report_year_invoices").count() > 0


def test_facebook_pipeline_promotes_and_is_incremental(spark, tmp_path):
    out = run_facebook_pipeline(spark, SF_DIR, str(tmp_path))
    assert out["ok"], out
    store = TableStore(spark, str(tmp_path))
    n1 = store.read("fb_production").count()
    assert n1 >= 100
    # second run merges the same keys: no duplicate growth (M5 semantics)
    out2 = run_facebook_pipeline(spark, SF_DIR, str(tmp_path))
    assert out2["ok"]
    assert store.read("fb_production").count() == n1


def test_etl_pipeline_syncs_dims_and_bridge(spark, tmp_path):
    o = load_table(spark, SF_DIR, "orders")
    fact = o.select(
        F.col("o_orderstatus").alias("status"), F.col("o_orderpriority").alias("priority")
    )
    out = run_etl_pipeline(spark, fact, ["status", "priority"], str(tmp_path))
    assert out["ok"], out
    store = TableStore(spark, str(tmp_path))
    assert store.read("dim_status").count() == 3
    assert store.read("dim_priority").count() == 5
    assert out["results"]["bridge_rows"] == 15
    # re-run with a shrunk fact: mirror sync drops missing names, keeps ids
    fact2 = fact.where(F.col("status") != "P")
    out2 = run_etl_pipeline(spark, fact2, ["status", "priority"], str(tmp_path))
    assert out2["ok"], out2
    dim = {r.name: r.id for r in store.read("dim_status").collect()}
    assert "P" not in dim and len(dim) == 2


def test_pipeline_callbacks_fire(spark, tmp_path):
    """S15 seam: on_success receives the run summary; on_failure receives
    a failing summary or exception payload; exceptions are never swallowed."""
    from pyspark.sql import Row

    from taico_data_integration_spark.pipelines.callbacks import (
        PipelineCallbacks,
        summary_text,
    )
    from taico_data_integration_spark.pipelines.etl_pipeline import run_etl_pipeline

    seen = []
    cb = PipelineCallbacks(
        on_success=lambda name, s: seen.append(("ok", name, s["ok"])),
        on_failure=lambda name, s: seen.append(("fail", name, s.get("ok"))),
    )
    fact = spark.createDataFrame(
        [Row(channel="tv", region="n"), Row(channel="web", region="s")]
    )
    summary = run_etl_pipeline(
        spark, fact, ["channel", "region"], str(tmp_path / "store"), callbacks=cb
    )
    assert summary["ok"]
    assert seen == [("ok", "etl_pipeline", True)]
    assert cb.fired == [("etl_pipeline", "success")]
    assert "etl_pipeline: OK" in summary_text("etl_pipeline", summary)

    # failure + exception routing
    def boom():
        raise RuntimeError("stage exploded")

    import pytest

    with pytest.raises(RuntimeError):
        cb.guard("etl_pipeline", boom)
    assert seen[-1][0] == "fail"
    cb.report("etl_pipeline", {"ok": False, "results": {}})
    assert cb.fired[-1] == ("etl_pipeline", "failure")
