"""Full-platform integration: all three reference entry points against one
versioned store, then dimension re-sync, subject erasure and vacuum — the
'a user of the reference switches to this repo' scenario end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from taico_data_integration_spark.catalog import load_table
from taico_data_integration_spark.ops.deletion import erase_subjects
from taico_data_integration_spark.ops.incremental import TableStore
from taico_data_integration_spark.pipelines.etl_pipeline import run_etl_pipeline
from taico_data_integration_spark.pipelines.facebook_pipeline import run_facebook_pipeline
from taico_data_integration_spark.pipelines.retail_pipeline import run_retail_pipeline

SF_DIR = "/root/testdata/sf0.001"


def test_full_platform_replay(spark, tmp_path):
    root = str(tmp_path)
    store = TableStore(spark, root)

    # entry point C: retail star
    assert run_retail_pipeline(spark, SF_DIR, root)["ok"]
    # entry point B: facebook incremental + promote
    assert run_facebook_pipeline(spark, SF_DIR, root)["ok"]
    # entry point A: dimension sync + bridge over the promoted fb fact
    fb = store.read("fb_production")
    out = run_etl_pipeline(
        spark,
        fb.select("channel", "publisher", "media_type", "media_cluster"),
        ["channel", "publisher", "media_type", "media_cluster"],
        root,
    )
    assert out["ok"], out
    assert store.read("dim_media_cluster").count() >= 1
    assert out["results"]["bridge_rows"] >= 1

    # GDPR-style erasure from the production fact (publisher as subject key)
    victim = store.read("dim_publisher").limit(1).select(F.col("name").alias("subject"))
    victim_name = victim.collect()[0].subject
    report = erase_subjects(store, victim, {"fb_production": {"publisher": "subject"}})
    assert report["fb_production"]["deleted"] > 0
    assert store.read("fb_production").where(F.col("publisher") == victim_name).count() == 0
    store.vacuum("fb_production", keep_latest=1)

    # dims re-sync against the erased fact drops the erased publisher
    fb2 = store.read("fb_production")
    out2 = run_etl_pipeline(
        spark,
        fb2.select("channel", "publisher", "media_type", "media_cluster"),
        ["channel", "publisher", "media_type", "media_cluster"],
        root,
    )
    assert out2["ok"], out2
    assert store.read("dim_publisher").where(F.col("name") == victim_name).count() == 0
