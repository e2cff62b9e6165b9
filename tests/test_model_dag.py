"""Model-DAG runner tests: retail star as a declared model graph; cycle and
failure handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from taico_data_integration_spark.checks.engine import Check
from taico_data_integration_spark.ops.incremental import TableStore
from taico_data_integration_spark.ops.retail import (
    dim_datetime,
    dim_product,
    fct_invoices,
    raw_invoices_from_fixtures,
    report_year_invoices,
)
from taico_data_integration_spark.pipelines.model_dag import Model, ModelDAG

SF_DIR = "/root/testdata/sf0.001"


def _retail_dag() -> ModelDAG:
    return ModelDAG(
        [
            Model(
                "dim_product",
                lambda d: dim_product(d["raw_invoices"]),
                deps=["raw_invoices"],
                checks=[Check("unique", "pid_unique", {"columns": ["product_id"]})],
            ),
            Model(
                "dim_datetime",
                lambda d: dim_datetime(d["raw_invoices"]),
                deps=["raw_invoices"],
                checks=[Check("in_range", "weekday", {"column": "weekday", "lo": 1, "hi": 7})],
            ),
            Model(
                "fct_invoices",
                lambda d: fct_invoices(d["raw_invoices"]),
                deps=["raw_invoices"],
                materialize=True,
                checks=[Check("min_rows", "fct_rows", {"n": 100})],
            ),
            Model(
                "report_year_invoices",
                lambda d: report_year_invoices(d["fct_invoices"], d["dim_datetime"]),
                deps=["fct_invoices", "dim_datetime"],
                checks=[Check("not_null", "year_nn", {"column": "year"})],
            ),
        ]
    )


def test_retail_dag_runs_in_dependency_order(spark, tmp_path):
    dag = _retail_dag()
    order = dag.execution_order({"raw_invoices"})
    assert order.index("fct_invoices") < order.index("report_year_invoices")
    assert order.index("dim_datetime") < order.index("report_year_invoices")
    raw = raw_invoices_from_fixtures(spark, SF_DIR)
    out = dag.run({"raw_invoices": raw}, store=TableStore(spark, str(tmp_path)))
    assert all(out[m]["ok"] for m in ("dim_product", "dim_datetime", "fct_invoices", "report_year_invoices"))
    assert out["_frames"]["report_year_invoices"].count() > 0


def test_dag_fail_fast_stops_downstream(spark):
    raw = raw_invoices_from_fixtures(spark, SF_DIR)
    dag = ModelDAG(
        [
            Model(
                "bad",
                lambda d: d["raw_invoices"],
                deps=["raw_invoices"],
                checks=[Check("min_rows", "impossible", {"n": 10**12})],
            ),
            Model("downstream", lambda d: d["bad"].limit(1), deps=["bad"]),
        ]
    )
    out = dag.run({"raw_invoices": raw})
    assert out["_failed"] == "bad"
    assert "downstream" not in out


def test_dag_cycle_detected():
    dag = ModelDAG(
        [
            Model("a", lambda d: None, deps=["b"]),
            Model("b", lambda d: None, deps=["a"]),
        ]
    )
    with pytest.raises(ValueError, match="cycle"):
        dag.execution_order(set())


def test_dag_unknown_dep_rejected():
    dag = ModelDAG([Model("a", lambda d: None, deps=["nope"])])
    with pytest.raises(ValueError, match="unknown deps"):
        dag.execution_order(set())
