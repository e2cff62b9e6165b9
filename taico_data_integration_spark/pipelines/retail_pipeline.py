"""Entry point C (SURVEY.md §3.3): retail star-schema pipeline.

Reference flow: CSV -> GCS -> BQ raw_invoices -> soda check -> dbt transform
group -> soda check -> dbt report group -> soda check (dags/retail.py:16-95).
Here: one SparkSession, raw -> check -> 3 dims + fact -> check -> 3 reports
-> check, persisted through the versioned TableStore. Every stage is a
DataFrame transformation; checks are single-pass aggregates.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..checks.engine import run_checks
from ..checks.suites import (
    MIN_ROWS,
    retail_dim_datetime_suite,
    retail_dim_product_suite,
    retail_fct_suite,
)
from ..checks.engine import Check
from ..ops.incremental import TableStore
from ..ops.retail import (
    country_from_fixtures,
    dim_customer,
    dim_datetime,
    dim_product,
    fct_invoices,
    raw_invoices_from_fixtures,
    report_customer_invoices,
    report_product_invoices,
    report_year_invoices,
)


def run_retail_pipeline(spark: SparkSession, sf_dir: str, store_root: str) -> dict:
    store = TableStore(spark, store_root)
    results: dict[str, list] = {}

    raw = raw_invoices_from_fixtures(spark, sf_dir)
    raw_checks = [
        Check("min_rows", "raw_min_rows", {"n": MIN_ROWS}),
        Check("not_null", "raw_invoiceno_not_null", {"column": "InvoiceNo"}),
    ]
    results["raw_invoices"] = run_checks(raw, raw_checks)

    country = country_from_fixtures(spark, sf_dir)
    dc = dim_customer(raw, country)
    dp = dim_product(raw)
    dd = dim_datetime(raw)
    fct = fct_invoices(raw)

    results["dim_product"] = run_checks(dp, retail_dim_product_suite())
    results["dim_datetime"] = run_checks(dd, retail_dim_datetime_suite())
    results["fct_invoices"] = run_checks(fct, retail_fct_suite())

    for name, df in [
        ("dim_customer", dc),
        ("dim_product", dp),
        ("dim_datetime", dd),
        ("fct_invoices", fct),
        ("report_customer_invoices", report_customer_invoices(fct, dc)),
        ("report_product_invoices", report_product_invoices(fct, dp)),
        ("report_year_invoices", report_year_invoices(fct, dd)),
    ]:
        store.write(name, df)

    ok = all(r["ok"] for rs in results.values() for r in rs)
    return {"ok": ok, "checks": results}
