"""Schema-registry consistency: fixture adapters must produce exactly the
schemas declared in schemas.py (names AND types), and the registry covers
every reference-domain table shape (SURVEY.md §1.4)."""

from __future__ import annotations

from taico_data_integration_spark import schemas
from taico_data_integration_spark.ops.facebook import (
    ads_insights_from_fixtures,
    campaigns_from_fixtures,
)
from taico_data_integration_spark.ops.retail import (
    country_from_fixtures,
    raw_invoices_from_fixtures,
)

SF_DIR = "/root/testdata/sf0.001"


def test_raw_invoices_adapter_matches_registry(spark):
    got = raw_invoices_from_fixtures(spark, SF_DIR).schema
    expected = schemas.RAW_INVOICES
    assert [f.name for f in got.fields] == [f.name for f in expected.fields]
    assert [f.dataType for f in got.fields] == [f.dataType for f in expected.fields]


def test_country_adapter_matches_registry(spark):
    got = country_from_fixtures(spark, SF_DIR).schema
    assert [f.name for f in got.fields] == [f.name for f in schemas.COUNTRY.fields]


def test_ads_insights_adapter_subset_of_registry(spark):
    got = set(ads_insights_from_fixtures(spark, SF_DIR).columns)
    declared = set(schemas.ADS_INSIGHTS.fieldNames())
    assert got <= declared
    # the transform's required inputs are all present
    assert {"ad_id", "campaign_id", "spend", "objective", "optimization_goal"} <= got


def test_campaigns_adapter_matches_registry(spark):
    got = campaigns_from_fixtures(spark, SF_DIR).schema
    assert [f.name for f in got.fields] == [f.name for f in schemas.FB_CAMPAIGNS.fields]


def test_registry_covers_reference_tables():
    assert len(schemas.MAIN_MEDIA_FACT.fields) == 26  # 25 + block_code
    assert len(schemas.DIMENSION_NAMES) == 9
    assert {f.name for f in schemas.MEDIA_RELATIONS.fields} == (
        {"date", "company_id"} | {f"{d}_id" for d in schemas.DIMENSION_NAMES}
    )
