"""Schema registry: StructTypes for every reference-domain table
(SURVEY.md §1.4, FIXTURES.md). The check engine's schema_check compares
against these — name-set equality like the reference
(include/scripts/data_quality_checks.py:18-28) plus dtype equality
(strictly stronger, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DecimalType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, t, nullable: bool = True) -> StructField:
    return StructField(name, t, nullable)


# --- Media-analytics domain (include/scripts/config.py:84-91) -------------

MAIN_MEDIA_FACT = StructType(
    [
        _f("id", LongType(), False),
        _f("date", DateType()),
        _f("channel", StringType()),
        _f("campaign", StringType()),
        _f("publisher", StringType()),
        _f("property", StringType()),
        _f("media_type", StringType()),
        _f("media_cluster", StringType()),
        _f("clicks", IntegerType()),
        _f("impressions", IntegerType()),
        _f("unique", IntegerType()),
        _f("media_cost_eur", DecimalType(18, 6)),
        _f("cpm", DoubleType()),
        _f("cpc", DoubleType()),
        _f("grp_circulation", DoubleType()),
        _f("revenue", DoubleType()),
        _f("owner", StringType()),
        _f("added_at", TimestampType()),
        _f("updated_at", TimestampType()),
        _f("product_group", StringType()),
        _f("product", StringType()),
        _f("audience", StringType()),
        _f("gross_media_cost", DecimalType(18, 6)),
        _f("net_media_cost", DecimalType(18, 6)),
        _f("net_net_media_cost", DecimalType(18, 6)),
        _f("block_code", StringType()),  # dropped in staging/prod (config.py:93-107)
    ]
)

# Nine (id, name, company_id) dimensions (include/scripts/config.py:4-27).
DIMENSION_NAMES = (
    "channel",
    "publisher",
    "campaign",
    "media_type",
    "media_cluster",
    "property",
    "audience",
    "product",
    "product_group",
)

DIMENSION = StructType(
    [_f("id", IntegerType(), False), _f("name", StringType(), False), _f("company_id", IntegerType(), False)]
)

# Bridge table (include/scripts/sync_data.py:95-98).
MEDIA_RELATIONS = StructType(
    [_f("date", DateType())]
    + [_f(f"{d}_id", IntegerType()) for d in DIMENSION_NAMES]
    + [_f("company_id", IntegerType(), False)]
)

COMPANIES = StructType([_f("id", IntegerType(), False), _f("alias", StringType(), False)])

# Facebook raw (config.py:77-81, :110-112; fb_meta_ads_transformed.sql:4-21).
ADS_INSIGHTS = StructType(
    [
        _f("ad_id", StringType()),
        _f("campaign_id", StringType()),
        _f("date_start", StringType()),
        _f("objective", StringType()),
        _f("clicks", StringType()),
        _f("impressions", StringType()),
        _f("unique_clicks", StringType()),
        _f("spend", StringType()),  # comma-decimal strings
        _f("cpm", StringType()),
        _f("cpc", StringType()),
        _f("conversion_values", StringType()),
        _f("created_time", StringType()),
        _f("updated_time", StringType()),
        _f("account_name", StringType()),
        _f("account_id", StringType()),
        _f("optimization_goal", StringType()),
        _f("campaign_name", StringType()),
    ]
)

FB_CAMPAIGNS = StructType(
    [_f("id", StringType()), _f("name", StringType()), _f("status", StringType()), _f("objective", StringType())]
)

# --- Retail star-schema domain (include/soda/checks/sources/raw_invoices.yml) ---

RAW_INVOICES = StructType(
    [
        _f("InvoiceNo", StringType()),
        _f("StockCode", StringType()),
        _f("Description", StringType()),
        _f("Quantity", IntegerType()),
        _f("InvoiceDate", StringType()),  # mixed-format strings (dim_datetime.sql:7-16)
        _f("UnitPrice", DecimalType(18, 2)),
        _f("CustomerID", StringType()),
        _f("Country", StringType()),
    ]
)

COUNTRY = StructType([_f("nicename", StringType()), _f("iso", StringType())])
