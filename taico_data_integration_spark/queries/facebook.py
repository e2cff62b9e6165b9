"""Facebook transform pipeline query (entry point B, SURVEY.md §3.2) over
the events-derived ads_insights/campaigns adapters, with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..ops.facebook import ads_insights_from_fixtures, campaigns_from_fixtures, fb_ads_transform


def fb_ads_transformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ads = ads_insights_from_fixtures(spark, sf_dir)
    camp = campaigns_from_fixtures(spark, sf_dir)
    return fb_ads_transform(ads, camp)


FB_TRANSFORM_SQL = """
WITH ads AS (
  SELECT 'ad_' || CAST(event_id AS VARCHAR) AS ad_id,
         'campaign_id_' || CAST(user_id % 50 AS VARCHAR) AS campaign_id,
         strftime(ts, '%Y-%m-%d') AS date_start,
         CASE event_type WHEN 'purchase' THEN 'CONVERSIONS'
                         WHEN 'click' THEN 'TRAFFIC'
                         WHEN 'view' THEN 'VIDEO_VIEWS'
                         ELSE 'BRAND_AWARENESS' END AS objective,
         CAST(user_id % 100 AS VARCHAR) AS clicks,
         CAST(event_id % 1000 AS VARCHAR) AS impressions,
         CAST(user_id % 50 AS VARCHAR) AS unique_clicks,
         replace(CAST(value AS VARCHAR), '.', ',') AS spend,
         CASE WHEN event_type = 'error' THEN 'n/a'
              ELSE replace(CAST(value AS VARCHAR), '.', ',') END AS conversion_values,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS created_time,
         'Account ' || CAST(user_id % 5 AS VARCHAR) AS account_name,
         CAST(user_id % 5 AS VARCHAR) AS account_id,
         (['Classical', 'CRM', 'Digital', 'Branding'])[CAST(user_id % 4 AS INT) + 1] AS optimization_goal
  FROM events),
camp AS (
  SELECT 'campaign_id_' || substring(id, 4) AS campaign_id, name AS campaign_name
  FROM (SELECT DISTINCT 'fb_' || CAST(user_id % 50 AS VARCHAR) AS id,
               'Campaign ' || CAST(user_id % 50 AS VARCHAR) AS name FROM events) c)
SELECT CAST(row_number() OVER (ORDER BY ad_id) AS BIGINT) AS id,
  TRY_CAST(date_start AS DATE) AS date,
  'facebook' AS channel,
  campaign_name AS campaign,
  account_name AS publisher,
  account_id AS property,
  CASE objective WHEN 'CONVERSIONS' THEN 'Conversion Ad'
                 WHEN 'TRAFFIC' THEN 'Traffic Ad'
                 WHEN 'VIDEO_VIEWS' THEN 'Video Ad'
                 ELSE 'Other Ad' END AS media_type,
  CASE WHEN optimization_goal IN ('Classical', 'CRM', 'Digital') THEN optimization_goal
       ELSE 'Other' END AS media_cluster,
  TRY_CAST(clicks AS INT) AS clicks,
  TRY_CAST(impressions AS INT) AS impressions,
  TRY_CAST(unique_clicks AS INT) AS "unique",
  TRY_CAST(replace(spend, ',', '.') AS DOUBLE) AS media_cost_eur,
  TRY_CAST(replace(conversion_values, ',', '.') AS DOUBLE) AS revenue,
  account_id AS owner,
  try_strptime(created_time, '%Y-%m-%d %H:%M:%S') AS added_at,
  TRY_CAST(replace(spend, ',', '.') AS DOUBLE) * CAST(0.9 AS DOUBLE) AS net_media_cost,
  TRY_CAST(replace(spend, ',', '.') AS DOUBLE) * CAST(0.8 AS DOUBLE) AS net_net_media_cost
FROM ads LEFT JOIN camp USING (campaign_id)
"""


QUERIES = {"fb_ads_transformed": fb_ads_transformed}
ORACLE = {"fb_ads_transformed": FB_TRANSFORM_SQL}
