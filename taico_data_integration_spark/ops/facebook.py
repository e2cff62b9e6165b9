"""Facebook ads transform pipeline — the Spark restatement of the
reference's dbt model chain (entry point B, SURVEY.md §3.2):
include/dbt/models/taico/meta/fb_meta_ads_transformed.sql.

Stages (all Column expressions, one declarative plan):
  cast/clean (comma-decimal money, numeric-as-string counts)
  -> computed-key LEFT join to campaigns (J2: concat('campaign_id_', substring(id, 4)))
  -> CASE mappings (media_type from objective, media_cluster from
     optimization_goal, fb_meta_ads_transformed.sql:42-51)
  -> deterministic row_number id (SURVEY.md §7.4 hazard 1)
  -> derived net costs (spend*0.9 / spend*0.8, :66-68).

The fixture adapters synthesize ads_insights/campaigns deterministically
from the events table so the whole chain is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .transforms import comma_decimal

OBJECTIVE_TO_MEDIA_TYPE = {
    "CONVERSIONS": "Conversion Ad",
    "TRAFFIC": "Traffic Ad",
    "VIDEO_VIEWS": "Video Ad",
}
KNOWN_CLUSTERS = ("Classical", "CRM", "Digital")


def ads_insights_from_fixtures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ads_insights built from events: comma-decimal money
    strings, numeric-as-string counts, 'n/a' garbage on error events.

    No fan_out (measured, r12): the string synthesis alone wins from a
    fan-out (1.9 -> 1.1 s) but the full fb transform LOSES (+0.5 s) — the
    narrow id-mint pipeline downstream runs several sequential jobs
    (range-boundary sample, checkpoint+count, assignment) and each pays the
    extra exchange stage, which outweighs the parallel-synthesis gain."""
    e = load_table(spark, sf_dir, "events")
    camp_key = (F.col("user_id") % 50).cast("string")
    return e.select(
        F.concat(F.lit("ad_"), F.col("event_id").cast("string")).alias("ad_id"),
        F.concat(F.lit("campaign_id_"), camp_key).alias("campaign_id"),
        F.date_format("ts", "yyyy-MM-dd").alias("date_start"),
        F.when(F.col("event_type") == "purchase", "CONVERSIONS")
        .when(F.col("event_type") == "click", "TRAFFIC")
        .when(F.col("event_type") == "view", "VIDEO_VIEWS")
        .otherwise("BRAND_AWARENESS")
        .alias("objective"),
        (F.col("user_id") % 100).cast("string").alias("clicks"),
        (F.col("event_id") % 1000).cast("string").alias("impressions"),
        (F.col("user_id") % 50).cast("string").alias("unique_clicks"),
        F.replace(F.col("value").cast("string"), F.lit("."), F.lit(",")).alias("spend"),
        F.when(F.col("event_type") == "error", F.lit("n/a"))
        .otherwise(F.replace(F.col("value").cast("string"), F.lit("."), F.lit(",")))
        .alias("conversion_values"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("created_time"),
        F.concat(F.lit("Account "), (F.col("user_id") % 5).cast("string")).alias("account_name"),
        (F.col("user_id") % 5).cast("string").alias("account_id"),
        F.element_at(
            F.array(F.lit("Classical"), F.lit("CRM"), F.lit("Digital"), F.lit("Branding")),
            (F.col("user_id") % 4).cast("int") + 1,
        ).alias("optimization_goal"),
    )


def campaigns_from_fixtures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Campaign registry: id 'fb_<k>' whose suffix matches the ads'
    campaign key after the reference's substring(id, 4) computation."""
    e = load_table(spark, sf_dir, "events")
    k = (F.col("user_id") % 50).cast("string")
    return (
        e.select(k.alias("k"))
        .distinct()
        .select(
            F.concat(F.lit("fb_"), F.col("k")).alias("id"),
            F.concat(F.lit("Campaign "), F.col("k")).alias("name"),
            F.lit("ACTIVE").alias("status"),
            F.lit("CONVERSIONS").alias("objective"),
        )
    )


def fb_ads_transform(ads: DataFrame, campaigns: DataFrame) -> DataFrame:
    """fb_meta_ads_transformed.sql restated. Returns the transformed media
    fact slice with a deterministic row_number id ordered by ad_id."""
    camp = campaigns.select(
        F.concat(F.lit("campaign_id_"), F.expr("substring(id, 4)")).alias("campaign_id"),
        F.col("name").alias("campaign_name"),
    )
    cleaned = ads.select(
        "ad_id",
        "campaign_id",
        F.to_date("date_start").alias("date"),
        "objective",
        F.col("clicks").cast("int").alias("clicks"),
        F.col("impressions").cast("int").alias("impressions"),
        F.col("unique_clicks").cast("int").alias("unique"),
        comma_decimal("spend").alias("spend"),
        comma_decimal("conversion_values").alias("revenue"),
        F.to_timestamp("created_time").alias("added_at"),
        F.col("account_name").alias("publisher"),
        F.col("account_id").alias("property"),
        "optimization_goal",
    )
    media_type = F.when(F.col("objective") == "CONVERSIONS", OBJECTIVE_TO_MEDIA_TYPE["CONVERSIONS"])
    for k, v in list(OBJECTIVE_TO_MEDIA_TYPE.items())[1:]:
        media_type = media_type.when(F.col("objective") == k, v)
    media_type = media_type.otherwise("Other Ad")
    media_cluster = F.when(
        F.col("optimization_goal").isin(*KNOWN_CLUSTERS), F.col("optimization_goal")
    ).otherwise("Other")
    from .dims import mint_ids_distributed

    # The dbt model mints ids with an UNPARTITIONED row_number ordered by
    # ad_id (fb_meta_ads_transformed.sql). mint_ids_distributed produces the
    # SAME dense deterministic ids (ad_id is a unique key, string-ordered on
    # both engines) via range partitioning + per-partition numbering — no
    # single-partition sort anywhere in the plan, so the transform scales
    # past the reference's daily-batch assumption to arbitrary fact size.
    #
    # Mint over the NARROW key only (guide §2.3 "shuffle keys and metadata
    # instead of payloads"): the mint pipeline range-shuffles, checkpoints and
    # counts its input, so feeding it the full 17-column cleaned fact paid
    # those passes on every payload byte. The ad_id projection prunes the
    # scan to one column for all of that; the minted (ad_id, id) map is then
    # attached back with one equi-join — on the key the ids were derived
    # from, so the attachment cannot reintroduce a payload-wide range sort.
    wide = cleaned.join(F.broadcast(camp), "campaign_id", "left")
    # PRECONDITION (load-bearing, ADVICE r12 #1): ad_id must be unique and
    # non-null. Uniqueness is already the mint's order_cols contract (ids
    # are only deterministic on a unique key); with the narrow-key mint it
    # additionally guarantees row preservation — a duplicate ad_id would fan
    # the attach join out into duplicated rows, and a NULL ad_id row would be
    # dropped by the inner join (the old whole-row mint kept both). The
    # fixture mints ad_id as 'ad_' || event_id (unique, non-null); any new
    # ads source must provide the same or pre-deduplicate.
    ids, n_ids = mint_ids_distributed(
        ads.select("ad_id"), order_cols=["ad_id"], id_col="id", with_total=True
    )
    # Deliberate join-strategy pick (guide §3.1): the minted map is
    # checkpoint-backed, so the planner sees no stats and defaults to a
    # sort-merge join that re-shuffles the payload. mint already collected
    # the exact row count for its offsets — broadcast when the map is small
    # enough (key+long ≈ 50 MB at the cap), shuffle join beyond that (at
    # fact scale the map is fact-sized and broadcasting would be the bug).
    joined = wide.join(F.broadcast(ids) if n_ids <= 1_000_000 else ids, "ad_id")
    return (
        joined
        .select(
            "id",
            "date",
            F.lit("facebook").alias("channel"),
            F.col("campaign_name").alias("campaign"),
            "publisher",
            "property",
            media_type.alias("media_type"),
            media_cluster.alias("media_cluster"),
            "clicks",
            "impressions",
            "unique",
            F.col("spend").alias("media_cost_eur"),
            "revenue",
            F.col("property").alias("owner"),
            "added_at",
            (F.col("spend") * F.lit(0.9)).alias("net_media_cost"),
            (F.col("spend") * F.lit(0.8)).alias("net_net_media_cost"),
        )
    )
