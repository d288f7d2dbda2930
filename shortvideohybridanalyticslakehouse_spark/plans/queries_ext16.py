"""Extension queries, round 16: engine-native big-data primitives new in
Spark 4 — VARIANT semi-structured extraction and mergeable Datasketches
HLL sketches.

VARIANT upgrades the reference's `payload_json` STRING + from_json
pattern (SURVEY.md §1.2) to a typed binary encoding parsed once;
`variant_get` path access is codegen'd, not re-parsed per field. The
HLL query is the incremental-distinct pattern: per-day sketches are
small, MERGEABLE state — weekly/monthly distincts re-aggregate from
sketches without rescanning raw data, which is the only affordable
shape at 100 TB (exact re-distinct over a month is a full re-scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# VARIANT extraction profile
# ---------------------------------------------------------------------------

# parse_json once -> typed variant_get paths; the agg then runs on
# plain INTs. Sum is exact BIGINT, the avg division happens once on
# exact totals (identical IEEE double in both engines).
_VARIANT_ORACLE = """
SELECT
  event_type,
  CAST(count(k) AS BIGINT) AS n_with_k,
  CAST(sum(k) AS BIGINT) AS k_sum,
  round(CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE), 6) AS k_avg,
  CAST(max(k) AS BIGINT) AS k_max
FROM (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


@register("variant_props_profile", _VARIANT_ORACLE)
def q_variant_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type profile of the semi-structured `props.k` field via
    the VARIANT path (parse_json → variant_get) — the typed,
    parse-once upgrade over string re-parsing. DuckDB twin reads the
    same path with json_extract.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.round(
                F.sum("k").cast("double") / F.count("k").cast("double"), 6
            ).alias("k_avg"),
            F.max("k").alias("k_max"),
        )
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketches: daily -> weekly distinct users without rescan
# ---------------------------------------------------------------------------

# No DuckDB oracle: the sketch binary is engine-specific (Apache
# Datasketches), so the driver records the weaker rows-only check;
# tests/test_ext16_queries.py pins the estimates against exact
# countDistinct within HLL's published error envelope instead.
@register("weekly_hll_union_estimate", None)
def q_weekly_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly distinct-user estimates built by UNIONING per-day HLL
    sketches (lgK=14, ±~0.8% rse) — the re-aggregatable distinct
    pattern: day sketches persist as small binaries; any coarser
    rollup (week, month, all-time) merges them without touching raw
    events again.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.date_trunc("week", F.col("ts")).alias("week"),
        "user_id",
    )
    daily = ev.groupBy("week", "day").agg(
        F.hll_sketch_agg(F.col("user_id"), F.lit(14)).alias("sketch")
    )
    weekly = daily.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias(
            "est_weekly_users"
        ),
    )
    return weekly.select(
        "week",
        "n_days",
        F.col("est_weekly_users").cast("bigint").alias("est_weekly_users"),
    )
