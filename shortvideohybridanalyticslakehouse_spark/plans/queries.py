"""Query registry: every implemented operator exposed as a named query with a
DuckDB oracle (driver contract, __spark_entry__.py).

Each entry: name -> (builder(spark, sf_dir) -> DataFrame, oracle_sql | None).
Builders use the operator library (SURVEY.md §2 numbering in each docstring);
oracles are ANSI SQL DuckDB runs on the same parquet views.

Cross-engine determinism rules used throughout (see plans/pipeline.py):
- integer aggregates: CAST DuckDB's HUGEINT sums to BIGINT;
- money/double sums: sum exact DECIMAL(18,2) then cast to DOUBLE;
- derived ratios: double division of exact operands (bit-identical);
- quantiles: exact interpolated percentile rounded to 6 decimals;
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators.aggregate import (
    duplicate_key_groups,
    null_profile,
)
from shortvideohybridanalyticslakehouse_spark.operators.dedup import latest_per_key
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    first_match_case,
)
from shortvideohybridanalyticslakehouse_spark.plans import pipeline
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

from shortvideohybridanalyticslakehouse_spark.plans.registry import (  # noqa: F401
    REGISTRY,
    QueryFn,
    register,
)


# ---------------------------------------------------------------------------
# Core pipeline queries (S1-S4, P1-P12, A1-A2, W1, J1-J3, D1-D4)
# ---------------------------------------------------------------------------

_EVENTS_1MIN_ORACLE = """
SELECT
  user_id,
  date_trunc('minute', ts) AS window_start,
  date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS impressions,
  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS play_start,
  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS play_finish,
  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS likes,
  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS skips,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
FROM events WHERE ts IS NOT NULL
GROUP BY 1, 2
"""


@register("events_1min_agg", _EVENTS_1MIN_ORACLE)
def q_events_1min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2/W4: event-time 1-minute tumbling conditional-count aggregation."""
    return pipeline.events_1min(spark, sf_dir)


_ROLLING_ORACLE = """
WITH agg AS (
  SELECT
    user_id,
    date_trunc('minute', ts) AS window_start,
    date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS impressions,
    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS play_start,
    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS play_finish,
    CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS likes,
    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS skips,
    sum(CAST(value AS DECIMAL(18,2))) AS value_dec
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
)
SELECT
  user_id, window_start, window_end,
  CAST(impressions AS BIGINT) AS impressions,
  CAST(play_start AS BIGINT) AS play_start,
  CAST(play_finish AS BIGINT) AS play_finish,
  CAST(likes AS BIGINT) AS likes,
  CAST(skips AS BIGINT) AS skips,
  CAST(value_dec AS DOUBLE) AS value_sum,
  CAST(sum(impressions) OVER w AS BIGINT) AS impressions_30m,
  CAST(sum(play_start) OVER w AS BIGINT) AS play_start_30m,
  CAST(sum(play_finish) OVER w AS BIGINT) AS play_finish_30m,
  CAST(sum(likes) OVER w AS BIGINT) AS likes_30m,
  CAST(sum(skips) OVER w AS BIGINT) AS skips_30m,
  CAST(sum(value_dec) OVER w AS DOUBLE) AS value_30m
FROM agg
WINDOW w AS (
  PARTITION BY user_id ORDER BY window_start
  RANGE BETWEEN INTERVAL 29 MINUTE PRECEDING AND CURRENT ROW
)
"""


@register("rolling_30m_metrics", _ROLLING_ORACLE)
def q_rolling_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: per-user trailing 30-minute RANGE-frame sums over 1-min grain."""
    return pipeline.rolling_30m(spark, sf_dir)


_FLAGSHIP_ORACLE = """
WITH agg AS (
  SELECT
    user_id,
    date_trunc('minute', ts) AS window_start,
    CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS impressions,
    CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS play_start,
    CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS play_finish,
    CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS likes,
    CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS skips,
    sum(CAST(value AS DECIMAL(18,2))) AS value_dec
  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
), rolled AS (
  SELECT
    user_id, window_start,
    CAST(sum(impressions) OVER w AS BIGINT) AS impressions_30m,
    CAST(sum(play_start) OVER w AS BIGINT) AS play_start_30m,
    CAST(sum(play_finish) OVER w AS BIGINT) AS play_finish_30m,
    CAST(sum(likes) OVER w AS BIGINT) AS likes_30m,
    CAST(sum(skips) OVER w AS BIGINT) AS skips_30m,
    CAST(sum(value_dec) OVER w AS DOUBLE) AS value_30m
  FROM agg
  WINDOW w AS (
    PARTITION BY user_id ORDER BY window_start
    RANGE BETWEEN INTERVAL 29 MINUTE PRECEDING AND CURRENT ROW
  )
), metrics AS (
  SELECT *,
    (likes_30m + 5 * play_finish_30m)
      / CAST(greatest(impressions_30m, 100) AS DOUBLE) AS velocity_30m,
    play_finish_30m / CAST(greatest(play_start_30m, 1) AS DOUBLE) AS completion_30m,
    skips_30m / CAST(greatest(play_start_30m, 1) AS DOUBLE) AS skip_30m
  FROM rolled
), th AS (
  SELECT
    round(quantile_cont(velocity_30m, 0.9), 6) AS velocity_p90,
    round(quantile_cont(CAST(impressions_30m AS DOUBLE), 0.4), 6) AS impressions_p40
  FROM metrics
), dim AS (
  SELECT user_id, min(ts) AS first_seen FROM events GROUP BY 1
), ctx AS (
  SELECT m.*, t.velocity_p90, t.impressions_p40,
    date_diff('second', d.first_seen, m.window_start) / 60.0 AS age_minutes,
    coalesce(m.velocity_30m >= t.velocity_p90 AND m.impressions_30m >= 2.0, FALSE) AS is_candidate,
    coalesce(m.completion_30m >= 0.25 AND m.skip_30m <= 0.75
             AND m.play_start_30m >= 1.0, FALSE) AS is_quality,
    coalesce(CAST(m.impressions_30m AS DOUBLE) <= t.impressions_p40, FALSE) AS is_under_exposed
  FROM metrics m CROSS JOIN th t LEFT JOIN dim d USING (user_id)
)
SELECT
  user_id, window_start, impressions_30m, play_start_30m, play_finish_30m,
  likes_30m, skips_30m, value_30m, velocity_30m, completion_30m, skip_30m,
  is_candidate, is_quality, is_under_exposed,
  CASE
    WHEN is_candidate AND is_quality THEN 'BOOST'
    WHEN is_candidate AND NOT is_quality THEN 'REVIEW'
    WHEN is_under_exposed AND is_quality
         AND coalesce(age_minutes <= 10080.0, FALSE) THEN 'RESCUE'
    ELSE 'NO_ACTION'
  END AS decision_type
FROM ctx
"""


@register("flagship_decision_context", _FLAGSHIP_ORACLE)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§7.2 end-to-end slice: agg -> rolling -> joins -> flags -> decision."""
    return pipeline.decision_context(spark, sf_dir)


_VALIDATE_ORACLE = """
SELECT
  CASE
    WHEN event_id IS NULL OR user_id IS NULL THEN 'MISSING_REQUIRED_FIELD'
    WHEN ts IS NULL THEN 'INVALID_EVENT_TIMESTAMP'
    WHEN event_type IS NULL
         OR event_type NOT IN ('click','view','signup','purchase') THEN 'INVALID_EVENT_TYPE'
    WHEN json_valid(props) = FALSE OR props IS NULL THEN 'INVALID_PAYLOAD_JSON'
    ELSE NULL
  END AS error_code,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
FROM events
GROUP BY 1
"""


@register("validate_split_quarantine", _VALIDATE_ORACLE)
def q_validate_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5-P8: precedence error classification + valid/invalid accounting.

    Fixture mapping: 'error'-type rows play the invalid role
    (INVALID_EVENT_TYPE); counts grouped by error_code.
    """
    ev = load_table(spark, sf_dir, "events")
    code = first_match_case(
        [
            (
                F.col("event_id").isNull() | F.col("user_id").isNull(),
                F.lit("MISSING_REQUIRED_FIELD"),
            ),
            (F.col("ts").isNull(), F.lit("INVALID_EVENT_TIMESTAMP")),
            (
                F.col("event_type").isNull()
                | ~F.col("event_type").isin("click", "view", "signup", "purchase"),
                F.lit("INVALID_EVENT_TYPE"),
            ),
            (
                # json-VALIDITY probe (get_json_object('$') is NULL iff the
                # text is not parseable JSON) — matches the oracle's
                # json_valid(); the stricter struct-schema parse
                # (json_parse_failed) stays on the contract path where the
                # reference requires it
                F.col("props").isNull()
                | F.get_json_object(F.col("props"), "$").isNull(),
                F.lit("INVALID_PAYLOAD_JSON"),
            ),
        ]
    )
    return (
        ev.withColumn("error_code", code)
        .groupBy("error_code")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_total"),
        )
    )


# ---------------------------------------------------------------------------
# Dedup / upsert family (W2, W3, J5, J6, T2)
# ---------------------------------------------------------------------------

_CDC_SNAPSHOT_ORACLE = """
SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
  ) AS rn
  FROM orders
) WHERE rn = 1
"""


@register("cdc_latest_snapshot", _CDC_SNAPSHOT_ORACLE)
def q_cdc_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2/J6: winner-per-key dedup — the CDC MERGE source semantics.

    `orders` as a change stream keyed o_custkey ordered by (o_orderdate,
    o_orderkey) — latest state per key, ties broken by the offset analog.
    """
    orders = load_table(spark, sf_dir, "orders")
    return latest_per_key(
        orders, ["o_custkey"], ["o_orderdate", "o_orderkey"], descending=True
    ).select("o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")


_LATEST_EVENT_ORACLE = """
SELECT user_id, event_id, event_type, ts
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn FROM events
) WHERE rn = 1
"""


@register("latest_event_per_user", _LATEST_EVENT_ORACLE)
def q_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: ROW_NUMBER latest-per-key (BI 'latest per video' pattern)."""
    ev = load_table(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id"], ["ts", "event_id"], descending=True).select(
        "user_id", "event_id", "event_type", "ts"
    )


# ---------------------------------------------------------------------------
# Join family (J1-J4)
# ---------------------------------------------------------------------------

_REVENUE_ORACLE = """
SELECT
  r.r_name AS region_name,
  n.n_name AS nation_name,
  CAST(count(*) AS BIGINT) AS line_count,
  CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
"""


@register("join_enrich_revenue", _REVENUE_ORACLE)
def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 (broadcast dim enrich) over a 5-table star join + exact-decimal agg.

    customer/nation/region are broadcast (dims); lineitem⋈orders shuffles on
    the fact keys — the plan a 100 TB fact table wants.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count(F.lit(1)).alias("line_count"),
        (
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            )
        )
        .cast("double")
        .alias("revenue"),
    )


_ANTI_JOIN_ORACLE = """
SELECT p_partkey, p_name, p_retailprice
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_partkey = p.p_partkey AND l.l_shipdate > DATE '2001-06-01'
)
"""


@register("anti_join_unsold_parts", _ANTI_JOIN_ORACLE)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: NOT EXISTS == left-anti join (idempotent-publish pattern).

    Parts with no shipment after the cutoff — the recency predicate keeps
    the result non-empty at every fixture scale (every part has SOME
    lineitem), so the anti-join path is actually exercised.
    """
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("2001-06-01").cast("date")
    )
    return part.join(
        li, part.p_partkey == li.l_partkey, "left_anti"
    ).select("p_partkey", "p_name", "p_retailprice")


# ---------------------------------------------------------------------------
# Verifier aggregation family (A3-A6, A10)
# ---------------------------------------------------------------------------

_DUP_GROUPS_ORACLE = """
SELECT o_custkey, o_orderdate, CAST(count(*) AS BIGINT) AS dup_count
FROM orders GROUP BY 1, 2 HAVING count(*) > 1
"""


@register("dup_key_groups", _DUP_GROUPS_ORACLE)
def q_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: duplicate-grain detector (grain-uniqueness verifier core)."""
    orders = load_table(spark, sf_dir, "orders")
    return duplicate_key_groups(orders, ["o_custkey", "o_orderdate"])


_NULL_PROFILE_ORACLE = """
SELECT
  CAST(count(*) AS BIGINT) AS row_count,
  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_orderkey,
  CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_quantity,
  CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_returnflag,
  CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_l_shipdate
FROM lineitem
"""


@register("null_profile_lineitem", _NULL_PROFILE_ORACLE)
def q_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: null-count completeness profile (quarantine verifier core)."""
    li = load_table(spark, sf_dir, "lineitem")
    return null_profile(li, ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"])


_ACTIVE_USERS_ORACLE = """
SELECT
  date_trunc('day', ts) AS activity_date,
  CAST(count(DISTINCT user_id) AS BIGINT) AS active_users,
  CAST(count(*) AS BIGINT) AS events_n
FROM events GROUP BY 1
"""


@register("distinct_active_users", _ACTIVE_USERS_ORACLE)
def q_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A7: exact per-day distinct users (platform-health trend shape)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("activity_date")).agg(
        F.countDistinct("user_id").alias("active_users"),
        F.count(F.lit(1)).alias("events_n"),
    )


_PERCENTILES_ORACLE = """
SELECT
  round(quantile_cont(value, 0.50), 6) AS p50,
  round(quantile_cont(value, 0.90), 6) AS p90,
  round(quantile_cont(value, 0.95), 6) AS p95,
  CAST(count(*) AS BIGINT) AS sample_size
FROM events
"""


@register("value_percentiles", _PERCENTILES_ORACLE)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11: exact interpolated percentiles (baseline-publish core)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.round(F.expr("percentile(value, 0.50D)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.90D)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.95D)"), 6).alias("p95"),
        F.count(F.lit(1)).alias("sample_size"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / scalar families (O2, P13, scalar JSON)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


@register("topk_orders", _TOPK_ORACLE)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: ORDER BY + LIMIT => TakeOrderedAndProject (no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    )


_JSON_PROPS_ORACLE = """
SELECT
  event_type,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total,
  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max,
  CAST(count(*) AS BIGINT) AS n
FROM events GROUP BY 1
"""


@register("json_extract_props", _JSON_PROPS_ORACLE)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/§2.8 JSON family: semi-structured extraction + aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_total"),
        F.max(k).alias("k_max"),
        F.count(F.lit(1)).alias("n"),
    )


_BOUNDED_WINDOW_ORACLE = """
WITH anchor AS (SELECT max(ts) AS max_ts FROM events)
SELECT
  e.event_type,
  CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
FROM events e CROSS JOIN anchor a
WHERE e.ts >= a.max_ts - INTERVAL 4 HOUR
GROUP BY 1
"""


@register("bounded_window_snapshot", _BOUNDED_WINDOW_ORACLE)
def q_bounded_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13/J7: data-max-anchored bounded time filter (BI guardrail pattern).

    The anchor is a 1-row aggregate cross-joined (broadcast) — partition
    pruning applies when the fact is time-partitioned.
    """
    ev = load_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("max_ts"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 4 HOUR"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("value_total"),
        )
    )
