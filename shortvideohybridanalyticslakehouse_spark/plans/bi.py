"""BI / acceptance query pack — the reference's Metabase SQL pack
(src/metabase/realtime-metrics-sql-pack.sql, A1-A4 + B1-B8) translated from
Trino SQL to Spark SQL, run over the views registered by
plans/serving.register_views.

Dialect translations (SURVEY.md §3.3):
- Trino ``COUNT_IF(x)``            -> Spark ``count_if(x)``
- Trino ``date_diff('minute',a,b)``-> Spark ``timestampdiff(MINUTE, a, b)``
- anchored bounded windows keep the CROSS JOIN 1-row-anchor shape (J7) —
  critical for partition pruning on time-partitioned facts.

Every query is bounded (anchored interval + LIMIT guardrails) per the
serving contract's read-time rules (fact-to-fact joins prohibited, J9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# A1: platform health trend — per-minute averages over a bounded window.
PLATFORM_HEALTH_TREND = """
WITH anchor AS (
  SELECT max(window_start) AS max_minute FROM v_rt_video_metrics_30m_1m
)
SELECT
  m.window_start AS metric_minute,
  avg(m.velocity_30m)   AS avg_velocity_30m,
  avg(m.completion_30m) AS avg_completion_30m,
  avg(m.skip_30m)       AS avg_skip_30m,
  count(DISTINCT m.video_id) AS active_videos
FROM v_rt_video_metrics_30m_1m m CROSS JOIN anchor a
WHERE m.window_start >= a.max_minute - INTERVAL 4 HOUR
GROUP BY m.window_start
ORDER BY metric_minute
"""

# A1b: platform coverage trend — active-video count on its own scale (the
# reference splits count and rate charts to avoid mixed-axis distortion).
PLATFORM_COVERAGE_TREND = """
WITH anchor AS (
  SELECT max(window_start) AS max_minute FROM v_rt_video_metrics_30m_1m
)
SELECT
  m.window_start AS metric_minute,
  count(DISTINCT m.video_id) AS active_videos
FROM v_rt_video_metrics_30m_1m m CROSS JOIN anchor a
WHERE m.window_start >= a.max_minute - INTERVAL 4 HOUR
GROUP BY m.window_start
ORDER BY metric_minute
"""

# A4: actionable queue preview — latest row per video inside a fixed
# 30-minute lookback, NO_ACTION excluded, neutral recency ordering.
ACTIONABLE_QUEUE_PREVIEW = """
WITH anchor AS (
  SELECT max(window_start) AS anchor_minute
  FROM v_rt_video_decision_context_30m_1m
), ranked AS (
  SELECT c.*, row_number() OVER (
    PARTITION BY video_id ORDER BY window_start DESC
  ) AS row_num
  FROM v_rt_video_decision_context_30m_1m c CROSS JOIN anchor a
  WHERE c.window_start >= a.anchor_minute - INTERVAL 30 MINUTE
)
SELECT window_start, video_id, category, region, status,
       upload_age_minutes, decision_type_preview,
       is_candidate, is_quality, is_under_exposed,
       velocity_30m, completion_30m, skip_30m,
       velocity_p90, impressions_p40
FROM ranked
WHERE row_num = 1
  AND decision_type_preview IN ('BOOST', 'REVIEW', 'RESCUE')
ORDER BY window_start DESC, video_id
LIMIT 500
"""

# A3: latest-per-video recommendation table (W3 + O2 guardrail LIMIT).
LATEST_RECOMMENDATIONS = """
SELECT video_id, window_start, decision_type_preview,
       velocity_30m, completion_30m, skip_30m, impressions_30m
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY video_id ORDER BY window_start DESC
  ) AS row_num
  FROM v_rt_video_decision_context_30m_1m
) WHERE row_num = 1
ORDER BY window_start DESC, video_id
LIMIT 500
"""

# A8/B8: decision distribution snapshot over latest-per-video rows.
DECISION_DISTRIBUTION = """
SELECT decision_type_preview, count(*) AS n
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY video_id ORDER BY window_start DESC
  ) AS row_num
  FROM v_rt_video_decision_context_30m_1m
) WHERE row_num = 1
GROUP BY decision_type_preview
"""

# B2: grain-amplification check — context rows must equal metrics rows (J9
# guard: the dim join may not amplify).
GRAIN_AMPLIFICATION = """
SELECT
  (SELECT count(*) FROM v_rt_video_decision_context_30m_1m)
  - (SELECT count(*) FROM v_rt_video_metrics_30m_1m) AS row_delta
"""

# B1/B2: serving views must be unique on (video_id, minute) — the HAVING
# form, run against both views.
METRICS_DUPLICATE_GRAIN = """
SELECT video_id, window_start, count(*) AS n
FROM v_rt_video_metrics_30m_1m
GROUP BY video_id, window_start
HAVING count(*) > 1
"""

CONTEXT_DUPLICATE_GRAIN = """
SELECT video_id, window_start, count(*) AS n
FROM v_rt_video_decision_context_30m_1m
GROUP BY video_id, window_start
HAVING count(*) > 1
"""

# B6: dimension-fallback observability — null rates of dim-sourced fields
# (allowed non-zero; monitored, anchored 4-hour window).
DIM_FALLBACK_NULL_RATES = """
WITH anchor AS (
  SELECT max(window_start) AS anchor_minute
  FROM v_rt_video_decision_context_30m_1m
), base AS (
  SELECT category, region, status, upload_time
  FROM v_rt_video_decision_context_30m_1m c CROSS JOIN anchor a
  WHERE c.window_start >= a.anchor_minute - INTERVAL 4 HOUR
)
SELECT
  count(*) AS total_rows,
  CAST(count_if(category IS NULL) AS DOUBLE) / nullif(count(*), 0) AS null_rate_category,
  CAST(count_if(region IS NULL) AS DOUBLE) / nullif(count(*), 0) AS null_rate_region,
  CAST(count_if(status IS NULL) AS DOUBLE) / nullif(count(*), 0) AS null_rate_status,
  CAST(count_if(upload_time IS NULL) AS DOUBLE) / nullif(count(*), 0) AS null_rate_upload_time
FROM base
"""

# B4: duplicate-grain check on the gold fact (HAVING form, A3 twin).
GOLD_DUPLICATE_GRAIN = """
SELECT video_id, window_start, count(*) AS n
FROM rt_video_stats_1min
GROUP BY video_id, window_start
HAVING count(*) > 1
"""

# B5: decision-domain violation count (A9; count_if translation).
DECISION_DOMAIN_VIOLATIONS = """
SELECT count_if(
  decision_type_preview NOT IN ('BOOST','REVIEW','RESCUE','NO_ACTION')
) AS violations
FROM v_rt_video_decision_context_30m_1m
"""

# B6: actionable rows must carry complete traceability context (A9).
ACTIONABLE_TRACEABILITY = """
SELECT count_if(
  decision_type_preview <> 'NO_ACTION'
  AND (velocity_p90 IS NULL OR impressions_p40 IS NULL
       OR velocity_30m IS NULL OR impressions_30m IS NULL)
) AS broken_traceability
FROM v_rt_video_decision_context_30m_1m
"""

# B7: null-rate profile on the metrics view (A6 twin, count_if form).
METRICS_NULL_RATES = """
SELECT
  count(*) AS n,
  count_if(velocity_30m IS NULL)   / greatest(count(*), 1) AS null_rate_velocity,
  count_if(completion_30m IS NULL) / greatest(count(*), 1) AS null_rate_completion,
  count_if(skip_30m IS NULL)       / greatest(count(*), 1) AS null_rate_skip
FROM v_rt_video_metrics_30m_1m
"""

# Freshness probe (serving contract lag_seconds query).
FRESHNESS_LAG = """
SELECT timestampdiff(
  SECOND, max(window_end), current_timestamp()
) AS lag_seconds
FROM v_rt_video_metrics_30m_1m
"""

ACCEPTANCE_PACK: dict[str, str] = {
    "platform_health_trend": PLATFORM_HEALTH_TREND,
    "platform_coverage_trend": PLATFORM_COVERAGE_TREND,
    "actionable_queue_preview": ACTIONABLE_QUEUE_PREVIEW,
    "latest_recommendations": LATEST_RECOMMENDATIONS,
    "decision_distribution": DECISION_DISTRIBUTION,
    "metrics_duplicate_grain": METRICS_DUPLICATE_GRAIN,
    "context_duplicate_grain": CONTEXT_DUPLICATE_GRAIN,
    "dim_fallback_null_rates": DIM_FALLBACK_NULL_RATES,
    "grain_amplification": GRAIN_AMPLIFICATION,
    "gold_duplicate_grain": GOLD_DUPLICATE_GRAIN,
    "decision_domain_violations": DECISION_DOMAIN_VIOLATIONS,
    "actionable_traceability": ACTIONABLE_TRACEABILITY,
    "metrics_null_rates": METRICS_NULL_RATES,
    "freshness_lag": FRESHNESS_LAG,
}


def run_pack(spark: SparkSession) -> dict[str, DataFrame]:
    """Run every acceptance query against the registered serving views."""
    return {name: spark.sql(sql) for name, sql in ACCEPTANCE_PACK.items()}


def acceptance_gates(spark: SparkSession) -> dict[str, bool]:
    """Boolean acceptance verdicts from the pack (B-series gates)."""
    res = run_pack(spark)
    return {
        "grain_amplification_zero": res["grain_amplification"].first().row_delta == 0,
        "no_duplicate_gold_grain": res["gold_duplicate_grain"].count() == 0,
        "no_duplicate_metrics_grain": res["metrics_duplicate_grain"].count() == 0,
        "no_duplicate_context_grain": res["context_duplicate_grain"].count() == 0,
        "decision_domain_clean": res["decision_domain_violations"].first().violations
        == 0,
        "traceability_complete": res["actionable_traceability"]
        .first()
        .broken_traceability
        == 0,
    }
