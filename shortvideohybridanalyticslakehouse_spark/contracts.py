"""Schema contracts, error codes, metric formulas, decision constants.

Single source of truth for everything the reference keeps in its
``*_contract.py`` / ``*_validation.py`` modules and contract docs:

- content-event parse schema  (ref: src/spark/rt_content_events_aggregator.py:133-160)
- allowed event types         (ref: src/spark/rt_content_events_validation.py:7-14)
- error-code precedence       (ref: src/spark/rt_content_events_aggregator.py:235-266)
- CDC parse schema + rules    (ref: src/spark/rt_video_cdc_upsert.py:85-105, 148-210)
- table column contracts      (ref: src/spark/rt_content_events_aggregator_sql.py:20-58,
                               rt_video_cdc_upsert_sql.py:12-32)
- metric formulas (contract-locked)
                              (ref: docs/.../metric-contract.md:22-42;
                               src/trino/rt_video_metrics_serving.sql:36-38)
- decision thresholds/precedence
                              (ref: src/spark/rt_action_decisioning.py:46-85;
                               src/spark/rt_rule_quantile_baselines_sql.py:27-38)
- action-queue priority/TTL   (ref: src/spark/rt_action_queue_producer.py:83-93)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Content events
# ---------------------------------------------------------------------------

ALLOWED_EVENT_TYPES: tuple[str, ...] = (
    "impression",
    "play_start",
    "play_finish",
    "like",
    "share",
    "skip",
)

# Nested payload struct accepted alongside the flat payload_json string
# ("header + body" forward-compat pattern).
PAYLOAD_STRUCT = StructType(
    [
        StructField("watch_time_ms", LongType()),
        StructField("device_os", StringType()),
        StructField("app_version", StringType()),
        StructField("network_type", StringType()),
        StructField("scenario_id", StringType()),
    ]
)

CONTENT_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", StringType()),
        StructField("event_timestamp", StringType()),  # ISO-8601 text; cast later
        StructField("video_id", StringType()),
        StructField("user_id", StringType()),
        StructField("event_type", StringType()),
        StructField("schema_version", StringType()),
        StructField("payload", PAYLOAD_STRUCT),
        StructField("payload_json", StringType()),
    ]
)

CONTENT_REQUIRED_FIELDS: tuple[str, ...] = (
    "event_id",
    "video_id",
    "user_id",
    "schema_version",
    "payload_json",
)

# Error codes in precedence order (first match wins).
ERR_PARSE = "PARSE_ERROR"
ERR_MISSING = "MISSING_REQUIRED_FIELD"
ERR_BAD_TS = "INVALID_EVENT_TIMESTAMP"
ERR_BAD_TYPE = "INVALID_EVENT_TYPE"
ERR_BAD_PAYLOAD = "INVALID_PAYLOAD_JSON"
CONTENT_ERROR_PRECEDENCE: tuple[str, ...] = (
    ERR_PARSE,
    ERR_MISSING,
    ERR_BAD_TS,
    ERR_BAD_TYPE,
    ERR_BAD_PAYLOAD,
)

# ---------------------------------------------------------------------------
# CDC (Debezium-shaped)
# ---------------------------------------------------------------------------

CDC_AFTER_STRUCT = StructType(
    [
        StructField("video_id", StringType()),
        StructField("category", StringType()),
        StructField("region", StringType()),
        StructField("upload_time", StringType()),
        StructField("status", StringType()),
    ]
)

CDC_SCHEMA = StructType(
    [
        StructField("op", StringType()),
        StructField("ts_ms", LongType()),
        StructField("schema_version", StringType()),
        StructField("after", CDC_AFTER_STRUCT),
    ]
)

CDC_ALLOWED_OPS: tuple[str, ...] = ("c", "u")

ERR_CDC_PARSE = "PARSE_ERROR"
ERR_CDC_UNSUPPORTED_OP = "CDC_UNSUPPORTED_OP"
ERR_CDC_MISSING = "MISSING_REQUIRED_FIELD"

# ---------------------------------------------------------------------------
# Table column contracts (physical schemas our writers align to)
# ---------------------------------------------------------------------------

RAW_EVENTS_COLUMNS: tuple[str, ...] = (
    "event_id",
    "event_timestamp",
    "video_id",
    "user_id",
    "event_type",
    "schema_version",
    "payload",
    "source_topic",
    "source_partition",
    "source_offset",
    "ingested_at",
)

INVALID_EVENTS_COLUMNS: tuple[str, ...] = (
    "invalid_event_id",
    "raw_value",
    "source_topic",
    "source_partition",
    "source_offset",
    "schema_version",
    "error_code",
    "error_reason",
    "ingested_at",
)

GOLD_STATS_1MIN_COLUMNS: tuple[str, ...] = (
    "video_id",
    "window_start",
    "window_end",
    "impressions",
    "play_start",
    "play_finish",
    "likes",
    "shares",
    "skips",
    "watch_time_sum_ms",
    "processed_at",
)

DIM_VIDEOS_COLUMNS: tuple[str, ...] = (
    "video_id",
    "category",
    "region",
    "upload_time",
    "status",
    "updated_at",
    "source_ts_ms",
)

BASELINES_COLUMNS: tuple[str, ...] = (
    "rule_version",
    "effective_from",
    "effective_to",
    "metric_name",
    "percentile",
    "cohort_category",
    "cohort_region",
    "threshold_value",
    "sample_size",
    "is_fallback",
    "computed_at",
)

ACTION_QUEUE_COLUMNS: tuple[str, ...] = (
    "action_id",
    "video_id",
    "window_start",
    "decision_type",
    "priority",
    "state",
    "reason_codes",
    "decided_at",
    "expires_at",
    "created_at",
    "updated_at",
)

EXPECTED_ACTIONS_SCHEMA = StructType(
    [
        StructField("run_id", StringType()),
        StructField("video_id", StringType()),
        StructField("window_start", TimestampType()),
        StructField("window_end", TimestampType()),
        StructField("scenario_id", StringType()),
        StructField("expected_action", StringType()),
        StructField("expected_reason_codes", ArrayType(StringType())),
        StructField("generated_at", TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Metric formulas (CONTRACT-LOCKED — do not change the floors)
#   velocity_30m   = (likes_30m + 5*shares_30m) / greatest(impressions_30m, 100)
#   completion_30m = play_finish_30m / greatest(play_start_30m, 1)
#   skip_30m       = skips_30m / greatest(play_start_30m, 1)
# ---------------------------------------------------------------------------

VELOCITY_SHARE_WEIGHT = 5
VELOCITY_IMPRESSIONS_FLOOR = 100
RATE_PLAY_START_FLOOR = 1

ROLLING_WINDOW_MINUTES = 30  # RANGE frame: 29 minutes preceding .. current row
TUMBLING_WINDOW = "1 minute"
WATERMARK_DELAY = "2 minutes"
WATERMARK_DELAY_LAG_PRONE = "5 minutes"

# ---------------------------------------------------------------------------
# Decision rules (M1 published thresholds + precedence)
# ---------------------------------------------------------------------------

RULE_VERSION = "rt_rules_v1"
VELOCITY_P90_THRESHOLD = 0.68     # velocity_30m p90
IMPRESSIONS_P40_THRESHOLD = 160.0  # impressions_30m p40
BASELINE_SAMPLE_SIZE = 1800

CANDIDATE_MIN_IMPRESSIONS = 100
QUALITY_MIN_COMPLETION = 0.55
QUALITY_MAX_SKIP = 0.35
QUALITY_MIN_PLAY_START = 30
RESCUE_MAX_UPLOAD_AGE_MINUTES = 60

DECISION_BOOST = "BOOST"
DECISION_REVIEW = "REVIEW"
DECISION_RESCUE = "RESCUE"
DECISION_NO_ACTION = "NO_ACTION"
DECISION_DOMAIN: tuple[str, ...] = (
    DECISION_BOOST,
    DECISION_REVIEW,
    DECISION_RESCUE,
    DECISION_NO_ACTION,
)

ACTION_PRIORITY: dict[str, int] = {
    DECISION_RESCUE: 1,
    DECISION_REVIEW: 2,
    DECISION_BOOST: 3,
}
ACTION_TTL_MINUTES: dict[str, int] = {
    DECISION_RESCUE: 15,
    DECISION_REVIEW: 30,
    DECISION_BOOST: 30,
}
ACTION_STATE_PENDING = "PENDING"
ACTION_STATES: tuple[str, ...] = (
    "PENDING",
    "ACKED",
    "EXECUTING",
    "DONE",
    "EXPIRED",
    "CANCELLED",
)
