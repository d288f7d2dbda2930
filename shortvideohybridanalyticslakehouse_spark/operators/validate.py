"""Ingest parse/validate/split operators (P1-P12, §2.2).

All pure Catalyst expressions — `from_json`, chained `when(...)` CASE, two
filters over one annotated DataFrame. At 100 TB these are narrow (no
shuffle), fully pipelined into the scan, and codegen'd; the valid/invalid
split reads the annotated plan twice but Spark recomputes the cheap
projection rather than materializing (or caller persists if both branches
are consumed in one job).

Reference semantics ported:
- parse: src/spark/rt_content_events_aggregator.py:163-211
- error CASE precedence: rt_content_events_aggregator.py:235-266
- split: rt_content_events_aggregator.py:269-271
- CDC validation: rt_video_cdc_upsert.py:126-210
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql.types import StringType, StructField, StructType

from shortvideohybridanalyticslakehouse_spark import contracts as C


def _with_corrupt_record(schema: StructType) -> StructType:
    """Copy of ``schema`` + a corrupt-record field (StructType.add mutates)."""
    return StructType(
        list(schema.fields) + [StructField("_corrupt_record", StringType())]
    )


# ---------------------------------------------------------------------------
# Generic building blocks (reusable beyond the reference's schemas)
# ---------------------------------------------------------------------------

def json_parse_failed(col: Column, schema_fields: str) -> Column:
    """TRUE iff non-null ``col`` fails to parse as JSON for ``schema_fields``.

    Spark 4 PERMISSIVE `from_json` returns an all-null struct (not NULL) on
    malformed input, so unparseability is detected via the corrupt-record
    side channel.
    """
    parsed = F.from_json(
        col,
        f"{schema_fields}, _corrupt_record STRING",
        {"columnNameOfCorruptRecord": "_corrupt_record"},
    )
    return col.isNotNull() & parsed.getField("_corrupt_record").isNotNull()


def is_valid_json(col: Column, schema_fields: str = "k INT") -> Column:
    """TRUE iff ``col`` is non-null and parses as JSON for ``schema_fields``."""
    return col.isNotNull() & ~json_parse_failed(col, schema_fields)


def missing_fields_csv(required: Sequence[str]) -> Column:
    """P6: CSV of required column names that are NULL on this row."""
    return F.concat_ws(
        ",",
        *[
            F.when(F.col(c).isNull(), F.lit(c)).otherwise(F.lit(None))
            for c in required
        ],
    )


def first_match_case(cases: Sequence[tuple[Column, Column]]) -> Column:
    """Build a precedence CASE chain: first predicate that holds wins (P5)."""
    expr: Column | None = None
    for cond, value in cases:
        expr = F.when(cond, value) if expr is None else expr.when(cond, value)
    assert expr is not None
    return expr.otherwise(F.lit(None))


# ---------------------------------------------------------------------------
# Content-events pipeline (reference schema)
# ---------------------------------------------------------------------------

def parse_content_events(raw: DataFrame) -> DataFrame:
    """P1-P4: kafka-shaped rows -> typed event columns + lineage.

    ``raw`` columns: ``value`` (STRING json), ``topic``, ``partition``,
    ``offset``, ``timestamp``. Batch fixtures synthesize the same shape
    (sources/batch.py).
    """
    # PERMISSIVE mode yields an all-null struct (not NULL) for malformed
    # input in Spark 4, so detect parse failure via the corrupt-record field.
    schema = _with_corrupt_record(C.CONTENT_EVENT_SCHEMA)
    ev = F.from_json(
        F.col("raw_value"), schema, {"columnNameOfCorruptRecord": "_corrupt_record"}
    ).alias("event")
    df = raw.select(
        F.col("raw_value"),
        F.col("topic").alias("source_topic"),
        F.col("partition").alias("source_partition"),
        F.col("offset").alias("source_offset"),
        F.col("kafka_timestamp").alias("source_timestamp"),
        ev,
    )
    # P2 struct extraction + P3 timestamp cast + P4 payload fallbacks.
    return df.select(
        "raw_value",
        "source_topic",
        "source_partition",
        "source_offset",
        "source_timestamp",
        F.col("event._corrupt_record").isNull().alias("parsed_ok"),
        F.col("event.event_id").alias("event_id"),
        F.col("event.event_timestamp").alias("event_timestamp_raw"),
        F.to_timestamp(F.col("event.event_timestamp")).alias("event_timestamp"),
        F.col("event.video_id").alias("video_id"),
        F.col("event.user_id").alias("user_id"),
        F.col("event.event_type").alias("event_type"),
        F.col("event.schema_version").alias("schema_version"),
        # P4: prefer nested struct payload, else passthrough payload_json text.
        F.when(F.col("event.payload").isNotNull(), F.to_json(F.col("event.payload")))
        .otherwise(F.col("event.payload_json"))
        .alias("payload_json"),
        F.coalesce(
            F.col("event.payload.watch_time_ms"),
            F.from_json(
                F.col("event.payload_json"), "watch_time_ms BIGINT"
            ).getField("watch_time_ms"),
            F.lit(0),
        ).alias("watch_time_ms"),
    )


def annotate_content_errors(df: DataFrame) -> DataFrame:
    """P5-P7: attach ``error_code``/``error_reason`` by contract precedence.

    Precedence (first match wins): PARSE_ERROR > MISSING_REQUIRED_FIELD >
    INVALID_EVENT_TIMESTAMP > INVALID_EVENT_TYPE > INVALID_PAYLOAD_JSON.
    """
    missing_csv = missing_fields_csv(C.CONTENT_REQUIRED_FIELDS)
    # NULL payload_json itself is caught earlier by MISSING_REQUIRED_FIELD.
    payload_invalid = json_parse_failed(F.col("payload_json"), "watch_time_ms BIGINT")

    cases = [
        (~F.col("parsed_ok"), (F.lit(C.ERR_PARSE), F.lit("value is not valid JSON"))),
        (
            missing_csv != F.lit(""),
            (
                F.lit(C.ERR_MISSING),
                F.concat(F.lit("missing required fields: "), missing_csv),
            ),
        ),
        (
            F.col("event_timestamp").isNull(),
            (
                F.lit(C.ERR_BAD_TS),
                F.concat(
                    F.lit("unparseable event_timestamp: "),
                    F.coalesce(F.col("event_timestamp_raw"), F.lit("<null>")),
                ),
            ),
        ),
        (
            ~F.col("event_type").isin(*C.ALLOWED_EVENT_TYPES)
            | F.col("event_type").isNull(),
            (
                F.lit(C.ERR_BAD_TYPE),
                F.concat(
                    F.lit("event_type not in contract enum: "),
                    F.coalesce(F.col("event_type"), F.lit("<null>")),
                ),
            ),
        ),
        (
            payload_invalid,
            (F.lit(C.ERR_BAD_PAYLOAD), F.lit("payload_json is not valid JSON")),
        ),
    ]
    code = first_match_case([(cond, v[0]) for cond, v in cases])
    reason = first_match_case([(cond, v[1]) for cond, v in cases])
    return df.withColumn("error_code", code).withColumn("error_reason", reason)


def split_valid_invalid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """P8: one annotated plan, two filtered outputs."""
    return (
        df.filter(F.col("error_code").isNull()),
        df.filter(F.col("error_code").isNotNull()),
    )


def invalid_projection(df: DataFrame) -> DataFrame:
    """P9-P11: quarantine-table row shape with deterministic surrogate key."""
    return df.select(
        F.concat_ws(
            ":",
            F.coalesce(F.col("source_topic"), F.lit("unknown")),
            F.coalesce(F.col("source_partition").cast("string"), F.lit("-1")),
            F.coalesce(F.col("source_offset").cast("string"), F.lit("-1")),
        ).alias("invalid_event_id"),
        F.col("raw_value"),
        "source_topic",
        "source_partition",
        "source_offset",
        F.coalesce(F.col("schema_version"), F.lit("unknown")).alias("schema_version"),
        "error_code",
        "error_reason",
        F.current_timestamp().alias("ingested_at"),
    )


def bronze_projection(df: DataFrame) -> DataFrame:
    """Valid-branch projection to the raw_events table contract."""
    return df.select(
        "event_id",
        "event_timestamp",
        "video_id",
        "user_id",
        "event_type",
        "schema_version",
        F.col("payload_json").alias("payload"),
        "source_topic",
        "source_partition",
        "source_offset",
        F.current_timestamp().alias("ingested_at"),
    )


# ---------------------------------------------------------------------------
# CDC pipeline (reference schema)
# ---------------------------------------------------------------------------

def parse_cdc_records(raw: DataFrame) -> DataFrame:
    """CDC kafka-shaped rows -> typed columns + lineage."""
    schema = _with_corrupt_record(C.CDC_SCHEMA)
    cdc = F.from_json(
        F.col("raw_value"), schema, {"columnNameOfCorruptRecord": "_corrupt_record"}
    ).alias("cdc")
    df = raw.select(
        F.col("raw_value"),
        F.col("topic").alias("source_topic"),
        F.col("partition").alias("source_partition"),
        F.col("offset").alias("source_offset"),
        cdc,
    )
    return df.select(
        "raw_value",
        "source_topic",
        "source_partition",
        "source_offset",
        F.col("cdc._corrupt_record").isNull().alias("parsed_ok"),
        F.col("cdc.op").alias("op"),
        F.col("cdc.ts_ms").alias("ts_ms"),
        F.col("cdc.schema_version").alias("schema_version"),
        F.col("cdc.after.video_id").alias("video_id"),
        F.col("cdc.after.category").alias("category"),
        F.col("cdc.after.region").alias("region"),
        F.to_timestamp(F.col("cdc.after.upload_time")).alias("upload_time"),
        F.col("cdc.after.status").alias("status"),
    )


def annotate_cdc_errors(df: DataFrame) -> DataFrame:
    """CDC validity: op in {c,u}; ts_ms/schema_version/after.video_id non-null."""
    cases = [
        (~F.col("parsed_ok"), (F.lit(C.ERR_CDC_PARSE), F.lit("value is not valid JSON"))),
        (
            ~F.col("op").isin(*C.CDC_ALLOWED_OPS) | F.col("op").isNull(),
            (
                F.lit(C.ERR_CDC_UNSUPPORTED_OP),
                F.concat(
                    F.lit("unsupported cdc op: "),
                    F.coalesce(F.col("op"), F.lit("<null>")),
                ),
            ),
        ),
        (
            F.col("ts_ms").isNull()
            | F.col("schema_version").isNull()
            | F.col("video_id").isNull(),
            (
                F.lit(C.ERR_CDC_MISSING),
                F.concat_ws(
                    ",",
                    F.when(F.col("ts_ms").isNull(), F.lit("ts_ms")),
                    F.when(F.col("schema_version").isNull(), F.lit("schema_version")),
                    F.when(F.col("video_id").isNull(), F.lit("after.video_id")),
                ),
            ),
        ),
    ]
    code = first_match_case([(cond, v[0]) for cond, v in cases])
    reason = first_match_case([(cond, v[1]) for cond, v in cases])
    return df.withColumn("error_code", code).withColumn("error_reason", reason)


def observe_contract_metrics(df: DataFrame, name: str = "contract_metrics") -> DataFrame:
    """Attach single-pass data-quality counters via ``DataFrame.observe``.

    ``observe`` piggybacks aggregates onto the EXISTING job — the counters
    (rows seen, contract errors, parse failures, null event types) come
    back through the observation/QueryListener channel with ZERO extra
    scans, where a naive DQ report would re-run the pipeline once per
    metric. This is the mechanism behind the reference's per-batch DQ
    counters (SURVEY §2.9's run-summary counts) done the Spark-native way;
    in Structured Streaming the same call surfaces per-micro-batch metrics
    in StreamingQueryProgress.observedMetrics.

    Call AFTER annotate_content_errors (needs ``error_code``); read the
    values with ``pyspark.sql.Observation`` (batch) or the progress events
    (streaming).
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows_seen"),
        F.count_if(F.col("error_code").isNotNull()).alias("contract_errors"),
        F.count_if(F.col("error_code") == F.lit(C.ERR_PARSE)).alias(
            "parse_failures"
        ),
        F.count_if(F.col("event_type").isNull()).alias("null_event_types"),
    )
