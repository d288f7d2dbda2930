"""Error-precedence and split tests (reference test shape:
tests/test_rt_content_events_validation.py — precedence chain, boundary rows).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_content_errors,
    bronze_projection,
    invalid_projection,
    parse_content_events,
    split_valid_invalid,
    parse_cdc_records,
    annotate_cdc_errors,
)
from shortvideohybridanalyticslakehouse_spark.sources.batch import jsonl_fixture_to_raw


def ev(**kw) -> str:
    base = {
        "event_id": "evt_0001",
        "event_timestamp": "2026-01-01T00:00:30Z",
        "video_id": "vid_0001",
        "user_id": "usr_0001",
        "event_type": "impression",
        "schema_version": "m1_v1",
        "payload_json": json.dumps({"watch_time_ms": 1000}),
    }
    base.update(kw)
    return json.dumps({k: v for k, v in base.items() if v is not None})


def classify(spark, raw_values: list[str]) -> list[str | None]:
    raw = jsonl_fixture_to_raw(
        spark.createDataFrame([(v,) for v in raw_values], ["value"])
    )
    df = annotate_content_errors(parse_content_events(raw))
    rows = df.orderBy("source_offset").select("error_code").collect()
    return [r.error_code for r in rows]


def test_valid_event_has_no_error(spark):
    assert classify(spark, [ev()]) == [None]


def test_parse_error_precedence(spark):
    # not JSON at all -> PARSE_ERROR even though everything else is missing
    assert classify(spark, ["{not-json"]) == [C.ERR_PARSE]


def test_missing_required_field(spark):
    assert classify(spark, [ev(event_id=None)]) == [C.ERR_MISSING]
    assert classify(spark, [ev(video_id=None)]) == [C.ERR_MISSING]
    assert classify(spark, [ev(payload_json=None)]) == [C.ERR_MISSING]


def test_missing_beats_bad_timestamp(spark):
    got = classify(spark, [ev(event_id=None, event_timestamp="bad-timestamp")])
    assert got == [C.ERR_MISSING]


def test_invalid_timestamp(spark):
    assert classify(spark, [ev(event_timestamp="bad-timestamp")]) == [C.ERR_BAD_TS]


def test_invalid_event_type(spark):
    assert classify(spark, [ev(event_type="dance")]) == [C.ERR_BAD_TYPE]
    # missing event_type is not a required field -> INVALID_EVENT_TYPE
    assert classify(spark, [ev(event_type=None)]) == [C.ERR_BAD_TYPE]


def test_invalid_payload_json(spark):
    assert classify(spark, [ev(payload_json="{not-valid-json")]) == [C.ERR_BAD_PAYLOAD]


def test_generator_canonical_invalid_event(spark):
    # ref: src/generator/m1/runner.py:169-178 — bad ts + bad payload + no type
    bad = ev(
        event_timestamp="bad-timestamp",
        payload_json="{not-valid-json",
        event_type=None,
    )
    assert classify(spark, [bad]) == [C.ERR_BAD_TS]  # ts outranks type/payload


def test_split_and_projections(spark):
    raw = jsonl_fixture_to_raw(
        spark.createDataFrame(
            [(ev(),), (ev(event_type="dance"),), ("{not-json",)], ["value"]
        )
    )
    annotated = annotate_content_errors(parse_content_events(raw))
    valid, invalid = split_valid_invalid(annotated)
    assert valid.count() == 1
    assert invalid.count() == 2
    bronze = bronze_projection(valid)
    assert bronze.columns == list(C.RAW_EVENTS_COLUMNS)
    quarantine = invalid_projection(invalid)
    assert quarantine.columns == list(C.INVALID_EVENTS_COLUMNS)
    row = quarantine.filter(F.col("error_code") == C.ERR_PARSE).first()
    assert row.invalid_event_id == f"batch_fixture:0:{row.source_offset}"
    assert row.schema_version == "unknown"


def cdc(**kw) -> str:
    base = {
        "op": "u",
        "ts_ms": 1_700_000_000_000,
        "schema_version": "m1_v1",
        "after": {
            "video_id": "vid_0001",
            "category": "music",
            "region": "US",
            "upload_time": "2026-01-01T00:00:00Z",
            "status": "active",
        },
    }
    base.update(kw)
    return json.dumps({k: v for k, v in base.items() if v is not None})


def classify_cdc(spark, raw_values: list[str]) -> list[str | None]:
    raw = jsonl_fixture_to_raw(
        spark.createDataFrame([(v,) for v in raw_values], ["value"])
    )
    df = annotate_cdc_errors(parse_cdc_records(raw))
    return [r.error_code for r in df.orderBy("source_offset").select("error_code").collect()]


def test_cdc_validation(spark):
    assert classify_cdc(spark, [cdc()]) == [None]
    assert classify_cdc(spark, ["{nope"]) == [C.ERR_CDC_PARSE]
    assert classify_cdc(spark, [cdc(op="d")]) == [C.ERR_CDC_UNSUPPORTED_OP]
    assert classify_cdc(spark, [cdc(schema_version=None)]) == [C.ERR_CDC_MISSING]
    missing_vid = json.loads(cdc())
    del missing_vid["after"]["video_id"]
    assert classify_cdc(spark, [json.dumps(missing_vid)]) == [C.ERR_CDC_MISSING]
