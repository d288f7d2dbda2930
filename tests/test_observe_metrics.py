"""observe()-based single-pass DQ counters on the validate pipeline."""

from __future__ import annotations

import json

from pyspark.sql import Observation

from shortvideohybridanalyticslakehouse_spark.operators import validate


def test_observe_counts_in_one_pass(spark):
    rows = [
        # valid event
        json.dumps(
            {
                "event_id": "e1",
                "event_timestamp": "2026-01-01T00:00:00Z",
                "video_id": "v1",
                "user_id": "u1",
                "event_type": "impression",
                "schema_version": "m1_v1",
                "payload_json": json.dumps({"watch_time_ms": 1000}),
            }
        ),
        # malformed JSON -> PARSE_ERROR
        "{not json",
        # missing required fields -> contract error, event_type present
        json.dumps({"event_id": "e3", "event_type": "like"}),
    ]
    import datetime as dt

    raw = spark.createDataFrame(
        [(r, "t", 0, i, dt.datetime(2026, 1, 1)) for i, r in enumerate(rows)],
        "raw_value string, topic string, partition int, offset long, "
        "kafka_timestamp timestamp",
    )
    parsed = validate.annotate_content_errors(validate.parse_content_events(raw))
    obs = Observation("dq")
    observed = validate.observe_contract_metrics(parsed, obs)
    n = observed.count()  # ONE job; metrics piggyback on it
    got = obs.get
    assert n == 3
    assert got["rows_seen"] == 3
    assert got["parse_failures"] == 1
    assert got["contract_errors"] == 2  # parse error + missing-fields row
    assert got["null_event_types"] == 1  # only the unparseable row
