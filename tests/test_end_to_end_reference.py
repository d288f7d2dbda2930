"""End-to-end reference parity: deterministic generator -> validate/split ->
gold 1-min fact -> dim upsert -> rolling metrics -> decisions -> QA gates.

This is the reference's acceptance harness shape (run generator -> jobs ->
verifiers -> sign-off report) in pure batch mode, including the >=90%
expected-action agreement gate (scenario matrix doc:285-295) — and it
requires all four decision outcomes to actually occur.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.generator import BoundedRun, GeneratorConfig
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_cdc_errors,
    annotate_content_errors,
    parse_cdc_records,
    parse_content_events,
    split_valid_invalid,
)
from shortvideohybridanalyticslakehouse_spark.plans import serving, verifiers
from shortvideohybridanalyticslakehouse_spark.sources.batch import jsonl_fixture_to_raw


@pytest.fixture(scope="module")
def run():
    return BoundedRun(GeneratorConfig(total_events=6000, events_per_second=20.0))


@pytest.fixture(scope="module")
def layers(spark, run):
    events_raw = jsonl_fixture_to_raw(
        spark.createDataFrame(run.content_events(), ["value"])
    )
    cdc_raw = jsonl_fixture_to_raw(
        spark.createDataFrame(run.cdc_records(), ["value"])
    )
    valid_ev, invalid_ev = split_valid_invalid(
        annotate_content_errors(parse_content_events(events_raw))
    )
    valid_cdc, invalid_cdc = split_valid_invalid(
        annotate_cdc_errors(parse_cdc_records(cdc_raw))
    )
    built = serving.build_all(valid_ev, valid_cdc)
    built["valid_events"] = valid_ev.cache()
    built["invalid_events"] = invalid_ev
    built["valid_cdc"] = valid_cdc
    built["invalid_cdc"] = invalid_cdc
    built["gold_1min"] = built["gold_1min"].cache()
    built["decision_context"] = built["decision_context"].cache()
    return built


def test_generator_determinism(run):
    again = BoundedRun(GeneratorConfig(total_events=6000, events_per_second=20.0))
    assert run.content_events() == again.content_events()
    assert run.cdc_records() == again.cdc_records()
    mix = run.realized_mix()
    assert abs(mix["normal_baseline"] - 0.55) <= 0.02  # G13 self-check
    assert abs(mix["invalid_payload_burst"] - 0.05) <= 0.02


def test_invalid_routing(layers):
    """Invalid burst routes to quarantine; rate within contract bound."""
    ok, details = verifiers.invalid_rate_bounded(
        layers["valid_events"], layers["invalid_events"], max_rate=0.20
    )
    assert ok, details
    assert details["invalid"] > 0  # the burst actually happened
    codes = {
        r.error_code
        for r in layers["invalid_events"].select("error_code").distinct().collect()
    }
    assert codes == {C.ERR_BAD_TS}  # canonical invalid event: ts outranks rest


def test_cdc_dim_snapshot(layers):
    """Update (op=u) wins over bootstrap (op=c): category mutated to *_u."""
    dims = layers["dim_videos"]
    ok, details = verifiers.grain_unique(dims, ["video_id"])
    assert ok, details
    cats = [r.category for r in dims.select("category").collect()]
    assert cats and all(c.endswith("_u") for c in cats)


def test_gold_contract_gates(layers):
    gold = layers["gold_1min"]
    for check in (
        verifiers.grain_unique(gold, ["video_id", "window_start"]),
        verifiers.non_negative(gold, list(serving.GOLD_METRICS)),
        verifiers.no_null_required(gold, ["video_id", "window_start", "window_end"]),
    ):
        ok, details = check
        assert ok, details


def test_event_accounting(layers, spark):
    """Every valid event lands in exactly one gold window (batch: no drops)."""
    n_valid = layers["valid_events"].select("event_id").distinct().count()
    gold_sum = (
        layers["gold_1min"]
        .agg(
            F.sum(
                sum(F.col(m) for m in serving.GOLD_METRICS)
            ).alias("s")
        )
        .first()
        .s
    )
    ok, details = verifiers.watermark_drop_ratio(n_valid, gold_sum, max_ratio=0.0)
    assert ok, details


def test_all_decisions_reachable(layers):
    dist = {
        r.decision_type_preview: r["count"]
        for r in layers["decision_context"]
        .groupBy("decision_type_preview")
        .count()
        .collect()
    }
    assert set(dist) == set(C.DECISION_DOMAIN), dist


def test_expected_action_agreement(layers, spark, run):
    expected = spark.createDataFrame(run.expected_actions())
    ok, details = verifiers.expected_action_agreement(
        layers["decision_context"], expected, min_hit_rate=0.90
    )
    assert ok, details


def test_signoff_report(layers):
    report = verifiers.signoff(
        {
            "gold_grain": verifiers.grain_unique(
                layers["gold_1min"], ["video_id", "window_start"]
            ),
            "gold_non_negative": verifiers.non_negative(
                layers["gold_1min"], list(serving.GOLD_METRICS)
            ),
            "invalid_rate": verifiers.invalid_rate_bounded(
                layers["valid_events"], layers["invalid_events"]
            ),
        }
    )
    assert report["_overall"]["passed"], report
