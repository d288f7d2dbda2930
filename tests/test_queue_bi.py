"""Action-queue state machine + BI acceptance pack tests."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.generator import BoundedRun, GeneratorConfig
from shortvideohybridanalyticslakehouse_spark.operators.decision import queue_rows, suppress_no_action
from shortvideohybridanalyticslakehouse_spark.operators.queue import (
    cas_transition,
    enqueue,
    expire_overdue,
)
from shortvideohybridanalyticslakehouse_spark.operators.validate import (
    annotate_cdc_errors,
    annotate_content_errors,
    parse_cdc_records,
    parse_content_events,
    split_valid_invalid,
)
from shortvideohybridanalyticslakehouse_spark.plans import bi, serving
from shortvideohybridanalyticslakehouse_spark.sources.batch import jsonl_fixture_to_raw


def mk_candidates(spark, rows):
    df = spark.createDataFrame(
        rows, "video_id string, window_start string, decision_type string"
    ).withColumn("window_start", F.to_timestamp("window_start"))
    return queue_rows(df)


def test_enqueue_dedupe_and_cooldown(spark):
    q1 = mk_candidates(
        spark,
        [
            ("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST),
            ("vid_1", "2026-01-01 00:07:00", C.DECISION_RESCUE),  # same hour
            ("vid_2", "2026-01-01 00:05:00", C.DECISION_REVIEW),
        ],
    )
    merged = enqueue(None, q1, cooldown_minutes=60)
    got = {r.video_id: r.decision_type for r in merged.collect()}
    # urgency: RESCUE beats BOOST inside the cooldown bucket
    assert got == {"vid_1": C.DECISION_RESCUE, "vid_2": C.DECISION_REVIEW}

    # replaying the same candidates is a no-op (idempotent dedupe)
    again = enqueue(merged, q1, cooldown_minutes=60)
    assert again.count() == merged.count()

    # next cooldown bucket admits a new action for the same video
    q2 = mk_candidates(spark, [("vid_1", "2026-01-01 01:30:00", C.DECISION_BOOST)])
    later = enqueue(again, q2, cooldown_minutes=60)
    assert later.filter(F.col("video_id") == "vid_1").count() == 2


def test_cas_transitions(spark):
    q = enqueue(
        None,
        mk_candidates(spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST)]),
    )
    ids = q.select("action_id")
    acked = cas_transition(q, ids, "PENDING", "ACKED")
    assert acked.first().state == "ACKED"
    # CAS must not fire when current state doesn't match expected
    still_acked = cas_transition(acked, ids, "PENDING", "EXECUTING")
    assert still_acked.first().state == "ACKED"
    # invalid transition (PENDING -> DONE) is rejected wholesale
    unchanged = cas_transition(acked, ids, "PENDING", "DONE")
    assert unchanged.first().state == "ACKED"
    done = cas_transition(
        cas_transition(acked, ids, "ACKED", "EXECUTING"), ids, "EXECUTING", "DONE"
    )
    assert done.first().state == "DONE"


def test_expire_overdue(spark):
    q = enqueue(
        None,
        mk_candidates(spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_RESCUE)]),
    )
    # RESCUE TTL = 15 min; at 00:25 it is overdue
    swept = expire_overdue(q, now_col=F.to_timestamp(F.lit("2026-01-01 00:25:00")))
    assert swept.first().state == "EXPIRED"
    # terminal states stay terminal
    swept2 = expire_overdue(swept, now_col=F.to_timestamp(F.lit("2026-01-01 09:00:00")))
    assert swept2.first().state == "EXPIRED"


@pytest.fixture(scope="module")
def registered_views(spark):
    run = BoundedRun(GeneratorConfig(total_events=4000, events_per_second=20.0))
    ev = jsonl_fixture_to_raw(spark.createDataFrame(run.content_events(), ["value"]))
    cdc = jsonl_fixture_to_raw(spark.createDataFrame(run.cdc_records(), ["value"]))
    valid_ev, _ = split_valid_invalid(
        annotate_content_errors(parse_content_events(ev))
    )
    valid_cdc, _ = split_valid_invalid(
        annotate_cdc_errors(parse_cdc_records(cdc))
    )
    layers = serving.build_all(valid_ev, valid_cdc)
    serving.register_views(spark, layers)
    return layers


def test_bi_pack_runs_and_gates_pass(spark, registered_views):
    results = bi.run_pack(spark)
    assert set(results) == set(bi.ACCEPTANCE_PACK)
    trend = results["platform_health_trend"].collect()
    assert len(trend) > 0 and all(r.active_videos > 0 for r in trend)
    recs = results["latest_recommendations"]
    assert 0 < recs.count() <= 500
    gates = bi.acceptance_gates(spark)
    assert all(gates.values()), gates


def test_queue_from_decision_context(spark, registered_views):
    ctx = registered_views["decision_context"]
    actionable = suppress_no_action(
        ctx.select("video_id", "window_start", F.col("decision_type_preview").alias("decision_type"))
    )
    q = enqueue(None, queue_rows(actionable.withColumn("decision_type", F.col("decision_type"))))
    assert q.count() > 0
    # one action per video per cooldown bucket
    bucket = F.floor(F.col("window_start").cast("long") / (60 * 60))
    dups = q.groupBy("video_id", bucket).count().filter(F.col("count") > 1).count()
    assert dups == 0


def test_cas_state_mismatch_is_a_noop(spark):
    """Genuine compare-and-set mismatch: state != expected, transition IS
    valid per the state machine — the fire predicate itself must refuse."""
    q = enqueue(
        None,
        mk_candidates(spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST)]),
    )
    ids = q.select("action_id")
    acked = cas_transition(q, ids, "PENDING", "ACKED")
    # row is ACKED; PENDING->ACKED is a valid transition but the row's
    # current state doesn't match expected -> no change
    again = cas_transition(acked, ids, "PENDING", "ACKED")
    assert again.first().state == "ACKED"
    # duplicate action_ids (redelivered acks) must not multiply queue rows
    dup_ids = ids.unionByName(ids)
    moved = cas_transition(acked, dup_ids, "ACKED", "EXECUTING")
    assert moved.count() == 1 and moved.first().state == "EXECUTING"


def test_enqueue_protects_in_flight_rows(spark):
    """A more urgent candidate must not evict an ACKED row; it is
    suppressed by the cooldown instead."""
    q = enqueue(
        None,
        mk_candidates(spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST)]),
    )
    acked = cas_transition(q, q.select("action_id"), "PENDING", "ACKED")
    rescue = mk_candidates(
        spark, [("vid_1", "2026-01-01 00:07:00", C.DECISION_RESCUE)]
    )
    merged = enqueue(acked, rescue, cooldown_minutes=60)
    rows = merged.collect()
    assert len(rows) == 1
    assert rows[0].state == "ACKED" and rows[0].decision_type == C.DECISION_BOOST


def test_enqueue_replay_never_resets_state(spark):
    """Replaying the same candidates after a CAS must keep the queue row
    (provenance rank), not swap in the fresh PENDING copy."""
    cand = mk_candidates(
        spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_BOOST)]
    )
    q = enqueue(None, cand)
    acked = cas_transition(q, q.select("action_id"), "PENDING", "ACKED")
    replayed = enqueue(acked, cand, cooldown_minutes=60)
    assert replayed.count() == 1
    assert replayed.first().state == "ACKED"


def test_urgency_out_of_domain_ranks_last(spark):
    """A stray decision_type must never beat a genuine action in the
    cooldown bucket (NULL urgency would sort first under asc)."""
    bogus = mk_candidates(
        spark, [("vid_1", "2026-01-01 00:06:00", "NO_ACTION")]
    )
    rescue = mk_candidates(
        spark, [("vid_1", "2026-01-01 00:05:00", C.DECISION_RESCUE)]
    )
    merged = enqueue(None, bogus.unionByName(rescue), cooldown_minutes=60)
    assert merged.first().decision_type == C.DECISION_RESCUE
