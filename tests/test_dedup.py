"""CDC winner/dedup/upsert tests (reference shape: MERGE tie-break ordering
ts_ms DESC, source_offset DESC — tests/test_rt_video_cdc_upsert_sql.py:89-95;
fixture semantics src/scripts/emit_cdc_videos_fixture.py:57-85).
"""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.operators.dedup import (
    exact_dedup,
    latest_per_key,
    merge_upsert,
    reduce_latest,
)


def cdc_batch(spark):
    rows = [
        # (video_id, status, ts_ms, source_offset)
        ("vid_1", "active", 1000, 0),
        ("vid_1", "review_hold", 2000, 1),
        ("vid_1", "copyright_strike", 2000, 2),  # same ts -> offset wins
        ("vid_2", "active", 1000, 3),
    ]
    return spark.createDataFrame(
        rows, "video_id string, status string, ts_ms long, source_offset long"
    )


def test_latest_per_key_tie_break(spark):
    out = latest_per_key(cdc_batch(spark), ["video_id"], ["ts_ms", "source_offset"])
    got = {r.video_id: r.status for r in out.collect()}
    assert got == {"vid_1": "copyright_strike", "vid_2": "active"}


def test_reduce_latest_matches_row_number(spark):
    df = cdc_batch(spark)
    a = latest_per_key(df, ["video_id"], ["ts_ms", "source_offset"])
    b = reduce_latest(
        df, ["video_id"], ["ts_ms", "source_offset"], ["status", "ts_ms", "source_offset"]
    )
    ra = {(r.video_id, r.status, r.ts_ms) for r in a.collect()}
    rb = {(r.video_id, r.status, r.ts_ms) for r in b.collect()}
    assert ra == rb


def test_merge_upsert_source_wins(spark):
    target = spark.createDataFrame(
        [("vid_1", "active", 1000, 0), ("vid_9", "active", 500, 1)],
        "video_id string, status string, ts_ms long, source_offset long",
    )
    source = spark.createDataFrame(
        [("vid_1", "review_hold", 2000, 2), ("vid_3", "active", 900, 3)],
        "video_id string, status string, ts_ms long, source_offset long",
    )
    merged = merge_upsert(target, source, ["video_id"], ["ts_ms", "source_offset"])
    got = {r.video_id: r.status for r in merged.collect()}
    # vid_1 updated, vid_9 untouched, vid_3 inserted
    assert got == {"vid_1": "review_hold", "vid_9": "active", "vid_3": "active"}
    assert merged.count() == 3


def test_merge_upsert_idempotent_replay(spark):
    source = spark.createDataFrame(
        [("vid_1", "review_hold", 2000, 2)],
        "video_id string, status string, ts_ms long, source_offset long",
    )
    once = merge_upsert(None, source, ["video_id"], ["ts_ms", "source_offset"])
    twice = merge_upsert(once, source, ["video_id"], ["ts_ms", "source_offset"])
    assert twice.count() == 1
    assert twice.first().status == "review_hold"


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2)], "k string, v int"
    )
    assert exact_dedup(df).count() == 2
    assert exact_dedup(df, ["k"]).count() == 1
