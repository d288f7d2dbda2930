"""CDC winner/dedup/upsert tests (reference shape: MERGE tie-break ordering
ts_ms DESC, source_offset DESC — tests/test_rt_video_cdc_upsert_sql.py:89-95;
fixture semantics src/scripts/emit_cdc_videos_fixture.py:57-85).
"""

from __future__ import annotations

import pytest

from shortvideohybridanalyticslakehouse_spark.operators.dedup import (
    delta_available,
    exact_dedup,
    latest_per_key,
    merge_into_sql,
    merge_upsert,
    merge_upsert_delta,
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


def test_merge_into_sql_tie_break_text():
    sql = merge_into_sql(
        "gold.dim_videos",
        "cdc_batch",
        ["video_id", "status", "ts_ms", "source_offset"],
        key_cols=["video_id"],
        order_cols=["ts_ms", "source_offset"],
    )
    # inline source dedup, keyed match, ordering tie-break, insert-absent —
    # the reference MERGE contract (rt_video_cdc_upsert_sql.py:113-172)
    assert "MERGE INTO gold.dim_videos t" in sql
    assert "PARTITION BY video_id ORDER BY ts_ms DESC, source_offset DESC" in sql
    assert "ON t.video_id = s.video_id" in sql
    assert (
        "WHEN MATCHED AND ((s.ts_ms > t.ts_ms) OR "
        "(s.ts_ms = t.ts_ms AND s.source_offset >= t.source_offset))" in sql
    )
    assert "t.status = s.status" in sql and "t.video_id = s.video_id" not in sql.split("UPDATE SET")[1].split("WHEN NOT MATCHED")[0]
    assert "WHEN NOT MATCHED THEN" in sql


@pytest.mark.skipif(
    not delta_available(),
    reason="delta-spark not on the classpath (no package installs in this "
    "sandbox) — environment-bounded; the MERGE SQL text and the parquet "
    "fallback's replay idempotency are covered unconditionally",
)
def test_merge_upsert_delta_replay_idempotent(spark, tmp_path):
    path = str(tmp_path / "delta_dim")
    source = spark.createDataFrame(
        [("vid_1", "review_hold", 2000, 2), ("vid_3", "active", 900, 3)],
        "video_id string, status string, ts_ms long, source_offset long",
    )
    merge_upsert_delta(spark, path, source, ["video_id"], ["ts_ms", "source_offset"])
    merge_upsert_delta(spark, path, source, ["video_id"], ["ts_ms", "source_offset"])
    out = spark.read.format("delta").load(path)
    assert out.count() == 2
    got = {r.video_id: r.status for r in out.collect()}
    assert got == {"vid_1": "review_hold", "vid_3": "active"}


def test_merge_overwrite_replay_idempotent(spark, tmp_path):
    """Applying the same micro-batch twice must leave the table identical —
    the replay-idempotency contract the transactional MERGE provides,
    asserted on the dispatching parquet fallback."""
    from shortvideohybridanalyticslakehouse_spark.streaming.jobs import (
        _merge_overwrite,
    )

    path = str(tmp_path / "gold_fact")
    batch = spark.createDataFrame(
        [("vid_1", "active", 1000, 0), ("vid_2", "active", 1100, 1)],
        "video_id string, status string, ts_ms long, source_offset long",
    )
    _merge_overwrite(spark, batch, path, ["video_id"], ["ts_ms", "source_offset"])
    first = sorted(map(tuple, spark.read.parquet(path).collect()))
    _merge_overwrite(spark, batch, path, ["video_id"], ["ts_ms", "source_offset"])
    second = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert first == second
