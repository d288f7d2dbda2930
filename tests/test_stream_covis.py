"""Streaming co-visitation maintenance == batch pair aggregation over
the closed-session set (streaming/covis.py), with replay idempotency —
the watermark decides WHICH sessions close, and the MV makes their
counts exactly additive."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming.covis import (
    merge_covis_batch,
    read_covis,
    session_pairs,
    start_covis_job,
    top_recs,
)

_SCHEMA = "user_id long, ts timestamp, item long"

# (user, minute, item): u1 has two sessions (gap > 30m), u2 one session,
# u3 single-item session (emits no pairs)
_EVENTS = [
    [  # file 0
        (1, 0, 10),
        (1, 2, 11),
        (1, 4, 12),
        (2, 1, 10),
    ],
    [  # file 1
        (2, 3, 13),
        (3, 5, 20),
    ],
    [  # file 2 — u1's SECOND session, 90 min later
        (1, 95, 11),
        (1, 97, 13),
    ],
    [  # file 3 — far-future tick advances the watermark past everything
        (9, 300, 99),
    ],
]


def _write_files(src):
    os.makedirs(src, exist_ok=True)
    t0 = time.time() - 600
    for i, chunk in enumerate(_EVENTS):
        p = os.path.join(src, f"e{i:04d}.csv")
        with open(p, "w") as f:
            for u, minute, item in chunk:
                f.write(f"{u},2026-04-01 {minute // 60:02d}:{minute % 60:02d}:00,{item}\n")
        os.utime(p, (t0 + i, t0 + i))


def _expected_pairs(spark):
    """Batch reference: sessionize ALL events with the same 30-min gap,
    emit canonical pairs per session, count."""
    rows = [
        (u, f"2026-04-01 {m // 60:02d}:{m % 60:02d}:00", i)
        for chunk in _EVENTS
        for u, m, i in chunk
    ]
    df = (
        spark.createDataFrame(rows, "user_id long, ts string, item long")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    sessions = df.groupBy(
        "user_id", F.session_window("ts", "30 minutes").alias("w")
    ).agg(F.collect_set("item").alias("items"))
    sess = sessions.select(
        "user_id", F.col("w.start").alias("session_start"), "items"
    )
    return sorted(
        (r.item_a, r.item_b, r.co)
        for r in session_pairs(sess)
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("co"))
        .collect()
    )


def test_stream_equals_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    _write_files(src)
    store = os.path.join(str(tmp_path), "covis_mv")
    stream = (
        spark.readStream.schema(_SCHEMA).option("maxFilesPerTrigger", 1).csv(src)
    )
    q = start_covis_job(
        spark, stream, store, os.path.join(str(tmp_path), "ckpt")
    )
    q.awaitTermination(120)
    got = sorted(
        (r.item_a, r.item_b, r.co_sessions)
        for r in read_covis(spark, store).collect()
    )
    want = [
        t for t in _expected_pairs(spark) if True
    ]
    # the far-future tick closes every earlier session; u9's own session
    # (single item) may remain open — it contributes no pairs either way
    assert got == want
    # recs read straight off the store
    recs = {
        (r.item, r.rnk): r.rec
        for r in top_recs(read_covis(spark, store)).collect()
    }
    assert recs[(10, 1)] in (11, 12, 13)


def test_replay_is_idempotent(spark, tmp_path):
    store = os.path.join(str(tmp_path), "covis_mv")
    sess = spark.createDataFrame(
        [
            (1, "2026-04-01 00:00:00", [10, 11, 12]),
            (2, "2026-04-01 00:01:00", [10, 13]),
        ],
        "user_id long, session_start string, items array<long>",
    ).withColumn("session_start", F.col("session_start").cast("timestamp"))
    merge_covis_batch(spark, sess, store, 0)
    before = sorted(tuple(r) for r in read_covis(spark, store).collect())
    merge_covis_batch(spark, sess, store, 0)  # replay
    after = sorted(tuple(r) for r in read_covis(spark, store).collect())
    assert after == before
    assert (10, 11, 1) in before and (10, 13, 1) in before
