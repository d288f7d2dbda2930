"""Stateful streaming on the RocksDB state store provider.

The HDFS-backed default keeps all state in JVM heap; RocksDB is the
provider a large-state job actually runs (see stateful.ROCKSDB_STATE_CONFS).
Semantics must be identical — same cooldown emissions, state surviving
micro-batches — and the checkpoint must show RocksDB artifacts (changelog
files), proving the provider was actually engaged and not silently
defaulted.
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming import jobs, stateful


def _write(path: str, rows: list[dict], mtime: float) -> None:
    with open(path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    os.utime(path, (mtime, mtime))


def test_cooldown_on_rocksdb_matches_default_provider(spark, tmp_path):
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    _write(
        os.path.join(src, "part-0000.jsonl"),
        [{"video_id": "vid_1", "decision_type": "BOOST", "t": "2026-01-01 00:05:00"}],
        mtime=1_700_000_000,
    )
    _write(
        os.path.join(src, "part-0001.jsonl"),
        [
            {"video_id": "vid_1", "decision_type": "RESCUE", "t": "2026-01-01 00:15:00"},
            {"video_id": "vid_1", "decision_type": "REVIEW", "t": "2026-01-01 01:15:00"},
            {"video_id": "vid_2", "decision_type": "BOOST", "t": "2026-01-01 00:20:00"},
        ],
        mtime=1_700_000_060,
    )

    prev = stateful.apply_rocksdb_state(spark)
    try:
        raw = jobs.read_json_file_stream(spark, src, max_files_per_trigger=1)
        parsed = raw.select(
            F.get_json_object("raw_value", "$.video_id").alias("video_id"),
            F.get_json_object("raw_value", "$.decision_type").alias("decision_type"),
            F.to_timestamp(F.get_json_object("raw_value", "$.t")).alias("created_at"),
        )
        out = stateful.cooldown_suppress(parsed, cooldown_minutes=60)
        ckpt = os.path.join(str(tmp_path), "ckpt_rocks")
        q = (
            out.writeStream.format("memory")
            .queryName("cooldown_rocksdb")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        stateful.restore_confs(spark, prev)

    got = {
        (r.video_id, r.decision_type)
        for r in spark.sql("SELECT * FROM cooldown_rocksdb").collect()
    }
    # identical emission set as the default-provider run in
    # test_stateful_streaming.py — cross-batch suppression intact
    assert got == {
        ("vid_1", "BOOST"),
        ("vid_1", "REVIEW"),
        ("vid_2", "BOOST"),
    }

    # the state dir must contain RocksDB changelog artifacts — proof the
    # provider took effect (HDFS provider writes .delta/.snapshot instead)
    changelogs = glob.glob(
        os.path.join(ckpt, "state", "**", "*.changelog"), recursive=True
    )
    assert changelogs, "no RocksDB changelog files under the state checkpoint"
