"""Offline state introspection via the Spark 4 state data source."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming import state_reader


def _run_windowed_agg(spark, tmp_path, n_keys=5, rows_per_key=4):
    """Drive a small windowed-count stream to completion; return ckpt dir."""
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    rows = []
    for k in range(n_keys):
        for i in range(rows_per_key):
            rows.append(
                {"k": f"key{k}", "ts": f"2026-01-01T00:{i:02d}:30Z"}
            )
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    stream = (
        spark.readStream.format("text")
        .load(src)
        .select(
            F.get_json_object("value", "$.k").alias("k"),
            F.get_json_object("value", "$.ts").cast("timestamp").alias("ts"),
        )
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 minute"), "k")
        .count()
    )
    ckpt = os.path.join(str(tmp_path), "ckpt")
    q = (
        stream.writeStream.format("memory")
        .queryName("state_reader_fixture")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return ckpt


def test_state_metadata_and_rows(spark, tmp_path):
    ckpt = _run_windowed_agg(spark, tmp_path)
    ops = state_reader.checkpoint_operators(spark, ckpt)
    assert len(ops) == 1 and ops[0]["operatorName"] == "stateStoreSave"
    # windowed count: one state row per (window, key) — 5 keys x 4 windows
    rows = state_reader.state_rows(spark, ckpt, operator_id=ops[0]["operatorId"])
    assert rows.count() == 20
    # values carry the running counts
    assert {r["count"] for r in rows.select("value.count").collect()} == {1}


def test_dedup_state_keys_and_skew(spark, tmp_path):
    ckpt = _run_windowed_agg(spark, tmp_path)
    keys = state_reader.dedup_state_keys(spark, ckpt).collect()
    assert len(keys) == 20
    assert {r["k"] for r in keys} == {f"key{i}" for i in range(5)}
    skew = state_reader.state_key_skew(spark, ckpt).collect()
    assert sum(r["n_state_rows"] for r in skew) == 20
    # descending by count
    counts = [r["n_state_rows"] for r in skew]
    assert counts == sorted(counts, reverse=True)


def test_export_state_roundtrip(spark, tmp_path):
    ckpt = _run_windowed_agg(spark, tmp_path)
    out = state_reader.export_state(spark, ckpt, str(tmp_path))
    back = spark.read.parquet(out)
    assert back.count() == 20
    assert "key_k" in back.columns and "value_count" in back.columns
    assert back.agg(F.sum("value_count")).first()[0] == 20
