"""Stream-static incremental near-dup: new docs vs a static corpus index."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming import jobs

DOCS = [
    (100, "the quick brown fox jumps over the lazy dog near the river bank"),
    (101, "completely different content about spark physical plans and shuffles"),
    (102, "another unrelated document mentioning tokens and embeddings at scale"),
]


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_incremental_candidates_match_batch_twin(spark, tmp_path):
    corpus = _corpus(spark)
    index_path = os.path.join(str(tmp_path), "index")
    jobs.build_near_dup_index(corpus).write.parquet(index_path)
    index = spark.read.parquet(index_path)

    # new doc 500 is a near-dup of corpus doc 100 (one word changed);
    # new doc 501 matches nothing
    new_rows = [
        {"doc_id": 500, "text": "the quick brown fox jumps over the lazy cat near the river bank"},
        {"doc_id": 501, "text": "zzz yyy xxx www vvv uuu ttt sss rrr qqq"},
    ]
    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    with open(os.path.join(src, "b0.jsonl"), "w") as f:
        f.write("\n".join(json.dumps(r) for r in new_rows))

    stream = (
        spark.readStream.format("text")
        .load(src)
        .select(
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("value", "$.text").alias("text"),
        )
    )
    out = jobs.incremental_near_dup_plan(stream, index)
    q = (
        out.writeStream.format("memory")
        .queryName("inc_dedup")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in spark.sql("select * from inc_dedup").collect()
    }

    # batch twin over identical inputs
    batch_new = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in new_rows], "doc_id long, text string"
    )
    expected = {
        (r.new_id, r.corpus_id, r.est_jaccard)
        for r in jobs.incremental_near_dup_plan(batch_new, index).collect()
    }
    assert got == expected
    # the planted near-dup must be a high-estimate candidate
    planted = [e for e in got if e[0] == 500 and e[1] == 100]
    assert planted and planted[0][2] >= 0.5
    # the unrelated doc must not pair with anything
    assert not any(e[0] == 501 for e in got)


def test_incremental_dedup_watermarked_state_bound(spark, tmp_path):
    """Round-4 advice fix: with event_ts_col, the (new_id, corpus_id)
    dedup becomes dropDuplicatesWithinWatermark — state is evictable, and
    within-watermark re-ingests are still suppressed."""
    corpus = _corpus(spark)
    index_path = os.path.join(str(tmp_path), "index_wm")
    jobs.build_near_dup_index(corpus).write.parquet(index_path)
    index = spark.read.parquet(index_path)

    row = {
        "doc_id": 500,
        "text": "the quick brown fox jumps over the lazy cat near the river bank",
        "ts": "2026-01-01T00:00:00Z",
    }
    src = os.path.join(str(tmp_path), "in_wm")
    os.makedirs(src)
    # the same doc ingested twice (two files) inside the watermark window
    for i in range(2):
        with open(os.path.join(src, f"b{i}.jsonl"), "w") as f:
            f.write(json.dumps(row))

    stream = (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select(
            F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
            F.get_json_object("value", "$.text").alias("text"),
            F.get_json_object("value", "$.ts").cast("timestamp").alias("ts"),
        )
    )
    out = jobs.incremental_near_dup_plan(
        stream, index, event_ts_col="ts", watermark="10 minutes"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("inc_dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from inc_dedup_wm").collect()
    # re-ingest suppressed; planted near-dup found once
    assert len([r for r in rows if r.new_id == 500 and r.corpus_id == 100]) == 1
    # the state operator is the watermarked dedup variant (evictable state)
    import json as _json

    progs = [_json.loads(p.json) for p in q.recentProgress]
    ops = {
        so["operatorName"]
        for p in progs
        for so in p.get("stateOperators", [])
    }
    assert "dedupeWithinWatermark" in ops
