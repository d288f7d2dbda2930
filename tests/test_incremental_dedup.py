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
