"""Streaming contamination firewall == the ext133 batch audit on the
same closed corpus: stream the test-split docs in arrival files against
the static train-shingle index; the set of flagged doc_ids and the
per-source counts must equal the batch query's."""

from __future__ import annotations

import hashlib
import json
import os
import time

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.contamination import (
    contamination_firewall,
    train_shingle_index,
)


def _is_test(doc_id: int) -> bool:
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
    return h % 10 == 0


def test_stream_firewall_equals_batch_audit(spark, tmp_path):
    # corpus: train docs carry distinctive shingles; some test docs copy
    # one, others are clean; a too-short doc is ignored by both sides
    test_ids = [i for i in range(1, 400) if _is_test(i)][:4]
    train_ids = [i for i in range(1, 400) if not _is_test(i)][:3]
    t = train_ids
    rows = [
        (t[0], "t1 t2 t3 t4 t5 t6 t7 t8 t9", "xx", "src0", 30),
        (t[1], "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", "xx", "src0", 30),
        (t[2], "v1 v2 v3 v4 v5 v6 v7 v8", "xx", "src1", 20),
        (test_ids[0], "a0 t2 t3 t4 t5 t6 t7 t8 t9 z", "xx", "srcT", 30),
        (test_ids[1], "clean c2 c3 c4 c5 c6 c7 c8 c9", "xx", "srcT", 30),
        (test_ids[2], "v1 v2 v3 v4 v5 v6 v7 v8 extra", "xx", "srcU", 30),
        (test_ids[3], "short doc", "xx", "srcU", 9),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    reg = load_all()
    batch = {
        r.source: r
        for r in reg["shingle_contamination_audit"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert batch["srcT"].n_contaminated == 1
    assert batch["srcU"].n_contaminated == 1

    # static index from the train split; stream the test docs as JSONL
    # arrival files (mtime-pinned)
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    train = docs.filter(~docs.doc_id.isin(test_ids))
    index = train_shingle_index(train)

    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src)
    t_base = time.time() - 600
    stream_rows = [r for r in rows if r[0] in test_ids]
    for i, r in enumerate(stream_rows):
        p = os.path.join(src, f"p{i:02d}.json")
        with open(p, "w") as f:
            f.write(
                json.dumps(
                    {"doc_id": r[0], "source": r[3], "text": r[1]}
                )
                + "\n"
            )
        os.utime(p, (t_base + i, t_base + i))

    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = (
        contamination_firewall(stream, index)
        .writeStream.format("memory")
        .queryName("contam_twin")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    flagged = spark.sql("SELECT * FROM contam_twin").collect()
    assert {r.doc_id for r in flagged} == {test_ids[0], test_ids[2]}
    per_source = {}
    for r in flagged:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert per_source == {"srcT": 1, "srcU": 1}
    # twin agreement with the batch audit's per-source counts
    for srcname, n in per_source.items():
        assert batch[srcname].n_contaminated == n
