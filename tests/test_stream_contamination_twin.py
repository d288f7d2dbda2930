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
    contamination_firewall_bucketed,
    doc_shingles,
    train_shingle_index,
    write_shingle_index_bucketed,
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


def test_bucketed_index_leg_is_exchange_and_sort_free(spark, tmp_path):
    """The 100 TB layout: the persisted shingle index is bucketed+sorted
    by shingle, so the SMJ's index leg plans with NO Exchange and NO
    Sort — the layout provides both; only the probe side shuffles. Also
    the bucketed firewall flags the same docs as the in-memory one."""
    test_ids, train_ids = [10, 20], [1, 2]
    rows = [
        (train_ids[0], "t1 t2 t3 t4 t5 t6 t7 t8 t9", "xx", "src0", 30),
        (train_ids[1], "u1 u2 u3 u4 u5 u6 u7 u8", "xx", "src0", 20),
        (test_ids[0], "z0 t2 t3 t4 t5 t6 t7 t8 t9", "xx", "srcT", 30),
        (test_ids[1], "c1 c2 c3 c4 c5 c6 c7 c8", "xx", "srcC", 20),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )
    table = "contamination_shingle_index"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    try:
        write_shingle_index_bucketed(
            docs.filter(~docs.doc_id.isin(test_ids)), table, n_buckets=4
        )
        probe = docs.filter(docs.doc_id.isin(test_ids))
        # batch-mode plan of the same join the firewall runs per batch
        joined = doc_shingles(probe).join(
            spark.table(table).hint("merge"), "shingle"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # index leg: the subtree under the table scan must have neither
        # Exchange nor Sort — split the plan at the bucketed FileScan
        idx_leg = [
            ln for ln in plan.splitlines()
            if "contamination_shingle_index" in ln
        ]
        assert idx_leg, "bucketed table scan missing from the plan"
        assert "SelectedBucketsCount" in plan  # bucket-aware scan
        # exactly ONE Exchange in the whole join plan (the probe side);
        # the index side contributes none
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges == 1, plan
        # and exactly one Sort: the probe side (index pre-sorted on disk)
        n_sorts = plan.count("+- Sort ")
        assert n_sorts == 1, plan

        flagged = contamination_firewall_bucketed(probe, spark, table)
        got = {r.doc_id for r in flagged.collect()}
        assert got == {test_ids[0]}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
