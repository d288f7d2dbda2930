"""Streaming shingle-novelty monitor == the ext140 batch lane, bit for
bit, on the same closed in-order corpus (VERDICT r10 #7): first-seen
store folds incrementally; per-source totals and recycled_micro equal
the batch query; replay and store compaction change nothing."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.streaming.novelty import (
    compact_novelty_store,
    merge_novelty_batch,
    read_novelty,
    start_novelty_job,
)

REG = load_all()


def _docs_rows():
    """20 docs over 2 sources; docs 10..13 recycle text from docs 1..4
    (whole-text copies => every shingle recycled); doc 14 partially
    recycles doc 5's first 9 tokens (2 recycled shingles of 5)."""
    rows = []
    for i in range(1, 10):
        body = " ".join(f"t{i}w{j}" for j in range(12))
        rows.append((i, body, "xx", f"src{i % 2}", len(body)))
    for i in range(10, 14):
        donor = i - 9
        body = " ".join(f"t{donor}w{j}" for j in range(12))
        rows.append((i, body, "xx", f"src{i % 2}", len(body)))
    body = " ".join(f"t5w{j}" for j in range(9)) + " zz0 zz1 zz2"
    rows.append((14, body, "xx", "src0", len(body)))
    for i in range(15, 21):
        body = " ".join(f"u{i}w{j}" for j in range(10))
        rows.append((i, body, "xx", f"src{i % 2}", len(body)))
    return rows


def _write_docs(spark, tmp_path):
    spark.createDataFrame(
        _docs_rows(),
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def _batch_reference(spark, tmp_path):
    return {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in REG["shingle_temporal_novelty"][0](
            spark, str(tmp_path)
        ).collect()
    }


def _stream_files(spark, tmp_path, splits):
    """Write the docs as CSV-ish parquet files in doc_id order with
    strictly increasing mtimes so FileStreamSource preserves order."""
    import shutil

    src = os.path.join(str(tmp_path), "in")
    os.makedirs(src, exist_ok=True)
    rows = _docs_rows()
    t_base = time.time() - 600
    lo = 0
    for i, hi in enumerate(splits):
        part = rows[lo:hi]
        lo = hi
        staged = os.path.join(str(tmp_path), f"_stage{i}")
        spark.createDataFrame(
            part,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(staged)
        # hoist the single part file up as a plain file (FileStreamSource
        # does not recurse into nested parquet directories)
        part_file = next(
            f for f in os.listdir(staged) if f.endswith(".parquet")
        )
        dest = os.path.join(src, f"p{i:02d}.parquet")
        shutil.move(os.path.join(staged, part_file), dest)
        shutil.rmtree(staged, ignore_errors=True)
        os.utime(dest, (t_base + i, t_base + i))
    return src


def _run_stream(spark, tmp_path, src, tag):
    store = os.path.join(str(tmp_path), f"store_{tag}")
    q = start_novelty_job(
        spark,
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string,"
            " n_chars long"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        store,
        os.path.join(str(tmp_path), f"ckpt_{tag}"),
    )
    q.awaitTermination(180)
    return store


def test_stream_novelty_equals_batch_and_survives_replay(spark, tmp_path):
    _write_docs(spark, tmp_path)
    ref = _batch_reference(spark, tmp_path)
    assert any(v[1] > 0 for v in ref.values())  # recycling is real

    src = _stream_files(spark, tmp_path, splits=[7, 14, 21])
    store = _run_stream(spark, tmp_path, src, "a")
    got = {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in read_novelty(spark, store).collect()
    }
    assert got == ref  # bit-exact totals AND micro ratios

    # replay the LAST batch (the crash-recovery path): own-partition
    # overwrite must leave the fold unchanged
    last_file = sorted(os.listdir(src))[-1]
    batch_df = spark.read.parquet(os.path.join(src, last_file))
    n_batches = len(os.listdir(os.path.join(store, "flags")))
    merge_novelty_batch(spark, batch_df, store, n_batches - 1)
    got2 = {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in read_novelty(spark, store).collect()
    }
    assert got2 == ref

    # compaction folds old partitions without changing the read
    compact_novelty_store(spark, store, keep_last=1)
    got3 = {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in read_novelty(spark, store).collect()
    }
    assert got3 == ref
    fs_parts = [
        d
        for d in os.listdir(os.path.join(store, "firstseen"))
        if d.startswith("batch=")
    ]
    assert len(fs_parts) <= 2  # one fold + keep_last


def test_stream_novelty_split_invariant(spark, tmp_path):
    """A different batching of the same in-order stream folds to the
    identical totals (the winnow.py split-invariance doctrine)."""
    _write_docs(spark, tmp_path)
    ref = _batch_reference(spark, tmp_path)
    src = _stream_files(spark, tmp_path, splits=[3, 5, 9, 16, 21])
    store = _run_stream(spark, tmp_path, src, "b")
    got = {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in read_novelty(spark, store).collect()
    }
    assert got == ref
