"""Log-structured folding of the winnowing ingest store (VERDICT r7 #7).

The fps/flags stores keep one ``batch=N`` partition per micro-batch —
O(batches) directories over a long stream. Folding consolidates every
partition outside the replay window into a negative-id partition;
these tests pin that folding (a) bounds directory/file counts by the
retention constant, (b) changes NOTHING a reader sees, and (c) stays
correct under a crash that duplicates rows (the only bad window).

tools/winnow_soak.py is the 100-batch CLI twin.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming import winnow

KEEP = 3


def _docs(spark, batch_id, n=8):
    rows = []
    for j in range(n):
        doc_id = batch_id * n + j
        src = doc_id - 5 if (doc_id % 4 == 3 and doc_id >= 8) else doc_id
        words = [
            "w" + hashlib.md5(f"{src}:{k}".encode()).hexdigest()[:8]
            for k in range(40)
        ]
        rows.append((doc_id, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fold_bounds_dirs_and_preserves_reads(spark, tmp_path):
    store = str(tmp_path / "w")
    control = str(tmp_path / "c")
    for b in range(12):
        d = _docs(spark, b)
        winnow.merge_winnow_batch(spark, d, store, b)
        winnow.compact_winnow_store(spark, store, keep_last=KEEP, n_files=2)
        winnow.merge_winnow_batch(spark, d, control, b)

    prof = winnow.store_profile(store)
    assert prof["fps_dirs"] <= KEEP + 1
    assert prof["flags_dirs"] <= KEEP + 1
    ctrl = winnow.store_profile(control)
    assert ctrl["fps_dirs"] == 12  # the unbounded shape folding removes

    got = sorted(map(tuple, winnow.read_flags(spark, store).collect()))
    want = sorted(map(tuple, winnow.read_flags(spark, control).collect()))
    assert got == want and len(got) == 96
    assert any(r[1] for r in got)  # planted dups detected

    fps_f = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(store, "fps"))
            .select("doc_id", "fph").distinct().collect(),
        )
    )
    fps_c = sorted(
        map(
            tuple,
            spark.read.parquet(os.path.join(control, "fps"))
            .select("doc_id", "fph").distinct().collect(),
        )
    )
    assert fps_f == fps_c


def test_fold_crash_duplicates_are_harmless_and_healed(spark, tmp_path):
    """Crash window: fold renamed batch=-g in but died before deleting
    the folded sources — rows exist twice. Readers must not change their
    verdicts (hot-cap counts distinct docs), and the next fold heals."""
    import shutil

    store = str(tmp_path / "w")
    for b in range(8):
        winnow.merge_winnow_batch(spark, _docs(spark, b), store, b)
    before = sorted(map(tuple, winnow.read_flags(spark, store).collect()))

    # fold, then SIMULATE the crash by restoring one folded source dir
    fps = os.path.join(store, "fps")
    victim = os.path.join(fps, "batch=0")
    saved = str(tmp_path / "saved_b0")
    shutil.copytree(victim, saved)
    winnow.compact_winnow_store(spark, store, keep_last=KEEP, n_files=2)
    assert not os.path.isdir(victim)
    shutil.copytree(saved, victim)  # rows of batch 0 now exist TWICE

    # next batch's verdicts are unchanged by the duplicates
    nxt = _docs(spark, 8)
    winnow.merge_winnow_batch(spark, nxt, store, 8)
    control = str(tmp_path / "c")
    for b in range(9):
        winnow.merge_winnow_batch(spark, _docs(spark, b), control, b)
    got = sorted(map(tuple, winnow.read_flags(spark, store).collect()))
    want = sorted(map(tuple, winnow.read_flags(spark, control).collect()))
    assert got == want
    assert [t for t in got if t[0] < 64] == before

    # the next fold heals: distinct content, duplicate partition gone
    winnow.compact_winnow_store(spark, store, keep_last=1, n_files=2)
    fps_rows = spark.read.parquet(fps).select("doc_id", "fph").collect()
    assert len(fps_rows) == len({(r.doc_id, r.fph) for r in fps_rows})
