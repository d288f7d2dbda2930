"""Long-soak growth gate for the streaming stores (VERDICT r7 #7).

Drives 100 micro-batches through (a) the winnowing ingest-dedup store
with per-batch log-structured folding and (b) a bucketed MV store with
per-batch marker vacuuming, then gates that every metadata quantity is
bounded by the CORPUS (or a fixed retention constant), never by the
number of batches lived through:

  * winnow fps/flags partition-directory count  <= keep_last + 1
  * winnow parquet file count                   <= dirs x files-per-fold bound
  * folding changed NO reader-visible content (flags and distinct
    fingerprints identical to an unfolded control run)
  * MV applied-batch markers                    <= keep_last per bucket

Usage: python tools/winnow_soak.py [--batches 100] [--docs-per-batch 20]
Prints one JSON gate report; exit 0 iff PASS.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

KEEP_LAST = 8
FOLD_FILES = 4
MARKER_KEEP = 16
MV_BUCKETS = 8


def _batch_docs(spark, batch_id: int, docs_per_batch: int):
    """Deterministic synthetic docs; every 5th doc repeats an earlier
    doc's text so near-dups actually occur."""
    rows = []
    for j in range(docs_per_batch):
        doc_id = batch_id * docs_per_batch + j
        if doc_id % 5 == 4 and doc_id >= 10:
            src = doc_id - 7  # duplicate of an earlier doc's text
        else:
            src = doc_id
        # hashed words: non-planted docs share no k-grams (an arithmetic
        # progression would alias shifted docs into accidental near-dups)
        import hashlib

        words = [
            "w" + hashlib.md5(f"{src}:{k}".encode()).hexdigest()[:8]
            for k in range(40)
        ]
        rows.append((doc_id, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=100)
    ap.add_argument("--docs-per-batch", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from shortvideohybridanalyticslakehouse_spark.session import get_spark
    from shortvideohybridanalyticslakehouse_spark.streaming import winnow
    from shortvideohybridanalyticslakehouse_spark.streaming.markers import (
        vacuum_markers,
    )
    from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
        MvSpec,
        counting,
        merge_mv_batch,
        read_mv,
    )

    spark = get_spark("svh-winnow-soak")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="svh_soak_")
    store = os.path.join(base, "winnow")
    control = os.path.join(base, "winnow_control")
    mv_store = os.path.join(base, "mv")
    spec = MvSpec(key_cols=("k",), measures=(counting("n"),))
    checks: dict[str, object] = {}
    try:
        total_markers_seen = 0
        for b in range(args.batches):
            docs = _batch_docs(spark, b, args.docs_per_batch)
            winnow.merge_winnow_batch(spark, docs, store, b)
            winnow.compact_winnow_store(
                spark, store, keep_last=KEEP_LAST, n_files=FOLD_FILES
            )
            winnow.merge_winnow_batch(spark, docs, control, b)  # no folding
            merge_mv_batch(
                spark,
                docs.select((F.col("doc_id") % 50).alias("k")),
                mv_store,
                b,
                spec,
                n_buckets=MV_BUCKETS,
            )
            vacuum_markers(mv_store, keep_last=MARKER_KEEP)

        prof = winnow.store_profile(store)
        ctrl_prof = winnow.store_profile(control)
        checks["profile_folded"] = prof
        checks["profile_control"] = ctrl_prof
        dir_bound = KEEP_LAST + 1
        checks["fps_dirs_bounded"] = prof["fps_dirs"] <= dir_bound
        checks["flags_dirs_bounded"] = prof["flags_dirs"] <= dir_bound
        file_bound = dir_bound * max(FOLD_FILES, 2)
        checks["fps_files_bounded"] = prof["fps_files"] <= file_bound
        checks["flags_files_bounded"] = prof["flags_files"] <= file_bound
        checks["control_dirs_grew_with_batches"] = (
            ctrl_prof["fps_dirs"] == args.batches
        )

        # folding must be invisible to readers
        f_fold = sorted(map(tuple, winnow.read_flags(spark, store).collect()))
        f_ctrl = sorted(map(tuple, winnow.read_flags(spark, control).collect()))
        checks["flags_equal_control"] = f_fold == f_ctrl
        checks["n_docs_flagged"] = len(f_fold)
        checks["n_dups"] = sum(1 for r in f_fold if r[1])
        fps_fold = sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(store, "fps"))
                .select("doc_id", "fph")
                .distinct()
                .collect(),
            )
        )
        fps_ctrl = sorted(
            map(
                tuple,
                spark.read.parquet(os.path.join(control, "fps"))
                .select("doc_id", "fph")
                .distinct()
                .collect(),
            )
        )
        checks["fps_equal_control"] = fps_fold == fps_ctrl

        # MV markers: per-bucket retention bound
        marker_counts = []
        for d in os.listdir(mv_store):
            p = os.path.join(mv_store, d)
            if os.path.isdir(p) and d.startswith("bucket="):
                marker_counts.append(
                    sum(
                        1
                        for f in os.listdir(p)
                        if f.startswith("_applied_batch_")
                    )
                )
        checks["mv_marker_max_per_bucket"] = max(marker_counts, default=0)
        checks["mv_markers_bounded"] = all(
            c <= MARKER_KEEP for c in marker_counts
        )
        mv_total = read_mv(spark, mv_store, spec).agg(F.sum("n")).collect()[0][0]
        checks["mv_rows_total_correct"] = (
            mv_total == args.batches * args.docs_per_batch
        )

        gates = [v for k, v in checks.items() if isinstance(v, bool)]
        report = {
            "pass": all(gates),
            "batches": args.batches,
            "docs": args.batches * args.docs_per_batch,
            **checks,
        }
        print(json.dumps(report))
        return 0 if report["pass"] else 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
