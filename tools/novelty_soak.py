"""Soak gate for the streaming shingle-novelty monitor (VERDICT r10 #7).

Drives N micro-batches of synthetic in-order docs (every 5th doc
recycles an earlier doc's text) through streaming/novelty.py with
per-batch store folding, then gates:

  * per-source totals == the batch lane (ext140 shingle_temporal_
    novelty semantics) computed over the full closed corpus — BIT EXACT
    including recycled_micro;
  * replaying the final batch changes nothing (own-partition overwrite);
  * firstseen/flags partition-directory counts <= keep_last + 1 and
    file counts bounded by dirs x fold files — O(replay window), never
    O(batches);
  * folding changed NO reader-visible totals vs an unfolded control.

Usage: python tools/novelty_soak.py [--batches 50] [--docs-per-batch 20]
Prints one JSON gate report; exit 0 iff PASS. Artifact:
tools/NOVELTY_SOAK.json
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
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else ""
)

KEEP_LAST = 8
FOLD_FILES = 2


def _batch_docs(spark, batch_id: int, docs_per_batch: int):
    rows = []
    for j in range(docs_per_batch):
        doc_id = batch_id * docs_per_batch + j + 1
        if doc_id % 5 == 4 and doc_id >= 10:
            src = doc_id - 7  # recycle an earlier doc's text verbatim
        else:
            src = doc_id
        body = " ".join(f"d{src}w{k}" for k in range(12))
        rows.append((doc_id, body, "xx", f"src{doc_id % 3}", len(body)))
    return spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def _dir_stats(path: str) -> tuple[int, int]:
    if not os.path.isdir(path):
        return 0, 0
    dirs = [d for d in os.listdir(path) if d.startswith("batch=")]
    files = sum(
        1
        for d in dirs
        for f in os.listdir(os.path.join(path, d))
        if f.endswith(".parquet")
    )
    return len(dirs), files


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=50)
    ap.add_argument("--docs-per-batch", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from shortvideohybridanalyticslakehouse_spark.session import get_spark
    from shortvideohybridanalyticslakehouse_spark.streaming.novelty import (
        compact_novelty_store,
        merge_novelty_batch,
        read_novelty,
    )
    from shortvideohybridanalyticslakehouse_spark.plans.registry import (
        load_all,
    )

    spark = get_spark("novelty-soak")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    work = tempfile.mkdtemp(prefix="novelty_soak_")
    store = os.path.join(work, "store")
    control = os.path.join(work, "control")
    all_batches = []
    for b in range(args.batches):
        df = _batch_docs(spark, b, args.docs_per_batch)
        all_batches.append(df)
        merge_novelty_batch(spark, df, store, b)
        merge_novelty_batch(spark, df, control, b)
        compact_novelty_store(spark, store, KEEP_LAST, FOLD_FILES)

    def totals(st):
        return {
            r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
            for r in read_novelty(spark, st).collect()
        }

    folded, unfolded = totals(store), totals(control)

    # batch-lane reference over the full closed corpus
    full = all_batches[0]
    for df in all_batches[1:]:
        full = full.unionByName(df)
    ref_dir = os.path.join(work, "ref")
    full.write.mode("overwrite").parquet(
        os.path.join(ref_dir, "documents.parquet")
    )
    ref = {
        r.source: (r.n_shingles, r.n_recycled, r.recycled_micro)
        for r in registry["shingle_temporal_novelty"][0](
            spark, ref_dir
        ).collect()
    }

    # replay the final batch: must be a no-op
    merge_novelty_batch(
        spark,
        _batch_docs(spark, args.batches - 1, args.docs_per_batch),
        store,
        args.batches - 1,
    )
    after_replay = totals(store)

    fs_dirs, fs_files = _dir_stats(os.path.join(store, "firstseen"))
    fl_dirs, fl_files = _dir_stats(os.path.join(store, "flags"))
    cfs_dirs, _ = _dir_stats(os.path.join(control, "firstseen"))

    report = {
        "batches": args.batches,
        "docs": args.batches * args.docs_per_batch,
        "stream_equals_batch_lane": folded == ref,
        "fold_preserves_totals": folded == unfolded,
        "replay_is_noop": after_replay == ref,
        "recycling_nonzero": any(v[1] > 0 for v in ref.values()),
        "firstseen_dirs": fs_dirs,
        "firstseen_files": fs_files,
        "flags_dirs": fl_dirs,
        "flags_files": fl_files,
        "control_dirs_grew_with_batches": cfs_dirs == args.batches,
        "firstseen_dirs_bounded": fs_dirs <= KEEP_LAST + 1,
        "flags_dirs_bounded": fl_dirs <= KEEP_LAST + 1,
        "firstseen_files_bounded": fs_files
        <= (KEEP_LAST + 1) * max(FOLD_FILES, 2) + KEEP_LAST,
    }
    report["pass"] = all(
        report[k]
        for k in (
            "stream_equals_batch_lane",
            "fold_preserves_totals",
            "replay_is_noop",
            "recycling_nonzero",
            "control_dirs_grew_with_batches",
            "firstseen_dirs_bounded",
            "flags_dirs_bounded",
            "firstseen_files_bounded",
        )
    )
    out = os.path.join(_REPO, "tools", "NOVELTY_SOAK.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(json.dumps(report, sort_keys=True))
    shutil.rmtree(work, ignore_errors=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
