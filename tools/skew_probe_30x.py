"""30x partition-scaling RE-probe at the DEFAULT session config
(VERDICT r10 #1 "done" criterion).

Round 10 measured the bigram count-join's spill-less ShuffledHashJoin
build OOMing at the default 32 shuffle partitions on the 30x Zipf
corpus (~356 MB build per partition x 32 concurrent tasks) and running
clean only with a HAND-SET 128. Round 11 removed the hand lever:
sources/batch.scaled_shuffle_partitions derives the build width from a
metadata-fast count of the documents scan (10k docs/partition), so the
same corpus must now run clean with NO session override.

This probe re-runs bigram_lm_surprise on the identical
scale_probe_skewjoin Zipf corpus at 30x (1.5M docs) under get_spark()
defaults and records: the auto-chosen width, per-partition build MB,
wall, and the executed join nodes. PASS = query completes, pinned SHJ
present, per-partition build below the 256 MB safety line.

Usage: python tools/skew_probe_30x.py [base_docs] [factor]
Artifact: tools/SKEW_PROBE_30X.json (r10 hand-set history retained).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else ""
)

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark
from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    load_table,
    scaled_shuffle_partitions,
)
from tools.scale_probe_skewjoin import walk_join_metrics, write_zipf_corpus

_SAFETY_MB = 256  # r10 measured OOM at ~356 MB/partition


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    n_docs = base * factor
    registry = load_all()
    spark = get_spark("svh-skew-probe-30x")  # DEFAULT config — no 128
    spark.sparkContext.setLogLevel("ERROR")
    d = f"/tmp/svh_skewprobe30x_{factor}x"
    write_zipf_corpus(spark, d, n_docs, max(50_000, n_docs))
    n_shuf = scaled_shuffle_partitions(
        load_table(spark, d, "documents", ensure_parallelism=False),
        rows_per_partition=10_000,
    )
    fn, _ = registry["bigram_lm_surprise"]
    t0 = time.time()
    row = {
        "factor": factor,
        "n_docs": n_docs,
        "query": "bigram_lm_surprise",
        "session_shuffle_partitions": int(
            spark.conf.get("spark.sql.shuffle.partitions")
        ),
        "auto_scaled_partitions": n_shuf,
    }
    try:
        df = fn(spark, d)
        df.collect()
        row["wall_sec"] = round(time.time() - t0, 1)
        acc: dict = {}
        walk_join_metrics(df._jdf.queryExecution().executedPlan(), acc)
        build_total = acc.get("build_data_size", 0)
        per_part_mb = round(build_total / max(1, n_shuf) / (1 << 20), 1)
        row.update(
            {
                "status": "ok",
                "join_nodes": sorted(set(acc.get("join_nodes", []))),
                "build_data_size_total": build_total,
                "per_partition_build_mb": per_part_mb,
            }
        )
        row["pass"] = (
            "ShuffledHashJoinExec" in row["join_nodes"]
            and per_part_mb < _SAFETY_MB
        )
    except Exception as exc:  # noqa: BLE001 — the probe records failure
        row.update(
            {
                "status": "FAILED",
                "err": str(exc)[:200],
                "wall_sec": round(time.time() - t0, 1),
                "pass": False,
            }
        )
    path = os.path.join(_REPO, "tools", "SKEW_PROBE_30X.json")
    with open(path) as f:
        prior = json.load(f)
    out = {
        "r11_default_config_auto_scaled": row,
        "r10_hand_set_history": prior,
    }
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(row))
    return 0 if row["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
