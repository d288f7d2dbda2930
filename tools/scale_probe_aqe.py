"""Measure (don't argue) the AQE-broadcast scale claim (VERDICT r8 #3).

Four registry queries carry AQE-CHOSEN broadcasts >32 MB at sf0.1
(tpch_q4_order_priority, tpch_q5_local_supplier_volume,
market_basket_lift, bigram_lm_surprise). PLANS.md has asserted since r8
that these "adapt away at scale" — AQE re-estimates per run and flips to
a shuffle join once the build side outgrows the threshold. The mulaw
incident (352 MB misestimated broadcast, r7) shows estimator error is a
live failure mode, so this probe proves the adaptation instead:

  1. clone the build-side feeder tables 10x into a scratch sf dir with
     SALTED KEYS (new orderkeys/partkeys; token-salted documents via the
     scale_probe_composites scheme) so distinct-key cardinality — not
     just bytes — grows with the factor;
  2. run each query unmodified at 1x and 10x;
  3. walk the EXECUTED (post-AQE) plan and record join-strategy counts
     (BroadcastHashJoin vs SortMerge/ShuffledHash) + max broadcast bytes.

Healthy result: every >32 MB 1x broadcast is gone at 10x (strategy
flipped), and no broadcast GREW past its 1x size by ~10x (which would
mean AQE kept broadcasting a frame that scales with the data).

Usage: python tools/scale_probe_aqe.py [sf_dir] [--keep]
Artifact: tools/SCALE_PROBE_AQE.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + (
    os.pathsep + os.environ["PYTHONPATH"] if os.environ.get("PYTHONPATH") else ""
)

from pyspark.sql import functions as F  # noqa: E402

TARGETS = [
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "market_basket_lift",
    "bigram_lm_surprise",
]
FACTOR = 10
_BIG = 10_000_000_000  # orderkey salt stride
_PBIG = 100_000_000  # partkey salt stride

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def _join_counts(df) -> dict:
    """Join-strategy census over the EXECUTED (post-AQE) plan."""
    acc: dict[str, int] = {}

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "ReusedExchangeExec":
            return
        if "Join" in cls:
            acc[cls] = acc.get(cls, 0) + 1
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
        elif cls.endswith("QueryStageExec"):
            walk(node.plan())
        ch = node.children()
        for i in range(ch.length()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return acc


def build_scaled_dir(spark, sf_dir: str, out_dir: str) -> None:
    """Scaled twin of sf_dir: orders/lineitem cloned FACTORx with salted
    order+part keys, documents token-salted FACTORx; everything else
    hard-linked."""
    from tools.scale_probe_composites import scaled_docs

    os.makedirs(out_dir, exist_ok=True)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if t in ("orders", "lineitem", "documents"):
            continue
        if not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst, copy_function=os.link)
            else:
                os.link(src, dst)

    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    (
        orders.crossJoin(reps)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("rep") * _BIG)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "orders.parquet"))
    )
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    (
        li.crossJoin(reps)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("rep") * _BIG)
        # partkey salting grows the ITEM vocabulary (market_basket build
        # side) with the factor, mirroring a genuinely larger catalog
        .withColumn("l_partkey", F.col("l_partkey") + F.col("rep") * _PBIG)
        .drop("rep")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "lineitem.parquet"))
    )
    scaled_docs(spark, sf_dir, FACTOR).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )


def main() -> int:
    argv = sys.argv[1:]
    keep = "--keep" in argv
    argv = [a for a in argv if a != "--keep"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.1"

    from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
    from shortvideohybridanalyticslakehouse_spark.session import get_spark
    from tools.shuffle_gate import measure

    registry = load_all()
    spark = get_spark("svh-probe-aqe")
    spark.sparkContext.setLogLevel("ERROR")

    scaled_dir = "/tmp/svh_aqe_scaled_sf"
    print(f"building {FACTOR}x scaled dir at {scaled_dir} ...")
    build_scaled_dir(spark, sf_dir, scaled_dir)

    report = {}
    ok = True
    for name in TARGETS:
        fn, _ = registry[name]
        row = {}
        for label, d in (("1x", sf_dir), (f"{FACTOR}x", scaled_dir)):
            t0 = time.time()
            df = fn(spark, d)
            mets = measure(df)
            joins = _join_counts(df)
            row[label] = {
                "wall_s": round(time.time() - t0, 1),
                "joins": joins,
                "max_broadcast_mb": round(
                    mets["max_broadcast_bytes"] / 1e6, 1
                ),
                "broadcasts": mets["broadcasts"],
                "shuffle_mb": round(mets["shuffle_bytes_written"] / 1e6, 1),
            }
        b1 = row["1x"]["max_broadcast_mb"]
        b10 = row[f"{FACTOR}x"]["max_broadcast_mb"]
        # adaptation criterion: the big 1x broadcast must NOT scale with
        # the data — at 10x the largest broadcast stays under ~2x of the
        # 1x value (AQE demoted the growing side to a shuffle join)
        row["adapted"] = b10 <= max(2 * b1, b1 + 8.0)
        ok &= row["adapted"]
        print(
            f"{name}: 1x max_bcast={b1}MB joins={row['1x']['joins']} | "
            f"{FACTOR}x max_bcast={b10}MB joins={row[f'{FACTOR}x']['joins']} "
            f"-> {'ADAPTED' if row['adapted'] else 'DID NOT ADAPT'}"
        )
        report[name] = row

    out = os.path.join(_REPO, "tools", "SCALE_PROBE_AQE.json")
    with open(out, "w") as fh:
        json.dump(
            {"factor": FACTOR, "sf_dir": sf_dir, "all_adapted": ok,
             "queries": report},
            fh,
            indent=1,
        )
    print("SUMMARY:", json.dumps({"all_adapted": ok}))
    if not keep:
        shutil.rmtree(scaled_dir, ignore_errors=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
