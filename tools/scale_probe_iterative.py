"""10x probe for the round-9 ITERATIVE lanes (VERDICT r9 #7):
esd_outlier_days and binseg_daily_changepoints (bounded limit(1)/collect
rounds over a persisted base) and kcenter_coreset_greedy (round-10's
folded min-distance rework).

The concern: each round is bounded in COUNT, but if a round rescans the
RAW input instead of the reduced/persisted base, round cost grows with
the corpus and K rounds multiply it. A healthy shape has wall growing
~linearly with input size for the one reduction pass, with the
iterative tail flat (ESD/binseg fold over a ~30-row daily aggregate;
k-center folds an O(N) frame K times — its wall may grow linearly, but
per-round per-row cost must stay flat).

Inputs are cloned 10x Spark-natively into /tmp parquet dirs (events:
event_id/user_id offsets per clone group, same calendar; embeddings:
vec_id offsets with a deterministic per-clone coordinate perturbation)
and the REAL registered queries run against the clone dir.

Usage: python tools/scale_probe_iterative.py [sf_dir] [factors...]
Artifact: tools/SCALE_PROBE_ITERATIVE.json (+ PLANS.md row).
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

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark

QUERIES = {
    "esd_outlier_days": ("events",),
    "binseg_daily_changepoints": ("events",),
    "kcenter_coreset_greedy": ("embeddings",),
}


def clone_events(spark, sf_dir: str, out: str, factor: int) -> int:
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n = ev.count()
    groups = spark.range(factor).select(F.col("id").alias("g"))
    cloned = ev.crossJoin(groups).select(
        (F.col("event_id") + F.col("g") * (n + 1)).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("g") * 1_000_000).alias("user_id"),
        "event_type",
        "value",
        "props",
    )
    cloned.write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    return n * factor


def clone_embeddings(spark, sf_dir: str, out: str, factor: int) -> int:
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    groups = spark.range(factor).select(F.col("id").alias("g"))
    # deterministic per-clone perturbation so clones aren't exact
    # duplicates (k-center's argmax would otherwise tie-break trivially)
    cloned = emb.crossJoin(groups).select(
        (F.col("vec_id") + F.col("g") * (n + 1)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + (
                F.pmod(F.xxhash64(F.col("vec_id"), F.col("g"), i), F.lit(1000))
                - 500
            ).cast("float")
            / 1_000_000.0,
        ).alias("embedding"),
        "label",
    )
    cloned.write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    return n * factor


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 10]
    registry = load_all()
    spark = get_spark("svh-probe-iter")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": sf_dir, "factors": {}}
    for factor in factors:
        d = f"/tmp/svh_iterprobe_{factor}x"
        rows = {}
        rows["events"] = clone_events(spark, sf_dir, d, factor)
        rows["embeddings"] = clone_embeddings(spark, sf_dir, d, factor)
        frow: dict = {"input_rows": rows, "queries": {}}
        for qname in QUERIES:
            fn, _ = registry[qname]
            t0 = time.time()
            res = fn(spark, d)
            n_out = res.count()
            wall = round(time.time() - t0, 2)
            base_rows = rows[QUERIES[qname][0]]
            frow["queries"][qname] = {
                "wall_sec": wall,
                "rows_out": n_out,
                "us_per_input_row": round(wall * 1e6 / base_rows, 3),
            }
            print(f"{factor}x {qname}: {wall}s ({n_out} rows)")
        out["factors"][f"{factor}x"] = frow
        shutil.rmtree(d, ignore_errors=True)
    # healthy = per-input-row cost flat-or-falling at 10x for every lane
    ok = True
    f1 = out["factors"].get("1x", {}).get("queries", {})
    f10 = out["factors"].get("10x", {}).get("queries", {})
    for qname in QUERIES:
        if qname in f1 and qname in f10:
            r = f10[qname]["us_per_input_row"] / max(
                f1[qname]["us_per_input_row"], 1e-9
            )
            out["factors"]["10x"]["queries"][qname]["per_row_ratio_vs_1x"] = (
                round(r, 3)
            )
            if r > 1.5:
                ok = False
    out["pass"] = ok
    path = os.path.join(_REPO, "tools", "SCALE_PROBE_ITERATIVE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"{'PASS' if ok else 'FAIL'} -> {path}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
