"""Paired A/B bench for env-toggled plan variants (guide §1).

The sandbox host's speed drifts by 10-50% across minutes (CPU steal
bursts from co-tenants), so comparing a change against a baseline
recorded earlier is meaningless at the per-lane level. This harness
measures both variants INTERLEAVED inside one Spark session —
A,B,A,B,... per query — so both arms sample the same host conditions;
the per-arm MEDIAN over >=3 trials is then directly comparable.

Usage:
  python tools/ab_bench.py ENVVAR=a_val:b_val query [query ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SVH_AB_TRIALS (default 3).

The toggle env var is read at PLAN BUILD time by the code under test,
so each trial rebuilds the DataFrame with the variant's plan. Timed
action = bench.py's xxhash64-of-struct sum (same methodology).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark


def main() -> None:
    toggle, names = sys.argv[1], sys.argv[2:]
    var, vals = toggle.split("=", 1)
    a_val, b_val = vals.split(":", 1)
    trials = int(os.environ.get("SVH_AB_TRIALS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("svh-ab-bench")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py warmup
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).agg(
        F.sum("id")
    ).collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).collect()

    def steal() -> int:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])

    print(f"# arm A: {var}={a_val}   arm B: {var}={b_val}   trials={trials}")
    for name in names:
        fn, _ = registry[name]
        times: dict[str, list[float]] = {a_val: [], b_val: []}
        s0 = steal()
        for t in range(trials):
            for val in (a_val, b_val):
                os.environ[var] = val
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.select(
                    F.sum(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h")
                ).collect()
                times[val].append(time.time() - t0)
        os.environ.pop(var, None)
        sdelta = steal() - s0
        med = {v: sorted(ts)[len(ts) // 2] for v, ts in times.items()}
        ratio = med[b_val] / med[a_val] if med[a_val] else float("nan")
        print(
            f"{name}: A({var}={a_val}) med={med[a_val]:.3f}s "
            f"{[round(x,2) for x in times[a_val]]}  "
            f"B({var}={b_val}) med={med[b_val]:.3f}s "
            f"{[round(x,2) for x in times[b_val]]}  B/A={ratio:.3f} "
            f"steal={sdelta}j",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
