"""Dump .explain("formatted") for named registry queries (guide §7.2).

Usage: python tools/dump_plans.py <suffix> <query> [...]
Writes plans/r12/<query>_<suffix>.txt (suffix = before|after).

Iterative lanes execute bounded sub-jobs (localCheckpoint / scalar folds)
during plan BUILD; the dumped plan is the final frame's plan on top of
those materialized points — exactly what the session executes for the
final action. Build wall time is printed so checkpointed work is visible.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark("svh-dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.environ.get("SVH_PLANS_DIR", "plans/r13")
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        fn, _ = registry[name]
        t0 = time.time()
        df = fn(spark, sf_dir)
        build = time.time() - t0
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"{outdir}/{name}_{suffix}.txt"
        with open(path, "w") as fh:
            fh.write(f"query: {name}\nsf_dir: {sf_dir}\n")
            fh.write(f"plan-build wall seconds (includes any bounded "
                     f"checkpoint/fold sub-jobs): {build:.3f}\n\n")
            fh.write(txt)
        print(f"wrote {path} (build {build:.2f}s)")


if __name__ == "__main__":
    main()
