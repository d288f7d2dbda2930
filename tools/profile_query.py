"""Per-query profiler for the optimization rounds (guide §1).

Usage: python tools/profile_query.py <query_name> [<query_name> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.

For each query, runs the registered plan on a UI-enabled session and
reports the wall-time split (plan-build vs execution), job/stage counts,
the slowest stages with their task-time totals, and the top SQL-node
metrics from the REST API — the local-mode stand-in for the Spark UI
walk the optimization guide §1/§7 prescribes. Also writes
plans/r13/<query>_profile.txt with the raw numbers.

Timed action = the bench's own action (xxhash64-of-struct sum collect)
so the breakdown matches what bench.py measures.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark


def rest(app_port: int, path: str):
    url = f"http://localhost:{app_port}/api/v1/{path}"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all()
    spark = get_spark(
        "svh-profile", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId
    # warmup (mirrors bench.py)
    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).agg(
        F.sum("id")
    ).collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).collect()

    for name in names:
        fn, _ = registry[name]
        # --- trial 0: cold-ish (post-warmup) ---
        jobs_before = {j["jobId"] for j in rest(port, f"applications/{app_id}/jobs")}
        execs_before = {e["id"] for e in rest(port, f"applications/{app_id}/sql?length=1000")}
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_build = time.time() - t0
        t1 = time.time()
        df.select(
            F.sum(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h")
        ).collect()
        t_exec = time.time() - t1
        # --- trial 1: warm repeat ---
        t2 = time.time()
        df2 = fn(spark, sf_dir)
        t_build2 = time.time() - t2
        t3 = time.time()
        df2.select(
            F.sum(F.xxhash64(F.to_json(F.struct(*df2.columns)))).alias("h")
        ).collect()
        t_exec2 = time.time() - t3
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stages = rest(port, f"applications/{app_id}/stages?status=complete")
        stage_ids = {s for j in jobs for s in j.get("stageIds", [])}
        mine = [s for s in stages if s["stageId"] in stage_ids]
        mine.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        lines = [
            f"query: {name}",
            f"trial0: build {t_build:.3f}s exec {t_exec:.3f}s total {t_build + t_exec:.3f}s",
            f"trial1: build {t_build2:.3f}s exec {t_exec2:.3f}s total {t_build2 + t_exec2:.3f}s",
            f"jobs: {len(jobs)}  stages: {len(mine)}",
            f"sum executorRunTime over stages: {sum(s.get('executorRunTime') or 0 for s in mine)/1000.0:.2f}s (both trials)",
            "top stages by executorRunTime (ms): ",
        ]
        for s in mine[:12]:
            lines.append(
                f"  stage {s['stageId']}: run={s.get('executorRunTime')}ms "
                f"cpu={int((s.get('executorCpuTime') or 0)/1e6)}ms "
                f"gc={s.get('jvmGcTime')}ms "
                f"deser={s.get('executorDeserializeTime')}ms "
                f"tasks={s.get('numCompleteTasks')} "
                f"shr={s.get('shuffleReadBytes', 0)}B shw={s.get('shuffleWriteBytes', 0)}B "
                f"in={s.get('inputBytes', 0)}B  name={s.get('name', '')[:90]}"
            )
        try:
            sqls = [
                e
                for e in rest(port, f"applications/{app_id}/sql?length=1000&details=true")
                if e["id"] not in execs_before
            ]
            for e in sqls:
                if e.get("duration"):
                    lines.append(
                        f"sql exec {e['id']}: {e['duration']}ms status={e.get('status')}"
                    )
        except Exception as ex:  # REST /sql shape varies across versions
            lines.append(f"(sql endpoint skipped: {ex})")
        out = "\n".join(lines)
        print(out, flush=True)
        os.makedirs(
            os.path.join(os.path.dirname(__file__), "..", "plans", "r13"),
            exist_ok=True,
        )
        with open(
            os.path.join(
                os.path.dirname(__file__), "..", "plans", "r13", f"{name}_profile.txt"
            ),
            "w",
        ) as fh:
            fh.write(out + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
