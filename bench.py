"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is executed to completion via a count-style action over the full
result (no driver-side row materialization — that's the scalable sink
analog). Wall time per query includes plan + execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all
from shortvideohybridanalyticslakehouse_spark.session import get_spark

REGISTRY = load_all()

HEADLINE = [
    "flagship_decision_context",
    "events_1min_agg",
    "rolling_30m_metrics",
    "validate_split_quarantine",
    "cdc_latest_snapshot",
    "join_enrich_revenue",
    "distinct_active_users",
    "topk_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("svh-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # One-time session warmup (JVM JIT, codegen compiler, Python worker pool,
    # parquet reader init) so the first measured query isn't charged for
    # machinery every later query gets for free. Touches no benchmark table.
    from pyspark.sql import functions as F

    from pyspark.sql import Window

    spark.range(1_000_000).groupBy((F.col("id") % 10).alias("k")).agg(
        F.sum("id")
    ).collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).collect()
    wdf = spark.range(1_000).select(
        (F.col("id") % 7).alias("k"), F.col("id").cast("double").alias("v")
    )
    # the measurement action itself (to_json + xxhash64 reduction)
    wdf.select(F.sum(F.xxhash64(F.to_json(F.struct("k", "v"))))).collect()
    # ObjectHashAggregate (percentile) and WindowExec class paths
    wdf.groupBy("k").agg(F.expr("percentile(v, 0.5D)")).collect()
    wdf.select(
        F.sum("v").over(Window.partitionBy("k").orderBy("v")).alias("s")
    ).collect()

    names = [n for n in HEADLINE if n in REGISTRY]
    names += [n for n in REGISTRY if n not in names]
    # Local-iteration subset: comma-separated query names. Driver runs never
    # set this, so the recorded artifact is always the full registry.
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        names = [n for n in names if n in keep]

    # Median-of-N wall time per query (round-4 methodology pin): a single
    # trial on a shared host folds one-off stalls (CPU steal, GC pause)
    # into the recorded number, and best-of-N hides systematic slowdowns;
    # the MEDIAN of >=3 trials is robust to one outlier in either
    # direction. Per-query spread (max-min) and host loadavg bracket the
    # run so cross-round deltas are attributable to plans vs. host noise.
    # Plan construction + execution are both inside the timed region.
    TRIALS = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "3"))

    def loadavg() -> list[float]:
        try:
            with open("/proc/loadavg") as fh:
                return [float(x) for x in fh.read().split()[:3]]
        except OSError:
            return []

    # Bench integrity guard (VERDICT r8 #2, tightened r10): BENCHDETAIL_r08
    # was recorded at loadavg 10 and r09's driver rerun at loadavg 4.69 —
    # UNDER the old fixed threshold of 6 — still minted two phantom >2x
    # movers (VERDICT r9 record-keeping note). A fixed loadavg bar cannot
    # see contention that arrives mid-run, so the noisy stamp is now keyed
    # off the run's own dispersion: noisy iff ANY of
    #   (a) loadavg_start > 0.25 per core (~2 per 8 cores),
    #   (b) >10% of queries needed adaptive retrials,
    #   (c) spread_p90 exceeds the median query median.
    # Defense (b) from r8 stays: per-query adaptive retrials — when a
    # query's trial spread exceeds its median, run up to MAX_EXTRA more
    # trials and report the median over all of them with one worst-outlier
    # trial dropped from the spread.
    MAX_LOAD_PER_CORE = float(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD_PER_CORE", "0.25")
    )
    MAX_EXTRA = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "3"))
    SPREAD_FLOOR = 0.25  # sub-250ms jitter is never worth a retrial
    NCPUS = os.cpu_count() or 8

    load_start = loadavg()
    load_bar = MAX_LOAD_PER_CORE * NCPUS
    host_noisy_at_start = bool(load_start) and load_start[0] > load_bar
    if host_noisy_at_start:
        print(
            f"WARNING: loadavg {load_start[0]:.1f} > {load_bar:g} "
            f"({MAX_LOAD_PER_CORE:g}/core x {NCPUS}) at bench start — "
            "medians may embed CPU steal; artifact is stamped noisy "
            "(treat cross-round deltas as suspect)",
            file=sys.stderr,
        )

    def _robust(trials: list[float]) -> tuple[float, float]:
        """(median, spread) with the single worst trial dropped when n>=4 —
        max-min over raw trials never shrinks with retrials, so the spread
        that gates retrial must be outlier-trimmed."""
        t = sorted(trials)
        if len(t) >= 4:
            t = t[:-1]
        return t[len(t) // 2], t[-1] - t[0]

    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    spreads_raw: dict[str, float] = {}
    retrialed: dict[str, int] = {}
    for name in names:
        fn, _ = REGISTRY[name]

        def one_trial() -> float:
            t0 = time.time()
            df = fn(spark, sf_dir)
            # Force full computation of every output column (a bare count()
            # lets Catalyst prune projected expressions): hash all columns,
            # reduce to one driver-side number — the no-I/O analog of
            # writing to a sink.
            df.select(
                F.sum(F.xxhash64(F.to_json(F.struct(*df.columns)))).alias("h")
            ).collect()
            return time.time() - t0

        trials = [one_trial() for _ in range(TRIALS)]
        med, spr = _robust(trials)
        extra = 0
        while spr > max(med, SPREAD_FLOOR) and extra < MAX_EXTRA:
            trials.append(one_trial())
            extra += 1
            med, spr = _robust(trials)
        if extra:
            retrialed[name] = extra
        timings[name] = round(med, 3)
        spreads[name] = round(spr, 3)
        # raw max-min over ALL trials too (ADVICE r9): pre-r09 artifacts
        # store raw spread, so bench_diff needs both to gate like-for-like
        spreads_raw[name] = round(max(trials) - min(trials), 3)
    load_end = loadavg()
    total = round(sum(timings.values()), 3)
    spread_sorted = sorted(spreads.values())
    # Key order matters: the driver records only the LAST ~2 KB of this
    # line, so `queries` (the medians) must be the FINAL key — through r6
    # the spread dict came after it, and every recorded BENCH_r*.json tail
    # was silently a spread dict that readers (r5 judge included) took for
    # medians (VERDICT r6 finding #2). Small scalars first, spreads next,
    # medians last.
    spread_p90 = (
        spread_sorted[int(0.9 * (len(spread_sorted) - 1))]
        if spread_sorted
        else None
    )
    med_sorted = sorted(timings.values())
    median_query_sec = med_sorted[len(med_sorted) // 2] if med_sorted else None

    # Relative noise criterion (VERDICT r10 #3): the absolute defenses
    # above can all pass while the whole run is uniformly ~20% slow from
    # steady background CPU steal — which is exactly the condition that
    # minted phantom movers three rounds running. Compare this run's
    # TOTAL against the most recent committed idle-host BENCHDETAIL with
    # the identical query set (registry hash over sorted names) at the
    # same sf: >10% above it stamps noisy. A real registry-wide plan
    # regression cannot trip this by construction — it would have to
    # slow EVERY query at once with the registry unchanged, which no
    # single-lane plan edit does; genuine global regressions (session
    # config) show up as the reference never re-basing.
    import hashlib

    registry_hash = hashlib.sha256(
        "\n".join(sorted(timings)).encode()
    ).hexdigest()[:16]
    rel_ref = None
    if not only:
        here = os.path.dirname(os.path.abspath(__file__))
        cands = []
        for f in os.listdir(here):
            m = re.match(r"BENCHDETAIL_r(\d+)\.json$", f)
            if not m:
                continue
            try:
                with open(os.path.join(here, f)) as fh:
                    d = json.load(fh)
            except (OSError, ValueError):
                continue
            same_set = d.get("registry_hash") == registry_hash or sorted(
                d.get("queries", {})
            ) == sorted(timings)
            if (
                not d.get("host_noisy", True)
                and d.get("sf") == sf
                and same_set
            ):
                cands.append((int(m.group(1)), f, d))
        if cands:
            rnd, fname, ref = max(cands, key=lambda c: c[0])
            rel_ref = {
                "artifact": fname,
                "ref_total": ref.get("value"),
                "ratio": round(total / ref["value"], 3)
                if ref.get("value")
                else None,
            }
    noisy_reasons = []
    if rel_ref and rel_ref["ratio"] is not None and rel_ref["ratio"] > 1.10:
        noisy_reasons.append(
            f"total {total:.1f}s > idle-host {rel_ref['artifact']} "
            f"{rel_ref['ref_total']:.1f}s x 1.10 (same registry)"
        )
    if host_noisy_at_start:
        noisy_reasons.append(
            f"loadavg_start {load_start[0]:.2f} > {load_bar:g}"
        )
    if timings and len(retrialed) / len(timings) > 0.10:
        noisy_reasons.append(
            f"retrial fraction {len(retrialed)}/{len(timings)} > 10%"
        )
    if (
        spread_p90 is not None
        and median_query_sec
        and spread_p90 > median_query_sec
    ):
        noisy_reasons.append(
            f"spread_p90 {spread_p90:.3f} > median query {median_query_sec:.3f}"
        )
    if noisy_reasons:
        print(
            "WARNING: bench stamped noisy: " + "; ".join(noisy_reasons),
            file=sys.stderr,
        )
    payload = {
        "metric": "total_wall_seconds_all_queries",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "trials_per_query": TRIALS,
        "timing": "median_of_trials",
        "spread_p90": spread_p90,
        "median_query_sec": median_query_sec,
        "host_noisy_at_start": host_noisy_at_start,
        "host_noisy": bool(noisy_reasons),
        "host_noisy_reasons": noisy_reasons,
        "registry_hash": registry_hash,
        "idle_host_reference": rel_ref,
        "retrialed_queries": retrialed,
        "loadavg_start": load_start,
        "loadavg_end": load_end,
        # trimmed spread (worst trial dropped at n>=4) — the retrial gate's
        # metric; raw max-min over all trials follows for like-for-like
        # comparison against pre-r09 artifacts (ADVICE r9)
        "spread_semantics": "trimmed(n>=4 drops worst); raw in *_raw",
        "query_spread_max_minus_min": spreads,
        "query_spread_raw": spreads_raw,
        "queries": timings,
    }
    print(json.dumps(payload))
    # Persist the FULL per-query detail into the repo (VERDICT r5 #3): the
    # driver's BENCH_r{N}.json truncates the tail, losing the only per-query
    # record of the older queries each round. Round number = one past the
    # highest recorded BENCH_r*.json (the driver writes BENCH_r{N} AFTER
    # running us, so at run time max existing is N-1). Subset runs
    # (SPARK_GRAFT_BENCH_ONLY) skip the artifact — partial detail would
    # overwrite full detail.
    if not only:
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            rounds = [
                int(m.group(1))
                for f in os.listdir(here)
                if (m := re.match(r"BENCH_r(\d+)\.json$", f))
            ]
            nxt = (max(rounds) + 1) if rounds else 0
            detail = os.environ.get(
                "SPARK_GRAFT_BENCH_DETAIL",
                os.path.join(here, f"BENCHDETAIL_r{nxt:02d}.json"),
            )
            with open(detail, "w") as fh:
                json.dump(payload, fh, indent=1, sort_keys=True)
                fh.write("\n")
        except OSError:
            pass
    spark.stop()


if __name__ == "__main__":
    main()
