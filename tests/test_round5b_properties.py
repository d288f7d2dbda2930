"""Randomized property tests for the round-5 continuation operators:
brute-force replays in plain Python against the registry queries on
generated fixtures — the engine must match the definition, not just the
planted examples."""

from __future__ import annotations

import datetime as dt
import random

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _write(spark, tmp_path, rows, sub="sf"):
    d = str(tmp_path / sub)
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(
        d + "/events.parquet"
    )
    return d


def test_interval_union_matches_bruteforce(spark, tmp_path):
    random.seed(99)
    base = dt.datetime(2024, 4, 1)
    rows, eid = [], 0
    truth: dict[int, list[int]] = {}
    for u in range(8):
        n = random.randint(1, 25)
        starts = sorted(random.randint(0, 7200) for _ in range(n))
        truth[u] = starts
        for s in starts:
            eid += 1
            rows.append((eid, base + dt.timedelta(seconds=s), u, "view", 1.0, "{}"))
    d = _write(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.user_id: (r.n_islands, r.covered_seconds)
        for r in reg["interval_union_coverage"][0](spark, d).collect()
    }
    for u, starts in truth.items():
        # brute-force union of [s, s+600)
        pts = sorted(set(starts))
        islands, covered = 0, 0
        cur_s = cur_e = None
        for s in pts:
            if cur_e is None or s >= cur_e:
                if cur_e is not None:
                    covered += cur_e - cur_s
                islands += 1
                cur_s, cur_e = s, s + 600
            else:
                cur_e = max(cur_e, s + 600)
        covered += cur_e - cur_s
        assert got[u] == (islands, covered), u


def test_attribution_conserves_credit_randomized(spark, tmp_path):
    random.seed(101)
    base = dt.datetime(2024, 4, 10)
    rows, eid = [], 0
    expected_conversions_with_touches = 0
    for u in range(12):
        n_clicks = random.randint(0, 9)
        for i in range(n_clicks):
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=i), u, "click", 1.0, "{}")
            )
        if random.random() < 0.8:
            eid += 1
            rows.append(
                (eid, base + dt.timedelta(hours=50), u, "purchase", 1.0, "{}")
            )
            if n_clicks > 0:  # clicks all within 7 days before the purchase
                expected_conversions_with_touches += 1
    d = _write(spark, tmp_path, rows)
    reg = load_all()
    out = reg["position_attribution_credit"][0](spark, d).collect()
    total = sum(r.credit_micro_sum for r in out)
    assert total == expected_conversions_with_touches * 1_000_000


def test_transition_matrix_rows_normalize(spark, tmp_path):
    random.seed(103)
    base = dt.datetime(2024, 4, 20)
    rows, eid = [], 0
    for u in range(10):
        for i in range(random.randint(2, 30)):
            eid += 1
            rows.append(
                (
                    eid,
                    base + dt.timedelta(minutes=i),
                    u,
                    random.choice(["view", "click", "purchase"]),
                    1.0,
                    "{}",
                )
            )
    d = _write(spark, tmp_path, rows)
    reg = load_all()
    out = reg["event_transition_matrix"][0](spark, d).collect()
    by_prev: dict[str, float] = {}
    counts: dict[str, int] = {}
    for r in out:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.p
        counts[r.prev_type] = counts.get(r.prev_type, 0) + r.n
    for prev, psum in by_prev.items():
        assert abs(psum - 1.0) < 1e-9, prev
    assert sum(counts.values()) > 0


def test_sweep_line_peak_matches_bruteforce(spark, tmp_path):
    random.seed(107)
    base = dt.datetime(2024, 5, 5)
    rows, eid = [], 0
    per_user: dict[int, list[int]] = {}
    for u in range(6):
        n = random.randint(1, 10)
        ts = sorted(random.randint(0, 10800) for _ in range(n))
        per_user[u] = ts
        for s in ts:
            eid += 1
            rows.append((eid, base + dt.timedelta(seconds=s), u, "view", 1.0, "{}"))
    d = _write(spark, tmp_path, rows)
    reg = load_all()
    r = reg["max_concurrent_sessions"][0](spark, d).collect()[0]

    # brute force: session_window semantics — session extends while the
    # next event is < last + 1800s; end = last + 1800
    sessions = []
    for u, ts in per_user.items():
        cur = [ts[0], ts[0]]
        for s in ts[1:]:
            if s < cur[1] + 1800:
                cur[1] = s
            else:
                sessions.append((cur[0], cur[1] + 1800))
                cur = [s, s]
        sessions.append((cur[0], cur[1] + 1800))
    # concurrency evaluated just after each boundary timestamp
    bounds = sorted({s for s, _ in sessions} | {e for _, e in sessions})
    best, best_t = -1, None
    for t in bounds:
        c = sum(1 for s, e in sessions if s <= t < e)
        if c > best:
            best, best_t = c, t
    assert r.peak_concurrency == best
    assert r.n_sessions == len(sessions)
    want_ts = (base + dt.timedelta(seconds=best_t)).strftime("%Y-%m-%d %H:%M:%S")
    assert r.peak_ts == want_ts
