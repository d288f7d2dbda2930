"""Average precision (ext126): pure-Python replay of the md5 score
contract on a planted cohort, plus the perfect/degenerate edges."""

from __future__ import annotations

import datetime as dt
import hashlib

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _score(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16) % 1000


def ap_reference(users: dict[int, int]):
    order = sorted(users, key=lambda u: (-_score(u), u))
    c = 0
    term_sum = 0
    for k, u in enumerate(order, start=1):
        if users[u] == 1:
            c += 1
            term_sum += (c * 1_000_000) // k
    n_pos = sum(users.values())
    return term_sum // n_pos


def test_ap_matches_python_replay(spark, tmp_path):
    t0 = dt.datetime(2026, 9, 10, 9, 0, 0)
    # 30 users, positives = every third (label independent of the score)
    users = {u: (1 if u % 3 == 0 else 0) for u in range(1, 31)}
    rows = []
    eid = 0
    for u, y in users.items():
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
        if y:
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(minutes=1), u, "purchase", 1.0, "{}")
            )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = reg["propensity_average_precision"][0](
        spark, str(tmp_path)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_pos, r.n_neg) == (10, 20)
    assert r.prevalence_micro == (10 * 1_000_000) // 30
    assert r.ap_micro == ap_reference(users)
    # a noise score cannot reach near-perfect AP on this cohort
    assert r.ap_micro < 900_000
