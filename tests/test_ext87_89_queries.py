"""Planted-fixture tests for round-6 batch 3: PSI drift (ext87),
daily pivot (ext88), Zipf fit (ext89)."""

from __future__ import annotations

import datetime as dt
import math

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_psi_hand_computed(spark, tmp_path):
    """Reference (view) values 0..99 cents, current (click) all in the
    top bin -> PSI matches the hand fold."""
    t0 = dt.datetime(2026, 8, 1)
    rows = []
    eid = 0
    for cents in range(0, 100):
        eid += 1
        rows.append((eid, t0, 1, "view", cents / 100.0, "{}"))
    for _ in range(50):
        eid += 1
        rows.append((eid, t0, 1, "click", 0.95, "{}"))
    _write_events(spark, tmp_path, rows)
    reg = load_all()
    r = reg["value_distribution_psi"][0](spark, str(tmp_path)).collect()[0]
    assert (r.n_ref, r.n_cur) == (100, 50)
    # bins: lo=0, hi=99, width formula floor(10*(c-0)/100) -> 10 ref each;
    # current: all 50 at cents=95 -> bin 9
    psi = 0.0
    for b in range(10):
        c_ref, c_cur = 10, (50 if b == 9 else 0)
        p = (c_ref + 1) / (100 + 10)
        q = (c_cur + 1) / (50 + 10)
        psi += (p - q) * math.log(p / q)
    assert r.psi == round(psi, 6)


def test_pivot_counts(spark, tmp_path):
    t0 = dt.datetime(2026, 8, 2)
    rows = []
    eid = 0
    plan = {"click": 3, "view": 2, "purchase": 1}
    for etype, n in plan.items():
        for _ in range(n):
            eid += 1
            rows.append((eid, t0, 1, etype, 1.0, "{}"))
    eid += 1
    rows.append((eid, t0 + dt.timedelta(days=1), 1, "error", 1.0, "{}"))
    _write_events(spark, tmp_path, rows)
    reg = load_all()
    got = {
        r.day: r.asDict()
        for r in reg["daily_event_type_pivot"][0](
            spark, str(tmp_path)
        ).collect()
    }
    d1 = got["2026-08-02"]
    assert (d1["click"], d1["view"], d1["purchase"], d1["signup"],
            d1["error"], d1["total"]) == (3, 2, 1, 0, 0, 6)
    d2 = got["2026-08-03"]
    assert (d2["error"], d2["total"]) == (1, 1)


def test_zipf_exact_powerlaw(spark, tmp_path):
    """A corpus whose term frequencies are exactly c_r = 1000 // r for
    ranks 1..20: fit the known points with a hand OLS."""
    terms = []
    for r in range(1, 21):
        terms += [f"t{r:02d}"] * (1000 // r)
    docs = [(0, "s", " ".join(terms))]
    spark.createDataFrame(
        docs, "doc_id long, source string, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    reg = load_all()
    out = reg["zipf_rank_frequency_fit"][0](spark, str(tmp_path)).collect()[0]
    assert out.n_terms == 20
    xs = [math.log(r) for r in range(1, 21)]
    ys = [math.log(1000 // r) for r in range(1, 21)]
    n = 20
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(out.zipf_slope - slope) < 1e-6
    assert abs(out.zipf_slope - (-1.0)) < 0.02  # near-perfect Zipf corpus
