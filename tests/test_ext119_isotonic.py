"""Isotonic hourly fit (ext119): hand-pooled planted case plus a
pure-Python PAVA cross-check (the minimax closed form and PAVA must
agree — same unique projection onto the monotone cone)."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def pava(points: list[tuple[int, int]]) -> list[float]:
    """Weighted PAVA over (cents_sum, count) blocks; returns per-input
    fitted means (cents), each a single exact-int division."""
    blocks = []  # [cents, n, width]
    for cents, n in points:
        blocks.append([cents, n, 1])
        while len(blocks) > 1:
            c2, n2, w2 = blocks[-1]
            c1, n1, w1 = blocks[-2]
            # violation: mean(prev) > mean(last), exact cross-multiply
            if c1 * n2 > c2 * n1:
                blocks[-2:] = [[c1 + c2, n1 + n2, w1 + w2]]
            else:
                break
    out = []
    for c, n, w in blocks:
        out.extend([c / n] * w)
    return out


def _write_events(spark, tmp_path, hour_values: dict[int, list[float]]):
    base = dt.datetime(2026, 4, 1, 0, 0, 0)
    rows = []
    eid = 0
    for hod, vals in hour_values.items():
        for v in vals:
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=hod, seconds=eid % 60),
                    1,
                    "view",
                    v,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_isotonic_pools_violators(spark, tmp_path):
    """Raw means [1, 3, 2, 4] -> PAVA pools hours 1 and 2 -> fit
    [1, 2.5, 2.5, 4]."""
    _write_events(
        spark, tmp_path, {0: [1.0], 1: [3.0], 2: [2.0], 3: [4.0]}
    )
    reg = load_all()
    out = {
        r.hod: r
        for r in reg["isotonic_hourly_value_fit"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert [out[h].raw_mean for h in range(4)] == [1.0, 3.0, 2.0, 4.0]
    assert [out[h].iso_fit for h in range(4)] == [1.0, 2.5, 2.5, 4.0]


def test_isotonic_matches_pava_weighted(spark, tmp_path):
    """A 10-hour series with unequal weights and multiple violation
    runs: the query's minimax fit equals pure-Python weighted PAVA."""
    series = {
        0: [5.0, 7.0],         # mean 6
        1: [2.0],              # violates
        2: [2.0, 4.0, 6.0],    # mean 4
        3: [10.0],
        4: [1.0, 1.0],         # deep violation
        5: [8.0],
        6: [3.0, 5.0],
        7: [20.0],
        8: [6.0],
        9: [30.0, 10.0],
    }
    _write_events(spark, tmp_path, series)
    reg = load_all()
    out = {
        r.hod: r
        for r in reg["isotonic_hourly_value_fit"][0](
            spark, str(tmp_path)
        ).collect()
    }
    pts = [
        (int(sum(v) * 100), len(v)) for _, v in sorted(series.items())
    ]
    expected = pava(pts)
    got = [out[h].iso_fit for h in range(10)]
    assert got == [round(c / 100, 6) for c in expected], (got, expected)
    # fit is monotone non-decreasing
    assert all(a <= b for a, b in zip(got, got[1:]))
