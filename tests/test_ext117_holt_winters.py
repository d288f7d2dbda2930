"""Holt-Winters seasonal fold (ext117): pure-Python replay equality and
the seasonal-advantage sanity check against plain Holt (ext81)."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all

_M = 24


def hw_reference(series: list[tuple[int, float]]):
    """(hod, x) pairs in time order -> final state + MAE, replaying the
    exact recurrence the query pins (round-12 per write, zero-start
    seasonals)."""
    (h0, x0), rest = series[0], series[1:]
    level, b = x0, 0.0
    s = [0.0] * _M
    err_sum, n = 0.0, 0
    for hod, x in rest:
        i = hod
        err_sum += abs(x - (level + b + s[i]))
        n += 1
        new_l = round(0.5 * (x - s[i]) + 0.5 * (level + b), 12)
        new_b = round(0.25 * (new_l - level) + 0.75 * b, 12)
        s[i] = round(0.25 * (x - new_l) + 0.75 * s[i], 12)
        level = new_l
        b = new_b
    hod_next = (series[-1][0] + 1) % _M
    return {
        "level_final": round(level, 6),
        "trend_final": round(b, 6),
        "season_next": round(s[hod_next], 6),
        "forecast_next": round(level + b + s[hod_next], 6),
        "mae_one_step": round(err_sum / n, 6) if n else None,
    }


def _write_events(spark, tmp_path, counts: list[int]):
    """counts[i] events in hour i of a contiguous hourly series starting
    2026-01-05 00:00."""
    base = dt.datetime(2026, 1, 5, 0, 0, 0)
    rows = []
    eid = 0
    for i, c in enumerate(counts):
        for k in range(c):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=i, seconds=k + 1),
                    7,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_hw_matches_python_replay(spark, tmp_path):
    # 3 days of a period-24 sawtooth plus drift: hod varies 0..23
    counts = [1 + (i % _M) // 4 + i // 48 for i in range(72)]
    _write_events(spark, tmp_path, counts)
    reg = load_all()
    out = reg["event_type_holt_winters"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    exp = hw_reference([(i % _M, float(c)) for i, c in enumerate(counts)])
    assert r.n_hours == 72
    for k, v in exp.items():
        assert r[k] == v, (k, r[k], v)


def test_hw_beats_holt_on_periodic_series(spark, tmp_path):
    """On a strongly periodic series the seasonal model's in-sample
    one-step MAE must undercut trend-only Holt."""
    counts = [(1 if (i % _M) < 12 else 9) for i in range(_M * 5)]
    _write_events(spark, tmp_path, counts)
    reg = load_all()
    hw = reg["event_type_holt_winters"][0](spark, str(tmp_path)).collect()[0]
    holt = reg["event_type_holt_forecast"][0](spark, str(tmp_path)).collect()[
        0
    ]
    assert hw.mae_one_step < holt.mae_one_step, (
        hw.mae_one_step,
        holt.mae_one_step,
    )
