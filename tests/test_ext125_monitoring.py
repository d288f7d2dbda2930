"""Page-Hinkley drift + Kish design effect (ext125): planted mean-shift
alarm via a pure-python replay of the integer fold, and exact design
effects for equal vs skewed weights."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext125 import (
    PH_DELTA_MICRO,
    PH_LAMBDA_MICRO,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def ph_reference(xs: list[int]):
    n = s = m = 0
    mn = 0
    alarm = -1
    for x in xs:
        n += 1
        s += x
        m += x * 1_000_000 - (s * 1_000_000) // n - PH_DELTA_MICRO
        mn = min(mn, m)
        if alarm < 0 and m - mn > PH_LAMBDA_MICRO:
            alarm = n
    return m, mn, alarm


def _write_daily_events(spark, tmp_path, counts_by_type):
    base = dt.datetime(2026, 9, 1, 12, 0, 0)
    rows = []
    eid = 0
    for etype, counts in counts_by_type.items():
        for day, c in enumerate(counts):
            for k in range(c):
                eid += 1
                rows.append(
                    (eid, base + dt.timedelta(days=day, seconds=k), 1,
                     etype, 1.0, "{}")
                )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_page_hinkley_planted_shift(spark, tmp_path):
    shifted = [5] * 10 + [50] * 10   # hard level shift at day 11
    stable = [7] * 20                # no drift
    _write_daily_events(
        spark, tmp_path, {"click": shifted, "view": stable}
    )
    reg = load_all()
    out = {
        r.event_type: r
        for r in reg["page_hinkley_daily_drift"][0](
            spark, str(tmp_path)
        ).collect()
    }
    m, mn, alarm = ph_reference(shifted)
    assert out["click"].drift_detected
    assert out["click"].alarm_day_idx == alarm
    assert 11 <= alarm <= 13  # fires shortly after the shift
    assert out["click"].ph_m_micro == m
    assert out["click"].ph_min_micro == mn
    assert not out["view"].drift_detected
    assert out["view"].alarm_day_idx is None


def test_kish_design_effect_planted_weights(spark, tmp_path):
    """Source 'eq': 4 docs of 5 tokens -> deff exactly 1, ESS = 4.
    Source 'skew': weights 1,1,1,9 -> deff = 4*84/144 = 2.3333, ESS =
    144//84 = 1."""
    docs = (
        [(i, "a b c d e", "en", "eq", 9) for i in range(4)]
        + [(10, "a", "en", "skew", 1), (11, "b", "en", "skew", 1),
           (12, "c", "en", "skew", 1),
           (13, " ".join("w%d" % j for j in range(9)), "en", "skew", 20)]
    )
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    reg = load_all()
    out = {
        r.source: r
        for r in reg["kish_design_effect"][0](spark, str(tmp_path)).collect()
    }
    assert out["eq"].deff_micro == 1_000_000
    assert out["eq"].effective_sample_size == 4
    assert out["skew"].deff_micro == (4 * 84 * 1_000_000) // (12 * 12)
    assert out["skew"].effective_sample_size == (12 * 12) // 84
