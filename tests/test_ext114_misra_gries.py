"""Misra-Gries heavy hitters (ext114): the published guarantee, the
fold rule itself, and the Spark pipeline against a pure-Python replay.

Guarantee (Misra & Gries 1982, k counters over n items):
  * retained estimates never exceed the true count;
  * every estimate undercounts by at most n/(k+1);
  * any item with true frequency > n/(k+1) is retained.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext114 import MG_K
from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def mg_reference(seq: list[int], k: int = MG_K) -> tuple[list[int], list[int]]:
    """Pure-Python replay of the exact fold rule the query emits for
    both engines (match any slot / insert first zero slot / decrement
    all)."""
    items = [-1] * k
    cnts = [0] * k
    for u in seq:
        if u in items:
            cnts[items.index(u)] += 1
        else:
            empty = next((j for j in range(k) if cnts[j] == 0), None)
            if empty is not None:
                items[empty] = u
                cnts[empty] = 1
            else:
                cnts = [c - 1 for c in cnts]
    return items, cnts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=400)
)
def test_mg_guarantee_property(seq):
    items, cnts = mg_reference(seq)
    n = len(seq)
    slack = n / (MG_K + 1)
    true = {u: seq.count(u) for u in set(seq)}
    est = {items[j]: cnts[j] for j in range(MG_K) if cnts[j] > 0}
    # estimates never exceed truth and undercount by at most n/(k+1)
    for item, c in est.items():
        assert c <= true[item]
        assert true[item] - c <= slack
    # every sufficiently heavy item is retained
    for item, t in true.items():
        if t > slack:
            assert item in est, (item, t, slack, est)


def test_mg_spark_matches_reference_on_planted_stream(spark, tmp_path):
    """A planted stream with one true heavy hitter (freq > n/(k+1)):
    the Spark fold equals the pure-Python replay slot-for-slot and the
    heavy hitter survives with a lower-bound count."""
    # 40 events in one day: user 7 appears 20x (> 40/5), filler users 1x
    seq = []
    for i in range(20):
        seq.append(7)
        seq.append(100 + i)
    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = [
        (i, base + dt.timedelta(seconds=i), u, "view", 1.0, "{}")
        for i, u in enumerate(seq)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = reg["misra_gries_daily_users"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    got_items = [r[f"item_{j}"] for j in range(MG_K)]
    got_cnts = [r[f"cnt_{j}"] for j in range(MG_K)]
    exp_items, exp_cnts = mg_reference(seq)
    assert got_items == exp_items
    assert got_cnts == exp_cnts
    est = {got_items[j]: got_cnts[j] for j in range(MG_K) if got_cnts[j] > 0}
    assert 7 in est
    assert est[7] <= 20
    assert 20 - est[7] <= len(seq) / (MG_K + 1)
