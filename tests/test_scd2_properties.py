"""Property tests for the shared SCD2 band builder (plans/queries_ext54
scd2_bands): structural invariants over randomized change histories.

Invariants for every user:
  1. bands tile the change history: first valid_from = first change ts,
     each valid_to = next valid_from, exactly one open band (last).
  2. NO adjacent bands share a state (consecutive duplicates collapse).
  3. replaying the bands against the raw sequence reproduces the state
     in effect at every change instant.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st


@st.composite
def _histories(draw):
    n_users = draw(st.integers(min_value=1, max_value=4))
    out = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(min_value=1, max_value=12))
        states = draw(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n
            )
        )
        gaps = draw(
            st.lists(
                st.integers(min_value=0, max_value=3), min_size=n, max_size=n
            )
        )
        t = dt.datetime(2026, 9, 1)
        for s, g in zip(states, gaps):
            t = t + dt.timedelta(minutes=1 + g)
            eid += 1
            out.append((u, t, eid, s))
    return out


@settings(max_examples=12, deadline=None)
@given(hist=_histories())
def test_scd2_band_invariants(spark, hist):
    from shortvideohybridanalyticslakehouse_spark.plans.queries_ext54 import (
        scd2_bands,
    )

    df = spark.createDataFrame(
        hist, "user_id long, ts timestamp, event_id long, state string"
    )
    bands = scd2_bands(df).collect()
    by_user: dict = {}
    for r in bands:
        by_user.setdefault(r.user_id, []).append(r)
    raw: dict = {}
    for u, ts, eid, s in hist:
        raw.setdefault(u, []).append((ts, eid, s))

    for u, rows in raw.items():
        rows.sort()
        user_bands = sorted(by_user[u], key=lambda r: r.valid_from)
        # 1. tiling
        assert user_bands[0].valid_from == rows[0][0]
        for a, b in zip(user_bands, user_bands[1:]):
            assert a.valid_to == b.valid_from
        assert user_bands[-1].valid_to is None
        assert all(r.valid_to is not None for r in user_bands[:-1])
        # 2. collapse
        for a, b in zip(user_bands, user_bands[1:]):
            assert a.state != b.state
        # 3. point-in-time replay at every change instant
        for ts, _eid, s_expected in rows:
            covering = [
                b
                for b in user_bands
                if b.valid_from <= ts
                and (b.valid_to is None or ts < b.valid_to)
            ]
            # ties: an instant equal to a band boundary belongs to the
            # newer band; the state recorded at ts must match the raw
            # LATEST state at or before ts
            latest = max(
                (r for r in rows if r[0] <= ts), key=lambda r: (r[0], r[1])
            )[2]
            assert len(covering) == 1
            assert covering[0].state == latest
