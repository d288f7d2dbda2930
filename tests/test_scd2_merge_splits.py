"""SCD2 incremental merge under ARBITRARY batch splits: for any ordered
partition of a change history into micro-batches, sequentially merging
them through streaming/scd2.merge_scd2_batch must converge to exactly
the batch builder's bands. Generalizes the fixed 4-file streaming test
to randomized splits (the merge function is the unit under test here;
the Structured Streaming transport is covered by
test_stream_scd2_bands)."""

from __future__ import annotations

import datetime as dt
import os

from hypothesis import given, settings, strategies as st

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext54 import scd2_bands
from shortvideohybridanalyticslakehouse_spark.streaming.scd2 import (
    merge_scd2_batch,
)

_SCHEMA = "user_id long, ts timestamp, event_id long, state string"


@st.composite
def _history_and_splits(draw):
    n = draw(st.integers(min_value=2, max_value=14))
    rows = []
    t = dt.datetime(2026, 11, 1)
    for eid in range(n):
        u = draw(st.integers(min_value=1, max_value=2))
        t = t + dt.timedelta(minutes=draw(st.integers(1, 3)))
        s = draw(st.sampled_from(["a", "b", "c"]))
        rows.append((u, t, 100 + eid, s))
    n_cuts = draw(st.integers(min_value=0, max_value=min(3, n - 1)))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=1, max_value=n - 1),
                min_size=n_cuts,
                max_size=n_cuts,
                unique=True,
            )
        )
    )
    return rows, cuts


def _canon(rows):
    return sorted(
        (r.user_id, r.state, str(r.valid_from), str(r.valid_to))
        for r in rows
    )


@settings(max_examples=8, deadline=None)
@given(hs=_history_and_splits())
def test_any_split_converges_to_batch_bands(spark, tmp_path_factory, hs):
    rows, cuts = hs
    table = os.path.join(
        str(tmp_path_factory.mktemp("scd2_splits")), "bands"
    )
    bounds = [0, *cuts, len(rows)]
    for bid, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
        batch = spark.createDataFrame(rows[lo:hi], _SCHEMA)
        merge_scd2_batch(spark, batch, table, bid)
    got = _canon(spark.read.parquet(table).collect())
    want = _canon(
        scd2_bands(spark.createDataFrame(rows, _SCHEMA)).collect()
    )
    assert got == want
    # replaying the LAST batch must be a no-op (marker committed with data)
    last = spark.createDataFrame(rows[bounds[-2] :], _SCHEMA)
    merge_scd2_batch(spark, last, table, len(bounds) - 2)
    assert _canon(spark.read.parquet(table).collect()) == want
