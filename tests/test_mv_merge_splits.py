"""Hypothesis property: the generic MV maintainer (streaming/mv.py)
converges to the one-shot batch aggregate for ANY ordered partition of
any row multiset, and replaying the final batch is a no-op — the monoid
claim, checked rather than assumed (the scd2 split-property pattern)."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.streaming.mv import (
    MvSpec,
    counting,
    maxing,
    merge_mv_batch,
    minning,
    read_mv,
    summing,
)

_SCHEMA = "k long, v long"


def _spec():
    return MvSpec(
        key_cols=("k",),
        measures=(
            counting("n"),
            summing(F.col("v"), "s"),
            minning(F.col("v"), "mn"),
            maxing(F.col("v"), "mx"),
        ),
    )


@st.composite
def rows_and_cuts(draw):
    rows = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=5),
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1,
            max_size=24,
        )
    )
    n_cuts = draw(st.integers(min_value=0, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=len(rows)),
                min_size=n_cuts,
                max_size=n_cuts,
            )
        )
    )
    return rows, cuts


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_and_cuts())
def test_any_split_converges_to_batch(spark, tmp_path_factory, data):
    rows, cuts = data
    spec = _spec()
    store = os.path.join(
        str(tmp_path_factory.mktemp("mv_prop")), "store"
    )
    bounds = [0, *cuts, len(rows)]
    batch_id = 0
    for lo, hi in zip(bounds, bounds[1:]):
        merge_mv_batch(
            spark,
            spark.createDataFrame(rows[lo:hi] or [(0, 0)], _SCHEMA).limit(
                hi - lo
            ),
            store,
            batch_id,
            spec,
            n_buckets=4,
        )
        batch_id += 1
    got = sorted(
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in read_mv(spark, store, spec).collect()
    )
    want = sorted(
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in spec.partials(
            spark.createDataFrame(rows, _SCHEMA)
        ).collect()
    )
    assert got == want
    # final-batch replay is a no-op
    lo, hi = bounds[-2], bounds[-1]
    merge_mv_batch(
        spark,
        spark.createDataFrame(rows[lo:hi] or [(0, 0)], _SCHEMA).limit(hi - lo),
        store,
        batch_id - 1,
        spec,
        n_buckets=4,
    )
    again = sorted(
        (r.k, r.n, r.s, r.mn, r.mx)
        for r in read_mv(spark, store, spec).collect()
    )
    assert again == want
