"""Property-based tests (hypothesis): the pure-Python decision mirror must
agree with the Spark CASE chain on arbitrary metric values, including the
null/boundary cases the reference hand-enumerates.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C
from shortvideohybridanalyticslakehouse_spark.operators.decision import (
    decide_row,
    with_decision,
    with_flags,
)

metric = st.one_of(
    st.none(),
    st.floats(min_value=0.0, max_value=1000.0, allow_nan=False),
    # boundary magnets: exact threshold values
    st.sampled_from(
        [
            C.VELOCITY_P90_THRESHOLD,
            C.IMPRESSIONS_P40_THRESHOLD,
            C.QUALITY_MIN_COMPLETION,
            C.QUALITY_MAX_SKIP,
            C.QUALITY_MIN_PLAY_START,
            C.CANDIDATE_MIN_IMPRESSIONS,
            C.RESCUE_MAX_UPLOAD_AGE_MINUTES,
        ]
    ),
)


@settings(max_examples=30, deadline=None)
@given(
    rows=st.lists(
        st.tuples(metric, metric, metric, metric, metric, metric),
        min_size=1,
        max_size=20,
    )
)
def test_spark_decision_matches_python_mirror(spark, rows):
    df = spark.createDataFrame(
        [
            (float(v) if v is not None else None,
             float(i) if i is not None else None,
             float(c) if c is not None else None,
             float(s) if s is not None else None,
             float(p) if p is not None else None,
             float(a) if a is not None else None)
            for (v, i, c, s, p, a) in rows
        ],
        "velocity_30m double, impressions_30m double, completion_30m double, "
        "skip_30m double, play_start_30m double, upload_age_minutes double",
    )
    flagged = with_flags(
        df,
        velocity_p90=F.lit(C.VELOCITY_P90_THRESHOLD),
        impressions_p40=F.lit(C.IMPRESSIONS_P40_THRESHOLD),
    )
    decided = with_decision(flagged)
    got = [r.decision_type for r in decided.collect()]
    want = [decide_row(*row) for row in rows]
    assert got == want


@settings(max_examples=30, deadline=None)
@given(
    v=metric, i=metric, c=metric, s=metric, p=metric, a=metric
)
def test_mirror_total_and_in_domain(v, i, c, s, p, a):
    d = decide_row(v, i, c, s, p, a)
    assert d in {
        C.DECISION_BOOST,
        C.DECISION_REVIEW,
        C.DECISION_RESCUE,
        C.DECISION_NO_ACTION,
    }
    # conservative-fallback law: any missing candidate input forbids
    # BOOST/REVIEW (null-safe flags must collapse to False)
    if v is None or i is None:
        assert d in {C.DECISION_RESCUE, C.DECISION_NO_ACTION}
    # quality inputs missing -> never BOOST or RESCUE
    if c is None or s is None or p is None:
        assert d in {C.DECISION_REVIEW, C.DECISION_NO_ACTION}
