"""Property-based tests for the distributed primitives: the bucketed
two-phase ranker / prefix sum must agree BIT-FOR-BIT with the
single-partition window forms on arbitrary inputs (including adversarial
tie patterns hypothesis finds and hand fixtures miss), and the z-order
interleave must be a bijection.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.ddl import zorder_value

# small value domain -> dense ties, the hard case for bucketed ranking
vals = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 5)), min_size=1, max_size=60
)


@settings(max_examples=12, deadline=None)
@given(rows=vals, n_buckets=st.sampled_from([1, 2, 4, 64]))
def test_distributed_row_number_matches_window(spark, rows, n_buckets):
    df = spark.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(rows)], "id long, v long, t long"
    )
    got = ranks.with_distributed_row_number(
        df, [], ["v", "t", "id"], n_buckets=n_buckets
    )
    w = Window.orderBy(F.col("v").asc(), F.col("t").asc(), F.col("id").asc())
    want = df.withColumn("_rn", F.row_number().over(w))
    g = {r.id: r._rn for r in got.collect()}
    e = {r.id: r._rn for r in want.collect()}
    assert g == e


@settings(max_examples=12, deadline=None)
@given(rows=vals, n_buckets=st.sampled_from([1, 2, 64]))
def test_distributed_prefix_sum_matches_window(spark, rows, n_buckets):
    df = spark.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(rows)], "id long, v long, amt long"
    )
    got = ranks.with_distributed_prefix_sum(
        df, [], ["v", "id"], "amt", out_col="_cum", n_buckets=n_buckets
    )
    w = (
        Window.orderBy(F.col("v").asc(), F.col("id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    want = df.withColumn("_cum", F.coalesce(F.sum("amt").over(w), F.lit(0)))
    g = {r.id: r._cum for r in got.collect()}
    e = {r.id: r._cum for r in want.collect()}
    assert g == e


def _dezorder(z: int, bits: int) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@settings(max_examples=20, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 1023), st.integers(0, 1023)),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
def test_zorder_bijection(spark, pts):
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "z", zorder_value("x", "y", bits=10)
    )
    for r in df.collect():
        assert _dezorder(r.z, 10) == (r.x, r.y)
