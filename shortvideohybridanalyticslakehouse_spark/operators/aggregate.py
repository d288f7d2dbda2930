"""Aggregation operators (A1-A12, §2.4).

Scale notes: `groupBy(window(...), key)` compiles to partial (map-side)
hash aggregation + one shuffle on (window, key) + final aggregation —
the right plan at any scale. Conditional counts (`count(when(...))`) are
pivot-by-predicate and cost nothing extra over the base agg. Exact
`countDistinct` is a double shuffle; at 100 TB prefer
`approx_count_distinct` (HLL) — both are exposed here.

Reference semantics ported:
- A1/A2 tumbling-window conditional agg: src/spark/rt_content_events_aggregator.py:315-342
- A3 duplicate-key detector: src/scripts/verify_rt_content_events_aggregator.py:189-194
- A4 distinct count: verify_rt_content_events_aggregator.py:210-215
- A6 null-count profile: verify_invalid_cdc_quarantine.py:87-92
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_count(cond: Column) -> Column:
    """A2: ``count(when(cond, 1))`` ≡ ``count_if(cond)``."""
    return F.count(F.when(cond, F.lit(1)))


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    window_duration: str = "1 minute",
    count_conditions: Mapping[str, Column] | None = None,
    sum_exprs: Mapping[str, Column] | None = None,
    dedup_col: str | None = None,
    with_processed_at: bool = False,
    extra_aggs: Mapping[str, Column] | None = None,
) -> DataFrame:
    """A1: event-time tumbling-window hash aggregation.

    Returns grain ``key_cols + window_start + window_end`` with one column per
    entry in ``count_conditions`` (conditional counts) and ``sum_exprs``.
    ``dedup_col`` applies exact pre-agg dedup (batch analog of streaming
    ``dropDuplicates`` after watermark, T2).
    """
    if dedup_col is not None:
        df = df.dropDuplicates([dedup_col])
    aggs: list[Column] = []
    for name, cond in (count_conditions or {}).items():
        aggs.append(conditional_count(cond).alias(name))
    for name, expr in (sum_exprs or {}).items():
        aggs.append(F.sum(expr).alias(name))
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    if with_processed_at:
        aggs.append(F.current_timestamp().alias("processed_at"))
    win = F.window(F.col(ts_col), window_duration)
    out = df.groupBy(win.alias("w"), *[F.col(k) for k in key_cols]).agg(*aggs)
    return out.select(
        *key_cols,
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *[c for c in out.columns if c not in ("w", *key_cols)],
    )


def duplicate_key_groups(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """A3: keys occurring more than once (grain-uniqueness verifier)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def null_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A6: one-row null-count profile over ``cols`` (+ total row count)."""
    aggs = [F.count(F.lit(1)).alias("row_count")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"null_{c}")
        for c in cols
    ]
    return df.agg(*aggs)


def distinct_count(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A4: exact or HLL distinct count. At 100 TB use ``approx=True``."""
    fn = F.approx_count_distinct if approx else F.countDistinct
    return df.agg(fn(F.col(col)).alias(f"distinct_{col}"))


def minmax_snapshot(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5: one-row global min/max snapshot used by freshness verifiers."""
    aggs: list[Column] = []
    for c in cols:
        aggs.append(F.min(F.col(c)).alias(f"min_{c}"))
        aggs.append(F.max(F.col(c)).alias(f"max_{c}"))
    return df.agg(*aggs)


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[float],
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """A10/A11: exact interpolated percentiles (matches SQL percentile_cont).

    Exact percentile needs a sort per group — fine for baseline publishing
    (bounded output). For 100 TB online paths use ``approx_percentiles``.
    """
    aggs = [
        F.expr(f"percentile({value_col}, {p})").alias(f"p{round(p * 100)}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)


def approx_percentiles(
    df: DataFrame,
    value_col: str,
    percentiles: Sequence[float],
    accuracy: int = 10000,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """Scale path: single-pass mergeable sketch (percentile_approx)."""
    aggs = [
        F.percentile_approx(F.col(value_col), p, accuracy).alias(f"p{round(p * 100)}")
        for p in percentiles
    ]
    return df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
