"""Rolling RANGE-frame window sums (W1, §2.5).

The reference expresses this in Trino as
``SUM(x) OVER (PARTITION BY video_id ORDER BY window_start
RANGE BETWEEN INTERVAL '29' MINUTE PRECEDING AND CURRENT ROW)``
(ref: src/trino/rt_video_metrics_serving.sql:13-25). Spark range frames
require a numeric ORDER BY, so we order by epoch seconds and use
``rangeBetween(-(minutes-1)*60, 0)`` — inclusive on both ends, identical
frame semantics for minute-aligned rows.

Scale: a window over PARTITION BY key shuffles once on the key and sorts
within partitions — the same cost profile as the Trino plan. Skewed keys
(one video with millions of minutes) are bounded here because the input is
a per-(key, minute) aggregate: partition size ≤ minutes of retention.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_sums(
    df: DataFrame,
    partition_cols: Sequence[str],
    ts_col: str,
    sum_cols: Sequence[str],
    minutes: int = 30,
    max_cols: Sequence[str] = (),
    suffix: str | None = None,
) -> DataFrame:
    """Append rolling sums (and optional maxes) over the trailing window.

    Frame: ``[ts - (minutes-1)*60 s, ts]`` inclusive — a row at minute M
    covers minutes (M-29..M) for the default 30-minute window, matching the
    reference's INTERVAL '29' MINUTE PRECEDING.
    """
    suffix = f"_{minutes}m" if suffix is None else suffix
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(F.col(ts_col).cast("long"))
        .rangeBetween(-(minutes - 1) * 60, 0)
    )
    # one select => ONE Window node (and one sort); sequential withColumn
    # can leave N Window+Sort pairs in the physical plan
    new_cols = [F.sum(F.col(c)).over(w).alias(f"{c}{suffix}") for c in sum_cols]
    new_cols += [F.max(F.col(c)).over(w).alias(f"max_{c}{suffix}") for c in max_cols]
    return df.select("*", *new_cols)
