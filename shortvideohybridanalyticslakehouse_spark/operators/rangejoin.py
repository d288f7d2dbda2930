"""Binned range join: the scale-out strategy for PURE range predicates.

Spark has no native range-join optimization: a join whose ONLY predicate
is `left.ts BETWEEN right.start AND right.end` has no equi key, so
Catalyst falls back to BroadcastNestedLoopJoin (or worse) — O(|L| * |R|)
comparisons. The standard fix (what Databricks' range-join hints and
every time-series engine do under the hood) is BINNING: quantize time
into fixed-width bins, explode each interval into the bins it covers,
tag each left row with its bin, equi-join on the bin, and re-apply the
exact range predicate as a residual filter. The join becomes a shuffle
on bin keys — O(|L| + sum(interval_span/bin)) rows through the
exchange, embarrassingly partitionable, with bin width as the knob
balancing explode factor vs candidate-pair count.

The repo's interval joins so far (attribution_interval_join, SCD2 PIT)
ride an equi user key with the range as residual; this operator covers
the remaining case — intervals with NO shared key (maintenance windows,
promo periods, incident spans) — without a nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def binned_interval_join(
    left: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bin_seconds: int = 300,
) -> DataFrame:
    """Rows of `left` joined to every interval (half-open [start, end))
    containing their `ts_col`, via bin equi-join + exact residual.

    Correctness: an event in bin b can only match intervals that cover
    some instant of bin b, and every such interval emits a row for bin b
    — so the candidate set is complete; the residual filter makes it
    exact; an event matches a given interval through EXACTLY ONE bin
    (its own), so no dedup is needed.
    """
    # integer DIV, not `/`: float division + cast truncation can
    # mis-floor at exact multiples; DIV is exact on longs
    l = left.withColumn(
        "_bin", F.expr(f"CAST({ts_col} AS LONG) DIV {bin_seconds}")
    )
    ibins = F.sequence(
        F.expr(f"CAST({start_col} AS LONG) DIV {bin_seconds}"),
        F.expr(f"(CAST({end_col} AS LONG) - 1) DIV {bin_seconds}"),
    )
    r = intervals.withColumn("_bin", F.explode(ibins))
    return l.join(r, "_bin").where(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    ).drop("_bin")
