"""Skew mitigation: salted joins and two-phase salted aggregation.

At 100 TB a handful of hot keys (one viral video, one bot user) can pin a
whole stage on one task. Two standard levers, both pure DataFrame ops:

- ``salted_join``: replicate the small side across N salt buckets and give
  every big-side row one deterministic salt — the hot key's rows spread
  over N tasks instead of one. Use when AQE skew-join splitting (enabled in
  session.py) isn't available or the build side fits broadcast anyway.
- ``two_phase_agg``: pre-aggregate on (key, salt) then finish on key —
  bounds any single task's group size for algebraic aggregates. (Spark's
  map-side partial aggregation already does this per input partition; the
  explicit form helps when the skew survives into the shuffle, e.g. after
  an explode.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, buckets).

    monotonically_increasing_id embeds the partition id in its high bits,
    so the modulus spreads rows of any single key across buckets evenly
    regardless of input clustering.
    """
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(buckets)).cast("int"),
    )


def replicate_for_salt(
    df: DataFrame, buckets: int, salt_col: str = "_salt"
) -> DataFrame:
    """Replicate every row once per salt bucket (build side of a salted join)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    buckets: int = 16,
) -> DataFrame:
    """Join a skew-prone big side to a small side, spreading hot keys.

    The small side is replicated ``buckets``x (only viable when it is
    genuinely small); each big row carries exactly one salt, so join
    multiplicity — and therefore result — is identical to the plain join
    for inner/left joins on equi-keys.
    """
    salted_big = with_salt(big, buckets)
    salted_small = replicate_for_salt(small, buckets)
    return salted_big.join(salted_small, [*on, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Salted two-phase aggregation for algebraic aggregates.

    ``partial_aggs`` run per (key, salt); ``final_aggs`` combine the
    partials per key (e.g. partial sum -> final sum, partial count ->
    final sum). No single task ever holds a full hot key.
    """
    partial = with_salt(df, buckets).groupBy(*key_cols, "_salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[c.alias(n) for n, c in final_aggs.items()]
    )
