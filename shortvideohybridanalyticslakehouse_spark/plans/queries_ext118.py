"""Extension queries, round 118: exact Shapley-value attribution
(Shapley 1953; the data-driven attribution model of Google Analytics /
Dalessandro et al. 2012) — completing the attribution family
(time-decay ext86, position-based, interval-join) with the
game-theoretic one.

Game: the four non-conversion channels (click, error, signup, view —
the table's closed enum minus 'purchase') are players. A converted user
contributes their PRE-CONVERSION touched-channel set; the coalition
value v(S) counts converted users whose whole touched set lies inside S
(the coalition can claim a conversion only if it covers every
touchpoint). The Shapley value of channel c is then

    phi_c = sum over S not containing c of
            |S|! (n-|S|-1)! / n! * (v(S u {c}) - v(S))

Exactness: with n=4 there are 16 coalitions; weights are scaled by
n! = 24 so every phi is the exact integer ``phi_x24`` (micro units via
one SQL DIV). Efficiency (sum of phi = v(all channels)) is asserted by
the planted test — the property that distinguishes Shapley from the
heuristic models.

Determinism contract: first-conversion instant = min ts of the user's
purchase events; the touched set is the distinct event types STRICTLY
before it, folded to a bitmask over the sorted channel universe with
bit_or (both engines). Coalition sums are subset-mask joins over the
16-row mask-count table.

Plan shape for 100 TB: the only O(events) work is one groupBy(user) for
the first-purchase instant and one (user, channel-bit) aggregation —
both map-side combinable; everything Shapley collapses to a 16-row
frame joined against itself (broadcast, constant), so channel count —
not event count — bounds the game arithmetic. n=4 is the closed enum;
widening the enum means regenerating the weight row, not a rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.localrel import (
    local_rows_df,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

CHANNELS = ["click", "error", "signup", "view"]  # sorted closed enum
_N = len(CHANNELS)
_FACT = 24  # n!

# w(s) = s! * (n-s-1)! for n=4
_W = {0: 6, 1: 2, 2: 2, 3: 6}

_CH_CASE = " ".join(
    f"WHEN '{c}' THEN {1 << i}" for i, c in enumerate(CHANNELS)
)

_SHAPLEY_ORACLE = f"""
WITH conv AS (
  SELECT user_id, min(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), touched AS (
  SELECT c.user_id,
         CAST(coalesce(bit_or(CASE e.event_type {_CH_CASE} ELSE 0 END), 0)
              AS BIGINT) AS mask
  FROM conv c LEFT JOIN events e
    ON e.user_id = c.user_id AND e.ts < c.first_purchase
  GROUP BY 1
), mc AS (
  SELECT mask, CAST(count(*) AS BIGINT) AS cnt FROM touched GROUP BY 1
), subsets AS (
  SELECT CAST(s AS BIGINT) AS s,
         CAST({" + ".join(f"((s >> {i}) & 1)" for i in range(_N))}
              AS BIGINT) AS sz
  FROM range(0, {1 << _N}) t(s)
), v AS (
  SELECT s, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS val
  FROM subsets LEFT JOIN mc ON (mask & s) = mask
  GROUP BY 1
), wtab AS (
  SELECT * FROM (VALUES {", ".join(f"({s}, {w})" for s, w in _W.items())})
    AS t(sz, w)
), chans AS (
  SELECT * FROM (VALUES {", ".join(
      f"('{c}', {1 << i})" for i, c in enumerate(CHANNELS)
  )}) AS t(channel, bit)
), phi AS (
  SELECT ch.channel,
         CAST(sum(w.w * (vu.val - vs.val)) AS BIGINT) AS phi_x24
  FROM chans ch
  JOIN subsets s ON (s.s & ch.bit) = 0
  JOIN subsets su ON su.s = (s.s | ch.bit)
  JOIN v vs ON vs.s = s.s
  JOIN v vu ON vu.s = su.s
  JOIN wtab w ON w.sz = s.sz
  GROUP BY 1
)
SELECT channel, phi_x24,
       CAST((phi_x24 * 1000000) // {_FACT} AS BIGINT) AS phi_micro,
       (SELECT val FROM v WHERE s = {(1 << _N) - 1}) AS total_conversions
FROM phi
"""


@register("shapley_channel_attribution", _SHAPLEY_ORACLE)
def q_shapley_channel_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact Shapley attribution of conversions to the four touch
    channels: phi scaled by 4! as an exact integer, micro-conversions
    via SQL DIV, and the grand-coalition total for the efficiency
    check."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id"
    ).agg(F.min("ts").alias("first_purchase"))
    bit = F.coalesce(
        *[
            F.when(F.col("event_type") == c, F.lit(1 << i))
            for i, c in enumerate(CHANNELS)
        ],
        F.lit(0),
    )
    touched = (
        conv.join(
            ev.select("user_id", "ts", "event_type"),
            ["user_id"],
            "left",
        )
        .withColumn(
            "chbit",
            F.when(F.col("ts") < F.col("first_purchase"), bit).otherwise(
                F.lit(0)
            ),
        )
        .groupBy("user_id")
        .agg(
            F.coalesce(F.expr("bit_or(chbit)"), F.lit(0))
            .cast("bigint")
            .alias("mask")
        )
    )
    mc = touched.groupBy("mask").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )

    subsets = spark.range(0, 1 << _N).select(
        F.col("id").alias("s"),
        F.expr("CAST(bit_count(id) AS BIGINT)").alias("sz"),
    )
    v = (
        subsets.join(
            F.broadcast(mc),
            (F.col("mask").bitwiseAND(F.col("s")) == F.col("mask")),
            "left",
        )
        .groupBy("s", "sz")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("val"))
    )
    wtab = local_rows_df(
        spark, [(s, w) for s, w in _W.items()], "sz bigint, w bigint"
    )
    chans = local_rows_df(
        spark,
        [(c, 1 << i) for i, c in enumerate(CHANNELS)],
        "channel string, bit bigint",
    )
    vs = v.select(
        F.col("s").alias("s0"), F.col("sz").alias("sz0"), F.col("val")
    )
    vu = v.select(F.col("s").alias("s1"), F.col("val").alias("val_u"))
    phi = (
        chans.join(
            F.broadcast(vs), vs.s0.bitwiseAND(F.col("bit")) == 0
        )
        .join(
            F.broadcast(vu),
            F.col("s1") == vs.s0.bitwiseOR(F.col("bit")),
        )
        .join(F.broadcast(wtab), F.col("sz0") == F.col("sz"))
        .groupBy("channel")
        .agg(
            F.sum(F.col("w") * (F.col("val_u") - F.col("val")))
            .cast("bigint")
            .alias("phi_x24")
        )
    )
    total = v.filter(F.col("s") == (1 << _N) - 1).select(
        F.col("val").alias("total_conversions")
    )
    return (
        phi.crossJoin(F.broadcast(total))
        .withColumn(
            "phi_micro",
            F.expr(f"CAST((phi_x24 * 1000000) DIV {_FACT} AS BIGINT)"),
        )
        .select("channel", "phi_x24", "phi_micro", "total_conversions")
    )
