"""Extension queries, round 87: Population Stability Index — the ML
monitoring drift score (sum over bins of (p - q) * ln(p / q)) between
two event populations' value distributions, completing the drift family
beside ext67's total-variation distance.

Determinism ladder: values quantize to exact cents (the money.py
DECIMAL hop); bins are 10 equal-width cent intervals anchored on the
REFERENCE population's exact [min, max] (integer arithmetic; the last
bin absorbs the max); per-bin counts are exact ints, Laplace-smoothed as
(c + 1) / (n + 10) so empty bins never produce ln(0); the 10 PSI terms
fold in bin order through an ORDERED array aggregate (the EWMA recipe),
so both engines sum identical doubles in identical order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_REF = "view"
_CUR = "click"
_BINS = 10

_PSI_ORACLE = f"""
WITH vals AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM events WHERE event_type IN ('{_REF}', '{_CUR}')
), anchor AS (
  SELECT MIN(cents) AS lo, MAX(cents) AS hi
  FROM vals WHERE event_type = '{_REF}'
), binned AS (
  SELECT v.event_type,
         LEAST({_BINS} - 1, GREATEST(0,
           CAST(({_BINS} * (v.cents - a.lo)) // (a.hi - a.lo + 1) AS BIGINT)
         )) AS bin
  FROM vals v CROSS JOIN anchor a
), counts AS (
  SELECT bin,
         CAST(SUM(CASE WHEN event_type = '{_REF}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_ref,
         CAST(SUM(CASE WHEN event_type = '{_CUR}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c_cur
  FROM binned GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
         CAST(SUM(c_cur) AS BIGINT) AS n_cur
  FROM counts
), full_bins AS (
  SELECT b.b AS bin,
         coalesce(c.c_ref, 0) AS c_ref,
         coalesce(c.c_cur, 0) AS c_cur
  FROM range(0, {_BINS}) AS b(b) LEFT JOIN counts c ON c.bin = b.b
), terms AS (
  SELECT list(
           (CAST(c_ref + 1 AS DOUBLE) / (n_ref + {_BINS})
            - CAST(c_cur + 1 AS DOUBLE) / (n_cur + {_BINS}))
           * ln((CAST(c_ref + 1 AS DOUBLE) / (n_ref + {_BINS}))
                / (CAST(c_cur + 1 AS DOUBLE) / (n_cur + {_BINS})))
           ORDER BY bin) AS ts,
         MAX(n_ref) AS n_ref, MAX(n_cur) AS n_cur
  FROM full_bins CROSS JOIN tot
)
SELECT n_ref, n_cur,
       round(list_reduce(ts, (a, b) -> a + b), 6) AS psi
FROM terms
"""


def psi_values(ev: DataFrame) -> DataFrame:
    """Project the two populations to exact cents (shared by batch query
    and the streaming drift twin)."""
    return ev.filter(F.col("event_type").isin(_REF, _CUR)).select(
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )


def psi_bin_counts(vals: DataFrame, anchor: DataFrame) -> DataFrame:
    """Reference-anchored equal-width binning -> per-bin (c_ref, c_cur)
    counts. ADDITIVE across any partition of the input (plain integer
    sums), which is what makes the streaming twin a trivial merge.
    ``anchor`` is a 1-row (lo, hi) frame — data-derived in batch, a
    frozen baseline in streaming."""
    binned = vals.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.expr(
                    f"CAST({_BINS} * (cents - lo) DIV (hi - lo + 1) AS BIGINT)"
                ),
            ),
        ).alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.sum(F.when(F.col("event_type") == _REF, 1).otherwise(0))
        .cast("bigint")
        .alias("c_ref"),
        F.sum(F.when(F.col("event_type") == _CUR, 1).otherwise(0))
        .cast("bigint")
        .alias("c_cur"),
    )


@register("value_distribution_psi", _PSI_ORACLE)
def q_value_distribution_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI between the reference (view) and current (click) value
    distributions over 10 reference-anchored equal-width cent bins,
    Laplace smoothed, summed through an ordered fold."""
    ev = load_table(spark, sf_dir, "events")
    vals = psi_values(ev)
    anchor = vals.filter(F.col("event_type") == _REF).agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    counts = psi_bin_counts(vals, anchor)
    return psi_report(counts)


def psi_report(counts: DataFrame) -> DataFrame:
    """(bin, c_ref, c_cur) -> the (n_ref, n_cur, psi) report: zero-fill
    missing bins, Laplace smooth, ordered fold (shared batch/stream)."""
    # pack the tiny bin frame, zero-fill the missing bins, fold in order
    packed = counts.agg(
        F.sum("c_ref").alias("n_ref"),
        F.sum("c_cur").alias("n_cur"),
        F.array_sort(
            F.collect_list(F.struct("bin", "c_ref", "c_cur"))
        ).alias("arr"),
    )

    def term(c_ref, c_cur, n_ref, n_cur):
        p = (c_ref + 1).cast("double") / (n_ref + _BINS)
        q = (c_cur + 1).cast("double") / (n_cur + _BINS)
        return (p - q) * F.log(p / q)

    full = F.transform(
        F.sequence(F.lit(0), F.lit(_BINS - 1)),
        lambda b: F.struct(
            F.coalesce(
                F.element_at(
                    F.filter(F.col("arr"), lambda s: s["bin"] == b), 1
                )["c_ref"],
                F.lit(0).cast("bigint"),
            ).alias("c_ref"),
            F.coalesce(
                F.element_at(
                    F.filter(F.col("arr"), lambda s: s["bin"] == b), 1
                )["c_cur"],
                F.lit(0).cast("bigint"),
            ).alias("c_cur"),
        ),
    )
    psi = F.round(
        F.aggregate(
            full,
            F.lit(0.0),
            lambda acc, s: acc
            + term(s["c_ref"], s["c_cur"], F.col("n_ref"), F.col("n_cur")),
        ),
        6,
    )
    return packed.select("n_ref", "n_cur", psi.alias("psi"))
