"""Extension queries, round 68: AMS (Alon-Matias-Szegedy) F2 sketch —
the second-frequency-moment estimator, i.e. the SELF-JOIN SIZE a query
optimizer wants before picking a join strategy. Completes the classic
sketch family (HLL = F0, CMS = point frequencies, KMV = set overlap,
Bloom = membership, AMS = F2).

Hash-exact design like its siblings: each of the 8 estimators assigns
every key a +-1 sign from an affine hash's parity (pure integer
arithmetic), accumulates S_j = sum over EVENTS of sign_j(user_id) (no
per-key pre-aggregation needed — the event-level sum already weights
each key by its frequency), and estimates F2 as the LOWER MEDIAN of the
S_j^2 values — integers end to end, replayed row-for-row by the SQL
oracle. The exact F2 (computed alongside for calibration) is one
combinable per-key count + sum of squares.

Scale: the sketch pass is a map-side explode (8 rows per event) into an
8-row partial aggregate — one tiny shuffle regardless of input size;
the estimators are mergeable across partitions/streams by addition
(the property that makes AMS a streaming sketch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_P = 1_000_000_007
_A = [1_103_515_245, 214_013, 69_069, 134_775_813, 22_695_477, 65_793, 8_121, 4_096_001]
_B = [12_345, 2_531_011, 362_437, 1, 1_013_904_223, 28_411, 66_719, 150_889]

_A_SQL = "[" + ", ".join(str(a) for a in _A) + "]"
_B_SQL = "[" + ", ".join(str(b) for b in _B) + "]"

_AMS_ORACLE = rf"""
WITH signs AS (
  SELECT CAST(u.j AS INT) AS j,
         CAST(sum(1 - 2 * ((({_A_SQL}[CAST(u.j AS INT) + 1] * (user_id % {_P})
                 + {_B_SQL}[CAST(u.j AS INT) + 1]) % {_P}) % 2)) AS BIGINT) AS s
  FROM events, unnest(range(8)) AS u(j)
  GROUP BY 1
), ests AS (
  SELECT s * s AS est,
         row_number() OVER (ORDER BY s * s, j) AS rn
  FROM signs
), exact AS (
  SELECT CAST(sum(f * f) AS BIGINT) AS f2
  FROM (SELECT CAST(count(*) AS BIGINT) AS f FROM events GROUP BY user_id)
)
SELECT e.f2 AS f2_exact,
       CAST(m.est AS BIGINT) AS f2_estimate,
       CAST(floor(CAST(abs(m.est - e.f2) AS DOUBLE) * 1000000
            / CAST(e.f2 AS DOUBLE)) AS BIGINT) AS rel_err_micro
FROM exact e CROSS JOIN (SELECT est FROM ests WHERE rn = 4) m
"""


@register("f2_join_size_estimate", _AMS_ORACLE)
def q_f2_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join size of events on user_id: exact F2 next to the AMS
    8-estimator lower-median estimate and its relative error — the
    cardinality statistic a distributed optimizer consults before
    choosing shuffle-vs-broadcast for a skewed self-join."""
    ev = load_table(spark, sf_dir, "events")
    a_arr = F.array(*[F.lit(a) for a in _A])
    b_arr = F.array(*[F.lit(b) for b in _B])
    exploded = ev.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(7)),
                lambda j: F.lit(1)
                - 2
                * (
                    (
                        (
                            F.element_at(a_arr, j + 1)
                            * (F.col("user_id") % _P)
                            + F.element_at(b_arr, j + 1)
                        )
                        % _P
                    )
                    % 2
                ),
            )
        ).alias("j", "sgn")
    )
    signs = exploded.groupBy("j").agg(F.sum("sgn").cast("bigint").alias("s"))
    ests = signs.select(
        "j", (F.col("s") * F.col("s")).alias("est")
    )
    # lower median of 8 = the 4th in (est, j) order — an O(8) frame;
    # TakeOrderedAndProject, no window
    med = ests.orderBy(F.col("est").asc(), F.col("j").asc()).limit(4).orderBy(
        F.col("est").desc(), F.col("j").desc()
    ).limit(1)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
        .agg(F.sum(F.col("f") * F.col("f")).cast("bigint").alias("f2"))
    )
    return exact.crossJoin(F.broadcast(med)).select(
        F.col("f2").alias("f2_exact"),
        F.col("est").cast("bigint").alias("f2_estimate"),
        F.floor(
            F.abs(F.col("est") - F.col("f2")).cast("double")
            * 1000000
            / F.col("f2").cast("double")
        )
        .cast("bigint")
        .alias("rel_err_micro"),
    )
