"""Extension queries, round 101: model-evaluation surfaces — ranking
quality (NDCG@10 over the BM25 lane), probability calibration
(reliability bins + ECE, fully integer), and the Johnson-Lindenstrauss
projection distortion audit.

Determinism notes: NDCG folds its 10 gain terms in RANK order (the
ext63 array-fold contract) so the float sum sequence is identical in
both engines; calibration is pure integers (scores are milli-units by
construction, ECE via cross-multiplied rationals); JL distortion folds
projections in index order and rounds per vector before any grouping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.functions.similarity import plane_signs
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext50 import (
    _BM25_ORACLE,
    q_bm25_topk,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# NDCG@10 of the BM25 ranking, graded relevance = n_terms_hit (0..3).
# Ideal = the same retrieved 10 re-sorted by (rel DESC, doc ASC): this is
# the ORDERING-quality variant of NDCG (recall quality is the ANN/recall
# floor tests' job). Gains fold in rank order; per-step round-12.
# ---------------------------------------------------------------------------

_NDCG_ORACLE = f"""
WITH base AS ({_BM25_ORACLE}
), gains AS (
  SELECT query_id,
         list(CAST(power(2, n_terms_hit) - 1 AS DOUBLE)
              ORDER BY rank) AS g,
         list(CAST(power(2, n_terms_hit) - 1 AS DOUBLE)
              ORDER BY n_terms_hit DESC, doc_id ASC) AS gi
  FROM base GROUP BY 1
), folded AS (
  SELECT query_id,
         list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
           list_transform(range(1, len(g) + 1),
             i -> g[i] / ln(CAST(i + 1 AS DOUBLE)))),
           (a, b) -> round(a + b, 12)) AS dcg,
         list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
           list_transform(range(1, len(gi) + 1),
             i -> gi[i] / ln(CAST(i + 1 AS DOUBLE)))),
           (a, b) -> round(a + b, 12)) AS idcg
  FROM gains
)
SELECT query_id, round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
       round(dcg / idcg, 6) AS ndcg_at_10
FROM folded ORDER BY query_id
"""


@register("bm25_ndcg_eval", _NDCG_ORACLE)
def q_bm25_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of each derived BM25 query: graded gains (2^terms_hit - 1)
    discounted by ln(rank+1), folded in rank order, normalized by the
    rel-ideal reordering of the retrieved set."""
    base = q_bm25_topk(spark, sf_dir)
    gain = (F.pow(F.lit(2.0), F.col("n_terms_hit")) - 1).cast("double")
    gains = base.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("rank").alias("o"), gain.alias("v")))
        ).alias("g_ranked"),
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("n_terms_hit")).alias("o1"),
                    F.col("doc_id").alias("o2"),
                    gain.alias("v"),
                )
            )
        ).alias("g_ideal"),
    )

    def dcg(arr):
        return F.aggregate(
            F.zip_with(
                F.transform(arr, lambda s: s["v"]),
                F.sequence(F.lit(1), F.size(arr)),
                lambda v, i: v / F.log(i.cast("double") + 1.0),
            ),
            F.lit(0.0),
            lambda a, b: F.round(a + b, 12),
        )

    folded = gains.select(
        "query_id",
        dcg(F.col("g_ranked")).alias("dcg"),
        dcg(F.col("g_ideal")).alias("idcg"),
    )
    return folded.select(
        "query_id",
        F.round("dcg", 6).alias("dcg"),
        F.round("idcg", 6).alias("idcg"),
        F.round(F.col("dcg") / F.col("idcg"), 6).alias("ndcg_at_10"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# Calibration: deterministic hash "propensity" score vs purchase outcome.
# Scores are exact milli-units (hash60 % 1000), so every bin statistic
# and the ECE are integers — no float means anywhere.
# ---------------------------------------------------------------------------

_CAL_CTE = """
WITH per_user AS (
  SELECT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 1000 AS score_milli,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1
), bins AS (
  SELECT score_milli // 100 AS bin,
         CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(score_milli) AS BIGINT) AS sum_score_milli,
         CAST(sum(converted) AS BIGINT) AS n_converted
  FROM per_user GROUP BY 1
)
"""

_CAL_BINS_ORACLE = (
    _CAL_CTE
    + """
SELECT bin, n_users,
       CAST(sum_score_milli // n_users AS BIGINT) AS mean_score_milli,
       CAST(n_converted * 1000000 // n_users AS BIGINT) AS observed_micro,
       CAST(abs(1000 * n_converted - sum_score_milli) * 1000
            // n_users AS BIGINT) AS abs_gap_micro
FROM bins ORDER BY bin
"""
)

_CAL_ECE_ORACLE = (
    _CAL_CTE
    + """
SELECT CAST(sum(n_users) AS BIGINT) AS n_users,
       CAST(sum(abs(1000 * n_converted - sum_score_milli)) * 1000
            // sum(n_users) AS BIGINT) AS ece_micro
FROM bins
"""
)


def _cal_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select(
        (hash60(F.col("user_id").cast("string")) % 1000).alias("score_milli"),
        "converted",
    )
    return per_user.groupBy(
        (F.col("score_milli") / 100).cast("bigint").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("score_milli").cast("bigint").alias("sum_score_milli"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )


@register("propensity_calibration_bins", _CAL_BINS_ORACLE)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram over 10 score deciles of the hash-contract
    propensity score vs realized purchase: bin mean score, observed
    conversion, and the per-bin calibration gap |obs - conf| — exact
    integers throughout (|1000*converted - sum_score| cross-multiply)."""
    b = _cal_bins(spark, sf_dir)
    return b.select(
        "bin",
        "n_users",
        # Integer DIV mirrors the oracle's '//' (ext90/ext103 rule).
        F.expr("CAST(sum_score_milli DIV n_users AS BIGINT)").alias(
            "mean_score_milli"
        ),
        F.expr(
            "CAST((n_converted * 1000000) DIV n_users AS BIGINT)"
        ).alias("observed_micro"),
        F.expr(
            "CAST((abs(1000 * n_converted - sum_score_milli) * 1000)"
            " DIV n_users AS BIGINT)"
        ).alias("abs_gap_micro"),
    ).orderBy("bin")


@register("propensity_calibration_ece", _CAL_ECE_ORACLE)
def q_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected calibration error in micro units: sum of bin gaps
    weighted by bin mass, as one exact integer ratio (the hash score is
    uniform, purchases are not — the ECE quantifies exactly how
    uncalibrated a random score is against this corpus)."""
    b = _cal_bins(spark, sf_dir)
    return b.agg(
        F.sum("n_users").cast("bigint").alias("n_users"),
        F.expr(
            "CAST((sum(abs(1000 * n_converted - sum_score_milli)) * 1000)"
            " DIV sum(n_users) AS BIGINT)"
        ).alias("ece_micro"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss: project 64 -> 16 dims with the deterministic
# +-1 sign matrix (the hyperplane-sketch planes), audit the norm
# distortion ratio ||y||^2 / (k * ||x||^2) whose expectation is 1.
# ---------------------------------------------------------------------------

_JL_K = 16
_JL_DIM = 64


def _jl_sign_rows() -> list[list[int]]:
    return plane_signs(_JL_K, _JL_DIM)


def _jl_oracle() -> str:
    rows = _jl_sign_rows()
    sgn = (
        "["
        + ", ".join("[" + ", ".join(str(v) for v in row) + "]" for row in rows)
        + "]"
    )
    return f"""
WITH sgn AS (
  SELECT {sgn} AS s
), proj AS (
  SELECT e.vec_id,
         list_transform(range(1, {_JL_K} + 1),
           j -> list_reduce(
                  list_concat([CAST(0.0 AS DOUBLE)],
                    list_transform(range(1, {_JL_DIM} + 1),
                      d -> CAST(e.embedding[d] AS DOUBLE) * g.s[j][d])),
                  (a, b) -> a + b)) AS y,
         list_reduce(
           list_concat([CAST(0.0 AS DOUBLE)],
             list_transform(range(1, {_JL_DIM} + 1),
               d -> CAST(e.embedding[d] AS DOUBLE)
                    * CAST(e.embedding[d] AS DOUBLE))),
           (a, b) -> a + b) AS x2
  FROM embeddings e, sgn g
), ratio AS (
  SELECT vec_id,
         round(list_reduce(list_concat([CAST(0.0 AS DOUBLE)],
                 list_transform(y, v -> v * v)), (a, b) -> a + b)
               / ({_JL_K} * x2), 6) AS distortion
  FROM proj
)
SELECT CAST(floor(distortion * 10) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_vectors,
       min(distortion) AS min_ratio,
       max(distortion) AS max_ratio
FROM ratio GROUP BY 1 ORDER BY 1
"""


@register("jl_projection_distortion", _jl_oracle())
def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random-projection audit: 64->16 with the deterministic +-1
    hyperplane signs, per-vector norm-distortion ratio (expectation 1)
    rounded before bucketing; output is the distortion histogram with
    exact bucket extrema — the dimensionality-reduction sanity check an
    embedding pipeline runs before switching ANN to the projected
    space. All folds run in index order (engine == oracle IEEE
    sequence)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = _jl_sign_rows()

    # Arrow lane, HOF-fold-order-preserving (the with_hyperplane_sketch
    # discipline): each projection accumulates acc += x[:, d] * sign in
    # dimension order — one vectorized add per d, sequential over d — so
    # the IEEE rounding sequence matches the DuckDB list_reduce oracle
    # bit-for-bit, at ~100x the throughput of 16 interpreted HOF folds
    # (3.0 s -> ~0.5 s at sf0.1).
    import numpy as np
    import pandas as pd  # noqa: F401

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    signs = np.array(rows, dtype=np.float64)
    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("distortion", DoubleType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            n = mat.shape[0]
            x2 = np.zeros(n)
            for d in range(_JL_DIM):
                x2 = x2 + mat[:, d] * mat[:, d]  # HOF fold order
            y2 = np.zeros(n)
            for j in range(_JL_K):
                acc = np.zeros(n)
                for d in range(_JL_DIM):
                    acc = acc + mat[:, d] * signs[j, d]
                y2 = y2 + acc * acc  # same left-to-right term order
            # HALF-UP like F.round/DuckDB round — np.round is banker's
            # (the r6 ADVICE rint lesson); ratio is always positive
            ratio = np.floor(y2 / (float(_JL_K) * x2) * 1e6 + 0.5) / 1e6
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].astype("int64"),
                    "distortion": ratio,
                }
            )

    ratio = emb.mapInPandas(run, out_schema)
    return (
        ratio.groupBy(
            F.floor(F.col("distortion") * 10).cast("bigint").alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.min("distortion").alias("min_ratio"),
            F.max("distortion").alias("max_ratio"),
        )
        .orderBy("bucket")
    )
