"""Extension queries, round 105: embedding class-separation diagnostics
— per-label scatter profile and the Fisher separation ratio
(between-class / within-class scatter traces), the are-these-labels-
linearly-separable-at-all check an embedding pipeline runs before
training a probe.

Exactness contract (the int_gram_stats discipline, ext83): components
quantize to floor(x * 1e6 + 0.5) int64; all per-label moment sums
(per-dimension S1, global S2, counts) are exact integers; Huygens'
decomposition turns every scatter into integer products
(n_l * S2_l - ||S1_l||^2 etc.) accumulated in DECIMAL(38,0) / HUGEINT,
with ONE final cast-divide-round per output — bit-identical across
engines.

  within_l = (n_l * S2_l - ||S1_l||^2) / n_l
  between  = sum_l ||S1_l||^2 / n_l - ||S1||^2 / n
  fisher   = between / within        (traces, quant units)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_SCALE = 1_000_000

_MOMENTS_CTE = f"""
WITH comp AS (
  SELECT label, vec_id, d,
         CAST(floor(CAST(embedding[d] AS DOUBLE) * {_SCALE} + 0.5)
              AS BIGINT) AS xq
  FROM embeddings, unnest(generate_series(1, 64)) AS t(d)
), dim_sums AS (
  SELECT label, d, sum(xq) AS s1 FROM comp GROUP BY 1, 2
), per_label AS (
  SELECT c.label,
         CAST(count(DISTINCT c.vec_id) AS BIGINT) AS n_l,
         sum(c.xq * c.xq) AS s2_l
  FROM comp c GROUP BY 1
), label_norm AS (
  SELECT label, sum(s1 * s1) AS s1_sq FROM dim_sums GROUP BY 1
), lab AS (
  SELECT p.label, p.n_l, p.s2_l, q.s1_sq
  FROM per_label p JOIN label_norm q USING (label)
), gtot AS (
  SELECT CAST(sum(n_l) AS BIGINT) AS n,
         sum(s2_l) AS s2,
         (SELECT sum(t.tot * t.tot)
          FROM (SELECT d, sum(s1) AS tot FROM dim_sums GROUP BY 1) t)
           AS s1_sq_all
  FROM lab
)
"""

_SCATTER_ORACLE = (
    _MOMENTS_CTE
    + """
SELECT label, n_l AS n_vectors,
       round(CAST(n_l * s2_l - s1_sq AS DOUBLE) / CAST(n_l AS DOUBLE), 6)
         AS within_scatter,
       round(CAST(s1_sq AS DOUBLE) / CAST(n_l AS DOUBLE) / n_l, 6)
         AS centroid_sq_norm
FROM lab ORDER BY label
"""
)

_FISHER_ORACLE = (
    _MOMENTS_CTE
    + """
, parts AS (
  -- label-order quantized fold: a bare SUM of doubles is
  -- accumulation-order-dependent; 10 terms folded by label with
  -- round-12 steps are bit-identical in both engines
  SELECT g.n,
         list_reduce(
           list_concat([CAST(0.0 AS DOUBLE)],
             list(CAST(l.s1_sq AS DOUBLE) / l.n_l ORDER BY l.label)),
           (a, b) -> round(a + b, 12)) AS sum_mu_terms,
         CAST(g.s1_sq_all AS DOUBLE) / g.n AS global_mu_term,
         CAST(g.s2 AS DOUBLE) AS s2
  FROM lab l, gtot g GROUP BY 1, 3, 4
)
SELECT n AS n_vectors,
       round(sum_mu_terms - global_mu_term, 6) AS between_scatter,
       round(s2 - sum_mu_terms, 6) AS within_scatter,
       round((sum_mu_terms - global_mu_term) / (s2 - sum_mu_terms), 6)
         AS fisher_ratio
FROM parts
"""
)


def _moments(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(
        "label",
        "vec_id",
        F.posexplode(F.col("embedding")).alias("d0", "x"),
    ).select(
        "label",
        "vec_id",
        (F.col("d0") + 1).alias("d"),
        F.floor(F.col("x").cast("double") * _SCALE + 0.5)
        .cast("bigint")
        .alias("xq"),
    )
    dim_sums = comp.groupBy("label", "d").agg(
        F.sum("xq").cast("decimal(38,0)").alias("s1")
    )
    per_label = comp.groupBy("label").agg(
        F.countDistinct("vec_id").cast("bigint").alias("n_l"),
        F.sum((F.col("xq") * F.col("xq")).cast("decimal(38,0)")).alias("s2_l"),
    )
    label_norm = dim_sums.groupBy("label").agg(
        F.sum(F.col("s1") * F.col("s1")).alias("s1_sq")
    )
    lab = per_label.join(label_norm, "label")
    return comp, dim_sums, lab


@register("embedding_label_scatter", _SCATTER_ORACLE)
def q_label_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label within-class scatter trace and squared centroid norm
    from exact integer moments (Huygens: n*S2 - ||S1||^2, one divide
    each)."""
    _, _, lab = _moments(spark, sf_dir)
    return lab.select(
        "label",
        F.col("n_l").alias("n_vectors"),
        F.round(
            (F.col("n_l") * F.col("s2_l") - F.col("s1_sq")).cast("double")
            / F.col("n_l").cast("double"),
            6,
        ).alias("within_scatter"),
        F.round(
            F.col("s1_sq").cast("double")
            / F.col("n_l").cast("double")
            / F.col("n_l"),
            6,
        ).alias("centroid_sq_norm"),
    ).orderBy("label")


@register("embedding_fisher_separation", _FISHER_ORACLE)
def q_fisher_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Fisher separation: between-class over within-class scatter
    traces (quant units), one row — > 0 means the labels carve the
    embedding space at all; the magnitude calibrates probe-training
    expectations."""
    _, dim_sums, lab = _moments(spark, sf_dir)
    glob_dim = dim_sums.groupBy("d").agg(F.sum("s1").alias("tot"))
    s1_sq_all = glob_dim.agg(
        F.sum(F.col("tot") * F.col("tot")).alias("s1_sq_all")
    )
    sums = lab.agg(
        F.sum("n_l").cast("bigint").alias("n"),
        F.sum(F.col("s2_l")).alias("s2"),
        # label-order quantized fold — bare double SUM is
        # accumulation-order-dependent across partitions
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("label").alias("o"),
                            (
                                F.col("s1_sq").cast("double")
                                / F.col("n_l").cast("double")
                            ).alias("t"),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            F.lit(0.0),
            lambda a, b: F.round(a + b, 12),
        ).alias("sum_mu_terms"),
    )
    parts = sums.crossJoin(F.broadcast(s1_sq_all)).select(
        "n",
        "sum_mu_terms",
        (F.col("s1_sq_all").cast("double") / F.col("n")).alias(
            "global_mu_term"
        ),
        F.col("s2").cast("double").alias("s2d"),
    )
    return parts.select(
        F.col("n").alias("n_vectors"),
        F.round(F.col("sum_mu_terms") - F.col("global_mu_term"), 6).alias(
            "between_scatter"
        ),
        F.round(F.col("s2d") - F.col("sum_mu_terms"), 6).alias(
            "within_scatter"
        ),
        F.round(
            (F.col("sum_mu_terms") - F.col("global_mu_term"))
            / (F.col("s2d") - F.col("sum_mu_terms")),
            6,
        ).alias("fisher_ratio"),
    )
