"""Extension queries, round 136: embedding label-geometry audits.

1. label_centroid_db_index — Davies-Bouldin components per label over
   the micro-quantized embeddings: per-label centroid (exact integer
   sums, floor-divided), per-label scatter (milli-floored sqrt of the
   integer squared distance — sqrt is IEEE correctly-rounded, so it is
   bit-identical across engines), and the worst (S_i+S_j)/M_ij ratio
   against every other label. The "are my labels geometrically
   separable" check a linear-probe would answer with a GPU.
2. centroid_label_confusion — every vector assigned to its NEAREST
   label centroid (squared integer distance, label tie-break), counted
   as a (label, nearest_label) confusion matrix — the classifier-free
   label-noise smell test that complements knn_label_noise_audit.

Determinism: centroids are floor(sum/n) on exact integer sums (floor on
a double that is exact below 2^53); distances are integer; sqrt is
correctly-rounded IEEE; every derived double is floored to milli/micro
before comparison or summation.

Plan shapes at 100 TB: one posexplode shuffle to (label, pos) grain for
centroids (K x dim rows), then an O(N) scan joining a K-row broadcast
(closed label alphabet) — nothing quadratic in N; the label-pair matrix
is K x K.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.queries_ext115 import (
    _int_vec,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_QUANT = "CAST(floor(CAST(x AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)"

_CENTROID_CTE = f"""
WITH base AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         list_transform(embedding, x -> {_QUANT}) AS v
  FROM embeddings
), expl AS (
  SELECT label, vec_id, unnest(generate_series(1, len(v))) AS pos, v
  FROM base
), cells AS (
  SELECT label, pos, CAST(sum(v[pos]) AS BIGINT) AS s,
         CAST(count(*) AS BIGINT) AS n
  FROM expl GROUP BY 1, 2
), cent AS (
  SELECT label, n,
         list(CAST(floor(CAST(s AS DOUBLE) / n) AS BIGINT)
              ORDER BY pos) AS c
  FROM cells GROUP BY 1, 2
)
"""


def _duck_sqdist(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
    )


_DB_ORACLE = (
    _CENTROID_CTE
    + f"""
, scatter AS (
  SELECT b.label,
         CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(sum(CAST(floor(
           sqrt(CAST({_duck_sqdist("b.v", "c.c")} AS DOUBLE)) * 1000.0
         ) AS BIGINT)) AS BIGINT) AS dist_sum_milli
  FROM base b JOIN cent c ON c.label = b.label
  GROUP BY 1
), s AS (
  SELECT label, n_vecs,
         CAST(floor(CAST(dist_sum_milli AS DOUBLE) / n_vecs) AS BIGINT)
           AS s_milli
  FROM scatter
), ratios AS (
  SELECT si.label,
         sj.label AS other_label,
         CASE WHEN CAST(floor(
           sqrt(CAST({_duck_sqdist("ci.c", "cj.c")} AS DOUBLE)) * 1000.0
         ) AS BIGINT) = 0
         THEN CAST(9223372036854775807 AS BIGINT)
         ELSE
         CAST((si.s_milli + sj.s_milli) * 1000000 // CAST(floor(
           sqrt(CAST({_duck_sqdist("ci.c", "cj.c")} AS DOUBLE)) * 1000.0
         ) AS BIGINT) AS BIGINT) END AS r_micro
  FROM s si JOIN s sj ON si.label <> sj.label
  JOIN cent ci ON ci.label = si.label
  JOIN cent cj ON cj.label = sj.label
)
SELECT s.label, s.n_vecs, s.s_milli,
       CAST(max(r.r_micro) AS BIGINT) AS worst_ratio_micro
FROM s JOIN ratios r ON r.label = s.label
GROUP BY 1, 2, 3
"""
)


def _centroids(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.col("label").cast("bigint").alias("label"),
        _int_vec("embedding").alias("v"),
    )
    expl = base.select(
        "label", F.posexplode("v").alias("pos", "val")
    )
    cells = expl.groupBy("label", "pos").agg(
        F.sum("val").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    cent = (
        cells.select(
            "label",
            "n",
            "pos",
            F.floor(F.col("s").cast("double") / F.col("n"))
            .cast("bigint")
            .alias("cv"),
        )
        .groupBy("label", "n")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                lambda e: e.cv,
            ).alias("c")
        )
    )
    return base, cent


def _sqd(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


@register("label_centroid_db_index", _DB_ORACLE)
def q_label_centroid_db_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label Davies-Bouldin components: scatter (milli) and the
    worst (S_i+S_j)/M_ij separation ratio (micro) vs any other label."""
    base, cent = _centroids(spark, sf_dir)
    # K-row centroid frame over the closed label alphabet: broadcast
    member_d = F.floor(
        F.sqrt(_sqd(F.col("v"), F.col("c")).cast("double")) * 1000.0
    ).cast("bigint")
    scatter = (
        base.join(F.broadcast(cent.select("label", "c")), "label")
        .select("label", member_d.alias("d_milli"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum("d_milli").cast("bigint").alias("dist_sum_milli"),
        )
        .select(
            "label",
            "n_vecs",
            F.floor(
                F.col("dist_sum_milli").cast("double") / F.col("n_vecs")
            )
            .cast("bigint")
            .alias("s_milli"),
        )
    )
    si = scatter.select(
        F.col("label"), F.col("n_vecs"), F.col("s_milli")
    ).join(cent.select("label", F.col("c").alias("ci")), "label")
    sj = scatter.select(
        F.col("label").alias("other_label"),
        F.col("s_milli").alias("sj_milli"),
    ).join(
        cent.select(
            F.col("label").alias("other_label"), F.col("c").alias("cj")
        ),
        "other_label",
    )
    m_milli = F.floor(
        F.sqrt(_sqd(F.col("ci"), F.col("cj")).cast("double")) * 1000.0
    ).cast("bigint")
    # K x K label-pair matrix over the closed alphabet; pure integer
    # DIV (all operands positive, so Spark's truncation == DuckDB's
    # floor //) — no double round-trip near 2^53. Two labels with
    # IDENTICAL floor-averaged centroids give m_milli = 0: Spark DIV
    # would silently yield NULL while DuckDB errors (ADVICE r10), so
    # both engines emit an explicit int64-max sentinel ("infinitely
    # bad separation") which max() then propagates deterministically.
    ratios = (
        si.join(F.broadcast(sj), F.col("label") != F.col("other_label"))
        .withColumn("m_milli", m_milli)
        .select(
            "label",
            "n_vecs",
            "s_milli",
            F.expr(
                "CASE WHEN m_milli = 0"
                " THEN CAST(9223372036854775807 AS BIGINT)"
                " ELSE CAST((s_milli + sj_milli) * CAST(1000000 AS BIGINT)"
                " DIV m_milli AS BIGINT) END"
            ).alias("r_micro"),
        )
    )
    return ratios.groupBy("label", "n_vecs", "s_milli").agg(
        F.max("r_micro").cast("bigint").alias("worst_ratio_micro")
    )


_CONFUSION_ORACLE = (
    _CENTROID_CTE
    + f"""
, assign AS (
  SELECT b.vec_id, b.label,
         c.label AS cand,
         {_duck_sqdist("b.v", "c.c")} AS d2,
         row_number() OVER (
           PARTITION BY b.vec_id
           ORDER BY {_duck_sqdist("b.v", "c.c")} ASC, c.label ASC
         ) AS rn
  FROM base b CROSS JOIN cent c
)
SELECT label, cand AS nearest_label,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM assign WHERE rn = 1
GROUP BY 1, 2
"""
)


@register("centroid_label_confusion", _CONFUSION_ORACLE)
def q_centroid_label_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Confusion matrix of own label vs nearest label centroid (integer
    squared distance, label tie-break) — the classifier-free label
    separability audit."""
    from pyspark.sql import Window

    base, cent = _centroids(spark, sf_dir)
    assign = base.crossJoin(
        F.broadcast(cent.select(F.col("label").alias("cand"), "c"))
    ).select(
        "vec_id",
        "label",
        "cand",
        _sqd(F.col("v"), F.col("c")).alias("d2"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d2").asc(), F.col("cand").asc()
    )
    return (
        assign.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("cand").alias("nearest_label"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )
