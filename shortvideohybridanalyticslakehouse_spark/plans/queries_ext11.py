"""Extension queries, round 11: the dedup pipeline's final mile —
canonical-survivor corpus resolution (LSH-grade edges → clusters → keep
min-id per cluster → surviving corpus accounting) — plus deterministic
k-per-group sampling. Both DuckDB-oracle-checked (the canonical-corpus
oracle re-derives the clusters with a recursive CTE, so the full
iterative pipeline is value-hash-checked end to end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import dedupfns
from shortvideohybridanalyticslakehouse_spark.functions.dedupfns import hash60
from shortvideohybridanalyticslakehouse_spark.plans.queries_ext6 import (
    _DUCK_SHINGLES_3,
    connected_components,
)
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

# ---------------------------------------------------------------------------
# Canonical-survivor corpus resolution
# ---------------------------------------------------------------------------

_CANONICAL_ORACLE = rf"""
WITH RECURSIVE sh AS (
  SELECT doc_id, {_DUCK_SHINGLES_3} AS shs FROM documents
), sized AS (
  SELECT doc_id, shs, len(shs) AS sh_size FROM sh
), ex AS (
  SELECT doc_id, sh_size,
         CAST(('0x' || substr(md5(unnest(shs)), 1, 15)) AS BIGINT) AS shingle_h
  FROM sized
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sh_size AS size_a, b.sh_size AS size_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM ex a JOIN ex b ON a.shingle_h = b.shingle_h AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
), edges AS (
  SELECT doc_a, doc_b FROM inter
  WHERE n_inter / CAST(size_a + size_b - n_inter AS DOUBLE) >= 0.5
), sym AS (
  SELECT doc_a AS s, doc_b AS d FROM edges
  UNION SELECT doc_b, doc_a FROM edges
), reach(node, r) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.d, reach.r FROM reach JOIN sym ON sym.s = reach.node
), labels AS (
  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
), removed AS (
  SELECT node AS doc_id FROM labels WHERE node <> cluster_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(*) FILTER (WHERE r.doc_id IS NOT NULL) AS BIGINT)
         AS n_removed,
       CAST(count(*) FILTER (WHERE r.doc_id IS NULL) AS BIGINT)
         AS n_survivors,
       CAST(sum(d.n_chars) FILTER (WHERE r.doc_id IS NULL) AS BIGINT)
         AS surviving_chars
FROM documents d LEFT JOIN removed r ON d.doc_id = r.doc_id
GROUP BY d.source
"""


@register("near_dup_canonical_corpus", _CANONICAL_ORACLE)
def q_near_dup_canonical_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup writer's output accounting: near-dup clusters (3-gram
    Jaccard ≥ 0.5, connected components) keep ONE canonical survivor per
    cluster (min doc_id — deterministic, engine-independent); every other
    member is removed. Reports per-source kept/removed counts and
    surviving characters — the "how much corpus did dedup cost" number
    every training-data run reports.

    Scale shape: the non-survivor set is |clustered docs − clusters| rows
    — tiny relative to the corpus — so the final pass is a left join of
    the full corpus against a small (usually broadcastable) removal list;
    the corpus itself streams through once.
    """
    docs = load_table(spark, sf_dir, "documents", ensure_parallelism=True)
    edges = dedupfns.exact_jaccard_pairs(docs, "doc_id", "text", k=3, min_jaccard=0.5)
    labels = connected_components(edges, "doc_a", "doc_b")
    removed = labels.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("rm_doc_id")
    )
    joined = docs.join(
        F.broadcast(removed), docs.doc_id == removed.rm_doc_id, "left"
    )
    is_removed = F.col("rm_doc_id").isNotNull()
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count(F.when(is_removed, 1)).alias("n_removed"),
        F.count(F.when(~is_removed, 1)).alias("n_survivors"),
        F.sum(F.when(~is_removed, F.col("n_chars"))).alias("surviving_chars"),
    )


# ---------------------------------------------------------------------------
# Deterministic k-per-group sample
# ---------------------------------------------------------------------------

K_PER_GROUP = 50

_K_PER_GROUP_ORACLE = f"""
WITH ranked AS (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
                         AS BIGINT) ASC, event_id ASC
         ) AS rn
  FROM events
)
SELECT event_type, event_id, user_id, value
FROM ranked WHERE rn <= {K_PER_GROUP}
"""


@register("k_per_group_sample", _K_PER_GROUP_ORACLE)
def q_k_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group deterministic sample: rank rows within each
    class by a content hash (uniform pseudo-order, reproducible on any
    engine/partitioning — unlike reservoir sampling, whose result depends
    on encounter order) and keep the first k. The eval-set builder shape:
    every class contributes exactly min(k, |class|) rows.

    At 100 TB: one hash-partitioned sort per class — and because rank is
    bounded, Spark's WindowGroupLimit pushes the k-filter into a
    per-partition top-k heap before the full sort materializes.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "user_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy(
        hash60(F.col("event_id").cast("string")).asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= K_PER_GROUP)
        .drop("rn")
    )
