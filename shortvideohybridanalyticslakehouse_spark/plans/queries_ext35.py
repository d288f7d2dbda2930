"""Extension queries, round 35: batched multi-query ANN — the production
search shape (one corpus pass amortized over a query set), motivated by
the scale-probe finding in PLANS.md that single-query Arrow scoring loses
to the JVM fold on transfer cost alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.functions import similarity
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_COS = (
    "round(list_sum(list_transform(range(1, 65), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) "
    "/ (sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) "
    "* sqrt(list_sum(list_transform(range(1, 65), "
    "i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))), 6)"
)

_BATCH_TOPK_ORACLE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.query_id, e.vec_id, {_COS} AS cosine_sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, vec_id, cosine_sim FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id ASC) AS rn
  FROM scored)
WHERE rn <= 10
ORDER BY query_id ASC, cosine_sim DESC, vec_id ASC
"""


@register("embedding_batch_topk", _BATCH_TOPK_ORACLE)
def q_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact ANN: top-10 neighbors for the 8 lowest-id vectors in
    ONE corpus pass (numpy GEMM per Arrow batch against the whole query
    block, local top-10 per query per batch, tiny per-query window
    global). See similarity.cosine_topk_batch.
    """
    emb = load_table(spark, sf_dir, "embeddings", ensure_parallelism=True)
    qrows = (
        emb.filter(F.col("vec_id") < 8)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .orderBy("vec_id")
        .collect()
    )
    queries = [(r[0], list(r[1])) for r in qrows]
    return similarity.cosine_topk_batch(emb, queries, k=10)
