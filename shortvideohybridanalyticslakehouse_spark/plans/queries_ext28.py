"""Extension queries, round 28: unigram language-model scoring — the
classic perplexity-proxy quality filter (docs whose tokens are improbable
under the corpus distribution are boilerplate/garbage candidates).

Shape: corpus unigram counts (one token-key shuffle, partial-combined),
occurrences join their counts (token-key shuffle; vocabulary scales far
slower than the corpus, but NOT broadcast — at 100 TB the vocab is still
millions of rows), per-doc bits aggregate, O(sources) rollup.

Cross-engine note: log2 sums accumulate in slightly different orders, so
per-doc bits are rounded to 6 decimals BEFORE the source-level average —
the same discipline doc_token_entropy uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import (
    load_table,
    scaled_shuffle_partitions,
)

_HIGH_BITS = 8.0  # docs averaging above this are "surprising" under the LM

_ORACLE = f"""
WITH occ AS (
  SELECT doc_id, source, unnest(
    string_split(trim(lower(coalesce(text, ''))), ' ')) AS tok
  FROM documents
  WHERE length(trim(coalesce(text, ''))) > 0
), vocab AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_tok,
         CAST(sum(count(*)) OVER () AS BIGINT) AS n_total
  FROM occ GROUP BY tok
), scored AS (
  SELECT o.doc_id, o.source,
    round(avg(-log2(CAST(v.n_tok AS DOUBLE) / CAST(v.n_total AS DOUBLE))), 6)
      AS bits_per_token
  FROM occ o JOIN vocab v USING (tok)
  GROUP BY o.doc_id, o.source
)
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(avg(bits_per_token), 6) AS avg_bits_per_token,
  CAST(sum(CASE WHEN bits_per_token > {_HIGH_BITS} THEN 1 ELSE 0 END)
       AS BIGINT) AS n_surprising
FROM scored
GROUP BY source
"""


@register("doc_unigram_logprob", _ORACLE)
def q_doc_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprise per doc (mean -log2 p(token) under the corpus
    distribution), rolled up per source with a high-surprise count.

    Tokenization is single-space split of the trimmed lowercased text —
    matched exactly by the oracle's string_split (the corpus is
    single-space separated; `\\s+` regex splitting differs between
    engines on empty strings, so the simple split is the contract).
    """
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    occ = (
        docs.filter(F.length(text) > 0)
        .select("doc_id", "source", F.explode(F.split(text, " ", -1)).alias("tok"))
    )
    # Broadcast 1-row corpus total (exchange-reused) instead of funneling
    # the whole vocab through an unpartitioned window — see queries_ext42.
    counts = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    # Auto-size the pinned SHJ build from the corpus (VERDICT r10 #1):
    # metadata-fast count of the PURE documents scan; 10k docs/partition
    # is the 30x-probe-green calibration for count-frame builds.
    n_shuf = scaled_shuffle_partitions(
        load_table(spark, sf_dir, "documents", ensure_parallelism=False),
        rows_per_partition=10_000,
    )
    vocab = counts.crossJoin(
        F.broadcast(counts.agg(F.sum("n_tok").alias("n_total")))
    ).repartition(n_shuf, "tok")
    bits = -F.log2(F.col("n_tok").cast("double") / F.col("n_total").cast("double"))
    # `vocab` is O(|vocabulary|) — it GROWS with the corpus. Round 9's
    # 10x AQE probe proved Catalyst keeps broadcasting this exact
    # count-join shape (419 MB on the bigram clone) instead of demoting,
    # so the join is pinned shuffle-hash with an input-scaled build-side
    # repartition: per-executor build memory stays O(rows/n_shuf) at any
    # corpus scale (the probe side is aligned to n_shuf by
    # EnsureRequirements — tests/test_scaled_shuffle.py).
    scored = (
        occ.join(vocab.hint("shuffle_hash"), "tok")
        .groupBy("doc_id", "source")
        .agg(F.round(F.avg(bits), 6).alias("bits_per_token"))
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("bits_per_token"), 6).alias("avg_bits_per_token"),
        F.sum(F.when(F.col("bits_per_token") > _HIGH_BITS, 1).otherwise(0))
        .cast("bigint")
        .alias("n_surprising"),
    )
