"""Extension queries, round 143: training-run planning lanes — the two
schedule artifacts a pretraining pipeline derives from the curated
corpus, missing from the registry's mixing/packing family.

1. curriculum_phase_schedule — docs split into 4 curriculum phases by
   a deterministic difficulty proxy (doc token count: short docs first,
   the classic length-curriculum), phases cut with EXACT ntile
   arithmetic over a distributed row number (no single-partition
   window); per phase: doc count, token sum, and the cumulative token
   offset where the phase starts in the training stream.
2. epoch_allocation_budget — Muennighoff-style data-constrained
   allocation (arXiv:2305.16264 shape): a fixed token budget equal to
   TWICE the corpus, filled greedily by source quality (distinct-token
   micro ratio, exact integers), each source capped at 4 epochs. Exact
   greedy via cumulative sums over the bounded source frame; outputs
   tokens taken and epochs_micro per source plus the leftover budget
   row ordering.

Determinism: difficulty/quality proxies are exact integer ratios;
phase cuts are ntile arithmetic (bit-equal to the window function);
the greedy is a prefix-sum computation, not an iterative loop.

Plan shapes at 100 TB: phase schedule is one doc-grain pass + the
bucketed two-phase row-number (no global sort); epoch allocation
aggregates to O(sources) rows and runs its window over that bounded
frame only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.operators import ranks
from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_PHASES = 4
_EPOCH_CAP = 4
_BUDGET_X = 2  # budget = 2x corpus tokens

_TOKS = "string_split(trim(lower(coalesce(text, ''))), ' ')"

_CURR_ORACLE = f"""
WITH t AS (
  SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS tokens
  FROM documents
  WHERE length(trim(lower(coalesce(text, '')))) > 0
), ranked AS (
  SELECT doc_id, tokens,
         ntile({_PHASES}) OVER (ORDER BY tokens ASC, doc_id ASC) AS phase
  FROM t
), per_phase AS (
  SELECT CAST(phase AS BIGINT) AS phase,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(tokens) AS BIGINT) AS phase_tokens,
         CAST(min(tokens) AS BIGINT) AS min_tokens,
         CAST(max(tokens) AS BIGINT) AS max_tokens
  FROM ranked GROUP BY 1
)
SELECT phase, n_docs, phase_tokens, min_tokens, max_tokens,
       CAST(coalesce(sum(phase_tokens) OVER (
         ORDER BY phase ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ), 0) AS BIGINT) AS stream_offset_tokens
FROM per_phase
"""


@register("curriculum_phase_schedule", _CURR_ORACLE)
def q_curriculum_phase_schedule(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """4-phase length curriculum: exact ntile cuts over (tokens,
    doc_id), per-phase token sums and stream offsets."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    t = docs.filter(F.length(text) > 0).select(
        "doc_id", F.size(F.split(text, " ", -1)).cast("bigint").alias("tokens")
    )
    ranked = ranks.with_distributed_row_number(
        t, [], ["tokens", "doc_id"], single_pass=True
    ).withColumn(
        "phase",
        ranks.ntile_from_rank(F.col("_rn"), F.col("_n"), _PHASES).cast(
            "bigint"
        ),
    )
    per_phase = ranked.groupBy("phase").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("phase_tokens"),
        F.min("tokens").cast("bigint").alias("min_tokens"),
        F.max("tokens").cast("bigint").alias("max_tokens"),
    )
    # 4-row frame: the cumulative window is bounded by _PHASES
    w = Window.orderBy("phase").rowsBetween(
        Window.unboundedPreceding, -1
    )
    return per_phase.select(
        "phase",
        "n_docs",
        "phase_tokens",
        "min_tokens",
        "max_tokens",
        F.coalesce(F.sum("phase_tokens").over(w), F.lit(0))
        .cast("bigint")
        .alias("stream_offset_tokens"),
    )


_EPOCH_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id, {_TOKS} AS ts
  FROM documents
  WHERE length(trim(lower(coalesce(text, '')))) > 0
), occ AS (
  SELECT source, unnest(ts) AS tok FROM t
), src AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS src_tokens,
         CAST(CAST(count(DISTINCT tok) AS HUGEINT) * 1000000
              // count(*) AS BIGINT) AS quality_micro
  FROM occ GROUP BY 1
), tot AS (
  SELECT CAST(sum(src_tokens) AS BIGINT) * {_BUDGET_X} AS budget FROM src
), ordered AS (
  SELECT s.source, s.src_tokens, s.quality_micro, o.budget,
         CAST(coalesce(sum(s.src_tokens * {_EPOCH_CAP}) OVER (
           ORDER BY s.quality_micro DESC, s.source ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS taken_before
  FROM src s CROSS JOIN tot o
)
SELECT source, src_tokens, quality_micro,
       CAST(least(src_tokens * {_EPOCH_CAP},
                  greatest(CAST(0 AS BIGINT), budget - taken_before))
            AS BIGINT) AS tokens_taken,
       CAST(CAST(least(src_tokens * {_EPOCH_CAP},
                       greatest(CAST(0 AS BIGINT), budget - taken_before))
                 AS HUGEINT) * 1000000 // src_tokens AS BIGINT)
         AS epochs_micro
FROM ordered
"""


@register("epoch_allocation_budget", _EPOCH_ORACLE)
def q_epoch_allocation_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Data-constrained epoch allocation: fill a 2x-corpus token budget
    by source quality (distinct-token micro ratio), 4-epoch cap per
    source, exact greedy via prefix sums over the bounded source
    frame."""
    docs = load_table(spark, sf_dir, "documents")
    text = F.trim(F.lower(F.coalesce(F.col("text"), F.lit(""))))
    occ = docs.filter(F.length(text) > 0).select(
        "source", F.explode(F.split(text, " ", -1)).alias("tok")
    )
    src = occ.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("src_tokens"),
        F.expr(
            "CAST(CAST(count(DISTINCT tok) AS DECIMAL(38,0)) * 1000000"
            " DIV count(1) AS BIGINT)"
        ).alias("quality_micro"),
    )
    tot = F.broadcast(
        src.agg(
            (F.sum("src_tokens") * _BUDGET_X).cast("bigint").alias("budget")
        )
    )
    # O(sources) frame: the ordered prefix sum is over a bounded
    # alphabet, not the corpus
    w = Window.orderBy(
        F.col("quality_micro").desc(), F.col("source").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    ordered = src.crossJoin(tot).withColumn(
        "taken_before",
        F.coalesce(
            F.sum(F.col("src_tokens") * _EPOCH_CAP).over(w), F.lit(0)
        ).cast("bigint"),
    )
    take = F.least(
        F.col("src_tokens") * _EPOCH_CAP,
        F.greatest(F.lit(0).cast("bigint"), F.col("budget") - F.col("taken_before")),
    )
    return ordered.select(
        "source",
        "src_tokens",
        "quality_micro",
        take.cast("bigint").alias("tokens_taken"),
        F.expr(
            "CAST(CAST(least(src_tokens * {cap},"
            " greatest(CAST(0 AS BIGINT), budget - taken_before))"
            " AS DECIMAL(38,0)) * 1000000 DIV src_tokens AS BIGINT)".format(
                cap=_EPOCH_CAP
            )
        ).alias("epochs_micro"),
    )
