"""Extension queries, round 114: Misra-Gries heavy-hitter summaries —
the deterministic frequent-items sketch (Misra & Gries 1982, the
k-counter generalization of Boyer-Moore majority) folded over each
day's event stream.

Reference parity: the reference's sketch family (HLL / CMS / AMS /
Bloom / KMV, SURVEY §2 sketch rows) lacks a frequent-items summary;
this adds the classic one. The published guarantee — after processing
n items with k counters, every retained estimate satisfies
``true_count - n/(k+1) <= est <= true_count`` and any item with
frequency > n/(k+1) is retained — is asserted by a hypothesis property
test (tests/test_ext114_misra_gries.py), not just the oracle replay.

Determinism contract: Misra-Gries state depends on arrival order, so
both engines fold the identical sequence — events ordered by the unique
event_id — through the identical update rule:

    match  (slot j holds the item)            -> c_j += 1
    insert (no match, first slot with c == 0) -> slot j := (item, 1)
    decrement (no match, no empty slot)       -> every c_j -= 1

The update rule is emitted ONCE from a Python template into both lambda
bodies (Spark ``aggregate`` is 0-indexed, DuckDB ``list_reduce`` is
1-indexed — the only difference), so the two folds cannot drift.

Scale note (100 TB): the ordered fold is the CONTRACT — it pins the
classic single-pass semantics an oracle can replay. The scale path is
the mergeable-summaries form (Agarwal et al. 2012: MG summaries merge
by counter-addition + (k+1)-th-largest subtraction, preserving the
error bound) — per-partition folds then a tree merge, which keeps the
guarantee but not bit-identical counts; the property test pins the
guarantee itself, which is what survives the distributed rewrite. Group
grain here is day (~3.3k events/day at sf0.1); at 100 TB the same fold
runs per (day, shard) with a merge, or the grain drops to hour.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

MG_K = 4  # counters per summary


def mg_step_exprs(acc: str, elem: str, base: int) -> list[str]:
    """The Misra-Gries update as 2*k expressions over the flat state
    list [i0, c0, i1, c1, ...] — emitted once for both engines.

    ``base`` is the language's array index origin (Spark 0, DuckDB 1);
    everything else is byte-identical CASE text, so the folds agree by
    construction.
    """
    k = MG_K

    def it(j: int) -> str:  # item slot j
        return f"{acc}[{base + 2 * j}]"

    def ct(j: int) -> str:  # count slot j
        return f"{acc}[{base + 2 * j + 1}]"

    matched = " OR ".join(f"{it(j)} = {elem}" for j in range(k))
    any_zero = " OR ".join(f"{ct(j)} = 0" for j in range(k))

    def ins(j: int) -> str:
        # first zero-count slot, no slot matching the item
        prior = " AND ".join(f"{ct(i)} <> 0" for i in range(j))
        cond = f"NOT ({matched}) AND {ct(j)} = 0"
        if prior:
            cond += f" AND {prior}"
        return cond

    dec = f"NOT ({matched}) AND NOT ({any_zero})"

    out: list[str] = []
    for j in range(k):
        out.append(f"CASE WHEN {ins(j)} THEN {elem} ELSE {it(j)} END")
        out.append(
            f"CASE WHEN {it(j)} = {elem} THEN {ct(j)} + 1 "
            f"WHEN {ins(j)} THEN 1 "
            f"WHEN {dec} THEN {ct(j)} - 1 ELSE {ct(j)} END"
        )
    return out


def _init_state() -> str:
    return ", ".join(
        "CAST(-1 AS BIGINT), CAST(0 AS BIGINT)" for _ in range(MG_K)
    )


def _spark_fold() -> str:
    steps = ",\n        ".join(mg_step_exprs("acc", "e", 0))
    return (
        "aggregate(seq, "
        f"array({_init_state()}), "
        f"(acc, e) -> array({steps}))"
    )


_MG_ORACLE = f"""
WITH seqs AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         list(CAST(user_id AS BIGINT) ORDER BY event_id) AS seq,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
), folded AS (
  SELECT day, n_events,
    list_reduce(
      list_concat([[{_init_state()}]], list_transform(seq, v -> [v])),
      (acc, e) -> [{", ".join(mg_step_exprs("acc", "(e[1])", 1))}]
    ) AS st
  FROM seqs
)
SELECT day, n_events,
       {", ".join(
           f"st[{2 * j + 1}] AS item_{j}, st[{2 * j + 2}] AS cnt_{j}"
           for j in range(MG_K)
       )}
FROM folded
"""


@register("misra_gries_daily_users", _MG_ORACLE)
def q_misra_gries_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day Misra-Gries summary (k=4 counters) of the user-id stream
    in event_id order: the retained candidate heavy hitters and their
    lower-bound counts. Oracle replays the identical fold; the published
    error guarantee is property-tested separately."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "event_id",
        F.col("user_id").cast("bigint").alias("uid"),
    )
    seqs = ev.groupBy("day").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(event_id, uid))),"
            " p -> p.uid)"
        ).alias("seq"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    st = F.expr(_spark_fold())
    cols = [F.col("day"), F.col("n_events")]
    for j in range(MG_K):
        cols.append(st[2 * j].alias(f"item_{j}"))
        cols.append(st[2 * j + 1].alias(f"cnt_{j}"))
    return seqs.select(*cols)
