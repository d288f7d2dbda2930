"""Extension queries, round 57: from-scratch Bloom filter membership
audit — the last classic sketch alongside the round-5 HLL/CMS/KMV
family, and like them built so a SQL oracle replays EVERY bit.

Spark's own bloom_filter_agg (and the runtime bloom pruning it powers,
exercised by tests/test_runtime_filters.py) is a JVM black box; this
operator builds the bitmap relationally: k=4 bit positions per member
from the affine hash family (integer keys reduce mod P directly — no
string hashing needed), positions split into (word, bit) at 32 bits per
64-bit word (bit 63 is never set, so arithmetic-shift sign semantics
can't diverge between engines), and the bitmap materializes as ONE
groupBy-bit_or over O(members * k) rows into 2048 words. Probing joins
each probe's 4 (word, bit) pairs against the broadcast bitmap; a probe
is bloom-positive iff all 4 bits are set. The audit emits the measured
false-positive rate against exact membership AND the false-negative
count, which the Bloom guarantee pins to ZERO — an invariant the
value-hash gate now enforces every round.

Scale shape (100 TB): building is a map-side explode (k rows per
member) into a 2048-word partial bit_or agg — the bitmap, like all the
sketches, is O(m) regardless of input size and broadcastable; probing
is a broadcast join on word index, no shuffle of the probe side beyond
its own distinct. This is exactly how a semi-join reducer gets built
when the engine's native runtime filters can't cross an engine
boundary (e.g. shipping a filter to a different system).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_P = 1_000_000_007
_A = [1_103_515_245, 214_013, 69_069, 134_775_813]
_B = [12_345, 2_531_011, 362_437, 1]
_M_BITS = 65_536
_WORD = 32

_A_SQL = "[" + ", ".join(str(a) for a in _A) + "]"
_B_SQL = "[" + ", ".join(str(b) for b in _B) + "]"

_BLOOM_ORACLE = rf"""
WITH members AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), mpos AS (
  SELECT (({_A_SQL}[CAST(u.i AS INT) + 1] * (c_custkey % {_P})
           + {_B_SQL}[CAST(u.i AS INT) + 1]) % {_P}) % {_M_BITS} AS p
  FROM members, unnest(range(4)) AS u(i)
), bloom AS (
  SELECT p // {_WORD} AS word,
         bit_or(CAST(1 AS BIGINT) << (p % {_WORD})) AS bits
  FROM mpos GROUP BY 1
), probes AS (
  SELECT DISTINCT o_custkey FROM orders
), ppos AS (
  SELECT o_custkey,
         (({_A_SQL}[CAST(u.i AS INT) + 1] * (o_custkey % {_P})
           + {_B_SQL}[CAST(u.i AS INT) + 1]) % {_P}) % {_M_BITS} AS p
  FROM probes, unnest(range(4)) AS u(i)
), hit AS (
  SELECT o_custkey,
         min(CASE WHEN (coalesce(b.bits, 0) >> (p % {_WORD})) & 1 = 1
                  THEN 1 ELSE 0 END) AS all_set
  FROM ppos LEFT JOIN bloom b ON b.word = p // {_WORD}
  GROUP BY 1
), verdict AS (
  SELECT h.o_custkey, h.all_set = 1 AS bloom_positive,
         m.c_custkey IS NOT NULL AS is_member
  FROM hit h LEFT JOIN members m ON m.c_custkey = h.o_custkey
)
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(count_if(is_member) AS BIGINT) AS n_true_members,
       CAST(count_if(bloom_positive) AS BIGINT) AS n_bloom_positive,
       CAST(count_if(bloom_positive AND NOT is_member) AS BIGINT)
         AS n_false_positives,
       CAST(count_if(is_member AND NOT bloom_positive) AS BIGINT)
         AS n_false_negatives,
       round(CAST(count_if(bloom_positive AND NOT is_member) AS DOUBLE)
             / greatest(count_if(NOT is_member), 1), 6) AS fpr
FROM verdict
"""


def _positions(key: F.Column) -> F.Column:
    """Array of k bit positions for an integer key (affine family)."""
    hm = key % F.lit(_P)

    def pos(i: F.Column) -> F.Column:
        a = F.element_at(F.array(*[F.lit(x) for x in _A]), i + 1)
        b = F.element_at(F.array(*[F.lit(x) for x in _B]), i + 1)
        return ((a * hm + b) % F.lit(_P)) % F.lit(_M_BITS)

    return F.transform(F.sequence(F.lit(0), F.lit(3)), pos)


@register("bloom_membership_audit", _BLOOM_ORACLE)
def q_bloom_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a 65,536-bit Bloom filter over BUILDING-segment customers
    (k=4 affine hashes, bitmap via groupBy-bit_or into 32-bit-per-word
    longs), probe every ordering customer, and audit: measured FPR vs
    exact membership, and the zero-false-negative guarantee."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    members = (
        cust.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .distinct()
    )
    mpos = members.select(
        F.explode(_positions(F.col("c_custkey"))).alias("p")
    )
    bloom = mpos.select(
        F.expr(f"p DIV {_WORD}").alias("word"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD} AS INT))").alias(
            "bitv"
        ),
    ).groupBy("word").agg(F.expr("bit_or(bitv)").alias("bits"))
    probes = orders.select("o_custkey").distinct()
    ppos = probes.select(
        "o_custkey", F.explode(_positions(F.col("o_custkey"))).alias("p")
    )
    hit = (
        ppos.withColumn("word", F.expr(f"p DIV {_WORD}"))
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "o_custkey",
            F.when(
                F.expr(
                    f"(shiftright(coalesce(bits, CAST(0 AS BIGINT)),"
                    f" CAST(p % {_WORD} AS INT)) & 1) = 1"
                ),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("set_"),
        )
        .groupBy("o_custkey")
        .agg(F.min("set_").alias("all_set"))
    )
    verdict = hit.join(
        members.withColumnRenamed("c_custkey", "o_custkey").withColumn(
            "is_member", F.lit(True)
        ),
        "o_custkey",
        "left",
    ).select(
        (F.col("all_set") == 1).alias("bloom_positive"),
        F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
    )
    return verdict.agg(
        F.count(F.lit(1)).alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).alias("n_true_members"),
        F.sum(F.col("bloom_positive").cast("long")).alias("n_bloom_positive"),
        F.sum((F.col("bloom_positive") & ~F.col("is_member")).cast("long"))
        .alias("n_false_positives"),
        F.sum((F.col("is_member") & ~F.col("bloom_positive")).cast("long"))
        .alias("n_false_negatives"),
        F.round(
            F.sum((F.col("bloom_positive") & ~F.col("is_member")).cast("double"))
            / F.greatest(
                F.sum((~F.col("is_member")).cast("long")), F.lit(1)
            ),
            6,
        ).alias("fpr"),
    )
