"""Extension queries, round 102: session entry/exit matrix (which event
types open and close engagement sessions — the landing/parting-page
staple) and the duplicate-cluster size histogram (the shape of the
corpus's duplication, not just its rate).

Entry/exit selection uses arg_min/arg_max over a UNIQUE packed key
(milliseconds since the corpus min ts * 2^24 + event_id — documented
bounds: 30-day span < 2^32 ms, event_id < 2^24), so ties can't exist
and both engines pick the same row deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark.plans.registry import register
from shortvideohybridanalyticslakehouse_spark.sources.batch import load_table

_ENTRY_EXIT_ORACLE = """
WITH anchor AS (
  SELECT min(ts) AS t0 FROM events
), keyed AS (
  SELECT e.user_id, e.ts, e.event_type,
         date_diff('millisecond', a.t0, e.ts) * 16777216 + e.event_id AS k
  FROM events e, anchor a
), flagged AS (
  SELECT user_id, ts, event_type, k,
    -- microsecond-exact gap test: an interval/second-truncated compare
    -- diverges between engines when a gap straddles 30 min by < 1 s
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
         THEN 1 ELSE 0 END AS new_sess
  FROM keyed
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT *, sum(new_sess) OVER (
    PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), sessions AS (
  SELECT user_id, sess_id,
         arg_min(event_type, k) AS entry_type,
         arg_max(event_type, k) AS exit_type,
         CAST(count(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY 1, 2
)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_single_event,
       CAST(sum(n_events) AS BIGINT) AS n_events
FROM sessions GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("session_entry_exit_matrix", _ENTRY_EXIT_ORACLE)
def q_session_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(entry event type, exit event type) matrix over 30-minute-gap
    sessions: session counts, single-event (bounce) sessions, and total
    events — min_by/max_by on the unique packed key, LAG-island
    sessionization identical to the ext3 oracle."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    anchor = F.broadcast(ev.agg(F.min("ts").alias("t0")))
    keyed = ev.crossJoin(anchor).select(
        "user_id",
        "ts",
        "event_type",
        (
            ((F.unix_micros(F.col("ts")) - F.unix_micros(F.col("t0"))) / 1000)
            .cast("bigint")
            * 16_777_216
            + F.col("event_id")
        ).alias("k"),
    )
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = keyed.withColumn(
        "new_sess",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts"))
                - F.unix_micros(F.lag("ts").over(w))
                >= 1_800_000_000
            ),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "sess_id",
        F.sum("new_sess").over(
            Window.partitionBy("user_id")
            .orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = numbered.groupBy("user_id", "sess_id").agg(
        F.min_by("event_type", F.col("k")).alias("entry_type"),
        F.max_by("event_type", F.col("k")).alias("exit_type"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        sessions.groupBy("entry_type", "exit_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_single_event"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("entry_type", "exit_type")
    )


_CLUSTER_HISTO_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         md5(substr(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'),
                    1, 200)) AS pfp
  FROM documents
), clusters AS (
  SELECT pfp, CAST(count(*) AS BIGINT) AS cluster_size
  FROM norm GROUP BY 1
)
SELECT cluster_size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM clusters GROUP BY 1 ORDER BY 1
"""


@register("dup_cluster_size_histogram", _CLUSTER_HISTO_ORACLE)
def q_dup_cluster_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of prefix-fingerprint duplicate-cluster sizes (size 1 =
    unique docs): the duplication SHAPE — one giant mirror cluster and a
    thousand pairs need different dedup strategies even at the same dup
    rate."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    clusters = (
        docs.select(F.md5(F.substring(norm, 1, 200)).alias("pfp"))
        .groupBy("pfp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cluster_size"))
    )
    return (
        clusters.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters"))
            .cast("bigint")
            .alias("n_docs"),
        )
        .orderBy("cluster_size")
    )
