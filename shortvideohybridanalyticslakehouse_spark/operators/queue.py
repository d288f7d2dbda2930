"""Action-queue state machine (D8, M3 spec): dedupe/cooldown merge + CAS
state transitions.

Reference spec (docs/architecture/realtime-decisioning/action-queue-contract.md:40-70,
realtime-action-queue-decision-behavior-spec.md:94-143):
- dedupe key: video_id + window_start (one action per video-window)
- cooldown: at most one action per video per 60 minutes; when competing,
  urgency wins (RESCUE > REVIEW > BOOST), ties -> latest created_at
- state machine: PENDING -> ACKED -> EXECUTING -> DONE, plus
  EXPIRED/CANCELLED; transitions are compare-and-set (only fire when the
  current state matches the expected state)

Implemented as MERGE-equivalent DataFrame ops (window-dedup + conditional
update), the plain-parquet analog of conditional ``MERGE INTO`` (on
Delta/Iceberg the same logic is the MERGE's matched-clause predicate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from shortvideohybridanalyticslakehouse_spark import contracts as C

def _urgency():
    # urgency rank: lower = more urgent (RESCUE first); out-of-domain rows
    # rank LAST — without the otherwise() a stray decision_type would get
    # NULL, and NULLs sort first under asc(), beating genuine actions
    return (
        F.when(F.col("decision_type") == C.DECISION_RESCUE, 1)
        .when(F.col("decision_type") == C.DECISION_REVIEW, 2)
        .when(F.col("decision_type") == C.DECISION_BOOST, 3)
        .otherwise(4)
    )

VALID_TRANSITIONS: dict[str, tuple[str, ...]] = {
    "PENDING": ("ACKED", "EXPIRED", "CANCELLED"),
    "ACKED": ("EXECUTING", "EXPIRED", "CANCELLED"),
    "EXECUTING": ("DONE", "EXPIRED", "CANCELLED"),
    "DONE": (),
    "EXPIRED": (),
    "CANCELLED": (),
}


def enqueue(
    queue: DataFrame | None,
    candidates: DataFrame,
    cooldown_minutes: int = 60,
) -> DataFrame:
    """Merge new action candidates into the queue with dedupe + cooldown.

    1. dedupe key (video_id, window_start): existing queue rows win by an
       explicit provenance rank — NOT by created_at, which can tie when
       both sides stamp the same batch timestamp (idempotent replay:
       re-emitting the same decision never replaces the queue row or its
       state);
    2. cooldown: one action per video per ``cooldown_minutes`` CALENDAR
       bucket (floor(window_start / cooldown)) — most urgent wins, ties ->
       latest created_at. Calendar buckets keep the operator a pure window
       function (scalable, deterministic); the rolling-gap variant of the
       spec lives in streaming/stateful.py:cooldown_suppress. Rows already
       past PENDING (acked/executing/terminal) are never evicted — they
       also suppress new candidates in their bucket.
    """
    if queue is None:
        combined = candidates.withColumn("_src", F.lit(1))
    else:
        combined = (
            queue.select(*candidates.columns)
            .withColumn("_src", F.lit(0))
            .unionByName(candidates.withColumn("_src", F.lit(1)))
        )
    # 1. idempotent dedupe on the action identity: queue provenance first
    w_identity = Window.partitionBy("video_id", "window_start").orderBy(
        F.col("_src").asc(), F.col("created_at").asc()
    )
    deduped = (
        combined.withColumn("_rn", F.row_number().over(w_identity))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    # 2. cooldown bucket per video: floor(window_start / cooldown).
    # In-flight/terminal rows are protected: they sort first (so they
    # suppress PENDING candidates sharing their bucket) and are always kept.
    state = (
        F.col("state")
        if "state" in candidates.columns
        else F.lit(C.ACTION_STATE_PENDING)
    )
    protected = state != C.ACTION_STATE_PENDING
    bucket = F.floor(
        F.col("window_start").cast("long") / F.lit(cooldown_minutes * 60)
    )
    w_cooldown = Window.partitionBy("video_id", bucket).orderBy(
        protected.desc(),
        _urgency().asc(),
        F.col("created_at").desc(),
        F.col("window_start").desc(),
    )
    return (
        deduped.withColumn("_rn", F.row_number().over(w_cooldown))
        .filter(protected | (F.col("_rn") == 1))
        .drop("_rn", "_src")
    )


def cas_transition(
    queue: DataFrame,
    action_ids: DataFrame,
    expected_state: str,
    new_state: str,
    at_col: str = "updated_at",
) -> DataFrame:
    """Compare-and-set: move listed actions expected->new; others untouched.

    Invalid transitions (per VALID_TRANSITIONS) never fire even if
    requested — the matched-clause predicate of the MERGE.
    """
    if new_state not in VALID_TRANSITIONS.get(expected_state, ()):
        return queue
    tagged = queue.join(
        F.broadcast(
            action_ids.select("action_id")
            .distinct()  # redelivered acks must not multiply queue rows
            .withColumn("_hit", F.lit(True))
        ),
        "action_id",
        "left",
    )
    fire = F.coalesce(F.col("_hit"), F.lit(False)) & (
        F.col("state") == expected_state
    )
    return (
        tagged.withColumn(
            "state", F.when(fire, F.lit(new_state)).otherwise(F.col("state"))
        )
        .withColumn(
            at_col,
            F.when(fire, F.current_timestamp()).otherwise(F.col(at_col)),
        )
        .drop("_hit")
    )


def expire_overdue(queue: DataFrame, now_col=None) -> DataFrame:
    """TTL sweep: any non-terminal action past expires_at -> EXPIRED."""
    now = now_col if now_col is not None else F.current_timestamp()
    overdue = (
        F.col("state").isin("PENDING", "ACKED", "EXECUTING")
        & (F.col("expires_at") < now)
    )
    return queue.withColumn(
        "state", F.when(overdue, F.lit("EXPIRED")).otherwise(F.col("state"))
    )
