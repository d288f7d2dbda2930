"""Custom Python data source (Spark 4 DataSource API): a DISTRIBUTED
deterministic event generator — `spark.read.format("svh_synth_events")`.

Why it matters at scale: the generator package (generator/runner.py)
builds fixtures driver-side as Python lists — right for byte-exact
golden files, wrong for load-testing a cluster (one process materializes
everything). This source moves generation INTO the scan: each input
partition derives its rows purely from (seed, partition_id, row_index),
so a 10^9-row synthetic table costs zero driver memory, scales with
executors, and is bit-identical regardless of partition count — the
partition-invariance the tests pin.

Determinism contract: row i (global index) of a run with seed s is a pure
function of md5(f"{s}|{i}") — no RNG state, no partition coupling. The
same recipe as the deterministic generator module, expressed per-row so
any partitioning yields the same multiset.

Usage:
    spark.dataSource.register(SynthEventsDataSource)
    df = (spark.read.format("svh_synth_events")
          .option("n_rows", 100000).option("seed", 42)
          .option("n_partitions", 32).load())

Reference analog: the reference's load generator is a single-process Kafka
producer (SURVEY §2.12); this is its cluster-native batch twin.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")
_START = datetime(2026, 1, 1, tzinfo=timezone.utc)


def _row(seed: int, i: int):
    """Pure per-row derivation: global index -> event tuple."""
    h = hashlib.md5(f"{seed}|{i}".encode()).digest()
    user_id = int.from_bytes(h[0:4], "big") % 1000
    etype = _EVENT_TYPES[h[4] % len(_EVENT_TYPES)]
    value = round((int.from_bytes(h[5:8], "big") % 100_000) / 100.0, 2)
    # monotone-ish event time: index drives the clock, hash adds jitter
    ts = _START + timedelta(milliseconds=i * 100 + h[8] % 100)
    return (i, ts.replace(tzinfo=None), user_id, etype, value)


class _Partition(InputPartition):
    def __init__(self, start: int, end: int, seed: int):
        self.start, self.end, self.seed = start, end, seed


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        n, p = self.n_rows, max(self.n_partitions, 1)
        chunk = (n + p - 1) // p
        return [
            _Partition(s, min(s + chunk, n), self.seed)
            for s in range(0, n, chunk)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _row(partition.seed, i)


class SynthEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "svh_synth_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema):
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register every custom source on a session."""
    spark.dataSource.register(SynthEventsDataSource)
    spark.dataSource.register(SynthContentEventsDataSource)
    spark.dataSource.register(KafkaWireDataSource)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming twin: each micro-batch emits the next ``rows_per_batch``
    rows of the SAME deterministic sequence (offset = global row index, so
    replays after failure regenerate identical data — the exactly-once
    property a replayable source must give the engine). Bounded by
    ``max_rows`` so availableNow-style drains terminate."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.max_rows = int(options.get("max_rows", 10_000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = int(start["index"])
        e = min(s + self.rows_per_batch, self.max_rows)
        return (self._rows(s, e), {"index": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        # failure replay: regenerate the exact slice from the pure function
        return self._rows(int(start["index"]), int(end["index"]))

    def _rows(self, s: int, e: int):
        return iter([_row(self.seed, i) for i in range(s, e)])



# ---------------------------------------------------------------------------
# Content-event twin: the engine's raw ingestion contract as a custom source
# ---------------------------------------------------------------------------

_CONTENT_TYPES = (
    "impression",
    "play_start",
    "play_finish",
    "like",
    "share",
    "skip",
)


def _content_row(seed: int, i: int):
    """One raw content-event JSON line (the S1 ingestion contract), pure in
    (seed, i) — valid rows only; validation-path fixtures plant their own
    malformed records."""
    import json as _json

    h = hashlib.md5(f"{seed}|content|{i}".encode()).digest()
    ts = _START + timedelta(milliseconds=i * 500 + h[8] % 500)
    payload = {
        "watch_time_ms": int.from_bytes(h[0:2], "big") % 30_000,
        "device_os": ("ios", "android")[h[2] % 2],
        "app_version": f"1.{h[3] % 9}.0",
        "network_type": ("wifi", "5g", "4g")[h[4] % 3],
        "scenario_id": "synth",
    }
    doc = {
        "event_id": f"e{seed}-{i}",
        "event_timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S.") + f"{ts.microsecond // 1000:03d}Z",
        "video_id": f"v{int.from_bytes(h[5:7], 'big') % 50}",
        "user_id": f"u{int.from_bytes(h[9:11], 'big') % 200}",
        "event_type": _CONTENT_TYPES[h[11] % len(_CONTENT_TYPES)],
        "schema_version": "1.0",
        "payload_json": _json.dumps(payload, sort_keys=True),
    }
    return (_json.dumps(doc, sort_keys=True),)


class SynthContentEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 5_000))
        self.seed = int(options.get("seed", 42))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        n, p = self.n_rows, max(self.n_partitions, 1)
        chunk = (n + p - 1) // p
        return [
            _Partition(s, min(s + chunk, n), self.seed)
            for s in range(0, n, chunk)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield _content_row(partition.seed, i)


class SynthContentEventsStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rows_per_batch", 200))
        self.max_rows = int(options.get("max_rows", 5_000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = int(start["index"])
        e = min(s + self.rows_per_batch, self.max_rows)
        return (iter([_content_row(self.seed, i) for i in range(s, e)]), {"index": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [_content_row(self.seed, i) for i in range(int(start["index"]), int(end["index"]))]
        )


class SynthContentEventsDataSource(DataSource):
    """`svh_synth_content_events`: raw content-event JSON lines (the exact
    S1 ingestion contract) generated inside the scan, batch or streaming.
    Compose with `as_raw_stream` to feed start_content_events_job — the
    engine's full parse -> validate -> dedup -> gold pipeline runs on a
    custom Python source exactly as it does on files or Kafka."""

    @classmethod
    def name(cls) -> str:
        return "svh_synth_content_events"

    def schema(self) -> str:
        return "raw_value string"

    def reader(self, schema):
        return SynthContentEventsReader(self.options)

    def simpleStreamReader(self, schema):
        return SynthContentEventsStreamReader(self.options)


# ---------------------------------------------------------------------------
# Kafka wire twin: the PUBLIC Kafka source schema (Structured Streaming +
# Kafka integration guide), emitted by a broker-free source so the engine's
# kafka projection and every plan above it can be built AND executed in this
# container (VERDICT r5 #4) — only format("kafka").load() itself needs the
# connector jar.
# ---------------------------------------------------------------------------


class KafkaWireStreamReader(SimpleDataSourceStreamReader):
    """Micro-batches of content-event records in Kafka wire shape: value =
    the JSON line (bytes), offsets are the global row index — the same
    deterministic replayable contract as the other synth stream readers."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.topic = options.get("topic", "rt.content.events")
        self.rows_per_batch = int(options.get("rows_per_batch", 200))
        self.max_rows = int(options.get("max_rows", 1_000))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        s = int(start["index"])
        e = min(s + self.rows_per_batch, self.max_rows)
        return (self._rows(s, e), {"index": e})

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["index"]), int(end["index"]))

    def _rows(self, s: int, e: int):
        out = []
        for i in range(s, e):
            (line,) = _content_row(self.seed, i)
            ts = _START + timedelta(milliseconds=i * 500)
            out.append(
                (
                    None,  # key: unkeyed topic fixture
                    line.encode("utf-8"),
                    self.topic,
                    i % 4,  # partition
                    i,  # offset: global index (replay-stable)
                    ts.replace(tzinfo=None),
                    0,  # timestampType: CreateTime
                )
            )
        return iter(out)


class KafkaWireDataSource(DataSource):
    """`svh_kafka_wire`: broker-free stand-in whose schema is byte-for-byte
    the public Kafka source relation, for plan-shape twin tests."""

    @classmethod
    def name(cls) -> str:
        return "svh_kafka_wire"

    def schema(self) -> str:
        # must stay in lockstep with streaming.jobs.KAFKA_SOURCE_SCHEMA —
        # the twin test asserts it.
        return (
            "key binary, value binary, topic string, partition int, "
            "offset bigint, timestamp timestamp, timestampType int"
        )

    def simpleStreamReader(self, schema):
        return KafkaWireStreamReader(self.options)


def as_raw_stream(df):
    """Adapt a raw_value relation (batch or streaming) to the kafka-shaped
    source frame the streaming jobs expect — same synthesized metadata as
    read_json_file_stream."""
    from pyspark.sql import functions as F

    return (
        df.withColumn("topic", F.lit("svh_synth"))
        .withColumn("partition", F.lit(0))
        .withColumn("offset", F.xxhash64(F.col("raw_value")))
        .withColumn("kafka_timestamp", F.current_timestamp())
    )
