"""Bounded deterministic run: video registry, CDC bootstrap, content events
with late/invalid injection, expected-actions ground truth (G6-G13).

Reference semantics ported (src/generator/m1/runner.py):
- video registry with upload-age sampling: cold-start 1-60 min, others
  61-1440 min; <=200 videos/scenario (:75-107)
- CDC bootstrap: all op=c (ts_ms=start+idx), then op=u (+60 s) (:109-148)
- late events: seeded index sample; offsets 80% in [121,150] s,
  20% in [151,210] s subtracted from event_timestamp (:150-167)
- invalid events: bad timestamp + non-JSON payload + missing type (:169-178)
- watch_time semantics per event type (:192-201)
- expected actions over [window_start, +30 m) (:221-241)

Output is plain Python rows -> spark.createDataFrame (no Kafka needed for
correctness runs); the JSON wire shape matches the streaming contract so
the same parse/validate operators run in batch replay and streaming modes.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

from shortvideohybridanalyticslakehouse_spark.generator import deterministic as det
from shortvideohybridanalyticslakehouse_spark.generator import scenario as scen


@dataclass(frozen=True)
class GeneratorConfig:
    run_id: str = "run_0001"
    seed: int = 42
    total_events: int = 6000
    events_per_second: float = 10.0
    start_time: datetime = field(
        default_factory=lambda: datetime(2026, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
    )
    late_event_ratio: float = 0.02
    invalid_burst_bad_payload: bool = True


def _iso(ts: datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"


class BoundedRun:
    """One deterministic bounded generation run (same seed => same bytes)."""

    def __init__(self, config: GeneratorConfig | None = None):
        self.cfg = config or GeneratorConfig()
        self._plan()

    # -- planning ----------------------------------------------------------

    def _plan(self) -> None:
        cfg = self.cfg
        self.sequence = scen.scenario_sequence(cfg.total_events, cfg.seed)
        counts: dict[str, int] = {}
        for s in self.sequence:
            counts[s] = counts.get(s, 0) + 1
        self.scenario_counts = counts

        # G6: video registry — videos per scenario = ceil(events/1000), <=200
        rng_age = det.scoped_rng(cfg.seed, "upload_age")
        self.videos: list[dict] = []
        self.videos_by_scenario: dict[str, list[dict]] = {}
        seq = 0
        for s, n in counts.items():
            n_videos = max(1, min(200, math.ceil(n / 1000)))
            vids = []
            for _ in range(n_videos):
                if s == "cold_start_under_exposed":
                    age_min = rng_age.randint(1, 60)
                else:
                    age_min = rng_age.randint(61, 1440)
                v = {
                    "video_id": det.video_id(cfg.run_id, seq),
                    "scenario_id": s,
                    "upload_time": cfg.start_time - timedelta(minutes=age_min),
                    "category": ["music", "gaming", "news", "sports"][seq % 4],
                    "region": ["US", "EU", "APAC"][seq % 3],
                    "status": "active",
                }
                vids.append(v)
                self.videos.append(v)
                seq += 1
            self.videos_by_scenario[s] = vids

        # G9: user pool max(200, min(5000, total/60))
        n_users = max(200, min(5000, cfg.total_events // 60))
        self.users = [det.user_id(cfg.run_id, i) for i in range(n_users)]

        # G8: late-event index sample
        rng_late = det.scoped_rng(cfg.seed, "late_events")
        n_late = int(cfg.total_events * cfg.late_event_ratio)
        self.late_indices = set(
            rng_late.sample(range(cfg.total_events), n_late)
        )

    # -- emission ----------------------------------------------------------

    def cdc_records(self) -> list[tuple[str]]:
        """G7: bootstrap op=c for every video, then op=u (+60 s, category
        mutation). Returns JSON wire rows (single `value` column)."""
        cfg = self.cfg
        base_ms = int(cfg.start_time.timestamp() * 1000)
        rows: list[tuple[str]] = []
        for idx, v in enumerate(self.videos):
            after = {
                "video_id": v["video_id"],
                "category": v["category"],
                "region": v["region"],
                "upload_time": _iso(v["upload_time"]),
                "status": v["status"],
            }
            rows.append(
                (
                    json.dumps(
                        {
                            "op": "c",
                            "ts_ms": base_ms + idx,
                            "schema_version": "m1_v1",
                            "after": after,
                        }
                    ),
                )
            )
        for idx, v in enumerate(self.videos):
            after_u = {
                "video_id": v["video_id"],
                "category": v["category"] + "_u",
                "region": v["region"],
                "upload_time": _iso(v["upload_time"]),
                "status": v["status"],
            }
            rows.append(
                (
                    json.dumps(
                        {
                            "op": "u",
                            "ts_ms": base_ms + 60_000 + idx,
                            "schema_version": "m1_v1",
                            "after": after_u,
                        }
                    ),
                )
            )
        return rows

    def content_events(self) -> list[tuple[str]]:
        """G3/G8/G10/G11: the bounded content-event stream (JSON rows)."""
        cfg = self.cfg
        rng_user = det.scoped_rng(cfg.seed, "user_pick")
        rng_video = det.scoped_rng(cfg.seed, "video_pick")
        rng_watch = det.scoped_rng(cfg.seed, "watch_time")
        rng_late_off = det.scoped_rng(cfg.seed, "late_offset")
        rows: list[tuple[str]] = []
        for i, s in enumerate(self.sequence):
            ts = self.cfg.start_time + timedelta(
                seconds=i / cfg.events_per_second
            )
            video = rng_video.choice(self.videos_by_scenario[s])
            user = rng_user.choice(self.users)
            if s == "invalid_payload_burst":
                # G10: canonical invalid event — bad ts, bad payload, no type
                rows.append(
                    (
                        json.dumps(
                            {
                                "event_id": det.event_id(cfg.run_id, i),
                                "event_timestamp": "bad-timestamp",
                                "video_id": video["video_id"],
                                "user_id": user,
                                "schema_version": "m1_v1",
                                "payload_json": "{not-valid-json",
                            }
                        ),
                    )
                )
                continue
            etype = scen.pick_event_type(s, cfg.seed, i)
            if i in self.late_indices:
                # G8: 80% -> [121,150] s, 20% -> [151,210] s
                if rng_late_off.random() < 0.8:
                    off = rng_late_off.randint(121, 150)
                else:
                    off = rng_late_off.randint(151, 210)
                ts = ts - timedelta(seconds=off)
            duration_ms = 30_000
            if etype in ("impression", "play_start"):
                watch = 0
            elif etype == "play_finish":
                watch = duration_ms
            elif etype == "skip":
                watch = rng_watch.randint(1, duration_ms - 1)
            else:  # like / share
                watch = rng_watch.randint(0, duration_ms)
            rows.append(
                (
                    json.dumps(
                        {
                            "event_id": det.event_id(cfg.run_id, i),
                            "event_timestamp": _iso(ts),
                            "video_id": video["video_id"],
                            "user_id": user,
                            "event_type": etype,
                            "schema_version": "m1_v1",
                            "payload_json": json.dumps(
                                {"watch_time_ms": watch, "scenario_id": s}
                            ),
                        }
                    ),
                )
            )
        return rows

    def expected_actions(self) -> list[dict]:
        """G12: scenario -> expected action ground truth per video/window."""
        cfg = self.cfg
        window_start = cfg.start_time.replace(second=0, microsecond=0)
        run_seconds = cfg.total_events / cfg.events_per_second
        window_end = window_start + timedelta(seconds=run_seconds + 60)
        out = []
        for v in self.videos:
            action = scen.SCENARIOS[v["scenario_id"]]["expected_action"]
            if action == "QUARANTINE":
                continue
            out.append(
                {
                    "run_id": cfg.run_id,
                    "video_id": v["video_id"],
                    "window_start": window_start,
                    "window_end": window_end,
                    "scenario_id": v["scenario_id"],
                    "expected_action": action,
                }
            )
        return out

    def realized_mix(self) -> dict[str, float]:
        """G13: realized scenario mix for the acceptance self-check."""
        total = sum(self.scenario_counts.values())
        return {s: n / total for s, n in self.scenario_counts.items()}
