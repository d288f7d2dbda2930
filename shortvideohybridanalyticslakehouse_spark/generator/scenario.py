"""Scenario planning: apportionment, shuffling, weighted event types
(G1-G3; ref: src/generator/m1/scenario.py:30-160, constants.py:23-37).

Five scenarios with event-type weight profiles chosen so the decision
engine's four outcomes are all reachable (FIXTURES.md §A4).
"""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.generator.deterministic import scoped_rng

# scenario_id -> (mix fraction, expected action, event-type weights)
SCENARIOS: dict[str, dict] = {
    "normal_baseline": {
        "mix": 0.55,
        "expected_action": "NO_ACTION",
        "weights": {
            "impression": 50, "play_start": 25, "play_finish": 12,
            "like": 6, "share": 2, "skip": 5,
        },
    },
    "viral_high_quality": {
        "mix": 0.20,
        "expected_action": "BOOST",
        "weights": {
            "impression": 40, "play_start": 25, "play_finish": 20,
            "like": 9, "share": 5, "skip": 1,
        },
    },
    "viral_low_quality": {
        "mix": 0.10,
        "expected_action": "REVIEW",
        # hot velocity (likes/shares) but poor completion + high skip:
        # candidate=true, quality=false -> REVIEW
        "weights": {
            "impression": 35, "play_start": 22, "play_finish": 3,
            "like": 16, "share": 12, "skip": 12,
        },
    },
    "cold_start_under_exposed": {
        "mix": 0.10,
        "expected_action": "RESCUE",
        "weights": {
            "impression": 30, "play_start": 30, "play_finish": 25,
            "like": 10, "share": 2, "skip": 3,
        },
    },
    "invalid_payload_burst": {
        "mix": 0.05,
        "expected_action": "QUARANTINE",
        "weights": {"impression": 1},
    },
}


def apportion(total: int) -> dict[str, int]:
    """G1: largest-remainder apportionment — exact-sum integer split."""
    quotas = {s: total * cfg["mix"] for s, cfg in SCENARIOS.items()}
    floors = {s: int(q) for s, q in quotas.items()}
    remainder = total - sum(floors.values())
    by_frac = sorted(
        quotas, key=lambda s: (-(quotas[s] - floors[s]), s)
    )
    for s in by_frac[:remainder]:
        floors[s] += 1
    return floors


def scenario_sequence(total: int, seed: int) -> list[str]:
    """G2: deterministic shuffle of the apportioned scenario sequence."""
    counts = apportion(total)
    seq = [s for s, n in counts.items() for _ in range(n)]
    scoped_rng(seed, "scenario_shuffle").shuffle(seq)
    return seq


def pick_event_type(scenario: str, seed: int, index: int) -> str:
    """G3: per-index weighted event-type choice (rng seeded per index)."""
    weights = SCENARIOS[scenario]["weights"]
    rng = scoped_rng(seed, f"event_type|{index}")
    names = list(weights)
    return rng.choices(names, weights=[weights[n] for n in names], k=1)[0]
