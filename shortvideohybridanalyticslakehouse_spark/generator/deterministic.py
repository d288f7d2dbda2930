"""Purpose-scoped deterministic RNG + content-addressed IDs (G4, G5).

Reference semantics (src/generator/m1/deterministic.py:11-41): every random
stream is seeded by sha256(seed|purpose) so runs replay bit-identically;
entity IDs are prefix + sha256(run_id|entity|seq) hex prefixes.
"""

from __future__ import annotations

import hashlib
import random


def derive_seed(base_seed: int, purpose: str) -> int:
    digest = hashlib.sha256(f"{base_seed}|{purpose}".encode()).hexdigest()
    return int(digest[:16], 16)


def scoped_rng(base_seed: int, purpose: str) -> random.Random:
    return random.Random(derive_seed(base_seed, purpose))


def _entity_id(run_id: str, entity: str, seq: int, prefix: str, hexlen: int) -> str:
    digest = hashlib.sha256(f"{run_id}|{entity}|{seq}".encode()).hexdigest()
    return f"{prefix}{digest[:hexlen]}"


def video_id(run_id: str, seq: int) -> str:
    return _entity_id(run_id, "video", seq, "vid_", 16)


def user_id(run_id: str, seq: int) -> str:
    return _entity_id(run_id, "user", seq, "usr_", 16)


def event_id(run_id: str, seq: int) -> str:
    return _entity_id(run_id, "event", seq, "evt_", 20)
