"""Round-13 optimization toggles: every env-toggled plan variant must
produce identical results to the legacy plan at sf0.001, and deferred
checkpoint releases must actually free blocks at the next query build."""

from __future__ import annotations

import math

import pytest

from shortvideohybridanalyticslakehouse_spark.plans.registry import (
    drain_deferred,
    load_all,
)

SF_DIR = "/root/testdata/sf0.001"

TOGGLED = [
    ("semdedup_cluster_prune", "SVH_SEMDEDUP_ARROW"),
    ("covis_rule_quality", "SVH_COVIS_CKPT"),
    ("item_covisitation_topk", "SVH_COVIS_CKPT"),
    ("covisitation_backtest_hit_rate", "SVH_COVIS_CKPT"),
    ("market_basket_lift", "SVH_BASKET_CKPT"),
    ("rfm_segments", "SVH_RFM_FUSED"),
    ("textrank_keywords", "SVH_TEXTRANK_CKPT"),
    ("near_dup_lsh_verified", "SVH_LSHV_ONCE"),
    ("label_centroid_db_index", "SVH_CENTROID_ARROW"),
    ("centroid_label_confusion", "SVH_CENTROID_ARROW"),
]


# NOTE deliberately NO module-level spark fixture: the suite shares
# conftest's local[4] session, and calling get_spark() here would
# silently RAISE the shared session's runtime spark.sql.shuffle.partitions
# to 32 (builder confs apply as runtime confs on getOrCreate) — which
# makes EnsureRequirements align scaled width-5 repartitions up to 32
# and order-dependently breaks every width-asserting test that runs
# after this file (found r13: test_scaled_shuffle failed only in-suite).


def _canon(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append("nan" if math.isnan(v) else v.hex())
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("lane,env", TOGGLED)
def test_toggle_equality(spark, lane, env, monkeypatch):
    fn, _ = load_all()[lane]
    monkeypatch.setenv(env, "1")
    on = _canon(fn(spark, SF_DIR).collect())
    monkeypatch.setenv(env, "0")
    off = _canon(fn(spark, SF_DIR).collect())
    assert on == off
    # covis_rule_quality is legitimately empty at sf0.001 (min-support
    # filter); every other lane must produce rows
    if lane != "covis_rule_quality":
        assert len(on) > 0


def test_deferred_checkpoints_released_at_next_build(spark):
    """single_pass / loop checkpoints are deferred-released: after the
    NEXT registered builder runs, no blocks from the prior lane linger."""
    registry = load_all()
    fn, _ = registry["similarity_graph_kcore"]  # defers edge/alive blocks
    # Diff against the pre-existing set (the hygiene-gate convention):
    # other surfaces — e.g. the serving pipeline's documented
    # one-generation rolled cache — may legitimately hold blocks when
    # the full suite runs this test mid-session; THIS lane's deferred
    # blocks are what must appear and then drain.
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    df = fn(spark, SF_DIR)
    df.collect()

    def _new():
        return (
            set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
            - before
        )

    assert _new()  # blocks deferred, not leaked
    drain_deferred()
    assert _new() == set()
