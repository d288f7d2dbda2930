"""Markov removal-effect attribution (ext122): hand-solved absorption
probabilities on a planted journey set."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_markov_removal_planted_chain(spark, tmp_path):
    """Journeys: u1 click->conv, u2 click->view->conv, u3 view->null,
    u4 direct conv.

    Chain: start -> {click 1/2, view 1/4, conv 1/4};
    click -> {conv 1/2, view 1/2}; view -> {conv 1/2, null 1/2}.
    Hand-solved: v_full(start) = 3/4; remove click -> 3/8 (RE 1/2);
    remove view -> 1/2 (RE 1/3); error/signup RE 0."""
    t0 = dt.datetime(2026, 6, 1, 9, 0, 0)

    def ev(eid, user, etype, minutes):
        return (
            eid,
            t0 + dt.timedelta(minutes=minutes),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 1, "click", 0),
        ev(2, 1, "purchase", 10),
        ev(3, 2, "click", 0),
        ev(4, 2, "view", 5),
        ev(5, 2, "purchase", 10),
        ev(6, 3, "view", 0),
        ev(7, 4, "purchase", 0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = {
        r.channel: r
        for r in reg["markov_removal_attribution"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert all(r.conv_prob_full == 0.75 for r in out.values())
    assert out["click"].conv_prob_removed == 0.375
    assert out["click"].removal_effect == 0.5
    assert out["view"].conv_prob_removed == 0.5
    re_view = round(1 - 0.5 / 0.75, 6)
    assert out["view"].removal_effect == re_view
    assert out["error"].removal_effect == 0.0
    assert out["signup"].removal_effect == 0.0
    tot = 0.5 + re_view
    assert out["click"].attribution_share == round(0.5 / tot, 6)
    assert out["view"].attribution_share == round(re_view / tot, 6)
