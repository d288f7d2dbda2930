"""Shapley channel attribution (ext118): hand-computed coalition game
on a planted journey set, including the efficiency property."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_shapley_planted_journeys(spark, tmp_path):
    """u1: click -> purchase (T={click}); u2: click, view -> purchase
    (T={click,view}); u3: purchase with no touches (T={}).

    By hand (n=4, weights scaled by 4!=24):
      phi_click x24 = sum_{S not ni c} w(|S|) * (1 + [view in S])
                    = 24 + 12 = 36            (phi = 1.5)
      phi_view  x24 = sum_{S ni c, S not ni v} w(|S|) = 12   (phi = 0.5)
      error/signup: never touched -> 0.
    Efficiency: sum phi = v(all) - v(empty) = 3 - 1 = 2 = 48/24."""
    t0 = dt.datetime(2026, 2, 1, 12, 0, 0)

    def ev(eid, user, etype, minutes):
        return (eid, t0 + dt.timedelta(minutes=minutes), user, etype, 1.0, "{}")

    rows = [
        ev(1, 1, "click", 0),
        ev(2, 1, "purchase", 10),
        ev(3, 2, "click", 0),
        ev(4, 2, "view", 5),
        ev(5, 2, "purchase", 10),
        ev(6, 3, "purchase", 10),
        # post-purchase touch must NOT count
        ev(7, 1, "view", 20),
        # a never-converting user must not appear in the game
        ev(8, 9, "click", 0),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = {
        r.channel: r
        for r in reg["shapley_channel_attribution"][0](
            spark, str(tmp_path)
        ).collect()
    }
    assert out["click"].phi_x24 == 36
    assert out["view"].phi_x24 == 12
    assert out["error"].phi_x24 == 0
    assert out["signup"].phi_x24 == 0
    assert all(r.total_conversions == 3 for r in out.values())
    # efficiency: total credit = v(grand) - v(empty) = 2 conversions
    assert sum(r.phi_x24 for r in out.values()) == 2 * 24
    assert out["click"].phi_micro == 1500000
    assert out["view"].phi_micro == 500000
