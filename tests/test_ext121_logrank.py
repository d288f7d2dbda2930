"""Log-rank test (ext121): hand-computed O/E/V on a planted 4-user
cohort."""

from __future__ import annotations

import datetime as dt

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_logrank_planted_cohort(spark, tmp_path):
    """Exposed: u1 (purchase day 2), u2 (censored day 4). Control: u3
    (purchase day 1), u4 (censored day 3).

    Event days: t=1 (n1=2, n0=2, d=1 control), t=2 (n1=2, n0=1, d=1
    exposed). By hand:
      O1 = 1
      E1_micro = 1*2*1e6//4 + 1*2*1e6//3      = 500000 + 666666 = 1166666
      V_micro  = 1*2*2*3*1e6//(16*3)
               + 1*2*1*2*1e6//(9*2)           = 250000 + 222222 = 472222
    """
    t0 = dt.datetime(2026, 5, 1, 8, 0, 0)

    def ev(eid, user, etype, days, minutes=0):
        return (
            eid,
            t0 + dt.timedelta(days=days, minutes=minutes),
            user,
            etype,
            1.0,
            "{}",
        )

    rows = [
        ev(1, 1, "signup", 0),
        ev(2, 1, "error", 0, 30),
        ev(3, 1, "purchase", 2),
        ev(4, 2, "signup", 0),
        ev(5, 2, "error", 0, 10),
        ev(6, 2, "view", 4),
        ev(7, 3, "signup", 0),
        ev(8, 3, "purchase", 1),
        ev(9, 4, "signup", 0),
        ev(10, 4, "view", 3),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, payload string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    reg = load_all()
    out = reg["logrank_error_exposure"][0](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_exposed, r.n_control) == (2, 2)
    assert r.o1 == 1
    assert r.e1_micro == 500000 + 2000000 // 3
    assert r.v_micro == 250000 + 4000000 // 18
    num = r.o1 * 1000000 - r.e1_micro
    assert r.chi2 == round(float(num) * float(num) / (1e6 * r.v_micro), 6)
