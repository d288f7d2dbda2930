"""t-closeness audit (ext116): hand-computed TV distances on a planted
customer extract."""

from __future__ import annotations

from shortvideohybridanalyticslakehouse_spark.plans.registry import load_all


def test_tcloseness_planted_distributions(spark, tmp_path):
    """Global segments: 8 AUTO + 8 BLDG (N=16). Class nation=1 is all
    AUTO (TV=1/2), nation=2 mirrors the global split (TV=0), nation=3
    is 2 AUTO / 6 BLDG (TV=1/4). All in one balance band."""
    rows = []
    ck = 0

    def add(nation: int, seg: str, n: int):
        nonlocal ck
        for _ in range(n):
            rows.append(
                (ck, f"c{ck}", "addr", nation, "p", 500.00, seg, "x")
            )
            ck += 1

    add(1, "AUTO", 4)
    add(2, "AUTO", 2)
    add(2, "BLDG", 2)
    add(3, "AUTO", 2)
    add(3, "BLDG", 6)
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_address string, "
        "c_nationkey long, c_phone string, c_acctbal double, "
        "c_mktsegment string, c_comment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))

    reg = load_all()
    out = {
        r.nationkey: r
        for r in reg["t_closeness_audit"][0](spark, str(tmp_path)).collect()
    }
    assert out[1].tv_micro == 500000 and out[1].t_violation
    assert out[2].tv_micro == 0 and not out[2].t_violation
    assert out[3].tv_micro == 250000 and out[3].t_violation
    assert out[1].n_rows == 4 and out[3].n_rows == 8
    # every class shares the single planted balance band (500.00 -> 0)
    assert {r.bal_band for r in out.values()} == {0}
