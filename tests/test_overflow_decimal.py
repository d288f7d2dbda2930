"""ADVICE r10 (medium): the integer cross-ratio lanes wrapped in int64.

source_token_hhi multiplied sum(c*c) * 1e9 in BIGINT; ks_weekend's
cum_a*nb and covis lift's co_sessions*n*1e6 share the class. With ANSI
off, Spark wraps SILENTLY while DuckDB (HUGEINT sums) stays exact — a
Spark-only wrong answer at large SFs. The fix routes the wide products
through DECIMAL(38,0) on the Spark side and explicit HUGEINT casts in
the oracle. These tests feed counts big enough that the old int64 path
provably wraps and assert the decimal path equals DuckDB exactly.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

# One token with 4e9 occurrences: c*c = 1.6e19 > int64 max (9.22e18)
_BIG = 4_000_000_000
_ROWS = [("a", "tok0", _BIG), ("a", "tok1", 7), ("b", "x", 3), ("b", "y", 5)]


def _hhi_frame(spark):
    return spark.createDataFrame(_ROWS, "source string, tok string, c long")


def test_hhi_decimal_path_matches_hugeint_oracle(spark):
    counts = _hhi_frame(spark)
    got = (
        counts.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_types"),
            F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias(
                "_sum_c2"
            ),
        )
        .select(
            "source",
            "n_tokens",
            F.expr(
                "CAST(_sum_c2 * 1000000000"
                " DIV (CAST(n_tokens AS DECIMAL(38,0))"
                " * CAST(n_tokens AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("hhi_nano"),
            F.expr(
                "CAST(CAST(n_tokens AS DECIMAL(38,0))"
                " * CAST(n_tokens AS DECIMAL(38,0))"
                " DIV _sum_c2 AS BIGINT)"
            ).alias("effective_types"),
        )
    )
    spark_rows = {
        r["source"]: (r["n_tokens"], r["hhi_nano"], r["effective_types"])
        for r in got.collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE counts(source VARCHAR, tok VARCHAR, c BIGINT)"
    )
    con.executemany("INSERT INTO counts VALUES (?,?,?)", _ROWS)
    duck_rows = {
        s: (n, h, e)
        for s, n, h, e in con.sql(
            """
            SELECT source, CAST(sum(c) AS BIGINT),
                   CAST(sum(CAST(c AS HUGEINT) * c) * 1000000000
                        // (CAST(sum(c) AS HUGEINT)
                            * CAST(sum(c) AS HUGEINT)) AS BIGINT),
                   CAST(CAST(sum(c) AS HUGEINT) * CAST(sum(c) AS HUGEINT)
                        // sum(CAST(c AS HUGEINT) * c) AS BIGINT)
            FROM counts GROUP BY 1
            """
        ).fetchall()
    }
    assert spark_rows == duck_rows
    # source 'a' is ~all one token: HHI must be near 1e9, and the old
    # int64 path demonstrably wraps on the same input
    assert spark_rows["a"][1] > 999_999_990
    wrapped = (
        _hhi_frame(spark)
        .groupBy("source")
        .agg(
            F.expr(
                "CAST(sum(c * c) * 1000000000"
                " DIV (sum(c) * sum(c)) AS BIGINT)"
            ).alias("hhi_nano_int64")
        )
        .filter(F.col("source") == "a")
        .collect()[0]["hhi_nano_int64"]
    )
    assert wrapped != spark_rows["a"][1], "int64 path should wrap here"


@pytest.mark.parametrize(
    "co,n,sa,sc",
    [
        (3_000_000_000, 5_000_000_000, 3_500_000_000, 4_000_000_000),
        (10, 5_000_000_000, 4_000_000_000, 20),
    ],
)
def test_lift_leverage_decimal_matches_hugeint(spark, co, n, sa, sc):
    row = spark.createDataFrame(
        [(co, n, sa, sc)],
        "co_sessions long, n long, sessions_ante long, sessions_cons long",
    )
    got = row.select(
        F.expr(
            "CAST(CAST(co_sessions AS DECIMAL(38,0)) * n * 1000000"
            " DIV (CAST(sessions_ante AS DECIMAL(38,0))"
            " * sessions_cons) AS BIGINT)"
        ).alias("lift_micro"),
        F.expr(
            "CAST((CAST(co_sessions AS DECIMAL(38,0)) * n"
            " - CAST(sessions_ante AS DECIMAL(38,0)) * sessions_cons)"
            " * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"
        ).alias("leverage_micro"),
    ).collect()[0]
    want = duckdb.sql(
        f"""
        SELECT CAST(CAST({co} AS HUGEINT) * {n} * 1000000
                    // (CAST({sa} AS HUGEINT) * {sc}) AS BIGINT),
               CAST((CAST({co} AS HUGEINT) * {n}
                     - CAST({sa} AS HUGEINT) * {sc}) * 1000000
                    // (CAST({n} AS HUGEINT) * {n}) AS BIGINT)
        """
    ).fetchall()[0]
    assert (got["lift_micro"], got["leverage_micro"]) == want


def test_ks_dmicro_decimal_matches_hugeint(spark):
    # na, nb ~ 4e9 each: cum_a*nb ~ 1.6e19 wraps in int64
    cum_a, cum_b, na, nb = 3_999_999_999, 17, 4_000_000_000, 4_100_000_000
    got = (
        spark.createDataFrame(
            [(cum_a, cum_b, na, nb)],
            "cum_a long, cum_b long, na long, nb long",
        )
        .select(
            F.expr(
                "CAST(abs(CAST(cum_a AS DECIMAL(38,0)) * nb"
                " - CAST(cum_b AS DECIMAL(38,0)) * na) * 1000000"
                " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)"
            ).alias("d_micro")
        )
        .collect()[0]["d_micro"]
    )
    want = duckdb.sql(
        f"""
        SELECT CAST(abs(CAST({cum_a} AS HUGEINT) * {nb}
                        - CAST({cum_b} AS HUGEINT) * {na}) * 1000000
                    // (CAST({na} AS HUGEINT) * {nb}) AS BIGINT)
        """
    ).fetchall()[0][0]
    assert got == want
    assert 999_000 < got <= 1_000_000  # near-total separation
