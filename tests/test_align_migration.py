"""ALTER-migration emission from the table-contract check (reference
fail-fast behavior: rt_content_events_aggregator.py:83-94, _sql.py:175-228)."""

from __future__ import annotations

import pytest

from shortvideohybridanalyticslakehouse_spark.operators.align import (
    ContractViolation,
    ensure_contract,
    migration_ddl,
)

CONTRACT = {
    "video_id": "STRING",
    "window_start": "TIMESTAMP",
    "impressions": "BIGINT",
    "engagement_score": "DOUBLE",
}


def test_migration_ddl_for_stale_table():
    ddl = migration_ddl(
        "gold.rt_video_stats_1min",
        CONTRACT,
        existing_columns=["video_id", "window_start"],
    )
    assert ddl == [
        "ALTER TABLE gold.rt_video_stats_1min "
        "ADD COLUMNS (impressions BIGINT, engagement_score DOUBLE)"
    ]


def test_migration_ddl_empty_when_satisfied():
    assert (
        migration_ddl("gold.t", CONTRACT, existing_columns=list(CONTRACT)) == []
    )
    # extra physical columns beyond the contract are fine
    assert (
        migration_ddl(
            "gold.t", CONTRACT, existing_columns=[*CONTRACT, "extra_col"]
        )
        == []
    )


def test_ensure_contract_fails_fast_with_runnable_ddl():
    with pytest.raises(ContractViolation) as ei:
        ensure_contract(
            "gold.rt_video_stats_1min",
            CONTRACT,
            existing_columns=["video_id", "window_start", "impressions"],
        )
    err = ei.value
    assert err.missing == ["engagement_score"]
    assert err.ddl == [
        "ALTER TABLE gold.rt_video_stats_1min "
        "ADD COLUMNS (engagement_score DOUBLE)"
    ]
    assert "ALTER TABLE" in str(err)


def test_ensure_contract_noop_when_satisfied():
    ensure_contract("gold.t", CONTRACT, existing_columns=list(CONTRACT))
