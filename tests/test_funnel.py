"""Ordered-funnel conversion (operators/funnel.py): strictly-later
chain, broken-chain NULLs, epoch-us exactness."""

from __future__ import annotations

import pytest

from fileverification_spark.operators import funnel as FN


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, e) for u, t, e in rows],
        "user_id long, ts_s string, event_type string",
    ).selectExpr("user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")


def test_funnel_chain_and_breaks(spark):
    rows = [
        # u1 completes in order
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # u2: purchase BEFORE click -> purchase must NOT count
        (2, "2024-01-01 09:00:00", "view"),
        (2, "2024-01-01 09:30:00", "purchase"),
        (2, "2024-01-01 09:45:00", "click"),
        # u3: view only
        (3, "2024-01-02 08:00:00", "view"),
        # u4: click/purchase but never viewed -> absent from the funnel
        (4, "2024-01-01 11:00:00", "click"),
        (4, "2024-01-01 11:05:00", "purchase"),
        # u1 noise: later duplicate stage events don't move the mins
        (1, "2024-01-01 12:00:00", "click"),
    ]
    got = {
        r["user_id"]: (
            r["t1_us"], r["t2_us"], r["t3_us"], r["stages_reached"]
        )
        for r in FN.funnel(_events(spark, rows)).collect()
    }

    def us(s):
        from datetime import datetime, timezone

        return int(
            datetime.fromisoformat(s)
            .replace(tzinfo=timezone.utc)
            .timestamp()
            * 1_000_000
        )

    assert set(got) == {1, 2, 3}
    assert got[1] == (
        us("2024-01-01 10:00:00"),
        us("2024-01-01 10:05:00"),
        us("2024-01-01 10:10:00"),
        3,
    )
    # u2's click is after view, but no purchase follows the click
    assert got[2] == (
        us("2024-01-01 09:00:00"), us("2024-01-01 09:45:00"), None, 2
    )
    assert got[3] == (us("2024-01-02 08:00:00"), None, None, 1)


def test_funnel_requires_two_stages(spark):
    with pytest.raises(ValueError, match="at least 2"):
        FN.funnel(_events(spark, []), stages=("view",))


def test_retention_cohort_triangle(spark):
    rows = [
        # u1 signs up Jan 1, active Jan 1 (twice) + Jan 3
        (1, "2024-01-01 10:00:00", "signup"),
        (1, "2024-01-01 12:00:00", "view"),
        (1, "2024-01-03 09:00:00", "click"),
        # u2 signs up Jan 1 too, active only that day
        (2, "2024-01-01 08:00:00", "signup"),
        # u3 signs up Jan 2; has PRE-signup activity (excluded)
        (3, "2024-01-01 23:00:00", "view"),
        (3, "2024-01-02 10:00:00", "signup"),
        (3, "2024-01-04 10:00:00", "purchase"),
        # u4 never signs up -> absent
        (4, "2024-01-01 11:00:00", "view"),
    ]
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in FN.retention(_events(spark, rows)).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,  # u1 + u2 on signup day
        ("2024-01-01", 2): 1,  # u1 on Jan 3
        ("2024-01-02", 0): 1,  # u3 signup day
        ("2024-01-02", 2): 1,  # u3 on Jan 4
    }
