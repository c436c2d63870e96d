"""Capture-history churn + adaptive recrawl (operators/captures.py)."""

from __future__ import annotations

from datetime import datetime

from fileverification_spark.operators import captures as CAP


def _caps(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2024, 1, d), h) for u, d, h in rows],
        "url string, ts timestamp, digest string",
    )


def test_capture_churn_hand_case(spark):
    caps = _caps(
        spark,
        [
            # a: H1 -> H1 -> H2 -> H1  (2 changes, 2 versions)
            ("a", 1, "H1"),
            ("a", 2, "H1"),
            ("a", 3, "H2"),
            ("a", 4, "H1"),
            # b: single capture (no change evidence)
            ("b", 1, "H9"),
            # c: frozen twice
            ("c", 1, "H5"),
            ("c", 9, "H5"),
        ],
    )
    got = {r["url"]: r.asDict() for r in CAP.capture_churn(caps).collect()}
    assert got["a"]["n_captures"] == 4
    assert got["a"]["n_versions"] == 2
    assert got["a"]["n_changes"] == 2
    assert got["b"]["n_changes"] == 0 and got["b"]["n_versions"] == 1
    assert got["c"]["n_changes"] == 0 and got["c"]["n_captures"] == 2
    # span pins the ts order was respected
    assert got["a"]["first_ts_epoch"] < got["a"]["last_ts_epoch"]


def test_recrawl_priority_bands(spark):
    caps = _caps(
        spark,
        [
            # hot: changes every capture (2 changes / 2 gaps = 1000 milli)
            ("hot", 1, "A"),
            ("hot", 2, "B"),
            ("hot", 3, "C"),
            # warm: 1 change / 3 gaps = 333 milli
            ("warm", 1, "A"),
            ("warm", 2, "A"),
            ("warm", 3, "B"),
            ("warm", 4, "B"),
            # cold-frozen: 0 changes; cold-single: no evidence
            ("frozen", 1, "A"),
            ("frozen", 2, "A"),
            ("single", 1, "A"),
        ],
    )
    got = {
        r["url"]: (r["churn_milli"], r["band"])
        for r in CAP.recrawl_priority(caps).collect()
    }
    assert got["hot"] == (1000, "hot")
    assert got["warm"] == (333, "warm")
    assert got["frozen"] == (0, "cold")
    assert got["single"] == (0, "cold")
