"""verify_tree status semantics vs reference behavior (SURVEY §2.4 J1-J4)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fileverification_spark.operators import verify as V
from fileverification_spark.sources import pages as P


def _mk_live(spark, rows):
    # rows: (cell, url, text)
    df = spark.createDataFrame(rows, ["cell", "url", "text"])
    return df.withColumn("text_sha256", F.upper(F.sha2(F.col("text"), 256)))


def _mk_stored(spark, rows):
    return spark.createDataFrame(rows, ["cell", "child_key", "algo", "hash"])


def _sha(t):
    return hashlib.sha256(t.encode()).hexdigest().upper()


def _md5(t):
    return hashlib.md5(t.encode()).hexdigest().upper()


def test_statuses(spark):
    live = _mk_live(
        spark,
        [(1, "u/ok", "aaa"), (1, "u/fail", "bbb"), (2, "u/new", "ccc"), (1, "u/md5", "ddd")],
    )
    stored = _mk_stored(
        spark,
        [
            (1, "u/ok", "sha256", _sha("aaa")),
            (1, "u/fail", "sha256", "DEAD" * 16),
            (1, "u/md5", "md5", _md5("ddd")),      # mixed-algo manifest entry
            (1, "u/gone", "sha256", _sha("zzz")),  # no live page
        ],
    )
    rep = {r["child_key"]: r for r in V.verify_tree(live, stored).collect()}
    assert rep["u/ok"]["status"] == "OK"
    assert rep["u/fail"]["status"] == "FAIL"
    assert rep["u/new"]["status"] == "ADDED"
    assert rep["u/md5"]["status"] == "OK"  # recomputed with STORED algo
    assert rep["u/md5"]["computed_hash"] == _md5("ddd")
    assert rep["u/gone"]["status"] == "MISSING"
    assert rep["u/gone"]["computed_hash"] is None
    # ADDED rows get the default algorithm, implicitly trusted
    assert rep["u/new"]["algo"] == "sha256"
    assert rep["u/new"]["computed_hash"] == _sha("ccc")


def test_case_sensitive_stored_compare(spark):
    # stored lowercase hex of the right value -> FAIL (HashInfo.cs:262)
    live = _mk_live(spark, [(1, "u/a", "x")])
    stored = _mk_stored(spark, [(1, "u/a", "sha256", _sha("x").lower())])
    rep = V.verify_tree(live, stored).first()
    assert rep["status"] == "FAIL"


def test_unknown_algo_falls_back_to_sha256(spark):
    live = _mk_live(spark, [(1, "u/a", "x")])
    stored = _mk_stored(spark, [(1, "u/a", "whirlpool", _sha("x"))])
    rep = V.verify_tree(live, stored).first()
    assert rep["status"] == "OK"
    assert rep["algo"] == "sha256"


def test_remove_missing(spark):
    live = _mk_live(spark, [(1, "u/a", "x")])
    stored = _mk_stored(
        spark,
        [(1, "u/a", "sha256", _sha("x")), (1, "u/gone", "sha256", "AA")],
    )
    rep = V.verify_tree(live, stored)
    cleaned = V.remove_missing(stored, rep)
    assert [r["child_key"] for r in cleaned.collect()] == ["u/a"]


def test_point_verify_case_insensitive(spark):
    live = _mk_live(spark, [(1, "u/a", "x")])
    ok = V.point_verify(live, "u/a", _sha("x").lower()).first()
    assert ok["match"] is True
    bad = V.point_verify(live, "u/a", "00" * 32).first()
    assert bad["match"] is False


def test_tampered_manifest_statuses(spark, pages_small):
    rep = V.verify_tree(pages_small, V.tampered_manifest(pages_small))
    counts = {r["status"]: r["n"] for r in V.verify_counts(rep).collect()}
    n = pages_small.count()
    added = len([d for d in range(n) if d % 97 == 3])
    missing = len([d for d in range(n) if d % 101 == 11])
    failed = len([d for d in range(n) if d % 89 == 7 and d % 97 != 3])
    assert counts["ADDED"] == added
    assert counts["MISSING"] == missing
    assert counts["FAIL"] == failed
    assert counts["OK"] == n - added - failed


def test_report_log_fold(spark):
    live = _mk_live(spark, [(1, "u/ok", "aaa"), (1, "u/bad", "bbb")])
    stored = _mk_stored(
        spark,
        [
            (1, "u/ok", "sha256", _sha("aaa")),
            (1, "u/bad", "sha256", "DEAD" * 16),
            (2, "u/gone", "sha256", "AA"),
        ],
    )
    row = V.report_log(V.verify_tree(live, stored)).first()
    assert row["n_lines"] == 2
    assert row["log"].split("\n") == [
        "FAIL: Hash mismatch: u/bad.",
        "The file 'u/gone' does not exist.",
    ]


def test_report_log_empty(spark):
    live = _mk_live(spark, [(1, "u/ok", "aaa")])
    stored = _mk_stored(spark, [(1, "u/ok", "sha256", _sha("aaa"))])
    row = V.report_log(V.verify_tree(live, stored)).first()
    assert row["n_lines"] == 0
    assert row["log"] == ""


def test_verify_keys_statuses(spark):
    live = _mk_live(
        spark,
        [(1, "u/ok", "aaa"), (1, "u/fail", "bbb"), (1, "u/nohash", None)],
    )
    out = {
        r["url"]: r["status"]
        for r in V.verify_keys(
            live,
            [
                ("u/ok", _sha("aaa").lower()),   # ci compare (Program.cs:327)
                ("u/fail", "DEAD" * 16),
                ("u/nohash", _sha("x")),
                ("u/gone", _sha("x")),
            ],
        ).collect()
    }
    assert out == {
        "u/ok": "OK",
        "u/fail": "FAIL",
        "u/nohash": "NO_HASH",
        "u/gone": "MISSING",
    }


def test_verify_cell_scopes_to_one_cell(spark):
    live = _mk_live(
        spark, [(1, "u/a", "aaa"), (1, "u/b", "bbb"), (2, "u/c", "ccc")]
    )
    stored = _mk_stored(
        spark,
        [
            (1, "u/a", "sha256", _sha("aaa")),
            (1, "u/b", "sha256", "DEAD" * 16),
            (2, "u/c", "sha256", "DEAD" * 16),  # would FAIL, but out of scope
        ],
    )
    rows = V.verify_cell(live, stored, 1).collect()
    assert sorted((r["child_key"], r["status"]) for r in rows) == [
        ("u/a", "OK"),
        ("u/b", "FAIL"),
    ]
