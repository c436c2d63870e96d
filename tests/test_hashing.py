"""Hash scalar semantics vs the reference (SURVEY §2.3).

Golden values computed with hashlib — the same role the reference's
__fv.txt files play for its folder trees.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fileverification_spark.functions import hashing


def _df(spark, text="hello wörld"):
    return spark.createDataFrame([(text,)], ["text"])


def test_hash_fixed_matches_hashlib(spark):
    text = "hello wörld"
    df = _df(spark, text)
    for algo, fn in [
        ("sha256", hashlib.sha256),
        ("md5", hashlib.md5),
        ("sha1", hashlib.sha1),
        ("sha512", hashlib.sha512),
    ]:
        got = df.select(hashing.hash_fixed(F.col("text"), algo)).first()[0]
        want = fn(text.encode("utf-8")).hexdigest().upper()
        assert got == want, algo


def test_hash_col_row_level_dispatch(spark):
    rows = [("abc", "md5"), ("abc", "SHA256"), ("abc", "bogus"), ("abc", " Sha1 ")]
    df = spark.createDataFrame(rows, ["text", "algo"])
    got = [
        r[0] for r in df.select(hashing.hash_col(F.col("text"), F.col("algo"))).collect()
    ]
    assert got[0] == hashlib.md5(b"abc").hexdigest().upper()
    assert got[1] == hashlib.sha256(b"abc").hexdigest().upper()
    # unknown algorithm -> sha256 (HashInfo.cs:131-149)
    assert got[2] == hashlib.sha256(b"abc").hexdigest().upper()
    # trimmed, case-insensitive
    assert got[3] == hashlib.sha1(b"abc").hexdigest().upper()


def test_hash_equal_case_sensitive(spark):
    df = spark.createDataFrame([("ABC", "abc")], ["a", "b"])
    assert df.select(hashing.hash_equal(F.col("a"), F.col("b"))).first()[0] is False
    assert df.select(hashing.hash_equal(F.col("a"), F.col("a"))).first()[0] is True


def test_hash_equal_blank_semantics(spark):
    # null/blank stored equals only null/blank computed (HashInfo.cs:255-263)
    df = spark.createDataFrame(
        [(None, None), (" ", ""), (None, "X"), ("X", None)], ["a", "b"]
    )
    got = [r[0] for r in df.select(hashing.hash_equal(F.col("a"), F.col("b"))).collect()]
    assert got == [True, True, False, False]


def test_hash_equal_ci(spark):
    df = spark.createDataFrame([("AbC", "aBc")], ["a", "b"])
    assert df.select(hashing.hash_equal_ci(F.col("a"), F.col("b"))).first()[0] is True


def test_record_serialize_format(spark):
    # name|algo_lower|hash (HashInfo.cs:271-274)
    df = spark.createDataFrame([("f.txt", "SHA256", "ABCD")], ["n", "a", "h"])
    got = df.select(
        hashing.record_serialize(F.col("n"), F.col("a"), F.col("h"))
    ).first()[0]
    assert got == "f.txt|sha256|ABCD"


def test_hash_unicode_byte_identical(spark):
    """SURVEY hard part (d): byte-identical text invariant across Arrow
    serialization — non-ASCII, control chars, emoji, NFC/NFD variants all
    hash identically to Python's hashlib over UTF-8 bytes."""
    import hashlib as H

    from pyspark.sql import functions as F

    texts = [
        "café",                      # NFC
        "café",                     # NFD (different bytes -> hash!)
        "日本語 \U0001f600",  # CJK + emoji (surrogate pair)
        "line\nbreak\ttab\x01ctrl",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = {
        r["text"]: r["h"]
        for r in df.select(
            "text", F.upper(F.sha2(F.col("text"), 256)).alias("h")
        ).collect()
    }
    for t in texts:
        assert got[t] == H.sha256(t.encode("utf-8")).hexdigest().upper(), t
    # NFC and NFD are different byte strings -> must differ (no implicit
    # normalisation anywhere in the pipeline)
    assert got["café"] != got["café"]
