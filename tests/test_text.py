"""Text-analysis function semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], ["text"]).select(col).first()[0]


def test_tokens_and_count(spark):
    assert _one(spark, "Hello, World 42!", TX.tokens(F.col("text"))) == [
        "hello",
        "world",
        "42",
    ]
    assert _one(spark, "", TX.token_count(F.col("text"))) == 0


def test_char_ngrams(spark):
    assert _one(spark, "abcdef", TX.char_ngrams(F.col("text"), 3)) == [
        "abc",
        "bcd",
        "cde",
        "def",
    ]
    assert _one(spark, "ab", TX.char_ngrams(F.col("text"), 3)) == []


def test_fingerprint_normalises(spark):
    a = _one(spark, "  The   QUICK  fox\n", TX.fingerprint(F.col("text")))
    b = _one(spark, "the quick fox", TX.fingerprint(F.col("text")))
    c = _one(spark, "the quick cat", TX.fingerprint(F.col("text")))
    assert a == b != c
    assert a == a.upper() and len(a) == 64


def test_lang_id_heuristic(spark):
    assert _one(spark, "the cat and the hat is a cat", TX.lang_id(F.col("text"))) == "en"
    assert _one(spark, "der hund und die katze ist ein", TX.lang_id(F.col("text"))) == "de"
    assert _one(spark, "xyzzy qwfp", TX.lang_id(F.col("text"))) == "und"
    # tie-break: first in LANG_ORDER wins ('the' en x1 vs 'der' de x1 -> en)
    assert _one(spark, "the der", TX.lang_id(F.col("text"))) == "en"


def test_quality_scores_shape(spark):
    cols = TX.quality_scores(F.col("text"))
    row = (
        spark.createDataFrame([("the quick fox jumps, twice!",)], ["text"])
        .select(*[v.alias(k) for k, v in cols.items()])
        .first()
    )
    assert row["n_tokens"] == 5
    assert 0 < row["punct_ratio"] < 0.2
    assert 0 < row["stop_ratio"] <= 0.2
    assert 0 <= row["quality_score"] <= 1


def _ease_py(text: str) -> int:
    """Pure-Python replay of the exact-integer Flesch rule."""
    import re

    w = max(len(re.findall(r"[A-Za-z]+", text)), 1)
    s = max(len(re.findall(r"[.!?]+", text)), 1)
    v = len(re.findall(r"[aeiouyAEIOUY]+", text))
    return 206835 - (1015 * w) // s - (84600 * v) // w


def test_reading_ease_matches_python_replay(spark):
    texts = [
        "The cat sat. It was fat!",
        "a",
        "",
        "Incomprehensibility notwithstanding, perspicacious readers"
        " persevere; unyielding complexity occasionally overwhelms.",
        "No terminal punctuation here",
        "Three?! sentences... right here. ok",
    ]
    ease = TX.reading_ease_milli(F.col("text"))
    df = spark.createDataFrame([(t,) for t in texts], ["text"]).select(
        "text", ease.alias("e"), TX.ease_grade(ease).alias("g")
    )
    for r in df.collect():
        want = _ease_py(r["text"])
        assert r["e"] == want  # exact, no tolerance
        bands = [(90000, "very_easy"), (70000, "easy"), (50000, "medium"),
                 (30000, "hard")]
        wg = next((g for b, g in bands if want >= b), "very_hard")
        assert r["g"] == wg


def test_reading_ease_sql_mirror_matches(spark):
    import duckdb

    texts = ["The cat sat. It was fat!", "", "why? because. so!"]
    con = duckdb.connect()
    for t in texts:
        got = con.execute(
            f"SELECT {TX.sql_reading_ease_milli('text')},"
            f" {TX.sql_ease_grade(TX.sql_reading_ease_milli('text'))}"
            " FROM (SELECT ? AS text)",
            [t],
        ).fetchone()
        assert got[0] == _ease_py(t)
