"""HTML -> text extraction (functions/html.py): each stripping rule,
entity ordering, and the planted-corpus roundtrip."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from fileverification_spark.functions import html as HT

CASES = [
    ("<p>hello <b>world</b></p>", "hello world"),
    ("<script>if (a<b) x();</script>keep", "keep"),
    ("<style>p { color: red }</style>keep", "keep"),
    ("a<!-- no -->b", "a b"),
    ("x &amp; y &lt;z&gt; &quot;q&quot; &#39;s&#39;&nbsp;!", "x & y <z> \"q\" 's' !"),
    ("&amp;lt;", "&lt;"),  # double-encoded stays encoded once (&amp; last)
    ("  lots\n\tof\r\n ws  ", "lots of ws"),
    ('<a href="u">link</a>', "link"),
    ("<SCRIPT>shout()</SCRIPT>ok", "ok"),  # (?i) on block tags
    ("plain text", "plain text"),
]


def test_rules(spark):
    df = spark.createDataFrame([(h,) for h, _ in CASES], "h string")
    got = [
        r["t"]
        for r in df.select(
            HT.html_to_text(F.encode(F.col("h"), "UTF-8")).alias("t")
        ).collect()
    ]
    assert got == [w for _, w in CASES]


def test_sql_mirror_parity():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "({}, '{}')".format(i, h.replace("'", "''"))
            for i, (h, _) in enumerate(CASES)
        )
        + ") v(i, h)"
    )
    rows = con.execute(
        f"SELECT i, {HT.sql_html_to_text('h')} FROM t ORDER BY i"
    ).fetchall()
    assert [t for _, t in rows] == [w for _, w in CASES]


def test_wet_roundtrip(spark):
    """Stripping the derived '<html><body>TEXT</body></html>' page
    recovers the whitespace-normalised text — html_to_text feeds the
    same sha path the raw text does."""
    from fileverification_spark.sources import pages as P

    pg = P.pages(spark, "/root/testdata/sf0.001", with_html=True)
    bad = pg.select(
        HT.html_to_text(F.col("html")).alias("a"),
        F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")).alias("b"),
    ).where(F.col("a") != F.col("b"))
    assert bad.count() == 0


META_CASES = [
    # (html, want_title, want_desc)
    (
        '<html><head><title> My  Page\n Title </title>'
        '<meta name="description" content="A desc  here"></head></html>',
        "My Page Title",
        "A desc here",
    ),
    ("<HTML><TITLE>caps</TITLE></HTML>", "caps", ""),
    ("<p>no head at all</p>", "", ""),
    # lazy match: first title wins; attributes on the tag allowed
    (
        '<title id="t">first</title><title>second</title>',
        "first",
        "",
    ),
    # meta with single-quoted/reordered attributes is out of scope
    ("<meta content='x' name='description'>", "", ""),
]


def test_html_title_and_meta_description(spark):
    df = spark.createDataFrame(
        [(i, h) for i, (h, _, _) in enumerate(META_CASES)],
        "i long, h string",
    ).select(
        "i",
        HT.html_title(F.encode("h", "UTF-8")).alias("t"),
        HT.meta_description(F.encode("h", "UTF-8")).alias("d"),
    )
    got = {r["i"]: (r["t"], r["d"]) for r in df.collect()}
    assert got == {
        i: (t, d) for i, (_, t, d) in enumerate(META_CASES)
    }


def test_html_meta_sql_mirror_matches():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, '%s')" % (i, h.replace("'", "''"))
            for i, (h, _, _) in enumerate(META_CASES)
        )
        + ") v(i, h)"
    )
    rows = con.execute(
        f"SELECT {HT.sql_html_title('h')}, {HT.sql_meta_description('h')}"
        " FROM t ORDER BY i"
    ).fetchall()
    assert [tuple(r) for r in rows] == [
        (t, d) for _, t, d in META_CASES
    ]
