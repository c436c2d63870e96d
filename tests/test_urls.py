"""URL canonicalization rules (functions/urls.py contract), each pinned
by a hand case, plus idempotence and the SQL-mirror parity the demoted
contract relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from fileverification_spark.functions import urls as U


CASES = [
    # (input, expected canonical)
    ("HTTP://Example.COM/Path", "http://example.com/Path"),      # case rules
    ("http://www.example.com/a", "http://example.com/a"),        # www strip
    ("http://example.com:80/a", "http://example.com/a"),         # default port
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:443/a", "http://example.com:443/a"),    # NOT default
    ("https://example.com:8080/a", "https://example.com:8080/a"),
    ("http://example.com/a/b/", "http://example.com/a/b"),       # trailing /
    ("http://example.com/", "http://example.com"),
    ("http://example.com", "http://example.com"),
    ("http://example.com/a#frag", "http://example.com/a"),       # fragment
    ("http://example.com/a?z=1&b=2&a=3", "http://example.com/a?a=3&b=2&z=1"),
    ("http://example.com/a?utm_source=x&q=1&fbclid=Y&gclid=Z&msclkid=W",
     "http://example.com/a?q=1"),                                # tracking
    ("http://example.com/a?utm_source=x", "http://example.com/a"),
    ("http://example.com/A?Q=1", "http://example.com/A?Q=1"),    # path/query case kept
    ("not a url at all", "not a url at all"),                    # passthrough
    ("relative/path?utm_source=x", "relative/path?utm_source=x"),
]


def test_rules(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    got = [
        r["c"]
        for r in df.select(U.url_canonicalize(F.col("url")).alias("c"))
        .collect()
    ]
    assert got == [want for _, want in CASES]


def test_idempotent(spark):
    """canonicalize(canonicalize(x)) == canonicalize(x) — required for a
    key that may be re-derived downstream of a prior normalisation."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = U.url_canonicalize(F.col("url"))
    df2 = df.select(once.alias("c1")).select(
        F.col("c1"), U.url_canonicalize(F.col("c1")).alias("c2")
    )
    assert df2.where(F.col("c1") != F.col("c2")).count() == 0


def test_sql_mirror_parity(spark):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{u}')" for i, (u, _) in enumerate(CASES))
        + ") v(doc_id, url)"
    )
    got = dict(
        con.execute(
            U.sql_canonical_select("t") + " ORDER BY doc_id"
        ).fetchall()
    )
    assert [got[i] for i in range(len(CASES))] == [w for _, w in CASES]


def test_fuzz_parity_and_idempotence(spark):
    """300 seeded messy URLs (random case, ports, params incl. tracking,
    fragments, trailing slashes, empty segments, non-URLs): Spark and
    the DuckDB mirror must agree on every canonical form, and the form
    must be a fixpoint."""
    import random

    rng = random.Random(20260818)
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp", ""]
    hosts = ["Example.COM", "www.Site.org", "WWW.a.b.C", "x.io"]
    ports = ["", ":80", ":443", ":8080", ":0080"]
    paths = ["", "/", "/A/b", "/a//b/", "/%7Euser", "/a.b"]
    queries = ["", "?", "?a=1", "?b=2&a=1&a=0", "?utm_source=x&q=1",
               "?fbclid=Z", "?&&", "?a", "?=v"]
    frags = ["", "#", "#frag", "#a#b"]
    urls = []
    for i in range(300):
        s = rng.choice(schemes)
        base = (s + "://") if s else ""
        urls.append(
            base + rng.choice(hosts) + rng.choice(ports)
            + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        )

    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    got_spark = {
        r["doc_id"]: r["c"]
        for r in df.select(
            "doc_id", U.url_canonicalize(F.col("url")).alias("c")
        ).collect()
    }

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "({}, '{}')".format(i, u.replace("'", "''"))
            for i, u in enumerate(urls)
        )
        + ") v(doc_id, url)"
    )
    got_sql = dict(con.execute(U.sql_canonical_select("t")).fetchall())
    assert got_spark == got_sql

    # idempotence over the whole fuzz set (via the SQL mirror — same
    # semantics, no second JVM pass)
    con.execute("CREATE TABLE c1 AS " + U.sql_canonical_select("t", "url"))
    twice = dict(
        con.execute(
            U.sql_canonical_select("(SELECT doc_id, canonical_url AS url FROM c1) s")
        ).fetchall()
    )
    assert twice == got_sql


# ---------------------------------------------------------------------------
# SURT keys
# ---------------------------------------------------------------------------

def test_surt_key_worked_examples(spark):
    cases = [
        # pywb-style worked example (canonical input)
        ("https://sub.example.com:8080/A/b?q=1", "com,example,sub:8080)/a/b?q=1"),
        ("https://example.com/path", "com,example)/path"),
    ]
    df = spark.createDataFrame(
        [(c[0],) for c in cases[:2]], "url string"
    ).select(U.surt_key(F.col("url")).alias("surt"))
    assert [r["surt"] for r in df.collect()] == [c[1] for c in cases[:2]]


def test_surt_key_bare_host_and_null(spark):
    df = spark.createDataFrame(
        [("https://example.org",), ("not-a-url",), ("/rel/path",)],
        "url string",
    ).select(U.surt_key(F.col("url")).alias("surt"))
    got = [r["surt"] for r in df.collect()]
    assert got == ["org,example)", None, None]


def test_surt_prefix_clusters_subdomains(spark):
    # every subdomain of example.com shares the 'com,example' prefix —
    # the range-scan property the CDX layout depends on
    df = spark.createDataFrame(
        [
            ("https://example.com/a",),
            ("https://www2.example.com/b",),
            ("https://a.b.example.com/c",),
        ],
        "url string",
    ).select(U.surt_key(F.col("url")).alias("surt"))
    assert all(r["surt"].startswith("com,example") for r in df.collect())


def test_surt_subtree_range_excludes_string_extension_siblings(spark):
    """The domain-subtree range is prefix + ')' (apex) or prefix + ','
    (subdomains) — NOT a bare startswith, which would also match a
    sibling domain whose name merely extends the string (ADVICE r3:
    examplefoo.com -> 'com,examplefoo)...')."""
    df = spark.createDataFrame(
        [
            ("https://example.com/a",),        # apex: IN
            ("https://www2.example.com/b",),   # subdomain: IN
            ("https://examplefoo.com/c",),     # string-extension sibling: OUT
            ("https://example.org/d",),        # other TLD: OUT
        ],
        "url string",
    ).select(U.surt_key(F.col("url")).alias("surt"))
    pfx = "com,example"
    kept = [
        r["surt"] for r in df.collect()
        if r["surt"].startswith(pfx + ")") or r["surt"].startswith(pfx + ",")
    ]
    assert len(kept) == 2
    assert not any("examplefoo" in s or "org" in s for s in kept)


def test_surt_composes_with_canonicalize(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Example.COM:443/A/?utm_source=x",)], "url string"
    ).select(
        U.surt_key(U.url_canonicalize(F.col("url"))).alias("surt")
    )
    assert df.collect()[0]["surt"] == "com,example)/a"


# ---------------------------------------------------------------------------
# robots.txt / sitemap parsing
# ---------------------------------------------------------------------------

def test_robots_disallows_subset_semantics(spark):
    txt = (
        "# comment\n"
        "User-agent: *\n"
        "Disallow: /a\n"
        "Allow: /a/ok\n"          # Allow ignored (conservative subset)
        "Disallow:\n"             # empty = allow-all line: no match
        "DISALLOW:   /B/c#frag\n"  # case-insensitive; fragment cut
        "disallow: noslash\n"      # not a path: no match
        "User-agent: badbot\n"
        "Disallow: /bot-only\n"    # matched too (all-agents reading)
    )
    df = spark.createDataFrame([(txt,)], "t string").select(
        U.robots_disallows(F.col("t")).alias("d")
    )
    assert df.collect()[0]["d"] == ["/a", "/B/c", "/bot-only"]


def test_sitemap_locs_absolute_only_and_trimmed(spark):
    xml = (
        "<urlset><url><loc>  https://x.net/1 </loc></url>"
        "<url><LOC>https://x.net/upper</LOC></url>"
        "<url><loc>/relative</loc></url></urlset>"
    )
    df = spark.createDataFrame([(xml,)], "x string").select(
        U.sitemap_locs(F.col("x")).alias("l")
    )
    assert df.collect()[0]["l"] == ["https://x.net/1", "https://x.net/upper"]


def test_robots_rules_feed_robots_filter(spark):
    # end-to-end: parse robots text -> rules relation -> filter pages
    from fileverification_spark.operators import curation as CUR

    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /en\n")],
        "host string, robots_txt string",
    )
    rules = robots.select(
        "host",
        F.explode(U.robots_disallows(F.col("robots_txt"))).alias(
            "path_prefix"
        ),
    )
    pages = spark.createDataFrame(
        [(1, "https://a.com/en/x"), (2, "https://a.com/de/x")],
        "doc_id long, url string",
    )
    kept = {r["doc_id"] for r in CUR.robots_filter(pages, rules).collect()}
    assert kept == {2}


def test_robots_crawl_delay(spark):
    from pyspark.sql import functions as F

    from fileverification_spark.functions import urls as U

    cases = [
        ("User-agent: *\nCrawl-delay: 7\nDisallow: /x\n", 7),
        ("  crawl-delay:\t12\n", 12),           # case/space variants
        ("Crawl-delay: 3\nCrawl-delay: 9\n", 3),  # first wins
        ("User-agent: *\nDisallow: /\n", 0),     # absent -> 0
        ("", 0),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "i long, t string"
    ).select("i", U.robots_crawl_delay(F.col("t")).alias("d"))
    got = {r["i"]: r["d"] for r in df.collect()}
    assert got == {i: d for i, (_, d) in enumerate(cases)}

    import duckdb

    con = duckdb.connect()
    for t, want in cases:
        assert con.execute(
            f"SELECT {U.sql_robots_crawl_delay('t')} FROM (SELECT ? AS t)",
            [t],
        ).fetchone()[0] == want
