"""Curation pipeline: dedup keeps exactly one doc per fingerprint, gates
are monotone, and stats reconcile with the row-level stages."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX
from fileverification_spark.operators import curation as CUR

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_dedup_keepers_one_per_fingerprint(spark):
    docs = _docs(spark)
    uniq = CUR.dedup_keepers(docs)
    n_fp = docs.select(TX.fingerprint(F.col("text"))).distinct().count()
    assert uniq.count() == n_fp
    # keeper is min doc_id within its fingerprint group
    fp = docs.select("doc_id", TX.fingerprint(F.col("text")).alias("fp"))
    mins = {r["fp"]: r["m"] for r in fp.groupBy("fp").agg(F.min("doc_id").alias("m")).collect()}
    kept = {r["doc_id"] for r in uniq.collect()}
    assert kept == set(mins.values())


def test_curate_gates(spark):
    cur = CUR.curate(_docs(spark)).collect()
    assert cur, "some documents must survive the default gates"
    for r in cur:
        assert r["n_tokens"] >= CUR.MIN_TOKENS
        assert r["quality_score"] >= CUR.MIN_QUALITY


def test_curation_stats_reconcile(spark):
    cur = CUR.curate(_docs(spark))
    stats = CUR.curation_stats(cur).collect()
    assert sum(r["n_docs"] for r in stats) == cur.count()
    want_tokens = cur.agg(F.sum("n_tokens")).first()[0]
    assert sum(r["total_tokens"] for r in stats) == want_tokens
    assert len({r["lang"] for r in stats}) == len(stats)


def test_vocab_topk_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana"),
            (1, "apple cherry"),
            (2, "banana banana cherry"),
        ],
        ["doc_id", "text"],
    )
    rows = CUR.vocab_topk(docs, k=2).orderBy("rank").collect()
    # apple: 3 occ in 2 docs; banana: 3 occ in 2 docs -> tie broken by
    # token ASC; cherry (2 occ) misses the top-2 cut
    assert [(r.token, r.n_occurrences, r.n_docs, r.rank) for r in rows] == [
        ("apple", 3, 2, 1),
        ("banana", 3, 2, 2),
    ]


def test_vocab_topk_no_expand_in_plan(spark):
    plan = (
        CUR.vocab_topk(_docs(spark), k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" not in plan, "distinct-doc count must be two-level agg"


def test_tfidf_top_terms_hand_case(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry dates"),
        ],
        ["doc_id", "text"],
    )
    rows = CUR.tfidf_top_terms(docs, k=1).orderBy("doc_id").collect()

    def score(tf, df, n=3):
        return round(tf * (math.log((n + 1) / (df + 1)) + 1.0), 4)

    # doc 1: apple tf=2 df=1 beats banana tf=1 df=2
    # doc 2: cherry (df=2) vs banana (df=2) tie on score -> term ASC
    # doc 3: cherry tf=3 dominates
    assert [(r.doc_id, r.term, r.tf, r.df, r.score) for r in rows] == [
        (1, "apple", 2, 1, score(2, 1)),
        (2, "banana", 1, 2, score(1, 2)),
        (3, "cherry", 3, 2, score(3, 2)),
    ]


def test_tfidf_rank_uses_rounded_score_and_term_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "zeta alpha"), (2, "zeta alpha")], ["doc_id", "text"]
    )
    rows = CUR.tfidf_top_terms(docs, k=1).collect()
    # identical tf/df for both terms in both docs -> tie on score,
    # term ASC wins deterministically
    assert all(r.term == "alpha" for r in rows) and len(rows) == 2


# ---------------------------------------------------------------------------
# Robots-style URL prefix filtering
# ---------------------------------------------------------------------------

def test_robots_filter_semantics(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.com/en/x"),    # blocked: host+prefix
            (2, "https://a.com/de/x"),    # kept: prefix differs
            (3, "https://b.com/en/x"),    # kept: host differs
            (4, "https://c.com/any"),     # blocked: '/' whole host
            (5, "https://a.com/enx"),     # blocked: '/en' prefix of '/enx'
            (6, "https://a.com:8080/en/x"),  # kept: host incl. port differs
        ],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/en"), ("c.com", "/")],
        "host string, path_prefix string",
    )
    kept = {
        r["doc_id"] for r in CUR.robots_filter(pages, rules).collect()
    }
    assert kept == {2, 3, 6}


def test_robots_filter_broadcast_plan(spark):
    pages = spark.createDataFrame(
        [(1, "https://a.com/x")], "doc_id long, url string"
    )
    rules = spark.createDataFrame(
        [("a.com", "/y")], "host string, path_prefix string"
    )
    plan = CUR.robots_filter(pages, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_boilerplate_paras_threshold(spark):
    import hashlib

    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "NAV\n\nstory one\n\npromo"),
            ("https://a.com/2", "NAV\n\nstory two"),
            ("https://a.com/3", "NAV\n\nstory three"),
            ("https://b.com/1", "other\n\nNAV"),  # different host: own count
        ],
        "url string, text string",
    )
    got = {
        (r["host"], r["para_sha256"]): (r["n_pages"], r["host_pages"])
        for r in CUR.boilerplate_paras(pages, min_pct=60).collect()
    }
    nav = hashlib.sha256(b"NAV").hexdigest().upper()
    # NAV on 3/3 of a.com (kept); promo 1/3 (dropped); b.com has ONE
    # page -> exempt entirely (min_host_pages floor)
    assert got == {("a.com", nav): (3, 3)}


def test_boilerplate_duplicate_para_counted_once_per_page(spark):
    import hashlib

    pages = spark.createDataFrame(
        [
            ("https://c.com/1", "X\n\nX\n\nbody one"),
            ("https://c.com/2", "X\n\nbody two"),
        ],
        "url string, text string",
    )
    got = {
        r["para_sha256"]: r["n_pages"]
        for r in CUR.boilerplate_paras(pages, min_pct=100).collect()
    }
    x = hashlib.sha256(b"X").hexdigest().upper()
    assert got == {x: 2}  # distinct (host, url, para): page 1 counts once


def test_remove_boilerplate_strips_templates_in_order(spark):
    pages = spark.createDataFrame(
        [
            ("https://a.com/1", "NAV\n\nstory one\n\nmore one\n\nFOOT"),
            ("https://a.com/2", "NAV\n\nstory two\n\nFOOT"),
            ("https://b.com/1", "NAV\n\nother site"),  # b.com: NAV is 100%
        ],
        "url string, text string",
    )
    got = {
        r["url"]: (r["clean_text"], r["n_paras"], r["n_kept"])
        for r in CUR.remove_boilerplate(pages, min_pct=100).collect()
    }
    assert got["https://a.com/1"] == ("story one\n\nmore one", 4, 2)
    assert got["https://a.com/2"] == ("story two", 3, 1)
    # b.com has ONE page: exempt from template detection (min_host_pages)
    # — without the floor every paragraph trivially hits 100% and the
    # page would be emptied
    assert got["https://b.com/1"] == ("NAV\n\nother site", 2, 2)


def test_remove_boilerplate_all_template_page_empty(spark):
    pages = spark.createDataFrame(
        [
            ("https://c.com/1", "NAV\n\nFOOT"),
            ("https://c.com/2", "NAV\n\nFOOT"),
        ],
        "url string, text string",
    )
    got = {
        r["url"]: (r["clean_text"], r["n_kept"])
        for r in CUR.remove_boilerplate(pages, min_pct=100).collect()
    }
    assert got == {
        "https://c.com/1": ("", 0),
        "https://c.com/2": ("", 0),
    }


def test_collocations_hand_corpus(spark):
    import math

    docs = spark.createDataFrame(
        [
            (1, "new york new york new york"),
            (2, "york minster and new ideas"),
            (3, "brand new day in york"),
        ],
        "doc_id long, text string",
    )
    got = CUR.collocations_topk(docs, k=3, min_count=2).collect()
    # replay: bigram/unigram counts by hand
    toks = [
        ["new", "york", "new", "york", "new", "york"],
        ["york", "minster", "and", "new", "ideas"],
        ["brand", "new", "day", "in", "york"],
    ]
    uni, bi = {}, {}
    T = B = 0
    for ts in toks:
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
            T += 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            B += 1
    want = []
    for (a, b), n in bi.items():
        if n >= 2:
            s = round(math.log((n * T * T) / (B * uni[a] * uni[b])), 4)
            want.append((a, b, n, s))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert [(r["a"], r["b"], r["n_ab"], r["score"]) for r in got] == want[:3]
    assert got[0]["a"] == "new" and got[0]["b"] == "york"


def test_c4_clean_line_and_page_rules(spark):
    from fileverification_spark.operators import curation as C

    text = "\n".join([
        "This line has five good words here.",   # kept
        "Too short.",                            # < 5 words -> dropped
        "no terminal punctuation on this line",  # dropped
        'A quoted ending works fine as well."',  # kept (end quote)
        "Beware the JavaScript menace on pages today.",  # dropped (ci)
        "Another perfectly valid sentence ends right here!",  # kept
    ])
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = C.c4_clean(docs).collect()[0]
    assert r["n_kept"] == 3 and r["n_dropped"] == 3
    assert r["page_ok"] is True  # no brace/lorem, >= 3 kept
    assert r["clean_text"].split("\n") == [
        "This line has five good words here.",
        'A quoted ending works fine as well."',
        "Another perfectly valid sentence ends right here!",
    ]
    # page poisons flip page_ok even when lines survive
    for poison in ("x = { 1 }.", "Lorem Ipsum filler text."):
        docs2 = spark.createDataFrame(
            [(2, text + "\n" + poison)], "doc_id long, text string"
        )
        assert C.c4_clean(docs2).collect()[0]["page_ok"] is False
    # a page with < 3 surviving lines fails too
    docs3 = spark.createDataFrame(
        [(3, "One single valid sentence right here.")],
        "doc_id long, text string",
    )
    assert C.c4_clean(docs3).collect()[0]["page_ok"] is False


def test_unigram_surprisal_hand_replayed(spark):
    """Integer floor-log2 surprisal replayed by hand: corpus 'a a a b'
    -> N=4, c(a)=3, c(b)=1; bits(a)=floor(log2(4 div 3))=0,
    bits(b)=floor(log2(4))=2."""
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in CUR.unigram_surprisal(docs).collect()}
    assert got[1].n_tokens == 3 and got[1].surprisal_bits == 0
    assert got[1].mean_millibits == 0
    assert got[2].n_tokens == 1 and got[2].surprisal_bits == 2
    assert got[2].mean_millibits == 2000


def test_unigram_surprisal_separates_rare_from_templated(spark):
    """A doc of corpus-unique tokens scores strictly higher mean bits
    than a doc repeating the corpus's dominant token; tokenless docs
    are absent."""
    rows = [(i, "the the the the") for i in range(8)]
    rows += [(100, "zyxqv kjhgf wwoper")]   # unique-token doc
    rows += [(101, "...")]                  # no tokens at all
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in CUR.unigram_surprisal(docs).collect()}
    assert 101 not in got
    assert got[100].mean_millibits > got[0].mean_millibits
