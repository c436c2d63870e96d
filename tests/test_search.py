"""BM25 retrieval (operators/search.py): hand-computed scores, term
filtering, determinism of ranking."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from fileverification_spark.operators import search as SRCH


CORPUS = [
    (1, "apple banana apple"),
    (2, "banana cherry"),
    (3, "cherry cherry dates apple"),
    (4, "elderberry"),
]


def _bm25_ref(query, k1=SRCH.K1, b=SRCH.B):
    """Driver-side replay of the documented formula."""
    docs = {d: t.split() for d, t in CORPUS}
    n = len(docs)
    s = sum(len(v) for v in docs.values())
    terms = SRCH.query_terms(query)
    dfm = {
        t: sum(1 for v in docs.values() if t in v) for t in terms
    }
    out = {}
    for d, toks in docs.items():
        sc = 0.0
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or dfm[t] == 0:
                continue
            idf = math.log(1.0 + (n - dfm[t] + 0.5) / (dfm[t] + 0.5))
            sc += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * (len(toks) * n / s))
            )
        if sc:
            out[d] = round(sc, 4)
    return out


def test_hand_scores(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in SRCH.bm25_search(df, "apple cherry", k=10).collect()}
    assert got == _bm25_ref("apple cherry")


def test_ranking_and_k(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = SRCH.bm25_search(df, "apple cherry", k=2).collect()
    ref = sorted(_bm25_ref("apple cherry").items(),
                 key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["doc_id"], r["score"]) for r in rows] == ref


def test_unmatched_terms_ignored(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {r["doc_id"]: r["score"]
           for r in SRCH.bm25_search(df, "apple zzz", k=10).collect()}
    assert got == _bm25_ref("apple zzz")


def test_empty_query(spark):
    df = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    with pytest.raises(ValueError, match="no indexable terms"):
        SRCH.bm25_search(df, "!!! ???")


def test_query_tokenized_like_corpus():
    assert SRCH.query_terms("Fast, HASH-join!") == ["fast", "hash", "join"]


# ---------------------------------------------------------------------------
# Inverted index
# ---------------------------------------------------------------------------

def _idx_docs(spark):
    rows = [
        (1, "alpha beta beta"),   # beta twice in ONE doc -> df 1
        (2, "alpha gamma"),
        (3, "alpha gamma delta"),
        (4, "epsilon"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_inverted_index_df_and_postings(spark):
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in SRCH.inverted_index(_idx_docs(spark), min_df=1).collect()
    }
    assert got == {
        "alpha": (3, "1,2,3"),
        "beta": (1, "1"),       # within-doc repeat counted once
        "gamma": (2, "2,3"),
        "delta": (1, "3"),
        "epsilon": (1, "4"),
    }


def test_inverted_index_min_df_and_cap(spark):
    got = {
        r["term"]: (r["df"], r["postings"])
        for r in SRCH.inverted_index(
            _idx_docs(spark), min_df=2, postings_cap=2
        ).collect()
    }
    # alpha (df 3) exceeds the cap -> df kept, postings elided
    assert got == {"alpha": (3, ""), "gamma": (2, "2,3")}
