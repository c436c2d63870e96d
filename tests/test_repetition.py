"""Corpus-hygiene semantics: repetition gates + decontamination.

Oracle parity for both contract queries is covered by
tests/test_demoted_contract.py; these tests pin the SEMANTICS on
hand-built documents where the right answer is computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX
from fileverification_spark.operators import repetition as REP


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_word_ngrams_basics(spark):
    out = (
        _docs(spark, ["a b c d", "x", ""])
        .select("doc_id", TX.word_ngrams(TX.tokens(F.col("text")), 2).alias("g"))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].g == ["a b", "b c", "c d"]
    assert out[1].g == []
    assert out[2].g == []


def test_repetition_stats_hand_computed(spark):
    # doc 0: "a b a b a b" -> 2-grams [ab, ba, ab, ba, ab]: 5 total,
    # 2 distinct -> dup2 = 3/5, top2 = 3/5; 3-grams [aba, bab, aba, bab]:
    # dup3 = 2/4, top3 = 2/4 -> flagged.
    # doc 1: 11 all-distinct tokens -> dup fracs 0, top fracs 1/total
    # (10 2-grams, 9 3-grams), under every gate.
    rows = {
        r.doc_id: r
        for r in REP.repetition_stats(
            _docs(spark, ["a b a b a b", "q w e r t y u i o p m"])
        ).collect()
    }
    r0, r1 = rows[0], rows[1]
    assert r0.n_tokens == 6
    assert r0.dup2_frac == pytest.approx(0.6)
    assert r0.top2_frac == pytest.approx(0.6)
    assert r0.dup3_frac == pytest.approx(0.5)
    # doc 0 exceeds every gate but has < MIN_GATE_TOKENS tokens -> abstain
    assert r0.repetitive is False
    assert r1.n_tokens == 11
    assert r1.dup2_frac == 0.0
    assert r1.top2_frac == pytest.approx(0.1)
    assert r1.repetitive is False


def test_repetition_gate_fires_on_long_repetitive_doc(spark):
    # 12 tokens of pure "a b" repetition -> dup2/top2 ~ 1, flagged
    r = REP.repetition_stats(_docs(spark, ["a b " * 6])).first()
    assert r.n_tokens == 12
    assert r.dup2_frac > REP.DUP2_MAX
    assert r.repetitive is True


def test_repetition_stats_short_and_empty_docs(spark):
    # fewer tokens than the 3-gram order -> zero 3-gram fracs; tiny docs
    # never flagged (MIN_GATE_TOKENS abstention), even "one two" whose
    # single 2-gram makes top2_frac = 1.0
    rows = REP.repetition_stats(_docs(spark, ["", "one", "one two"])).collect()
    for r in rows:
        assert r.dup3_frac == 0.0 and r.top3_frac == 0.0
        assert r.repetitive is False


def test_decontaminate_planted_overlap(spark):
    bench = _docs(spark, ["the quick brown fox jumps over the lazy dog"])
    train = spark.createDataFrame(
        [
            # doc 10 embeds a full benchmark 5-gram -> contaminated
            (10, "intro words the quick brown fox jumps closing words"),
            # doc 11 shares only 4 consecutive tokens -> clean at n=5
            (11, "the quick brown fox sleeps all day long"),
            # doc 12 disjoint vocabulary -> clean
            (12, "alpha beta gamma delta epsilon zeta eta theta"),
            # doc 13 shorter than n -> zero grams, clean
            (13, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in REP.decontaminate(train, bench, n=5).collect()}
    assert set(rows) == {10, 11, 12, 13}
    assert rows[10].contaminated is True and rows[10].n_overlap == 1
    assert rows[11].contaminated is False and rows[11].n_overlap == 0
    assert rows[12].contaminated is False
    assert rows[13].n_grams == 0 and rows[13].contaminated is False


def test_decontaminate_counts_distinct_grams_once(spark):
    # the same benchmark 5-gram appearing twice in one doc counts once
    bench = _docs(spark, ["p q r s t"])
    train = spark.createDataFrame(
        [(20, "p q r s t x p q r s t")], ["doc_id", "text"]
    )
    r = REP.decontaminate(train, bench, n=5).first()
    # distinct grams of the train doc: 7 windows, all distinct except the
    # repeated "p q r s t" -> 6; exactly one overlaps the benchmark
    assert r.n_grams == 6
    assert r.n_overlap == 1


def test_decontaminate_plan_broadcasts_bench(spark):
    bench = _docs(spark, ["a b c d e f"])
    train = _docs(spark, ["a b c d e f g", "z y x w v u t"])
    plan = REP.decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
