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
