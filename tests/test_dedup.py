"""Dedup operator semantics: MinHash approximates Jaccard, LSH finds
planted near-dups, SimHash clusters exact copies."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.operators import dedup as D

SF = "/root/testdata/sf0.001"


def _docs_with_plants(spark):
    """documents + planted near-duplicates of doc 0 and an exact copy."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    base = docs.where(F.col("doc_id") == 0).first()["text"]
    plants = spark.createDataFrame(
        [
            (100001, base),                         # exact copy
            (100002, base + " tail variation"),     # near-dup
            (100003, "completely different text about nothing at all"),
        ],
        ["doc_id", "text"],
    )
    return docs.unionByName(plants)


def test_dedup_exact_groups_copies(spark):
    docs = _docs_with_plants(spark)
    groups = D.dedup_exact(docs).where(F.col("n_copies") > 1).collect()
    assert len(groups) == 1
    assert groups[0]["keeper_id"] == 0
    assert groups[0]["n_copies"] == 2


def test_minhash_estimates_jaccard(spark):
    docs = _docs_with_plants(spark)
    sigs = D.minhash_signatures(docs, num_hashes=64)
    pairs = D.lsh_candidate_pairs(sigs, bands=16, num_hashes=64)
    got = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert (0, 100001) in got and got[(0, 100001)] == 1.0   # exact copy
    assert (0, 100002) in got and got[(0, 100002)] > 0.5    # near dup
    # exact jaccard on the same candidates
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, pairs).collect()
    }
    assert exact[(0, 100001)] == 1.0
    assert 0.5 < exact[(0, 100002)] < 1.0
    # estimate within tolerance of exact for the near-dup
    assert abs(got[(0, 100002)] - exact[(0, 100002)]) < 0.25


def test_simhash_exact_copy_same_bucket(spark):
    docs = _docs_with_plants(spark)
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash_docs(docs).collect()}
    assert sh[0] == sh[100001]          # identical text -> identical simhash
    assert 0 <= sh[0] < (1 << D.DEFAULT_SIMHASH_BITS)
    buckets = D.simhash_buckets(docs).collect()
    assert any(b["keeper_id"] == 0 and b["n_docs"] >= 2 for b in buckets)


def test_signature_stability_under_repartition(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = {r["doc_id"]: r["sig"] for r in D.minhash_signatures(docs.limit(50)).collect()}
    b = {
        r["doc_id"]: r["sig"]
        for r in D.minhash_signatures(docs.limit(50).repartition(7)).collect()
    }
    assert a == b
