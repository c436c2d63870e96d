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


# ---------------------------------------------------------------------------
# duplicate_clusters (pairs -> connected components)
# ---------------------------------------------------------------------------


def test_duplicate_clusters_transitive_component(spark):
    """A~B and B~C must land in ONE cluster even when A~C alone would
    miss tau (transitivity is the point of the component step)."""
    base = (
        "the quick brown fox jumps over the lazy dog while the band "
        "plays on and the crowd watches the game unfold slowly tonight"
    )
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with a small tail appended here"),
            (3, base + " with a small tail appended here and even more "
                "extra drift text pushing it away from the original"),
            (4, "totally unrelated content about cooking pasta al dente"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in D.duplicate_clusters(docs, tau=0.5, max_iters=8).collect()
    }
    assert set(out) == {1, 2, 3}          # 4 is in no verified pair
    assert {r["cluster_id"] for r in out.values()} == {1}
    assert out[1]["is_keeper"] and not out[2]["is_keeper"]
    # sanity: the chain really is a chain at this tau (A~C below it)
    pairs = D.ngram_jaccard_pairs(
        docs, D.lsh_candidate_pairs(D.minhash_signatures(docs))
    ).collect()
    jac = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    assert jac[(1, 2)] >= 0.5 and jac[(2, 3)] >= 0.5
    assert jac.get((1, 3), 0.0) < 0.5


def test_duplicate_clusters_matches_sql_closure(spark):
    """Min-label propagation == recursive-CTE closure on the natural
    sf0.001 corpus (multi-hop components included)."""
    import duckdb

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["cluster_id"], r["is_keeper"])
        for r in D.duplicate_clusters(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = sorted(
        (int(a), int(b), bool(k))
        for a, b, k in con.execute(D.sql_duplicate_clusters_query()).fetchall()
    )
    con.close()
    assert got == want
    assert len(got) > 0


# ---------------------------------------------------------------------------
# paragraph_dedup (global first-occurrence keeper)
# ---------------------------------------------------------------------------


def test_paragraph_dedup_first_occurrence_and_order(spark):
    docs = spark.createDataFrame(
        [
            (1, "A\n\nB"),
            (2, "B\n\nC"),       # B lost the race to doc 1
            (3, "A\n\nC"),       # both paragraphs lost
            (4, "X\n\nA\n\nY"),  # middle paragraph dropped, order kept
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in D.paragraph_dedup(docs).collect()}
    assert out[1]["clean_text"] == "A\n\nB"
    assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["clean_text"] == "C"
    assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_paras"], out[3]["n_kept"]) == (2, 0)
    assert out[4]["clean_text"] == "X\n\nY"
    assert (out[4]["n_paras"], out[4]["n_kept"]) == (3, 2)


def test_paragraph_dedup_within_doc_duplicates(spark):
    """A paragraph repeated INSIDE one doc keeps only its first slot."""
    docs = spark.createDataFrame([(7, "P\n\nQ\n\nP\n\nP")], ["doc_id", "text"])
    row = D.paragraph_dedup(docs).first()
    assert row["clean_text"] == "P\n\nQ"
    assert (row["n_paras"], row["n_kept"]) == (4, 2)
