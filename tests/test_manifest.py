"""Merkle manifest invariants (SURVEY §5.4 property tests)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from fileverification_spark.operators import manifest as M
from fileverification_spark.sources import pages as P


def test_leaf_digest_matches_hashlib(spark, pages_small):
    leaf = M.leaf_digests(pages_small, P.LEAF_RES)
    one = leaf.orderBy("cell").first()
    cell = one["cell"]
    pairs = sorted(
        r["url"] + r["text_sha256"]
        for r in pages_small.where(F.col("cell") == cell)
        .select("url", "text_sha256")
        .collect()
    )
    want = hashlib.sha256("".join(pairs).encode()).hexdigest().upper()
    assert one["digest"] == want
    assert one["n_children"] == len(pairs)


def test_digest_invariant_under_repartition(spark, pages_small):
    a = {
        (r["cell"], r["digest"])
        for r in M.leaf_digests(pages_small, P.LEAF_RES).collect()
    }
    shuffled = pages_small.repartition(13, "doc_id").sortWithinPartitions("text_sha256")
    b = {
        (r["cell"], r["digest"])
        for r in M.leaf_digests(shuffled, P.LEAF_RES).collect()
    }
    assert a == b


def test_ladder_levels_and_counts(spark, pages_small):
    leaf = M.leaf_digests(pages_small, P.LEAF_RES)
    ladder = M.merkle_ladder(leaf, P.LEAF_RES, min_res=0).collect()
    by_res = {}
    for r in ladder:
        by_res.setdefault(r["res"], []).append(r)
    assert set(by_res) == set(range(P.LEAF_RES + 1))
    # root level: at most 2 cells (res 0 = 1x2 grid), together covering all
    assert 1 <= len(by_res[0]) <= 2
    # n_children at res 0 = number of res-1 cells
    assert sum(r["n_children"] for r in by_res[0]) == len(by_res[1])


def test_single_mutation_flips_ancestor_path_only(spark, pages_small):
    victim = pages_small.orderBy("doc_id").first()
    mutated = pages_small.withColumn(
        "text_sha256",
        F.when(F.col("doc_id") == victim["doc_id"], F.lit("0" * 64)).otherwise(
            F.col("text_sha256")
        ),
    )
    base = {
        (r["res"], r["cell"]): r["digest"]
        for r in M.merkle_ladder(
            M.leaf_digests(pages_small, P.LEAF_RES), P.LEAF_RES
        ).collect()
    }
    mut = {
        (r["res"], r["cell"]): r["digest"]
        for r in M.merkle_ladder(
            M.leaf_digests(mutated, P.LEAF_RES), P.LEAF_RES
        ).collect()
    }
    assert set(base) == set(mut)
    changed = {k for k in base if base[k] != mut[k]}
    # exactly one changed cell per resolution: the victim's ancestor path
    assert len(changed) == P.LEAF_RES + 1
    assert sorted(r for r, _ in changed) == list(range(P.LEAF_RES + 1))


def test_changed_cells_prunes_unchanged(spark, pages_small):
    leaf = M.leaf_digests(pages_small, P.LEAF_RES)
    ladder = M.merkle_ladder(leaf, P.LEAF_RES).cache()
    # identical checkpoint -> nothing changed
    assert M.changed_cells(ladder, ladder).count() == 0
    # empty checkpoint -> everything changed
    empty = ladder.where(F.lit(False))
    assert M.changed_cells(ladder, empty).count() == ladder.count()
    # checkpoint-only cells (every child vanished) must stay in the
    # frontier — the reference reports their children missing
    assert M.changed_cells(empty, ladder).count() == ladder.count()
    one = ladder.orderBy("res", "cell").limit(1)
    current = ladder.subtract(one)
    diff = M.changed_cells(current, ladder)
    got = [(r["res"], r["cell"]) for r in diff.collect()]
    want = [(r["res"], r["cell"]) for r in one.collect()]
    assert got == want


def test_salted_digest_invariants(spark, pages_small):
    from pyspark.sql import functions as F

    from fileverification_spark.operators import manifest as M
    from fileverification_spark.sources import pages as P

    d1 = M.salted_digests(pages_small, P.LEAF_RES)
    # deterministic under repartition/order
    d2 = M.salted_digests(pages_small.repartition(7, "url"), P.LEAF_RES)
    assert (
        d1.join(d2, ["res", "cell", "digest", "n_children"]).count() == d1.count()
    )
    # tamper sensitivity: flip one child's hash -> exactly that cell differs
    victim = pages_small.orderBy("doc_id").first()
    mut = pages_small.withColumn(
        "text_sha256",
        F.when(
            F.col("doc_id") == victim["doc_id"], F.reverse(F.col("text_sha256"))
        ).otherwise(F.col("text_sha256")),
    )
    d3 = M.salted_digests(mut, P.LEAF_RES)
    diff = d1.alias("a").join(d3.alias("b"), "cell").where(
        F.col("a.digest") != F.col("b.digest")
    )
    assert diff.count() == 1
    assert diff.first()["cell"] == victim["cell"]


def test_mergeable_digest_invariants(spark, pages_small):
    from pyspark.sql import functions as F

    from fileverification_spark.operators import manifest as M
    from fileverification_spark.sources import pages as P

    d1 = M.mergeable_digests(pages_small, P.LEAF_RES)
    d2 = M.mergeable_digests(pages_small.repartition(13), P.LEAF_RES)
    assert (
        d1.join(d2, ["res", "cell", "digest", "n_children"]).count() == d1.count()
    )
    victim = pages_small.orderBy("doc_id").first()
    mut = pages_small.withColumn(
        "text_sha256",
        F.when(
            F.col("doc_id") == victim["doc_id"], F.reverse(F.col("text_sha256"))
        ).otherwise(F.col("text_sha256")),
    )
    d3 = M.mergeable_digests(mut, P.LEAF_RES)
    diff = d1.alias("a").join(d3.alias("b"), "cell").where(
        F.col("a.digest") != F.col("b.digest")
    )
    assert diff.count() == 1
    assert diff.first()["cell"] == victim["cell"]


def test_salted_digest_splits_hot_cell(spark):
    """Pathological skew: every row in ONE cell — phase 1 must fan the
    sort-agg out over multiple salt groups (the explicit skew handling
    the plain sorted digest lacks)."""
    from pyspark.sql import functions as F

    from fileverification_spark.operators import manifest as M

    import hashlib

    rows = [
        (1, f"u/{i}", hashlib.sha256(str(i).encode()).hexdigest().upper())
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["cell", "url", "text_sha256"])
    sub = df.groupBy(
        "cell", M._salt_col(F.col("text_sha256")).alias("salt")
    ).count()
    assert sub.count() > 4  # hot cell split across salt groups
    d = M.salted_digests(df, 4)
    row = d.first()
    assert row["n_children"] == 500 and len(row["digest"]) == 64


def test_deep_ladder_res8(spark):
    """Parameterization sanity at a deeper ladder (res 8 -> 0, nine
    levels, ~50k cells at the leaf for this corpus)."""
    from fileverification_spark.operators import manifest as M
    from fileverification_spark.sources import pages as P

    live = P.pages_with_derived(spark, "/root/testdata/sf0.001", res=8)
    ladder = M.merkle_ladder(M.leaf_digests(live, 8), 8)
    per_res = {r["res"]: r["n"] for r in
               ladder.groupBy("res").agg(__import__("pyspark").sql.functions.count("*").alias("n")).collect()}
    assert set(per_res) == set(range(9))
    # monotone: coarser levels never have more cells
    for r in range(1, 9):
        assert per_res[r - 1] <= per_res[r]
    assert per_res[0] <= 2  # res 0 = 1x2 grid


def test_update_mergeable_digests_equals_recompute(spark, pages_small):
    """Incremental maintenance == full recompute: remove a slice, add a
    modified slice, update limb sums — identical digests, O(delta) work."""
    from pyspark.sql import functions as F

    from fileverification_spark.operators import manifest as M
    from fileverification_spark.sources import pages as P

    base = M.mergeable_digests(pages_small, P.LEAF_RES)
    removed = pages_small.where(F.col("doc_id") % 7 == 0)
    added = (
        pages_small.where(F.col("doc_id") % 11 == 3)
        .withColumn("url", F.concat(F.col("url"), F.lit("#v2")))
        .withColumn("text_sha256", F.reverse(F.col("text_sha256")))
    )
    updated_corpus = pages_small.where(F.col("doc_id") % 7 != 0).unionByName(
        added.select(pages_small.columns)
    )
    want = {
        (r["cell"], r["digest"], r["n_children"])
        for r in M.mergeable_digests(updated_corpus, P.LEAF_RES).collect()
    }
    got = {
        (r["cell"], r["digest"], r["n_children"])
        for r in M.update_mergeable_digests(
            base, added, removed, P.LEAF_RES
        ).collect()
    }
    assert got == want
