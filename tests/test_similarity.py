"""Similarity search: brute-force exactness properties + LSH recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.operators import similarity as SIM

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_topk_self_similarity_excluded_and_ranked(spark):
    emb = _emb(spark)
    out = SIM.cosine_topk(emb, [0, 7], 5).collect()
    assert len(out) == 10
    for r in out:
        assert r["vec_id"] != r["query_id"]
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_neardup_pairs_symmetric_bound(spark):
    emb = _emb(spark).limit(100)
    pairs = SIM.neardup_pairs_exact(emb, tau=0.5).collect()
    for r in pairs:
        assert r["vec_a"] < r["vec_b"]
        assert r["cos_sim"] >= 0.5


def test_lsh_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    qids = [0, 10, 20, 30, 40]
    k = 10
    exact = SIM.cosine_topk(emb, qids, k).collect()
    approx = SIM.ann_lsh_topk(emb, qids, k, n_tables=16, planes_per_table=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / k for q in qids
    ]
    # multi-table LSH (16 tables x 4 planes): weak neighbours (top-1 cos
    # ~0.34 in this corpus) need many short tables; ~0.8 recall expected
    assert sum(recalls) / len(recalls) > 0.5, recalls


def test_bucket_deterministic(spark):
    emb = _emb(spark).limit(50)
    a = {r["vec_id"]: r["buckets"] for r in SIM.with_lsh_buckets(emb).collect()}
    b = {
        r["vec_id"]: r["buckets"]
        for r in SIM.with_lsh_buckets(emb.repartition(5)).collect()
    }
    assert a == b


def test_ivf_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    qids = [0, 10, 20, 30, 40]
    k = 10
    exact = SIM.cosine_topk(emb, qids, k).collect()
    approx = SIM.ann_ivf_topk(emb, qids, k, n_lists=16, nprobe=8).collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(exact_sets[q] & approx_sets.get(q, set())) / k for q in qids]
    assert sum(recalls) / len(recalls) > 0.5, recalls


def test_blocked_neardup_matches_exact_baseline(spark):
    # the distributed block-pair form must be BIT-identical to the
    # quadratic broadcast baseline (dim-sequential accumulation mirrors
    # the JVM fold), across a block count that forces cross-block pairs
    # whose smaller id lives in the higher block
    emb = _emb(spark)
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in SIM.neardup_pairs_exact(emb, tau=0.3).collect()
    }
    for n_blocks in (1, 3, 8):
        blocked = {
            (r["vec_a"], r["vec_b"]): r["cos_sim"]
            for r in SIM.neardup_pairs_blocked(emb, tau=0.3, n_blocks=n_blocks).collect()
        }
        assert blocked == exact, f"n_blocks={n_blocks}"
    assert exact  # non-vacuous


def test_neardup_exact_size_guard(spark):
    import pytest

    emb = _emb(spark)
    with pytest.raises(ValueError, match="neardup_pairs_blocked"):
        SIM.neardup_pairs_exact(emb, tau=0.3, max_rows=10)
    # explicit opt-out still works
    assert SIM.neardup_pairs_exact(emb.limit(20), tau=-1.0, max_rows=None).count()


def test_lsh_neardup_subset_of_exact_with_recall(spark):
    # precision must be exactly 1.0 (exact rerank on candidates); recall
    # at this corpus's low-similarity pairs is partial — pin a floor and
    # bit-identical cos values on the pairs it does find
    emb = _emb(spark)
    exact = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in SIM.neardup_pairs_exact(emb, tau=0.3).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in SIM.neardup_pairs_lsh(emb, tau=0.3).collect()
    }
    assert set(lsh) <= set(exact)          # precision == 1
    for pair, cs in lsh.items():
        assert cs == exact[pair]           # identical rerank values
    assert len(lsh) / len(exact) > 0.5     # recall floor at low tau


def test_ann_recall_certificate_shape_and_floor(spark):
    emb = _emb(spark)
    qids, k = [0, 10, 20], 5
    exact = SIM.cosine_topk(emb, qids, k)
    # self-certifying: exact vs exact must meet any floor <= 1.0
    rows = SIM.ann_recall_certificate(exact, exact, k, 1.0).collect()
    assert sorted(r["query_id"] for r in rows) == qids
    assert all(r["meets_min_recall"] for r in rows)
    assert all(r["k"] == k for r in rows)
    # an empty ANN result certifies FALSE for every query (no silent pass)
    empty = exact.where(F.lit(False))
    rows = SIM.ann_recall_certificate(empty, exact, k, 0.2).collect()
    assert rows and not any(r["meets_min_recall"] for r in rows)


def test_ivf_assignment_deterministic(spark):
    emb = _emb(spark).limit(200)
    c = SIM.ivf_centroids(emb, n_lists=8)
    a = {r["vec_id"]: r["list_id"] for r in SIM.with_ivf_lists(emb, c).collect()}
    b = {
        r["vec_id"]: r["list_id"]
        for r in SIM.with_ivf_lists(emb.repartition(7), c).collect()
    }
    assert a == b
    assert len(set(a.values())) > 1


def test_quantized_topk_recall(spark):
    """int8 reconstruction must keep top-k recall high vs exact cosine
    (>= 0.8 at k=10 on the fixture), and codes must be integral in
    [-127, 127]."""
    from fileverification_spark.operators import similarity as SIM

    emb = _emb(spark)
    qids = [0, 10, 20]
    k = 10
    exact = SIM.cosine_topk(emb, qids, k).collect()
    quant = SIM.cosine_topk_quantized(emb, qids, k).collect()
    e = {}
    g = {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    for r in quant:
        g.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [len(e[q] & g[q]) / k for q in e]
    assert min(recalls) >= 0.8, recalls

    codes = SIM.quantize_embeddings(emb).select("codes").first()["codes"]
    assert all(c == int(c) and -127 <= c <= 127 for c in codes)
