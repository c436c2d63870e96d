"""Round-5 operators: url_quality_features, crawl_traps, semantic_dedup.

Same discipline as tests/test_r4_ops.py: hand-replayable semantics on
planted inputs + plan pins for the 100 TB shape. (Oracle parity at
sf0.001+sf0.01 runs via tests/test_demoted_contract.py /
tools/check_oracle.py as for every contract query.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.functions import urls as U
from fileverification_spark.operators import curation as CUR
from fileverification_spark.operators import similarity as SIM
from fileverification_spark.plans import explain as X


# ---------------------------------------------------------------------------
# url_quality_features
# ---------------------------------------------------------------------------

def test_url_quality_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "https://a.b.shop-42.example.com:8080/x/y/z/w/v?a=1&b=2#f"),
            (2, "http://example.org/"),
        ],
        "doc_id long, url string",
    )
    rows = {r["url"]: r for r in U.url_quality_features(df).collect()}
    r = rows["https://a.b.shop-42.example.com:8080/x/y/z/w/v?a=1&b=2#f"]
    assert r["host"] == "a.b.shop-42.example.com"   # lowercased, port gone
    assert r["subdomain_depth"] == 4                # 4 dots
    assert r["host_hyphens"] == 1
    # 2 digit chars of 23 -> 2000 div 23 = 86
    assert r["host_digits_milli"] == 86
    assert r["path_depth"] == 5 and r["path_len"] == 10
    assert r["n_params"] == 2
    # 86 + 200*1 + 100*(4-2) + 50*(5-4) + 30*2 + 0 = 596
    assert r["spam_score_milli"] == 596
    r2 = rows["http://example.org/"]
    assert (r2["subdomain_depth"], r2["n_params"], r2["spam_score_milli"]) == (
        1, 0, 0,
    )


def test_url_quality_zero_shuffle(spark):
    df = spark.range(8).select(
        F.concat(F.lit("https://h"), F.col("id"), F.lit(".e.org/p")).alias("url")
    )
    out = U.url_quality_features(df)
    plan = X.formatted_plan(out)
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# crawl_traps
# ---------------------------------------------------------------------------

def _pages(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], "url string")


def test_crawl_traps_flags_template_maze(spark):
    # trap host: 20 pages, ONE template (calendar maze)
    trap = [f"https://maze.example/cal/2024/{i}" for i in range(20)]
    # diverse host: 20 pages, 20 distinct templates
    ok = [f"https://ok.example/{'s' * (i + 1)}" for i in range(20)]
    # small host: too few pages to flag regardless of shape
    small = [f"https://tiny.example/p/{i}" for i in range(3)]
    out = {r["host"]: r for r in CUR.crawl_traps(
        _pages(spark, trap + ok + small)).collect()}
    assert out["maze.example"]["trap"]
    assert out["maze.example"]["n_templates"] == 1
    assert out["maze.example"]["top_share_milli"] == 1000
    assert not out["ok.example"]["trap"]
    assert out["ok.example"]["template_ratio_milli"] == 1000
    assert not out["tiny.example"]["trap"]


def test_crawl_traps_plan_two_partial_aggs(spark):
    out = CUR.crawl_traps(_pages(spark, ["https://h.e/p1"]))
    # (host, template) pre-agg + host rollup: exactly two shuffles, both
    # preceded by map-side partial aggregation — scale-linear at 100 TB
    assert X.shuffle_exchange_count(out) == 2
    assert X.has_partial_aggregate(out)
    assert "EvalPython" not in X.formatted_plan(out)


# ---------------------------------------------------------------------------
# semantic_dedup
# ---------------------------------------------------------------------------

def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_within_cluster_only(spark):
    # ids 0 and 2 are centroids (mod 2); vectors 0/1 align on axis x,
    # 2/3 on axis y, 4 is between but closer to x. Pairs across
    # clusters are NEVER compared — 4 survives even though it is close
    # to 1 if they land in different clusters.
    vecs = [
        (1.0, 0.0), (0.9, 0.1),      # cluster 0 (near x axis)
        (0.0, 1.0), (0.1, 0.9),      # cluster 2 (near y axis)
        (0.8, 0.6),                  # cluster 0, far enough from 0/1?
    ]
    out = {r["vec_id"]: r for r in
           SIM.semantic_dedup(_emb(spark, vecs), tau=0.995, cent_mod=2)
           .collect()}
    assert len(out) == 5
    # lowest id in every cluster is always kept
    assert out[0]["kept"] and out[2]["kept"]
    # 1 ~ 0 at cos ~0.9939 < 0.995 -> kept; tighten tau to drop it
    assert out[1]["kept"]
    out2 = {r["vec_id"]: r for r in
            SIM.semantic_dedup(_emb(spark, vecs), tau=0.99, cent_mod=2)
            .collect()}
    assert not out2[1]["kept"]           # 0.9939 >= 0.99 -> duplicate
    assert not out2[3]["kept"]           # 2~3 cos 0.9939 too
    assert out2[0]["kept"] and out2[2]["kept"]


def test_semantic_dedup_min_id_always_kept(spark):
    # identical vectors: everything collapses onto the min id
    vecs = [(1.0, 0.0)] * 6
    out = SIM.semantic_dedup(_emb(spark, vecs), tau=0.5, cent_mod=3).collect()
    kept = {r["vec_id"] for r in out if r["kept"]}
    assert kept == {0}
    assert {r["cluster"] for r in out} == {0}   # tie -> min centroid id


def test_semantic_dedup_plan_broadcast_codebook_no_cartesian(spark):
    out = SIM.semantic_dedup(_emb(spark, [(1.0, 0.0)] * 4), 0.5, cent_mod=2)
    plan = X.formatted_plan(out)
    assert "CartesianProduct" not in plan
    # codebook assignment is a broadcast join; the pair search is a
    # plain equi-join keyed on cluster (AQE-splittable)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "EvalPython" not in plan
