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


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer 2003)
# ---------------------------------------------------------------------------

from fileverification_spark.operators import dedup as D
from fileverification_spark.operators import graph as GR
from fileverification_spark.operators import sampling as SMP
from fileverification_spark.operators import search as SRCH


def test_winnow_guarantee_shared_run(spark):
    """Any shared substring >= w + k - 1 chars yields >= 1 common
    fingerprint (the paper's detection guarantee), at ANY alignment."""
    k, w = 16, 8
    shared = "x" * 0 + "the quick brown fox jumps over it"  # 33 >= 23
    df = spark.createDataFrame(
        [
            (1, "AAAA " + shared + " BBBB"),
            (2, "completely unrelated prefix words " + shared),
            (3, "no overlap here at all, just filler text padding"),
        ],
        "doc_id long, text string",
    )
    fps = D.winnow_fingerprints(df, k, w)
    common = (
        fps.groupBy("fp").agg(F.collect_set("doc_id").alias("ds")).collect()
    )
    both = [r for r in common if {1, 2} <= set(r["ds"])]
    assert both, "shared 33-char run must collide at k=16,w=8"
    assert not [r for r in common if 3 in set(r["ds"]) and len(r["ds"]) > 1]


def test_winnow_density_bound(spark):
    """<= 1 fingerprint per window start (value-dedup can only shrink)."""
    k, w = 16, 8
    text = "word soup " * 30
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    n = D.winnow_fingerprints(df, k, w).count()
    n_windows = len(text) - k + 1 - w + 1
    assert 1 <= n <= n_windows


def test_winnow_pairs_max_df_drops_boilerplate(spark):
    """A fingerprint shared by MORE than max_df docs is ubiquity, not
    copy evidence — pairs must come only from sub-cap fingerprints."""
    k, w = 16, 8
    boiler = "this licence header appears everywhere verbatim"
    docs = [(i, f"doc {i} unique words {i * 7919} " + boiler) for i in range(5)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # cap 4 < 5 docs sharing the boilerplate run -> its fps are dropped;
    # remaining shared material is too short to pair
    assert D.winnow_pairs(df, k, w, min_shared=1, max_df=4).count() == 0
    # raising the cap re-admits the boilerplate pairs (all 10 of C(5,2))
    assert D.winnow_pairs(df, k, w, min_shared=1, max_df=64).count() == 10


def test_winnow_zero_python_zero_input_shuffle(spark):
    df = spark.createDataFrame([(1, "abcdefgh" * 10)], "doc_id long, text string")
    out = D.winnow_fingerprints(df)
    plan = X.formatted_plan(out)
    assert "EvalPython" not in plan
    assert X.shuffle_exchange_count(out) == 0  # pure projection


# ---------------------------------------------------------------------------
# phrase_search
# ---------------------------------------------------------------------------

def test_phrase_search_consecutive_only(spark):
    df = spark.createDataFrame(
        [
            (1, "fast hash join wins"),          # phrase present
            (2, "hash wins join fast"),          # bag matches, order no
            (3, "hash join hash join"),          # two occurrences
            (4, "hash"),                          # shorter than phrase
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n_hits"] for r in
           SRCH.phrase_search(df, "hash join").collect()}
    assert got == {1: 1, 3: 2}


def test_phrase_search_overlapping_hits(spark):
    df = spark.createDataFrame([(1, "a a a a")], "doc_id long, text string")
    got = SRCH.phrase_search(df, "a a").collect()
    assert got[0]["n_hits"] == 3  # starts 1,2,3 all count


def test_phrase_search_zero_shuffle(spark):
    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = SRCH.phrase_search(df, "x y")
    assert X.shuffle_exchange_count(out) == 0
    assert "EvalPython" not in X.formatted_plan(out)


# ---------------------------------------------------------------------------
# lang_temperature
# ---------------------------------------------------------------------------

def test_lang_temperature_hand_computed(spark):
    # counts: en 9, fr 4, zh 1 -> isqrt: 3, 2, 1 (tot 6)
    rows = [(i, "en" if i < 9 else ("fr" if i < 13 else "zh"))
            for i in range(14)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: r for r in SMP.lang_temperature(df, ppm_budget=100).collect()}
    # base: en 100*3//6=50, fr 100*2//6=33, zh 100*1//6=16 (sum 99)
    # rems: en 0, fr 2, zh 4 -> leftover 1 goes to zh
    assert got["en"]["weight_ppm"] == 50
    assert got["fr"]["weight_ppm"] == 33
    assert got["zh"]["weight_ppm"] == 17
    assert sum(r["weight_ppm"] for r in got.values()) == 100
    # temperature flattens: zh raw share 1/14 ~ 7%, weight 17%
    assert got["zh"]["weight_ppm"] * 14 > 100


def test_lang_temperature_exact_budget_sum(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = SMP.lang_temperature(docs)
    assert out.agg(F.sum("weight_ppm")).first()[0] == 1_000_000


def test_isqrt_correction_exact():
    import math
    from pyspark.sql import Row
    # pure-arithmetic check of the corrected isqrt over tricky values
    for n in [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**12, 10**12 + 1,
              (2**26 - 1) ** 2, (2**26 - 1) ** 2 - 1]:
        s0 = math.floor(math.sqrt(float(n)))
        s = s0 - (1 if s0 * s0 > n else 0) + (1 if (s0 + 1) ** 2 <= n else 0)
        assert s == math.isqrt(n), n


# ---------------------------------------------------------------------------
# canonical_resolve
# ---------------------------------------------------------------------------

def _canon_edges(spark, rows):
    return spark.createDataFrame(rows, "url string, canon string")


def test_canonical_resolve_chain_exact_hops(spark):
    # a -> b -> c -> d (terminal: d declares nothing)
    e = _canon_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["url"]: r for r in GR.canonical_resolve(e, iters=3).collect()}
    assert got["a"]["final_url"] == "d" and got["a"]["hops"] == 3
    assert got["b"]["final_url"] == "d" and got["b"]["hops"] == 2
    assert got["c"]["final_url"] == "d" and got["c"]["hops"] == 1
    assert all(r["resolved"] for r in got.values())


def test_canonical_resolve_cycle_flagged_unresolved(spark):
    e = _canon_edges(spark, [("a", "b"), ("b", "a"), ("x", "a")])
    got = {r["url"]: r for r in GR.canonical_resolve(e, iters=2).collect()}
    assert not got["a"]["resolved"] and not got["b"]["resolved"]
    assert got["a"]["hops"] == 4  # 2^iters steps taken, then bounded
    assert not got["x"]["resolved"]  # tail into a cycle never resolves


def test_canonical_resolve_depth_cap(spark):
    # chain of length 12 > 2^3 = 8: hops capped, flagged unresolved
    chain = [(f"n{i}", f"n{i+1}") for i in range(12)]
    got = {r["url"]: r for r in
           GR.canonical_resolve(_canon_edges(spark, chain), iters=3).collect()}
    assert got["n0"]["hops"] == 8 and got["n0"]["final_url"] == "n8"
    assert not got["n0"]["resolved"]
    assert got["n3"]["hops"] == 8 and not got["n3"]["resolved"]  # 9 deep
    assert got["n4"]["hops"] == 8 and got["n4"]["resolved"]  # exactly 8 deep
    assert got["n6"]["hops"] == 6 and got["n6"]["resolved"]


def test_canonical_resolve_self_canonical_dropped(spark):
    e = _canon_edges(spark, [("s", "s"), ("a", "s")])
    rows = GR.canonical_resolve(e, iters=2).collect()
    assert len(rows) == 1  # only the real link resolves
    r = rows[0]
    assert r["url"] == "a" and r["final_url"] == "s" and r["resolved"]


# ---------------------------------------------------------------------------
# rrf_fuse (hybrid retrieval)
# ---------------------------------------------------------------------------

def test_rrf_fuse_hand_computed(spark):
    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    b = spark.createDataFrame(
        [(11, 1), (13, 2)], "doc_id long, rank long"
    )
    got = {r["doc_id"]: r for r in SRCH.rrf_fuse(a, b).collect()}
    assert set(got) == {10, 11, 12, 13}
    # doc 11 in both lists: 1e6//(60+2) + 1e6//(60+1) = 16129 + 16393
    assert got[11]["rrf_micro"] == 1_000_000 // 62 + 1_000_000 // 61
    assert got[11]["rank_a"] == 2 and got[11]["rank_b"] == 1
    # doc 10 only in A: absent side contributes exactly 0, rank_b NULL
    assert got[10]["rrf_micro"] == 1_000_000 // 61
    assert got[10]["rank_b"] is None
    assert got[13]["rrf_micro"] == 1_000_000 // 62
    # both-lists doc beats either single-list doc at these depths
    assert got[11]["rrf_micro"] > max(got[10]["rrf_micro"], got[13]["rrf_micro"])


def test_rrf_fuse_no_python_in_plan(spark):
    a = spark.range(5).select(F.col("id").alias("doc_id"), (F.col("id") + 1).alias("rank"))
    b = spark.range(5).select(F.col("id").alias("doc_id"), (6 - F.col("id")).alias("rank"))
    plan = X.formatted_plan(SRCH.rrf_fuse(a, b))
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# kn_bigram_stats (Kneser-Ney sufficient statistics)
# ---------------------------------------------------------------------------

def test_kn_bigrams_hand_computed(spark):
    # corpus: "a b a b c" and "b c" -> bigrams: (a,b)x2 (b,a)x1 (b,c)x2
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c")], "doc_id long, text string"
    )
    got = {(r["w1"], r["w2"]): r
           for r in CUR.kn_bigram_stats(docs, min_count=1).collect()}
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = got[("a", "b")]
    assert ab["c"] == 2
    assert ab["cont_w2"] == 1      # 'b' follows only 'a'
    assert ab["foll_w1"] == 1      # 'a' is followed only by 'b'
    assert ab["c_w1"] == 2         # c(a .) = 2
    bc = got[("b", "c")]
    assert bc["c"] == 2
    assert bc["cont_w2"] == 1      # 'c' follows only 'b'
    assert bc["foll_w1"] == 2      # 'b' followed by {a, c}
    assert bc["c_w1"] == 3         # c(b .) = 1 + 2
    ba = got[("b", "a")]
    assert ba["cont_w2"] == 1 and ba["c_w1"] == 3


def test_kn_bigrams_min_count_filters_bigrams_not_stats(spark):
    # the c>=min_count cutoff drops tail BIGRAMS but the word-keyed
    # statistics are computed over the FULL bigram relation first
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "b c")], "doc_id long, text string"
    )
    got = {(r["w1"], r["w2"]): r
           for r in CUR.kn_bigram_stats(docs, min_count=2).collect()}
    assert set(got) == {("a", "b"), ("b", "c")}       # (b,a) c=1 dropped
    assert got[("b", "c")]["foll_w1"] == 2             # still counts (b,a)
    assert got[("b", "c")]["c_w1"] == 3


def test_kn_bigrams_single_token_docs_contribute_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "only"), (2, ""), (3, "x y")], "doc_id long, text string"
    )
    rows = CUR.kn_bigram_stats(docs, min_count=1).collect()
    assert len(rows) == 1 and (rows[0]["w1"], rows[0]["w2"]) == ("x", "y")


# ---------------------------------------------------------------------------
# cms_tokens (count-min sketch)
# ---------------------------------------------------------------------------

from fileverification_spark.operators import sketch as SK


def test_cms_mass_conservation_per_row(spark):
    # every hash row receives every occurrence exactly once: per-row
    # counter sum == total token count, for each of the d rows
    docs = spark.createDataFrame(
        [(1, "a b c a"), (2, "b b z")], "doc_id long, text string"
    )
    sk = SK.cms_tokens(docs, depth=3, width=8)
    per_row = {r["row"]: r["s"] for r in
               sk.groupBy("row").agg(F.sum("total").alias("s")).collect()}
    assert per_row == {0: 7, 1: 7, 2: 7}


def test_cms_merge_identity(spark):
    # sketch(A union B) == cellwise sum of sketch(A) + sketch(B)
    a = spark.createDataFrame([(1, "a b c a"), (2, "d e")], "doc_id long, text string")
    b = spark.createDataFrame([(3, "a z z q")], "doc_id long, text string")
    whole = {(r["row"], r["col"]): r["total"]
             for r in SK.cms_tokens(a.unionByName(b), depth=4, width=16).collect()}
    merged: dict = {}
    for part in (a, b):
        for r in SK.cms_tokens(part, depth=4, width=16).collect():
            k = (r["row"], r["col"])
            merged[k] = merged.get(k, 0) + r["total"]
    assert whole == merged


def test_cms_point_estimate_one_sided(spark):
    # est >= true always (CMS guarantee); tiny width forces collisions
    docs = spark.createDataFrame(
        [(i, f"tok{i % 5} filler{i}") for i in range(40)],
        "doc_id long, text string",
    )
    rows = SK.cms_point_estimates(
        docs, ["tok0", "tok1", "absent"], depth=4, width=4
    ).collect()
    assert {r["tok"] for r in rows} == {"tok0", "tok1", "absent"}
    for r in rows:
        assert r["est"] >= r["true_count"]
    by = {r["tok"]: r for r in rows}
    assert by["tok0"]["true_count"] == 8
    assert by["absent"]["true_count"] == 0


def test_cms_no_python_no_occurrence_keyed_expansion(spark):
    docs = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = X.formatted_plan(SK.cms_tokens(docs))
    assert "EvalPython" not in plan
    # the depth-way explode must sit ABOVE the vocab agg (expansion on
    # distinct tokens, not the occurrence stream): exactly two shuffles
    # -- vocab then sketch -- and two Generates (token explode below the
    # first agg, sequence explode between the aggs, never a third)
    assert plan.count("Exchange (") == 2
    assert plan.count("Generate (") == 2
