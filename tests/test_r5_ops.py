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


# ---------------------------------------------------------------------------
# hll_cells / hll_estimate / hll_rollup (HyperLogLog)
# ---------------------------------------------------------------------------

from fileverification_spark.operators import funnel as FN


def _hll_pages(spark, n=300):
    # deterministic lat/lon spread over a few cells
    return spark.range(n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example/p"), F.col("id").cast("string")).alias("url"),
        ((F.col("id") % 120).cast("double") - 60.0).alias("lat"),
        ((F.col("id") % 340).cast("double") - 170.0).alias("lon"),
    )


def test_hll_register_bounds_and_estimate(spark):
    pages = _hll_pages(spark)
    sk = SK.hll_cells(pages, 1)
    rows = sk.collect()
    assert rows, "sketch must be non-empty"
    for r in rows:
        assert 0 <= r["reg"] < SK.HLL_M
        assert 1 <= r["rho_max"] <= SK._HLL_WBITS + 1
    for r in SK.hll_estimate(sk).collect():
        assert r["n_regs_set"] <= SK.HLL_M
        assert r["sum_scaled"] <= SK.HLL_M * (1 << SK._HLL_SCALE)
        assert r["est"] > 0


def test_hll_estimate_accuracy_in_range(spark):
    # the RAW estimator is accurate only above the small-range knee
    # (~2.5m distinct; below it Flajolet applies linear counting, which
    # the view deliberately omits — n_regs_set carries that input).
    # One dense cell with 4000 >> 640 distinct URLs: sigma = 1.04/16,
    # assert within ~4 sigma.
    pages = spark.range(4000).select(
        F.concat(F.lit("https://h.example/p"), F.col("id")).alias("url"),
        F.lit(10.0).alias("lat"), F.lit(10.0).alias("lon"),
    )
    rows = SK.hll_estimate(SK.hll_cells(pages, 1)).collect()
    assert len(rows) == 1
    assert abs(rows[0]["est"] - 4000) / 4000 < 0.26


def test_hll_merge_identity(spark):
    # rollup(child sketches) == hll_cells at the parent res, bit-exact
    pages = _hll_pages(spark, 500)
    child = SK.hll_cells(pages, 2)
    rolled = {(r["cell"], r["reg"]): r["rho_max"]
              for r in SK.hll_rollup(child, 2, 1).collect()}
    direct = {(r["cell"], r["reg"]): r["rho_max"]
              for r in SK.hll_cells(pages, 1).collect()}
    assert rolled == direct


def test_hll_insensitive_to_duplicates(spark):
    # HLL is a distinct sketch: re-unioning the same pages changes nothing
    pages = _hll_pages(spark, 200)
    once = {(r["cell"], r["reg"]): r["rho_max"]
            for r in SK.hll_cells(pages, 1).collect()}
    twice = {(r["cell"], r["reg"]): r["rho_max"]
             for r in SK.hll_cells(pages.unionByName(pages), 1).collect()}
    assert once == twice


def test_hll_no_python_one_agg(spark):
    plan = X.formatted_plan(SK.hll_cells(_hll_pages(spark), 1))
    assert "EvalPython" not in plan
    assert plan.count("Exchange (") == 1   # single (cell,reg) hash-agg


# ---------------------------------------------------------------------------
# adamic_adar (link prediction)
# ---------------------------------------------------------------------------

def test_adamic_adar_hand_computed(spark):
    # undirected graph: z1 -- {a, b, c}; z2 -- {a, b}; edge a--b absent,
    # edge a--c present (via direct link)
    edges = spark.createDataFrame(
        [("z1", "a", 1), ("z1", "b", 1), ("z1", "c", 1),
         ("z2", "a", 1), ("z2", "b", 1), ("a", "c", 1)],
        "src string, dst string, w long",
    )
    got = {(r["h1"], r["h2"]): r
           for r in GR.adamic_adar(edges, min_common=1).collect()}
    # deg: z1=3, z2=2, a=3 (z1,z2,c), b=2, c=2 (z1,a)
    ab = got[("a", "b")]
    # common neighbors of a,b: z1 (deg 3 -> floor_log2=1) and z2 (deg 2
    # -> 1): contributions 1e6 each
    assert ab["n_common"] == 2 and ab["aa_micro"] == 2_000_000
    assert not ab["already_linked"]
    # a--c share z1 only, and are directly linked
    ac = got[("a", "c")]
    assert ac["n_common"] == 1 and ac["already_linked"]
    # b--c share z1 only
    assert got[("b", "c")]["n_common"] == 1
    # pairs through a (z1,z2 share a and b): deg(a)=3 -> floor_log2=1,
    # deg(b)=2 -> 1: 2e6 total
    z12 = got[("z1", "z2")]
    assert z12["n_common"] == 2 and z12["aa_micro"] == 2_000_000


def test_adamic_adar_hub_weights_less(spark):
    # a common neighbor of degree 8 contributes 1e6 div 3 = 333333
    rows = [("hub", f"n{i}", 1) for i in range(8)]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    got = {(r["h1"], r["h2"]): r["aa_micro"]
           for r in GR.adamic_adar(edges, min_common=1).collect()}
    assert got[("n0", "n1")] == 1_000_000 // 3


def test_adamic_adar_cap_bounds_pairs(spark):
    # cap=2: a hub with 5 neighbors yields only the 1 pair of its 2
    # name-first neighbors
    rows = [("hub", f"n{i}", 1) for i in range(5)]
    edges = spark.createDataFrame(rows, "src string, dst string, w long")
    got = GR.adamic_adar(edges, cap=2, min_common=1).collect()
    assert {(r["h1"], r["h2"]) for r in got} == {("n0", "n1")}


def test_adamic_adar_no_python(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, w long"
    )
    assert "EvalPython" not in X.formatted_plan(GR.adamic_adar(edges))


# ---------------------------------------------------------------------------
# event_transitions (Markov transition counts)
# ---------------------------------------------------------------------------

def test_event_transitions_hand_computed(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: view -> click -> view
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click"),
        (3, t0 + dt.timedelta(minutes=2), 1, "view"),
        # user 2: view -> view
        (4, t0, 2, "view"),
        (5, t0 + dt.timedelta(minutes=5), 2, "view"),
        # user 3: single event -> no transition
        (6, t0, 3, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {(r["e_from"], r["e_to"]): r
           for r in FN.event_transitions(ev).collect()}
    assert set(got) == {("view", "click"), ("click", "view"),
                        ("view", "view")}
    assert got[("view", "click")]["n"] == 1
    assert got[("view", "view")]["n"] == 1
    # out of 'view': 2 transitions -> p = 500000 each
    assert got[("view", "click")]["n_from"] == 2
    assert got[("view", "click")]["p_micro"] == 500_000
    assert got[("click", "view")]["n_from"] == 1
    assert got[("click", "view")]["p_micro"] == 1_000_000


def test_event_transitions_ts_tie_broken_by_event_id(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(2, t0, 1, "b"), (1, t0, 1, "a")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    got = FN.event_transitions(ev).collect()
    assert len(got) == 1
    assert (got[0]["e_from"], got[0]["e_to"]) == ("a", "b")


def test_event_transitions_no_cross_user_pairs(spark):
    import datetime as dt

    t0 = dt.datetime(2026, 1, 1)
    ev = spark.createDataFrame(
        [(1, t0, 1, "a"), (2, t0 + dt.timedelta(seconds=1), 2, "b")],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    assert FN.event_transitions(ev).count() == 0


# ---------------------------------------------------------------------------
# cdc_chunks / cdc_shared (content-defined chunking)
# ---------------------------------------------------------------------------

_CDC_TEXT = (
    "The quick brown fox jumps over the lazy dog while seventeen "
    "astronauts calibrate a copper telescope beside the northern "
    "riverbank, and every Tuesday the archivist catalogues another "
    "shelf of weathered maps, pressed ferns, and letters from ships "
    "that never returned to harbour."
)


def test_cdc_chunks_reconstruct_text(spark):
    docs = spark.createDataFrame([(1, _CDC_TEXT)], "doc_id long, text string")
    rows = sorted(D.cdc_chunks(docs, divisor=16).collect(),
                  key=lambda r: r["chunk_idx"])
    assert rows[0]["start_pos"] == 1
    # chunks tile the doc exactly: contiguous, full-cover
    pos = 1
    for r in rows:
        assert r["start_pos"] == pos and r["chunk_len"] >= 1
        pos += r["chunk_len"]
    assert pos == len(_CDC_TEXT) + 1
    # chunk hashes are the sha256 of the exact substrings
    import hashlib

    for r in rows:
        sub = _CDC_TEXT[r["start_pos"] - 1 : r["start_pos"] - 1 + r["chunk_len"]]
        assert r["chunk_sha"] == hashlib.sha256(sub.encode()).hexdigest().upper()


def test_cdc_resynchronises_after_insertion(spark):
    # THE content-defined property: prefix-inserting text shifts only the
    # leading chunks; chunking re-syncs at the next content boundary and
    # the tail chunks hash identically (fixed-size blocks never re-sync)
    docs = spark.createDataFrame(
        [(1, _CDC_TEXT), (2, "INSERTED PREFIX >>> " + _CDC_TEXT)],
        "doc_id long, text string",
    )
    ch = D.cdc_chunks(docs, divisor=16).collect()
    a = [r["chunk_sha"] for r in sorted(
        (r for r in ch if r["doc_id"] == 1), key=lambda r: r["chunk_idx"])]
    b = [r["chunk_sha"] for r in sorted(
        (r for r in ch if r["doc_id"] == 2), key=lambda r: r["chunk_idx"])]
    assert len(a) >= 3, "divisor 16 must cut this text several times"
    # identical suffix: every chunk after doc 2's re-sync point matches
    shared = set(a) & set(b)
    assert shared, "no chunk survived a 20-char prefix insertion"
    k = 0
    while k < min(len(a), len(b)) and a[-1 - k] == b[-1 - k]:
        k += 1
    assert k >= 1 and set(a[-k:]) == set(b[-k:])


def test_cdc_short_doc_single_chunk(spark):
    docs = spark.createDataFrame(
        [(1, "tiny"), (2, "")], "doc_id long, text string"
    )
    rows = D.cdc_chunks(docs).collect()
    assert len(rows) == 1  # empty text yields nothing
    r = rows[0]
    assert r["chunk_idx"] == 1 and r["chunk_len"] == 4


def test_cdc_shared_counts_and_savings(spark):
    docs = spark.createDataFrame(
        [(1, _CDC_TEXT), (2, _CDC_TEXT)], "doc_id long, text string"
    )
    per_doc = D.cdc_chunks(docs, divisor=16).where(F.col("doc_id") == 1)
    n_chunks = per_doc.count()
    got = D.cdc_shared(docs, divisor=16).collect()
    # identical docs: every chunk shared exactly twice
    assert len(got) == n_chunks
    for r in got:
        assert r["n_docs"] == 2 and r["n_occs"] == 2
        assert r["first_doc"] == 1
        assert r["saved_chars"] == r["chunk_len"]


def test_cdc_no_python_zero_shuffle_chunks(spark):
    docs = spark.createDataFrame([(1, _CDC_TEXT)], "doc_id long, text string")
    plan = X.formatted_plan(D.cdc_chunks(docs))
    assert "EvalPython" not in plan
    assert "Exchange (" not in plan     # per-doc array pipeline + explode only
    shared = X.formatted_plan(D.cdc_shared(docs))
    # count(DISTINCT doc_id) plans as the standard two-phase distinct
    # agg: partial on (chunk_sha, doc_id), final on chunk_sha — both
    # keyed on the uniform 256-bit sha, both partial-aggregatable; two
    # Exchanges and never a third
    assert shared.count("Exchange (") == 2


# ---------------------------------------------------------------------------
# tile_quantile_classes (choropleth classification)
# ---------------------------------------------------------------------------

from fileverification_spark.operators import spatial as S


def test_tile_classes_equal_frequency(spark):
    # 10 tiles, counts 1..10, 5 classes -> 2 tiles per class, ordered
    tiles = spark.createDataFrame(
        [(i, 0, i + 1) for i in range(10)], "x long, y long, n_pages long"
    )
    got = {r["x"]: r["cls"] for r in S.tile_quantile_classes(tiles, 5).collect()}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3, 6: 4, 7: 4, 8: 5, 9: 5}


def test_tile_classes_ties_deterministic(spark):
    # equal counts split by (x, y) position — replay ntile by hand
    tiles = spark.createDataFrame(
        [(x, 0, 7) for x in range(5)], "x long, y long, n_pages long"
    )
    got = {r["x"]: r["cls"] for r in S.tile_quantile_classes(tiles, 2).collect()}
    # ntile(2) over 5 rows: first 3 in class 1, last 2 in class 2
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 2}


def test_tile_classes_rejects_bad_classes(spark):
    import pytest

    tiles = spark.createDataFrame([(0, 0, 1)], "x long, y long, n_pages long")
    with pytest.raises(ValueError):
        S.tile_quantile_classes(tiles, 0)


# ---------------------------------------------------------------------------
# bowtie_regions (Broder 2000 bow-tie decomposition)
# ---------------------------------------------------------------------------

def test_bowtie_hand_graph_all_regions(spark):
    # IN -> SCC(a <-> b) -> OUT, plus an untouched island (OTHER)
    edges = spark.createDataFrame(
        [
            ("in1", "a", 1), ("in2", "in1", 1),   # chain into the SCC
            ("a", "b", 1), ("b", "a", 1),          # the 2-cycle SCC
            ("a", "out1", 1), ("out1", "out2", 1),  # chain out
            ("iso1", "iso2", 1),                   # disconnected island
        ],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["host"]: r["region"]
           for r in GR.bowtie_regions(edges, seeds, max_depth=3).collect()}
    assert got == {
        "a": "SCC", "b": "SCC",
        "in1": "IN", "in2": "IN",
        "out1": "OUT", "out2": "OUT",
        "iso1": "OTHER", "iso2": "OTHER",
    }


def test_bowtie_depth_bound_truncates(spark):
    # at max_depth=1 the 2-hop tail is not yet reached -> OTHER
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("a", "o1", 1), ("o1", "o2", 1)],
        "src string, dst string, w long",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r["host"]: r["region"]
           for r in GR.bowtie_regions(edges, seeds, max_depth=1).collect()}
    assert got["o1"] == "OUT" and got["o2"] == "OTHER"


def test_bowtie_no_python(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1)], "src string, dst string, w long"
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    plan = X.formatted_plan(GR.bowtie_regions(edges, seeds, max_depth=2))
    assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# bigram_surprisal (second-order LM filter signal)
# ---------------------------------------------------------------------------

def test_bigram_surprisal_hand_computed(spark):
    # corpus: "a b a b" (bigrams ab x2, ba x1) + "a b c" (ab, bc)
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r
           for r in CUR.bigram_surprisal(docs, min_count=1).collect()}
    # corpus stats: c(ab)=3 c_w1(a)=3 -> bits=log2(1)=0
    #               c(ba)=1 c_w1(b)=... b followed by a(1) and c(1): c_w1=2
    #               -> bits(ba)=log2(2)=1; c(bc)=1 -> bits=1
    d1 = got[1]
    assert d1["n_bigrams"] == 3 and d1["known_bigrams"] == 3
    assert d1["surprisal_bits"] == 2 * 0 + 1 * 1   # ab ab ba
    assert d1["mean_millibits"] == (1000 * 1) // 3
    d2 = got[2]
    assert d2["surprisal_bits"] == 0 + 1           # ab bc


def test_bigram_surprisal_oov_counted_not_scored(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b z q")], "doc_id long, text string"
    )
    # min_count=2: only (a,b) with c=3 survives; (b,a),(b,z),(z,q) OOV
    got = {r["doc_id"]: r
           for r in CUR.bigram_surprisal(docs, min_count=2).collect()}
    assert got[2]["n_bigrams"] == 3
    assert got[2]["known_bigrams"] == 1            # just ab
    assert got[1]["known_bigrams"] == 2            # ab x2, ba OOV


def test_bigram_surprisal_all_oov_doc_zero_mean(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "a b a b a b")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r
           for r in CUR.bigram_surprisal(docs, min_count=3).collect()}
    assert got[1]["known_bigrams"] == 0
    assert got[1]["surprisal_bits"] == 0 and got[1]["mean_millibits"] == 0
