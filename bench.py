"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...per-query min sec...}, "samples": {...all runs...},
     "sf": <sf>, "pages_per_sec": <flagship verify throughput>, ...}

Noise protocol (mirrors tools/scaling_run.py, adopted r3 so
round-over-round deltas are attributable to code, not ambient tenant
load — the r02 battery "regression" was pure host noise):

- **CPU pinning**: the process (and the in-process JVM it spawns) is
  pinned to exactly $SPARK_GRAFT_CPUS cores via sched_setaffinity, so a
  noisy co-tenant cannot donate or steal cores mid-run.
- **Interleaved passes**: BENCH_RUNS (default 5) full passes over the
  whole battery, one timing per query per pass — ambient load drift hits
  every query equally instead of whichever query was running when the
  spike landed.
- **min + dispersion**: per-query headline is min-of-passes (uncontended
  capability); every sample is persisted under "samples" and the
  battery-level max spread under "spread_max_pct", so a cross-round
  comparison can check the floor was actually observed quietly. The
  first pass is each query's whole-stage-codegen JIT warm-up (2-7x
  steady state even on an idle host), so the spread stat covers passes
  1.. only; "spread_incl_warmup_pct" keeps the inclusive number.
- **contention stamps** (r4, VERDICT r3 "What's wrong" #1 / "Next round"
  #4): every timed run samples /proc/stat around itself — hypervisor
  steal fraction and sibling-CPU busy fraction on the cores OUTSIDE this
  process's affinity mask (a co-tenant there still depresses us through
  the hypervisor cycle cap). Per-run samples persist under "steal"/
  "sibling_busy"; the record is flagged "contaminated": true when
  spread_max_pct exceeds BENCH_SPREAD_FLAG (default 150%) or the median
  per-run steal exceeds 5%, so a noisy window can never silently stand
  as the round's number-of-record.
- **self-healing windows** (r5, VERDICT r4 "Next round" #3): a
  contaminated window is not recorded as the round's number — the whole
  battery re-runs in a fresh window (after BENCH_RETRY_SLEEP s, default
  45) up to BENCH_MAX_WINDOWS (default 3) times, and the artifact
  carries the FIRST CLEAN window (plus "windows_run" and every window's
  spread/steal summary under "window_history" for audit). Only if every
  window is noisy does a contaminated=true record stand, with the
  least-contaminated window's numbers.
- **bucketed headline leg** (r5, VERDICT r4 "Next round" #5): the
  zero-shuffle bucketed verify layout is timed alongside the flat path
  ("verify_tree_bucketed"); both throughputs are reported
  (pages_per_sec / pages_per_sec_bucketed). The bucketed write is
  untimed setup — bucketing is a table layout paid once at ingest,
  exactly like the reference's directory tree.
- **isolated flagship window** (r5, VERDICT r4 "What's wrong" #2): the
  headline throughputs are timed in a dedicated two-leg window BEFORE
  the wide battery. Root cause of the r4 "-23% regression": the r4
  battery's checkpoint/persist-heavy graph legs inflate every later
  leg's min in the shared JVM (block-manager occupancy + async
  ContextCleaner churn) — verify_tree isolated measures 1.82 s / 220k
  pages/s in the same clean windows where the full battery shows
  2.4-2.6 s. "pages_per_sec_in_battery" keeps the interference-
  inclusive number for continuity.

The flagship throughput number runs verify_tree over a deterministically
replicated pages table (BENCH_REPLICATION x documents, default 80) so the
measurement isn't dominated by fixed overhead at small document counts.
Scaling-efficiency evidence (local[8] vs local[32]) is produced separately
by tools/scaling_run.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from fileverification_spark.functions import urls as U
from fileverification_spark.operators import curation as CUR
from fileverification_spark.operators import dedup as D
from fileverification_spark.operators import funnel as FN
from fileverification_spark.operators import graph as GR
from fileverification_spark.operators import manifest as M
from fileverification_spark.operators import repetition as REP
from fileverification_spark.operators import multimodal as MM
from fileverification_spark.operators import sampling as SMP
from fileverification_spark.operators import search as SRCH
from fileverification_spark.operators import similarity as SIM
from fileverification_spark.operators import sketch as SK
from fileverification_spark.operators import spatial as S
from fileverification_spark.operators import trajectory as TJ
from fileverification_spark.operators import verify as V
from fileverification_spark.session import get_spark
from fileverification_spark.sources import pages as P
from fileverification_spark.streaming import windows as SW

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATION = int(os.environ.get("BENCH_REPLICATION", "80"))
RUNS = int(os.environ.get("BENCH_RUNS", "5"))

# the original r01 11-query battery — kept as a stable cross-round subset
R01_NAMES = (
    "verify_tree", "merkle_ladder", "digests_mergeable", "pip_pages",
    "knn", "knn_ring", "raster_cells", "dedup_minhash", "simhash",
    "ann_cosine_topk", "multimodal_features",
)


def _sf_label(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _pin_cpus() -> "set[int]":
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # optional base offset: lets a smoke run occupy cores N..N+K while a
    # timing run owns cores 0..N-1 on the same host
    base = int(os.environ.get("SPARK_GRAFT_CPU_BASE", "0"))
    try:
        os.sched_setaffinity(0, range(base, base + cpus))
        return set(os.sched_getaffinity(0))
    except (AttributeError, OSError, ValueError):
        return set()  # non-Linux or cgroup-restricted: run unpinned


def _cpu_stamp(mine: "set[int]"):
    """One /proc/stat observation: (total_jiffies, steal_jiffies,
    busy_jiffies_on_cores_outside_my_affinity). Differencing two stamps
    around a timed run yields the steal fraction and the sibling-tenant
    busy fraction DURING that run — contention as recorded evidence."""
    total = steal = sib_busy = sib_total = 0
    try:
        with open("/proc/stat") as f:
            for line in f:
                if not line.startswith("cpu"):
                    break
                name, *parts = line.split()
                vals = [int(x) for x in parts[:8]]
                if name == "cpu":  # aggregate line
                    total, steal = sum(vals), vals[7]
                elif mine and int(name[3:]) not in mine:
                    sib_total += sum(vals)
                    sib_busy += sum(vals) - vals[3] - vals[4]  # - idle - iowait
    except OSError:
        pass
    return total, steal, sib_busy, sib_total


def _contention(before, after) -> "tuple[float, float]":
    dt = max(after[0] - before[0], 1)
    steal = (after[1] - before[1]) / dt
    sib = (after[2] - before[2]) / max(after[3] - before[3], 1)
    return round(steal, 4), round(sib, 4)


def _nn_bench(live) -> int:
    # no explicit ladder: the density probe picks the level (res 8 at
    # this density — the same level r3 hand-tuned), so the bench leg
    # times the production path probe included
    src = live.select("url", "lat", "lon").persist()
    try:
        return S.nn_join(src, src).count()
    finally:
        src.unpersist()


_LINK_BENCH_HOSTS = 1024


def _canon_edges(live):
    """Planted rel=canonical declarations at n_pages scale: the same
    terminal/chain/2-cycle CASE as the contract fixture over the
    replicated corpus's dense doc_id space, so the chains (depth up to
    16 > the 2^3-hop cap) and 2-cycles are all really present."""
    d = F.col("doc_id")
    tgt = (
        F.when(d % 23 == 21, d + 1)
        .when(d % 23 == 22, d - 1)
        .when(d % 17 == 0, d)
        .otherwise(d - 1)
    )
    return live.select(
        F.concat(F.lit("u"), d.cast("string")).alias("url"),
        F.concat(F.lit("u"), tgt.cast("string")).alias("canon"),
    )


def _link_pages(live):
    """Synthesize a 1024-host outlink corpus over the replicated pages
    (3 anchor elements per page, modular targets) — bench twin of the
    contract's planted link corpus at n_pages scale."""
    d = F.abs(F.hash("url")).cast("bigint")

    def site(expr):
        return F.concat(
            F.lit('<a href="https://site'),
            (expr % _LINK_BENCH_HOSTS).cast("string"),
            F.lit(".example.net/p"),
        )

    html = F.concat(
        site(d * 3 + 1), F.lit('">fast join</a>'),
        site(d * 5 + 2), F.lit('">hash verify</a>'),
        site(d * 7), F.lit('">broadcast cell</a>'),
    )
    return live.select(
        F.concat(
            F.lit("https://site"),
            (d % _LINK_BENCH_HOSTS).cast("string"),
            F.lit(".example.net/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )


def _hits_bench(live) -> int:
    # same cache-reuse guard as _pagerank_bench: one extraction pass,
    # then the HITS ladder; unpersist every handle between passes
    edges = GR.host_edges(_link_pages(live)).persist()
    handles = [edges]
    try:
        return GR.hits(edges, iters=3, handles=handles).count()
    finally:
        for h in handles:
            h.unpersist(blocking=True)


def _pagerank_bench(live) -> int:
    # persist the edge relation so the timed region pays ONE extraction
    # pass + the iteration ladder; unpersist EVERY handle afterwards —
    # Spark's CacheManager matches identical plans, so the next timing
    # pass would otherwise be served from this pass's caches
    edges = GR.host_edges(_link_pages(live)).persist()
    handles = [edges]
    try:
        return GR.pagerank(edges, iters=3, handles=handles).count()
    finally:
        for h in handles:
            h.unpersist(blocking=True)


def _modularity_bench(live) -> int:
    # the edge relation feeds BOTH the LPA sweeps and the scoring joins
    # — persist it so the timed region pays one extraction; unpersist
    # afterwards (the _pagerank_bench cache-reuse guard)
    edges = GR.host_edges(_link_pages(live)).persist()
    try:
        labels = GR.lpa_communities(edges, rounds=3)
        return GR.modularity(edges, labels).count()
    finally:
        edges.unpersist(blocking=True)


def _run_window(cases: dict, my_cores: "set[int]", runs: int) -> dict:
    """One timing window: ``runs`` interleaved passes over the battery,
    each run contention-stamped. Returns samples + the window's
    contamination verdict (spread over steady passes, median steal)."""
    samples: dict[str, list[float]] = {name: [] for name in cases}
    steal_s: dict[str, list[float]] = {name: [] for name in cases}
    sib_s: dict[str, list[float]] = {name: [] for name in cases}
    for _ in range(runs):
        for name, fn in cases.items():
            c0 = _cpu_stamp(my_cores)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            steal, sib = _contention(c0, _cpu_stamp(my_cores))
            samples[name].append(round(dt, 3))
            steal_s[name].append(steal)
            sib_s[name].append(sib)

    # The FIRST interleaved pass compiles each query's generated code
    # (whole-stage codegen JIT): its samples run 2-7x the steady state
    # with zero steal and idle siblings — warm-up, not window
    # contamination. min-of-runs already ignores it; the contamination
    # flag must too, or every clean record self-flags. All samples stay
    # persisted (samples[name][0] IS the warm-up observation) and the
    # warm-up-inclusive spread is recorded alongside for transparency.
    def _spread(vals):
        return max(
            round(100.0 * (max(s) - min(s)) / min(s), 1)
            for s in vals
            if min(s) > 0
        )

    steady = [s[1:] if len(s) >= 3 else s for s in samples.values()]
    spread_max_pct = _spread(steady)
    spread_incl_warmup_pct = _spread(list(samples.values()))
    all_steals = sorted(v for s in steal_s.values() for v in s)
    median_steal = all_steals[len(all_steals) // 2] if all_steals else 0.0
    spread_flag = float(os.environ.get("BENCH_SPREAD_FLAG", "150"))
    return {
        "samples": samples,
        "steal": steal_s,
        "sib": sib_s,
        "spread_max_pct": spread_max_pct,
        "spread_incl_warmup_pct": spread_incl_warmup_pct,
        "median_steal": median_steal,
        "contaminated": spread_max_pct > spread_flag or median_steal > 0.05,
    }


def main() -> None:
    my_cores = _pin_cpus()
    spark = get_spark("bench")

    # -- setup (untimed): inputs materialised / file listings warmed --
    live = P.pages_replicated(spark, SF_DIR, REPLICATION)
    n_pages = live.count()
    stored = V.tampered_manifest(live)
    pg = P.pages_with_derived(spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    events = SW.read_events(spark, SF_DIR)

    # bucketed twin of the flagship inputs (VERDICT r4 "Next round" #5):
    # both verify sides Hive-bucketed on the join keys so the timed leg
    # measures the zero-shuffle co-located layout. The write is untimed
    # setup — bucketing is a TABLE layout paid once at ingest and
    # amortised over every verify run, like the reference's directory
    # tree (tools/bucketed_bench.py measures the same thing isolated).
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    n_buckets = 2 * int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    for t in ("bench_live_b", "bench_stored_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
    P.write_bucketed(live, "bench_live_b", n_buckets, "cell", "url")
    P.write_bucketed(stored, "bench_stored_b", n_buckets, "cell", "child_key")
    live_b = spark.table("bench_live_b")
    stored_b = spark.table("bench_stored_b")

    cases: dict = {
        # flagship first in every pass: its min drives pages_per_sec
        "verify_tree": lambda: V.verify_tree(live, stored).count(),
        # same semantics over the bucketed layout: zero shuffle Exchange
        # (plan-pinned tests/test_plans.py) — drives pages_per_sec_bucketed
        "verify_tree_bucketed": lambda: V.verify_tree(live_b, stored_b).count(),
        "merkle_ladder": lambda: M.merkle_ladder(
            M.leaf_digests(live, P.LEAF_RES), P.LEAF_RES
        ).count(),
        "digests_mergeable": lambda: M.mergeable_digests(live, P.LEAF_RES).count(),
        "pip_pages": lambda: S.pip_join(live, S.default_polygons(), P.LEAF_RES).count(),
        "knn": lambda: S.knn_bruteforce(pg, S.default_query_points(10), 10).count(),
        "knn_ring": lambda: S.knn_ring(
            live, S.default_query_points(10), 10, res=3, rings=4
        ).count(),
        "raster_cells": lambda: S.raster_cells(live, 6).count(),
        "dedup_minhash": lambda: D.lsh_candidate_pairs(
            D.minhash_signatures(docs)
        ).count(),
        "simhash": lambda: D.simhash_docs(docs).count(),
        "ann_cosine_topk": lambda: SIM.cosine_topk(emb, [0, 25, 50, 75, 100], 10).count(),
        "multimodal_features": lambda: MM.extract_features(
            P.pages(spark, SF_DIR, with_html=True)
        ).count(),
        # round-2 additions
        "distance_join": lambda: S.distance_self_join(live, 0.35).count(),
        # single level sized to the bench density (~3 rows/cell at 400k
        # points); the r3 ring-escalation (k=2,4) certifies the sparse
        # remainder so the cartesian tail is empty. The bench input is a
        # *derived* relation (sha256 geocode); persisting the slim
        # (url, lat, lon) projection emulates the materialized table a
        # real deployment reads.
        "nn_join": lambda: _nn_bench(live),
        "compact_cells": lambda: S.compact_cells(
            S.rasterize_polygons(spark, S.default_polygons(), 7).select("cell"), 7
        ).count(),
        "top_lang_cell": lambda: S.top_lang_per_cell(live, 6).count(),
        # round-3 additions: streaming-analytics batch twins (one window
        # shuffle per (user[, fence]) — tracked so the sessionization
        # surface has a number)
        "sessionize": lambda: SW.sessionize(events).count(),
        "fence_dwells": lambda: TJ.fence_dwells(events, S.default_polygons()).count(),
        # hypertable rollup: 5 resolutions from ONE pages scan; coarser
        # levels fold the previous level's (cell, lang, cnt) raster
        "raster_pyramid": lambda: S.raster_pyramid(live, finest=8, coarsest=4).count(),
        # round-3 corpus hygiene: zero-shuffle repetition gates, broadcast
        # decontamination, two-level vocab agg
        "repetition_stats": lambda: REP.repetition_stats(docs).count(),
        "decontaminate": lambda: REP.decontaminate(
            docs.where(F.col("doc_id") % REP.BENCH_MOD != 0),
            docs.where(F.col("doc_id") % REP.BENCH_MOD == 0),
        ).count(),
        "vocab_topk": lambda: CUR.vocab_topk(docs).count(),
        # round-3 late additions: retrieval/keyword surface, URL-family
        # dedup over the replicated pages table, KMV sketch ladder over
        # the bench corpus, focal raster stencil
        "tfidf_terms": lambda: CUR.tfidf_top_terms(docs, k=3).count(),
        "bm25_topk": lambda: SRCH.bm25_search(docs, "fast hash join", 20).count(),
        "url_families": lambda: D.canonical_families(live).count(),
        "kmv_cells": lambda: SK.kmv_estimate(SK.kmv_cells(live, 6)).count(),
        "raster_smooth": lambda: S.raster_smooth(live, 6).count(),
        # round-3 continuation: link-graph surface — html synthesized
        # per replicated page (1024-host modular corpus), so the legs
        # measure real WAT extraction (regexp_extract_all over n_pages
        # strings) + the graph aggregation/iteration on top
        "host_graph": lambda: GR.host_edges(_link_pages(live)).count(),
        # -- round 4 --
        "domain_quantiles": lambda: CUR.domain_quantiles(live).count(),
        "shingle_dups": lambda: D.shingle_duplicates(docs).count(),
        "cocite_hosts": lambda: GR.cocitation(
            GR.host_edges(_link_pages(live))
        ).count(),
        "hits_hosts": lambda: _hits_bench(live),
        "pagerank_hosts": lambda: _pagerank_bench(live),
        "anchor_terms": lambda: GR.anchor_terms(_link_pages(live)).count(),
        "inverted_index": lambda: SRCH.inverted_index(
            docs, min_df=2, postings_cap=8
        ).count(),
        # -- round 5 --
        "url_quality": lambda: U.url_quality_features(live).count(),
        "crawl_traps": lambda: CUR.crawl_traps(live).count(),
        "semantic_dedup": lambda: SIM.semantic_dedup(emb, 0.3, 25).count(),
        # r5 late additions: winnowing copy-detection join, positional
        # phrase scan, exact-integer temperature mixture, pointer-
        # doubling canonical resolution over a planted page-sized chain
        # relation
        "winnow_pairs": lambda: D.winnow_pairs(docs).count(),
        "phrase_search": lambda: SRCH.phrase_search(docs, "fast hash join").count(),
        "lang_temperature": lambda: SMP.lang_temperature(live).count(),
        "canonical_resolve": lambda: GR.canonical_resolve(
            _canon_edges(live), iters=3
        ).count(),
        # r5 final additions: mergeable sketches over the corpus token
        # stream (CMS) and the cell grid (HLL), distributed KN bigram
        # counting, link prediction over the host graph, clickstream
        # transition matrix, content-defined chunk dedup
        "cms_tokens": lambda: SK.cms_tokens(docs).count(),
        "hll_cells": lambda: SK.hll_estimate(SK.hll_cells(pg, 3)).count(),
        "kn_bigrams": lambda: CUR.kn_bigram_stats(docs).count(),
        "adamic_adar": lambda: GR.adamic_adar(
            GR.host_edges(_link_pages(live))
        ).count(),
        "event_transitions": lambda: FN.event_transitions(events).count(),
        "cdc_dedup": lambda: D.cdc_shared(docs).count(),
        # r5 closing additions: Bloom build+probe over the corpus URL
        # set (register agg + broadcast membership), the Hilbert xy->d
        # projection ladder (zero-shuffle, prices the layout key
        # against morton's interleave), deterministic LPA sweeps on the
        # 1024-host link graph
        "bloom_frontier": lambda: SK.bloom_probe(
            SK.bloom_urls(live), live.select("url")
        ).count(),
        "hilbert_layout": lambda: S.hilbert_layout_stats(live).count(),
        "lpa_communities": lambda: GR.lpa_communities(
            GR.host_edges(_link_pages(live)), rounds=3
        ).count(),
        # r5 final trio: HyperBall reach ladder (per-round edge-onto-
        # sketch join + (node, reg) partial max, localCheckpoint-staged
        # so no CacheManager reuse across passes), LPA-then-score
        # modularity composition, and the DSIR two-tower weight pass
        # over the full replicated corpus vs the English doc slice
        "hyperball": lambda: GR.hyperball(
            GR.host_edges(_link_pages(live)), t_max=3
        ).count(),
        "modularity": lambda: _modularity_bench(live),
        "dsir_weights": lambda: CUR.dsir_weights(
            live.select("url", "text"),
            docs.where(F.col("lang") == "en"),
        ).count(),
    }

    # BENCH_ONLY=comma,list: restrict the battery — the isolation probe
    # for attributing a leg's drift to the leg vs its battery neighbors
    # (r4's clean-window verify regression turned out to be exactly
    # that: checkpoint/persist-heavy graph legs sharing the JVM).
    only = {s for s in os.environ.get("BENCH_ONLY", "").split(",") if s}
    if only:
        cases = {k: v for k, v in cases.items() if k in only}

    # -- flagship window FIRST, isolated (root cause of the r4 "-23%
    # verify regression", VERDICT r4 "What's wrong" #2: the r4 battery
    # added checkpoint/persist-heavy graph legs whose block-manager
    # occupancy + async ContextCleaner churn inflate every later leg's
    # min in the shared JVM — verify_tree isolated measures 1.82 s /
    # 220k pages/s in the same windows where the full battery shows
    # 2.4-2.6 s). The headline throughput is therefore timed in a
    # dedicated two-leg window before the wide battery; the battery
    # still re-times verify_tree for the (explicitly interference-
    # inclusive) battery total. --
    max_windows = max(1, int(os.environ.get("BENCH_MAX_WINDOWS", "3")))
    retry_sleep = float(os.environ.get("BENCH_RETRY_SLEEP", "45"))
    flagship_names = [n for n in ("verify_tree", "verify_tree_bucketed")
                      if n in cases]
    flag_best = None
    for w in range(max_windows):
        fwin = _run_window({n: cases[n] for n in flagship_names},
                           my_cores, RUNS) if flagship_names else None
        if fwin is None:
            break
        if flag_best is None or (
            (fwin["contaminated"], fwin["median_steal"])
            < (flag_best["contaminated"], flag_best["median_steal"])
        ):
            flag_best = fwin
        if not fwin["contaminated"]:
            break
        if w + 1 < max_windows:
            time.sleep(retry_sleep)

    # -- interleaved timing passes, contention-stamped per run, with
    # self-healing retry windows (VERDICT r4 "Next round" #3): a
    # contaminated window triggers a fresh full-battery window after a
    # cool-down; the recorded numbers are the first clean window's (or
    # the least-contaminated window's if none is clean) --
    best = None
    window_history: list[dict] = []
    for w in range(max_windows):
        win = _run_window(cases, my_cores, RUNS)
        window_history.append(
            {
                "window": w,
                "spread_max_pct": win["spread_max_pct"],
                "median_steal": win["median_steal"],
                "contaminated": win["contaminated"],
                "verify_tree_min": min(
                    win["samples"].get("verify_tree", [float("nan")])
                ),
            }
        )
        badness = (win["contaminated"], win["median_steal"],
                   win["spread_max_pct"])
        if best is None or badness < (best["contaminated"],
                                      best["median_steal"],
                                      best["spread_max_pct"]):
            best = win
        if not win["contaminated"]:
            break
        if w + 1 < max_windows:
            print(
                f"# window {w} contaminated "
                f"(spread {win['spread_max_pct']}%, "
                f"steal {win['median_steal']}); retrying in "
                f"{retry_sleep:.0f}s",
                file=sys.stderr,
            )
            time.sleep(retry_sleep)

    samples = best["samples"]
    steal_s = best["steal"]
    sib_s = best["sib"]
    spread_max_pct = best["spread_max_pct"]
    spread_incl_warmup_pct = best["spread_incl_warmup_pct"]
    median_steal = best["median_steal"]
    contaminated = best["contaminated"]
    results = {name: min(s) for name, s in samples.items()}
    n_report = V.verify_tree(live, stored).count()
    # headline = the isolated flagship window (uncontended capability);
    # the battery's own verify_tree min stays under queries/ battery
    # totals as the interference-inclusive number
    if flag_best is not None:
        t_verify = min(flag_best["samples"]["verify_tree"])
        t_verify_b = min(flag_best["samples"].get(
            "verify_tree_bucketed", [float("nan")]))
        flagship_contaminated = flag_best["contaminated"]
        flagship_samples = flag_best["samples"]
    else:
        t_verify = results.get("verify_tree", float("nan"))
        t_verify_b = results.get("verify_tree_bucketed", float("nan"))
        flagship_contaminated = contaminated
        flagship_samples = {}
    battery_r01 = round(sum(results.get(n, 0.0) for n in R01_NAMES), 3)
    total = round(sum(results.values()), 3)
    print(
        json.dumps(
            {
                "metric": "spatial-join + per-cell Merkle-manifest verification throughput",
                "value": total,
                "unit": "sec",
                "battery_r01_sec": battery_r01,
                "queries": results,
                "samples": samples,
                "steal": steal_s,
                "sibling_busy": sib_s,
                "median_steal": median_steal,
                "spread_max_pct": spread_max_pct,
                "spread_incl_warmup_pct": spread_incl_warmup_pct,
                "contaminated": contaminated,
                "windows_run": len(window_history),
                "window_history": window_history,
                "runs": RUNS,
                "protocol": "pinned+interleaved, min-of-runs, contention-stamped",
                "sf": _sf_label(SF_DIR),
                "pages_per_sec": round(n_pages / t_verify, 1),
                "pages_per_sec_bucketed": round(n_pages / t_verify_b, 1),
                "pages_per_sec_in_battery": round(
                    n_pages / results.get("verify_tree", float("nan")), 1
                ),
                "flagship_contaminated": flagship_contaminated,
                "flagship_samples": flagship_samples,
                "n_buckets": n_buckets,
                "n_pages": n_pages,
                "n_report_rows": n_report,
                "replication": REPLICATION,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            }
        )
    )
    for t in ("bench_live_b", "bench_stored_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)


if __name__ == "__main__":
    main()
