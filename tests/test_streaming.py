"""Streaming convergence: availableNow streaming result == batch result."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from fileverification_spark.streaming import windows as SW

SF = "/root/testdata/sf0.001"


def _key(rows, cols):
    return {tuple(r[c] for c in cols) for r in rows}


def test_windowed_counts_stream_matches_batch(spark):
    batch = SW.windowed_counts(SW.read_events(spark, SF)).collect()
    stream_df = SW.windowed_counts(SW.read_events_stream(spark, SF), streaming=True)
    name = f"wc_{uuid.uuid4().hex[:8]}"
    # complete mode: append would withhold windows newer than
    # max_event_time - watermark (they never finalise in a finite stream)
    got = SW.run_stream_to_memory(stream_df, name, output_mode="complete").collect()
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _key(got, cols) == _key(batch, cols)
    assert len(batch) > 0


def test_stream_dedup_matches_batch(spark):
    batch_n = SW.stream_dedup(SW.read_events(spark, SF)).count()
    stream_df = SW.stream_dedup(SW.read_events_stream(spark, SF), streaming=True)
    name = f"dd_{uuid.uuid4().hex[:8]}"
    got = SW.run_stream_to_memory(stream_df, name).count()
    assert got == batch_n


def test_sessionize_invariants(spark):
    ev = SW.read_events(spark, SF)
    sess = SW.sessionize(ev).collect()
    assert sum(r["n_events"] for r in sess) == ev.count()
    for r in sess:
        assert r["session_start"] <= r["session_end"]


def test_stream_verify_arrivals(spark, tmp_path):
    from pyspark.sql import functions as F

    from fileverification_spark.operators import verify as V
    from fileverification_spark.sources import pages as P
    from fileverification_spark.streaming import incremental as INC

    base = P.pages(spark, SF)
    derived = P.with_derived(base)
    stored = V.tampered_manifest(derived)

    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two arrival files = two micro-batch candidates
    base.where(F.col("doc_id") % 2 == 0).write.mode("append").parquet(pages_dir)
    base.where(F.col("doc_id") % 2 == 1).write.mode("append").parquet(pages_dir)

    INC.stream_verify(spark, pages_dir, stored, out_dir, ckpt)
    report = spark.read.parquet(f"{out_dir}/report")
    want = {
        r["status"]: r["n"]
        for r in V.verify_counts(
            V.verify_tree(derived, stored).where(F.col("status") != "MISSING")
        ).collect()
    }
    got = {r["status"]: r["n"] for r in V.verify_counts(report).collect()}
    assert got == want

    # restart with the same checkpoint: exactly-once, nothing re-appended
    INC.stream_verify(spark, pages_dir, stored, out_dir, ckpt)
    assert spark.read.parquet(f"{out_dir}/report").count() == report.count()

    lin = spark.read.parquet(f"{out_dir}/lineage")
    assert lin.where(F.col("n_rows") <= 0).count() == 0

    # replay-after-crash: foreachBatch is at-least-once, so re-invoking an
    # already-committed batch_id must overwrite its own partition, not
    # duplicate rows (idempotent sink) — exercised standalone so the test
    # doesn't assume the stream's batch boundaries
    replay_dir = str(tmp_path / "replay")
    batch0 = base.where(F.col("doc_id") % 2 == 0)
    INC.reconcile_batch(batch0, stored, replay_dir, batch_id=0, res=P.LEAF_RES)
    once = spark.read.parquet(f"{replay_dir}/report").count()
    INC.reconcile_batch(batch0, stored, replay_dir, batch_id=0, res=P.LEAF_RES)
    assert spark.read.parquet(f"{replay_dir}/report").count() == once
    assert (
        spark.read.parquet(f"{replay_dir}/lineage")
        .groupBy("run_id")
        .count()
        .count()
        == 1
    )


def test_stateful_sessionize_converges_to_batch(spark):
    from pyspark.sql import functions as F

    from fileverification_spark.streaming import stateful as ST

    batch = SW.sessionize(SW.read_events(spark, SF))
    w_last = {
        (r["user_id"],): r["session_id"]
        for r in batch.groupBy("user_id")
        .agg(F.max("session_id").alias("session_id"))
        .collect()
    }
    all_rows = batch.collect()
    key = lambda r: (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
    all_sessions = {key(r) for r in all_rows}
    closed = {
        key(r) for r in all_rows if r["session_id"] != w_last[(r["user_id"],)]
    }

    stream_df = ST.sessionize_stream(
        SW.read_events_stream(spark, SF).select("user_id", "ts")
    )
    name = f"ss_{__import__('uuid').uuid4().hex[:8]}"
    got_rows = SW.run_stream_to_memory(stream_df, name).collect()
    got = {key(r) for r in got_rows}
    # every gap-closed session must be emitted; timed-out trailing
    # sessions may or may not finalise on a finite stream
    assert closed <= got <= all_sessions
    assert len(closed) > 0


def test_geofence_stream_matches_batch(spark):
    """Geofence alerting: the streaming pipeline (stateless PIP + watermarked
    window agg) converges to the batch form on the same events; n_events
    identical, n_users HLL vs exact compared by key presence."""
    from fileverification_spark.operators import spatial as S
    from fileverification_spark.streaming import geofence as SG

    polys = S.default_polygons()
    batch_hits = SG.geofence_hits(SW.read_events(spark, SF), polys)
    batch = SG.geofence_alerts_exact_users(batch_hits).collect()
    assert batch, "fixture events must hit at least one fence"

    stream_hits = SG.geofence_hits(SW.read_events_stream(spark, SF), polys)
    stream_df = SG.geofence_alerts(stream_hits, streaming=True)
    name = f"gf_{uuid.uuid4().hex[:8]}"
    got = SW.run_stream_to_memory(stream_df, name, output_mode="complete").collect()

    cols = ["window_start", "poly_id", "n_events"]
    assert _key(got, cols) == _key(batch, cols)


def test_geofence_hits_subset_of_events(spark):
    from fileverification_spark.operators import spatial as S
    from fileverification_spark.streaming import geofence as SG

    ev = SW.read_events(spark, SF)
    hits = SG.geofence_hits(ev, S.default_polygons())
    n_ev, n_hits = ev.count(), hits.count()
    assert 0 < n_hits < n_ev
    # one row per (event, fence): no duplicate pairs from the covering join
    assert hits.select("event_id", "poly_id").distinct().count() == n_hits


def test_trending_terms_stream_matches_batch(spark):
    """The stateful part of trending_terms (per-day term counts) must
    converge stream==batch; the top-k rank is the batch consumer's
    post-step, asserted against a driver-side replay."""
    from pyspark.sql import functions as F

    from fileverification_spark.sources import pages as P

    batch_counts = SW.trending_terms(
        P.pages(spark, SF), k=10**9  # no cut: full count relation
    ).drop("rank").collect()
    stream_df = SW.trending_terms(
        SW.read_pages_stream(spark, SF), streaming=True
    )
    name = f"tt_{uuid.uuid4().hex[:8]}"
    got = SW.run_stream_to_memory(stream_df, name, output_mode="complete").collect()
    cols = ["window_start", "term", "n"]
    assert _key(got, cols) == _key(batch_counts, cols)
    assert len(batch_counts) > 0

    # rank correctness: top-5 equals driver replay of (n DESC, term ASC)
    top = SW.trending_terms(P.pages(spark, SF), k=5).collect()
    by_w = {}
    for r in batch_counts:
        by_w.setdefault(r["window_start"], []).append((r["term"], r["n"]))
    want = set()
    for w, terms in by_w.items():
        for rank, (t, n) in enumerate(
            sorted(terms, key=lambda x: (-x[1], x[0]))[:5], 1
        ):
            want.add((w, t, n, rank))
    assert {(r["window_start"], r["term"], r["n"], r["rank"]) for r in top} == want


def test_stream_frontier_matches_batch(spark):
    from fileverification_spark.operators import graph as GR

    # planted outlink html over the page stream (same construction on
    # the batch side, so the only difference is the execution mode)
    def with_links(pages):
        d = F.col("doc_id")
        html = F.concat(
            F.lit('<a href="https://s'),
            (d % 7).cast("string"),
            F.lit('.net/x">a</a><a href="'),
            F.col("url"),  # self-link: always already fetched
            F.lit('">self</a><a href="/rel">r</a>'),
        )
        return pages.select(
            "url", F.encode(html, "UTF-8").alias("html")
        )

    from fileverification_spark.sources import pages as P

    batch_pages = with_links(P.pages(spark, SF))
    want = {r["url"] for r in GR.crawl_frontier(batch_pages).collect()}

    stream_df = SW.stream_frontier(
        with_links(SW.read_pages_stream(spark, SF)),
        batch_pages.select("url"),
    )
    name = f"fr_{uuid.uuid4().hex[:8]}"
    got = {
        r["url"]
        for r in SW.run_stream_to_memory(stream_df, name).collect()
    }
    assert got == want
    assert got == {f"https://s{i}.net/x" for i in range(7)}
