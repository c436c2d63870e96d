"""Streaming convergence: availableNow streaming result == batch result."""

from __future__ import annotations

import uuid

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
