"""Snapshot-log table format (sources/snaplog) + resume-from-snapshot
verification — the demonstrated Iceberg-semantics seam (SURVEY §1.3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fileverification_spark.sources import pages as P
from fileverification_spark.sources import snaplog as S
from fileverification_spark.streaming import incremental as I

from tests.conftest import SF0001


def _manifest_of(live):
    """Stored-manifest rows (cell, child_key, algo, hash) mirroring the
    derived pages — every entry expected OK."""
    return live.select(
        F.col("cell"),
        F.col("url").alias("child_key"),
        F.lit("sha256").alias("algo"),
        F.col("text_sha256").alias("hash"),
    )


def _pages(spark, lo, hi):
    return (P.pages(spark, SF0001)
            .where((F.crc32(F.col("url")) % 100 >= lo)
                   & (F.crc32(F.col("url")) % 100 < hi)))


def test_commit_read_roundtrip(spark, tmp_path):
    t = str(tmp_path / "t")
    df = _pages(spark, 0, 50)
    snap = S.commit(df, t)
    assert snap.parent_id is None and snap.sequence == 0
    assert snap.operation == "append"
    got = S.read(spark, t)
    assert got.count() == df.count()
    assert set(got.columns) == set(df.columns)


def test_append_accumulates_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b = _pages(spark, 0, 30), _pages(spark, 30, 60)
    s1 = S.commit(a, t)
    s2 = S.commit(b, t)
    assert s2.parent_id == s1.snapshot_id and s2.sequence == 1
    assert S.read(spark, t).count() == a.count() + b.count()
    # time travel back to s1 sees only the first commit
    assert S.read(spark, t, s1.snapshot_id).count() == a.count()
    # lineage chain newest-first
    assert [s.snapshot_id for s in S.history(t)] == [
        s2.snapshot_id, s1.snapshot_id]


def test_overwrite_replaces_visible_set(spark, tmp_path):
    t = str(tmp_path / "t")
    S.commit(_pages(spark, 0, 50), t)
    b = _pages(spark, 50, 60)
    s2 = S.commit(b, t, operation="overwrite")
    assert S.read(spark, t).count() == b.count()
    assert s2.summary["total_files"] == len(s2.added_files)


def test_rollback_is_pointer_swap(spark, tmp_path):
    t = str(tmp_path / "t")
    s1 = S.commit(_pages(spark, 0, 30), t)
    s2 = S.commit(_pages(spark, 30, 60), t)
    S.rollback(t, s1.snapshot_id)
    assert S.current_snapshot_id(t) == s1.snapshot_id
    # later snapshot still on disk: roll forward again
    S.rollback(t, s2.snapshot_id)
    assert S.current_snapshot_id(t) == s2.snapshot_id
    with pytest.raises(FileNotFoundError):
        S.rollback(t, "deadbeef00000000")


def test_orphaned_files_invisible_to_readers(spark, tmp_path):
    """Crash mid-commit = data written, pointer unswapped. Readers plan
    from the manifest, so the orphan never appears."""
    t = str(tmp_path / "t")
    a = _pages(spark, 0, 30)
    s1 = S.commit(a, t)
    # simulate the crash: data lands but metadata/pointer never happen
    orphan_dir = os.path.join(t, "data", "seq-crashed")
    _pages(spark, 30, 60).write.parquet(orphan_dir)
    assert S.current_snapshot_id(t) == s1.snapshot_id
    assert S.read(spark, t).count() == a.count()


def test_commit_is_reentrant_after_crash(spark, tmp_path, monkeypatch):
    """A crash BETWEEN the parquet write and the pointer swap leaves a
    staging dir at the sequence's default name; the retry must pick a
    fresh staging dir and succeed (ADVICE r3: commit re-entrancy)."""
    t = str(tmp_path / "t")
    a = _pages(spark, 0, 30)
    S.commit(a, t)
    boom = RuntimeError("crash before pointer swap")
    real_swap = S._swap_pointer
    monkeypatch.setattr(S, "_swap_pointer",
                        lambda *args: (_ for _ in ()).throw(boom))
    b = _pages(spark, 30, 60)
    with pytest.raises(RuntimeError):
        S.commit(b, t)
    monkeypatch.setattr(S, "_swap_pointer", real_swap)
    # retry at the SAME sequence: leftover data/seq-1 must not block it
    snap = S.commit(b, t)
    assert snap.sequence == 1
    assert S.read(spark, t).count() == a.count() + b.count()


def test_commit_is_reentrant_after_rollback(spark, tmp_path):
    """rollback() to an ancestor then commit() re-derives an already-used
    sequence number; the new commit must not collide with the abandoned
    branch's staging dir (ADVICE r3)."""
    t = str(tmp_path / "t")
    s1 = S.commit(_pages(spark, 0, 30), t)
    S.commit(_pages(spark, 30, 60), t)          # seq 1, now abandoned
    S.rollback(t, s1.snapshot_id)
    c = _pages(spark, 60, 90)
    snap = S.commit(c, t)                       # seq 1 again, new branch
    assert snap.sequence == 1 and snap.parent_id == s1.snapshot_id
    assert S.read(spark, t).count() == (
        _pages(spark, 0, 30).count() + c.count())


def test_incremental_scan_is_exactly_the_delta(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b, c = (_pages(spark, 0, 30), _pages(spark, 30, 60),
               _pages(spark, 60, 80))
    s1 = S.commit(a, t)
    s2 = S.commit(b, t)
    s3 = S.commit(c, t)
    assert (S.incremental_scan(spark, t, s1.snapshot_id, s2.snapshot_id)
            .count() == b.count())
    assert (S.incremental_scan(spark, t, s1.snapshot_id).count()
            == b.count() + c.count())
    # from the beginning = full scan; empty delta = zero rows
    assert S.incremental_scan(spark, t, None).count() == S.read(
        spark, t).count()
    assert (S.incremental_scan(spark, t, s3.snapshot_id).count() == 0)


def test_incremental_scan_rejects_non_ancestor(spark, tmp_path):
    t1, t2 = str(tmp_path / "a"), str(tmp_path / "b")
    S.commit(_pages(spark, 0, 30), t1)
    sx = S.commit(_pages(spark, 30, 60), t2)
    with pytest.raises(ValueError, match="ancestor"):
        S.incremental_scan(spark, t1, sx.snapshot_id)


def test_verify_from_snapshot_matches_full_verify_on_delta(spark, tmp_path):
    """Resume-from-checkpoint: verifying only the post-snapshot delta
    produces exactly the rows the full verify produces for those urls."""
    t = str(tmp_path / "t")
    a, b = _pages(spark, 0, 50), _pages(spark, 50, 80)
    s1 = S.commit(a, t)
    S.commit(b, t)

    res = 4
    full_live = P.with_derived(S.read(spark, t), res=res)
    stored = _manifest_of(full_live).cache()

    report, lin = I.verify_from_snapshot(
        spark, t, stored, s1.snapshot_id, leaf_res=res)
    rows = report.collect()
    delta_urls = {r.url for r in b.select("url").collect()}
    assert {r.child_key for r in rows} == delta_urls
    assert all(r.status == "OK" for r in rows)

    # lineage attributes the run to the target snapshot
    runs = {r.run_id for r in lin.collect()}
    assert runs == {f"snap-{S.current_snapshot_id(t)}"}
    assert lin.agg(F.sum("n_rows")).collect()[0][0] == len(rows)


def test_verify_from_snapshot_flags_tamper_in_delta_only(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b = _pages(spark, 0, 50), _pages(spark, 50, 80)
    s1 = S.commit(a, t)
    S.commit(b, t)
    res = 4
    full_live = P.with_derived(S.read(spark, t), res=res)
    # manifest stores a tampered hash for some delta rows + some base rows
    stored = _manifest_of(full_live).withColumn(
        "hash",
        F.when(F.crc32(F.col("child_key")) % 7 == 0, F.lit("0" * 64))
        .otherwise(F.col("hash")),
    ).cache()
    report, _ = I.verify_from_snapshot(
        spark, t, stored, s1.snapshot_id, leaf_res=res)
    got = {(r.child_key, r.status) for r in report.collect()}
    delta_urls = {r.url for r in b.select("url").collect()}
    # every reported row is a delta row; FAIL exactly where tampered
    assert {u for u, _ in got} == delta_urls
    for u, st in got:
        expect = "FAIL" if (__import__("zlib").crc32(u.encode())
                            & 0xFFFFFFFF) % 7 == 0 else "OK"
        assert st == expect, (u, st, expect)


def test_compact_preserves_rows_and_reduces_files(spark, tmp_path):
    t = str(tmp_path / "t")
    for lo, hi in [(0, 20), (20, 40), (40, 60), (60, 80)]:
        S.commit(_pages(spark, lo, hi), t)
    before = S.load_snapshot(t, S.current_snapshot_id(t))
    n_rows = S.read(spark, t).count()
    snap = S.compact(spark, t, target_files=2)
    assert snap.operation == "replace" and snap.summary["compaction"]
    assert len(snap.files) < len(before.files)
    assert S.read(spark, t).count() == n_rows
    # time travel to the pre-compaction snapshot still works
    assert S.read(spark, t, before.snapshot_id).count() == n_rows


def test_incremental_scan_skips_compaction(spark, tmp_path):
    """A consumer checkpointed before a compaction must NOT re-receive
    the whole table — replace commits contribute no rows."""
    t = str(tmp_path / "t")
    a, b = _pages(spark, 0, 40), _pages(spark, 40, 60)
    s1 = S.commit(a, t)
    S.compact(spark, t, target_files=1)
    s3 = S.commit(b, t)
    # checkpoint at s1, read to current: only b's rows, not a compacted a
    got = S.incremental_scan(spark, t, s1.snapshot_id)
    assert got.count() == b.count()
    assert {r.url for r in got.select("url").collect()} == \
        {r.url for r in b.select("url").collect()}
    # checkpoint at the compaction itself: still only b
    hist = S.history(t)
    comp_sid = [s.snapshot_id for s in hist if s.operation == "replace"][0]
    assert S.incremental_scan(spark, t, comp_sid).count() == b.count()
    # from-None crosses the replace: full current content exactly once
    assert S.incremental_scan(spark, t, None).count() == a.count() + b.count()
    del s3


def test_incremental_scan_overwrite_resets_delta(spark, tmp_path):
    t = str(tmp_path / "t")
    a, b, c = (_pages(spark, 0, 30), _pages(spark, 30, 50),
               _pages(spark, 50, 70))
    s1 = S.commit(a, t)
    S.commit(b, t, operation="overwrite")
    S.commit(c, t)
    # consumer at s1: content was replaced after its checkpoint — the
    # delta is everything now visible (b + c), not c alone
    got = S.incremental_scan(spark, t, s1.snapshot_id)
    assert got.count() == b.count() + c.count()
    # non-ancestor still rejected even across the overwrite boundary
    t2 = str(tmp_path / "other")
    sx = S.commit(_pages(spark, 70, 90), t2)
    import pytest as _pt
    with _pt.raises(ValueError, match="ancestor"):
        S.incremental_scan(spark, t, sx.snapshot_id)
