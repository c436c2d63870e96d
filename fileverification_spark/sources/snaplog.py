"""Snapshot-committed table format (``snaplog``) — the Iceberg-semantics
stand-in, demonstrated instead of asserted.

SURVEY §1.3/§2.1 design the production engine on Iceberg tables: snapshot
checkpoints, time travel, incremental scans between snapshots. The
sandbox ships no Iceberg runtime jar, so this module implements the
*table-format contract itself* over parquet + JSON, with the same
structural guarantees Iceberg provides (all public spec behaviour —
nothing here reads Iceberg code):

- **Immutable data files.** Every commit writes parquet into a fresh
  ``data/<snapshot-id>/`` directory; no file is ever rewritten.
- **Snapshot manifests.** A snapshot is a JSON document listing the
  EXACT data files visible at that version. Readers plan from the
  manifest, never from directory listing — at 10^12 rows, listing a
  bucket is O(files) metadata RPCs; reading one manifest is O(1).
- **Atomic pointer swap.** ``metadata/version-hint.text`` names the
  current snapshot; commits write a temp file and ``os.replace`` it —
  the POSIX atomic-rename primitive, so a reader sees the old version
  or the new one, never a torn state. A crash mid-commit leaves
  orphaned data files (harmless, collectable) and an unchanged pointer.
- **Lineage.** Each snapshot records ``parent_id``; ``history`` walks
  the chain. ``read(..., snapshot_id=...)`` time-travels; ``rollback``
  is one pointer swap (data is never deleted).
- **Incremental scan.** ``incremental_scan(from, to)`` returns only the
  files APPENDED between two snapshots — the changed-data feed that
  makes verification resumable: a re-run verifies the delta, not the
  table (streaming/incremental.verify_from_snapshot).

Reference parity: the reference's unit of prior state is the on-disk
manifest file it re-reads at startup (CheckSumFile.cs:95-98); the
snapshot log is that same idea lifted to table granularity, where "the
previous run's manifest" becomes "the previous snapshot" and diffing is
file-set subtraction instead of a full re-scan.

Concurrency at scale: single-writer per table (the pointer swap is
last-writer-wins). Production Iceberg adds optimistic-retry CAS on the
catalog; the seam is ``_swap_pointer`` — documented, not hidden.

Determinism: snapshot ids derive from (sequence, file list) content
hashing — no wall clocks, no randomness — so tests and resumed runs see
stable ids.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

_HINT = "version-hint.text"


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    sequence: int
    operation: str                       # "append" | "overwrite"
    files: list[str]                     # ALL files visible at this version
    added_files: list[str]               # files this commit added
    summary: dict = field(default_factory=dict)


def _meta_dir(table: str) -> str:
    return os.path.join(table, "metadata")


def _snap_path(table: str, snapshot_id: str) -> str:
    return os.path.join(_meta_dir(table), f"snap-{snapshot_id}.json")


def _swap_pointer(table: str, snapshot_id: str) -> None:
    """Atomic current-version swap: temp write + os.replace (rename(2)
    atomicity). The catalog-CAS seam for multi-writer deployments."""
    hint = os.path.join(_meta_dir(table), _HINT)
    tmp = hint + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(snapshot_id)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, hint)


def current_snapshot_id(table: str) -> str | None:
    hint = os.path.join(_meta_dir(table), _HINT)
    if not os.path.exists(hint):
        return None
    sid = open(hint).read().strip()
    return sid or None


def load_snapshot(table: str, snapshot_id: str) -> Snapshot:
    raw = json.loads(open(_snap_path(table, snapshot_id)).read())
    return Snapshot(**raw)


def _list_parquet(data_dir: str) -> list[str]:
    return sorted(
        os.path.join(data_dir, f)
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )


def commit(
    df: DataFrame,
    table: str,
    operation: str = "append",
    summary: dict | None = None,
) -> Snapshot:
    """Write ``df`` as a new snapshot. ``append`` unions the new files
    with the parent's; ``overwrite`` replaces the visible file set with
    NEW content; ``replace`` also replaces the file set but asserts the
    ROWS are unchanged (compaction/clustering rewrites — incremental
    consumers skip it). Data lands first, metadata second, pointer swap
    last — the crash-safe ordering (a failure at any step leaves the
    table readable at its previous version)."""
    if operation not in ("append", "overwrite", "replace"):
        raise ValueError(f"unknown operation {operation!r}")
    os.makedirs(_meta_dir(table), exist_ok=True)
    parent = current_snapshot_id(table)
    seq = 0 if parent is None else load_snapshot(table, parent).sequence + 1

    # Staging dir must be unique PER ATTEMPT, not per sequence: a crash
    # between the parquet write and the pointer swap — or a fresh commit
    # after rollback() to an ancestor — re-derives the same seq, and a
    # fixed name would fail on the leftover dir, contradicting the
    # "orphaned data files are harmless" contract above. Probe for the
    # first unused suffix (deterministic: a function of on-disk state
    # only); abandoned dirs stay orphaned and invisible to readers.
    staging = os.path.join(table, "data", f"seq-{seq}")
    attempt = 0
    while os.path.exists(staging):
        attempt += 1
        staging = os.path.join(table, "data", f"seq-{seq}-r{attempt}")
    df.write.mode("errorifexists").parquet(staging)
    added = _list_parquet(staging)

    files = list(added)
    if operation == "append" and parent is not None:
        files = load_snapshot(table, parent).files + added

    sid = hashlib.sha256(
        json.dumps([seq, operation, files]).encode()
    ).hexdigest()[:16]
    snap = Snapshot(
        snapshot_id=sid,
        parent_id=parent,
        sequence=seq,
        operation=operation,
        files=files,
        added_files=added,
        summary={"added_files": len(added), "total_files": len(files),
                 **(summary or {})},
    )
    with open(_snap_path(table, sid), "w") as fh:
        json.dump(snap.__dict__, fh, indent=1)
    _swap_pointer(table, sid)
    return snap


def read(
    spark: SparkSession, table: str, snapshot_id: str | None = None
) -> DataFrame:
    """Manifest-planned scan of the table at a version (time travel when
    ``snapshot_id`` is given). The reader is handed the explicit file
    list — no directory listing, and orphaned files from failed commits
    are invisible by construction."""
    sid = snapshot_id or current_snapshot_id(table)
    if sid is None:
        raise FileNotFoundError(f"no current snapshot in {table}")
    snap = load_snapshot(table, sid)
    if not snap.files:
        raise ValueError(f"snapshot {sid} is empty")
    return spark.read.parquet(*snap.files)


def history(table: str) -> list[Snapshot]:
    """Lineage chain, newest first, by walking parent_id."""
    out: list[Snapshot] = []
    sid = current_snapshot_id(table)
    while sid is not None:
        snap = load_snapshot(table, sid)
        out.append(snap)
        sid = snap.parent_id
    return out


def rollback(table: str, snapshot_id: str) -> None:
    """Point the table back at an ancestor — one pointer swap, no data
    movement; later snapshots stay on disk for audit/re-rollforward."""
    load_snapshot(table, snapshot_id)  # must exist — fail loud otherwise
    _swap_pointer(table, snapshot_id)


def compact(
    spark: SparkSession, table: str, target_files: int
) -> Snapshot:
    """Small-file maintenance: rewrite the current content into
    ``target_files`` files as a ``replace`` commit. At 10^12 rows a
    streaming ingest leaves millions of micro-batch files; compaction
    restores scan efficiency (fewer tasks, larger sequential reads,
    tighter min/max stats) WITHOUT changing a single row — which is why
    the commit is marked ``replace`` and incremental consumers skip it
    entirely (real Iceberg: RewriteDataFiles + the rewrite snapshot
    filter on incremental reads). Readers see identical rows before and
    after; the pre-compaction files stay on disk for time travel."""
    df = read(spark, table).repartition(target_files)
    return commit(df, table, operation="replace",
                  summary={"compaction": True,
                           "target_files": target_files})


def incremental_scan(
    spark: SparkSession,
    table: str,
    from_snapshot: str | None,
    to_snapshot: str | None = None,
) -> DataFrame:
    """Changed-data feed: rows introduced strictly AFTER
    ``from_snapshot`` up to ``to_snapshot`` (default: current),
    computed by walking the commit chain:

    - ``append``    → contributes its added files;
    - ``overwrite`` → contributes its added files and STOPS the walk
      (content was replaced — everything earlier is pre-replacement);
    - ``replace``   → contributes NOTHING (compaction adds no rows; a
      file-set diff here would wrongly re-feed the whole table to every
      incremental consumer after each maintenance pass).

    Append files rewritten by a LATER compaction are read in their
    original (immutable, still on disk) form — same rows either way.
    ``from_snapshot=None`` means "from the beginning". Raises if
    ``from_snapshot`` is not an ancestor of the target — a diff across
    a rollback fork is undefined."""
    to_sid = to_snapshot or current_snapshot_id(table)
    if to_sid is None:
        raise FileNotFoundError(f"no current snapshot in {table}")
    delta: list[str] = []
    sid, collecting = to_sid, True
    while sid != from_snapshot:
        if sid is None:
            if from_snapshot is None:
                break
            raise ValueError(
                f"{from_snapshot} is not an ancestor of {to_sid}")
        snap = load_snapshot(table, sid)
        if collecting and snap.operation in ("append", "overwrite"):
            delta.extend(snap.added_files)
        if snap.operation == "overwrite":
            # content replaced — nothing older contributes, but keep
            # walking (collecting nothing) to validate ancestry
            collecting = False
        sid = snap.parent_id
    if not delta:
        return read(spark, table, to_sid).limit(0)
    return spark.read.parquet(*delta)
