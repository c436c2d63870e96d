"""Sequence packing (operators/packing.py): the distributed two-phase
prefix sum must equal the naive global cumsum, independent of partition
count, with exact chunk arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fileverification_spark.operators import packing as PK


def _toy(spark, n=97, seed_mod=13):
    # deterministic token counts incl. zeros (empty docs pack at width 0)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % seed_mod).alias("n_tok"),
    )


def _packed(spark, budget=10, parts=None, n=97):
    toy = _toy(spark, n)
    return PK.pack_offsets(
        toy, budget=budget, tokens=F.col("n_tok"), num_partitions=parts
    )


def test_matches_naive_cumsum(spark):
    rows = sorted(
        _packed(spark, budget=10, parts=5).collect(),
        key=lambda r: r["doc_id"],
    )
    acc = 0
    for r in rows:
        assert r["offset"] == acc, r
        assert r["chunk_id"] == acc // 10
        acc += r["n_tok"]


def test_partition_count_invariant(spark):
    a = sorted(map(tuple, _packed(spark, parts=2).collect()))
    b = sorted(map(tuple, _packed(spark, parts=7).collect()))
    c = sorted(map(tuple, _packed(spark, parts=32).collect()))
    assert a == b == c


def test_adjacent_offsets_chain(spark):
    """offset[i+1] - offset[i] == n_tok[i] in doc_id order — the stream
    has no gaps and no overlaps."""
    rows = sorted(
        _packed(spark, parts=4).collect(), key=lambda r: r["doc_id"]
    )
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt["offset"] - prev["offset"] == prev["n_tok"]


def test_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        PK.pack_offsets(_toy(spark), budget=0, tokens=F.col("n_tok"))


def test_default_tokens_from_text(spark):
    df = spark.createDataFrame(
        [(1, "one two three"), (2, "four"), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["n_tok"], r["offset"])
           for r in PK.pack_offsets(df, budget=2, num_partitions=2).collect()}
    assert got == {1: (3, 0), 2: (1, 3), 3: (0, 4)}
