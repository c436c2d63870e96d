"""Magic-number MIME sniffing (functions/mime.py): hand byte cases,
Spark == DuckDB mirror, ordering contract."""

from __future__ import annotations

import binascii

import duckdb
from pyspark.sql import functions as F

from fileverification_spark.functions import mime as MM

CASES = [
    # (hex bytes, want mime)
    ("89504E470D0A1A0A00FF", "image/png"),
    ("FFD8FFE000104A464946", "image/jpeg"),
    ("474946383961AA", "image/gif"),
    ("474946383761AA", "image/gif"),
    ("255044462D312E34", "application/pdf"),
    ("1F8B0800", "application/gzip"),
    ("504B030414", "application/zip"),
    ("52494646AAAA", "application/riff"),
    ("4F67675300", "application/ogg"),
    ("EFBBBF3C68746D6C", "text/plain;charset=utf-8-bom"),  # BOM wins over <html
    ("3C21444F43545950", "text/html"),
    ("3C68746D6C3E", "text/html"),
    ("DEADBEEF", "application/octet-stream"),
    ("89504E46", "application/octet-stream"),  # PNG magic truncated/wrong
    ("", "application/octet-stream"),
]


def test_mime_sniff_hand_bytes(spark):
    rows = [(i, binascii.unhexlify(h)) for i, (h, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, c binary").select(
        "i", MM.mime_sniff(F.col("c")).alias("m")
    )
    got = {r["i"]: r["m"] for r in df.collect()}
    assert got == {i: m for i, (_, m) in enumerate(CASES)}


def test_mime_sniff_sql_mirror_matches():
    con = duckdb.connect()
    got = [
        con.execute(
            f"SELECT {MM.sql_mime_sniff('c')} FROM (SELECT unhex(?) AS c)",
            [h],
        ).fetchone()[0]
        for h, _ in CASES
    ]
    assert got == [m for _, m in CASES]


def test_magic_table_prefix_ordering():
    """No later entry may be a prefix of an earlier one (first hit wins,
    so a shadowed longer prefix would be unreachable)."""
    for i, (p, _) in enumerate(MM.MAGIC):
        for q, _ in MM.MAGIC[:i]:
            assert not p.startswith(q), f"{p} shadowed by earlier {q}"
