"""JSONL source format parity: parquet -> JSONL -> read -> derive must be
indistinguishable from the parquet path (hashes, geocode, cells)."""

from __future__ import annotations

from fileverification_spark.sources import jsonl as J
from fileverification_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_derivations_identical(spark, tmp_path):
    path = str(tmp_path / "pages_jsonl")
    base = P.pages(spark, SF)
    J.write_pages_jsonl(base, path)
    back = P.with_derived(J.read_pages_jsonl(spark, path))
    want = {
        (r["url"], r["text_sha256"], r["cell"], r["warc_ts"])
        for r in P.pages_with_derived(spark, SF).collect()
    }
    got = {
        (r["url"], r["text_sha256"], r["cell"], r["warc_ts"])
        for r in back.collect()
    }
    assert got == want and len(got) > 0


def test_jsonl_read_is_schema_explicit(spark, tmp_path):
    # a malformed line must not corrupt the read (permissive null row),
    # mirroring the manifest parser's drop-bad-lines rule (S3)
    path = str(tmp_path / "bad")
    import os

    os.makedirs(path, exist_ok=True)
    with open(f"{path}/part-00000.json", "w") as f:
        f.write('{"doc_id": 1, "url": "u1", "warc_ts": "2024-01-01T00:00:00.250000", "text": "t", "lang": "en"}\n')
        f.write("NOT JSON AT ALL\n")
    rows = J.read_pages_jsonl(spark, path).collect()
    good = [r for r in rows if r["url"] == "u1"]
    assert len(good) == 1 and good[0]["warc_ts"] is not None
    # sub-second precision survives the transport (truncation would
    # silently change the url|ts geo-hash derivation)
    assert good[0]["warc_ts"].microsecond == 250000
