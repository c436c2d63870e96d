"""Multimodal plumbing: mapInPandas feature extraction over binary html."""

from __future__ import annotations

import hashlib

import pytest

from fileverification_spark.operators import multimodal as MM
from fileverification_spark.sources import pages as P

SF = "/root/testdata/sf0.001"


def test_extract_features_matches_hashlib(spark):
    pg = P.pages(spark, SF, with_html=True).limit(20)
    feats = {r["url"]: r for r in MM.extract_features(pg).collect()}
    src = {r["url"]: bytes(r["html"]) for r in pg.select("url", "html").collect()}
    assert set(feats) == set(src)
    for url, blob in src.items():
        d = hashlib.sha256(blob).digest()
        row = feats[url]
        assert row["n_bytes"] == len(blob)
        assert row["content_sha256"] == d.hex().upper()
        assert len(row["feat"]) == MM.N_FEAT
        for i, f in enumerate(row["feat"]):
            assert abs(f - d[i] / 255.0) < 1e-6


def test_decode_image_stub_raises():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG fake")


def test_sample_frames_matches_python(spark):
    import hashlib

    from fileverification_spark.operators import multimodal as MM
    from fileverification_spark.sources import pages as P

    pg = P.pages(spark, "/root/testdata/sf0.001", with_html=True).limit(20)
    rows = pg.select("url", "html").collect()
    got = {
        (r["url"], r["frame_idx"]): r["frame_sha256"]
        for r in MM.sample_frames(pg, every_n=4).collect()
    }
    want = {}
    for r in rows:
        b = bytes(r["html"])
        n = (len(b) + MM.FRAME_BYTES - 1) // MM.FRAME_BYTES
        for i in range(0, n, 4):
            want[(r["url"], i)] = hashlib.sha256(
                b[i * MM.FRAME_BYTES : (i + 1) * MM.FRAME_BYTES]
            ).hexdigest().upper()
    assert got == want
    assert len(got) > len(rows)  # row-expanding


def test_corpus_is_ascii(spark):
    # the frames oracle slices VARCHARs — sound only while the corpus is
    # pure ASCII; this canary fails if the generator ever changes
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    non_ascii = docs.where(
        F.length(F.col("text")) != F.octet_length(F.col("text"))
    )
    assert non_ascii.count() == 0
