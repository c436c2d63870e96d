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
