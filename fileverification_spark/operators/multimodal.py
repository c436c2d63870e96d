"""Multimodal column handling (task brief): image/audio/video as opaque
``binary`` columns with typed metadata; decode / feature-extract as
Arrow-batched pandas iterators over ``mapInPandas``.

The container ships no image/audio libraries, so the *decode* step is a
deterministic stand-in (sha256-derived features) behind the same
mapInPandas plumbing a real decoder would use — schema, batch shape, and
partitioning are real and tested; swapping in PIL/librosa is a one-function
change (see ``decode_image``). The fake features are hash-derived so the
DuckDB oracle can recompute them exactly.

At 100 TB the binary column dominates I/O: the mapInPandas projection
prunes to (url, html) only, and Arrow batch size
(spark.sql.execution.arrow.maxRecordsPerBatch) bounds executor memory
per batch regardless of blob sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

N_FEAT = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_sha256", T.StringType(), False),
        T.StructField("feat", T.ArrayType(T.FloatType()), False),
    ]
)


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        blobs = pdf["html"]
        urls = pdf["url"]
        n_bytes = blobs.map(len)
        digests = blobs.map(lambda b: hashlib.sha256(bytes(b)).digest())
        yield pd.DataFrame(
            {
                "url": urls,
                "n_bytes": n_bytes,
                "content_sha256": digests.map(lambda d: d.hex().upper()),
                "feat": digests.map(
                    lambda d: [b / 255.0 for b in d[:N_FEAT]]
                ),
            }
        )


def extract_features(pages_with_html: DataFrame) -> DataFrame:
    """(url, n_bytes, content_sha256, feat[8]) per page — the decode/
    feature-extract stage. Narrow projection first so the Arrow transfer
    carries only (url, html)."""
    narrow = pages_with_html.select("url", "html")
    return narrow.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("frame_sha256", T.StringType(), False),
    ]
)

FRAME_BYTES = 64  # fake-codec frame granularity (deterministic)


def sample_frames(pages_with_html: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling: one output row per sampled frame — the
    row-*expanding* multimodal shape (video -> frames), mapInPandas
    yielding more rows than it consumes. The fake codec derives
    n_frames = ceil(n_bytes / FRAME_BYTES) and hashes each sampled
    frame's byte slice; a real decoder swaps in exactly here (same
    seam as decode_image)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, hashes = [], [], []
            for url, blob in zip(pdf["url"], pdf["html"]):
                b = bytes(blob)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, every_n):
                    urls.append(url)
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(
                            b[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                        ).hexdigest().upper()
                    )
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "frame_sha256": hashes}
            )

    return pages_with_html.select("url", "html").mapInPandas(
        frames, schema=FRAME_SCHEMA
    )


def decode_image(blob: bytes) -> object:
    """Real image decode — requires an imaging library not present in
    this container. The mapInPandas plumbing above is the production
    path; only this function changes when PIL is available."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415

        return Image.open(io.BytesIO(blob))
    except ImportError as e:  # pragma: no cover - no PIL in container
        raise NotImplementedError(
            "image decode requires PIL; container ships none (stubbed per task brief)"
        ) from e


def sql_frames_query(pages_cte: str, every_n: int = 4) -> str:
    """Oracle for sample_frames. Slices the VARCHAR form — exact because
    the synthetic corpus is pure ASCII (byte slice == char slice; checked
    in tests); a non-ASCII corpus would need a blob-slicing oracle."""
    return f"""WITH {pages_cte},
h AS (SELECT url, '<html><body>' || text || '</body></html>' AS html FROM pages),
f AS (SELECT url, html,
             unnest(range(0, CAST(ceil(length(html) / {FRAME_BYTES}.0) AS BIGINT),
                          {every_n})) AS frame_idx
      FROM h)
SELECT url, frame_idx,
       upper(sha256(substring(html, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES}))) AS frame_sha256
FROM f"""


def sql_features_query(pages_cte: str) -> str:
    """Oracle: rebuild html text-side and recompute the hash features.
    sha256(utf8 string) == sha256(bytes) because html is the UTF-8
    encoding of that exact string. The feature vector is emitted as a
    fixed %.6f CSV string (driver pandas canon cannot hash list cells);
    float32 -> %.6f agrees between engines because both widen the same
    float32 bits to double before formatting."""
    h = "sha256('<html><body>' || text || '</body></html>')"
    feat_csv = (
        f"list_aggr(list_transform(range(1, {N_FEAT + 1}), i -> "
        f"printf('%.6f', CAST(CAST(('0x' || substr({h}, 2*i - 1, 2)) AS INT)"
        f" / 255.0 AS FLOAT))), 'string_agg', ',')"
    )
    return f"""WITH {pages_cte}
SELECT url,
       CAST(octet_length(encode('<html><body>' || text || '</body></html>')) AS BIGINT) AS n_bytes,
       upper({h}) AS content_sha256,
       {feat_csv} AS feat_csv
FROM pages"""
