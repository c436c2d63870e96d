"""Magic-number MIME sniffing for opaque ``binary`` content columns.

A crawl's fetched bodies and a training pipeline's multimodal payloads
arrive as bytes with an unreliable (or absent) declared content type;
the first step of any decode path is sniffing the real container from
the leading magic bytes — exactly what ``file(1)`` and browsers'
MIME-sniffing do. The reference dispatches on file content via its
hash-algorithm prefix parse (FV/HashInfo.cs:54-77 NameHash split);
this is the analogous content-dispatch for binary web payloads,
feeding operators/multimodal.py's decode seam.

Engine shape: the sniff is one ``hex(substring(content, 1, 16))``
followed by a codegen'd CASE over literal prefixes — zero shuffle, no
UDF, runs at scan speed; ``hex`` is uppercase in BOTH Spark and DuckDB
so the oracle mirror is byte-exact. At 100 TB this is a narrow
projection the scanner prunes to 16 bytes per row via parquet column
statistics-friendly access (the binary column is read, but only the
sniffed prefix survives the projection).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (uppercase hex prefix, mime) in match order — first hit wins, so
#: longer/more-specific prefixes come before shorter ones that share a
#: head (none do today, but the ordering contract is load-bearing).
#: Public magic numbers: PNG (RFC 2083 §12.11), JPEG/JFIF, GIF87a/89a,
#: PDF (%PDF), gzip (RFC 1952), ZIP/OOXML (PK\x03\x04), RIFF (WAV/AVI
#: container), OggS, UTF-8 BOM, and the html-ish text prefixes.
MAGIC: list[tuple[str, str]] = [
    ("89504E470D0A1A0A", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("25504446", "application/pdf"),
    ("1F8B", "application/gzip"),
    ("504B0304", "application/zip"),
    ("52494646", "application/riff"),
    ("4F676753", "application/ogg"),
    ("EFBBBF", "text/plain;charset=utf-8-bom"),
    ("3C21444F", "text/html"),  # <!DO (doctype)
    ("3C21646F", "text/html"),  # <!do
    ("3C68746D", "text/html"),  # <htm
    ("3C48544D", "text/html"),  # <HTM
]

FALLBACK = "application/octet-stream"


def mime_sniff(content: Column) -> Column:
    """Sniffed MIME string for a ``binary`` column (:data:`FALLBACK`
    when no magic matches, including NULL/empty content)."""
    h = F.hex(F.substring(content, 1, 16))
    out = F.lit(FALLBACK)
    # build the CASE bottom-up so the FIRST table entry is the
    # outermost (highest-priority) WHEN
    for prefix, mime in reversed(MAGIC):
        out = F.when(h.startswith(prefix), F.lit(mime)).otherwise(out)
    return out


def sql_mime_sniff(content_expr: str) -> str:
    """DuckDB mirror over a BLOB expression. DuckDB has no BLOB
    substring, so the oracle hexes the whole value and slices the
    first 32 hex chars — identical to Spark's substring-then-hex (hex
    is uppercase in both engines); fine for oracle-scale data, while
    the Spark form stays a 16-byte slice per row."""
    h = f"substring(hex({content_expr}), 1, 32)"
    whens = "".join(
        f" WHEN starts_with({h}, '{p}') THEN '{m}'" for p, m in MAGIC
    )
    return f"(CASE{whens} ELSE '{FALLBACK}' END)"
