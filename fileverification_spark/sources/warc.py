"""WARC record framing — the crawl-archive export surface.

WARC (ISO 28500) is the format web crawls ship in (Common Crawl WARC
files hold one 'response' record per fetched page). This module frames
the pages table as WARC response records: the named-field header block,
the exact ``Content-Length`` octet accounting, and a deterministic
``WARC-Record-ID`` derived from the payload hash — the same
content-derived identity the manifest rows use (reference parity:
FV/HashInfo.cs:164-238 derives the record identity from content bytes).

This is FRAMING, not file I/O: the record column is what a WARC sink
writes verbatim. At scale the sink is one gzip member per record
(WARC's standard segmented-gzip layout, which is what makes the format
splittable for re-reading); locally `df.write.text` on the record
column produces valid uncompressed WARC. Everything here is codegen'd
string/byte arithmetic — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CRLF = "\r\n"

#: WARC-Date wants UTC ISO-8601; warc_ts is UTC by session pin
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def warc_header(url: Column, warc_ts: Column, payload: Column) -> Column:
    """The WARC/1.0 response-record header block for one page:
    ``payload`` is the raw html BINARY; Content-Length is its exact
    octet length (NOT the char count — multi-byte text differs)."""
    rid = F.lower(F.sha2(payload, 256))
    return F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: response" + CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(CRLF),
        F.lit("WARC-Date: "),
        F.date_format(warc_ts, _TS_FMT),
        F.lit(CRLF),
        F.lit("WARC-Record-ID: <urn:sha256:"), rid, F.lit(">" + CRLF),
        F.lit("Content-Type: text/html" + CRLF),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),
        F.lit(CRLF + CRLF),
    )


def warc_records(pages: DataFrame) -> DataFrame:
    """``(url, content_length, record)`` — the full response record
    (header + payload + the record-terminating blank line). One narrow
    projection over the scan; the WARC sink is `select(record)` +
    a text/gzip writer."""
    payload = F.col("html")
    return pages.select(
        "url",
        F.length(payload).cast("bigint").alias("content_length"),
        F.concat(
            warc_header(F.col("url"), F.col("warc_ts"), payload),
            F.decode(payload, "UTF-8"),
            F.lit(CRLF + CRLF),
        ).alias("record"),
    )


def sql_warc_records(pages_rel: str, html_expr: str = "html") -> str:
    """DuckDB mirror over a VARCHAR html expression (bare SELECT).
    octet_length(encode(...)) is the BYTE length — the Content-Length
    parity with Spark's length-of-binary."""
    length = f"octet_length(encode({html_expr}))"
    rid = f"lower(sha256({html_expr}))"
    ts = "strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')"
    crlf = "chr(13) || chr(10)"
    return f"""SELECT url,
       CAST({length} AS BIGINT) AS content_length,
       'WARC/1.0' || {crlf}
         || 'WARC-Type: response' || {crlf}
         || 'WARC-Target-URI: ' || url || {crlf}
         || 'WARC-Date: ' || {ts} || {crlf}
         || 'WARC-Record-ID: <urn:sha256:' || {rid} || '>' || {crlf}
         || 'Content-Type: text/html' || {crlf}
         || 'Content-Length: ' || CAST({length} AS VARCHAR)
         || {crlf} || {crlf}
         || {html_expr} || {crlf} || {crlf} AS record
FROM {pages_rel}"""


# ---------------------------------------------------------------------------
# WARC read side — parse records back into rows
# ---------------------------------------------------------------------------

#: header field patterns over the record string (Java ∩ RE2: multiline
#: anchors, no backreferences)
_URI_RE = r"(?m)^WARC-Target-URI: (.*)$"
_LEN_RE = r"(?m)^Content-Length: ([0-9]+)$"
_DATE_RE = r"(?m)^WARC-Date: (.*)Z$"
#: payload = everything between the header's blank line and the
#: record-terminating CRLFCRLF
_PAYLOAD_RE = r"(?s)\r\n\r\n(.*)\r\n\r\n$"


def parse_warc_records(records: DataFrame, col: str = "record") -> DataFrame:
    """Parse WARC response records (the :func:`warc_records` framing)
    back into ``(url, warc_ts, content_length, payload)`` — the read
    side of the archive format, so a corpus can round-trip through its
    WARC export (pytest pins parse(frame(pages)) == pages).

    Codegen'd regexp extraction over the record string; carriage-return
    header terminators make every field single-line extractable. At
    scale the sink/source pair is one text write + one text read with
    this projection on top — no UDF anywhere."""
    r = F.col(col)
    return records.select(
        F.regexp_extract(r, _URI_RE, 1).alias("url"),
        F.to_timestamp(
            F.regexp_extract(r, _DATE_RE, 1), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("warc_ts"),
        F.regexp_extract(r, _LEN_RE, 1).cast("bigint").alias(
            "content_length"
        ),
        F.regexp_extract(r, _PAYLOAD_RE, 1).alias("payload"),
    )


# ---------------------------------------------------------------------------
# WET conversion records — the extracted-text sibling of warc_records
# ---------------------------------------------------------------------------


def wet_records(pages: DataFrame) -> DataFrame:
    """``(url, content_length, record)`` WET conversion records: the
    WARC/1.0 ``conversion`` record Common Crawl ships extracted text
    in, with ``WARC-Refers-To`` naming the response record it was
    converted from (same urn:sha256 id scheme as :func:`warc_header`)
    and Content-Length the OCTET length of the UTF-8 text. One narrow
    codegen'd projection chaining functions/html.html_to_text — the
    full WARC->WET conversion is scan + this select + a text writer."""
    from fileverification_spark.functions import html as HT

    text = HT.html_to_text(F.col("html"))
    payload = F.encode(text, "UTF-8")
    rid = F.lower(F.sha2(F.col("html"), 256))
    header = F.concat(
        F.lit("WARC/1.0" + CRLF),
        F.lit("WARC-Type: conversion" + CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(CRLF),
        F.lit("WARC-Date: "),
        F.date_format(F.col("warc_ts"), _TS_FMT),
        F.lit(CRLF),
        F.lit("WARC-Refers-To: <urn:sha256:"), rid, F.lit(">" + CRLF),
        F.lit("Content-Type: text/plain" + CRLF),
        F.lit("Content-Length: "),
        F.length(payload).cast("string"),
        F.lit(CRLF + CRLF),
    )
    return pages.select(
        "url",
        F.length(payload).cast("bigint").alias("content_length"),
        F.concat(header, text, F.lit(CRLF + CRLF)).alias("record"),
    )


def sql_wet_records(pages_rel: str, html_expr: str = "html") -> str:
    """DuckDB mirror over a VARCHAR html expression (bare SELECT)."""
    from fileverification_spark.functions import html as HT

    text = HT.sql_html_to_text(html_expr)
    length = f"octet_length(encode({text}))"
    rid = f"lower(sha256({html_expr}))"
    ts = "strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')"
    crlf = "chr(13) || chr(10)"
    return f"""SELECT url,
       CAST({length} AS BIGINT) AS content_length,
       'WARC/1.0' || {crlf}
         || 'WARC-Type: conversion' || {crlf}
         || 'WARC-Target-URI: ' || url || {crlf}
         || 'WARC-Date: ' || {ts} || {crlf}
         || 'WARC-Refers-To: <urn:sha256:' || {rid} || '>' || {crlf}
         || 'Content-Type: text/plain' || {crlf}
         || 'Content-Length: ' || CAST({length} AS VARCHAR)
         || {crlf} || {crlf}
         || {text} || {crlf} || {crlf} AS record
FROM {pages_rel}"""
