"""WARC response-record framing (sources/warc.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fileverification_spark.sources import warc as W


def _page(spark, url, ts, body):
    return spark.createDataFrame(
        [(url, ts, body)], "url string, ts_s string, body string"
    ).select(
        "url",
        F.to_timestamp("ts_s").alias("warc_ts"),
        F.encode("body", "UTF-8").alias("html"),
    )


def test_warc_record_fields_and_framing(spark):
    rec = W.warc_records(
        _page(spark, "https://a.com/x", "2024-03-01 12:00:05", "<p>hi</p>")
    ).collect()[0]
    assert rec["content_length"] == 9  # "<p>hi</p>" is 9 octets
    lines = rec["record"].split("\r\n")
    assert lines[0] == "WARC/1.0"
    assert "WARC-Type: response" in lines
    assert "WARC-Target-URI: https://a.com/x" in lines
    assert "WARC-Date: 2024-03-01T12:00:05Z" in lines
    assert "Content-Length: 9" in lines
    # blank line separates header from payload; record ends with CRLFCRLF
    assert "\r\n\r\n<p>hi</p>\r\n\r\n" in rec["record"]
    # deterministic content-derived record id
    import hashlib

    rid = hashlib.sha256(b"<p>hi</p>").hexdigest()
    assert f"WARC-Record-ID: <urn:sha256:{rid}>" in lines


def test_warc_content_length_is_octets_not_chars(spark):
    # 'é' is 1 char but 2 UTF-8 octets — WARC counts octets
    rec = W.warc_records(
        _page(spark, "https://a.com/u", "2024-01-01 00:00:00", "é")
    ).collect()[0]
    assert rec["content_length"] == 2
    assert "Content-Length: 2" in rec["record"]


def test_warc_roundtrip_parse_equals_source(spark):
    from fileverification_spark.sources import pages as P

    src = P.pages(spark, "/root/testdata/sf0.001", with_html=True)
    framed = W.warc_records(src)
    back = W.parse_warc_records(framed)
    joined = src.alias("s").join(back.alias("b"), "url", "inner")
    n = src.count()
    assert back.count() == n
    same = joined.where(
        (F.col("s.warc_ts") == F.col("b.warc_ts"))
        & (F.decode(F.col("s.html"), "UTF-8") == F.col("b.payload"))
        & (F.length(F.col("s.html")) == F.col("b.content_length"))
    ).count()
    assert same == n


def test_wet_record_is_conversion_of_extracted_text(spark):
    rec = W.wet_records(
        _page(
            spark, "https://a.com/x", "2024-03-01 12:00:05",
            "<html><body><p>hi  there</p></body></html>",
        )
    ).collect()[0]
    # payload is the WET text, not the html; length counts text octets
    assert rec["content_length"] == len("hi there".encode())
    lines = rec["record"].split("\r\n")
    assert lines[0] == "WARC/1.0"
    assert "WARC-Type: conversion" in lines
    assert "Content-Type: text/plain" in lines
    # Refers-To carries the RESPONSE record's id: sha256 of the raw html
    import hashlib

    want = hashlib.sha256(
        "<html><body><p>hi  there</p></body></html>".encode()
    ).hexdigest()
    assert f"WARC-Refers-To: <urn:sha256:{want}>" in lines
    # text payload sits between the blank line and the terminator
    assert "hi there" in rec["record"].split("\r\n\r\n")[1]


def test_wet_record_parses_with_the_warc_reader(spark):
    """The read side is format-level, not type-level: a conversion
    record parses with the same parse_warc_records projection (url,
    date, octet length, text payload)."""
    pg = _page(
        spark, "https://a.com/x", "2024-03-01 12:00:05",
        "<html><body><p>hi  there</p></body></html>",
    )
    got = W.parse_warc_records(
        W.wet_records(pg).select("record")
    ).collect()[0]
    assert got["url"] == "https://a.com/x"
    assert str(got["warc_ts"]) == "2024-03-01 12:00:05"
    assert got["payload"] == "hi there"
    assert got["content_length"] == len("hi there".encode())
