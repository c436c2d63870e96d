"""JSONL (newline-delimited JSON) interchange for the pages table — the
Common-Crawl-WET-style source format: one JSON object per line with the
canonical page columns (url, warc_ts, text, lang [, doc_id]).

The reference reads exactly one transport (its XML settings +
``name|algo|hash`` text manifests, FV/Configuration/XmlFile.cs:74-104);
this engine's manifests keep that text format (sources/manifest_io.py)
and the *data* plane adds JSONL alongside parquet so a corpus can arrive
as crawler output and still flow through the identical derivation
(sources.pages.with_derived) — format parity is pinned by a round-trip
test, not trusted.

Scale notes: JSONL is splittable line-by-line, so the read
parallelises like parquet; the explicit schema skips Spark's
whole-file inference scan (at 100 TB, inference alone would be a full
extra pass). Timestamps travel as ISO-8601 strings with microseconds — JSON
has no timestamp type, and a seconds-only format would silently truncate
sub-second precision, changing the url|ts geo-hash derivation downstream
(review r02) — and are restored with to_timestamp on read. The format
carries an explicit zone offset suffix (`XXX`, rendering `Z` at UTC),
so files are self-describing and round-trip-safe even when writer and
reader sessions pin different spark.sql.session.timeZone values
(ADVICE r02 #4). The reader also tolerates offset-less strings from
legacy/foreign producers, parsing those in the session zone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
# Offset-less legacy/foreign-producer form: parsed in the session zone
# (the pre-ADVICE-r02 behavior) only when the self-describing form fails.
TS_FMT_NO_OFFSET = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

READ_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def write_pages_jsonl(pages: DataFrame, path: str) -> None:
    """Serialise the canonical page columns as JSONL (timestamp -> ISO
    string; derived columns are intentionally NOT exported — they are
    recomputed on read so a tampered file cannot smuggle stale hashes)."""
    pages.select(
        "doc_id",
        "url",
        F.date_format("warc_ts", TS_FMT).alias("warc_ts"),
        "text",
        "lang",
    ).write.mode("overwrite").json(path)


def read_pages_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read pages JSONL with the explicit schema (no inference pass) and
    restore the timestamp column. Output matches sources.pages.pages()."""
    raw = spark.read.schema(READ_SCHEMA).json(path)
    return raw.select(
        "doc_id",
        "url",
        F.coalesce(
            F.try_to_timestamp(F.col("warc_ts"), F.lit(TS_FMT)),
            F.try_to_timestamp(F.col("warc_ts"), F.lit(TS_FMT_NO_OFFSET)),
        ).alias("warc_ts"),
        "text",
        "lang",
    )
