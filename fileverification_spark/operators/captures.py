"""Capture-history analysis over a CDX-style index.

A web archive's CDX index stores one ``(url key, timestamp, content
digest)`` triple per capture (ISO 28500 / CDXJ practice; same shape as
``_q_cdx_records`` in the contract). Re-crawl scheduling reads that
history: pages whose digest churns between captures should be fetched
often, frozen pages rarely (the classic adaptive-recrawl rule from
Cho & Garcia-Molina, "Effective page refresh policies for Web
crawlers", TODS 2003 — frequency proportional to observed change
rate).

The reference (FileVerification) re-verifies a fixed tree per run;
these operators are the webtext analogue over capture history: detect
WHICH objects changed between runs (``FV/IO/FileSystemCrawlerSO.cs``'s
changed-hash report row, re-expressed over (url, ts, digest) instead
of (path, hash)).

Scale: everything is grouped/windowed by the url key — per-url capture
lists are bounded by crawl frequency (dozens, not millions), so the
only shuffle is the url-keyed exchange and no window ever spans the
corpus. Exact integer arithmetic throughout (epoch seconds, truncating
milli-ratios) so the DuckDB oracle matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def capture_churn(captures: DataFrame) -> DataFrame:
    """Per-url change history over ``(url, ts, digest)`` captures:

    - ``n_captures``: captures of the url
    - ``n_versions``: distinct digests ever observed
    - ``n_changes``:  captures whose digest differs from the previous
      capture in ts order (first capture is not a change)
    - ``first_ts_epoch`` / ``last_ts_epoch``: capture span, epoch s

    ``ts`` must be unique per url (CDX keys are; ties would make "the
    previous capture" ambiguous). The lag window partitions on url —
    bounded rows per partition, see module docstring.
    """
    w = Window.partitionBy("url").orderBy("ts")
    per = captures.select(
        "url",
        "ts",
        "digest",
        F.lag("digest").over(w).alias("prev_digest"),
    )
    return per.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_captures"),
        F.countDistinct("digest").cast("long").alias("n_versions"),
        F.sum(
            F.when(
                F.col("prev_digest").isNotNull()
                & (F.col("digest") != F.col("prev_digest")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
        F.min(F.unix_timestamp("ts")).cast("long").alias("first_ts_epoch"),
        F.max(F.unix_timestamp("ts")).cast("long").alias("last_ts_epoch"),
    )


def sql_capture_churn(captures_rel: str) -> str:
    """Oracle for :func:`capture_churn` (bare SELECT over a
    ``(url, ts, digest)`` relation)."""
    return f"""SELECT url,
  CAST(count(*) AS BIGINT) AS n_captures,
  CAST(count(DISTINCT digest) AS BIGINT) AS n_versions,
  CAST(SUM(CASE WHEN prev_digest IS NOT NULL AND digest <> prev_digest
                THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
  CAST(min(epoch(ts)) AS BIGINT) AS first_ts_epoch,
  CAST(max(epoch(ts)) AS BIGINT) AS last_ts_epoch
FROM (SELECT url, ts, digest,
             lag(digest) OVER (PARTITION BY url ORDER BY ts) AS prev_digest
      FROM {captures_rel}) c
GROUP BY url"""


def recrawl_priority(captures: DataFrame) -> DataFrame:
    """Adaptive re-crawl ranking from capture history: per url,

    - ``churn_milli``: 1000 * n_changes div (n_captures - 1) — the
      observed change rate in exact milli units (0 for single-capture
      urls: no evidence yet)
    - ``band``: 'hot' (churn >= 500), 'warm' (>= 1), 'cold' (0) — the
      fetch-frequency tier a scheduler keys on

    Single-capture urls land in 'cold' alongside provably-frozen ones;
    a production scheduler would age them by last_ts_epoch, which is
    why the span columns ride along.
    """
    c = capture_churn(captures).withColumn(
        "churn_milli",
        F.when(
            F.col("n_captures") > 1,
            F.expr("(1000 * n_changes) div (n_captures - 1)"),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )
    return c.select(
        "url",
        "n_captures",
        "n_changes",
        "churn_milli",
        F.when(F.col("churn_milli") >= 500, F.lit("hot"))
        .when(F.col("churn_milli") >= 1, F.lit("warm"))
        .otherwise(F.lit("cold"))
        .alias("band"),
        "last_ts_epoch",
    )


def sql_recrawl_priority(captures_rel: str) -> str:
    """Oracle for :func:`recrawl_priority`."""
    churn = sql_capture_churn(captures_rel)
    return f"""SELECT url, n_captures, n_changes, churn_milli,
  CASE WHEN churn_milli >= 500 THEN 'hot'
       WHEN churn_milli >= 1 THEN 'warm'
       ELSE 'cold' END AS band,
  last_ts_epoch
FROM (SELECT url, n_captures, n_changes,
             CAST(CASE WHEN n_captures > 1
                  THEN (1000 * n_changes) // (n_captures - 1)
                  ELSE 0 END AS BIGINT) AS churn_milli,
             last_ts_epoch
      FROM ({churn}) ch) r"""
