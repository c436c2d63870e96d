"""Structured Streaming surface over the ``events`` stream table.

The reference has no streaming (SURVEY §2.7); its closest behaviors are
timer-batched notifications (Notifications.cs:96-110) and reconcile-on-
rerun. The engine adds the standard streaming trio a training-data
pipeline needs, each defined so the *batch* form is the oracle and the
*streaming* form (readStream + availableNow) must converge to it —
pinned by tests:

- ``windowed_counts``     — tumbling-window counts/sums per event_type,
  watermark for late data;
- ``stream_dedup``        — dropDuplicates(event_id) within watermark —
  the streaming twin of first-writer-wins (CheckSumFile.cs:146);
- ``sessionize``          — gap-based sessions per user via the batch
  window-function formulation (lag + cumulative session ids).

File-source streaming over the driver parquet is the sandbox stand-in
for Kafka/Iceberg CDC; the query shapes carry over unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

WINDOW = "1 hour"
WATERMARK = "2 hours"
SESSION_GAP_MIN = 30


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parquet stores TIMESTAMP_NTZ; watermarks require TIMESTAMP_LTZ —
    # cast on read (session TZ is UTC, values unchanged)
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream with the batch schema (sandbox Kafka stand-in)."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source needs a DIRECTORY; select just the events file via
    # a glob filter over the sf dir
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_counts(events: DataFrame, streaming: bool = False) -> DataFrame:
    """(window_start, event_type, n_events, sum_value) per tumbling hour.
    Same code path for batch and stream; the stream adds a watermark."""
    src = events.withWatermark("ts", WATERMARK) if streaming else events
    return (
        src.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL sum: exact and order-independent, unlike double sums
            # whose low bits depend on partial-aggregation order
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def read_pages_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source page stream (sandbox stand-in for crawl arrivals):
    documents.parquet as a stream, run through the same pages derivation
    the batch source uses."""
    from fileverification_spark.sources import pages as P

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    docs = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    return P.pages_from_docs(docs)


def trending_terms(
    pages: DataFrame, k: int = 5, streaming: bool = False,
    window: str = "1 hour",
) -> DataFrame:
    """Trending vocabulary per tumbling window (default hour) of crawl
    time: token counts over the page stream, batch form ranked to the
    top-``k`` (window_start, term, n, rank).

    The streaming form returns the per-(window, term) count relation —
    rank is not stream-expressible (no window functions over streaming
    aggregates), so the top-k is the batch consumer's one-line window
    over the emitted counts; the count relation itself is the stateful
    part and converges to the batch counts (pytest-pinned, same
    contract as windowed_counts). Explode cost is the corpus token
    count — the same irreducible explode every term statistic pays —
    then one partial-aggregatable hash-agg keyed (day, term)."""
    from fileverification_spark.functions import text as TX

    src = pages.withWatermark("warc_ts", WATERMARK) if streaming else pages
    counts = (
        src.select(
            F.window("warc_ts", window).alias("w"),
            F.explode(TX.tokens(F.col("text"))).alias("term"),
        )
        .groupBy("w", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(F.col("w.start").alias("window_start"), "term", "n")
    )
    if streaming:
        return counts
    w = W.partitionBy("window_start").orderBy(F.desc("n"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def sql_trending_terms(pages_rel: str = "pages", k: int = 5,
                       trunc: str = "hour") -> str:
    """Oracle: tumbling windows align to epoch boundaries in both engines
    (Spark window() and date_trunc()); epoch-seconds canon."""
    from fileverification_spark.functions import text as TX

    toks = TX.sql_tokens("text")
    return f"""
SELECT window_start, term, n, rank FROM (
  SELECT window_start, term, n,
         CAST(row_number() OVER
           (PARTITION BY window_start ORDER BY n DESC, term ASC)
          AS BIGINT) AS rank
  FROM (
    SELECT CAST(epoch(date_trunc('{trunc}', warc_ts)) AS BIGINT)
             AS window_start,
           term, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT warc_ts, unnest({toks}) AS term FROM {pages_rel})
    GROUP BY 1, 2
  )
) WHERE rank <= {k}"""


def stream_dedup(events: DataFrame, streaming: bool = False) -> DataFrame:
    src = events.withWatermark("ts", WATERMARK) if streaming else events
    return src.dropDuplicates(["event_id"])


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_min``. Output: one row per session
    (user_id, session_start, session_end, n_events). Batch formulation
    (window functions); the streaming twin would be
    ``applyInPandasWithState`` keyed by user with a timeout — same
    semantics, which is exactly what this batch form oracles."""
    w = W.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    with_new = events.withColumn(
        "is_new", (gap.isNull() | (gap > gap_min * 60)).cast("int")
    )
    with_sid = with_new.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return with_sid.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain a streaming DF with Trigger.AvailableNow into a memory sink
    and return the materialised result (test/demo harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors
# ---------------------------------------------------------------------------

def sql_windowed_counts(events_rel: str = "events") -> str:
    # epoch-seconds BIGINT + stringified decimal sum: mirrors the contract
    # canon in __spark_entry__._q_windowed_counts (driver pandas canon
    # can't survive tz-aware/naive or Decimal/float64 drift)
    return f"""
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS sum_value
FROM {events_rel}
GROUP BY 1, 2"""


def sql_sessionize(events_rel: str = "events", gap_min: int = SESSION_GAP_MIN) -> str:
    return f"""
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))
                   > {gap_min * 60} OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM {events_rel}
),
s AS (
  SELECT user_id, ts,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM g
)
SELECT user_id, session_id,
       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start,
       CAST(epoch_us(max(ts)) AS BIGINT) AS session_end,
       count(*) AS n_events
FROM s GROUP BY user_id, session_id"""


def stream_frontier(pages: DataFrame, fetched: DataFrame) -> DataFrame:
    """Streaming crawl frontier: absolute outlinks of ARRIVING pages
    anti-joined against the static fetched-url set — the incremental
    form of ``graph.crawl_frontier`` (its batch twin is the oracled
    contract query; stream==batch convergence is pytest-pinned).

    Shape: the stream side extracts/explodes links per micro-batch
    (stateless), the stream-static LEFT ANTI join re-plans the static
    side per batch (supported streaming join class), and the final
    ``dropDuplicates`` is the stateful exact-dedup operator so a URL
    discovered in two batches is emitted once. Production note: bound
    the dedup state with a watermark on a discovery-time column (or the
    stateful twin in streaming/stateful.py); unbounded here because the
    availableNow drain is finite."""
    from fileverification_spark.functions import html as HT

    links = pages.select(
        F.explode(HT.extract_links(F.col("html"))).alias("url")
    )
    return (
        links.where(F.col("url").rlike(HT.ABS_RE))
        .join(fetched.select("url"), "url", "left_anti")
        .dropDuplicates(["url"])
    )
