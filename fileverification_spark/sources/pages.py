"""The ``pages`` table — Common-Crawl-style web pages per BASELINE input_hint:

    pages(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING)

Derived **deterministically** from the driver's ``documents.parquet`` so
tests/benchmarks need no external data, every sf has a pages table, and the
DuckDB oracle can rebuild the identical table from the same parquet (see
``PAGES_CTE``). Geocoding is synthetic by construction (north_star):
``(lat, lon)`` comes from the SHA-256 of ``url|warc_ts``, the exact analogue
of the reference hashing file content (FileVerification/HashInfo.cs:164-238)
— so coordinates are reproducible everywhere, bit-for-bit.

Derived columns (all built-in expressions, codegen'd, no Python):

- ``text_sha256`` = upper(sha2(text, 256)) — reference stores uppercase hex
  (FileVerification/HashInfo.cs:222) and compares case-sensitively
  (HashInfo.cs:262); we keep both conventions.
- ``lat`` / ``lon`` — two 32-bit slices of sha256(url|ts) scaled into
  [-90,90) x [-180,180). The /2^32 and *2^k arithmetic is exact in IEEE
  doubles, so Spark and DuckDB agree bit-for-bit.
- ``cell`` — quadtree cell at LEAF_RES (grid.py), the "directory" of the
  page; the resolution ladder above it replaces folder recursion.

At 100 TB the real table is Iceberg `PARTITIONED BY (bucket(1024, url),
days(warc_ts))`; here the parquet file stands in and the derivations are a
narrow projection on top of the scan (column pruning still reaches parquet
because html/text are only read when the query needs them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fileverification_spark import grid

#: Default leaf resolution of the cell ladder. 2^4 x 2^5 = 512 cells —
#: sf0.01 (~5k docs) ≈ 10 pages/cell, sf0.1 (~50k) ≈ 100/cell. Real-scale
#: deployments pick ~res 12 (33M cells) for 10^12 rows; everything is
#: parameterised on res so nothing changes but the constant.
LEAF_RES = 4

EPOCH = "2024-01-01 00:00:00"
YEAR_SECONDS = 31536000
TS_STEP = 137  # co-prime spread of doc_ids over the year


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages(spark: SparkSession, sf_dir: str, with_html: bool = False) -> DataFrame:
    """Build the pages table (+ derived hash/geo/cell columns).

    ``with_html=False`` skips materialising the html binary column so
    column pruning keeps the parquet scan narrow when the query doesn't
    need it.
    """
    return pages_from_docs(load_documents(spark, sf_dir), with_html=with_html)


def pages_from_docs(docs: DataFrame, with_html: bool = False) -> DataFrame:
    """The pages derivation as a pure DataFrame transform — works on a
    batch OR streaming documents relation (the streaming page source
    reuses it unchanged)."""
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    warc_ts = F.expr(
        f"timestampadd(SECOND, CAST((doc_id * {TS_STEP}) % {YEAR_SECONDS} AS INT), "
        f"timestamp'{EPOCH}')"
    )
    df = docs.select(
        F.col("doc_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    )
    if with_html:
        df = df.withColumn(
            "html",
            F.encode(
                F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>")),
                "UTF-8",
            ),
        )
    return df


def with_derived(df: DataFrame, res: int = LEAF_RES) -> DataFrame:
    """Attach text_sha256, lat, lon and the leaf cell column."""
    ts_str = F.date_format(F.col("warc_ts"), "yyyy-MM-dd HH:mm:ss")
    geo_hash = F.sha2(F.concat(F.col("url"), F.lit("|"), ts_str), 256)
    u_lat = F.conv(F.substring(geo_hash, 1, 8), 16, 10).cast("bigint") / F.lit(
        4294967296.0
    )
    u_lon = F.conv(F.substring(geo_hash, 9, 8), 16, 10).cast("bigint") / F.lit(
        4294967296.0
    )
    lat = (u_lat * F.lit(180.0) - F.lit(90.0)).alias("lat")
    lon = (u_lon * F.lit(360.0) - F.lit(180.0)).alias("lon")
    df = (
        df.withColumn("text_sha256", F.upper(F.sha2(F.col("text"), 256)))
        .withColumn("lat", lat)
        .withColumn("lon", lon)
    )
    return df.withColumn("cell", grid.cell_encode(F.col("lat"), F.col("lon"), res))


def pages_with_derived(
    spark: SparkSession, sf_dir: str, res: int = LEAF_RES, with_html: bool = False
) -> DataFrame:
    return with_derived(pages(spark, sf_dir, with_html=with_html), res=res)


def pages_replicated(
    spark: SparkSession, sf_dir: str, factor: int, res: int = LEAF_RES
) -> DataFrame:
    """Deterministically fan the pages table out ``factor``x for
    throughput benchmarks: replica r of a page gets url suffix ``#r`` and
    warc_ts shifted by r seconds, so hashes/coords/cells are all distinct
    but fully reproducible. (Bench-only; correctness runs use pages().)"""
    base = pages(spark, sf_dir)
    # the sandbox parquet is one tiny file (1-2 input splits); at real
    # scale Iceberg split planning provides the parallelism, so emulate it:
    # spread the replica explosion across 2x the available cores.
    n_parts = max(spark.sparkContext.defaultParallelism * 2, 8)
    rep = base.repartition(n_parts, "doc_id").select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    )
    rep = rep.select(
        F.col("doc_id") * factor + F.col("rep"),
        F.concat(F.col("url"), F.lit("#"), F.col("rep").cast("string")).alias("url"),
        F.expr("timestampadd(SECOND, rep, warc_ts)").alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    ).toDF("doc_id", "url", "warc_ts", "text", "lang")
    return with_derived(rep, res=res)


#: Coarse partition-layout resolution: 2^2 x 2^3 = 32 directories in the
#: sandbox; a real deployment picks ~res 6-8 (8k-130k partitions) so each
#: partition holds a bounded slice of the 10^12-row table.
PART_RES = 2


def write_cell_partitioned(
    pages_derived: DataFrame, path: str, part_res: int = PART_RES
) -> None:
    """Materialise the pages table PARTITIONED BY a coarse cell column —
    the sandbox stand-in for the Iceberg spatial layout. ``part_cell`` is
    the leaf cell's ancestor at ``part_res``; spatial operators that know
    their candidate cells turn them into a static ``part_cell IN (...)``
    predicate, which Spark evaluates against directory names BEFORE
    listing files — the 'at 100 TB only candidate partitions are read'
    claim as an actual plan property (pinned in tests/test_plans.py)."""
    out = pages_derived.withColumn(
        "part_cell", grid.cell_parent(F.col("cell"), LEAF_RES, part_res)
    )
    out.write.mode("overwrite").partitionBy("part_cell").parquet(path)


def read_cell_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_zordered(
    pages_derived: DataFrame, path: str, n_files: int = 32
) -> None:
    """Materialise the pages table clustered along the Z-order curve —
    the file-skipping layout lever (Iceberg/Delta z-order sort analogue),
    orthogonal to :func:`write_cell_partitioned`'s directory pruning.

    ``repartitionByRange`` on the Morton key range-partitions rows into
    ``n_files`` curve segments (one shuffle, sampled range bounds), and
    the within-partition sort puts every row group in key order, so each
    parquet file covers one COMPACT spatial region with tight min/max
    column stats on both ``zkey`` and ``cell``. A bbox/cell-range scan
    then touches O(covering/segment) files; in the flat layout every
    file intersects every bbox (hash placement scatters each region
    across all files). tests/test_layout.py pins the locality bound.

    At the 10^12-row scale the same two lines are the table's declared
    sort order — Iceberg: ``ALTER TABLE pages WRITE ORDERED BY zkey`` —
    applied by every writer instead of a one-shot rewrite."""
    out = pages_derived.withColumn("zkey", grid.zorder_key(F.col("cell")))
    (out.repartitionByRange(n_files, F.col("zkey"))
        .sortWithinPartitions("zkey")
        .write.mode("overwrite").parquet(path))


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, *keys: str
) -> None:
    """Materialise a relation as a BUCKETED catalog table (Hive bucket
    spec): rows hash-partitioned into ``n_buckets`` files per partition
    on ``keys``, each file sorted by ``keys``.

    This is the CO-LOCATION layout lever, orthogonal to
    :func:`write_cell_partitioned` (directory pruning) and
    :func:`write_zordered` (min/max range pruning): when BOTH sides of
    an equi-join are bucketed on the join keys with the same bucket
    count, the SortMergeJoin consumes each table's files directly —
    ZERO Exchange on either side. For the verify join (live pages vs
    stored manifest, both keyed by (cell, url)) that deletes the two
    corpus-sized shuffles that otherwise dominate a 100 TB run; only
    the ~100-byte report rows ever move. NOTE: the bucket columns must
    cover ALL the join's equi-keys, positionally — Spark's co-partition
    check (spark.sql.requireAllClusterKeysForCoPartition, default true
    since 3.3) rejects a subset, inserting exchanges anyway. The
    reference gets the same co-location from its directory tree (one
    folder's hash file verifies against that folder's files,
    FileVerification/PathInfo.cs:197-289 — work never crosses folders);
    bucketing is that contract declared to the optimizer. Iceberg
    spelling: ``PARTITIONED BY (bucket(N, url))`` + storage-partitioned
    joins. tests/test_plans.py pins the zero-shuffle plan and the
    flat-path parity."""
    if not keys:
        raise ValueError("write_bucketed needs at least one bucket key")
    # Pre-partition the writer on the bucket hash (same Murmur3 the
    # bucket spec uses) so every bucket is ONE file: without this each
    # writer task spills a file into every bucket (tasks x buckets tiny
    # files) and the reader must re-sort multi-file buckets, forfeiting
    # the sortBy elision the layout exists to provide.
    (df.repartition(n_buckets, *[F.col(k) for k in keys])
       .write.bucketBy(n_buckets, *keys).sortBy(*keys)
       .format("parquet").mode("overwrite").saveAsTable(table))


# ---------------------------------------------------------------------------
# DuckDB oracle mirror — the same derivation as ANSI SQL over the same
# parquet view ``documents``. Interpolate with .format(res=...).
# ---------------------------------------------------------------------------

def pages_cte(res: int = LEAF_RES) -> str:
    """A CTE body (no WITH keyword) deriving the identical pages table in
    DuckDB. Columns: doc_id, url, warc_ts, text, lang, text_sha256, lat,
    lon, cell."""
    lat_expr = (
        "(CAST(('0x' || substr(geo_hash, 1, 8)) AS BIGINT) / 4294967296.0"
        " * 180.0 - 90.0)"
    )
    lon_expr = (
        "(CAST(('0x' || substr(geo_hash, 9, 8)) AS BIGINT) / 4294967296.0"
        " * 360.0 - 180.0)"
    )
    return f"""
pages_base AS (
  SELECT
    doc_id,
    'https://' || source || '.example.org/' || lang || '/' || CAST(doc_id AS VARCHAR) AS url,
    TIMESTAMP '{EPOCH}' + INTERVAL (CAST((doc_id * {TS_STEP}) % {YEAR_SECONDS} AS INT)) SECOND AS warc_ts,
    text,
    lang
  FROM documents
),
pages_hashed AS (
  SELECT *,
    upper(sha256(text)) AS text_sha256,
    sha256(url || '|' || strftime(warc_ts, '%Y-%m-%d %H:%M:%S')) AS geo_hash
  FROM pages_base
),
pages AS (
  SELECT doc_id, url, warc_ts, text, lang, text_sha256,
    {lat_expr} AS lat,
    {lon_expr} AS lon,
    {grid.sql_cell_encode(lat_expr, lon_expr, res)} AS cell
  FROM pages_hashed
)"""
