"""Reference-format text manifest source/sink (SURVEY S3/S5).

The reference persists one ``__fv.txt`` per folder with pipe-separated
records ``NAME|HASHALGORITHM|HASH`` (FileVerification/CheckSumFile.cs:14-29
layout enum, HashInfo.cs:23 separator, HashInfo.cs:271-274 serialization).
Parse semantics preserved exactly:

- a line splitting into != 3 fields is **dropped with a warning**, not
  fatal (CheckSumFile.cs:130-135) — PERMISSIVE mode;
- unknown algorithm string falls back to sha256 (HashInfo.cs:131-149);
- duplicate keys: first writer wins, silently (CheckSumFile.cs:146) —
  dropDuplicates (nondeterministic winner in both systems);
- write order is nondeterministic in the reference
  (CheckSumFile.cs:285-288); we sort for reproducibility (strictly
  stronger, matches the Merkle digest convention).

This is the fixture-compat path; production manifests live in the
``cell_manifest`` table (operators/manifest.py).

NOTE: Hadoop's FileInputFormat silently skips paths whose basename starts
with ``_`` or ``.`` (they look like _SUCCESS markers), so the reference's
literal ``__fv.txt`` filename cannot be read by Spark by path — callers
must rename/copy fixture manifests to a visible name first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fileverification_spark.functions import hashing

SEPARATOR = "|"
DEFAULT_CHECKSUM_FILENAME = "__fv.txt"  # CheckSumFile.cs:35


def parse_manifest_lines(lines: DataFrame, dedup: bool = True) -> DataFrame:
    """Parse a DataFrame of raw record lines (column ``value``) into
    (child_key, algo, hash). Malformed rows dropped (PERMISSIVE,
    CheckSumFile.cs:130-135); unknown algo falls back to sha256
    (HashInfo.cs:131-149)."""
    parts = F.split(F.col("value"), r"\|")
    out = (
        lines.where(F.length(F.trim(F.col("value"))) > 0)
        .select(parts.alias("p"))
        .where(F.size(F.col("p")) == 3)  # CheckSumFile.cs:130-135
        .select(
            F.col("p")[0].alias("child_key"),
            hashing.algo_parse(F.col("p")[1]).alias("algo"),
            F.col("p")[2].alias("hash"),
        )
    )
    if dedup:
        # first-writer-wins, CheckSumFile.cs:146
        out = out.dropDuplicates(["child_key"])
    return out


def read_text_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-layout manifest text file(s) into
    (child_key, algo, hash). Malformed rows dropped (PERMISSIVE)."""
    return parse_manifest_lines(spark.read.text(path))


def manifest_lines(manifest: DataFrame) -> DataFrame:
    """Serialize (child_key, algo, hash) to reference record lines,
    sorted for determinism (reference order is nondeterministic)."""
    return manifest.select(
        hashing.record_serialize(
            F.col("child_key"), F.col("algo"), F.col("hash")
        ).alias("value")
    ).orderBy("value")


def write_text_manifest(manifest: DataFrame, path: str) -> None:
    """Overwrite a text manifest at ``path`` (one part per cell partition
    at scale; coalesced for fixture-size data)."""
    manifest_lines(manifest).coalesce(1).write.mode("overwrite").text(path)
