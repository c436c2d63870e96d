"""Hash scalar functions (SURVEY §2.3 C1-C4, C6).

Reference semantics being preserved:

- C1 hash(content, algo): MD5/SHA1/SHA256/SHA512, hex **uppercase**
  (FileVerification/HashInfo.cs:164-238; uppercase at :222). Spark's
  built-ins return lowercase hex → wrap in upper(). All four are JVM
  built-ins, codegen'd — the 1 MiB streaming buffer + GC.Collect() of the
  reference collapses to a vectorized expression.
- C2 algo_parse: case-insensitive, **unknown → SHA256**
  (HashInfo.cs:131-149).
- C3 hash_equal: ordinal case-sensitive; a null/blank stored hash only
  matches null/blank (HashInfo.cs:255-263).
- C4 hash_equal_ci: case-insensitive for user-provided hashes
  (Program.cs:327).
- C6 record serialize: ``name|algo_lower|hash`` (HashInfo.cs:271-274).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALGORITHMS = ("sha256", "md5", "sha1", "sha512")
SEPARATOR = "|"  # FileVerification/HashInfo.cs:23


def algo_parse(algo: Column) -> Column:
    """Normalise an algorithm name; unknown values fall back to sha256
    (FileVerification/HashInfo.cs:131-149)."""
    a = F.lower(F.trim(algo))
    return F.when(a.isin("md5", "sha1", "sha256", "sha512"), a).otherwise(
        F.lit("sha256")
    )


def hash_col(content: Column, algo: Column) -> Column:
    """Hash ``content`` with the (row-level) algorithm — the mixed-algo
    manifest dispatch of FileVerification/CheckSumFile.cs:238-243 as a
    when() chain. Uppercase hex to match reference output."""
    a = algo_parse(algo)
    return F.upper(
        F.when(a == "md5", F.md5(content.cast("binary")))
        .when(a == "sha1", F.sha1(content.cast("binary")))
        .when(a == "sha512", F.sha2(content, 512))
        .otherwise(F.sha2(content, 256))
    )


def hash_fixed(content: Column, algo: str) -> Column:
    """Hash with a Python-constant algorithm (no when-chain in the plan)."""
    a = algo.lower()
    if a == "md5":
        return F.upper(F.md5(content.cast("binary")))
    if a == "sha1":
        return F.upper(F.sha1(content.cast("binary")))
    if a == "sha512":
        return F.upper(F.sha2(content, 512))
    return F.upper(F.sha2(content, 256))


def hash_equal(stored: Column, computed: Column) -> Column:
    """Case-sensitive compare; null/blank stored equals only null/blank
    computed (FileVerification/HashInfo.cs:255-263)."""
    stored_blank = stored.isNull() | (F.trim(stored) == "")
    computed_blank = computed.isNull() | (F.trim(computed) == "")
    return F.when(stored_blank, computed_blank).otherwise(
        F.coalesce(stored == computed, F.lit(False))
    )


def hash_equal_ci(a: Column, b: Column) -> Column:
    """Case-insensitive compare for user-provided hashes
    (FileVerification/Program.cs:327)."""
    return F.coalesce(F.lower(a) == F.lower(b), F.lit(False))


def record_serialize(name: Column, algo: Column, hash_: Column) -> Column:
    """``name|algo|hash`` manifest line (FileVerification/HashInfo.cs:271-274)."""
    return F.concat_ws(SEPARATOR, name, F.lower(algo), hash_)
