"""Job configuration + exclusion predicate compiler (SURVEY F3/F4, S8).

The reference drives exclusions from an XML settings file
(FileVerification/Configuration/Settings.cs:8-36): lists of file-name,
folder-name, path-substring and attribute patterns, OR-ed together
(Exclusions.cs:20-24, MatchBase.cs:252-281). Its name matching is a
4-stage cascade — exact ordinal equals, ordinal substring, DOS wildcard
NFA (510 lines, PatternMatcher.cs:102-508), regex ignore-case
(Name.cs:38-81).

Here the whole subsystem compiles to ONE Column predicate:

- exact / substring     → ``==`` / ``contains``
- DOS wildcard          → SQL LIKE on upper-cased strings
  (``*``→``%``, ``?``→``_``; the NT-era ``<ANGLE>``/``>``/``"`` DOS
  edge semantics are deliberately dropped — documented simplification,
  SURVEY §2.2 F4)
- regex                 → ``rlike`` with (?i)

Because it is a plain Column expression, Catalyst pushes it into the
parquet/Iceberg scan (PushedFilters) — the reference evaluates the same
patterns per file in C# *after* enumeration (PathInfo.cs:213-231); here
excluded partitions are never read. Config itself is a plain dataclass
loaded from JSON (the XML transport is host plumbing, not query
semantics — SURVEY non-goals).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class Exclusions:
    """Pattern lists, OR-of-ORs like the reference's Exclusions element."""

    names: list[str] = field(default_factory=list)      # match on leaf name
    paths: list[str] = field(default_factory=list)      # substring on full url
    patterns: list[str] = field(default_factory=list)   # regex (ignore case)


@dataclass
class JobConfig:
    exclusions: Exclusions = field(default_factory=Exclusions)
    algorithm: str = "sha256"
    allow_remove: bool = False   # Settings.cs allowremove
    threads: int | None = None   # --threads ⇔ parallelism (cluster-managed)

    @classmethod
    def from_json(cls, path: str) -> "JobConfig":
        raw = json.loads(open(path).read())
        ex = raw.get("exclusions", {})
        return cls(
            exclusions=Exclusions(
                names=list(ex.get("names", [])),
                paths=list(ex.get("paths", [])),
                patterns=list(ex.get("patterns", [])),
            ),
            algorithm=raw.get("algorithm", "sha256"),
            allow_remove=bool(raw.get("allow_remove", False)),
            threads=raw.get("threads"),
        )


_LIKE_SPECIAL = re.compile(r"([%_\\])")


def dos_to_like(pattern: str) -> str:
    """DOS wildcard → SQL LIKE: * → %, ? → _; escape native LIKE chars."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        else:
            out.append(_LIKE_SPECIAL.sub(r"\\\1", ch))
    return "".join(out)


def _leaf_name(url: Column) -> Column:
    """F6 projection: the 'file name' of a url (last path segment)."""
    return F.substring_index(url, "/", -1)


def name_match(name: Column, pattern: str) -> Column:
    """The 4-stage cascade of Name.IsMatch (Name.cs:38-81) as one
    expression: exact == OR contains OR DOS-wildcard-LIKE OR regex.
    Wildcard comparison is on upper-cased strings like the reference
    (PatternMatcher upper-cases both sides); ``*`` and ``*.*`` are the
    reference's always-true fast paths (PatternMatcher.cs:143-168)."""
    if pattern in ("*", "*.*"):
        return F.lit(True)
    stages = (name == F.lit(pattern)) | name.contains(F.lit(pattern))
    if "*" in pattern or "?" in pattern:
        stages = stages | F.upper(name).like(dos_to_like(pattern.upper()))
    try:
        re.compile(pattern)
        stages = stages | name.rlike(f"(?i){pattern}")
    except re.error:
        pass  # reference also swallows invalid-regex stage
    return stages


def exclusion_predicate(ex: Exclusions, url: Column) -> Column:
    """TRUE where the row must be EXCLUDED (caller negates to keep).
    Disjunction over all configured lists — MatchBase.IsMatchFound."""
    preds: list[Column] = []
    leaf = _leaf_name(url)
    for p in ex.names:
        preds.append(name_match(leaf, p))
    for p in ex.paths:
        # PathMatch: case-insensitive substring (MatchBase.cs:217-240)
        preds.append(F.upper(url).contains(p.upper()))
    for p in ex.patterns:
        preds.append(url.rlike(f"(?i){p}"))
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def apply_exclusions(df, ex: Exclusions, url_col: str = "url"):
    """Keep rows NOT excluded — the scan-time filter the reference runs
    per file after enumeration; here it pushes down into the scan."""
    return df.where(~exclusion_predicate(ex, F.col(url_col)))


# ---------------------------------------------------------------------------
# DuckDB oracle mirror (subset used by the contract query: names with DOS
# wildcards + path substrings + regex — same semantics, same cascade).
# ---------------------------------------------------------------------------

def sql_exclusion_predicate(ex: Exclusions, url_expr: str = "url") -> str:
    leaf = f"(CASE WHEN strpos({url_expr}, '/') = 0 THEN {url_expr} ELSE regexp_extract({url_expr}, '([^/]*)$', 1) END)"
    preds: list[str] = []
    for p in ex.names:
        if p in ("*", "*.*"):
            preds.append("TRUE")
            continue
        q = p.replace("'", "''")
        stage = f"({leaf} = '{q}' OR strpos({leaf}, '{q}') > 0"
        if "*" in p or "?" in p:
            lk = dos_to_like(p.upper()).replace("'", "''")
            stage += f" OR upper({leaf}) LIKE '{lk}' ESCAPE '\\'"
        try:
            re.compile(p)
            stage += f" OR regexp_matches({leaf}, '(?i){q}')"
        except re.error:
            pass
        preds.append(stage + ")")
    for p in ex.paths:
        q = p.upper().replace("'", "''")
        preds.append(f"strpos(upper({url_expr}), '{q}') > 0")
    for p in ex.patterns:
        q = p.replace("'", "''")
        preds.append(f"regexp_matches({url_expr}, '(?i){q}')")
    return "(" + " OR ".join(preds) + ")" if preds else "FALSE"
