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
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass
class Exclusions:
    """Pattern lists, OR-of-ORs like the reference's Exclusions element —
    all four IsMatchFound disjuncts (MatchBase.cs:252-281): files,
    folders, attributes, paths (+ the regex list our Name cascade also
    accepts standalone)."""

    names: list[str] = field(default_factory=list)      # match on leaf name
    folders: list[str] = field(default_factory=list)    # cascade on full path
    paths: list[str] = field(default_factory=list)      # substring on full url
    patterns: list[str] = field(default_factory=list)   # regex (ignore case)
    attributes: list[str] = field(default_factory=list)  # named metadata flags


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
                folders=list(ex.get("folders", [])),
                paths=list(ex.get("paths", [])),
                patterns=list(ex.get("patterns", [])),
                attributes=list(ex.get("attributes", [])),
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


#: Attribute-flag registry — the web-page analogue of .NET
#: ``FileAttributes`` (AttributeMatch, MatchBase.cs:95-130): each named
#: flag is a predicate over the table's typed metadata columns. Unknown
#: names are skipped, mirroring the reference's swallowed Enum.Parse
#: failures (Attributes.cs AttributeStrings -> Attribute).
ATTRIBUTE_REGISTRY: dict[str, "Callable[[], Column]"] = {
    # system pages carry no extractable text (the System-file analogue
    # already used structurally by the verify filters)
    "System": lambda: F.col("text").isNull(),
    # dotfile-style hidden leaf segment
    "Hidden": lambda: F.substring_index(F.col("url"), "/", -1).startswith("."),
    # thin-content page — FileAttributes.SparseFile analogue
    "SparseFile": lambda: F.length(F.col("text")) < 50,
}


def exclusion_predicate(
    ex: Exclusions,
    url: Column,
    attribute_registry: "dict[str, Callable[[], Column]] | None" = None,
) -> Column:
    """TRUE where the row must be EXCLUDED (caller negates to keep).
    Disjunction over all configured lists — MatchBase.IsMatchFound
    (MatchBase.cs:252-281): FileMatch | FolderMatch | AttributeMatch |
    PathMatch."""
    registry = ATTRIBUTE_REGISTRY if attribute_registry is None else attribute_registry
    preds: list[Column] = []
    leaf = _leaf_name(url)
    for p in ex.names:
        preds.append(name_match(leaf, p))
    for p in ex.folders:
        # FolderMatch (MatchBase.cs:183-206): the reference hands the
        # FULL path to the Name cascade, so a plain folder name matches
        # via the contains stage anywhere in the path
        preds.append(name_match(url, p))
    for p in ex.paths:
        # PathMatch: case-insensitive substring (MatchBase.cs:217-240)
        preds.append(F.upper(url).contains(p.upper()))
    for p in ex.patterns:
        preds.append(url.rlike(f"(?i){p}"))
    for a in ex.attributes:
        if a in registry:  # unknown flags skipped like the reference
            preds.append(registry[a]())
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

#: SQL twins of ATTRIBUTE_REGISTRY (same names, same semantics).
SQL_ATTRIBUTE_REGISTRY: dict[str, str] = {
    "System": "text IS NULL",
    "Hidden": "regexp_extract(url, '([^/]*)$', 1) LIKE '.%'",
    "SparseFile": "length(text) < 50",
}


def _sql_name_cascade(target: str, p: str) -> str:
    """The 4-stage Name cascade over an arbitrary string expression."""
    if p in ("*", "*.*"):
        return "TRUE"
    q = p.replace("'", "''")
    stage = f"({target} = '{q}' OR strpos({target}, '{q}') > 0"
    if "*" in p or "?" in p:
        lk = dos_to_like(p.upper()).replace("'", "''")
        stage += f" OR upper({target}) LIKE '{lk}' ESCAPE '\\'"
    try:
        re.compile(p)
        stage += f" OR regexp_matches({target}, '(?i){q}')"
    except re.error:
        pass
    return stage + ")"


def sql_exclusion_predicate(ex: Exclusions, url_expr: str = "url") -> str:
    leaf = f"(CASE WHEN strpos({url_expr}, '/') = 0 THEN {url_expr} ELSE regexp_extract({url_expr}, '([^/]*)$', 1) END)"
    preds: list[str] = []
    for p in ex.names:
        preds.append(_sql_name_cascade(leaf, p))
    for p in ex.folders:
        preds.append(_sql_name_cascade(url_expr, p))
    for p in ex.paths:
        q = p.upper().replace("'", "''")
        preds.append(f"strpos(upper({url_expr}), '{q}') > 0")
    for p in ex.patterns:
        q = p.replace("'", "''")
        preds.append(f"regexp_matches({url_expr}, '(?i){q}')")
    for a in ex.attributes:
        if a in SQL_ATTRIBUTE_REGISTRY:
            preds.append(f"({SQL_ATTRIBUTE_REGISTRY[a]})")
    return "(" + " OR ".join(preds) + ")" if preds else "FALSE"
