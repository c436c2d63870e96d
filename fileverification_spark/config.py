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
- DOS wildcard          → SQL LIKE on upper-cased strings for plain
  ``*``/``?`` patterns (``*``→``%``, ``?``→``_``); patterns carrying the
  NT-era edge chars ``<`` (DOS_QM) / ``>`` (DOS_STAR) / ``"`` (DOS_DOT)
  compile through :func:`dos_to_regex` to an anchored regex with the
  full FsRtlIsNameInExpression semantics (PatternMatcher.cs:81-92,
  319-433 — documented public NT behaviour, implemented from the spec)
- regex                 → ``rlike`` with (?i)

Because it is a plain Column expression, Catalyst pushes it into the
parquet/Iceberg scan (PushedFilters) — the reference evaluates the same
patterns per file in C# *after* enumeration (PathInfo.cs:213-231); here
excluded partitions are never read. Config itself is a plain dataclass
loaded from JSON (native) or from the reference's own XML settings
schema (:meth:`JobConfig.from_xml` ⇔ XmlFile.cs:74-104).
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
    notifications: list = field(default_factory=list)  # notify.Notification
    notify_wait_ms: int = 60_000  # Notifications.cs:21 DEFAULT_WAIT_TIME

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

    @classmethod
    def from_xml(cls, path: str) -> "JobConfig":
        """Reference-native settings transport (XmlFile.cs:74-104,
        Settings.cs:8-36): ``<settings>`` root with ``<exclusions>``
        (``<files>/<folders>`` holding ``<name>`` text nodes —
        FileBase.cs:14-17, Name.cs:20-21; ``<paths><path>``,
        ``<attributes><attribute>``) and ``<allowremove>``. Notification
        endpoints (``<notifications><notification>`` —
        Notifications.cs:37-42, Notification.cs:23-89, Data.cs:22-35,
        Header.cs:12-16) are parsed into :mod:`..notify` objects via
        :func:`parse_notifications_xml`; they ride on the returned
        config as ``.notifications`` / ``.notify_wait_ms``."""
        import xml.etree.ElementTree as ET

        root = ET.parse(path).getroot()
        if root.tag != "settings":
            raise ValueError(f"expected <settings> root, got <{root.tag}>")

        def texts(parent_path: str) -> list[str]:
            return [
                (el.text or "").strip()
                for el in root.findall(parent_path)
                if (el.text or "").strip()
            ]

        allow_el = root.find("allowremove")
        cfg = cls(
            exclusions=Exclusions(
                names=texts("exclusions/files/name"),
                folders=texts("exclusions/folders/name"),
                paths=texts("exclusions/paths/path"),
                attributes=texts("exclusions/attributes/attribute"),
            ),
            allow_remove=(allow_el is not None
                          and (allow_el.text or "").strip().lower()
                          in ("true", "1")),
        )
        notif_el = root.find("notifications")
        if notif_el is not None:
            from .notify import parse_notifications_xml

            cfg.notifications, cfg.notify_wait_ms = (
                parse_notifications_xml(notif_el))
        return cfg


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


#: NT DOS wildcard edge chars (PatternMatcher.cs:11-13): ``>`` is
#: DOS_STAR, ``<`` is DOS_QM, ``"`` is DOS_DOT.
_NT_CHARS = frozenset('<>"')


def dos_to_regex(pattern: str, dialect: str = "java") -> str:
    """Compile a DOS wildcard expression (incl. the NT edge chars) to an
    ANCHORED regex with FsRtlIsNameInExpression semantics
    (PatternMatcher.cs:81-92; the Windows driver-kit documented rules):

    - ``*``  matches zero or more of any character;
    - ``?``  matches exactly one character (any, incl. ``.``);
    - ``>``  (DOS_STAR) matches zero or more characters, but may only
      consume a ``.`` when another ``.`` follows later in the NAME —
      i.e. it can never eat the final dot (PatternMatcher.cs:330-372);
    - ``<``  (DOS_QM) consumes one non-dot character, or matches zero
      characters when the cursor sits on a ``.`` or at end of name
      (PatternMatcher.cs:388-397);
    - ``"``  (DOS_DOT) matches a ``.``, or zero characters at end of
      name (PatternMatcher.cs:404-415).

    ``dialect="java"`` (Spark ``rlike``) uses lookaheads and covers every
    pattern. ``dialect="re2"`` (DuckDB ``regexp_matches``) has no
    lookahead; the constructs whose epsilon rules collapse against the
    FOLLOWING pattern atom (a ``<`` run or ``>`` before a literal ``.``,
    a ``"``, or pattern end) compile exactly, anything else raises
    ValueError so the SQL mirror fails loud instead of drifting.

    Comparison is case-sensitive here — callers upper-case both pattern
    and name like the reference (Name.cs:58-60)."""
    if dialect not in ("java", "re2"):
        raise ValueError(f"unknown dialect {dialect!r}")
    out: list[str] = []
    i, n = 0, len(pattern)
    while i < n:
        ch = pattern[i]
        if ch == "*":
            out.append(".*")
            i += 1
        elif ch == "?":
            out.append(".")
            i += 1
        elif ch == '"':
            out.append(r"(?:\.|$)")
            i += 1
        elif ch == "<":
            k = 0
            while i < n and pattern[i] == "<":
                k, i = k + 1, i + 1
            nxt = pattern[i] if i < n else None
            if nxt == ".":
                # epsilon requires the cursor on a dot; the literal dot
                # that follows consumes it either way
                out.append(r"[^.]{0,%d}\." % k)
                i += 1
            elif nxt == '"':
                out.append(r"[^.]{0,%d}(?:\.|$)" % k)
                i += 1
            elif nxt is None:
                out.append(r"[^.]{0,%d}" % k)
            elif dialect == "java":
                out.append(r"(?:[^.]{%d}|[^.]{0,%d}(?=\.|$))" % (k, k - 1)
                           if k > 1 else r"(?:[^.]|(?=\.|$))")
            else:
                raise ValueError(
                    f"DOS_QM run before {nxt!r} needs lookahead; "
                    "not expressible in RE2"
                )
        elif ch == ">":
            nxt = pattern[i + 1] if i + 1 < n else None
            if nxt == ".":
                # every dot DOS_STAR eats is followed by the dot the
                # literal consumes, so the no-final-dot rule is free
                out.append(r".*\.")
                i += 2
            elif nxt == '"':
                # DOS_DOT eats a dot (same as above) or matches end —
                # and at end, DOS_STAR's swallowed text must be dot-free
                out.append(r"(?:.*\.|[^.]*$)")
                i += 2
            elif nxt is None:
                # runs to end of name: any dot it ate would be final
                out.append(r"[^.]*")
                i += 1
            elif dialect == "java":
                out.append(r"(?:[^.]|\.(?=.*\.))*")
                i += 1
            else:
                raise ValueError(
                    f"DOS_STAR before {nxt!r} needs lookahead; "
                    "not expressible in RE2"
                )
        else:
            out.append(re.escape(ch))
            i += 1
    return "^" + "".join(out) + "$"


def dos_match(pattern: str, name: str) -> bool:
    """Pure-Python reference matcher for the same FsRtl semantics —
    memoised recursive descent over (pattern index, name index), used by
    the property tests to pin :func:`dos_to_regex` (never in the data
    plane). Case-sensitive; empty name or empty pattern never match
    (PatternMatcher.cs:133-137); ``*``/``*.*`` fast paths are the
    caller's job like the reference's (PatternMatcher.cs:143-147)."""
    if not pattern or not name:
        return False
    # precompute: is there a '.' at or after name index j
    n = len(name)
    dot_after = [False] * (n + 1)
    for j in range(n - 1, -1, -1):
        dot_after[j] = name[j] == "." or dot_after[j + 1]
    from functools import lru_cache

    @lru_cache(maxsize=None)
    def go(pi: int, ni: int) -> bool:
        if pi == len(pattern):
            return ni == n
        ch = pattern[pi]
        if ch == "*":
            return any(go(pi + 1, j) for j in range(ni, n + 1))
        if ch == ">":
            # consume zero+ chars; a consumed '.' needs a later '.'
            j = ni
            while True:
                if go(pi + 1, j):
                    return True
                if j >= n:
                    return False
                if name[j] == "." and not dot_after[j + 1]:
                    return False  # would eat the final dot
                j += 1
        if ch == "?":
            return ni < n and go(pi + 1, ni + 1)
        if ch == "<":
            if ni == n or name[ni] == ".":
                return go(pi + 1, ni)  # epsilon at dot / end
            return go(pi + 1, ni + 1)
        if ch == '"':
            if ni == n:
                return go(pi + 1, ni)
            return name[ni] == "." and go(pi + 1, ni + 1)
        return ni < n and name[ni] == ch and go(pi + 1, ni + 1)

    return go(0, 0)


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
    if _NT_CHARS & set(pattern):
        # full FsRtl semantics; Java regex carries the lookaheads
        stages = stages | F.upper(name).rlike(dos_to_regex(pattern.upper()))
    elif "*" in pattern or "?" in pattern:
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
    if _NT_CHARS & set(p):
        # RE2 dialect: raises on lookahead-needing shapes rather than
        # letting the oracle drift from the Spark predicate
        rx = dos_to_regex(p.upper(), dialect="re2").replace("'", "''")
        stage += f" OR regexp_matches(upper({target}), '{rx}')"
    elif "*" in p or "?" in p:
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
