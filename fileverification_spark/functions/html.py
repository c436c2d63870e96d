"""HTML -> text extraction — the WET step of a crawl pipeline.

Common Crawl ships WARC (raw html) and WET (extracted text); this is
the engine's WARC->WET conversion for the ``html BINARY`` column:
drop script/style/comment blocks, strip tags, decode the common
entities, collapse whitespace. Pure codegen'd regexp/replace chain —
zero shuffle, no UDF; runs at scan speed next to the hash derivation.

Dialect discipline (same as functions/scrub.py): every pattern is in
the Java-regex ∩ RE2 subset — inline flags `(?is)` yes, backreferences
NO (RE2 has none, so script and style close-tags are matched by
separate literal patterns, not `</\\1>`).

Fidelity note: this is the crawl-hygiene extractor (tag/entity/space
handling), not a browser; block-level layout (tables, lists) collapses
to single spaces, which is exactly what WET files do.

Reference parity: the reference reads raw file bytes and derives the
hashable content (FV/HashInfo.cs:164-238 GetFileHash over the byte
stream); html_to_text is that byte->content derivation for web pages,
feeding the same sha256 path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCKS = [
    r"(?is)<script[^>]*>.*?</script>",
    r"(?is)<style[^>]*>.*?</style>",
    r"(?s)<!--.*?-->",
]
_TAG = r"(?s)<[^>]*>"
_ENTITIES = [
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # LAST: so &amp;lt; decodes to &lt; not <
]


def html_to_text(html: Column) -> Column:
    """Extracted text of an ``html BINARY`` column (UTF-8)."""
    s = F.decode(html, "UTF-8")
    for pat in _BLOCKS:
        s = F.regexp_replace(s, pat, " ")
    s = F.regexp_replace(s, _TAG, " ")
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def sql_html_to_text(html_expr: str) -> str:
    """DuckDB mirror over a VARCHAR html expression (DuckDB reads the
    binary column as BLOB; callers decode/construct upstream)."""
    s = html_expr
    for pat in _BLOCKS:
        s = f"regexp_replace({s}, '{pat}', ' ', 'g')"
    s = f"regexp_replace({s}, '{_TAG}', ' ', 'g')"
    for ent, rep in _ENTITIES:
        rep_sql = rep.replace("'", "''")
        s = f"replace({s}, '{ent}', '{rep_sql}')"
    return f"trim(regexp_replace({s}, '\\s+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Outlink extraction — the WAT step (link records) next to the WET step
# ---------------------------------------------------------------------------

#: href attribute value in a double-quoted attribute. Java ∩ RE2 dialect:
#: inline (?i) yes, backreferences no. Single-quoted/unquoted attributes are
#: out of scope (crawl-hygiene extractor, same fidelity bar as
#: html_to_text); group 1 is the raw link.
HREF_RE = r'(?i)href\s*=\s*"([^"]*)"'

#: absolute http(s) links only — relative links would need per-page base-url
#: resolution, which the WAT-style link record defers to the consumer
ABS_RE = "^https?://"


def extract_links(html: Column) -> Column:
    """Array of raw outlink targets of an ``html BINARY`` column (UTF-8):
    every double-quoted href attribute value, document order preserved,
    relative links included (filter with :data:`ABS_RE` downstream).

    Pure codegen'd ``regexp_extract_all`` — zero shuffle, no UDF; the
    WAT-record analogue of :func:`html_to_text`'s WET record. Reference
    parity: the reference derives per-file records from raw bytes
    (FV/HashInfo.cs:164-238); this derives the link records the crawl
    frontier / link graph is built from.
    """
    return F.regexp_extract_all(F.decode(html, "UTF-8"), F.lit(HREF_RE), 1)


def sql_extract_links(html_expr: str) -> str:
    """DuckDB mirror: LIST of href values over a VARCHAR html expression."""
    return f"regexp_extract_all({html_expr}, '{HREF_RE}', 1)"


# ---------------------------------------------------------------------------
# Page metadata — title + meta description (the retrieval display fields)
# ---------------------------------------------------------------------------

#: first <title> element body. Java ∩ RE2: lazy quantifier yes,
#: backreference no (close tag is a literal).
TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"

#: content attribute of <meta name="description" ...>. Attribute order is
#: pinned (name before content) — the crawl-hygiene fidelity bar: real
#: head tags emitted by CMSes overwhelmingly use this order, and the
#: order-free form needs backreferences RE2 lacks.
META_DESC_RE = r'(?is)<meta\s+name\s*=\s*"description"\s+content\s*=\s*"([^"]*)"'


def _clean_ws(s: Column) -> Column:
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def html_title(html: Column) -> Column:
    """First ``<title>`` body of an ``html BINARY`` column (UTF-8),
    whitespace-collapsed; '' when the page has none. Codegen'd
    ``regexp_extract`` — zero shuffle, scan-speed like
    :func:`html_to_text`."""
    return _clean_ws(
        F.regexp_extract(F.decode(html, "UTF-8"), TITLE_RE, 1)
    )


def meta_description(html: Column) -> Column:
    """``content`` of the page's ``<meta name="description">`` ('' when
    absent), whitespace-collapsed."""
    return _clean_ws(
        F.regexp_extract(F.decode(html, "UTF-8"), META_DESC_RE, 1)
    )


def _sql_clean_ws(expr: str) -> str:
    return f"trim(regexp_replace({expr}, '\\s+', ' ', 'g'))"


def sql_html_title(html_expr: str) -> str:
    """DuckDB mirror of :func:`html_title` over a VARCHAR expression.
    DuckDB's regexp_extract returns '' on no match like Spark's, but
    COALESCE guards NULL inputs identically in both engines."""
    return _sql_clean_ws(
        f"COALESCE(regexp_extract({html_expr}, '{TITLE_RE}', 1), '')"
    )


def sql_meta_description(html_expr: str) -> str:
    pat = META_DESC_RE.replace("'", "''")
    return _sql_clean_ws(
        f"COALESCE(regexp_extract({html_expr}, '{pat}', 1), '')"
    )
