"""URL canonicalization — the webtext pipeline's dedup-key normaliser.

Crawl-scale corpora carry the same page under many surface URLs (scheme
and host case variants, default ports, ``www.`` prefixes, tracking
query params, fragments). Canonicalising before dedup collapses those
families with a pure codegen'd Column expression — zero shuffle, zero
Python — so canonical dedup's only shuffle is the final keep-one
groupBy on the canonical key (near-uniform key space, skew-safe at
100 TB: the hot-family worst case is bounded by true duplicate count,
which is exactly the signal being measured).

Rules (the documented contract; mirrors de-facto crawler canon, e.g.
the public Nutch/StormCrawler basic URL normalisers, re-expressed):

 1. strip the ``#fragment``
 2. lowercase scheme and host; strip one leading ``www.``
 3. strip default ports (http:80, https:443); keep non-default ports
 4. strip trailing slashes from the path (`/a/b/` == `/a/b`; a bare
    host with path `/` folds to no path)
 5. drop tracking query params (``utm_*``, ``fbclid``, ``gclid``,
    ``msclkid``), byte-sort the survivors, re-join with ``&``
 6. a string with no ``scheme://`` prefix passes through unchanged

Path and query-param case are preserved — unlike hosts they are
case-sensitive per RFC 3986.

Reference parity: FileVerification normalises file paths before keying
(`FV/PathInfo.cs` extension trim/upper, `FV/IO/Name.cs` ordinal-case
matching); URLs are this engine's paths, and this is the same
"normalise before keying" move for the web domain.

Every rule is expressed in the Java-regex ∩ DuckDB-RE2 dialect so the
SQL mirror (``sql_canonical_select``) is bit-identical — the same
discipline as functions/scrub.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
TRACKING_RE = "^(utm_[^=]*|fbclid|gclid|msclkid)="


def url_canonicalize(url: Column) -> Column:
    """Canonical form of ``url`` per the module contract — one nested
    codegen'd expression (regexp + array ops), no UDF, no shuffle."""
    scheme_raw = F.regexp_extract(url, SCHEME_RE, 1)
    u = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(scheme_raw)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(u, SCHEME_RE + "([^/?#]*)", 2)),
        r"^www\.", "",
    )
    host = (
        F.when(scheme == "http", F.regexp_replace(host, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, ":443$", ""))
        .otherwise(host)
    )
    rest = F.regexp_replace(u, SCHEME_RE + "[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda x: (x != F.lit("")) & ~x.rlike(TRACKING_RE),
    )
    qc = F.array_join(F.sort_array(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qc == "", F.lit("")).otherwise(F.concat(F.lit("?"), qc)),
    )
    return F.when(scheme_raw == "", url).otherwise(canon)


def sql_canonical_select(inner_rel: str, url_expr: str = "url",
                         keep: str = "doc_id") -> str:
    """DuckDB mirror of :func:`url_canonicalize` as a layered SELECT over
    ``inner_rel`` (a parenthesised relation or table name): returns
    ``({keep}, canonical_url)``. Layered subqueries stand in for the
    local bindings a SQL expression can't have."""
    return f"""
SELECT {keep},
       CASE WHEN scheme_raw = '' THEN url
            ELSE scheme || '://' || host2 || path2 ||
                 CASE WHEN qc = '' THEN '' ELSE '?' || qc END
       END AS canonical_url
FROM (
  SELECT {keep}, url, scheme_raw, scheme,
         CASE WHEN scheme = 'http'  THEN regexp_replace(host, ':80$',  '')
              WHEN scheme = 'https' THEN regexp_replace(host, ':443$', '')
              ELSE host END AS host2,
         regexp_replace(regexp_extract(rest, '^([^?]*)', 1), '/+$', '')
           AS path2,
         COALESCE(array_to_string(
           list_sort(
             list_filter(
               string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
               x -> x <> '' AND NOT regexp_matches(x, '{TRACKING_RE}'))),
           '&'), '') AS qc
  FROM (
    SELECT {keep}, url,
           regexp_extract(url, '{SCHEME_RE}', 1) AS scheme_raw,
           lower(regexp_extract(url, '{SCHEME_RE}', 1)) AS scheme,
           regexp_replace(
             lower(regexp_extract(u, '{SCHEME_RE}([^/?#]*)', 2)),
             '^www\\.', '') AS host,
           regexp_replace(u, '{SCHEME_RE}[^/?#]*', '') AS rest
    FROM (
      SELECT {keep}, {url_expr} AS url,
             regexp_replace({url_expr}, '#.*$', '') AS u
      FROM {inner_rel}
    )
  )
)"""


# ---------------------------------------------------------------------------
# SURT keys — the Common Crawl CDX index key format
# ---------------------------------------------------------------------------

def surt_key(canonical_url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key of an already-
    CANONICAL http(s) URL — the public CDX index key format (pywb /
    Common Crawl cdx-index): scheme dropped, host components reversed
    and comma-joined, optional ``:port`` kept, ``)`` separator, then the
    lowercased path+query:

        https://sub.example.com:8080/A/b?q=1
            -> com,example,sub:8080)/a/b?q=1

    Sorting rows by this key clusters a registered domain and ALL its
    subdomains into one contiguous key range — the URL-space twin of
    grid.zorder_key (prefix range == subtree), which is what makes
    per-domain range scans cheap in a CDX-ordered layout. Pure codegen;
    compose as ``surt_key(url_canonicalize(url))``. Non-absolute
    inputs (no ``scheme://``) yield NULL."""
    hostport = F.regexp_extract(canonical_url, SCHEME_RE + "([^/?#]*)", 2)
    host = F.regexp_extract(hostport, "^([^:]*)", 1)
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    rev = F.array_join(F.reverse(F.split(host, "\\.")), ",")
    rest = F.lower(F.regexp_replace(canonical_url, SCHEME_RE + "[^/?#]*", ""))
    out = F.concat(
        rev,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.lit(")"),
        rest,
    )
    return F.when(
        F.regexp_extract(canonical_url, SCHEME_RE, 1) == "", F.lit(None)
    ).otherwise(out)


def sql_surt_key(canon_expr: str) -> str:
    """DuckDB mirror of :func:`surt_key` over a canonical-URL expression."""
    hostport = f"regexp_extract({canon_expr}, '{SCHEME_RE}([^/?#]*)', 2)"
    host = f"regexp_extract({hostport}, '^([^:]*)', 1)"
    port = f"regexp_extract({hostport}, ':([0-9]+)$', 1)"
    rev = f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    rest = f"lower(regexp_replace({canon_expr}, '{SCHEME_RE}[^/?#]*', ''))"
    return (
        f"CASE WHEN regexp_extract({canon_expr}, '{SCHEME_RE}', 1) = ''"
        f" THEN NULL ELSE {rev} ||"
        f" CASE WHEN {port} = '' THEN '' ELSE ':' || {port} END"
        f" || ')' || {rest} END"
    )


# ---------------------------------------------------------------------------
# Fetch-layer parsers: robots.txt and sitemap XML
# ---------------------------------------------------------------------------

#: Disallow path of a robots.txt line, case-insensitive, one per line.
#: Documented subset of the robots exclusion protocol: every Disallow
#: is honored regardless of its User-agent block (the conservative
#: crawler-side reading); Allow overrides and wildcards are out of
#: scope. Java ∩ RE2 dialect (inline (?im), no backreferences).
ROBOTS_DISALLOW_RE = r"(?im)^[ \t]*disallow:[ \t]*(/[^ \t\r\n#]*)"

#: <loc> element body of a sitemap XML document
SITEMAP_LOC_RE = r"(?is)<loc>\s*(https?://[^<\s]+)\s*</loc>"


def robots_disallows(robots_txt: Column) -> Column:
    """Array of Disallow path prefixes of a robots.txt body (the
    conservative all-agents subset — see :data:`ROBOTS_DISALLOW_RE`).
    Explode + pair with the fetch host to feed
    ``curation.robots_filter``'s rules relation."""
    return F.regexp_extract_all(robots_txt, F.lit(ROBOTS_DISALLOW_RE), 1)


def sql_robots_disallows(txt_expr: str) -> str:
    return f"regexp_extract_all({txt_expr}, '{ROBOTS_DISALLOW_RE}', 1)"


def sitemap_locs(xml: Column) -> Column:
    """Array of absolute URLs in a sitemap XML body (``<loc>`` elements)
    — the push-side twin of the crawl frontier's link discovery."""
    return F.regexp_extract_all(xml, F.lit(SITEMAP_LOC_RE), 1)


def sql_sitemap_locs(xml_expr: str) -> str:
    return f"regexp_extract_all({xml_expr}, '{SITEMAP_LOC_RE}', 1)"


#: Crawl-delay seconds (first occurrence wins; integer-seconds subset —
#: fractional delays round down in real crawlers anyway). Same
#: conservative all-agents reading as ROBOTS_DISALLOW_RE.
CRAWL_DELAY_RE = r"(?im)^[ \t]*crawl-delay:[ \t]*([0-9]+)"


def robots_crawl_delay(robots_txt: Column) -> Column:
    """First Crawl-delay of a robots.txt body as BIGINT seconds (0 when
    the directive is absent)."""
    return F.coalesce(
        # try_cast: no-match extracts '' and ANSI cast('') would throw
        F.regexp_extract(robots_txt, CRAWL_DELAY_RE, 1).try_cast("long"),
        F.lit(0).cast("long"),
    )


def sql_robots_crawl_delay(txt_expr: str) -> str:
    """DuckDB mirror ('' extract -> NULL cast -> 0, same as Spark)."""
    return (
        f"COALESCE(TRY_CAST(regexp_extract({txt_expr},"
        f" '{CRAWL_DELAY_RE}', 1) AS BIGINT), 0)"
    )


# ---------------------------------------------------------------------------
# URL quality / spam scoring — zero-shuffle per-URL lexical features
# ---------------------------------------------------------------------------
# The lexical-URL spam signals every crawler ranks by before it ever
# fetches a byte (digit-stuffed hosts, hyphen chains, deep subdomains,
# parameter farms — cf. the public literature on URL-feature spam
# classifiers, e.g. Ma et al. 2009 "Beyond Blacklists", KDD). Exact
# integer milli-scores so the DuckDB mirror is bit-identical.

#: spam-score weights (milli-units), documented contract
URL_SPAM_W_HYPHEN = 200
URL_SPAM_W_SUBDOMAIN = 100   # per dot beyond 2
URL_SPAM_W_PATH_DEPTH = 50   # per segment beyond 4
URL_SPAM_W_PARAM = 30
URL_SPAM_W_LONG_PATH = 300   # flat penalty past 80 chars


def _count_char(s: Column, ch: str) -> Column:
    return (F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))).cast("int")


def url_quality_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-URL lexical quality features + integer spam score:
    ``(url, host, subdomain_depth, host_digits_milli, host_hyphens,
    path_depth, path_len, n_params, spam_score_milli)``.

    One codegen'd projection — no shuffle, no Python; pipelines with
    the scan at 100 TB exactly like pii_scrub/html_text.

    Feature canon (host lowercased, port stripped):
    - subdomain_depth  = dots in host
    - host_digits_milli = 1000 * digit-chars div host length
    - host_hyphens     = '-' chars in host
    - path_depth       = '/' chars in the path part
    - path_len         = length of the path part
    - n_params         = query params ('&'-separated; 0 when no '?')
    - spam_score_milli = host_digits_milli
                         + 200*host_hyphens
                         + 100*max(0, subdomain_depth - 2)
                         + 50*max(0, path_depth - 4)
                         + 30*n_params
                         + 300*(path_len > 80)
    """
    url = F.col(url_col)
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, SCHEME_RE + "([^/?#]*)", 2)),
        ":[0-9]+$", "",
    )
    path = F.regexp_extract(url, SCHEME_RE + "[^/?#]*([^?#]*)", 2)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    subdomain_depth = _count_char(host, ".")
    host_digits = (
        F.length(host) - F.length(F.regexp_replace(host, "[0-9]", ""))
    ).cast("long")
    # double division + cast-to-long truncates toward zero on these
    # non-negative small ints — exactly DuckDB's integer '//'
    host_digits_milli = (
        host_digits * 1000 / F.greatest(F.length(host), F.lit(1))
    ).cast("long")
    host_hyphens = _count_char(host, "-")
    path_depth = _count_char(path, "/")
    path_len = F.length(path).cast("int")
    n_params = F.when(query == "", F.lit(0)).otherwise(
        _count_char(query, "&") + 1
    ).cast("int")
    spam = (
        host_digits_milli
        + URL_SPAM_W_HYPHEN * host_hyphens
        + URL_SPAM_W_SUBDOMAIN * F.greatest(subdomain_depth - 2, F.lit(0))
        + URL_SPAM_W_PATH_DEPTH * F.greatest(path_depth - 4, F.lit(0))
        + URL_SPAM_W_PARAM * n_params
        + F.when(path_len > 80, F.lit(URL_SPAM_W_LONG_PATH)).otherwise(F.lit(0))
    ).cast("long")
    return df.select(
        url.alias("url"),
        host.alias("host"),
        subdomain_depth.alias("subdomain_depth"),
        host_digits_milli.alias("host_digits_milli"),
        host_hyphens.alias("host_hyphens"),
        path_depth.alias("path_depth"),
        path_len.alias("path_len"),
        n_params.alias("n_params"),
        spam.alias("spam_score_milli"),
    )


def sql_url_quality_select(inner_rel: str, url_expr: str = "url") -> str:
    """DuckDB mirror of :func:`url_quality_features`. Dialect notes:
    DuckDB regexp_replace needs the 'g' flag where Spark is global by
    default; the milli ratio uses integer ``//`` here, matching Spark's
    double-division + CAST(.. AS BIGINT) truncation on these
    non-negative small ints."""
    host = (
        f"regexp_replace(lower(regexp_extract({url_expr},"
        f" '{SCHEME_RE}([^/?#]*)', 2)), ':[0-9]+$', '')"
    )
    path = f"regexp_extract({url_expr}, '{SCHEME_RE}[^/?#]*([^?#]*)', 2)"
    query = f"regexp_extract({url_expr}, '\\?([^#]*)', 1)"
    return f"""
SELECT url, host,
       CAST(length(host) - length(replace(host, '.', '')) AS INTEGER) AS subdomain_depth,
       host_digits_milli,
       CAST(length(host) - length(replace(host, '-', '')) AS INTEGER) AS host_hyphens,
       CAST(length(path) - length(replace(path, '/', '')) AS INTEGER) AS path_depth,
       CAST(length(path) AS INTEGER) AS path_len,
       n_params,
       CAST(host_digits_milli
            + {URL_SPAM_W_HYPHEN} * (length(host) - length(replace(host, '-', '')))
            + {URL_SPAM_W_SUBDOMAIN} * greatest(length(host) - length(replace(host, '.', '')) - 2, 0)
            + {URL_SPAM_W_PATH_DEPTH} * greatest(length(path) - length(replace(path, '/', '')) - 4, 0)
            + {URL_SPAM_W_PARAM} * n_params
            + CASE WHEN length(path) > 80 THEN {URL_SPAM_W_LONG_PATH} ELSE 0 END
         AS BIGINT) AS spam_score_milli
FROM (
  SELECT url, host, path,
         CAST((length(host) - length(regexp_replace(host, '[0-9]', '', 'g')))
              * 1000 // greatest(length(host), 1) AS BIGINT) AS host_digits_milli,
         CAST(CASE WHEN q = '' THEN 0
                   ELSE length(q) - length(replace(q, '&', '')) + 1
              END AS INTEGER) AS n_params
  FROM (SELECT {url_expr} AS url, {host} AS host, {path} AS path,
               {query} AS q
        FROM {inner_rel}) raw
) feat"""
