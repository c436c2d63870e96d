"""Training-data curation pipeline: the end-to-end composition a corpus
build actually runs — exact dedup, then quality gating, then per-language
token accounting. Each stage exists standalone (operators/dedup.py,
functions/text.py); this module chains them the way the reference chains
scan -> hash -> verify -> report into one lifecycle
(FV/Program.cs:230-280), and the whole pipeline stays one declarative
plan: Catalyst fuses the stage filters into the scan, and the only
shuffles are the dedup groupBy and the final per-lang aggregate.

Scale notes: dedup keys on the 256-bit content fingerprint (uniform —
no skew); the quality gates are per-row codegen'd expressions that run
map-side BEFORE the final shuffle, so the aggregate sees only surviving
rows; the per-lang aggregate has |langs| groups. Sums that feed the
contract are BIGINT (token counts) or fixed-scale DECIMAL (quality) so
results are independent of partial-aggregation order — a double sum's
low bits would differ between engines and between runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX

MIN_TOKENS = 5
MIN_QUALITY = 0.4


def dedup_keepers(docs: DataFrame) -> DataFrame:
    """One surviving row per distinct (normalised) content: the min-doc_id
    keeper. Delegates the keeper computation to dedup.dedup_exact (one
    rule, one implementation) and semi-joins on the unique doc_id — a
    narrow bigint shuffle key instead of the 64-char fingerprint string."""
    from fileverification_spark.operators import dedup as D

    keepers = D.dedup_exact(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    return docs.join(keepers, "doc_id", "semi")


def curate(
    docs: DataFrame,
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
) -> DataFrame:
    """Surviving documents with quality features + derived lang attached:
    dedup -> quality gates. Columns: doc_id, lang (derived via lang_id),
    n_tokens, quality_score."""
    uniq = dedup_keepers(docs)
    q = TX.quality_scores(F.col("text"))
    return (
        uniq.select(
            "doc_id",
            TX.lang_id(F.col("text")).alias("lang"),
            q["n_tokens"].alias("n_tokens"),
            q["quality_score"].alias("quality_score"),
        )
        .where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("quality_score") >= min_quality)
        )
    )


def curation_stats(curated: DataFrame) -> DataFrame:
    """Per-derived-lang corpus accounting over the curated set:
    (lang, n_docs, total_tokens, sum_quality). sum_quality is a
    fixed-scale DECIMAL stringified — exact and order-independent."""
    return (
        curated.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.col("quality_score").cast("decimal(18,6)")).alias("_sq"),
        )
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            F.col("_sq").cast("string").alias("sum_quality"),
        )
    )


def sql_curation_stats(
    docs_rel: str = "documents",
    min_tokens: int = MIN_TOKENS,
    min_quality: float = MIN_QUALITY,
) -> str:
    """Oracle: the identical pipeline in one SQL query."""
    qsel = TX.sql_quality_select("text")
    return f"""
WITH fp AS (
  SELECT doc_id, text, {TX.sql_fingerprint('text')} AS fp FROM {docs_rel}
),
keep AS (SELECT fp, min(doc_id) AS keeper_id FROM fp GROUP BY fp),
uniq AS (
  SELECT f.doc_id, f.text
  FROM fp f JOIN keep k ON f.fp = k.fp AND f.doc_id = k.keeper_id
),
feat AS (
  SELECT doc_id,
         {TX.sql_lang_id('text')} AS lang,
         {qsel['n_tokens']} AS n_tokens,
         {qsel['quality_score']} AS quality_score
  FROM uniq
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(quality_score AS DECIMAL(18,6))) AS VARCHAR) AS sum_quality
FROM feat
WHERE n_tokens >= {min_tokens} AND quality_score >= {min_quality!r}
GROUP BY lang"""


# ---------------------------------------------------------------------------
# Per-domain accounting
# ---------------------------------------------------------------------------

#: host part of an http(s) URL — identical PCRE in Spark and DuckDB so the
#: grouping key matches byte-for-byte
DOMAIN_RE = "^https?://([^/]+)/"


def domain_stats(pages: DataFrame) -> DataFrame:
    """Per-domain corpus accounting — the crawl-side rollup an LLM data
    pipeline runs before domain-level sampling/filtering (the analogue of
    the reference's per-folder counts, FV/PathInfo.cs:459 dir totals):
    (domain, n_pages, n_langs, total_tokens, n_unique_texts).

    Domain extraction is a codegen'd regexp on the url column; the whole
    operator is one hash-agg keyed on domain. The two exact DISTINCT
    aggregates share the Expand-based multi-distinct plan Spark generates
    (2x row inflation pre-shuffle, still partial-aggregated); at 100 TB
    swap them for approx_count_distinct if a 2% error is acceptable —
    the exact form is kept here because the oracle must hash-match."""
    return (
        pages.select(
            F.regexp_extract(F.col("url"), DOMAIN_RE, 1).alias("domain"),
            "lang",
            TX.token_count(F.col("text")).alias("n_tokens"),
            F.upper(F.sha2(F.col("text"), 256)).alias("text_sha256"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.count_distinct(F.col("lang")).alias("n_langs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.count_distinct(F.col("text_sha256")).alias("n_unique_texts"),
        )
    )


def domain_quantiles(pages: DataFrame) -> DataFrame:
    """Per-domain EXACT doc-length order statistics
    ``(domain, n_pages, p50_len, p90_len, p99_len, max_len)`` — the
    distribution shape a per-domain quality/sampling policy reads (the
    reference's closest analogue is the per-folder rollup,
    FV/PathInfo.cs:459; quantiles are the webtext upgrade of counts).

    Exact, not approx: percentile_approx would not hash-match an oracle
    and its error is unbounded on adversarial distributions. The trick
    that keeps EXACT affordable at 100 TB is aggregating BEFORE sorting:
    phase 1 is a hash-groupBy on (domain, len) — so the per-domain
    window in phase 2 sorts DISTINCT lengths (bounded by the length
    range, thousands), never the domain's raw rows (possibly billions
    for a giant host). The quantile index is pure integer arithmetic
    (``(n-1)*q_num div q_den + 1`` — the 1-based lower-discrete rank),
    so both engines pick the identical element; no float rounding.
    """
    from pyspark.sql.window import Window

    g = (
        pages.select(
            F.regexp_extract(F.col("url"), DOMAIN_RE, 1).alias("domain"),
            F.length("text").cast("bigint").alias("len"),
        )
        .groupBy("domain", "len")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = F.sum("cnt").over(Window.partitionBy("domain").orderBy("len"))
    n = F.sum("cnt").over(Window.partitionBy("domain"))
    c = g.select("domain", "len", cum.alias("cum"), n.alias("n"))

    def pick(q_num: int, q_den: int) -> F.Column:
        k = F.expr(f"(n - 1) * {q_num} div {q_den}") + 1
        return F.min(F.when(F.col("cum") >= k, F.col("len")))

    return c.groupBy("domain").agg(
        F.max("n").cast("bigint").alias("n_pages"),
        pick(1, 2).alias("p50_len"),
        pick(9, 10).alias("p90_len"),
        pick(99, 100).alias("p99_len"),
        F.max("len").alias("max_len"),
    )


def sql_domain_quantiles(pages_rel: str = "pages") -> str:
    """Oracle: identical two-phase rank arithmetic (integer div)."""

    def pick(q_num: int, q_den: int, alias: str) -> str:
        return (
            f"min(CASE WHEN cum >= (n - 1) * {q_num} // {q_den} + 1 "
            f"THEN len END) AS {alias}"
        )

    return f"""SELECT domain,
       CAST(max(n) AS BIGINT) AS n_pages,
       {pick(1, 2, 'p50_len')},
       {pick(9, 10, 'p90_len')},
       {pick(99, 100, 'p99_len')},
       max(len) AS max_len
FROM (
  SELECT domain, len,
         sum(cnt) OVER (PARTITION BY domain ORDER BY len) AS cum,
         sum(cnt) OVER (PARTITION BY domain) AS n
  FROM (SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
               CAST(length(text) AS BIGINT) AS len,
               count(*) AS cnt
        FROM {pages_rel} GROUP BY 1, 2) g) c
GROUP BY domain"""


def vocab_topk(docs: DataFrame, k: int = 100) -> DataFrame:
    """Corpus vocabulary heavy hitters — the statistic a tokenizer-
    training / vocab-estimation pass needs: for the top-``k`` tokens by
    total occurrences, (token, n_occurrences, n_docs, rank) with a
    deterministic tie-break (count DESC, token ASC).

    Plan shape: explode is the irreducible cost of token counting; the
    distinct-doc count is computed as a two-level aggregate
    (token, doc_id) -> token rather than count(DISTINCT), so BOTH levels
    partial-aggregate map-side and no Expand row-doubling is generated.
    The final top-k is a single-partition WindowGroupLimit over |vocab|
    rows — vocabulary is sublinear in corpus size, so this stays small
    even at 100 TB (and rank-pushdown truncates each shuffle side to k)."""
    from pyspark.sql import Window

    per_doc = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
        )
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per_doc.groupBy("token").agg(
        F.sum("c").cast("bigint").alias("n_occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
    )


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, n_docs: int | None = None
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms — the relevance statistic a
    corpus-exploration / keyword-extraction pass needs:
    (doc_id, term, tf, df, score) with score = tf * (ln((N+1)/(df+1)) + 1)
    (the smoothed-idf variant, e.g. scikit-learn's public formula).

    Plan shape: explode -> (doc,term) hash-agg for tf -> term hash-agg
    for df -> tf⋈df equi-join on term. The term key is Zipf-skewed by
    construction (the join's hot keys are exactly the high-df terms);
    both aggregates partial-aggregate map-side and the join is left to
    AQE's skew splitter rather than hand-salting, because the hot side
    is 1-row-per-term after aggregation — skew exists only in the tf
    side's key distribution, which AQE splits. Ranking is per-doc
    WindowGroupLimit (shuffle truncated to k per doc).

    Cross-engine determinism: ranks order by the ROUNDED score (4 dp)
    each engine computes itself, tie-broken on term; ln() may differ by
    1 ulp between Java and libm, but a flip requires the pre-rounding
    values to straddle a 5e-5 quantum boundary within ~1e-16 — measured
    zero occurrences, same acceptance as knn_geodesic's rounding."""
    from pyspark.sql import Window

    n = docs.count() if n_docs is None else n_docs
    tf = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    scored = tf.join(df_, "term").withColumn(
        "score",
        F.round(
            F.col("tf")
            * (
                F.log(
                    F.lit(float(n + 1))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            ),
            4,
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "term", "tf", "df", "score")
    )


def sql_tfidf_top_terms(docs_rel: str = "documents", k: int = 3) -> str:
    """Oracle: identical formula, rounding, and rank tie-break."""
    toks = TX.sql_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS term FROM {docs_rel}),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM t GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS nn FROM {docs_rel}),
scored AS (
  SELECT doc_id, term, tf, df,
         round(tf * (ln((nn + 1.0) / (df + 1.0)) + 1.0), 4) AS score
  FROM tf JOIN dfx USING (term) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER
    (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
  FROM scored
)
SELECT doc_id, term, tf, df, score FROM r WHERE rn <= {k}"""


def sql_vocab_topk(docs_rel: str = "documents", k: int = 100) -> str:
    """Oracle: identical two-level aggregate + deterministic rank."""
    toks = TX.sql_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM {docs_rel}),
per AS (SELECT token, doc_id, count(*) AS c FROM t GROUP BY 1, 2),
agg AS (
  SELECT token,
         CAST(sum(c) AS BIGINT) AS n_occurrences,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM per GROUP BY token
),
r AS (
  SELECT *, CAST(row_number() OVER
           (ORDER BY n_occurrences DESC, token ASC) AS BIGINT) AS rank
  FROM agg
)
SELECT token, n_occurrences, n_docs, rank FROM r WHERE rank <= {k}"""


def sql_domain_stats(pages_rel: str = "pages") -> str:
    """Oracle: identical regexp + exact distinct aggregates."""
    toks = TX.sql_tokens("text")
    return f"""
SELECT regexp_extract(url, '{DOMAIN_RE}', 1) AS domain,
       count(*) AS n_pages,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(len({toks})) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT upper(sha256(text))) AS BIGINT) AS n_unique_texts
FROM {pages_rel}
GROUP BY 1"""


# ---------------------------------------------------------------------------
# Robots-style URL prefix filtering
# ---------------------------------------------------------------------------

#: host of an absolute http(s) URL (no trailing-slash requirement) and the
#: path-and-after remainder — identical PCRE both engines
ROBOTS_HOST_RE = "^https?://([^/?#]+)"


def robots_filter(pages: DataFrame, rules: DataFrame) -> DataFrame:
    """Pages NOT blocked by a robots-style disallow rule set.

    ``rules(host STRING, path_prefix STRING)`` — a page is blocked when
    its URL host equals a rule's host AND the part after the host
    starts with the rule's path prefix (robots.txt ``Disallow:``
    semantics per host, prefix match on the path; no Allow overrides —
    the common crawl-pipeline subset).

    Reference parity: this is the reference's exclusion engine
    (FV/Configuration/Settings.cs exclusions; folders cascade over the
    full path — config.Exclusions) applied to URL space: host == the
    "folder" scope, path prefix == the cascading subtree rule.

    Scale: the rule set is a crawl policy (thousands of rows) —
    broadcast LEFT ANTI join; the non-equi prefix test rides on the
    host equi-key, so every page is checked against only its own
    host's rules. Zero shuffle of the pages side.
    """
    r = F.broadcast(
        rules.select(
            F.col("host").alias("r_host"),
            F.col("path_prefix").alias("r_prefix"),
        )
    )
    host = F.regexp_extract(F.col("url"), ROBOTS_HOST_RE, 1)
    path = F.regexp_replace(F.col("url"), ROBOTS_HOST_RE, "")
    cond = (host == F.col("r_host")) & path.startswith(F.col("r_prefix"))
    return pages.join(r, cond, "left_anti")


def sql_robots_filter(
    pages_rel: str, rules_values: str, select: str = "doc_id, url"
) -> str:
    """DuckDB mirror: NOT EXISTS over a VALUES rule list (bare SELECT)."""
    return f"""SELECT {select} FROM {pages_rel} p
WHERE NOT EXISTS (
  SELECT 1 FROM (VALUES {rules_values}) r(host, path_prefix)
  WHERE regexp_extract(p.url, '{ROBOTS_HOST_RE}', 1) = r.host
    AND starts_with(regexp_replace(p.url, '{ROBOTS_HOST_RE}', ''),
                    r.path_prefix))"""


# ---------------------------------------------------------------------------
# Per-host boilerplate (template) detection
# ---------------------------------------------------------------------------

def boilerplate_paras(
    pages: DataFrame,
    min_pct: int = 50,
    sep: str = "\n\n",
    min_host_pages: int = 2,
) -> DataFrame:
    """Template paragraphs per host: paragraphs occurring on at least
    ``min_pct`` % of a host's pages — ``(host, para_sha256, n_pages,
    host_pages)``. This is the detection half of main-content
    extraction (nav bars / footers repeat across a site; document text
    doesn't), the step between WET extraction and dedup in a crawl
    pipeline. Hosts with fewer than ``min_host_pages`` pages are exempt
    — on a single-page host EVERY paragraph trivially hits 100% and the
    page would lose all its content.

    Scale shape: explode paragraphs -> distinct (host, para, url) ->
    per-(host, para) count and per-host page count, joined on host; the
    threshold compares n_para * 100 >= min_pct * host_pages in exact
    integers (no float ratio, no canon). Paragraphs travel as sha256
    fingerprints so shuffle rows are fixed-width — the reference keys
    content by hash the same way (FV/HashInfo.cs).
    """
    host = F.regexp_extract(F.col("url"), "^https?://([^/?#]+)", 1)
    paras = (
        pages.select(host.alias("host"), "url", "text")
        .select(
            "host",
            "url",
            F.explode(F.split(F.col("text"), sep)).alias("para"),
        )
        .where(F.trim(F.col("para")) != "")
        .select(
            "host", "url", F.upper(F.sha2(F.col("para"), 256)).alias("ph")
        )
        .distinct()
    )
    per_para = paras.groupBy("host", "ph").agg(
        F.count(F.lit(1)).cast("long").alias("n_pages")
    )
    # host page counts over ALL pages (not just pages with non-empty
    # paragraphs) — keeps the denominator meaningful and matches the SQL
    # mirror exactly
    per_host = (
        pages.select(host.alias("host"), "url")
        .distinct()
        .groupBy("host")
        .agg(F.count(F.lit(1)).cast("long").alias("host_pages"))
    )
    return (
        per_para.join(per_host, "host")
        .where(F.col("host_pages") >= min_host_pages)
        .where(F.col("n_pages") * 100 >= F.lit(min_pct) * F.col("host_pages"))
        .select(
            "host",
            F.col("ph").alias("para_sha256"),
            "n_pages",
            "host_pages",
        )
    )


def sql_boilerplate_paras(
    pages_rel: str, min_pct: int = 50, sep: str = "\n\n",
    min_host_pages: int = 2,
) -> str:
    """DuckDB mirror (bare SELECT). string_split on the same separator;
    chr(10)-composed to avoid literal newlines in the SQL text."""
    sep_expr = "chr(10) || chr(10)" if sep == "\n\n" else f"'{sep}'"
    return f"""SELECT p.host, p.ph AS para_sha256,
       p.n_pages, h.host_pages
FROM (
  SELECT host, ph, CAST(count(*) AS BIGINT) AS n_pages
  FROM (SELECT DISTINCT host, url, upper(sha256(para)) AS ph
        FROM (SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
                     url, unnest(string_split(text, {sep_expr})) AS para
              FROM {pages_rel})
        WHERE trim(para) <> '') GROUP BY host, ph) p
JOIN (
  SELECT host, CAST(count(DISTINCT url) AS BIGINT) AS host_pages
  FROM (SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host, url
        FROM {pages_rel}) GROUP BY host) h
  ON p.host = h.host
WHERE h.host_pages >= {min_host_pages}
  AND p.n_pages * 100 >= {min_pct} * h.host_pages"""


def remove_boilerplate(
    pages: DataFrame, min_pct: int = 50, sep: str = "\n\n",
    min_host_pages: int = 2,
) -> DataFrame:
    """Main-content extraction — the APPLY half of
    :func:`boilerplate_paras`: strip each host's template paragraphs
    and reassemble the survivors in original order. Returns
    ``(url, clean_text, n_paras, n_kept)`` for every page (a page whose
    every paragraph is template keeps an empty ``clean_text``).

    Same reassembly discipline as ``dedup.paragraph_dedup`` (posexplode
    -> anti join on the (host, fingerprint) key -> min-struct ordered
    concat); empty/whitespace paragraphs are dropped before counting,
    so ``n_paras`` counts content paragraphs only."""
    host = F.regexp_extract(F.col("url"), "^https?://([^/?#]+)", 1)
    bp = boilerplate_paras(pages, min_pct, sep, min_host_pages).select(
        F.col("host").alias("b_host"), F.col("para_sha256").alias("b_ph")
    )
    paras = (
        pages.select(
            host.alias("host"),
            "url",
            F.posexplode(F.split(F.col("text"), sep)).alias("idx", "para"),
        )
        .where(F.trim(F.col("para")) != "")
        .withColumn("ph", F.upper(F.sha2(F.col("para"), 256)))
    )
    kept = paras.join(
        bp,
        (paras["host"] == bp["b_host"]) & (paras["ph"] == bp["b_ph"]),
        "left_anti",
    )
    n_all = paras.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_paras")
    )
    n_kept = kept.groupBy("url").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("idx", "para"))),
                lambda x: x["para"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    z = F.lit(0).cast("long")
    return (
        pages.select("url")
        .distinct()
        .join(n_all, "url", "left")
        .join(n_kept, "url", "left")
        .select(
            "url",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_paras", z).alias("n_paras"),
            F.coalesce("n_kept", z).alias("n_kept"),
        )
    )


def sql_remove_boilerplate(
    pages_rel: str, min_pct: int = 50, sep: str = "\n\n",
    min_host_pages: int = 2,
) -> str:
    """DuckDB mirror: LATERAL positional split + NOT EXISTS vs the
    boilerplate relation + ordered string_agg (standalone WITH)."""
    sep_expr = "chr(10) || chr(10)" if sep == "\n\n" else f"'{sep}'"
    bp = sql_boilerplate_paras(pages_rel, min_pct, sep, min_host_pages)
    return f"""WITH pp AS (
  SELECT url, host, i AS idx, ps[i] AS para
  FROM (SELECT url, regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
               string_split(text, {sep_expr}) AS ps
        FROM {pages_rel}),
       LATERAL (SELECT unnest(range(1, len(ps) + 1)) AS i) t
  WHERE trim(ps[i]) <> ''
),
bp AS ({bp}),
kept AS (
  SELECT pp.* FROM pp
  WHERE NOT EXISTS (SELECT 1 FROM bp
                    WHERE bp.host = pp.host
                      AND bp.para_sha256 = upper(sha256(pp.para)))
),
n_all AS (SELECT url, CAST(count(*) AS BIGINT) AS n_paras
          FROM pp GROUP BY url),
n_kept AS (SELECT url,
                  string_agg(para, {sep_expr} ORDER BY idx) AS clean_text,
                  CAST(count(*) AS BIGINT) AS n_kept
           FROM kept GROUP BY url)
SELECT b.url,
       COALESCE(k.clean_text, '') AS clean_text,
       COALESCE(a.n_paras, 0) AS n_paras,
       COALESCE(k.n_kept, 0) AS n_kept
FROM (SELECT DISTINCT url FROM {pages_rel}) b
LEFT JOIN n_all a ON b.url = a.url
LEFT JOIN n_kept k ON b.url = k.url"""


# ---------------------------------------------------------------------------
# Collocation extraction (PMI over adjacent bigrams)
# ---------------------------------------------------------------------------

def collocations_topk(
    docs: DataFrame, k: int = 20, min_count: int = 5
) -> DataFrame:
    """Top-``k`` adjacent-token collocations by PMI:
    ``(a, b, n_ab, score, rank)`` with
    ``score = round(ln(P(ab) / (P(a)·P(b))), 4)``.

    Float canon (BENCH/BASELINE.md discipline): the PMI expression is
    spelled with the IDENTICAL operand order in both engines (IEEE ops
    are deterministic given an order), rounded to 4 dp, and ranked on
    the ROUNDED value with an (a, b) tie-break — so Spark and DuckDB
    produce the same rows in the same rank order.

    Scale shape: bigrams come from a plan-time slice+zip over the token
    array (no self-join); bigram and unigram counts are two
    partial-aggregatable hash-aggs; the corpus scalars (T tokens,
    B bigrams) are 1-row broadcasts; ``min_count`` prunes the long tail
    before the single-partition top-k window (collocation candidates
    above a count floor are vocabulary-sized, not corpus-sized)."""
    tk = docs.select(TX.tokens(F.col("text")).alias("tk"))
    bigrams = tk.select(
        F.explode(
            F.expr(
                "transform(slice(tk, 1, greatest(size(tk)-1, 0)),"
                " (x, i) -> struct(x AS a, tk[i+1] AS b))"
            )
        ).alias("bg")
    ).select("bg.a", "bg.b")
    unigrams = tk.select(F.explode("tk").alias("t"))
    n_ab = bigrams.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab")
    )
    n_t = unigrams.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("n_t")
    )
    # tot_* names: Spark resolves identifiers case-insensitively, so a
    # column named "B" would collide with the bigram token column "b"
    totals = (
        unigrams.agg(F.count(F.lit(1)).cast("long").alias("tot_t"))
        .crossJoin(
            bigrams.agg(F.count(F.lit(1)).cast("long").alias("tot_b"))
        )
    )
    na = n_t.select(F.col("t").alias("ta"), F.col("n_t").alias("n_a"))
    nb = n_t.select(F.col("t").alias("tb"), F.col("n_t").alias("n_b"))
    cand = (
        n_ab.where(F.col("n_ab") >= min_count)
        .join(na, F.col("a") == F.col("ta"))
        .join(nb, F.col("b") == F.col("tb"))
        .crossJoin(F.broadcast(totals))
    )
    score = F.round(
        F.log(
            (F.col("n_ab").cast("double") * F.col("tot_t") * F.col("tot_t"))
            / (F.col("tot_b").cast("double") * F.col("n_a") * F.col("n_b"))
        ),
        4,
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("score"), F.asc("a"), F.asc("b"))
    return (
        cand.select("a", "b", "n_ab", score.alias("score"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def sql_collocations_topk(
    docs_rel: str = "documents", k: int = 20, min_count: int = 5
) -> str:
    """DuckDB mirror: parallel lockstep unnest of the two slice views
    builds the bigrams; identical PMI operand order (standalone WITH)."""
    toks = TX.sql_tokens("text")
    return f"""WITH tk AS (SELECT {toks} AS tk FROM {docs_rel}),
bigrams AS (
  SELECT unnest(tk[1:len(tk)-1]) AS a, unnest(tk[2:len(tk)]) AS b
  FROM tk WHERE len(tk) >= 2
),
unigrams AS (SELECT unnest(tk) AS t FROM tk),
n_ab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
         FROM bigrams GROUP BY a, b),
n_t AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t
        FROM unigrams GROUP BY t),
totals AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM unigrams) AS tot_t,
                  (SELECT CAST(count(*) AS BIGINT) FROM bigrams) AS tot_b),
cand AS (
  SELECT c.a, c.b, c.n_ab,
         round(ln((CAST(c.n_ab AS DOUBLE) * t.tot_t * t.tot_t)
                  / (CAST(t.tot_b AS DOUBLE) * na.n_t * nb.n_t)), 4) AS score
  FROM n_ab c
  JOIN n_t na ON na.t = c.a
  JOIN n_t nb ON nb.t = c.b
  CROSS JOIN totals t
  WHERE c.n_ab >= {min_count}
)
SELECT a, b, n_ab, score, rank FROM (
  SELECT *, CAST(row_number() OVER
       (ORDER BY score DESC, a ASC, b ASC) AS BIGINT) AS rank
  FROM cand)
WHERE rank <= {k}"""


# ---------------------------------------------------------------------------
# C4-style line-level quality filtering (Raffel et al. 2020, §2.2)
# ---------------------------------------------------------------------------

#: a kept line ends in terminal punctuation (period, !, ?, end quote)
C4_LINE_END_RE = r'[.!?"]$'
#: C4's per-line word minimum (whitespace-delimited)
C4_MIN_WORDS = 5
#: pages need at least this many surviving lines ("3 sentences")
C4_MIN_LINES = 3


def c4_clean(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4's line-level cleaning as one zero-shuffle projection:
    ``(doc_id, clean_text, n_kept, n_dropped, page_ok)``.

    Kept lines: end in terminal punctuation (trimmed), have >=
    :data:`C4_MIN_WORDS` whitespace words, and don't mention
    "javascript" (ci). ``page_ok`` additionally applies the page-level
    rules — no curly brace (code), no "lorem ipsum" (ci), and >=
    :data:`C4_MIN_LINES` surviving lines. Everything is array
    higher-order functions over the line split (filter/size/
    array_join) — no explode, no shuffle; the caller drops
    ``NOT page_ok`` rows and keeps ``clean_text``.
    """
    lines = F.split(F.col(text_col), "\n")

    def _keep(line):
        t = F.trim(line)
        return (
            t.rlike(C4_LINE_END_RE)
            & (
                F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
                >= C4_MIN_WORDS
            )
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, _keep)
    n_kept = F.size(kept).cast("long")
    low = F.lower(F.col(text_col))
    return docs.select(
        "doc_id",
        F.array_join(kept, "\n").alias("clean_text"),
        n_kept.alias("n_kept"),
        (F.size(lines).cast("long") - n_kept).alias("n_dropped"),
        (
            ~low.contains("{")
            & ~low.contains("lorem ipsum")
            & (n_kept >= C4_MIN_LINES)
        ).alias("page_ok"),
    )


def sql_c4_clean(docs_rel: str = "documents", text_col: str = "text") -> str:
    """DuckDB mirror (bare SELECT; COALESCE because array_to_string of
    an empty DuckDB list is NULL, not '')."""
    keep = (
        f"l -> regexp_matches(trim(l), '{C4_LINE_END_RE}')"
        f" AND len(regexp_extract_all(trim(l), '\\S+')) >= {C4_MIN_WORDS}"
        f" AND NOT contains(lower(l), 'javascript')"
    )
    kept = f"list_filter(string_split({text_col}, chr(10)), {keep})"
    return f"""SELECT doc_id,
  COALESCE(array_to_string({kept}, chr(10)), '') AS clean_text,
  CAST(len({kept}) AS BIGINT) AS n_kept,
  CAST(len(string_split({text_col}, chr(10))) - len({kept}) AS BIGINT)
    AS n_dropped,
  (NOT contains(lower({text_col}), '{{')
   AND NOT contains(lower({text_col}), 'lorem ipsum')
   AND len({kept}) >= {C4_MIN_LINES}) AS page_ok
FROM {docs_rel}"""


# ---------------------------------------------------------------------------
# Integer unigram surprisal — perplexity-style quality scoring, float-free
# ---------------------------------------------------------------------------


def unigram_surprisal(docs: DataFrame) -> DataFrame:
    """Per-document unigram self-information in EXACT integer bits — the
    CCNet/Wikipedia-LM perplexity-filter signal (Wenzek et al. 2020)
    re-expressed so Spark and DuckDB agree bit-for-bit: each token
    occurrence contributes ``floor(log2(N div c))`` bits (N = corpus
    token occurrences, c = the token's occurrences; the integer log2 is
    ``length(bin(x)) - 1``, the length_hist idiom — within 1 bit of the
    real surprisal, which a threshold filter can't tell apart). Rare
    tokens are high-surprisal; a doc of them (gibberish, boilerplate
    soup) scores high mean bits, templated text scores low — the same
    tails a float LM filter cuts.

    Output per doc with >= 1 token: (doc_id, n_tokens, surprisal_bits,
    mean_millibits = 1000*bits div tokens) — all BIGINT.

    Plan: explode -> (doc, token) hash-agg (the join input shrinks from
    occurrences to distinct pairs) -> token-totals hash-agg (|vocab|
    rows) + 1-row N broadcast -> equi-join back (Zipf-hot term keys:
    1 row per term on the build side, AQE splits the probe skew, the
    vocab_topk/tfidf discipline) -> per-doc sum. Three partial-agg
    shuffles + one join; no windows, no floats."""
    per_dt = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("token")
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_dt"))
    )
    totals = per_dt.groupBy("token").agg(
        F.sum("c_dt").cast("long").alias("c_tok")
    )
    n_total = totals.select(F.sum("c_tok").cast("long").alias("n_corpus"))
    # `div` is true BIGINT division (DuckDB //) — `/` would detour
    # through a double and cast-truncate, inexact past 2^53
    bits = (
        F.length(F.bin(F.expr("n_corpus div c_tok"))) - F.lit(1)
    ).cast("long")
    scored = totals.crossJoin(F.broadcast(n_total)).select(
        "token", bits.alias("bits")
    )
    per_doc = (
        per_dt.join(scored, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("c_dt").cast("long").alias("n_tokens"),
            F.sum(F.col("c_dt") * F.col("bits")).cast("long").alias(
                "surprisal_bits"
            ),
        )
    )
    mean = F.expr("(1000 * surprisal_bits) div n_tokens").cast("long")
    return per_doc.select(
        "doc_id", "n_tokens", "surprisal_bits", mean.alias("mean_millibits")
    )


def sql_unigram_surprisal(docs_rel: str = "documents") -> str:
    """Oracle for :func:`unigram_surprisal` (same integer-log2 chain)."""
    toks = TX.sql_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, unnest({toks}) AS token FROM {docs_rel}),
per_dt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c_dt
           FROM t GROUP BY 1, 2),
totals AS (SELECT token, CAST(sum(c_dt) AS BIGINT) AS c_tok
           FROM per_dt GROUP BY 1),
n AS (SELECT CAST(sum(c_tok) AS BIGINT) AS n_corpus FROM totals),
scored AS (
  SELECT token,
         CAST(length(bin(n_corpus // c_tok)) - 1 AS BIGINT) AS bits
  FROM totals, n)
SELECT d.doc_id,
       CAST(sum(d.c_dt) AS BIGINT) AS n_tokens,
       CAST(sum(d.c_dt * s.bits) AS BIGINT) AS surprisal_bits,
       CAST(1000 * sum(d.c_dt * s.bits) // sum(d.c_dt) AS BIGINT)
         AS mean_millibits
FROM per_dt d JOIN scored s ON s.token = d.token
GROUP BY d.doc_id"""


# ---------------------------------------------------------------------------
# Crawl-trap detection — per-host URL-template diversity audit
# ---------------------------------------------------------------------------

def crawl_traps(
    pages: DataFrame,
    min_pages: int = 15,
    max_ratio_milli: int = 220,
    min_top_share_milli: int = 360,
) -> DataFrame:
    """Per-host crawl-trap audit: hosts that emit MANY URLs from FEW
    URL templates (calendars, session-id mazes, faceted-search grids —
    the classic infinite-URL-space traps every production crawler
    budget-caps; cf. the public Heritrix/Nutch trap heuristics).

    Template canon: the URL path with every digit run collapsed to
    ``D`` (``/2024/01/page17`` -> ``/D/D/pageD``) — the same
    digits-are-instance-ids reading the CDX/capture interop uses.

    Returns ``(host, n_pages, n_templates, top_template_n,
    template_ratio_milli, top_share_milli, trap)`` where
    ``template_ratio_milli = 1000 * n_templates div n_pages``,
    ``top_share_milli = 1000 * top_template_n div n_pages``, and
    ``trap = n_pages >= min_pages AND ratio <= max_ratio_milli AND
    top_share >= min_top_share_milli`` (many pages, little template
    diversity, one template dominating — the calendar/session-maze
    signature).

    Scale shape: two partial-aggregatable hash-aggs — (host, template)
    then host; both key spaces are bounded by the crawl's host/template
    universe, never by page count in flight (map-side combine absorbs
    the per-template fan-in). No window over the page log, nothing
    collects.
    """
    host = F.regexp_extract(F.col("url"), "^https?://([^/?#]+)", 1)
    path = F.regexp_extract(F.col("url"), "^https?://[^/?#]*([^?#]*)", 1)
    template = F.regexp_replace(path, "[0-9]+", "D")
    per_template = (
        pages.select(host.alias("host"), template.alias("template"))
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    out = per_template.groupBy("host").agg(
        F.sum("n").cast("long").alias("n_pages"),
        F.count(F.lit(1)).cast("long").alias("n_templates"),
        F.max("n").cast("long").alias("top_template_n"),
    )
    ratio = F.expr("CAST(1000 * n_templates div n_pages AS BIGINT)")
    top_share = F.expr("CAST(1000 * top_template_n div n_pages AS BIGINT)")
    return out.select(
        "host",
        "n_pages",
        "n_templates",
        "top_template_n",
        ratio.alias("template_ratio_milli"),
        top_share.alias("top_share_milli"),
        (
            (F.col("n_pages") >= min_pages)
            & (ratio <= max_ratio_milli)
            & (top_share >= min_top_share_milli)
        ).alias("trap"),
    )


def sql_crawl_traps(
    pages_rel: str = "pages",
    min_pages: int = 15,
    max_ratio_milli: int = 220,
    min_top_share_milli: int = 360,
) -> str:
    """DuckDB mirror of :func:`crawl_traps` (integer // == Spark div)."""
    return f"""
SELECT host, n_pages, n_templates, top_template_n,
       CAST(1000 * n_templates // n_pages AS BIGINT) AS template_ratio_milli,
       CAST(1000 * top_template_n // n_pages AS BIGINT) AS top_share_milli,
       (n_pages >= {min_pages}
        AND 1000 * n_templates // n_pages <= {max_ratio_milli}
        AND 1000 * top_template_n // n_pages >= {min_top_share_milli}) AS trap
FROM (
  SELECT host, CAST(sum(n) AS BIGINT) AS n_pages,
         CAST(count(*) AS BIGINT) AS n_templates,
         CAST(max(n) AS BIGINT) AS top_template_n
  FROM (
    SELECT regexp_extract(url, '^https?://([^/?#]+)', 1) AS host,
           regexp_replace(regexp_extract(url, '^https?://[^/?#]*([^?#]*)', 1),
                          '[0-9]+', 'D', 'g') AS template,
           CAST(count(*) AS BIGINT) AS n
    FROM {pages_rel}
    GROUP BY 1, 2) t
  GROUP BY host) h"""


# ---------------------------------------------------------------------------
# Kneser-Ney bigram sufficient statistics (distributed LM counting)
# ---------------------------------------------------------------------------


def kn_bigram_stats(docs: DataFrame, min_count: int = 5) -> DataFrame:
    """(w1, w2, c, cont_w2, foll_w1, c_w1) — the exact-integer
    sufficient statistics of interpolated Kneser-Ney smoothing over
    corpus bigrams (Kneser & Ney 1995; the distributed-counting shape
    is Brants et al. 2007, "Large Language Models in Machine
    Translation"):

    - ``c``        raw bigram count c(w1 w2)
    - ``cont_w2``  continuation count N1+(. w2) — distinct LEFT contexts
                   of w2, the KN unigram numerator
    - ``foll_w1``  N1+(w1 .) — distinct continuations of w1, the
                   back-off weight numerator
    - ``c_w1``     left-unigram count (the denominator)

    Every KN probability is a ratio of these integers (with the fixed
    discount), so emitting the statistics rather than float
    probabilities keeps the relation engine-exact AND mergeable —
    shard counts add, distincts re-aggregate.

    Output is bounded to bigrams with ``c >= min_count`` (tail bigrams
    carry no trainable signal; the cutoff is what Brants et al. apply
    before serving).

    Scale shape: ONE explode of adjacent token pairs (codegen'd
    element_at projection, ~len rows/doc) feeding THREE
    partial-aggregatable hash-aggs — bigram counts, then the two
    word-keyed distinct rollups computed FROM the bigram relation
    (vocab-sized, not corpus-sized) — joined back on word keys. No
    windows, no collects; Zipf skew lands on the word-keyed aggs whose
    input is the already-aggregated bigram table."""
    toks = TX.tokens(F.col("text"))
    pairs = docs.select(toks.alias("t")).select(
        F.explode(
            F.when(
                F.size("t") < 2,
                F.array().cast("array<struct<w1:string,w2:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("t"), i.cast("int")).alias("w1"),
                        F.element_at(F.col("t"), (i + 1).cast("int")).alias("w2"),
                    ),
                )
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    cont = bigrams.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("cont_w2")
    )
    foll = bigrams.groupBy("w1").agg(
        F.count(F.lit(1)).cast("bigint").alias("foll_w1"),
        F.sum("c").cast("bigint").alias("c_w1"),
    )
    return (
        bigrams.where(F.col("c") >= min_count)
        .join(cont, "w2")
        .join(foll, "w1")
        .select("w1", "w2", "c", "cont_w2", "foll_w1", "c_w1")
    )


def sql_kn_bigram_stats(docs_rel: str = "documents", min_count: int = 5) -> str:
    """Oracle: identical pair explode and three-agg shape."""
    toks = TX.sql_tokens("text")
    return f"""
WITH t AS (SELECT {toks} AS t FROM {docs_rel}),
pairs AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) p
  WHERE len(t) >= 2
),
bigrams AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
            FROM pairs GROUP BY 1, 2),
cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS cont_w2
         FROM bigrams GROUP BY 1),
foll AS (SELECT w1, CAST(count(*) AS BIGINT) AS foll_w1,
                CAST(sum(c) AS BIGINT) AS c_w1
         FROM bigrams GROUP BY 1)
SELECT w1, w2, c, cont_w2, foll_w1, c_w1
FROM bigrams JOIN cont USING (w2) JOIN foll USING (w1)
WHERE c >= {min_count}"""


def bigram_surprisal(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """Per-document bigram self-information in EXACT integer bits — the
    second-order companion of :func:`unigram_surprisal` (same CCNet-
    style LM-filter use, same float-free canon): each in-vocabulary
    bigram occurrence contributes ``floor(log2(c_w1 div c))`` bits (the
    ML conditional probability c/c_w1 inverted, integer log2 via
    ``length(bin(x)) - 1``), out-of-vocabulary bigrams (dropped by the
    ``min_count`` cutoff) are COUNTED but not scored — (doc_id,
    n_bigrams, known_bigrams, surprisal_bits, mean_millibits) with
    mean over the known mass only, all BIGINT.

    Templated/boilerplate text repeats high-probability bigrams (low
    bits); disfluent or shuffled text that sneaks past a unigram filter
    scores high here — the reason CCNet uses an LM, not a lexicon.

    Scale shape: ONE adjacent-pair explode -> (doc, w1, w2) hash-agg
    (occurrences collapse to distinct per-doc bigrams before the join)
    -> equi-join against the vocab-sized :func:`kn_bigram_stats`
    relation on (w1, w2) — Zipf-hot bigram keys have 1 build-side row
    each, AQE splits probe skew — -> per-doc sum. No windows, no
    floats, no collects."""
    toks = TX.tokens(F.col("text"))
    pairs = docs.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(toks) < 2,
                F.array().cast("array<struct<w1:string,w2:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 1),
                    lambda i: F.struct(
                        F.element_at(toks, i.cast("int")).alias("w1"),
                        F.element_at(toks, (i + 1).cast("int")).alias("w2"),
                    ),
                )
            )
        ).alias("bg"),
    ).select("doc_id", "bg.w1", "bg.w2")
    per_doc_bg = pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    stats = kn_bigram_stats(docs, min_count=min_count).select(
        "w1",
        "w2",
        (F.length(F.bin(F.expr("c_w1 div c"))) - F.lit(1))
        .cast("bigint")
        .alias("bits"),
    )
    scored = per_doc_bg.join(stats, ["w1", "w2"], "left")
    per_doc = scored.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_bigrams"),
        F.sum(F.when(F.col("bits").isNotNull(), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("known_bigrams"),
        F.sum(F.coalesce(F.col("n") * F.col("bits"), F.lit(0)))
        .cast("bigint")
        .alias("surprisal_bits"),
    )
    mean = (
        F.when(
            F.col("known_bigrams") > 0,
            F.expr("(1000 * surprisal_bits) div known_bigrams"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return per_doc.select(
        "doc_id",
        "n_bigrams",
        "known_bigrams",
        "surprisal_bits",
        mean.alias("mean_millibits"),
    )


def sql_bigram_surprisal(
    docs_rel: str = "documents", min_count: int = 1
) -> str:
    """Oracle for :func:`bigram_surprisal` (same pair explode, same
    integer-log2 chain, same OOV handling)."""
    toks = TX.sql_tokens("text")
    return f"""
WITH t AS (SELECT doc_id, {toks} AS t FROM {docs_rel}),
dpairs AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM t, LATERAL (SELECT unnest(range(1, len(t))) AS i) p
  WHERE len(t) >= 2
),
per_doc_bg AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS n
               FROM dpairs GROUP BY 1, 2, 3),
kn AS ({sql_kn_bigram_stats(docs_rel, min_count)}),
stats AS (SELECT w1, w2,
                 CAST(length(bin(c_w1 // c)) - 1 AS BIGINT) AS bits
          FROM kn)
SELECT d.doc_id,
       CAST(sum(d.n) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN s.bits IS NOT NULL THEN d.n ELSE 0 END)
         AS BIGINT) AS known_bigrams,
       CAST(coalesce(sum(d.n * s.bits), 0) AS BIGINT) AS surprisal_bits,
       CAST(CASE WHEN sum(CASE WHEN s.bits IS NOT NULL THEN d.n ELSE 0 END) > 0
                 THEN (1000 * coalesce(sum(d.n * s.bits), 0))
                      // sum(CASE WHEN s.bits IS NOT NULL THEN d.n ELSE 0 END)
                 ELSE 0 END AS BIGINT) AS mean_millibits
FROM per_doc_bg d LEFT JOIN stats s ON d.w1 = s.w1 AND d.w2 = s.w2
GROUP BY d.doc_id"""


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, arXiv:2302.03169)
# ---------------------------------------------------------------------------

def dsir_weights(raw: DataFrame, target: DataFrame) -> DataFrame:
    """Per-page Data Selection with Importance Resampling weights in
    EXACT integer bits: how much more likely is each raw web page under
    the TARGET corpus's unigram LM than under the raw corpus's own —
    the ranking signal DSIR (Xie et al. 2023) resamples pretraining
    data by, realised as the difference of two :func:`unigram_surprisal`
    towers so the whole relation is engine-exact.

    Per token occurrence in the target vocabulary:

        bits_src = floor(log2(N_src div c_src))   (surprisal under raw)
        bits_tgt = floor(log2(N_tgt div c_tgt))   (surprisal under target)

    and the page's log importance weight is ``weight_bits =
    sum(bits_src) - sum(bits_tgt)`` over scored occurrences — positive
    means the page looks more target-like than raw-average (cheap under
    the target LM, expensive under the source LM). Tokens absent from
    the target vocabulary are COUNTED (``n_tokens - n_scored``) but
    unscored, the bigram_surprisal OOV canon; only integer sums are
    emitted (no division), so there is no signed-division floor/trunc
    seam between engines.

    Output: ``(url, n_tokens, n_scored, bits_src, bits_tgt,
    weight_bits)`` — all BIGINT.

    Scale shape: ONE explode of the raw corpus -> (url, token) hash-agg
    (occurrences shrink to distinct pairs before any join), source
    totals re-aggregated FROM that relation (|vocab_src| rows), target
    totals from the target corpus's own explode (|vocab_tgt| rows, a
    curated corpus orders of magnitude smaller than the crawl), each
    with a 1-row N broadcast; two vocab-keyed equi-joins back (build
    side = 1 row per term; AQE splits Zipf-hot probe skew) -> per-url
    sum. No windows, no floats, no collects."""
    per_ut = (
        raw.select("url", F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("url", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_ut"))
    )
    src_tot = per_ut.groupBy("token").agg(
        F.sum("c_ut").cast("long").alias("c_src")
    )
    n_src = src_tot.select(F.sum("c_src").cast("long").alias("n_src"))
    src_bits = (
        F.length(F.bin(F.expr("n_src div c_src"))) - F.lit(1)
    ).cast("long")
    src_scored = src_tot.crossJoin(F.broadcast(n_src)).select(
        "token", src_bits.alias("b_src")
    )
    tgt_tot = (
        target.select(F.explode(TX.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c_tgt"))
    )
    n_tgt = tgt_tot.select(F.sum("c_tgt").cast("long").alias("n_tgt"))
    tgt_bits = (
        F.length(F.bin(F.expr("n_tgt div c_tgt"))) - F.lit(1)
    ).cast("long")
    tgt_scored = tgt_tot.crossJoin(F.broadcast(n_tgt)).select(
        "token", tgt_bits.alias("b_tgt")
    )
    joined = (
        per_ut.join(src_scored, "token")
        .join(tgt_scored, "token", "left")
    )
    scored = F.col("b_tgt").isNotNull()
    zero = F.lit(0).cast("long")
    return (
        joined.groupBy("url")
        .agg(
            F.sum("c_ut").cast("long").alias("n_tokens"),
            F.sum(F.when(scored, F.col("c_ut")).otherwise(zero))
            .cast("long").alias("n_scored"),
            F.sum(
                F.when(scored, F.col("c_ut") * F.col("b_src")).otherwise(zero)
            ).cast("long").alias("bits_src"),
            F.sum(
                F.when(scored, F.col("c_ut") * F.col("b_tgt")).otherwise(zero)
            ).cast("long").alias("bits_tgt"),
        )
        .select(
            "url", "n_tokens", "n_scored", "bits_src", "bits_tgt",
            (F.col("bits_src") - F.col("bits_tgt")).cast("long").alias(
                "weight_bits"
            ),
        )
    )


def sql_dsir_weights(raw_rel: str, target_rel: str = "documents") -> str:
    """Oracle for :func:`dsir_weights` (same integer-log2 towers, same
    OOV canon); ``raw_rel`` must expose ``(url, text)``."""
    toks_raw = TX.sql_tokens("text")
    return f"""
WITH wraw AS (SELECT url, text FROM ({raw_rel}) wr),
wt AS (SELECT url, unnest({toks_raw}) AS token FROM wraw),
per_ut AS (SELECT url, token, CAST(count(*) AS BIGINT) AS c_ut
           FROM wt GROUP BY 1, 2),
src_tot AS (SELECT token, CAST(sum(c_ut) AS BIGINT) AS c_src
            FROM per_ut GROUP BY 1),
n_src AS (SELECT CAST(sum(c_src) AS BIGINT) AS n_src FROM src_tot),
src_scored AS (
  SELECT token,
         CAST(length(bin(n_src // c_src)) - 1 AS BIGINT) AS b_src
  FROM src_tot, n_src),
tgt_tok AS (SELECT unnest({toks_raw}) AS token FROM {target_rel}),
tgt_tot AS (SELECT token, CAST(count(*) AS BIGINT) AS c_tgt
            FROM tgt_tok GROUP BY 1),
n_tgt AS (SELECT CAST(sum(c_tgt) AS BIGINT) AS n_tgt FROM tgt_tot),
tgt_scored AS (
  SELECT token,
         CAST(length(bin(n_tgt // c_tgt)) - 1 AS BIGINT) AS b_tgt
  FROM tgt_tot, n_tgt)
SELECT p.url,
       CAST(sum(p.c_ut) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN t.b_tgt IS NOT NULL THEN p.c_ut ELSE 0 END)
            AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN t.b_tgt IS NOT NULL THEN p.c_ut * s.b_src
                ELSE 0 END) AS BIGINT) AS bits_src,
       CAST(sum(CASE WHEN t.b_tgt IS NOT NULL THEN p.c_ut * t.b_tgt
                ELSE 0 END) AS BIGINT) AS bits_tgt,
       CAST(sum(CASE WHEN t.b_tgt IS NOT NULL THEN p.c_ut * s.b_src
                ELSE 0 END)
            - sum(CASE WHEN t.b_tgt IS NOT NULL THEN p.c_ut * t.b_tgt
                  ELSE 0 END) AS BIGINT) AS weight_bits
FROM per_ut p
JOIN src_scored s ON s.token = p.token
LEFT JOIN tgt_scored t ON t.token = p.token
GROUP BY p.url"""
