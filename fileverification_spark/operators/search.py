"""BM25 full-text retrieval over the documents table.

Top-k documents for a free-text query under the public Robertson/
Sparck-Jones BM25 formula (the Okapi defaults k1=1.2, b=0.75):

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

Scale shape: the explode is filtered to the query's terms BEFORE any
aggregation, so the shuffled relation is |query terms| * |matching
docs| rows, not the corpus token count; the df relation is at most
|query terms| rows and joins back as a broadcast. Corpus scalars
(N, sum of doc lengths) are one exact-integer aggregate.

Cross-engine determinism (the demoted-contract oracle hashes values):

- avgdl is never materialised as a float average — the formula uses
  dl * N / S with exact BIGINT N and S, so both engines perform the
  identical double division (a float avg would depend on summation
  order). At extreme scale dl*N can pass 2^53 and lose ulps to the
  double conversion; at 10^12 docs switch the expression to
  dl * (N/S) if that matters — it changes last-ulp behaviour, not
  ranking in any realistic corpus.
- the per-doc sum over query terms is a FIXED-ORDER chain of per-term
  conditional aggregates (one CASE/WHEN column per sorted query term),
  never a SUM over an unordered group — double addition is not
  associative, and a free-order sum can differ in the last ulp between
  engines and flip the 4-dp rounding.
- ranking orders by the rounded score with doc_id as tie-break.

Reference parity: the reference's point-verify path takes a user key
and reports the best match for it (FV/Program.cs:318-339); bm25_search
is the ranked-retrieval generalisation of that lookup to free text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX

K1 = 1.2
B = 0.75


def query_terms(query: str) -> list[str]:
    """The query tokenized exactly like the corpus (functions/text.py),
    deduplicated, sorted — the fixed term order both engines sum in."""
    return sorted(set(re.findall(TX.TOKEN_RE, query.lower())))


def bm25_search(
    docs: DataFrame, query: str, k: int = 10, k1: float = K1, b: float = B
) -> DataFrame:
    """(doc_id, score): top-``k`` docs for ``query`` by BM25, rounded to
    4 dp, ties broken on doc_id."""
    terms = query_terms(query)
    if not terms:
        raise ValueError(f"query has no indexable terms: {query!r}")

    base = docs.select(
        "doc_id", TX.tokens(F.col("text")).alias("toks")
    ).withColumn("dl", F.size("toks").cast("bigint"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).first()
    n, s = int(stats["n"]), int(stats["s"])

    tf = (
        base.select("doc_id", "dl", F.explode("toks").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("dl") * F.lit(n) / F.lit(s))
    )
    per_term = tf.join(F.broadcast(df_), "term").withColumn(
        "ts", idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    )

    # fixed-order pivot sum (see module doc): one column per sorted term
    pivots = [
        F.sum(F.when(F.col("term") == t, F.col("ts"))).alias(f"s{i}")
        for i, t in enumerate(terms)
    ]
    scored = per_term.groupBy("doc_id").agg(*pivots)
    total = F.coalesce(F.col("s0"), F.lit(0.0))
    for i in range(1, len(terms)):
        total = total + F.coalesce(F.col(f"s{i}"), F.lit(0.0))
    scored = scored.select(
        "doc_id", F.round(total, 4).alias("score")
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("doc_id", "score")
    )


def sql_bm25_search(
    docs_rel: str, query: str, k: int = 10, k1: float = K1, b: float = B
) -> str:
    """DuckDB oracle: identical formula, literals, pivot order, rounding."""
    terms = query_terms(query)
    toks = TX.sql_tokens("text")
    in_list = ", ".join(f"'{t}'" for t in terms)
    pivot_cols = ",\n         ".join(
        f"SUM(CASE WHEN term = '{t}' THEN ts END) AS s{i}"
        for i, t in enumerate(terms)
    )
    total = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(terms)))
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len({toks}) AS BIGINT) AS dl,
         {toks} AS toks
  FROM {docs_rel}
),
stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(dl) AS BIGINT) AS s FROM base),
tf AS (
  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM base)
  WHERE term IN ({in_list})
  GROUP BY 1, 2, 3
),
dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
per_term AS (
  SELECT doc_id,
         ln(1.0 + (n - df + 0.5) / (df + 0.5))
           * tf * {k1 + 1.0!r}
           / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * (dl * n / s))) AS ts,
         term
  FROM tf JOIN dfx USING (term) CROSS JOIN stats
),
scored AS (
  SELECT doc_id,
         {pivot_cols}
  FROM per_term GROUP BY doc_id
),
r AS (
  SELECT doc_id, round({total}, 4) AS score
  FROM scored
)
SELECT doc_id, score FROM (
  SELECT *, row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
  FROM r
) WHERE rn <= {k}"""


# ---------------------------------------------------------------------------
# Inverted index — term -> posting list
# ---------------------------------------------------------------------------

def inverted_index(
    docs: DataFrame, min_df: int = 1, postings_cap: int = 64
) -> DataFrame:
    """Distributed inverted-index construction: ``(term, df, postings)``
    where ``df`` is the exact document frequency and ``postings`` is the
    comma-joined ascending doc_id list — materialised ONLY for tail
    terms (``df <= postings_cap``; head terms keep ``postings = ''``).

    The reference's manifest is exactly this shape for files — a
    per-directory key -> hash lookup table (FV/CheckSumFile.cs:50
    Checksums dictionary); the inverted index is the text-retrieval
    twin: per-term key -> document list.

    Scale shape (the reason for the two-pass form): a head term at
    10^12 docs has ~1e9 postings — a single ``collect_list`` on it
    OOMs one reducer. So pass 1 computes df with a plain
    partial-aggregatable count (no lists anywhere); pass 2 builds
    lists only where df is bounded by ``postings_cap``, so per-group
    state is <= cap ids by construction. Head-term postings belong in
    a sharded layout (posting-list segments keyed by (term, shard)),
    which consumers opt into separately; the df column here is already
    exact for them. Skew: the df<=cap semi-join removes precisely the
    skewed keys before the list aggregation — the groupBy that builds
    lists is skew-free by construction.
    """
    pairs = (
        docs.select(
            "doc_id", F.explode(TX.tokens(F.col("text"))).alias("term")
        )
        .distinct()
    )
    dfrel = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    tail = pairs.join(
        dfrel.where(F.col("df") <= postings_cap).select("term"), "term"
    )
    posts = tail.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings")
    )
    return (
        dfrel.where(F.col("df") >= min_df)
        .join(posts, "term", "left")
        .select(
            "term",
            "df",
            F.coalesce(F.col("postings"), F.lit("")).alias("postings"),
        )
    )


def sql_inverted_index(min_df: int = 1, postings_cap: int = 64) -> str:
    """DuckDB mirror over the ``documents`` view (bare SELECT form)."""
    return f"""SELECT d.term, d.df, COALESCE(p.postings, '') AS postings
FROM (
  SELECT term, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, unnest({TX.sql_tokens('text')}) AS term
        FROM documents)
  GROUP BY term
) d
LEFT JOIN (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM (SELECT DISTINCT doc_id, unnest({TX.sql_tokens('text')}) AS term
        FROM documents)
  WHERE term IN (
    SELECT term
    FROM (SELECT DISTINCT doc_id, unnest({TX.sql_tokens('text')}) AS term
          FROM documents)
    GROUP BY term HAVING count(*) <= {postings_cap})
  GROUP BY term
) p USING (term)
WHERE d.df >= {min_df}"""


# ---------------------------------------------------------------------------
# Positional phrase search
# ---------------------------------------------------------------------------


def phrase_search(docs: DataFrame, phrase: str) -> DataFrame:
    """(doc_id, n_hits) exact positional phrase match: documents whose
    whitespace token stream contains the phrase's tokens CONSECUTIVELY,
    with the occurrence count (overlaps counted — each start position is
    tested independently, the standard positional-index semantics).

    The reference's analogue is its exact, position-sensitive record
    match (`FV/CheckSumFile.cs:144-146` — lookup keyed on the full
    path string, not a bag of segments); this lifts "exact sequence,
    not bag-of-terms" to retrieval, complementing bm25_search's
    bag-of-words ranking.

    Plan shape: a single zero-shuffle projection — split once, then a
    size(filter(sequence(...))) counting start positions where all m
    tokens line up (element_at equality chain, codegen'd). No explode,
    no positional inverted index materialised: at 100 TB the phrase
    test pipelines with the scan and the only shuffle is whatever the
    caller does with the matches. O(len * m) comparisons per doc."""
    words = phrase.split()
    if not words:
        raise ValueError("phrase must contain at least one token")
    m = len(words)
    ts = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.size(ts) - m + 1)
    hit = lambda p: [  # noqa: E731 — single expression, named for clarity
        F.element_at(ts, (p + i).cast("int")) == F.lit(wd)
        for i, wd in enumerate(words)
    ]
    n_hits = F.size(
        F.filter(
            starts,
            lambda p: F.aggregate(
                F.array(*hit(p)), F.lit(True), lambda acc, x: acc & x
            ),
        )
    ).cast("bigint")
    return (
        docs.where(F.size(ts) >= m)
        .select("doc_id", n_hits.alias("n_hits"))
        .where(F.col("n_hits") >= 1)
    )


def sql_phrase_search(phrase: str, docs_rel: str = "documents") -> str:
    """Oracle: identical split / start-position / conjunction shape via
    DuckDB list lambdas (range end is exclusive, Spark sequence end is
    inclusive — hence the +2)."""
    words = phrase.split()
    m = len(words)
    conds = " AND ".join(
        f"ts[p + {i}] = '{wd}'" for i, wd in enumerate(words)
    )
    return f"""
SELECT doc_id, n_hits FROM (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(ts) - {m} + 2),
                              p -> {conds})) AS BIGINT) AS n_hits
  FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM {docs_rel})
  WHERE len(ts) >= {m}
) WHERE n_hits >= 1"""


# ---------------------------------------------------------------------------
# Reciprocal Rank Fusion (hybrid lexical + vector retrieval)
# ---------------------------------------------------------------------------

#: RRF smoothing constant — the value Cormack & Clarke fixed in the
#: original SIGIR 2009 evaluation and the de-facto default everywhere.
RRF_K = 60
#: integer contribution scale: score = sum(1e6 div (K + rank)) — exact
#: BIGINT arithmetic, no float reciprocals to drift across engines.
RRF_SCALE = 1_000_000


def rrf_fuse(
    ranked_a: DataFrame, ranked_b: DataFrame, k_rrf: int = RRF_K
) -> DataFrame:
    """(doc_id, rank_a, rank_b, rrf_micro) — Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher, SIGIR 2009) of two ranked lists, the
    standard hybrid-retrieval combiner (BM25 x embedding ANN): each
    list contributes 1/(k + rank), absent membership contributes 0.

    Exactness: contributions are ``RRF_SCALE div (k + rank)`` — integer
    floor division, so the fused score is a BIGINT both engines compute
    bit-identically (float reciprocal sums would differ in the last ulp
    across summation orders).

    Inputs are (doc_id, rank) relations — compose with bm25_search /
    cosine_topk, both of which produce deterministic total ranks.

    Scale shape: ONE full-outer equi-join on doc_id between two
    relations that are already top-k-bounded by their producers
    (k rows per query, not corpus-sized) — at 100 TB the fusion cost is
    the retrieval cost, not this join."""
    a = ranked_a.select("doc_id", F.col("rank").cast("bigint").alias("rank_a"))
    b = ranked_b.select("doc_id", F.col("rank").cast("bigint").alias("rank_b"))
    j = a.join(b, "doc_id", "full")

    def contrib(c: str) -> "F.Column":
        return F.coalesce(
            F.expr(f"{RRF_SCALE} div ({k_rrf} + {c})"), F.lit(0)
        ).cast("bigint")

    return j.select(
        "doc_id",
        "rank_a",
        "rank_b",
        (contrib("rank_a") + contrib("rank_b")).alias("rrf_micro"),
    )


def sql_rrf_fuse(
    ranked_a_cte: str, ranked_b_cte: str, k_rrf: int = RRF_K
) -> str:
    """Oracle: same full-outer join, same integer floor division.
    ``ranked_*_cte`` are query strings producing (doc_id, rank)."""
    return f"""
WITH ra AS ({ranked_a_cte}),
rb AS ({ranked_b_cte})
SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
       CAST(ra.rank AS BIGINT) AS rank_a,
       CAST(rb.rank AS BIGINT) AS rank_b,
       CAST(coalesce({RRF_SCALE} // ({k_rrf} + ra.rank), 0)
          + coalesce({RRF_SCALE} // ({k_rrf} + rb.rank), 0) AS BIGINT)
         AS rrf_micro
FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id"""
