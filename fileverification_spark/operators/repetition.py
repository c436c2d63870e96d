"""Corpus-hygiene operators an LLM training-data pipeline runs between
crawl and tokenizer: intra-document repetition accounting (the
Gopher-style "fraction of duplicate n-grams" gates) and benchmark
decontamination (n-gram overlap against a held-out evaluation set).

Both are the corpus-level analogue of the reference's per-folder
verification sweep (FV/Program.cs:230-280): scan everything once,
compute a per-unit integrity verdict, report the offenders.

Scale notes (100 TB):

- ``repetition_stats`` is a pure per-row codegen'd array expression —
  zero shuffle, zero Python. The top-n-gram count is O(d·t) per row
  (d = distinct n-grams, t = total); document length is bounded in any
  real corpus, so this beats the explode→groupBy alternative, which
  would shuffle ~|tokens| rows per document. For pathological
  multi-megabyte docs, gate on ``n_chars`` first.
- ``decontaminate`` broadcasts the benchmark n-gram set (a few MB even
  for large eval suites — it's the *held-out* side, never the corpus)
  and does ONE shuffle: the per-doc overlap groupBy. n_grams and
  n_overlap are folded into the same aggregate, so there is no
  join-back. The corpus side never materialises more than its distinct
  n-grams per document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fileverification_spark.functions import text as TX

#: Gopher-style repetition gates (Rae et al. 2021, table A1 shape):
#: a document is flagged when duplicate 2-grams exceed DUP2_MAX, its
#: most frequent 2-gram exceeds TOP2_MAX of all 2-grams, or duplicate
#: 3-grams exceed DUP3_MAX.
DUP2_MAX = 0.20
TOP2_MAX = 0.20
DUP3_MAX = 0.18

#: below this many tokens the top-n-gram share is trivially large (a
#: 2-token doc has top2_frac = 1.0), so the repetition gates abstain —
#: Gopher likewise pairs its repetition filters with a length floor, and
#: short docs are handled by the curation length gate instead.
MIN_GATE_TOKENS = 10

ROUND = TX.QUALITY_ROUND


def _rep_cols(toks, n: int) -> dict:
    g = TX.word_ngrams(toks, n)
    total = F.size(g)
    distinct = F.size(F.array_distinct(g))
    dup_frac = F.when(
        total > 0, (total - distinct) / total.cast("double")
    ).otherwise(F.lit(0.0))
    top_cnt = F.when(
        total > 0,
        F.array_max(
            F.transform(
                F.array_distinct(g),
                lambda x: F.size(F.filter(g, lambda y: y == x)),
            )
        ),
    ).otherwise(F.lit(0))
    top_frac = F.when(total > 0, top_cnt / total.cast("double")).otherwise(
        F.lit(0.0)
    )
    return {
        f"dup{n}_frac": F.round(dup_frac, ROUND),
        f"top{n}_frac": F.round(top_frac, ROUND),
    }


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition accounting over word 2- and 3-grams:
    (doc_id, n_tokens, dup2_frac, top2_frac, dup3_frac, top3_frac,
    repetitive). ``dupN_frac`` is the fraction of n-gram occurrences
    beyond the first of each distinct n-gram; ``topN_frac`` is the share
    held by the single most frequent n-gram. ``repetitive`` applies the
    module-level Gopher-style gates."""
    toks = TX.tokens(F.col("text"))
    c2 = _rep_cols(toks, 2)
    c3 = _rep_cols(toks, 3)
    out = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        c2["dup2_frac"].alias("dup2_frac"),
        c2["top2_frac"].alias("top2_frac"),
        c3["dup3_frac"].alias("dup3_frac"),
        c3["top3_frac"].alias("top3_frac"),
    )
    return out.withColumn(
        "repetitive",
        (F.col("n_tokens") >= MIN_GATE_TOKENS)
        & (
            (F.col("dup2_frac") > DUP2_MAX)
            | (F.col("top2_frac") > TOP2_MAX)
            | (F.col("dup3_frac") > DUP3_MAX)
        ),
    )


def sql_repetition_stats(docs_rel: str = "documents") -> str:
    """Oracle: identical per-row array arithmetic in DuckDB."""

    def block(n: int) -> tuple[str, str]:
        g = f"g{n}"
        dup = (
            f"round(CASE WHEN len({g}) > 0 THEN "
            f"CAST(len({g}) - len(list_distinct({g})) AS DOUBLE) / len({g}) "
            f"ELSE 0.0 END, {ROUND})"
        )
        top = (
            f"round(CASE WHEN len({g}) > 0 THEN "
            f"CAST(list_aggregate(list_transform(list_distinct({g}), "
            f"x -> len(list_filter({g}, y -> y = x))), 'max') AS DOUBLE)"
            f" / len({g}) ELSE 0.0 END, {ROUND})"
        )
        return dup, top

    toks = TX.sql_tokens("text")
    dup2, top2 = block(2)
    dup3, top3 = block(3)
    return f"""
WITH g AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_tokens,
         {TX.sql_word_ngrams(toks, 2)} AS g2,
         {TX.sql_word_ngrams(toks, 3)} AS g3
  FROM {docs_rel}
),
s AS (
  SELECT doc_id, n_tokens,
         {dup2} AS dup2_frac, {top2} AS top2_frac,
         {dup3} AS dup3_frac, {top3} AS top3_frac
  FROM g
)
SELECT *,
       (n_tokens >= {MIN_GATE_TOKENS} AND
        (dup2_frac > {DUP2_MAX} OR top2_frac > {TOP2_MAX}
         OR dup3_frac > {DUP3_MAX})) AS repetitive
FROM s"""


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

#: default n-gram order for contamination checks. Real pipelines use
#: 8-13; the synthetic corpus has a ~40-word vocabulary, so 5 keeps the
#: false-positive rate near zero while still catching true duplicates.
DECONTAM_N = 5

#: deterministic held-out split for the contract query: every 41st doc.
BENCH_MOD = 41


def decontaminate(
    docs: DataFrame, bench: DataFrame, n: int = DECONTAM_N
) -> DataFrame:
    """Per-training-document overlap against a held-out benchmark set:
    (doc_id, n_grams, n_overlap, contaminated). ``n_grams`` counts the
    document's distinct word n-grams; ``n_overlap`` counts how many of
    those appear anywhere in ``bench``; ``contaminated`` is
    ``n_overlap > 0`` — the drop-gate a training pipeline applies before
    the eval suite sees the model.

    ``bench`` is broadcast (held-out sets are tiny relative to the
    corpus); the only shuffle is the per-doc aggregate, which also folds
    in ``n_grams`` so there is no join-back against the corpus."""
    grams = lambda c: F.array_distinct(TX.word_ngrams(TX.tokens(c), n))  # noqa: E731
    bench_grams = (
        bench.select(F.explode(grams(F.col("text"))).alias("g"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_grams = docs.select(
        "doc_id", F.explode_outer(grams(F.col("text"))).alias("g")
    )
    marked = doc_grams.join(F.broadcast(bench_grams), "g", "left")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("g").cast("bigint").alias("n_grams"),
            F.count("hit").cast("bigint").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") > 0)
    )


def sql_decontaminate(
    docs_rel: str,
    bench_rel: str,
    n: int = DECONTAM_N,
) -> str:
    """Oracle: same split, same distinct-gram semantics. ``docs_rel`` /
    ``bench_rel`` are SQL relations with (doc_id, text)."""
    toks = TX.sql_tokens("text")
    gs = TX.sql_word_ngrams(toks, n)
    return f"""
WITH train AS (
  SELECT doc_id, list_distinct({gs}) AS gs FROM {docs_rel}
),
bench AS (
  SELECT DISTINCT unnest(list_distinct({gs})) AS g FROM {bench_rel}
),
ex AS (SELECT doc_id, unnest(gs) AS g FROM train),
hits AS (
  SELECT e.doc_id, count(*) AS n_overlap
  FROM ex e JOIN bench b USING (g) GROUP BY e.doc_id
)
SELECT t.doc_id,
       CAST(len(t.gs) AS BIGINT) AS n_grams,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM train t LEFT JOIN hits h USING (doc_id)"""
