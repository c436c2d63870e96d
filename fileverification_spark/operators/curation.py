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
