"""Deterministic sampling + data-mixing operators for training-data
curation (SURVEY training-ops; the "sample 5% of CommonCrawl, n docs per
language, re-weight sources to a target mixture" primitives every
large-scale pipeline needs).

Design rule: NO RNG. Every sample is a pure function of the row key via
sha256, so it is

- restartable (a re-run after failure selects the same rows — the
  property the reference gets from deterministic file hashes,
  FV/HashInfo.cs:164-238, lifted to selection),
- cluster-stable (no per-partition RNG state, no seed-vs-partitioning
  coupling like DataFrame.sample's),
- append-consistent (new rows don't change the verdict on old rows —
  an incremental ingest keeps its sample without re-drawing).

The hash-threshold trick keeps everything string-domain: the first 8
lowercase-hex chars of sha256(key) compare LEXICOGRAPHICALLY exactly as
the 32-bit value compares numerically (hex digits are ASCII-ordered), so
both Spark and the DuckDB oracle filter on ``substr(hash,1,8) <
'threshold'`` with zero integer-parsing divergence.

Scale: hash_sample is a scan-side filter (pushed into the parquet scan,
zero shuffle). stratified_sample shuffles once on the stratum key with
rank-1..n pruned by WindowGroupLimit pushdown. mixture_weights is one
partial-aggregated groupBy over sources (|sources| rows out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_threshold(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return format(min(int(fraction * 2**32), 2**32 - 1), "08x")


def hash_sample(df: DataFrame, key, fraction: float) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key`` (column
    name or Column; non-string keys: pass ``col.cast("string")``): keep
    rows whose sha256(key) 8-hex-char prefix falls below the fraction
    threshold. A plain Column predicate — Catalyst pushes it to the
    scan; no shuffle, no RNG, same rows on every run and every cluster
    layout. ``fraction == 1.0`` is the identity (no filter at all):
    the clamped threshold is ffffffff and the strict ``<`` would
    otherwise drop the ~1/2^32 of rows whose prefix IS ffffffff
    (ADVICE r3)."""
    if fraction == 1.0:
        return df
    thr = _hash_threshold(fraction)
    k = F.col(key) if isinstance(key, str) else key
    return df.where(F.substring(F.sha2(k, 256), 1, 8) < F.lit(thr))


def sql_hash_sample(key: str, fraction: float, rel: str) -> str:
    """DuckDB oracle twin — identical hash, identical threshold string,
    identical fraction==1.0 identity."""
    if fraction == 1.0:
        return f"SELECT * FROM {rel}"
    thr = _hash_threshold(fraction)
    return f"SELECT * FROM {rel} WHERE substr(sha256({key}), 1, 8) < '{thr}'"


def stratified_sample(
    df: DataFrame, stratum: str, n_per_stratum: int, key
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer iff the stratum
    is smaller), chosen deterministically: rank rows within each stratum
    by (sha256(key), key) — the hash makes the draw uniform, the key
    tie-break makes it total — and keep rank <= n. One shuffle on the
    stratum key; Spark's WindowGroupLimit pushes the rank-1..n filter
    below the sort so only n rows per (stratum, partition) survive the
    exchange."""
    k = F.col(key) if isinstance(key, str) else key
    w = Window.partitionBy(stratum).orderBy(F.sha2(k, 256), k)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n_per_stratum)
        .drop("rk")
    )


def sql_stratified_sample(
    stratum: str, n_per_stratum: int, key: str, rel: str, cols: str = "*"
) -> str:
    return f"""
SELECT {cols} FROM (
  SELECT *, row_number() OVER (PARTITION BY {stratum}
                               ORDER BY sha256({key}), {key}) AS rk
  FROM {rel}
) WHERE rk <= {n_per_stratum}"""


def mixture_weights(
    df: DataFrame, source: str, target: "dict[str, float]"
) -> DataFrame:
    """Data-mixing plan: per-source keep-fractions that move the corpus
    toward a target source distribution by DOWN-sampling only (no
    up-weighting/duplication): the most under-represented source keeps
    fraction 1.0 and every other source keeps
    ``(target_share / actual_share) / max_over_sources(same)``.
    Output: (source, n_rows, actual_share, keep_fraction) — |sources|
    rows, one partial-aggregated groupBy. Feed keep_fraction into
    :func:`hash_sample` per source for the deterministic realisation.
    Sources absent from ``target`` get keep_fraction 0 (dropped)."""
    total = df.count()
    counts = df.groupBy(F.col(source).alias("source")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tgt = F.create_map(
        *[F.lit(x) for kv in target.items() for x in kv]
    )
    ratio = (tgt[F.col("source")]
             / (F.col("n_rows") / F.lit(float(total))))
    with_ratio = counts.select(
        "source",
        "n_rows",
        (F.col("n_rows") / F.lit(float(total))).alias("actual_share"),
        F.coalesce(ratio, F.lit(0.0)).alias("ratio"),
    )
    max_ratio = with_ratio.agg(F.max("ratio")).collect()[0][0]
    if not max_ratio or max_ratio <= 0:
        raise ValueError("no source in df matches any target key")
    return with_ratio.select(
        "source",
        "n_rows",
        "actual_share",
        (F.col("ratio") / F.lit(float(max_ratio))).alias("keep_fraction"),
    )


def sql_mixture_weights(
    source: str, target: "dict[str, float]", rel: str
) -> str:
    """Oracle twin: same arithmetic, same operand order, shares computed
    against the same double total so IEEE results agree bit-for-bit."""
    cases = " ".join(
        f"WHEN '{k}' THEN {v!r}" for k, v in target.items()
    )
    tgt = f"(CASE c.source {cases} ELSE NULL END)"
    return f"""
WITH c AS (
  SELECT {source} AS source, count(*) AS n_rows,
         (SELECT count(*) FROM {rel})::DOUBLE AS total
  FROM {rel} GROUP BY {source}
),
r AS (
  SELECT source, n_rows, n_rows / total AS actual_share,
         coalesce({tgt} / (n_rows / total), 0.0) AS ratio
  FROM c
)
SELECT source, n_rows, actual_share,
       ratio / (SELECT max(ratio) FROM r) AS keep_fraction
FROM r"""


def _isqrt(n) -> "F.Column":
    """Exact integer sqrt of a non-negative BIGINT column: floor(sqrt)
    in double, then a +/-1 correction step — bit-identical in any
    IEEE-double engine regardless of the library's rounding at perfect
    squares (safe for n < 2^52)."""
    s0 = F.floor(F.sqrt(n.cast("double"))).cast("bigint")
    return (
        s0
        - F.when(s0 * s0 > n, F.lit(1)).otherwise(F.lit(0))
        + F.when((s0 + 1) * (s0 + 1) <= n, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")


_SQL_ISQRT = (
    "(CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)"
    " - CASE WHEN CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT)"
    "            * CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) > {n}"
    "        THEN 1 ELSE 0 END"
    " + CASE WHEN (CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "            * (CAST(floor(sqrt(CAST({n} AS DOUBLE))) AS BIGINT) + 1)"
    "            <= {n} THEN 1 ELSE 0 END)"
)


def lang_temperature(
    docs: DataFrame, lang: str = "lang", ppm_budget: int = 1_000_000
) -> DataFrame:
    """Temperature-scaled multilingual sampling weights (the XLM-R /
    mC4 alpha-smoothed language mixture, Conneau et al. 2020): language
    l is sampled proportionally to n_l^alpha with alpha = 0.5, which
    up-weights tail languages relative to raw frequency. Output:
    (lang, n_docs, scaled, base, extra, weight_ppm) with
    sum(weight_ppm) == ppm_budget EXACTLY.

    Exactness: alpha = 0.5 makes n^alpha an integer sqrt — computed by
    the corrected-isqrt (no libm pow whose last ulp differs across
    engines) — and the ppm split uses Hamilton largest-remainder
    apportionment (same arithmetic as graph.fetch_budget), so the whole
    plan is integer-exact and engine-replayable; no float ever reaches
    the output.

    Scale shape: ONE partial-aggregatable hash-agg on the language key
    (|langs| <= a few hundred rows out of 100 TB), then the rank window
    runs over that plan-time-bounded relation — the same shard-
    granularity discipline as fetch_budget. The corpus is scanned
    once."""
    if ppm_budget < 0:
        raise ValueError("ppm_budget must be >= 0")
    counts = docs.groupBy(F.col(lang).alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    scaled = counts.withColumn("scaled", _isqrt(F.col("n_docs")))
    tot = scaled.select(F.sum("scaled").cast("long").alias("t"))
    q = scaled.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "scaled",
        F.expr(f"({ppm_budget} * scaled) div t").cast("long").alias("base"),
        F.expr(f"({ppm_budget} * scaled) % t").cast("long").alias("rem"),
    )
    leftover = q.select(
        (F.lit(ppm_budget) - F.sum("base")).cast("long").alias("leftover")
    )
    w = Window.orderBy(F.desc("rem"), F.asc("lang"))
    return (
        q.withColumn("rk", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(leftover))
        .select(
            "lang",
            "n_docs",
            "scaled",
            "base",
            F.when(F.col("rk") <= F.col("leftover"), F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("extra"),
        )
        .withColumn("weight_ppm", (F.col("base") + F.col("extra")).cast("long"))
    )


def sql_lang_temperature(
    rel: str = "documents", lang: str = "lang", ppm_budget: int = 1_000_000
) -> str:
    """DuckDB mirror: same corrected isqrt, same Hamilton arithmetic."""
    isq = _SQL_ISQRT.format(n="n_docs")
    return f"""
WITH c AS (SELECT {lang} AS lang, CAST(count(*) AS BIGINT) AS n_docs
           FROM {rel} GROUP BY 1),
s AS (SELECT lang, n_docs, {isq} AS scaled FROM c),
tot AS (SELECT CAST(sum(scaled) AS BIGINT) AS t FROM s),
q AS (SELECT lang, n_docs, scaled,
             ({ppm_budget} * scaled) // t AS base,
             ({ppm_budget} * scaled) % t AS rem
      FROM s, tot),
lo AS (SELECT {ppm_budget} - sum(base) AS leftover FROM q),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, lang ASC) AS rk
      FROM q)
SELECT lang, n_docs, CAST(scaled AS BIGINT) AS scaled,
       CAST(base AS BIGINT) AS base,
       CAST(CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS extra,
       CAST(base + CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END AS BIGINT)
         AS weight_ppm
FROM r, lo"""
