"""Shuffle-skew audit: the pre-flight a 100 TB join/groupBy runs BEFORE
committing to a partitioning.

Every shuffle in this engine hashes rows by a key; one Zipf-hot key
(a megasite host, an empty-string lang, a default cell) turns a
1000-executor stage into a one-straggler stage. The repo's skew
answers (salting in cell_digests_salted, AQE skew-join splits, the
capped top-16 fan-out in cocitation) all need the same input: the
KEY-COUNT DISTRIBUTION. This operator computes it as a relation —
exact-integer heavy-hitter table + distribution quantiles + the
recommended per-key salt factor — so the decision ("salt this key by
12", "broadcast instead", "cap this fan-out") is data, not folklore.

The reference's analogue is its per-folder file counts
(FV/PathInfo.cs builds the work tree and the largest folder bounds a
worker's batch); here the "folder" is a join key and the report is the
operator a pipeline runs at onboarding time over each planned key.

Scale shape: ONE partial-aggregatable hash-agg to the key-count
relation (the map-side combine absorbs the corpus — the hot key itself
costs one long counter per task), then windows/aggs run on that
KEY-SIZED relation only, exactly the domain_quantiles discipline
(never a window over the corpus). Output is top-N rows — driver-safe
by construction.

Everything is exact integer arithmetic (milli-ratios, ppm shares,
ceil-div salt factors via BIGINT ``div``) so the report is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

#: default rows-per-task budget the salt recommendation targets: a key
#: whose count exceeds this gets split into ceil(n / target) salted
#: sub-keys so no task carries more than ~target rows of it
DEFAULT_TARGET = 1_000_000


def skew_report(
    df: DataFrame,
    key: Column | str,
    top: int = 10,
    target: int = DEFAULT_TARGET,
) -> DataFrame:
    """Top-``top`` heavy hitters of ``key`` with the distribution
    context a partitioning decision needs:

    ``(key, n, rank, share_ppm, salt, n_keys, total_rows, max_n,
    mean_n_milli, p50_n, p90_n, p99_n, skew_milli)``

    - ``share_ppm``: this key's share of all rows, parts-per-million
      (exact BIGINT div).
    - ``salt``: recommended split factor for THIS key — ceil(n /
      target); 1 means no salting needed.
    - ``p50/p90/p99``: exact key-count quantiles — the count at integer
      rank ceil(q * n_keys) of the ascending (count, key) order, the
      domain_quantiles rank arithmetic.
    - ``skew_milli``: 1000 * max_n / mean_n as the exact integer
      1000 * max_n * n_keys div total_rows — the classic "hot key is
      X x the average" ratio AQE's skew threshold reasons in.
    """
    if top < 1:
        raise ValueError("top must be >= 1")
    if target < 1:
        raise ValueError("target must be >= 1")
    k = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(k.alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    # quantiles over the KEY-SIZED count relation: ascending (n, key)
    # rank; pXX = n at exact rank ceil(q% * n_keys) = (q*n_keys+99) div 100
    asc = W.orderBy("n", "key")
    ranked = counts.select(
        "key", "n", F.row_number().over(asc).cast("long").alias("r")
    )
    totals = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.max("n").cast("long").alias("max_n"),
    )
    joined = ranked.crossJoin(F.broadcast(totals))

    def _at(q_pct: int) -> Column:
        return F.expr(f"(({q_pct} * n_keys + 99) div 100)")

    quants = joined.select(
        F.when(F.col("r") == _at(50), F.col("n")).alias("p50"),
        F.when(F.col("r") == _at(90), F.col("n")).alias("p90"),
        F.when(F.col("r") == _at(99), F.col("n")).alias("p99"),
    ).agg(
        F.max("p50").cast("long").alias("p50_n"),
        F.max("p90").cast("long").alias("p90_n"),
        F.max("p99").cast("long").alias("p99_n"),
    )
    desc = W.orderBy(F.desc("n"), F.asc("key"))
    heavy = counts.select(
        "key", "n", F.row_number().over(desc).cast("long").alias("rank")
    ).where(F.col("rank") <= top)
    return (
        heavy.crossJoin(F.broadcast(totals))
        .crossJoin(F.broadcast(quants))
        .select(
            "key",
            "n",
            "rank",
            F.expr("(1000000 * n) div total_rows").cast("long").alias(
                "share_ppm"
            ),
            F.expr(f"(n + {target - 1}) div {target}").cast("long").alias(
                "salt"
            ),
            "n_keys",
            "total_rows",
            "max_n",
            F.expr("(1000 * total_rows) div n_keys").cast("long").alias(
                "mean_n_milli"
            ),
            "p50_n",
            "p90_n",
            "p99_n",
            F.expr("(1000 * max_n * n_keys) div total_rows")
            .cast("long")
            .alias("skew_milli"),
        )
    )


def sql_skew_report(src_rel: str, key_expr: str, top: int = 10) -> str:
    """Oracle CTE fragments (no WITH keyword — compose after the pages
    CTE): same key-count relation, same integer rank quantiles. The
    final SELECT is :func:`sql_skew_report_select`."""
    return f"""skw_counts AS (
  SELECT {key_expr} AS key, CAST(count(*) AS BIGINT) AS n
  FROM {src_rel} GROUP BY 1
),
skw_ranked AS (
  SELECT key, n,
         CAST(row_number() OVER (ORDER BY n, key) AS BIGINT) AS r
  FROM skw_counts
),
skw_totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(max(n) AS BIGINT) AS max_n
  FROM skw_ranked
),
skw_quants AS (
  SELECT CAST(max(CASE WHEN r = (50 * n_keys + 99) // 100 THEN n END)
              AS BIGINT) AS p50_n,
         CAST(max(CASE WHEN r = (90 * n_keys + 99) // 100 THEN n END)
              AS BIGINT) AS p90_n,
         CAST(max(CASE WHEN r = (99 * n_keys + 99) // 100 THEN n END)
              AS BIGINT) AS p99_n
  FROM skw_ranked, skw_totals
),
skw_heavy AS (
  SELECT key, n,
         CAST(row_number() OVER (ORDER BY n DESC, key) AS BIGINT) AS rank
  FROM skw_counts QUALIFY rank <= {top}
)"""


def sql_skew_report_select(target: int = DEFAULT_TARGET) -> str:
    """Final SELECT over the :func:`sql_skew_report` fragments."""
    return f"""
SELECT h.key, h.n, h.rank,
       CAST(1000000 * h.n // t.total_rows AS BIGINT) AS share_ppm,
       CAST((h.n + {target - 1}) // {target} AS BIGINT) AS salt,
       t.n_keys, t.total_rows, t.max_n,
       CAST(1000 * t.total_rows // t.n_keys AS BIGINT) AS mean_n_milli,
       q.p50_n, q.p90_n, q.p99_n,
       CAST(1000 * t.max_n * t.n_keys // t.total_rows AS BIGINT)
         AS skew_milli
FROM skw_heavy h, skw_totals t, skw_quants q"""
