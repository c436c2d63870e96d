"""Ordered-funnel conversion over an event log.

The classic product-analytics question — of the users who did stage 1,
how many went on to stage 2 strictly later, then stage 3 — expressed
as K-1 (filter -> equi-join -> re-aggregate) rounds on the user key:

    t1(u) = min ts of stage-1 events
    tk(u) = min ts of stage-k events with ts > t(k-1)(u)

Every round filters the event scan to ONE stage's rows BEFORE joining
(the join input is |stage-k events|, not the log), joins on the user
key, and partial-aggregates the min — so all K-1 rounds shuffle on the
same user_id key and AQE reuses the partitioning. No window over the
log, no per-user event collection: at 10^12 events the plan is K
filtered scans + K user-sized shuffles.

The reference's analogue is the verify pipeline's staged statuses (a
file must exist before it can hash-match — FV/PathInfo.cs:427-537
ordered checks); this is that ordered-milestone shape on an event log.

Timestamps surface as epoch MICROseconds (``unix_micros`` /
DuckDB ``epoch_us``) — parquet stores micros, so the conversion is
exact int64 and the oracle hash-matches without a float canon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STAGES = ("view", "click", "purchase")


def funnel(
    events: DataFrame,
    stages: "tuple[str, ...]" = DEFAULT_STAGES,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel times ``(user_id, t1_us, ..., tK_us,
    stages_reached)`` — ``tk_us`` is NULL once the chain breaks;
    ``stages_reached`` counts the non-NULL prefix. Users who never did
    stage 1 are absent (they are not IN the funnel)."""
    if len(stages) < 2:
        raise ValueError("a funnel needs at least 2 stages")
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.unix_micros(F.min(ts_col)).alias("t1_us"))
    )
    for k, stage in enumerate(stages[1:], start=2):
        nxt = (
            events.where(F.col(type_col) == stage)
            .select(user_col, F.unix_micros(F.col(ts_col)).alias("_us"))
            .join(cur.select(user_col, f"t{k - 1}_us"), user_col)
            .where(F.col("_us") > F.col(f"t{k - 1}_us"))
            .groupBy(user_col)
            .agg(F.min("_us").alias(f"t{k}_us"))
        )
        cur = cur.join(nxt, user_col, "left")
    reached = sum(
        (
            F.when(F.col(f"t{k}_us").isNotNull(), 1).otherwise(0)
            for k in range(2, len(stages) + 1)
        ),
        F.lit(1),
    )
    return cur.select(
        user_col,
        *[f"t{k}_us" for k in range(1, len(stages) + 1)],
        reached.cast("long").alias("stages_reached"),
    )


def sql_funnel(
    events_rel: str = "events",
    stages: "tuple[str, ...]" = DEFAULT_STAGES,
) -> str:
    """DuckDB mirror (bare SELECT, nested subqueries — the contract's
    WITH-helper owns the outer WITH)."""
    # join chain: f1 LEFT JOIN f2 ... LEFT JOIN fK, where fk's times
    # come from the recursively nested strictly-later chain
    joins = [f"({_stage_times(events_rel, stages, 1)}) f1"]
    for k in range(2, len(stages) + 1):
        joins.append(
            f"LEFT JOIN ({_stage_times(events_rel, stages, k)}) f{k}"
            f" ON f1.user_id = f{k}.user_id"
        )
    cols = ", ".join(f"f{k}.t{k}_us" for k in range(1, len(stages) + 1))
    reached = " + ".join(
        f"(CASE WHEN f{k}.t{k}_us IS NOT NULL THEN 1 ELSE 0 END)"
        for k in range(2, len(stages) + 1)
    )
    return (
        f"SELECT f1.user_id, {cols},"
        f" CAST(1 + {reached} AS BIGINT) AS stages_reached\n"
        f"FROM " + "\n".join(joins)
    )


def _stage_times(
    events_rel: str, stages: "tuple[str, ...]", upto: int
) -> str:
    """Times of stage ``upto`` (1-based) as (user_id, t{upto}_us) —
    recursively nested chain, each level min-over strictly-later
    events of its stage."""
    if upto == 1:
        return (
            f"SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS t1_us"
            f" FROM {events_rel} WHERE event_type = '{stages[0]}'"
            f" GROUP BY user_id"
        )
    inner = _stage_times(events_rel, stages, upto - 1)
    return (
        f"SELECT e.user_id,"
        f" CAST(min(epoch_us(e.ts)) AS BIGINT) AS t{upto}_us"
        f" FROM {events_rel} e JOIN ({inner}) p ON e.user_id = p.user_id"
        f" WHERE e.event_type = '{stages[upto - 1]}'"
        f" AND epoch_us(e.ts) > p.t{upto - 1}_us GROUP BY e.user_id"
    )


def retention(
    events: DataFrame,
    cohort_type: str = "signup",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Cohort retention triangle ``(cohort_day, offset_days, n_users)``:
    users are cohorted by the DAY of their first ``cohort_type`` event;
    for every later day a user had ANY event, the (cohort, day-offset)
    cell counts them once. Day 0 is the signup day itself.

    Shape: one user-keyed min-agg (cohort), one distinct over
    (user, day) — day-granular, so the distinct's input is bounded by
    users x days, not events — then a user-key join and the final
    (cohort, offset) count. ``cohort_day`` surfaces as 'yyyy-MM-dd'
    STRING so the oracle canon never sees engine-specific date
    formatting. Pre-signup activity is excluded (negative offsets are
    not retention).
    """
    first = (
        events.where(F.col(type_col) == cohort_type)
        .groupBy(user_col)
        .agg(F.min(F.to_date(ts_col)).alias("_cohort"))
    )
    active = events.select(
        user_col, F.to_date(ts_col).alias("_day")
    ).distinct()
    return (
        active.join(first, user_col)
        .where(F.col("_day") >= F.col("_cohort"))
        .select(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("_day", "_cohort").cast("long").alias(
                "offset_days"
            ),
        )
        .groupBy("cohort_day", "offset_days")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def sql_retention(
    events_rel: str = "events", cohort_type: str = "signup"
) -> str:
    """DuckDB mirror (bare SELECT)."""
    return f"""SELECT strftime(f._cohort, '%Y-%m-%d') AS cohort_day,
  CAST(date_diff('day', f._cohort, a._day) AS BIGINT) AS offset_days,
  CAST(count(*) AS BIGINT) AS n_users
FROM (SELECT DISTINCT user_id, CAST(ts AS DATE) AS _day
      FROM {events_rel}) a
JOIN (SELECT user_id, min(CAST(ts AS DATE)) AS _cohort
      FROM {events_rel} WHERE event_type = '{cohort_type}'
      GROUP BY user_id) f ON a.user_id = f.user_id
WHERE a._day >= f._cohort
GROUP BY 1, 2"""


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts over per-user event streams:
    ``(e_from, e_to, n, n_from, p_micro)`` where ``n`` counts adjacent
    (by time, within one user) event-type pairs, ``n_from`` the total
    transitions leaving ``e_from``, and ``p_micro = 1_000_000 * n div
    n_from`` the exact-integer maximum-likelihood transition probability
    — the navigation/clickstream model behind next-event prediction and
    anomaly scoring (a transition matrix is also what sessionized web
    logs feed to behavioral bot detection).

    Determinism: the per-user order is (ts, event_id) — event_id is
    globally unique, so ties in ts cannot reorder across engines.

    Scale shape: ONE shuffle — the lead() window partitions by user
    (bounded per-user groups; no global window) — then a hash-agg on
    the (e_from, e_to) key space (|types|^2, plan-time tiny) and a
    broadcast-sized self-rollup for the denominators. Zipf-hot users
    are a window-partition skew concern only at absurd per-user event
    counts; AQE handles the agg side because the key space is types,
    not users."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    pairs = (
        events.select(
            F.col(type_col).alias("e_from"),
            F.lead(type_col).over(w).alias("e_to"),
        )
        .where(F.col("e_to").isNotNull())
        .groupBy("e_from", "e_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    totals = pairs.groupBy("e_from").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    return pairs.join(F.broadcast(totals), "e_from").select(
        "e_from",
        "e_to",
        "n",
        "n_from",
        F.expr("(1000000 * n) div n_from").cast("long").alias("p_micro"),
    )


def sql_event_transitions(events_rel: str = "events") -> str:
    """DuckDB mirror (bare SELECT): identical window order and integer
    probability arithmetic."""
    return f"""SELECT p.e_from, p.e_to, p.n, t.n_from,
       CAST(1000000 * p.n // t.n_from AS BIGINT) AS p_micro
FROM (
  SELECT e_from, e_to, CAST(count(*) AS BIGINT) AS n
  FROM (
    SELECT event_type AS e_from,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS e_to
    FROM {events_rel}) x
  WHERE e_to IS NOT NULL GROUP BY 1, 2
) p
JOIN (
  SELECT e_from, CAST(sum(n) AS BIGINT) AS n_from
  FROM (
    SELECT e_from, CAST(count(*) AS BIGINT) AS n
    FROM (
      SELECT event_type AS e_from,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS e_to
      FROM {events_rel}) y
    WHERE e_to IS NOT NULL GROUP BY 1
  ) GROUP BY 1
) t ON p.e_from = t.e_from"""
