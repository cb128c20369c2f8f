"""Ordered-funnel analysis over the events table — "users who did
view → click → purchase, in order", the classic behavioral query
(every product-analytics engine ships it; here it is the events-table
twin of the session operator).

Semantics: per user, t₁ = earliest step-1 event; tᵢ = earliest
step-i event STRICTLY after tᵢ₋₁ (first-touch attribution); an
optional ``within_s`` bounds every step to t₁ + window.  Output keeps
every user who entered the funnel, with null timestamps past their
drop-off point and the completed-step count.

Plan shape at scale: one filtered, user-keyed aggregate per step —
the event scan prunes to the step's type (pushed filter), every join
and aggregate is keyed by user_id, so the chain reuses ONE exchange
lineage; frontiers shrink monotonically (fᵢ ⊆ fᵢ₋₁).  No windows, no
self-joins of the raw stream.

Exactness: MIN over timestamps and strict comparisons on epoch
micros — integer arithmetic end to end, DuckDB bit-parity in
tests/test_funnel.py.

Reference analog: none in GreenExp_R (LLM/analytics-pipeline brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel(events: DataFrame,
           steps: tuple[str, ...] = FUNNEL_STEPS,
           within_s: int | None = None) -> DataFrame:
    """(user_id, ts_1..ts_k, completed) — one row per user who
    performed step 1."""
    ev = events.select(
        "user_id", "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
    cur = (ev.where(F.col("event_type") == steps[0])
           .groupBy("user_id")
           .agg(F.min("us").alias("us_1")))
    frontiers = [cur]
    for i, step in enumerate(steps[1:], start=2):
        prev = frontiers[-1]
        nxt = (ev.where(F.col("event_type") == step)
               .join(prev, "user_id")
               .where(F.col("us") > F.col(f"us_{i - 1}")))
        if within_s is not None:
            nxt = nxt.where(
                F.col("us") <= F.col("us_1") + within_s * 1_000_000)
        frontiers.append(
            nxt.groupBy("user_id", *[f"us_{j}"
                                     for j in range(1, i)])
               .agg(F.min("us").alias(f"us_{i}")))
    out = frontiers[0]
    for i, f in enumerate(frontiers[1:], start=2):
        out = out.join(f.select("user_id", f"us_{i}"),
                       "user_id", "left")
    completed = sum(
        (F.col(f"us_{i}").isNotNull().cast("long")
         for i in range(2, len(steps) + 1)),
        F.lit(1).cast("long"))
    cols = [F.timestamp_micros(F.col(f"us_{i}")).alias(f"ts_{i}")
            for i in range(1, len(steps) + 1)]
    return out.select("user_id", *cols, completed.alias("completed"))


def funnel_summary(events: DataFrame,
                   steps: tuple[str, ...] = FUNNEL_STEPS,
                   within_s: int | None = None) -> DataFrame:
    """(step, n_users) — users reaching each ordinal step (the
    conversion table a funnel chart plots).  ONE pass over the
    per-user funnel: k conditional sums in a single aggregate, then
    an unpivot of the k-column row."""
    f = funnel(events, steps, within_s)
    k = len(steps)
    # COALESCE: SUM over an empty per-user table (nobody performed
    # step 1) is NULL — the summary contract is "all k rows, zero
    # counts", matching the zero-filled step axis the SQL oracle uses
    row = f.agg(*[
        F.coalesce(F.sum((F.col("completed") >= i).cast("long")),
                   F.lit(0).cast("long"))
        .alias(f"s{i}") for i in range(1, k + 1)])
    stacked = ", ".join(f"CAST({i} AS BIGINT), s{i}"
                        for i in range(1, k + 1))
    return row.selectExpr(
        f"stack({k}, {stacked}) AS (step, n_users)")


def funnel_sql(steps: tuple[str, ...] = FUNNEL_STEPS,
               within_s: int | None = None,
               table: str = "events") -> str:
    """DuckDB rendering of :func:`funnel` (bit-exact)."""
    def q(s):
        return "'" + s.replace("'", "''") + "'"

    ctes = [f"""
f1 AS (
  SELECT user_id, MIN(epoch_us(ts)) AS us_1
  FROM {table} WHERE event_type = {q(steps[0])}
  GROUP BY user_id
)"""]
    for i, step in enumerate(steps[1:], start=2):
        prev_cols = ", ".join(f"us_{j}" for j in range(1, i))
        win = (f" AND epoch_us(e.ts) <= us_1 + {within_s * 1_000_000}"
               if within_s is not None else "")
        ctes.append(f"""
f{i} AS (
  SELECT e.user_id, {prev_cols}, MIN(epoch_us(e.ts)) AS us_{i}
  FROM {table} e JOIN f{i - 1} p ON e.user_id = p.user_id
  WHERE e.event_type = {q(step)}
    AND epoch_us(e.ts) > us_{i - 1}{win}
  GROUP BY e.user_id, {prev_cols}
)""")
    k = len(steps)
    ts_cols = ", ".join(
        f"make_timestamp(f{i}.us_{i}) AS ts_{i}" if i > 1 else
        "make_timestamp(f1.us_1) AS ts_1" for i in range(1, k + 1))
    joins = " ".join(
        f"LEFT JOIN f{i} ON f{i}.user_id = f1.user_id"
        for i in range(2, k + 1))
    completed = " + ".join(
        ["CAST(1 AS BIGINT)"] +
        [f"CASE WHEN f{i}.us_{i} IS NOT NULL THEN 1 ELSE 0 END"
         for i in range(2, k + 1)])
    return f"""
WITH {','.join(ctes)}
SELECT f1.user_id, {ts_cols},
       CAST({completed} AS BIGINT) AS completed
FROM f1 {joins}
"""
