"""Generic as-of join — the classic time-series operator Spark's
DataFrame API lacks (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``):
for every left row, attach the single right row with the same key and
the greatest right timestamp ``<=`` the left timestamp (``backward``;
``forward`` mirrors with the smallest ``>=``).

Spark-first plan — union + one keyed window, NOT a range join:

  1. tag both inputs (right side 0, left side 1), union by name;
  2. one window over (key ORDER BY ts, side[, tiebreak]) carrying
     ``last(right_payload, ignorenulls=True)`` — each left row picks
     up the latest right payload seen at-or-before it;
  3. keep the left rows, unpack the payload struct.

That is ONE shuffle on the join key and a single sort — the same cost
as the groupBy the caller was going to do anyway, with no range-cross
blowup and no per-key driver work, so it holds at 100 TB (skew bound =
the busiest key, as for any keyed window).  A broadcast-range join
would be quadratic per key; pandas ``merge_asof`` is single-node.

Tie semantics match DuckDB's inclusive ``ON l.ts >= r.ts``: at equal
timestamps the right row is ordered BEFORE the left row (side 0 < 1),
so it is visible to the left row's frame.  Among multiple right rows
sharing (key, ts) the one with the greatest ``tiebreak`` wins — the
cross-engine-deterministic choice (a SQL oracle dedupes right to
max-tiebreak per (key, ts); identical either way when timestamps are
unique, as microsecond event logs are in practice).

Timestamps are compared as epoch MICROsecond BIGINTs
(``unix_micros`` ≡ DuckDB ``epoch_us`` under the repo's UTC session),
so tolerance arithmetic is integer-exact cross-engine.

Reference analog: none in GreenExp_R (LLM-pipeline brief); semantics
follow DuckDB ASOF JOIN and pandas merge_asof.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_TS = "_asof_ts"
_PAY = "_asof_pay"
_SIDE = "_asof_side"
_TIE = "_asof_tie"


def _us(col: Column) -> Column:
    # parquet event timestamps are TIMESTAMP_NTZ; under the repo's
    # UTC session the cast to an instant is value-identity
    return F.unix_micros(col.cast("timestamp"))


def asof_join(left: DataFrame, right: DataFrame,
              key: str | Sequence[str] = "user_id",
              left_ts: str = "ts", right_ts: str = "ts",
              payload: Sequence[str] | None = None,
              direction: str = "backward",
              tolerance_us: int | None = None,
              tiebreak: str | None = None,
              prefix: str = "asof_") -> DataFrame:
    """Left as-of join: every ``left`` row plus ``prefix``-renamed
    ``payload`` columns from its as-of match in ``right`` (nulls when
    no right row qualifies, like a LEFT join).

    payload       right columns to carry over (default: all but key);
                  ``right_ts`` is always carried as ``prefix+right_ts``.
    direction     'backward' (greatest right ts <= left ts) or
                  'forward' (smallest right ts >= left ts).
    tolerance_us  optional max |left_ts - right_ts| in microseconds;
                  matches farther away are nulled (still left-join).
    tiebreak      right column ordering equal-(key, ts) right rows;
                  the greatest wins (NULLs lose to any non-null, like
                  SQL MAX).  Defaults to the last payload column.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, "
                         f"got {direction!r}")
    keys = [key] if isinstance(key, str) else list(key)
    if payload is None:
        payload = [c for c in right.columns
                   if c not in keys and c != right_ts]
    payload = list(dict.fromkeys([right_ts, *payload]))  # ts first
    if tiebreak is None:
        tiebreak = payload[-1]

    for c in (_TS, _PAY, _SIDE, _TIE):
        if c in left.columns:
            raise ValueError(f"left already has reserved column {c}")

    r = right.select(
        *keys,
        _us(F.col(right_ts)).alias(_TS),
        F.struct(*[F.col(c).alias(c) for c in payload]).alias(_PAY),
        F.lit(0).alias(_SIDE),
        F.col(tiebreak).alias(_TIE))
    tie_type = r.schema[_TIE].dataType
    l_tagged = (left
                .withColumn(_TS, _us(F.col(left_ts)))
                .withColumn(_SIDE, F.lit(1))
                .withColumn(_TIE, F.lit(None).cast(tie_type)))
    u = l_tagged.unionByName(r, allowMissingColumns=True)

    ts_ord = F.col(_TS).asc() if direction == "backward" \
        else F.col(_TS).desc()
    w = (Window.partitionBy(*keys)
         # nulls FIRST so a non-null tiebreak outranks NULL — the
         # "greatest tiebreak wins" contract must agree with a SQL
         # oracle's max(tiebreak) dedupe, and SQL MAX ignores NULLs
         .orderBy(ts_ord, F.col(_SIDE).asc(),
                  F.col(_TIE).asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = F.last(_PAY, ignorenulls=True).over(w)

    out = (u.withColumn(_PAY, matched)
           .filter(F.col(_SIDE) == 1))
    if tolerance_us is not None:
        # payload carries the raw right ts; recompute its micros
        gap = (F.col(_TS) - _us(F.col(_PAY)[right_ts])
               if direction == "backward"
               else _us(F.col(_PAY)[right_ts]) - F.col(_TS))
        out = out.withColumn(
            _PAY, F.when(gap <= F.lit(int(tolerance_us)),
                         F.col(_PAY)))
    return out.select(
        *[F.col(c) for c in left.columns],
        *[F.col(_PAY)[c].alias(prefix + c) for c in payload])
