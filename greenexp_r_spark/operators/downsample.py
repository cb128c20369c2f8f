"""Hypertable-style time-bucket rollup (continuous-aggregate
downsampling) and gap-fill — the TimescaleDB ``time_bucket`` /
``first``/``last`` / ``locf`` surface re-expressed Spark-first.

``time_bucket_rollup`` is ONE hash aggregate (map-side combinable, one
shuffle on (key, bucket)): open/close — the value at the earliest /
latest row of the bucket — ride lexicographic MIN/MAX of a
``struct(ts_us, tiebreak, value)``, so no window pass and no second
shuffle.  Determinism at equal timestamps comes from the tiebreak
column inside the struct, the same cross-engine contract the as-of
join uses (operators/asof.py).

Bucket starts are computed WITHOUT division — ``us - pmod(us, width)``
on epoch-microsecond BIGINTs (subtract-FLOOR-mod: plain ``%`` keeps
the dividend's sign in both Spark and DuckDB, so a pre-1970 timestamp
would land in the bucket STARTING AFTER it and diverge from the
epoch-anchored ``window()`` streaming twin; the oracle uses the
``((us % w) + w) % w`` rendering), sidestepping the float-division
rounding trap that bit exactness forbids.  The value sum is a
micro-unit BIGINT sum (``round(v·10⁶)``), the repo's cross-engine
doctrine for summed doubles; open/close/min/max are raw untouched
doubles and therefore bit-exact.

``gapfill_locf`` densifies each key's bucket axis ([min, max] per
key via an exploded ``sequence`` — bounded by the key's own span, no
global cross) and carries ``close_v`` forward (LOCF) with one keyed
window: empty buckets get n_rows=0, sum 0, open/min/max NULL, and the
last observed close.  That is one extra shuffle only if the
aggregation partitioning is lost; on the direct composition Catalyst
reuses the (key)-clustered exchange.

Scale: rollup output is |keys|·|active buckets| — the downsampled
table, ≪ input; gapfill output is |keys|·|span buckets|, explicitly
bounded by the caller's bucket width choice.  Skew bound = rows per
(key, bucket), i.e. the hottest key's rate × width.

Reference analog: none in GreenExp_R (LLM-pipeline brief); semantics
follow TimescaleDB time_bucket/first/last/locf and the task brief's
"hypertable rollup" operator example.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_US = "_ds_us"


def time_bucket_rollup(events: DataFrame, width_s: int = 900,
                       key: str = "user_id", ts: str = "ts",
                       val: str = "value",
                       tiebreak: str = "event_id") -> DataFrame:
    """Per (key, bucket) OHLC downsample: n_rows, sum_micro (BIGINT
    micro-units), open_v/close_v (value at the first/last row by
    (ts, tiebreak)), min_v/max_v.  ``bucket`` is the bucket-start
    timestamp of a ``width_s``-second grid anchored at the epoch."""
    w_us = int(width_s) * 1_000_000
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    bucket = F.timestamp_micros(us - F.pmod(us, F.lit(w_us)))
    return (events
            .withColumn(_US, us)
            .groupBy(F.col(key).alias("key"), bucket.alias("bucket"))
            .agg(*ohlc_aggs(val, tiebreak)))


def ohlc_aggs(val: str = "value",
              tiebreak: str = "event_id") -> list:
    """The six OHLC aggregate Columns — the SINGLE definition shared
    by the batch rollup and the streaming continuous aggregate
    (streaming/events_stream.downsample_stream), so the stream≡batch
    bit-equality contract is structural, not just tested."""
    first_s = F.struct(F.col(_US), F.col(tiebreak), F.col(val))
    return [F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col(val) * 1_000_000).cast("long"))
            .alias("sum_micro"),
            F.min(first_s).getField(val).alias("open_v"),
            F.max(first_s).getField(val).alias("close_v"),
            F.min(val).alias("min_v"),
            F.max(val).alias("max_v")]


def gapfill_locf(rollup: DataFrame, width_s: int = 900) -> DataFrame:
    """Densify ``time_bucket_rollup`` output: every key gets every
    bucket in [its min, its max] (missing ones with n_rows=0,
    sum_micro=0, NULL open/min/max) and ``close_locf`` = the last
    non-null close at or before the bucket."""
    w_us = int(width_s) * 1_000_000
    bus = F.unix_micros(F.col("bucket").cast("timestamp"))
    axis = (rollup
            .groupBy("key")
            .agg(F.min(bus).alias("_lo"), F.max(bus).alias("_hi"))
            .select("key",
                    F.explode(F.sequence("_lo", "_hi", F.lit(w_us)))
                    .alias("_bus"))
            .select("key", F.timestamp_micros(F.col("_bus"))
                    .alias("bucket")))
    dense = (axis.join(rollup, ["key", "bucket"], "left")
             .withColumn("n_rows",
                         F.coalesce("n_rows", F.lit(0).cast("long")))
             .withColumn("sum_micro",
                         F.coalesce("sum_micro",
                                    F.lit(0).cast("long"))))
    w = (Window.partitionBy("key")
         .orderBy(F.col("bucket").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return dense.withColumn(
        "close_locf", F.last("close_v", ignorenulls=True).over(w))
