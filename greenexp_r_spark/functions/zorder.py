"""Z-order (Morton) interleaving — spatial file clustering.

Min/max file stats prune 1-D ranges (icetable ``between``); spatial
queries are 2-D, so row order decides whether a bbox query opens a
handful of files or all of them.  Z-ordering by the interleaved cell
coordinates makes spatially-near tiles byte-near (the Delta Lake
``ZORDER BY`` / Iceberg sort-order idea): write the tile/point table
range-partitioned and sorted by the Morton key, record per-file
min/max of that ONE BIGINT column, and an AOI query prunes with the
bbox's corner codes — a coarse superset window (a bbox is not a
single Z-interval), which is exactly how engine-side minmax pruning
consumes clustering in production.

The interleave is branch-free magic-number bit spreading — literal
shifts and masks only, so the SAME arithmetic runs as whole-stage
codegen in Spark and bit-identically in DuckDB (both engines:
BIGINT ``<<``/``&``/``|`` with literal amounts).

Reference analog: none (the reference holds rasters in RAM);
public pattern per Morton 1966 + Delta/Iceberg clustering docs.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

ZBITS = 16                     # per-axis bits: 32-bit codes

_SPREAD = (                    # (shift, mask) rounds for 16→32 bits
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread(v: Column) -> Column:
    v = v.bitwiseAND(F.lit(0xFFFF))
    for s, m in _SPREAD:
        v = (v.bitwiseOR(F.shiftleft(v, s))).bitwiseAND(F.lit(m))
    return v


def morton2(x: Column, y: Column) -> Column:
    """Morton code of two non-negative integer coords (< 2^16 each —
    grid-cell indices, not raw metres; callers quantize first)."""
    return _spread(x.cast("long")).bitwiseOR(
        F.shiftleft(_spread(y.cast("long")), 1))


def _spread_sql(v: str) -> str:
    e = f"(({v}) & {0xFFFF})"
    for s, m in _SPREAD:
        e = f"((({e}) | (({e}) << {s})) & {m})"
    return e


def morton2_sql(x: str, y: str) -> str:
    """DuckDB rendering of :func:`morton2` (bit-identical)."""
    return (f"({_spread_sql(f'CAST({x} AS BIGINT)')}"
            f" | ({_spread_sql(f'CAST({y} AS BIGINT)')} << 1))")


def morton2_py(x: int, y: int) -> int:
    """Independent python reference for tests."""
    def spread(v: int) -> int:
        v &= 0xFFFF
        for s, m in _SPREAD:
            v = (v | (v << s)) & m
        return v
    return spread(x) | (spread(y) << 1)


def zorder_cluster(df, x_col: str, y_col: str, n_files: int):
    """Range-partition + sort by the Morton key — the write-side
    clustering step (each output file covers a compact Z-range, so
    its min/max ``z`` stats are tight)."""
    z = morton2(F.col(x_col), F.col(y_col)).alias("z")
    return (df.withColumn("z", z)
            .repartitionByRange(n_files, "z")
            .sortWithinPartitions("z"))
