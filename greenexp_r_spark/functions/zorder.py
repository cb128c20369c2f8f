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


def z_ranges(x0: int, y0: int, x1: int, y1: int,
             max_ranges: int = 16) -> list[tuple[int, int]]:
    """Tight Z-interval cover of the bbox [x0,x1]×[y0,y1] (inclusive)
    — the Tropf–Herzog LITMAX/BIGMIN idea via quadtree descent: an
    aligned quad wholly inside the bbox contributes one contiguous
    Z-interval; partial quads split until ``max_ranges`` would be
    exceeded, at which point the remaining partial quad degrades to
    its (still sound) corner-code superset window.  Adjacent
    intervals merge, so the result is minimal for the budget.

    Driver-side planning helper (the bbox is a literal): the output
    feeds N ``between`` prunes whose union is far tighter than the
    single corner window when the bbox crosses a high Z bit.
    """
    if not (0 <= x0 <= x1 < (1 << ZBITS)
            and 0 <= y0 <= y1 < (1 << ZBITS)):
        raise ValueError(f"bbox [{x0},{x1}]x[{y0},{y1}] must be "
                         f"non-empty within [0, {(1 << ZBITS) - 1}]")
    out: list[tuple[int, int]] = []

    def cover(qx: int, qy: int, size: int, budget: int) -> int:
        """Append intervals for quad (qx..qx+size-1)², return budget
        left."""
        if qx > x1 or qy > y1 or qx + size - 1 < x0 \
                or qy + size - 1 < y0:
            return budget                       # disjoint
        if (qx >= x0 and qy >= y0 and qx + size - 1 <= x1
                and qy + size - 1 <= y1) or size == 1:
            out.append((morton2_py(qx, qy),
                        morton2_py(qx + size - 1, qy + size - 1)))
            return budget                       # wholly inside: exact
        if budget <= 3:
            # degrade: the quad∩bbox corner window — sound by
            # monotonicity, and ⊆ the global corner window, so the
            # merged cover can never exceed the naive single window
            out.append((morton2_py(max(qx, x0), max(qy, y0)),
                        morton2_py(min(qx + size - 1, x1),
                                   min(qy + size - 1, y1))))
            return budget
        h = size // 2
        for dx in (0, h):
            for dy in (0, h):
                budget = cover(qx + dx, qy + dy, h, budget - 1)
        return budget

    cover(0, 0, 1 << ZBITS, max_ranges * 4)
    out.sort()
    merged = [out[0]]
    for lo, hi in out[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    return merged


def zorder_cluster(df, x_col: str, y_col: str, n_files: int):
    """Range-partition + sort by the Morton key — the write-side
    clustering step (each output file covers a compact Z-range, so
    its min/max ``z`` stats are tight)."""
    z = morton2(F.col(x_col), F.col(y_col)).alias("z")
    return (df.withColumn("z", z)
            .repartitionByRange(n_files, "z")
            .sortWithinPartitions("z"))
