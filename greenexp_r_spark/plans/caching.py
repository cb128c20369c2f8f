"""Session-scoped cache bookkeeping.

Operators that persist an intermediate (MinHash shingle arrays,
quantized embedding corpora) register the DataFrame here instead of
calling .persist() bare.  Spark's CacheManager never drops a persisted
DataFrame on its own, so in a long-lived session running the whole
query registry those caches accumulate in storage memory.  Each
tracked_persist() first releases every cache from *previous* operator
invocations — queries in the gate/bench run to completion one at a
time, so at any moment only the operator currently being built holds
live caches.  Unpersisting is always safe for correctness: a consumer
of an already-released DataFrame just recomputes its lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_live: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist every tracked cache (no-op on already-released ones)."""
    while _live:
        df = _live.pop()
        try:
            df.unpersist()
        except Exception:
            pass                      # session already stopped


def tracked_persist(df: DataFrame, fresh: bool = True) -> DataFrame:
    """persist() with registration; `fresh=True` (the default) first
    releases caches left over from prior operator invocations."""
    if fresh:
        release_caches()
    out = df.persist()
    _live.append(out)
    return out
