"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``greenexp_r_spark/`` (see SURVEY.md §2 for
the operator inventory each query exercises).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from greenexp_r_spark import registry, world
from greenexp_r_spark.operators import accessibility, availability


def entry(spark: SparkSession) -> DataFrame:
    """Flagship three-family exposure over the input_hint pages table
    at sf0.001: Common-Crawl-style captures (url, warc_ts, html, text,
    lang) → latest-snapshot dedup → byte-identical text extraction
    from html → url geocoding → availability (buffer-zonal mean/sd
    NDVI) + accessibility (distance to nearest ≥400 m² park, in-300m
    flag) keyed by url, plus visibility (VGVI) for the sampled
    observer subset — the full availability+accessibility+visibility
    join of BASELINE.json's metric.  The avail+access core is
    gate-checked against its DuckDB oracle as q_exposure_pages (and
    the point-keyed variant as q_exposure_combined); VGVI is
    kernel-verified."""
    return registry.flagship_exposure_pages(spark,
                                            "/root/testdata/sf0.001")


def _at_query_boundary(fn):
    """Query-scoped cache lifecycle (ADVICE r03 #5): building query
    N+1 releases query N's tracked caches; persists WITHIN one
    composed query all stay live together."""
    def run(spark, sf):
        from greenexp_r_spark.plans.caching import release_caches
        release_caches()
        return fn(spark, sf)
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _at_query_boundary(spec.spark)
            for name, spec in registry.build_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle
            for name, spec in registry.build_registry().items()
            if spec.oracle is not None}
