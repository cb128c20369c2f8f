"""Operators over the input_hint pages table (url, warc_ts, html,
text, lang): snapshot dedup, byte-identical text extraction, url
geocoding, cell bucketing with the broadcast cell→polygon index, and
the end-to-end exposure join keyed by url — the north_rule pipeline:

    pages → latest capture per url → extract text from html →
    geocode url → availability + accessibility exposure per page.

Reference parity: the exposure math is exactly GreenExp_R's
availability (ndvi_calc.R:332-344) and accessibility
(accessibility.R:307-315) families — here addressed by url instead of
a house point id, which is the graft's axis (web pages as address
points).

Scale notes (100 TB posture):
  * ``latest_snapshot`` is ONE hash aggregate on url (max-struct →
    map-side partials; shuffle volume = O(distinct urls), the payload
    rides inside the struct only for the winning rows of each partial).
  * ``extract_text`` / ``geocode`` are narrow JVM projections
    (decode/substring/regexp) — zero Python, zero shuffle.
  * the exposure join reuses the availability explode plan and the
    cell-index equi-join accessibility plan (knn_cells) — never a
    nested-loop; the two family results join back on the parsed
    point id (equi, AQE-managed).
  * ``cell_page_stats`` is the H3/S2-analog bucketing: a broadcast
    cell→park membership index (per-park radius explode, corner
    pruned) joined on cell_id, then per-url then per-cell integer
    aggregates — skewed urban cells are handled by AQE skew split on
    the first aggregate's shuffle (the explicit salting variant for
    the equi-join lives in plans/salting.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import constants as C
from ..sources import pages as P
from ..functions.geo import dist2_long
from . import availability
from .knn_cells import euclidean_access_cells


def latest_snapshot(pages: DataFrame) -> DataFrame:
    """Latest capture per url (Common-Crawl snapshot semantics):
    keep the row with MAX(warc_ts).  Capture times are distinct per
    url by construction (sources/pages.py); the struct comparator
    would break ties on the payload deterministically anyway."""
    s = F.max(F.struct("warc_ts", "html", "text", "lang")).alias("s")
    g = pages.groupBy("url").agg(s)
    return g.select("url", "s.warc_ts", "s.html", "s.text", "s.lang")


def snapshot_delta(pages: DataFrame, cutoff_us: int) -> DataFrame:
    """CDC between two crawl snapshots of the append-only pages table:
    the as-of-`cutoff_us` snapshot vs the current one, per url —
    the dump-over-dump diff a CC-style pipeline runs to process only
    what changed (the Iceberg incremental-read analog, computed from
    the raw capture log).

    ONE url-keyed aggregate computes BOTH snapshots via a conditional
    struct max (no self-join, no second scan): old = max struct among
    captures ≤ cutoff, new = max struct overall.  Status:
      'added'           first captured after the cutoff
      'unchanged'       no capture after the cutoff
      'recrawled_same'  re-captured after the cutoff, same payload
      'changed'         re-captured after the cutoff, new payload
    100 TB posture: the only shuffle is the url-keyed agg the snapshot
    query already pays; at production scale the old side would be the
    previous run's materialized snapshot and this degenerates to the
    same single aggregate over the new increment.
    """
    cut = F.timestamp_micros(F.lit(cutoff_us))
    old_s = F.max(F.when(F.col("warc_ts") <= cut,
                         F.struct("warc_ts", "text"))).alias("o")
    new_s = F.max(F.struct("warc_ts", "text")).alias("n")
    g = pages.groupBy("url").agg(old_s, new_s)
    status = (F.when(F.col("o").isNull(), "added")
              .when(F.col("n.warc_ts") == F.col("o.warc_ts"),
                    "unchanged")
              .when(F.col("n.text") == F.col("o.text"),
                    "recrawled_same")
              .otherwise("changed"))
    return g.select(
        "url", F.col("o.warc_ts").alias("old_ts"),
        F.col("n.warc_ts").alias("new_ts"), status.alias("status"))


def snapshot_delta_sql(d, cutoff_us: int) -> str:
    """Shared-SQL rendering of :func:`snapshot_delta` (assumes a
    preceding `pages` CTE) — conditional MAX + two equi-joins back to
    the capture log (engines without struct-max ordering).  The final
    GROUP BY + MAX(text) collapses equal-timestamp captures to ONE row
    with the lexicographically-largest payload, matching the engine's
    struct-max tie-break exactly (struct comparison falls through
    warc_ts to text)."""
    return f"""
agg AS (
  SELECT url,
         MAX(CASE WHEN warc_ts <= {d.ts_micros(cutoff_us)}
                  THEN warc_ts END) AS old_ts,
         MAX(warc_ts) AS new_ts
  FROM pages GROUP BY url
),
delta AS (
  SELECT a.url, a.old_ts, a.new_ts,
         CASE WHEN a.old_ts IS NULL THEN 'added'
              WHEN a.new_ts = a.old_ts THEN 'unchanged'
              WHEN MAX(pn.text) = MAX(po.text) THEN 'recrawled_same'
              ELSE 'changed' END AS status
  FROM agg a
  LEFT JOIN pages po ON po.url = a.url AND po.warc_ts = a.old_ts
  JOIN pages pn ON pn.url = a.url AND pn.warc_ts = a.new_ts
  GROUP BY a.url, a.old_ts, a.new_ts
)"""


def extract_text(pages: DataFrame) -> DataFrame:
    """Re-extract the text from the html payload (byte-identical
    invariant): decode UTF-8, strip the fixed wrapper.  Emits the
    extracted value as ``text`` — downstream consumers (and the gate's
    value hash) see extraction output, never the stored text column."""
    ext = F.expr(
        f"substring(decode(html, 'UTF-8'), {len(P.HTML_PRE) + 1}, "
        f"length(decode(html, 'UTF-8')) - {P.WRAP_LEN})")
    return pages.select(
        "url", "warc_ts", ext.alias("text"), "lang",
        F.length(ext).cast("long").alias("n_chars"))


def geocode(pages: DataFrame) -> DataFrame:
    """Geocode urls to world coordinates: parse the page id out of the
    url (regexp, JVM) and apply the deterministic LCG the world uses
    for address points (world.x_expr/y_expr) — the pages analog of
    the reference's geocoded address input (Ams_Houses)."""
    pid = F.regexp_extract(F.col("url"), P.URL_ID_RE, 1).cast("long")
    x = ((pid * C.X_MUL + C.X_ADD) % C.P31) % C.WORLD_SIZE
    y = ((pid * C.Y_MUL + C.Y_ADD) % C.P31) % C.WORLD_SIZE
    return pages.withColumn("point_id", pid) \
                .withColumn("x", x.cast("double")) \
                .withColumn("y", y.cast("double"))


def latest_extracted_snapshot(pages: DataFrame) -> DataFrame:
    """Extraction-first snapshot: extract text per capture (narrow,
    drops the html payload BEFORE the shuffle — the url aggregate then
    carries text once instead of html+text, ~halving shuffle bytes at
    corpus scale), then the same max-struct argmax per url.  Row-
    identical to extract_text(latest_snapshot(...)): extraction is a
    deterministic per-row map and capture times are tie-free."""
    ext = extract_text(pages)
    s = F.max(F.struct("warc_ts", "text", "lang", "n_chars")).alias("s")
    return (ext.groupBy("url").agg(s)
            .select("url", "s.warc_ts", "s.text", "s.lang", "s.n_chars"))


def pages_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exposure-path shape: latest capture per url with text
    re-extracted from html (no delta columns — the exposure join
    prunes them anyway, but keeping this entry narrow keeps the
    north-star plan's agg state minimal)."""
    return latest_extracted_snapshot(P.pages_df(spark, sf_dir))


def pages_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate shape (q_pages_snapshot): the extraction-first snapshot
    PLUS the as-of-cutoff CDC columns (old_ts, status) from the SAME
    single url-keyed aggregate — snapshot_delta's conditional struct
    max rides alongside the snapshot struct, so the gate proves both
    the byte-identical-text invariant and the dump-over-dump delta
    semantics for one shuffle."""
    ext = extract_text(P.pages_df(spark, sf_dir))
    cut = F.timestamp_micros(F.lit(C.SNAP_CUTOFF_US))
    new_s = F.max(F.struct("warc_ts", "text", "lang", "n_chars")) \
        .alias("s")
    old_s = F.max(F.when(F.col("warc_ts") <= cut,
                         F.struct("warc_ts", "text"))).alias("o")
    g = ext.groupBy("url").agg(new_s, old_s)
    status = (F.when(F.col("o").isNull(), "added")
              .when(F.col("s.warc_ts") == F.col("o.warc_ts"),
                    "unchanged")
              .when(F.col("s.text") == F.col("o.text"),
                    "recrawled_same")
              .otherwise("changed"))
    return g.select("url", "s.warc_ts", "s.text", "s.lang",
                    "s.n_chars", F.col("o.warc_ts").alias("old_ts"),
                    status.alias("status"))


def exposure_over_pages(spark: SparkSession, sf_dir: str,
                        parks: DataFrame | None = None) -> DataFrame:
    """The north-star query: per (deduplicated, geocoded) page,
    availability (buffer-zonal NDVI mean/sd) + accessibility (distance
    to nearest ≥400 m² park through the cell-index plan, strict-<
    in-buffer flag), keyed by url."""
    from .. import world
    parks = parks if parks is not None else world.parks_df(spark)
    geo = geocode(pages_snapshot(spark, sf_dir))
    # materialize the (small, text-free) geocoded snapshot once:
    # without this the snapshot shuffle + parquet scan replays in each
    # family branch (measured: 5 scans / 3 snapshot exchanges, zero
    # ReusedExchange) — at corpus scale that triples the ingest cost.
    # localCheckpoint output is O(urls) rows of ~90 bytes.
    pts = geo.select("point_id", "url", "warc_ts", "x", "y",
                     "n_chars").localCheckpoint(eager=False)
    av = availability.ndvi_zonal(pts)
    ac = euclidean_access_cells(pts, parks)
    return (pts.join(av, "point_id").join(ac, "point_id")
            .select("url", "warc_ts", "x", "y", "n_chars",
                    "mean_ndvi", "sd_ndvi", "n_cells",
                    "closest_greenspace", "greenspace_in_buffer"))


def cell_membership_index(parks: DataFrame,
                          cell: int = C.CELL_SIZE) -> DataFrame:
    """(cell_id, park_id, cx, cy, radius): every bucket cell that a
    park's disc could reach — the broadcast cell→polygon index of the
    north_rule, radius-exact per park (corner-pruned)."""
    p = parks.select("park_id", "cx", "cy", "radius")
    lo = lambda c: F.floor((F.col(c) - F.col("radius")) / cell).cast("long")
    hi = lambda c: F.floor((F.col(c) + F.col("radius")) / cell).cast("long")
    e = (p.withColumn("bx", F.explode(F.sequence(lo("cx"), hi("cx"))))
          .withColumn("by", F.explode(F.sequence(lo("cy"), hi("cy")))))
    ccx = (F.col("bx") + 0.5) * cell
    ccy = (F.col("by") + 0.5) * cell
    half = cell / 2.0
    dx = F.greatest(F.abs(ccx - F.col("cx")) - half, F.lit(0.0))
    dy = F.greatest(F.abs(ccy - F.col("cy")) - half, F.lit(0.0))
    e = e.where(dx * dx + dy * dy <= F.col("radius") * F.col("radius"))
    return e.select(
        (F.col("bx") * C.CELL_SHIFT + F.col("by")).alias("cell_id"),
        "park_id", "cx", "cy", "radius")


def cell_page_stats(spark: SparkSession, sf_dir: str,
                    parks: DataFrame | None = None,
                    cell: int = C.CELL_SIZE,
                    salted: bool = False,
                    hot_threshold: int = 10_000,
                    n_salt: int = 8) -> DataFrame:
    """Per-bucket-cell page counts + point-in-greenspace counts over
    the deduplicated pages table: the cell-bucketed spatial-join shape
    of the north_rule (points bucketed by cell, broadcast cell→polygon
    index, PIP test vectorized JVM-side).  Membership is inclusive
    (d ≤ r, all parks — PIP has no minimum-size filter).

    Output: (cell_i, cell_j, n_pages, n_in_park).

    ``salted=True`` takes the non-broadcast regime (an index too large
    to broadcast — continental park layers at 10^12 points): the join
    becomes a shuffle equi-join on cell_id with explicit hot-cell
    salting (plans/salting.py — probe rows of hot cells spread over
    n_salt reducers, build rows replicated), results identical
    (tests/test_pages.py::test_cell_stats_salted_equals_broadcast)."""
    from .. import world
    parks = parks if parks is not None else world.parks_df(spark)
    geo = geocode(pages_snapshot(spark, sf_dir))
    pts = geo.select(
        "url", "x", "y",
        F.floor(F.col("x") / cell).cast("long").alias("cell_i"),
        F.floor(F.col("y") / cell).cast("long").alias("cell_j"))
    pts = pts.withColumn(
        "cell_id", F.col("cell_i") * C.CELL_SHIFT + F.col("cell_j"))
    idx = cell_membership_index(parks, cell)
    if salted:
        from ..plans.salting import salted_join
        hit = salted_join(pts, idx, "cell_id", row_key="url",
                          threshold=hot_threshold, n_salt=n_salt,
                          how="left")
    else:
        hit = pts.join(F.broadcast(idx), "cell_id", "left")
    hit = (hit
           .withColumn(
               "in_park",
               F.when(F.col("park_id").isNotNull()
                      & (dist2_long(F.col("x"), F.col("y"), F.col("cx"),
                                    F.col("cy"))
                         <= (F.col("radius") * F.col("radius"))
                         .cast("long")),
                      F.lit(1)).otherwise(F.lit(0))))
    per_url = (hit.groupBy("url", "cell_i", "cell_j")
               .agg(F.max("in_park").alias("in_park")))
    return (per_url.groupBy("cell_i", "cell_j")
            .agg(F.count(F.lit(1)).alias("n_pages"),
                 F.sum("in_park").cast("long").alias("n_in_park")))
