"""Iceberg-style snapshot table over parquet (jar-free model).

BASELINE.json's north_rule reads pages from an Iceberg table.  This
container ships no iceberg-spark-runtime jar (and nothing may be
installed), so the Iceberg *contract* is modeled with the same
on-disk ideas the real format uses — immutable data files + an
atomically-swapped metadata pointer — in pure parquet + JSON:

    table/
      data/s<snapshot>-<uuid>/part-*.parquet  immutable data files
                                          (unique staging dir per
                                          attempt → crash-retryable)
      meta/v{N}.json                      manifest: file list with
                                          per-file row counts +
                                          min/max column stats
      meta/VERSION                        current-snapshot pointer
                                          (atomic os.replace swap)

What this buys, mirroring Iceberg semantics:
  * **atomic commits / resumability** — a crashed write leaves staged
    data files but never bumps VERSION, so readers keep seeing the
    previous snapshot (the manifest IS the per-partition checkpoint;
    plans/manifest.py holds the finer-grained per-unit resume path).
  * **time travel** — ``read(spark, path, snapshot=k)`` plans from
    v{k}.json's explicit file list.
  * **scan pruning** — ``read(..., between=("col", lo, hi))`` drops
    files whose [min, max] range misses the predicate *before* the
    scan, the manifest-stats pruning Iceberg does at planning time
    (proven by an input-file-count test).
  * **lineage + row-count metrics** — every manifest entry records the
    file's row count and stats; ``metrics()`` exposes them per file
    and per snapshot (the north_rule's per-partition lineage).

At 100 TB the only driver-side state is the manifest (file paths +
stats, KBs per thousand files); data planning stays O(files), and the
file list is handed to the DataFrame reader so Spark still does its
own split planning, column pruning and filter pushdown inside each
file.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

import numpy as np
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession


# ----------------------------------------------------------- bucket()
#
# Iceberg's bucket(N, col) partition transform (spec: murmur3_x86_32
# of the value's little-endian 8-byte form, & Integer.MAX_VALUE, % N).
# Implemented once in vectorized numpy and used on BOTH sides: the
# write path (Arrow-batched pandas UDF assigns each row's bucket) and
# the planner (read() hashes the predicate literal the same way), so
# bucket pruning is a pure manifest lookup.

def murmur3_32_long(v, seed: int = 0) -> np.ndarray:
    """murmur3_x86_32 over the 8-byte little-endian encoding of int64
    values, vectorized (public reference algorithm)."""
    with np.errstate(over="ignore"):
        v = np.atleast_1d(np.asarray(v)).astype(np.int64).view(np.uint64)
        blocks = [(v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                  (v >> np.uint64(32)).astype(np.uint32)]
        h = np.full(v.shape, seed, dtype=np.uint32)
        c1 = np.uint32(0xCC9E2D51)
        c2 = np.uint32(0x1B873593)

        def rotl(x: np.ndarray, r: int) -> np.ndarray:
            return (x << np.uint32(r)) | (x >> np.uint32(32 - r))

        for k in blocks:
            k = k * c1
            k = rotl(k, 15)
            k = k * c2
            h = h ^ k
            h = rotl(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)               # input length in bytes
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
        return h


def bucket_of(value, n: int) -> int:
    """Iceberg bucket id of a long value: (murmur3 & MAX_INT) % n."""
    h = murmur3_32_long(value)
    return int((h[0] & np.uint32(0x7FFFFFFF)) % np.uint32(n))


@dataclass
class FileEntry:
    path: str
    rows: int
    stats: dict          # col -> [min, max] (numeric/string leaf cols)
    partition: dict | None = None   # e.g. {"bucket": 3}


def _json_safe(v):
    """Manifest stats must be JSON: timestamps → ISO strings (which
    compare lexicographically like the instants they encode), bytes →
    dropped by the caller's stat-col list, numbers pass through."""
    if isinstance(v, (int, float, str)) or v is None:
        return v
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def _file_entry(path: str, stat_cols: list[str]) -> FileEntry:
    md = pq.ParquetFile(path).metadata
    rows = md.num_rows
    stats: dict = {}
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    for col in stat_cols:
        i = names.get(col)
        if i is None:
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(i).statistics
            if s is None or not s.has_min_max:
                lo = hi = None
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            lo, hi = _json_safe(lo), _json_safe(hi)
            if isinstance(lo, str):
                lo, hi = _trunc_bounds(lo, hi)
            stats[col] = [lo, hi]
    return FileEntry(path, rows, stats)


_STAT_TRUNC = 64


def _trunc_bounds(lo: str, hi: str) -> tuple[str, str]:
    """Iceberg-style bound truncation so the manifest never embeds
    whole documents: a prefix is a valid lower bound as-is; the upper
    bound's last kept char is bumped to stay an upper bound."""
    if len(lo) > _STAT_TRUNC:
        lo = lo[:_STAT_TRUNC]
    if len(hi) > _STAT_TRUNC:
        p = hi[:_STAT_TRUNC]
        hi = p[:-1] + chr(ord(p[-1]) + 1)
    return lo, hi


def _meta_dir(table: str) -> str:
    return os.path.join(table, "meta")


def _version_file(table: str) -> str:
    return os.path.join(_meta_dir(table), "VERSION")


def current_snapshot(table: str) -> int:
    with open(_version_file(table)) as f:
        return int(f.read().strip())


def _manifest_path(table: str, snap: int) -> str:
    return os.path.join(_meta_dir(table), f"v{snap}.json")


def _load_manifest(table: str, snap: int) -> dict:
    with open(_manifest_path(table, snap)) as f:
        return json.load(f)


class CommitConflict(Exception):
    """Another writer advanced the table between this commit's start
    and its pointer swap (Iceberg's optimistic-concurrency failure;
    callers re-read and retry)."""


def _lock_path(table: str) -> str:
    return os.path.join(_meta_dir(table), "COMMIT.lock")


def _write_data(df: DataFrame, data_dir: str, part_spec: dict | None,
                stat_cols: list[str]) -> list:
    """Stage ``df``'s data files under ``data_dir`` honoring the
    table's partition spec (bucket transform → per-bucket _b=<k>
    dirs) and return their FileEntry list with partition tags.
    Shared by commit() and commit_upsert() so an upsert can never
    silently write spec-violating (unbucketed) files into a
    bucket-partitioned table."""
    if part_spec is not None:
        n_buckets, col = part_spec["n"], part_spec["col"]
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("int")
        def _bucket(v):
            import pandas as pd
            h = murmur3_32_long(v.to_numpy())
            return pd.Series(
                ((h & np.uint32(0x7FFFFFFF))
                 % np.uint32(n_buckets)).astype(np.int32))

        df.withColumn("_b", _bucket(df[col])) \
          .write.mode("error").partitionBy("_b").parquet(data_dir)
    else:
        df.write.mode("error").parquet(data_dir)
    new = []
    for root, _dirs, fnames in sorted(os.walk(data_dir)):
        base = os.path.basename(root)
        part = ({"bucket": int(base.split("=", 1)[1])}
                if base.startswith("_b=") else None)
        for f in sorted(fnames):
            if f.endswith(".parquet"):
                e = _file_entry(os.path.join(root, f), stat_cols)
                e.partition = part
                new.append(e)
    return new


def commit(df: DataFrame, table: str, mode: str = "append",
           stat_cols: list[str] | None = None,
           expected_parent: int | None = None,
           partition: tuple[str, int, str] | None = None,
           props: dict | None = None) -> int:
    """Write ``df`` as a new snapshot.  ``append`` unions the parent
    snapshot's files; ``overwrite`` starts fresh.  Returns the new
    snapshot id.

    Atomicity + retryability (ADVICE r03 #2):
      * data files stage under a UNIQUE uuid-suffixed directory
        recorded in the manifest — a crashed or conflicted commit's
        retry never collides with its own leftovers (``vacuum()``
        garbage-collects unreferenced staging dirs);
      * the manifest is written to a unique tmp name and renamed into
        place only inside the critical section;
      * the pointer swap is a compare-and-set: an O_EXCL lock file
        serializes writers, the parent check happens UNDER the lock
        (no check-then-replace TOCTOU), then manifest + VERSION are
        os.replace'd.  Readers see the old or the new snapshot, never
        a partial one; a losing writer raises CommitConflict with all
        of its tmp state cleaned up, so re-read-and-retry succeeds.

    ``partition=("bucket", N, col)`` applies the Iceberg bucket
    transform: rows land in per-bucket files (_b=<k> dirs inside the
    staging dir), the manifest records each file's bucket, and
    ``read(..., bucket_eq=(col, value))`` prunes to ~1/N of the files
    at planning time (BASELINE's "Iceberg table partitioned by
    bucket(N, cell_id)").
    """
    os.makedirs(_meta_dir(table), exist_ok=True)
    parent = current_snapshot(table) if \
        os.path.exists(_version_file(table)) else 0
    if expected_parent is not None and parent != expected_parent:
        raise CommitConflict(
            f"table at snapshot {parent}, expected {expected_parent}")
    snap = parent + 1
    data_dir = os.path.join(table, "data",
                            f"s{snap}-{uuid.uuid4().hex[:12]}")
    part_spec = None
    if partition is not None:
        transform, n_buckets, col = partition
        if transform != "bucket":
            raise ValueError(f"unknown partition transform {transform}")
        part_spec = {"transform": "bucket", "n": int(n_buckets),
                     "col": col}
    # spec compatibility is checked BEFORE staging any data — a
    # rejected commit must leave nothing to vacuum
    if parent and mode != "overwrite":
        prev_spec = _load_manifest(table, parent).get("partition_spec")
        if prev_spec != part_spec:
            raise ValueError(
                f"append partition spec {part_spec} != table spec "
                f"{prev_spec}; use mode='overwrite' to change specs")
    stat_cols = stat_cols if stat_cols is not None else [
        f.name for f in df.schema
        if f.dataType.simpleString() in
        ("bigint", "int", "double", "float", "string", "timestamp")]
    new = _write_data(df, data_dir, part_spec, stat_cols)
    pm = (None if mode == "overwrite" or parent == 0
          else _load_manifest(table, parent))
    files = pm["files"] if pm else []
    # props and delete files carry forward through appends (snapshot
    # summary properties / equality-delete list in Iceberg terms) and
    # reset on overwrite, with this commit's props layered on top
    inherited = dict((pm.get("props") or {}) if pm else {})
    inherited.update(props or {})
    # schema evolution (Iceberg: schema lives in metadata, readers pin
    # it): appends may ADD columns — the stored schema becomes the
    # union, and read() projects old files to it (missing → null).
    # Dropping or retyping a column requires mode='overwrite'.
    schema_fields = {f.name: f for f in df.schema}
    if pm is not None and pm.get("schema"):
        from pyspark.sql.types import StructType
        old = StructType.fromJson(pm["schema"])
        for f in old.fields:
            cur = schema_fields.get(f.name)
            if cur is not None and cur.dataType != f.dataType:
                raise ValueError(
                    f"append retypes column {f.name!r} "
                    f"({f.dataType.simpleString()} -> "
                    f"{cur.dataType.simpleString()}); use "
                    "mode='overwrite' for incompatible changes")
        merged = list(old.fields) + [
            f for f in df.schema.fields
            if f.name not in {g.name for g in old.fields}]
        table_schema = StructType(merged).jsonValue()
    else:
        table_schema = df.schema.jsonValue()
    manifest = {
        "snapshot": snap,
        "parent": parent if parent else None,
        "mode": mode,
        "partition_spec": part_spec,
        "props": inherited,
        "schema": table_schema,
        "delete_files": list((pm.get("delete_files") or [])
                             if pm else []),
        "files": files + [dict(vars(e), seq=snap) for e in new],
    }
    _cas_swap(table, snap, parent, manifest)
    return snap


def _cas_swap(table: str, snap: int, parent: int,
              manifest: dict, what: str = "commit") -> None:
    """The shared critical section: write manifest + VERSION to tmp
    names, take COMMIT.lock (O_EXCL), re-check the parent under the
    lock, then atomically os.replace both.  Raises CommitConflict
    (with tmp state cleaned up) if another writer won."""
    tag = uuid.uuid4().hex[:8]
    tmp_manifest = _manifest_path(table, snap) + f".{tag}.tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f)
    tmp_version = _version_file(table) + f".{tag}.tmp"
    with open(tmp_version, "w") as f:
        f.write(str(snap))
    lock = _lock_path(table)
    # acquisition = write-pid-then-link: the lock file APPEARS with
    # its holder pid already inside (os.link is atomic and fails on
    # an existing target, like O_EXCL).  A create-then-write pair
    # would leave a visible-but-empty lock if the holder is suspended
    # between the two syscalls — indistinguishable from a dead
    # writer's leftover, which the clearer must never guess about.
    ltmp = lock + f".{uuid.uuid4().hex[:8]}.pid"
    with open(ltmp, "w") as lf:
        lf.write(str(os.getpid()))
    try:
        os.link(ltmp, lock)
    except FileExistsError:
        os.unlink(ltmp)
        os.unlink(tmp_manifest)
        os.unlink(tmp_version)
        raise CommitConflict(
            f"another commit holds {lock}; this {what}'s staged files "
            "are invisible — re-read and retry (force_unlock() clears "
            "a lock left by a killed writer)")
    try:
        now = current_snapshot(table) if \
            os.path.exists(_version_file(table)) else 0
        if now != parent:
            raise CommitConflict(
                f"concurrent writer advanced {table} to snapshot {now} "
                f"(this {what} based on {parent}); staged files are "
                "invisible — re-read and retry")
        os.replace(tmp_manifest, _manifest_path(table, snap))
        os.replace(tmp_version, _version_file(table))   # atomic swap
    finally:
        for t in (lock, ltmp, tmp_manifest, tmp_version):
            try:
                os.unlink(t)
            except FileNotFoundError:
                pass


def commit_deletes(keys: DataFrame, table: str,
                   key_col: str) -> int:
    """Equality deletes (Iceberg v2 semantics; the corpus use case is
    takedown/right-to-be-forgotten): stage the key set as a delete
    file and commit a snapshot whose DATA files are untouched —
    ``read()`` applies the accumulated delete sets as a broadcast
    anti-join (merge-on-read).  Delete sets are dimension-sized by
    nature (takedown lists, not corpora); a rewrite that physically
    drops the rows is ``compact()`` + ``expire_snapshots()`` away.
    Time travel to pre-delete snapshots still shows the rows (their
    manifests carry shorter delete lists)."""
    parent = current_snapshot(table)
    pm = _load_manifest(table, parent)
    snap = parent + 1
    ddir = os.path.join(table, "data",
                        f"s{snap}-{uuid.uuid4().hex[:12]}")
    keys.select(key_col).distinct().write.mode("error").parquet(ddir)
    rows = sum(pq.ParquetFile(os.path.join(ddir, f)).metadata.num_rows
               for f in os.listdir(ddir) if f.endswith(".parquet"))
    entry = {"path": ddir, "rows": rows, "key_col": key_col,
             "seq": snap}
    manifest = {
        "snapshot": snap,
        "parent": parent,
        "mode": "delete",
        "partition_spec": pm.get("partition_spec"),
        "props": dict(pm.get("props") or {}),
        "schema": pm.get("schema"),
        "delete_files": list(pm.get("delete_files") or []) + [entry],
        "files": pm["files"],
    }
    _cas_swap(table, snap, parent, manifest, what="delete commit")
    return snap


def commit_upsert(df: DataFrame, table: str, key_col: str,
                  stat_cols: list[str] | None = None) -> int:
    """MERGE INTO semantics in ONE atomic snapshot: stage ``df`` as
    new data files AND its key set as a delete file with the same
    sequence number — existing rows with matching keys are superseded,
    the new rows survive their own delete set (file.seq == delete.seq
    is not < it), and readers see old or new, never a mix.  The crawl
    use case: re-crawled captures replacing a url's previous rows."""
    parent = current_snapshot(table)
    pm = _load_manifest(table, parent)
    snap = parent + 1
    base = os.path.join(table, "data",
                        f"s{snap}-{uuid.uuid4().hex[:12]}")
    ddir = os.path.join(base, "_deletes")
    vdir = os.path.join(base, "_data")
    if stat_cols is None:
        stat_cols = [f.name for f in df.schema
                     if f.dataType.simpleString() in
                     ("bigint", "int", "double", "float", "string",
                      "timestamp")]
    # honor the table's partition spec — an unbucketed write into a
    # bucket-partitioned table would silently degrade bucket_eq
    # pruning toward full scans and unbucket the rows at compaction
    new = _write_data(df, vdir, pm.get("partition_spec"), stat_cols)
    df.select(key_col).distinct().write.mode("error").parquet(ddir)
    d_rows = sum(pq.ParquetFile(os.path.join(ddir, f))
                 .metadata.num_rows
                 for f in os.listdir(ddir) if f.endswith(".parquet"))
    manifest = {
        "snapshot": snap,
        "parent": parent,
        "mode": "upsert",
        "partition_spec": pm.get("partition_spec"),
        "props": dict(pm.get("props") or {}),
        "schema": pm.get("schema"),
        "delete_files": list(pm.get("delete_files") or [])
        + [{"path": ddir, "rows": d_rows, "key_col": key_col,
            "seq": snap}],
        "files": pm["files"] + [dict(vars(e), seq=snap)
                                for e in new],
    }
    _cas_swap(table, snap, parent, manifest, what="upsert")
    return snap


def _pid_dead(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return False
    except ProcessLookupError:
        return True
    except PermissionError:
        return False                # alive under another uid


def _lock_holder_dead(table: str) -> bool:
    """True iff COMMIT.lock exists, carries a holder pid, and that
    pid is no longer alive.  The metastore is filesystem-local (one
    host), so pid liveness is the sound staleness test — an mtime
    threshold would misjudge a live writer stalled in a long GC
    pause.  Locks appear WITH their pid (write-then-link in
    _cas_swap), so an empty lock is a foreign artifact and is
    conservatively treated as live."""
    try:
        with open(_lock_path(table)) as f:
            txt = f.read().strip()
        if not txt:
            return False            # never guess about empty locks
        return _pid_dead(int(txt))
    except (FileNotFoundError, ValueError, OSError):
        return False


def clear_dead_lock(table: str) -> bool:
    """Clear COMMIT.lock iff its recorded holder pid is dead, with a
    rename-claim so concurrent clearers cannot unlink a lock that a
    NEW live writer acquired in between (check-then-unlink TOCTOU):
    os.rename moves the lock aside atomically — exactly one clearer
    wins — and the pid is re-verified FROM THE TOMBSTONE before it is
    discarded; a claimed-but-live lock is linked back into place.
    (Residual window: if a third writer acquires between this
    clearer's rename and its restore link, the restore fails and the
    displaced holder races it — reaching that state needs two
    clearers plus a fresh acquisition inside a microsecond window
    behind a pid-dead check; single-host deployments with one
    streaming sink never see it.)"""
    lock = _lock_path(table)
    if not _lock_holder_dead(table):
        return False
    tomb = lock + f".tomb.{uuid.uuid4().hex[:8]}"
    try:
        os.rename(lock, tomb)
    except FileNotFoundError:
        return False                # another clearer won
    try:
        with open(tomb) as f:
            txt = f.read().strip()
        if txt and _pid_dead(int(txt)):
            os.unlink(tomb)
            return True
        # we claimed a LIVE writer's fresh lock — put it back
        try:
            os.link(tomb, lock)
        except FileExistsError:
            pass
        os.unlink(tomb)
        return False
    except (ValueError, OSError):
        try:
            os.unlink(tomb)
        except FileNotFoundError:
            pass
        return False


def force_unlock(table: str) -> bool:
    """Clear a COMMIT.lock left by a writer killed inside the (µs)
    critical section.  Returns True if a lock was removed."""
    try:
        os.unlink(_lock_path(table))
        return True
    except FileNotFoundError:
        return False


def vacuum(table: str, grace_seconds: float = 3600.0) -> list[str]:
    """Garbage-collect staging directories referenced by NO manifest
    (leftovers of crashed or conflicted commits).  Never touches a
    directory any snapshot points at, so time travel keeps working.
    Returns the removed directories.

    Concurrency (ADVICE r04): ``commit()`` stages data BEFORE taking
    COMMIT.lock and writes its manifest last, so an unreferenced
    staging dir may belong to an in-flight commit.  Directories
    modified within ``grace_seconds`` are therefore skipped — only
    set it below the longest plausible commit duration if no writer
    can be active (Iceberg's own expire/remove-orphans carries the
    same default-3-day contract for the same reason)."""
    import time as _time
    cutoff = _time.time() - grace_seconds
    referenced: set[str] = set()
    meta = _meta_dir(table)
    droot = os.path.join(table, "data")
    for fname in os.listdir(meta):
        if fname.startswith("v") and fname.endswith(".json"):
            with open(os.path.join(meta, fname)) as f:
                man = json.load(f)
                for e in man["files"]:
                    # normalize to the TOP-LEVEL staging dir: bucket-
                    # partitioned files live in s{N}-<uuid>/_b=<k>/
                    rel = os.path.relpath(os.path.dirname(e["path"]),
                                          droot)
                    referenced.add(rel.split(os.sep)[0])
                for de in man.get("delete_files") or []:
                    # delete entries point AT their staging dir
                    referenced.add(os.path.relpath(de["path"], droot)
                                   .split(os.sep)[0])
    removed = []
    for d in sorted(os.listdir(droot)) if os.path.isdir(droot) else []:
        if d in referenced:
            continue
        full = os.path.join(droot, d)
        if os.path.getmtime(full) > cutoff:
            continue                       # possibly an in-flight commit
        shutil.rmtree(full)
        removed.append(full)
    return removed


def compact(spark: SparkSession, table: str,
            target_rows: int = 1_000_000,
            stat_cols: list[str] | None = None) -> int | None:
    """Bin-pack small data files into ~``target_rows`` files as a new
    snapshot (Iceberg's ``rewrite_data_files`` maintenance action).

    The 100 TB reality this models: streaming/incremental appends leave
    thousands of KB-sized parquet files per partition, and scan cost
    becomes file-open-bound (planning O(files), one reader task per
    tiny split).  Compaction rewrites only files smaller than
    ``target_rows`` — per bucket partition, never across buckets, so
    ``bucket_eq`` pruning keeps working — and commits the rewrite with
    the same CAS pointer swap as ``commit()``: readers see the old or
    the new file layout, never a mix, and time travel to pre-compaction
    snapshots still plans from their own manifests (the rewritten
    small files stay on disk until ``expire_snapshots`` + ``vacuum``).

    Returns the new snapshot id, or None if no group had at least two
    small files (nothing to do — idempotent by construction).
    """
    snap = current_snapshot(table)
    m = _load_manifest(table, snap)
    groups: dict = {}
    for e in m["files"]:
        key = (e["partition"] or {}).get("bucket") \
            if e.get("partition") else None
        groups.setdefault(key, []).append(e)
    keep, jobs = [], []
    for key, entries in sorted(groups.items(),
                               key=lambda kv: (kv[0] is None, kv[0])):
        small = [e for e in entries if e["rows"] < target_rows]
        big = [e for e in entries if e["rows"] >= target_rows]
        if len(small) < 2:
            keep.extend(entries)
            continue
        keep.extend(big)
        jobs.append((key, small))
    if not jobs:
        return None
    if stat_cols is None:
        stat_cols = sorted({c for _k, sm in jobs
                            for e in sm for c in e["stats"]})
    new_snap = snap + 1
    data_dir = os.path.join(table, "data",
                            f"s{new_snap}-{uuid.uuid4().hex[:12]}")
    new_entries = []
    deletes = m.get("delete_files") or []
    from pyspark.sql.functions import broadcast
    for key, small in jobs:
        total = sum(e["rows"] for e in small)
        n_out = max(1, -(-total // target_rows))        # ceil
        out_dir = (os.path.join(data_dir, f"_b={key}")
                   if key is not None else data_dir)
        reader = spark.read
        if m.get("schema"):
            # pin the manifest schema: a rewrite spanning an
            # add-column append must project old files with nulls,
            # not inherit whichever file's footer Spark samples first
            from pyspark.sql.types import StructType
            reader = reader.schema(StructType.fromJson(m["schema"]))
        # the rewrite APPLIES equality deletes (Iceberg's rewrite
        # purge — where a takedown physically leaves the bytes):
        # files subgroup by applicable-delete set (bounded by
        # n_deletes + 1) so each delete hits only rows from files
        # committed before it
        by_applicable: dict = {}
        for e in small:
            k = _applicable(deletes, e.get("seq", 0))
            by_applicable.setdefault(k, []).append(e["path"])
        merged = None
        for idxs, paths in sorted(by_applicable.items()):
            part_df = reader.parquet(*paths)
            for i in idxs:
                de = deletes[i]
                keys = spark.read.parquet(de["path"])
                part_df = part_df.join(broadcast(keys),
                                       de["key_col"], "left_anti")
            merged = part_df if merged is None \
                else merged.unionByName(part_df)
        (merged.repartition(n_out).write.mode("error").parquet(out_dir))
        part = {"bucket": key} if key is not None else None
        for f in sorted(os.listdir(out_dir)):
            if f.endswith(".parquet"):
                e = _file_entry(os.path.join(out_dir, f), stat_cols)
                e.partition = part
                new_entries.append(e)
    manifest = {
        "snapshot": new_snap,
        "parent": snap,
        "mode": "compact",
        "partition_spec": m.get("partition_spec"),
        "props": dict(m.get("props") or {}),
        "schema": m.get("schema"),
        # rewritten files had their deletes APPLIED, so only deletes
        # still applicable to some KEPT file survive; none kept →
        # fully purged (the takedown's bytes are really gone once
        # expire_snapshots + vacuum reclaim the old files)
        "delete_files": [
            de for de in deletes
            if any(e.get("seq", 0) < de.get("seq", 1 << 60)
                   for e in keep)],
        "files": keep + [dict(vars(e), seq=new_snap)
                         for e in new_entries],
    }
    _cas_swap(table, new_snap, snap, manifest, what="compaction")
    return new_snap


def expire_snapshots(table: str, keep_last: int = 1,
                     grace_seconds: float = 3600.0) -> list[int]:
    """Drop manifests older than the newest ``keep_last`` snapshots,
    then ``vacuum()`` the staging dirs that became fully unreferenced
    (Iceberg's ``expire_snapshots`` + ``remove_orphan_files`` pair —
    the step that actually reclaims the space compaction superseded).
    Data referenced by ANY surviving manifest is untouched, so time
    travel within the retained window keeps working.  Returns the
    expired snapshot ids."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    snap = current_snapshot(table)
    meta = _meta_dir(table)
    snaps = sorted(int(f[1:-5]) for f in os.listdir(meta)
                   if f.startswith("v") and f.endswith(".json"))
    expired = [s for s in snaps if s <= snap - keep_last]
    for s in expired:
        os.unlink(_manifest_path(table, s))
    vacuum(table, grace_seconds=grace_seconds)
    return expired


def _applicable(deletes: list, file_seq: int) -> tuple:
    """Indices of the delete entries applying to a file of the given
    sequence (delete.seq > file.seq)."""
    return tuple(i for i, de in enumerate(deletes)
                 if de.get("seq", 1 << 60) > file_seq)


def read(spark: SparkSession, table: str, snapshot: int | None = None,
         between: tuple | None = None,
         bucket_eq: tuple | None = None) -> DataFrame:
    """Plan a scan of the table at ``snapshot`` (default: current).
    ``between=(col, lo, hi)`` prunes files by manifest min/max stats
    before Spark ever sees them (Iceberg's planning-time pruning);
    ``bucket_eq=(col, value)`` prunes by the bucket partition
    transform — the planner hashes the literal with the same murmur3
    the writer used and keeps only that bucket's files (~1/N of the
    scan).  Row-level filtering still belongs in a normal ``.where``
    (which Spark pushes into the parquet scan) — bucket pruning is a
    FILE-level superset, not an exact filter."""
    snap = snapshot if snapshot is not None else current_snapshot(table)
    m = _load_manifest(table, snap)
    files = m["files"]
    if between is not None:
        col, lo, hi = between
        files = [e for e in files
                 if col not in e["stats"]
                 or (e["stats"][col][0] <= hi
                     and e["stats"][col][1] >= lo)]
    if bucket_eq is not None:
        col, value = bucket_eq
        spec = m.get("partition_spec")
        if not spec or spec.get("col") != col:
            raise ValueError(
                f"table snapshot {snap} is not bucket-partitioned by "
                f"{col} (spec: {spec})")
        want = bucket_of(value, spec["n"])
        files = [e for e in files
                 if e.get("partition") is None
                 or e["partition"].get("bucket") == want]
    if not files:
        # a predicate that prunes every file (or an empty table) is a
        # legal empty result, not an error — the pinned manifest
        # schema makes the empty frame constructible; pollers probing
        # quiet key/time windows must not crash
        if m.get("schema"):
            from pyspark.sql.types import StructType
            return spark.createDataFrame(
                [], StructType.fromJson(m["schema"]))
        raise ValueError(f"no files for snapshot {snap} of {table}")
    reader = spark.read
    if m.get("schema"):
        # the manifest's schema is authoritative (Iceberg model):
        # files written before an added column project to it with
        # nulls, no mergeSchema footer pass needed
        from pyspark.sql.types import StructType
        reader = reader.schema(StructType.fromJson(m["schema"]))
    deletes = m.get("delete_files") or []
    if not deletes:
        return reader.parquet(*[e["path"] for e in files])
    # equality deletes (merge-on-read) with Iceberg v2 SEQUENCE
    # semantics: a delete applies only to files committed BEFORE it
    # (file.seq < delete.seq) — this is what lets an upsert's own new
    # rows survive its own delete set.  Files group by their
    # APPLICABLE-DELETE SET, not raw seq: a thousand streaming
    # appends under one takedown form 2 groups, not 1000, so the
    # union plan is bounded by n_deletes + 1.  Each group anti-joins
    # its applicable (dimension-sized, broadcast) key sets.
    from pyspark.sql.functions import broadcast
    out = None
    by_applicable: dict = {}
    for e in files:
        key = _applicable(deletes, e.get("seq", 0))
        by_applicable.setdefault(key, []).append(e["path"])
    for idxs, paths in sorted(by_applicable.items()):
        part = reader.parquet(*paths)
        for i in idxs:
            de = deletes[i]
            keys = spark.read.parquet(de["path"])
            part = part.join(broadcast(keys), de["key_col"],
                             "left_anti")
        out = part if out is None else out.unionByName(part)
    return out


def read_incremental(spark: SparkSession, table: str,
                     after: int, until: int | None = None) -> DataFrame:
    """Rows ADDED strictly after snapshot ``after`` (up to ``until``,
    default current) — Iceberg's incremental append scan, the table-
    layer CDC primitive.  Plans from the manifest file-list DIFF, so
    the cost is O(new files): a consumer polling a 100 TB table reads
    only the increment, never the table.

    Only append/compact history is incrementally readable: a
    compaction rewrites old rows into new files, so crossing one
    would re-surface them — detected and rejected (Iceberg's
    incremental scan carries the same append-only restriction)."""
    until = until if until is not None else current_snapshot(table)
    if until < after:
        raise ValueError(f"until={until} < after={after}")
    if until == after:
        raise ValueError(f"empty increment: ({after}, {until}]")
    for s in range(after + 1, until + 1):
        mode = _load_manifest(table, s)["mode"]
        if mode != "append":
            raise ValueError(
                f"snapshot {s} is mode={mode!r}; incremental reads "
                "require an append-only range (compaction/overwrite "
                "rewrites files, which would re-surface old rows)")
    base = {e["path"] for e in _load_manifest(table, after)["files"]} \
        if after > 0 else set()
    new = [e["path"] for e in _load_manifest(table, until)["files"]
           if e["path"] not in base]
    if not new:
        raise ValueError(f"no files added in ({after}, {until}]")
    mu = _load_manifest(table, until)
    reader = spark.read
    if mu.get("schema"):
        # pin the until-snapshot schema: an increment spanning an
        # add-column append projects the earlier files with nulls
        from pyspark.sql.types import StructType
        reader = reader.schema(StructType.fromJson(mu["schema"]))
    return reader.parquet(*new)


def table_props(table: str, snapshot: int | None = None) -> dict:
    """The snapshot's summary properties (commit(..., props=...))."""
    snap = snapshot if snapshot is not None else current_snapshot(table)
    return dict(_load_manifest(table, snap).get("props") or {})


def streaming_sink(table: str, stat_cols: list[str] | None = None,
                   partition: tuple[str, int, str] | None = None):
    """``foreachBatch`` function turning a Structured Streaming query
    into exactly-once snapshot appends.

    Exactly-once despite foreachBatch's at-least-once contract: the
    epoch id rides the manifest as a summary property, and a replayed
    batch (restart from checkpoint re-delivers the last epoch) is
    SKIPPED when its id is <= the table's high-water mark.  A
    CommitConflict (concurrent writer) re-reads and retries — the
    batch's staging dir is new each attempt, the manifest swap stays
    atomic, and vacuum() reclaims losers.

        q = (df.writeStream.option("checkpointLocation", ckpt)
               .foreachBatch(icetable.streaming_sink(tbl))
               .trigger(availableNow=True).start())
    """
    def _write(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time
        delay = 0.05
        for _attempt in range(12):
            try:
                done = int(table_props(table).get(
                    "stream_batch_id", -1)) \
                    if os.path.exists(_version_file(table)) else -1
                if batch_id <= done:
                    return                      # replayed epoch
                commit(batch_df, table, mode="append",
                       stat_cols=stat_cols, partition=partition,
                       props={"stream_batch_id": int(batch_id)})
                return
            except CommitConflict:
                # bounded retry with backoff — each attempt re-stages
                # the batch, so an unbounded loop against a stale lock
                # would fill the disk while the stream hangs.  A lock
                # is cleared ONLY when its recorded holder pid is
                # dead, via the rename-claimed clear_dead_lock (a
                # live writer stalled in the critical section keeps
                # its mutual exclusion no matter how old the lock
                # looks, and concurrent clearers can't unlink a
                # freshly re-acquired lock).
                clear_dead_lock(table)
                _time.sleep(delay)
                delay = min(delay * 2, 2.0)
        raise CommitConflict(
            f"stream batch {batch_id}: 12 commit attempts conflicted "
            "against a LIVE concurrent writer (dead holders are "
            "cleared automatically) — stop one writer, then restart "
            "the stream (the checkpoint replays the batch; the epoch "
            "HWM keeps it exactly-once)")
    return _write


def metrics(table: str, snapshot: int | None = None) -> dict:
    """Per-file lineage metrics of a snapshot: row counts + stats
    (the north_rule's per-partition lineage + row-count metrics)."""
    snap = snapshot if snapshot is not None else current_snapshot(table)
    m = _load_manifest(table, snap)
    return {
        "snapshot": m["snapshot"],
        "parent": m["parent"],
        "n_files": len(m["files"]),
        "total_rows": sum(e["rows"] for e in m["files"]),
        "n_delete_files": len(m.get("delete_files") or []),
        "delete_keys": sum(e["rows"]
                           for e in m.get("delete_files") or []),
        "files": m["files"],
    }
