"""Checkpoint/resume semantics: interrupted run resumes exactly the
missing partitions; outputs identical to an uninterrupted run; the
byte-identical text invariant is verified from the manifest."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from greenexp_r_spark import world
from greenexp_r_spark.operators import availability
from greenexp_r_spark.plans import manifest as M

from .conftest import SF_TEST


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="greenexp_ckpt_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _transform(unit):
    return availability.ndvi_zonal(unit, add_sd=False)


class Boom(Exception):
    pass


def test_resume_after_interrupt(spark, tmpdir):
    pts = world.points_df(spark, SF_TEST)
    run = M.CheckpointedRun(base_dir=tmpdir, run_id="r1", n_parts=4)

    # interrupt after two units
    calls = {"n": 0}

    def failing_transform(unit):
        calls["n"] += 1
        if calls["n"] > 2:
            raise Boom()
        return _transform(unit)

    with pytest.raises(Boom):
        M.run_checkpointed(spark, pts, failing_transform, run)
    done_first = M.completed_parts(spark, run)
    assert len(done_first) == 2

    # resume: only the remaining units are computed
    res = M.run_checkpointed(spark, pts, _transform, run)
    assert sorted(res["skipped"]) == sorted(done_first)
    assert len(res["computed"]) == 2

    # full result identical to a direct run
    out = spark.read.parquet(f"{tmpdir}/part=*")
    direct = _transform(pts)
    got = out.orderBy("point_id").toPandas()
    want = direct.orderBy("point_id").toPandas()
    assert got["point_id"].tolist() == want["point_id"].tolist()
    assert (got["mean_ndvi"].to_numpy() == want["mean_ndvi"].to_numpy()).all()

    # lineage metrics: rows_in across units == total points
    m = spark.read.schema(M.MANIFEST_SCHEMA).json(run.manifest_dir)
    assert m.agg(F.sum("rows_in")).collect()[0][0] == pts.count()

    # text invariant intact
    bad = M.verify_text_invariant(spark, pts, run)
    assert bad.count() == 0


def test_text_invariant_detects_drift(spark, tmpdir):
    pts = world.points_df(spark, SF_TEST)
    run = M.CheckpointedRun(base_dir=tmpdir, run_id="r2", n_parts=3)
    M.run_checkpointed(spark, pts, _transform, run)
    tampered = pts.withColumn(
        "text", F.when(F.col("point_id") == 7, F.lit("TAMPERED"))
                 .otherwise(F.col("text")))
    bad = M.verify_text_invariant(spark, tampered, run)
    assert bad.count() == 1
