"""Deployment-surface test: the engine must run under
``spark-submit --py-files <zip>`` (north_rule), with the package
imported only from the submitted zip."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

from .conftest import SF_TEST

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT),
                    reason="no spark-submit on this host")
def test_spark_submit_py_files_runs_pages_exposure(spark, tmp_path):
    zip_path = str(tmp_path / "greenexp_r_spark.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        pkg = os.path.join(REPO, "greenexp_r_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    out_dir = str(tmp_path / "out")
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.sql.session.timeZone=UTC",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_job.py"),
         SF_TEST, out_dir],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path))
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    meta = json.loads(line)
    # equals the in-process plan, value-for-value
    from greenexp_r_spark.operators import pages_ops
    want = pages_ops.exposure_over_pages(spark, SF_TEST).toPandas()
    assert meta["rows"] == len(want)
    assert meta["columns"] == sorted(want.columns)
    got = (spark.read.parquet(out_dir).toPandas()
           .sort_values("url").reset_index(drop=True))
    want = want.sort_values("url").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)])
