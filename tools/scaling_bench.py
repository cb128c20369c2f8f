"""Two-parallelism scaling evidence (BASELINE.json north rule).

Runs the SAME compute-bound exposure job on the SAME input at
local[N_LOW] and local[N_HIGH] in separate JVMs, reports throughput at
both and scaling efficiency = (qps_high / qps_low) / (N_HIGH / N_LOW).

The job is the core exposure join over a synthetic points table large
enough to be compute-bound (the sf0.1 suite is too small to measure
parallel efficiency — Spark fixed overhead dominates):
    points → buffer-zonal NDVI (explode ~2.8k cells/point, integer
    hash aggregate) → nearest-park join → combined result count.

Usage: python tools/scaling_bench.py [n_points] → JSON on stdout and
appends the evidence table to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_LOW = int(os.environ.get("SCALE_N_LOW", "8"))
N_HIGH = int(os.environ.get("SCALE_N_HIGH", "32"))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from greenexp_r_spark.session import build_session
from greenexp_r_spark import world
from greenexp_r_spark.operators import availability, accessibility, visibility
from pyspark.sql import functions as F

cpus = int(sys.argv[1]); n = int(sys.argv[2])
spark = build_session(app=f"scale-{{cpus}}", master=f"local[{{cpus}}]",
                      shuffle_partitions=cpus * 2)
spark.sparkContext.setLogLevel("ERROR")
pts = world.synthetic_points(spark, n, partitions=cpus * 4)
parks = world.parks_df(spark)
# warm the JVM/codegen and the python workers, then measure
availability.ndvi_zonal(pts.limit(500)).count()
visibility.vgvi_points(pts.limit(200), sample_mod=1).count()
t0 = time.time()
# all three exposure families: availability (buffer-zonal NDVI),
# accessibility (nearest park), visibility (VGVI on a 1/20 sample)
avail = availability.ndvi_zonal(pts, add_sd=True)
acc = accessibility.euclidean_access(pts, parks)
rows = avail.join(acc, "point_id").count()
vg = visibility.vgvi_points(pts, sample_mod=20).count()
dt = time.time() - t0
print(json.dumps({{"cpus": cpus, "n_points": n, "rows": rows,
                   "vgvi_rows": vg, "seconds": round(dt, 2),
                   "points_per_sec": round(n / dt, 1)}}))
spark.stop()
"""


def run(cpus: int, n: int, repo: str) -> dict:
    code = CHILD.format(repo=repo)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), str(n)],
        capture_output=True, text=True, timeout=1800,
        env={**os.environ, "GREENEXP_SHUFFLE_PARTITIONS": str(cpus * 2)})
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def best_of(trials: int, cpus: int, n: int, repo: str) -> dict:
    """The sandbox VM suffers intermittent multi-second host stalls
    (observed: identical numpy work 0.37s..5s); best-of-N isolates the
    machine's actual capability at each parallelism level."""
    results = [run(cpus, n, repo) for _ in range(trials)]
    best = min(results, key=lambda r: r["seconds"])
    best["all_seconds"] = [r["seconds"] for r in results]
    return best


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    lo = best_of(trials, N_LOW, n, repo)
    hi = best_of(trials, N_HIGH, n, repo)
    eff = (hi["points_per_sec"] / lo["points_per_sec"]) / (N_HIGH / N_LOW)
    result = {"low": lo, "high": hi,
              "cores_ratio": N_HIGH / N_LOW,
              "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M:%S")
    with open(os.path.join(repo, "BENCH", "BASELINE.md"), "a") as f:
        f.write(f"""
## Scaling run {stamp}

Same job (buffer-zonal NDVI + nearest-park exposure join over
{n:,} synthetic points, identical input both runs), two parallelism
levels, separate JVMs:

| parallelism | wall sec (best of {trials}) | all trials | points/sec |
|---|---|---|---|
| local[{N_LOW}] | {lo['seconds']} | {lo['all_seconds']} | {lo['points_per_sec']:,} |
| local[{N_HIGH}] | {hi['seconds']} | {hi['all_seconds']} | {hi['points_per_sec']:,} |

**Scaling efficiency ({N_LOW}→{N_HIGH} cores, ratio {N_HIGH//N_LOW}×):
{eff:.3f}** (target ≥ 0.8, BASELINE.json).
Reference single-node baseline: ~7.2 addresses/sec
(GreenExp_R README.md:390-396).
""")


if __name__ == "__main__":
    main()
