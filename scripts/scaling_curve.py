"""Amdahl decomposition of the schedule workload (BASELINE.md row 10 evidence).

Runs the JVM-only schedule dataflow at local[1,2,4,8] with a FIXED shuffle
partition count (the realistic cluster protocol: partitions are sized to the
data, executor count varies — Spark's scaling comes from distributing a fixed
partition set), interleaved min-of-N, then least-squares-fits

    wall(N) = serial + parallel / N

A significant ``serial`` term means a serial code path (Amdahl ceiling); a
near-zero ``serial`` with sub-linear walls means per-core slowdown from
shared-resource contention (memory bandwidth / host steal) — which separate
cluster nodes do not share.

Usage: python scripts/scaling_curve.py [n_urls] [reps] [shuffle_partitions]
Appends a `curve` section to BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
from twitter_crawler_spark.session import get_spark
from twitter_crawler_spark.crawl.schedule_bench import run_schedule_round
cores = int(sys.argv[1]); n = int(sys.argv[2]); parts = int(sys.argv[3])
# Confine the JVM to the measured core count the way a real executor
# container is: GC/JIT/netty pools size from ActiveProcessorCount, not from
# the 32-core host (otherwise local[1] gets ~23 hidden G1 GC threads and the
# apparent N->4N efficiency is deflated — same artifact class as local-mode
# Python workers running outside the task slots).
spark = get_spark(app_name=f"tcs-curve-{{cores}}", cores=cores,
                  shuffle_partitions=parts,
                  extra_conf={{
                      "spark.ui.showConsoleProgress": "false",
                      "spark.driver.extraJavaOptions":
                          f"-XX:ActiveProcessorCount={{cores}}",
                  }})
run_schedule_round(spark, 50_000, jvm_only=True)  # warm-up
r = run_schedule_round(spark, n, jvm_only=True)
print(json.dumps({{"cores": cores, "wall_s": r["wall_s"]}}))
"""


def run_child(cores: int, n: int, parts: int) -> float:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO),
         str(cores), str(n), str(parts)],
        capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])["wall_s"]


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cores_list = [1, 2, 4, 8]
    best: dict[int, float] = {}
    walls: dict[int, list] = {c: [] for c in cores_list}
    for i in range(reps):
        for c in cores_list:
            w = run_child(c, n, parts)
            walls[c].append(w)
            best[c] = min(best.get(c, 1e9), w)
            print(f"# pass {i} local[{c}]: {w}s", file=sys.stderr)
    # least squares on wall = s + p/N over min walls
    import numpy as np

    A = np.array([[1.0, 1.0 / c] for c in cores_list])
    y = np.array([best[c] for c in cores_list])
    (s, p), *_ = np.linalg.lstsq(A, y, rcond=None)
    eff_2_8 = (best[2] / best[8]) / 4
    curve = {
        "n_urls": n,
        "shuffle_partitions": parts,
        "min_walls": {str(c): best[c] for c in cores_list},
        "all_walls": {str(c): walls[c] for c in cores_list},
        "amdahl_fit": {"serial_s": round(float(s), 2),
                       "parallel_s": round(float(p), 2),
                       "serial_fraction_at_1core": round(float(s / (s + p)), 4)},
        "efficiency_2_to_8": round(eff_2_8, 3),
        "predicted_eff_2_to_8_from_fit": round(
            float((s + p / 2) / (s + p / 8)) / 4, 3),
    }
    print(json.dumps(curve))
    path = os.path.join(REPO, "BENCH_SCALING.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["curve"] = curve
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


if __name__ == "__main__":
    main()
