"""Two-cluster-size scaling evidence (BASELINE.md row 10).

No real cluster exists in this sandbox, so the north rule's N → 4N executor
criterion is evidenced by running the IDENTICAL crawl job on the IDENTICAL
input at local[8] and local[32] (8 vs 32 cores = N vs 4N executor-equivalents)
in separate JVMs, reporting throughput at both plus

    efficiency = (throughput_32 / throughput_8) / 4.

Writes/updates the "Measured scaling" section consumed by BASELINE.md and
prints one JSON line. Each measurement is a fresh subprocess so JIT/GC state
can't leak between cluster sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from twitter_crawler_spark.config import CrawlConfig
from twitter_crawler_spark.crawl.engine import CrawlEngine
from twitter_crawler_spark.session import get_spark

cores = int(sys.argv[1]); fx = sys.argv[2]; rounds = int(sys.argv[3])
state = f"/tmp/tcs_scale_state_{{cores}}_{{os.getpid()}}"
shutil.rmtree(state, ignore_errors=True)
spark = get_spark(app_name=f"tcs-scale-{{cores}}", cores=cores,
                  shuffle_partitions=cores,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
cfg = CrawlConfig(max_rounds=rounds)
eng = CrawlEngine(spark, fx, state, cfg)
t0 = time.time(); eng.run(); wall = time.time() - t0
m = (eng.round_metrics().where("partition_id = -1")
     .selectExpr("sum(new_urls) n", "sum(dupes) d", "sum(robots_blocked) b",
                 "sum(fetched) f").collect()[0])
work = int(m.n + m.d + m.b)
shutil.rmtree(state, ignore_errors=True)
print(json.dumps({{"cores": cores, "wall_s": round(wall, 2), "work": work,
                   "fetched": int(m.f),
                   "throughput": round(work / wall, 2)}}))
"""


def run_one(cores: int, fx: str, rounds: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), fx, str(rounds)],
        capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        raise RuntimeError(f"child cores={cores} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_pages = int(os.environ.get("TCS_SCALE_PAGES", "20000"))
    rounds = int(os.environ.get("TCS_SCALE_ROUNDS", "5"))
    fx = f"/tmp/tcs_scale_fx_p{n_pages}"
    if not os.path.exists(os.path.join(fx, "meta.json")):
        shutil.rmtree(fx, ignore_errors=True)
        sys.path.insert(0, REPO)
        from twitter_crawler_spark.fixtures.webgen import generate_web

        t0 = time.time()
        generate_web(fx, seed=42, n_pages=n_pages, n_hosts=max(40, n_pages // 40),
                     n_seeds=max(50, n_pages // 100), span_rounds=rounds,
                     mean_outdeg=12)
        print(f"# fixture {fx} generated in {time.time()-t0:.1f}s", file=sys.stderr)

    r8 = run_one(8, fx, rounds)
    print(f"# local[8]:  {r8}", file=sys.stderr)
    r32 = run_one(32, fx, rounds)
    print(f"# local[32]: {r32}", file=sys.stderr)
    eff = (r32["throughput"] / r8["throughput"]) / 4
    result = {
        "pages": n_pages,
        "rounds": rounds,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
