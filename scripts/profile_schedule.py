"""Stage-wise scaling profile of the schedule workload (VERDICT round-1 #5).

Runs each prefix of the schedule dataflow (hash → windows → candidates →
anti-join) as its own action at two parallelism levels, interleaved min-of-N,
and reports the per-stage N→4N efficiency — isolating which stage (if any)
carries a serial fraction versus how much is per-job fixed cost.

Usage: python scripts/profile_schedule.py [n_urls] [reps]
Writes nothing; prints one JSON line (recorded in BASELINE.md by hand).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from twitter_crawler_spark.session import get_spark
from twitter_crawler_spark.crawl.schedule_bench import (
    BUDGET, HOST_SALT, N_HOSTS, synthetic_frontier,
)

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app_name=f"tcs-prof-{{cores}}", cores=cores,
                  shuffle_partitions=2 * cores,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})


def build(stage):
    frontier = synthetic_frontier(spark, n).withColumn("url_hash", F.xxhash64("url"))
    if stage == "hash":
        return frontier
    order = [F.col("depth").asc(), F.col("score").desc(), F.col("url").asc()]
    w1 = Window.partitionBy("host", F.pmod("url_hash", F.lit(HOST_SALT))).orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    popped = (
        frontier.withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= BUDGET)
        .withColumn("rk2", F.row_number().over(w2))
        .where(F.col("rk2") <= BUDGET)
        .drop("rk1", "rk2")
    )
    if stage == "windows":
        return popped
    cand = popped.select(
        "url",
        F.explode(F.array(
            F.concat(F.lit("next/"), (F.col("id") * 3 + 1).cast("string")),
            F.concat(F.lit("/abs/"), (F.col("id") * 3 + 2).cast("string")),
            F.format_string("http://host%d.example.org/x/%d",
                            (F.col("id") % N_HOSTS), F.col("id") * 3 + 3),
        )).alias("href"),
    )
    base_dir = F.expr("substring_index(url, '/', 5)")
    host_part = F.expr(
        "concat('http://', substring_index(substring_index(url, '://', -1), '/', 1))")
    cand = cand.withColumn(
        "dst",
        F.lower(
            F.when(F.col("href").startswith("http"), F.col("href"))
            .when(F.col("href").startswith("/"), F.concat(host_part, F.col("href")))
            .otherwise(F.concat(base_dir, F.lit("/"), F.col("href")))
        ),
    ).select("dst").withColumn("dst_hash", F.xxhash64("dst"))
    if stage == "cand":
        return cand
    new_urls = cand.where(F.pmod(F.abs(F.col("dst_hash")), F.lit(5)) != 0)
    seen = synthetic_frontier(spark, n // 10).select(F.col("url").alias("dst"))
    return new_urls.join(seen, "dst", "left_anti")


STAGES = ["hash", "windows", "cand", "anti"]
build("anti").count()  # warm-up: codegen + JVM JIT
out = {{"cores": cores}}
for st in STAGES:
    df = build(st)
    t0 = time.time(); df.count(); out[st] = round(time.time() - t0, 2)
# empty-job fixed cost probe: a do-nothing 1-row job
t0 = time.time(); spark.range(1).count(); out["noop_job"] = round(time.time() - t0, 3)
print(json.dumps(out))
"""


def run_child(cores: int, n: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), str(n)],
        capture_output=True, text=True, timeout=3000,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    lo, hi = 2, 8
    best: dict[int, dict] = {}
    for i in range(reps):
        for cores in (lo, hi):
            r = run_child(cores, n)
            print(f"# pass {i} local[{cores}]: {r}", file=sys.stderr)
            cur = best.setdefault(cores, r)
            for k, v in r.items():
                if k != "cores" and v < cur.get(k, 1e9):
                    cur[k] = v
    stages = ["hash", "windows", "cand", "anti"]
    eff = {}
    prev_lo = prev_hi = 0.0
    for st in stages:
        d_lo = best[lo][st] - prev_lo
        d_hi = best[hi][st] - prev_hi
        eff[st] = {
            "delta_lo_s": round(d_lo, 2),
            "delta_hi_s": round(d_hi, 2),
            "efficiency": round((d_lo / d_hi) / (hi / lo), 3) if d_hi > 0 else None,
        }
        prev_lo, prev_hi = best[lo][st], best[hi][st]
    print(json.dumps({
        "n_urls": n,
        f"local{lo}": best[lo],
        f"local{hi}": best[hi],
        "per_stage_delta_efficiency": eff,
        "noop_job_s": {f"local{lo}": best[lo]["noop_job"],
                       f"local{hi}": best[hi]["noop_job"]},
    }))


if __name__ == "__main__":
    main()
