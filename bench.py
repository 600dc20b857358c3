"""Benchmark harness (driver contract): prints ONE JSON line.

Two parts:

1. **Crawl bench** — the engine's own workload (BASELINE.md metric: URLs
   scheduled+deduped per second per executor-equivalent). A deterministic
   synthetic web (seed 42) is generated once and cached; the engine crawls
   it for a fixed number of rounds and we count frontier-scheduling work
   (new urls scheduled + duplicate candidates rejected + robots blocks).
2. **Query bench** — headline operators from __spark_entry__ timed at
   $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SF_DIR,
TCS_BENCH_PAGES (fixture size, default 8000), TCS_BENCH_ROUNDS (default 6).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "host_budget_rank",
    "opic_gains",
    "two_hop_pairs",
    "gap_entropy",
    "dedup_minhash_lsh",
    "doc_fingerprint",
    "ann_bruteforce_topk",
]


def bench_crawl(spark, cores: int) -> dict:
    from twitter_crawler_spark.config import CrawlConfig
    from twitter_crawler_spark.crawl.engine import CrawlEngine
    from twitter_crawler_spark.fixtures.webgen import generate_web

    n_pages = int(os.environ.get("TCS_BENCH_PAGES", "8000"))
    rounds = int(os.environ.get("TCS_BENCH_ROUNDS", "6"))
    n_seeds = max(50, n_pages // 20)  # saturate the frontier early so the
    # bench measures scheduling throughput, not frontier warm-up
    fx = f"/tmp/tcs_bench_fx_p{n_pages}_s{n_seeds}"
    if not os.path.exists(os.path.join(fx, "meta.json")):
        shutil.rmtree(fx, ignore_errors=True)
        generate_web(
            fx,
            seed=42,
            n_pages=n_pages,
            n_hosts=max(20, n_pages // 40),
            n_seeds=n_seeds,
            span_rounds=rounds,
            mean_outdeg=10,
        )
    state = f"/tmp/tcs_bench_state_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    cfg = CrawlConfig(max_rounds=rounds)
    eng = CrawlEngine(spark, fx, state, cfg)
    t0 = time.time()
    eng.run()
    wall = time.time() - t0
    m = (
        eng.round_metrics()
        .where("partition_id = -1")
        .selectExpr(
            "sum(fetched) f", "sum(new_urls) n", "sum(dupes) d", "sum(robots_blocked) b"
        )
        .collect()[0]
    )
    shutil.rmtree(state, ignore_errors=True)
    scheduled_deduped = int(m.n + m.d + m.b)
    return {
        "pages": n_pages,
        "rounds": rounds,
        "wall_s": round(wall, 2),
        "fetched": int(m.f),
        "new_urls": int(m.n),
        "dupes": int(m.d),
        "robots_blocked": int(m.b),
        "urls_scheduled_deduped": scheduled_deduped,
        "urls_per_sec": round(scheduled_deduped / wall, 2),
        "urls_per_sec_per_core": round(scheduled_deduped / wall / cores, 3),
    }


def main() -> None:
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from twitter_crawler_spark.session import get_spark

    spark = get_spark(
        app_name="tcs-bench",
        cores=cores,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE_QUERIES:
        t0 = time.time()
        n = qs[name](spark, sf_dir).count()
        dt = time.time() - t0
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {n} rows in {dt:.2f}s", file=sys.stderr)

    crawl = bench_crawl(spark, cores)
    total += crawl["wall_s"]
    timings["crawl"] = crawl["wall_s"]

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total_wall",
                "value": round(total, 2),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cores": cores,
                "crawl": crawl,
            }
        )
    )


if __name__ == "__main__":
    main()
