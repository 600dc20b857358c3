"""Hot-domain skew receipt for the salted politeness window.

The north-star dataflow claims a "salted-host repartition to kill hot-domain
skew" (BASELINE.json north_star; engine: CrawlEngine._pop_survivors,
twitter_crawler_spark/crawl/engine.py — stage 1 ranks inside (host,
url_hash % host_salt) slices, stage 2 re-ranks the <= salt*budget
survivors). This script MEASURES that claim on a worst-case frontier: a
configurable fraction of all urls on ONE host (the Common-Crawl hot-domain
shape — e.g. a blogging platform), the rest zipf-spread.

Receipts (deterministic first, walls as corroboration per the protocol in
BENCH_SCALING.json):

* **identical pop semantics** — popped count and an order-insensitive
  url-hash checksum are asserted equal between salt=1 and salt=K (the
  two-stage rank is exactly a per-host top-budget under any salt);
* **max rows in one window partition** — the window shuffle hashes on its
  partitionBy columns, and a single window partition can never split across
  tasks, so this is the straggler's lower bound: with salt=1 the hot host's
  entire row set lands in ONE task's sort; with salt=K it is ~1/K of that;
* **max rows per shuffle task** at the bench partition count (the same
  hash partitioning the window uses), showing the actual per-task balance;
* interleaved min-of-REPS walls for the full pop dataflow at both salts.

Usage: python scripts/skew_stats.py [n_urls] [hot_frac] [salt] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from twitter_crawler_spark.session import get_spark

N_COLD_HOSTS = 4096
BUDGET = 64


def skewed_frontier(spark, n_urls: int, hot_frac: float):
    """Deterministic frontier: floor(n*hot_frac) urls on host0 (the hot
    domain), the rest cubic-zipf over N_COLD_HOSTS cold hosts."""
    n_hot = int(n_urls * hot_frac)
    u = (F.col("id") * F.lit(2654435761)) % F.lit(1 << 31) / F.lit(float(1 << 31))
    cold_rank = 1 + F.floor(F.pow(u, F.lit(3.0)) * F.lit(N_COLD_HOSTS - 1)).cast("long")
    host_rank = F.when(F.col("id") < n_hot, F.lit(0)).otherwise(cold_rank)
    return (
        spark.range(n_urls)
        .withColumn("host", F.format_string("host%d.example.org", host_rank))
        .withColumn(
            "url",
            F.format_string("http://host%d.example.org/page/%d", host_rank, F.col("id")),
        )
        .withColumn("url_hash", F.xxhash64("url"))
        .withColumn("depth", (F.col("id") % 7).cast("int"))
        .withColumn("score", (F.col("id") * 37 % 1000003).cast("long"))
    )


def pop(frontier, salt: int):
    """The engine's two-stage salted per-host budget window (engine.py
    _pop_survivors), parametric in salt; salt=1 degenerates to the naive
    single-stage per-host window (stage 2 sees exactly stage 1's input)."""
    order = [F.col("depth").asc(), F.col("score").desc(), F.col("url").asc()]
    w1 = Window.partitionBy("host", F.pmod("url_hash", F.lit(salt))).orderBy(*order)
    w2 = Window.partitionBy("host").orderBy(*order)
    return (
        frontier.withColumn("rk1", F.row_number().over(w1))
        .where(F.col("rk1") <= BUDGET)
        .withColumn("rk2", F.row_number().over(w2))
        .where(F.col("rk2") <= BUDGET)
        .drop("rk1", "rk2")
    )


def measure(spark, n_urls: int, hot_frac: float, salt: int, reps: int) -> dict:
    # Persist the synthetic frontier so the timed walls cover ONLY the pop
    # dataflow (shuffle + window sort), not the row generation.
    frontier = skewed_frontier(spark, n_urls, hot_frac).persist()
    frontier.count()
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # --- deterministic balance receipts (independent of walls) -------------
    def balance(s: int) -> dict:
        part_cols = [F.col("host"), F.pmod("url_hash", F.lit(s))]
        win = frontier.groupBy(*part_cols).count().agg(
            F.max("count").alias("max_window_partition_rows")
        ).collect()[0]
        task = (
            frontier.repartition(shuffle_p, *part_cols)
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .agg(F.max("count").alias("mx"), F.avg("count").alias("avg"))
            .collect()[0]
        )
        return {
            "max_window_partition_rows": int(win["max_window_partition_rows"]),
            "max_task_rows": int(task["mx"]),
            "avg_task_rows": round(float(task["avg"]), 1),
            "task_imbalance": round(float(task["mx"]) / float(task["avg"]), 2),
        }

    bal = {"salt_1": balance(1), f"salt_{salt}": balance(salt)}

    # --- semantics invariance ----------------------------------------------
    def popped_sig(s: int):
        row = pop(frontier, s).agg(
            F.count("*").alias("n"),
            F.sum(F.col("url_hash") % F.lit(1_000_000_007)).alias("sig"),
        ).collect()[0]
        return int(row["n"]), int(row["sig"])

    sig1, sigk = popped_sig(1), popped_sig(salt)
    assert sig1 == sigk, f"salted pop changed semantics: {sig1} != {sigk}"

    # --- walls: interleaved min-of-reps -------------------------------------
    walls: dict[str, list[float]] = {"salt_1": [], f"salt_{salt}": []}
    for _ in range(reps):
        for name, s in (("salt_1", 1), (f"salt_{salt}", salt)):
            t0 = time.time()
            pop(frontier, s).agg(F.count("*")).collect()
            walls[name].append(round(time.time() - t0, 2))

    return {
        "n_urls": n_urls,
        "hot_frac": hot_frac,
        "hot_host_rows": int(n_urls * hot_frac),
        "salt": salt,
        "budget": BUDGET,
        "shuffle_partitions": shuffle_p,
        "popped": {"count": sig1[0], "sig": sig1[1], "identical_across_salts": True},
        "balance": bal,
        "walls_s": {k: {"raw": v, "min": min(v)} for k, v in walls.items()},
    }


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cores=cores, shuffle_partitions=cores)
    out = measure(spark, n_urls, hot_frac, salt, reps)
    out["cores"] = cores
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
