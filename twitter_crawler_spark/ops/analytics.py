"""Offline analytics tier + crawl-scheduler operator analogs over the
generic testdata tables (SURVEY.md §2.4-2.7, §3.3).

Each function takes ``(spark, sf_dir)`` and returns a DataFrame built with
the DataFrame API (windows, joins, aggregations — all JVM-side); the module
also carries the DuckDB oracle SQL for every query the driver can check.

Reference parity notes (files under /root/reference/src/main/scala/twitter/crawler/):

* host_budget_rank     — per-host budget pop window F5/F8
                         (threads/RedisRetweetsThread.scala:12-25 pacing,
                         storages/RedisFutureStorage.scala:50 pop order)
* opic_gains           — A15 OPIC cash split (north-star op; integer cash)
* revisit_fanout       — F6 multi-interval insert
                         (storages/FutureTasksStorage.scala:23-30)
* eviction_unproductive— F4 "Delete rare url"
                         (storages/RedisFutureStorage.scala:123-143)
* cursor_incremental   — F12/S2 sinceId cursor scans
                         (threads/RedisSearchThread.scala:14-22)
* anti_join_new        — D1-D4 dedup-by-membership as anti-join
* semi_join_followers  — J4 existence join (storages/FriendStorage.scala:48-63)
* degree_filter        — A6/P15 min-degree (storages/GraphStorage.scala:370-390)
* top_hubs             — A5 top-N by count (storages/GraphStorage.scala:266-274)
* two_hop_pairs        — J3/J7 2-hop subgraph / pairwise combinations
                         (storages/NeoQueriesTrait.scala:174-182,
                         metrics/UrlFeatures.scala:52-66)
* collect_series       — A1/O1 per-key ordered time series
                         (storages/NeoQueriesTrait.scala:145-162)
* gap_bins             — A10 successive-diff stream (metrics/Distribution.scala:48-50)
* gap_entropy          — A8 entropy of a counter distribution
                         (metrics/Distribution.scala:21-28)
* first_hour_features  — A13/O5 first-event anchor window (metrics/UrlFeatures.scala:43-50)
* ts_range_join        — J2 time-ranged 1-hop join (storages/NeoQueriesTrait.scala:195-203)
* tpch_q1 / tpch_q3    — generic scan-agg / 3-way-join probes of the same
                         physical machinery (integer-cents sums: exact,
                         order-independent — no float nondeterminism)
* info_transfer        — A12 pairwise information-transfer metric
                         (metrics/JoinedProcesses.scala:20-66) via grouped
                         Arrow applyInPandas; inherently non-SQL (rows-only
                         correctness check)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

INTERVALS = (0, 3600, 18000, 68400)  # RedisFutureStorage.scala:12 analog


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# scheduler-family
# ---------------------------------------------------------------------------


def q_host_budget_rank(spark, sf_dir):
    """Per-key budget pop: rank orders per customer by (price desc, key) and
    keep the top (c_custkey % 3 + 1) — the politeness-budget window."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_custkey") % 3 + 1).alias("budget")
    )
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("budget"))
        .select("o_orderkey", "o_custkey", "rk")
        .orderBy("o_custkey", "rk", "o_orderkey")
    )


SQL_HOST_BUDGET_RANK = """
WITH r AS (
  SELECT o_orderkey, o_custkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rk,
         (c_custkey % 3 + 1) AS budget
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT o_orderkey, o_custkey, rk FROM r WHERE rk <= budget
ORDER BY o_custkey, rk, o_orderkey
"""


def q_opic_gains(spark, sf_dir):
    """OPIC cash split: each order's integer cash (total price in cents)
    split uniformly over its lineitems, accumulated per part. Integer
    division → order-independent, exactly reproducible at any parallelism."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.floor(F.col("o_totalprice") * 100).cast("long").alias("cash")
    )
    outdeg = li.groupBy("l_orderkey").agg(F.count("*").alias("outdeg"))
    return (
        li.join(outdeg, "l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .withColumn("gain", F.expr("cash div outdeg"))
        .groupBy("l_partkey")
        .agg(F.sum("gain").alias("total_gain"), F.count("*").alias("n_edges"))
        .orderBy("l_partkey")
    )


SQL_OPIC_GAINS = """
WITH outdeg AS (
  SELECT l_orderkey, COUNT(*) AS outdeg FROM lineitem GROUP BY 1
)
SELECT l_partkey,
       CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT) // outdeg) AS BIGINT) AS total_gain,
       COUNT(*) AS n_edges
FROM lineitem
JOIN outdeg USING (l_orderkey)
JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_partkey
ORDER BY l_partkey
"""


def q_revisit_fanout(spark, sf_dir):
    """Multi-interval revisit fan-out: every error event is scheduled at ALL
    revisit intervals at once (FutureTasksStorage.scala:23-30)."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "error")
    ivals = F.array(*[F.lit(i) for i in INTERVALS])
    return (
        ev.select("event_id", F.unix_timestamp("ts").alias("ts0"),
                  F.explode(ivals).alias("interval"))
        .select("event_id", "interval", (F.col("ts0") + F.col("interval")).alias("next_ts"))
        .orderBy("event_id", "interval")
    )


SQL_REVISIT_FANOUT = f"""
SELECT event_id, interval, CAST(floor(epoch(ts)) AS BIGINT) + interval AS next_ts
FROM events, UNNEST([{", ".join(str(i) for i in INTERVALS)}]) AS u(interval)
WHERE event_type = 'error'
ORDER BY event_id, interval
"""


def q_eviction_unproductive(spark, sf_dir):
    """Unproductive eviction: users with views but zero purchases."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("n_view"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("n_purchase"),
        F.count("*").alias("n_events"),
    )
    return (
        g.where((F.col("n_view") >= 1) & (F.col("n_purchase") == 0))
        .select("user_id", "n_events", "n_view")
        .orderBy("user_id")
    )


SQL_EVICTION = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY user_id
HAVING SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) >= 1
   AND SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) = 0
ORDER BY user_id
"""


def q_cursor_incremental(spark, sf_dir):
    """sinceId cursor scan: per user, the click-cursor (max click ts) and how
    many events are strictly newer — the incremental re-fetch predicate."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("tsl")
    )
    cur = ev.where(F.col("event_type") == "click").groupBy("user_id").agg(
        F.max("tsl").alias("cursor")
    )
    return (
        ev.join(cur, "user_id")
        .groupBy("user_id", "cursor")
        .agg(F.sum((F.col("tsl") > F.col("cursor")).cast("long")).alias("n_after_cursor"))
        .orderBy("user_id")
    )


SQL_CURSOR = """
WITH e AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS tsl FROM events),
cur AS (
  SELECT user_id, MAX(tsl) AS cursor FROM e WHERE event_type = 'click' GROUP BY 1
)
SELECT e.user_id, cursor,
       CAST(SUM(CASE WHEN tsl > cursor THEN 1 ELSE 0 END) AS BIGINT) AS n_after_cursor
FROM e JOIN cur ON e.user_id = cur.user_id
GROUP BY e.user_id, cursor
ORDER BY e.user_id
"""


# ---------------------------------------------------------------------------
# join-family
# ---------------------------------------------------------------------------


def q_anti_join_new(spark, sf_dir):
    """Membership dedup as anti-join: customers with no pending ('P')
    order — the "not yet seen" slice (D1-D4 anti-join arbiter shape)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


SQL_ANTI_JOIN = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey
"""


def q_semi_join_followers(spark, sf_dir):
    """Existence join: customers with at least one finished ('F') order."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey")
        .orderBy("c_custkey")
    )


SQL_SEMI_JOIN = """
SELECT c_custkey FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
ORDER BY c_custkey
"""


def q_degree_filter(spark, sf_dir):
    """Min-degree filter: parts referenced by ≥ 40 lineitems."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey").agg(F.count("*").alias("degree"))
        .where(F.col("degree") >= 40)
        .orderBy("l_partkey")
    )


SQL_DEGREE_FILTER = """
SELECT l_partkey, COUNT(*) AS degree FROM lineitem
GROUP BY 1 HAVING COUNT(*) >= 40 ORDER BY l_partkey
"""


def q_top_hubs(spark, sf_dir):
    """Top-10 parts by lineitem degree with total ordering tie-break."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey").agg(F.count("*").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("l_partkey"))
        .limit(10)
    )


SQL_TOP_HUBS = """
SELECT l_partkey, COUNT(*) AS degree FROM lineitem
GROUP BY 1 ORDER BY degree DESC, l_partkey LIMIT 10
"""


def q_two_hop_pairs(spark, sf_dir):
    """2-hop co-occurrence: part pairs sharing an order (bounded self-join
    within the order key — never an unscoped cross product), top-20."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
               & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b"))
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(20)
    )


SQL_TWO_HOP = """
WITH d AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_orders
FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""


def q_ts_range_join(spark, sf_dir):
    """Time-ranged 1-hop join: events of H2 2024 per customer market segment
    (the ts BETWEEN predicate is pushed into the parquet scan)."""
    ev = _t(spark, sf_dir, "events").where(
        (F.col("ts") >= "2024-07-01") & (F.col("ts") < "2025-01-01")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
        .orderBy("c_mktsegment")
    )


SQL_TS_RANGE_JOIN = """
SELECT c_mktsegment, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
FROM events JOIN customer ON user_id = c_custkey
WHERE ts >= TIMESTAMP '2024-07-01' AND ts < TIMESTAMP '2025-01-01'
GROUP BY 1 ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# series-family
# ---------------------------------------------------------------------------


def q_collect_series(spark, sf_dir):
    """Per-user event series summary (sorted-set analog: count/min/max/span)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("tsl")
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.min("tsl").alias("first_ts"),
            F.max("tsl").alias("last_ts"),
        )
        .withColumn("span_s", F.col("last_ts") - F.col("first_ts"))
        .orderBy("user_id")
    )


SQL_COLLECT_SERIES = """
SELECT user_id, COUNT(*) AS n,
       MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS first_ts,
       MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_ts,
       MAX(CAST(floor(epoch(ts)) AS BIGINT)) - MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS span_s
FROM events GROUP BY 1 ORDER BY user_id
"""


_GAP_BIN = (
    "CASE WHEN gap < 3600 THEN 0 WHEN gap < 21600 THEN 1 "
    "WHEN gap < 86400 THEN 2 ELSE 3 END"
)


def q_gap_bins(spark, sf_dir):
    """Inter-arrival gap histogram per user (lag window → integer bins)."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("tsl")
    )
    w = Window.partitionBy("user_id").orderBy("tsl", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("tsl").over(w))
        .where(F.col("prev").isNotNull())
        .withColumn("gap", F.col("tsl") - F.col("prev"))
        .withColumn("bin", F.expr(_GAP_BIN))
    )
    return (
        gaps.groupBy("user_id")
        .agg(*[
            F.sum((F.col("bin") == i).cast("long")).alias(f"bin{i}") for i in range(4)
        ])
        .orderBy("user_id")
    )


SQL_GAP_BINS = f"""
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN {_GAP_BIN} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS bin0,
       CAST(SUM(CASE WHEN {_GAP_BIN} = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bin1,
       CAST(SUM(CASE WHEN {_GAP_BIN} = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bin2,
       CAST(SUM(CASE WHEN {_GAP_BIN} = 3 THEN 1 ELSE 0 END) AS BIGINT) AS bin3
FROM g WHERE gap IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


def q_gap_entropy(spark, sf_dir):
    """Entropy of the per-user gap-bin distribution (Distribution.scala:21-28
    closed form: log2(n) − Σ c·log2(c)/n), rounded for float-hash stability."""
    bins = q_gap_bins(spark, sf_dir)
    cols = [F.col(f"bin{i}") for i in range(4)]
    n = sum(cols[1:], cols[0])
    term = sum(
        (F.when(c > 0, c.cast("double") * F.log2(c.cast("double"))).otherwise(F.lit(0.0)))
        for c in cols
    )
    return (
        bins.withColumn("n_gaps", n)
        .where(F.col("n_gaps") >= 10)  # P14 min-count predicate (Main.scala:114-117)
        .withColumn(
            "entropy",
            F.round(F.log2(F.col("n_gaps").cast("double")) - term / F.col("n_gaps"), 6),
        )
        .select("user_id", "n_gaps", "entropy")
        .orderBy("user_id")
    )


SQL_GAP_ENTROPY = f"""
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
           - LAG(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
),
b AS (
  SELECT user_id, {_GAP_BIN} AS bin, COUNT(*) AS c
  FROM g WHERE gap IS NOT NULL GROUP BY 1, 2
),
agg AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_gaps,
         SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) AS clogc
  FROM b GROUP BY 1
)
SELECT user_id, n_gaps,
       ROUND(log2(CAST(n_gaps AS DOUBLE)) - clogc / n_gaps, 6) AS entropy
FROM agg WHERE n_gaps >= 10
ORDER BY user_id
"""


def q_first_hour(spark, sf_dir):
    """First-event anchor: events within 1h of each user's first event."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("tsl")
    )
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn("first_ts", F.min("tsl").over(w))
        .groupBy("user_id")
        .agg(
            F.sum((F.col("tsl") <= F.col("first_ts") + 3600).cast("long")).alias("n_first_hour"),
            F.count("*").alias("n_total"),
        )
        .orderBy("user_id")
    )


SQL_FIRST_HOUR = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsl,
         MIN(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id) AS first_ts
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN tsl <= first_ts + 3600 THEN 1 ELSE 0 END) AS BIGINT) AS n_first_hour,
       COUNT(*) AS n_total
FROM e GROUP BY 1 ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# generic scan/join probes (integer-cents arithmetic: exact + order-free)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "2024-09-01")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.floor(F.col("l_quantity") * 100).cast("long")).alias("sum_qty_c"),
            F.sum(F.floor(F.col("l_extendedprice") * 100).cast("long")).alias("sum_base_c"),
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("sum_disc_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01'
GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_tpch_q3(spark, sf_dir):
    """3-way join with a broadcast dimension + top-10 by revenue."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
            ).alias("revenue_c")
        )
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey,
       CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_c
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY 1 ORDER BY revenue_c DESC, l_orderkey LIMIT 10
"""


# ---------------------------------------------------------------------------
# A12: pairwise information transfer (grouped Arrow UDF — non-SQL tier)
# ---------------------------------------------------------------------------


def _it_for_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact reference information transfer for one user pair, both
    directions (metrics/JoinedProcesses.scala:49-66 via ops/infotransfer.py;
    the per-pair dwell sweep is inherently sequential, pairs parallelize
    across groups). Pairs where either series has < 10 points are dropped
    (package.scala:26)."""
    from twitter_crawler_spark.ops.infotransfer import MIN_POINTS_IT, calculate_it

    ua, ub = pdf["user_a"].iloc[0], pdf["user_b"].iloc[0]
    a = sorted(set(pdf.loc[pdf["which"] == 0, "tsl"].tolist()))
    b = sorted(set(pdf.loc[pdf["which"] == 1, "tsl"].tolist()))
    cols = ["user_a", "user_b", "n_a", "n_b", "it_ab", "it_ba"]
    if len(a) < MIN_POINTS_IT or len(b) < MIN_POINTS_IT:
        return pd.DataFrame(columns=cols)
    return pd.DataFrame(
        [(int(ua), int(ub), len(a), len(b),
          round(calculate_it(a, b), 6), round(calculate_it(b, a), 6))],
        columns=cols,
    )


def q_info_transfer(spark, sf_dir):
    """Pairwise information transfer for the 8 most active users (J7 bounded
    pair cross + A12 grouped sweep, direct + reverse per pair as in
    package.scala:29-31). Correctness: pytest twin-implementation comparison
    AND the relational DuckDB oracle (SQL_INFO_TRANSFER below) — the sweep's
    dwell distribution has a closed form, see the oracle's header comment."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("tsl")
    )
    top = (
        ev.groupBy("user_id").count()
        .orderBy(F.desc("count"), "user_id").limit(8)
        .select("user_id")
    )
    sel = ev.join(F.broadcast(top), "user_id")
    pairs = (
        top.alias("x").join(top.alias("y"),
                            F.col("x.user_id") < F.col("y.user_id"))
        .select(F.col("x.user_id").alias("user_a"), F.col("y.user_id").alias("user_b"))
    )
    # events of both pair members, tagged which side they belong to
    ev_a = pairs.join(sel, pairs.user_a == sel.user_id).select(
        "user_a", "user_b", "tsl", F.lit(0).alias("which")
    )
    ev_b = pairs.join(sel, pairs.user_b == sel.user_id).select(
        "user_a", "user_b", "tsl", F.lit(1).alias("which")
    )
    schema = (
        "user_a long, user_b long, n_a long, n_b long,"
        " it_ab double, it_ba double"
    )
    return (
        ev_a.unionByName(ev_b)
        .groupBy("user_a", "user_b")
        .applyInPandas(_it_for_group, schema)
        .orderBy("user_a", "user_b")
    )


# Relational twin of the A12 dwell sweep (ops/infotransfer.py, ref
# metrics/JoinedProcesses.scala:21-66). Why a closed form exists: the sweep
# visits every shift t where some bin's occupancy can change and accumulates
# the inter-visit distance as dwell weight, so the resulting distribution is
# exactly the Lebesgue measure of {t : bitset(t) = k} over the swept domain.
# The domain is closed-form: min_move clips to remaining+1 when the main
# train's last bin edge would pass `end`, so the final visited shift is
# always span - W (W = 43200+7200+600+1 = 51001), i.e. t ∈ [0, span-W],
# total dwell span-W+1, independent of the visit path (the additional
# train's clip never wins the min: its train is one interval shorter, so its
# remaining is always main's remaining + 1). Per bin with boundary prefixes
# [p_lo, p_hi) a point p keeps the bin occupied for shifts
# t ∈ [p - begin - p_hi + 1, p - begin - p_lo]  (start ≤ p < end ⟺ that
# range), so: clip per-point intervals to [0, span-W], union them per bin
# (gaps-and-islands), sweep ±2^bit deltas over the merged boundaries, and
# the running sum IS the bitset. Entropies then follow Distribution.scala:
# H = log2(total) − Σ c·log2(c)/total; drop-last masks out bit 6 (=64);
# single distribution masks to the main-train bits (8|16|32|64 = 120).
# Directions with span < W return NaN exactly as calculate_it does.
SQL_INFO_TRANSFER = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsl FROM events
),
top8 AS (
  SELECT user_id FROM ev GROUP BY user_id
  ORDER BY count(*) DESC, user_id LIMIT 8
),
pts AS (
  SELECT DISTINCT e.user_id, e.tsl FROM ev e JOIN top8 t USING (user_id)
),
stats AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n, MIN(tsl) AS mn, MAX(tsl) AS mx
  FROM pts GROUP BY user_id
),
pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, a.n AS n_a, b.n AS n_b
  FROM stats a JOIN stats b ON a.user_id < b.user_id
  WHERE a.n >= 10 AND b.n >= 10
),
dirs AS (
  SELECT p.user_a, p.user_b, d.dd,
         CASE WHEN d.dd = 0 THEN p.user_a ELSE p.user_b END AS u_from,
         CASE WHEN d.dd = 0 THEN p.user_b ELSE p.user_a END AS u_to
  FROM pairs p CROSS JOIN (SELECT 0 AS dd UNION ALL SELECT 1) d
),
valid AS (
  SELECT d.user_a, d.user_b, d.dd, d.u_from, d.u_to,
         LEAST(sf.mn, st.mn) AS t_begin,
         (st.mx + 1) - LEAST(sf.mn, st.mn) - 51001 AS m
  FROM dirs d
  JOIN stats sf ON sf.user_id = d.u_from
  JOIN stats st ON st.user_id = d.u_to
  WHERE (st.mx + 1) - LEAST(sf.mn, st.mn) >= 51001
),
bins(which, bit, p_lo, p_hi) AS (
  VALUES (0, 1, 0, 43200), (0, 2, 43200, 50400), (0, 4, 50400, 51000),
         (1, 8, 0, 43200), (1, 16, 43200, 50400), (1, 32, 50400, 51000),
         (1, 64, 51000, 51001)
),
iv AS (
  SELECT v.user_a, v.user_b, v.dd, b.bit,
         GREATEST(p.tsl - v.t_begin - b.p_hi + 1, 0) AS lo,
         LEAST(p.tsl - v.t_begin - b.p_lo, v.m) AS hi
  FROM valid v
  JOIN bins b ON TRUE
  JOIN pts p ON p.user_id = CASE WHEN b.which = 0 THEN v.u_from ELSE v.u_to END
  WHERE GREATEST(p.tsl - v.t_begin - b.p_hi + 1, 0)
        <= LEAST(p.tsl - v.t_begin - b.p_lo, v.m)
),
merged AS (
  SELECT user_a, user_b, dd, bit, MIN(lo) AS lo, MAX(hi) AS hi
  FROM (
    SELECT *, SUM(CASE WHEN prev_hi IS NULL OR lo > prev_hi + 1
                       THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_a, user_b, dd, bit ORDER BY lo, hi
                    ROWS UNBOUNDED PRECEDING) AS island
    FROM (
      SELECT *, MAX(hi) OVER (PARTITION BY user_a, user_b, dd, bit
                              ORDER BY lo, hi
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_hi
      FROM iv
    )
  )
  GROUP BY user_a, user_b, dd, bit, island
),
deltas AS (
  SELECT user_a, user_b, dd, lo AS t, bit AS d FROM merged
  UNION ALL SELECT user_a, user_b, dd, hi + 1, -bit FROM merged
  UNION ALL SELECT user_a, user_b, dd, 0, 0 FROM valid
  UNION ALL SELECT user_a, user_b, dd, m + 1, 0 FROM valid
),
net AS (
  SELECT user_a, user_b, dd, t, SUM(d) AS nd
  FROM deltas GROUP BY user_a, user_b, dd, t
),
seg AS (
  SELECT user_a, user_b, dd,
         CAST(SUM(nd) OVER w AS BIGINT) AS bk,
         LEAD(t) OVER w - t AS dwell
  FROM net
  WINDOW w AS (PARTITION BY user_a, user_b, dd ORDER BY t)
),
jd AS (
  SELECT user_a, user_b, dd, bk, CAST(SUM(dwell) AS BIGINT) AS w
  FROM seg WHERE dwell IS NOT NULL GROUP BY user_a, user_b, dd, bk
),
dists AS (
  SELECT user_a, user_b, dd, which, k, CAST(SUM(w) AS BIGINT) AS c
  FROM (
    SELECT user_a, user_b, dd, 0 AS which, bk AS k, w FROM jd
    UNION ALL SELECT user_a, user_b, dd, 1, bk & 63, w FROM jd
    UNION ALL SELECT user_a, user_b, dd, 2, bk & 120, w FROM jd
    UNION ALL SELECT user_a, user_b, dd, 3, bk & 56, w FROM jd
  ) GROUP BY user_a, user_b, dd, which, k
),
hs AS (
  SELECT user_a, user_b, dd, which,
         log2(CAST(SUM(c) AS DOUBLE))
         - SUM(c * log2(CAST(c AS DOUBLE))) / SUM(c) AS h
  FROM dists GROUP BY user_a, user_b, dd, which
),
itv AS (
  SELECT user_a, user_b, dd,
         (MAX(CASE WHEN which = 2 THEN h END)
          - MAX(CASE WHEN which = 3 THEN h END))
         - (MAX(CASE WHEN which = 0 THEN h END)
            - MAX(CASE WHEN which = 1 THEN h END)) AS it
  FROM hs GROUP BY user_a, user_b, dd
)
SELECT p.user_a AS user_a, p.user_b AS user_b, p.n_a AS n_a, p.n_b AS n_b,
       ROUND(COALESCE(i0.it, 'NaN'::DOUBLE), 6) AS it_ab,
       ROUND(COALESCE(i1.it, 'NaN'::DOUBLE), 6) AS it_ba
FROM pairs p
LEFT JOIN itv i0 ON i0.user_a = p.user_a AND i0.user_b = p.user_b AND i0.dd = 0
LEFT JOIN itv i1 ON i1.user_a = p.user_a AND i1.user_b = p.user_b AND i1.dd = 1
ORDER BY p.user_a, p.user_b
"""


ANALYTICS_QUERIES = {
    "host_budget_rank": (q_host_budget_rank, SQL_HOST_BUDGET_RANK),
    "opic_gains": (q_opic_gains, SQL_OPIC_GAINS),
    "revisit_fanout": (q_revisit_fanout, SQL_REVISIT_FANOUT),
    "eviction_unproductive": (q_eviction_unproductive, SQL_EVICTION),
    "cursor_incremental": (q_cursor_incremental, SQL_CURSOR),
    "anti_join_new": (q_anti_join_new, SQL_ANTI_JOIN),
    "semi_join_followers": (q_semi_join_followers, SQL_SEMI_JOIN),
    "degree_filter": (q_degree_filter, SQL_DEGREE_FILTER),
    "top_hubs": (q_top_hubs, SQL_TOP_HUBS),
    "two_hop_pairs": (q_two_hop_pairs, SQL_TWO_HOP),
    "ts_range_join": (q_ts_range_join, SQL_TS_RANGE_JOIN),
    "collect_series": (q_collect_series, SQL_COLLECT_SERIES),
    "gap_bins": (q_gap_bins, SQL_GAP_BINS),
    "gap_entropy": (q_gap_entropy, SQL_GAP_ENTROPY),
    "first_hour_features": (q_first_hour, SQL_FIRST_HOUR),
    "tpch_q1": (q_tpch_q1, SQL_TPCH_Q1),
    "tpch_q3": (q_tpch_q3, SQL_TPCH_Q3),
    "info_transfer": (q_info_transfer, SQL_INFO_TRANSFER),
}


# ---------------------------------------------------------------------------
# projection / sink-shape family (SURVEY.md §2.2 P9-P13, §2.3 D6, §2.4 F10/F11,
# §2.7 O2)
# ---------------------------------------------------------------------------


def q_first_wins_dim(spark, sf_dir):
    """First-wins dimension fill (D6): each customer's FIRST order — the
    ``row_number() == 1 then MERGE WHEN NOT MATCHED`` pattern replacing the
    reference's ``if userNode("i").isEmpty`` guards
    (storages/GraphStorage.scala:83-123)."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .where("rk = 1")
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
        .orderBy("o_custkey")
    )


SQL_FIRST_WINS = """
WITH r AS (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rk
  FROM orders
)
SELECT o_custkey, o_orderkey AS first_orderkey FROM r WHERE rk = 1
ORDER BY o_custkey
"""


def q_backfill_batch(spark, sf_dir):
    """Dimension-backfill queue batch (F10/F11 + O2 skip/limit): customers
    lacking any order, in deterministic order, one pagination page
    (``drop(1) take(size)`` analog, storages/GraphStorage.scala:299-311)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "P")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .orderBy("c_custkey")
        .select("c_custkey", "c_name")
        .offset(10)
        .limit(100)
    )


SQL_BACKFILL_BATCH = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
ORDER BY c_custkey
LIMIT 100 OFFSET 10
"""


def q_collect_names(spark, sf_dir):
    """Per-key collected name list rendered as a sorted '|'-joined string
    (A2 collect + P12 list→delimited, storages/StreamStorage.scala:33-38 —
    string form keeps the driver's value-hash array-free)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.array_join(F.array_sort(F.collect_set("c_name")), "|").alias("names_str"),
        )
        .orderBy("n_name")
    )


SQL_COLLECT_NAMES = """
SELECT n_name, COUNT(*) AS n_customers,
       array_to_string(list_sort(list(DISTINCT c_name)), '|') AS names_str
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY 1 ORDER BY n_name
"""


def q_render_rows(spark, sf_dir):
    """TSV-row rendering scalars (P11 date format + P13 format_string + P9
    null-guard coalesce), the StreamStorage.scala:18-31 row writers."""
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.format_string(
            "%d\t%s\t%s",
            F.col("o_orderkey"),
            F.date_format("o_orderdate", "dd.MM.yyyy/HH:mm"),
            F.coalesce("o_orderpriority", F.lit("")),
        ).alias("row_tsv"),
    ).orderBy("o_orderkey")


SQL_RENDER_ROWS = """
SELECT o_orderkey,
       printf('%d\t%s\t%s', o_orderkey,
              strftime(o_orderdate, '%d.%m.%Y/%H:%M'),
              COALESCE(o_orderpriority, '')) AS row_tsv
FROM orders WHERE o_orderkey < 500
ORDER BY o_orderkey
"""


def q_json_props(spark, sf_dir):
    """Property-bag extraction (the reference's ad-hoc string-keyed property
    bags, GraphStorage.scala:88-115): pull ``k`` out of the JSON props column
    and aggregate it per event type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("k").alias("sum_k"), F.max("k").alias("max_k"))
        .orderBy("event_type")
    )


SQL_JSON_PROPS = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events GROUP BY 1 ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# A13/S11: composed per-key feature vector (metrics/UrlFeatures.scala:13-22,
# 43-50 featuresFromTs + Main.scala:11-30 saveUrlFeatures)
# ---------------------------------------------------------------------------


def q_url_features(spark, sf_dir):
    """One row per key with the reference's composed feature vector analog:
    n (count), n_first_hour (events ≤ first + 1h, inclusive like
    ``urlTs.to(head + HOUR)``), entropy of the EXACT gap-value distribution
    (``Distribution(diffStream(urlTs))``, UrlFeatures.scala:44), the same over
    the first-hour prefix (hourEntropy, UrlFeatures.scala:46-48), and a
    pairwise co-activity density over the top-8 subgraph (the SQL-expressible
    stand-in for userFeatures' IT density, UrlFeatures.scala:56-68 — the true
    IT density lives in the non-SQL ``info_transfer`` query). Users with no
    gaps (single event) or outside the top-8 carry NULLs, where the reference
    would emit NaN."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("tsl")
    )
    base = ev.withColumn("first_ts", F.min("tsl").over(Window.partitionBy("user_id")))
    per_user = base.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum((F.col("tsl") <= F.col("first_ts") + 3600).cast("long")).alias("n_first_hour"),
    )
    wo = Window.partitionBy("user_id").orderBy("tsl", "event_id")
    gaps = (
        base.withColumn("prev", F.lag("tsl").over(wo))
        .where(F.col("prev").isNotNull())
        .withColumn("gap", F.col("tsl") - F.col("prev"))
        # the first-hour series is a prefix of the sorted series, so a gap
        # lies inside it iff its LATER endpoint is within the first hour
        .withColumn("in_fh", F.col("tsl") <= F.col("first_ts") + 3600)
    )

    def _entropy_of(df, out_col):
        counts = df.groupBy("user_id", "gap").agg(F.count("*").alias("c"))
        return counts.groupBy("user_id").agg(
            F.round(
                F.log2(F.sum("c").cast("double"))
                - F.sum(F.col("c").cast("double") * F.log2(F.col("c").cast("double")))
                / F.sum("c"),
                6,
            ).alias(out_col)
        )

    ent_all = _entropy_of(gaps, "gap_entropy")
    ent_fh = _entropy_of(gaps.where("in_fh"), "fh_gap_entropy")
    top = (
        ev.groupBy("user_id").count()
        .orderBy(F.desc("count"), "user_id").limit(8)
        .select("user_id")
    )
    hb = ev.select("user_id", F.expr("tsl div 3600").alias("hb")).distinct()
    th = hb.join(F.broadcast(top), "user_id")
    a, b = th.alias("a"), th.alias("b")
    co = (
        a.join(b, (F.col("a.hb") == F.col("b.hb"))
               & (F.col("a.user_id") != F.col("b.user_id")))
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.round(F.count("*") / F.lit(7.0), 6).alias("co_density"))
    )
    return (
        per_user.join(ent_all, "user_id", "left")
        .join(ent_fh, "user_id", "left")
        .join(co, "user_id", "left")
        .select("user_id", "n", "n_first_hour", "gap_entropy",
                "fh_gap_entropy", "co_density")
        .orderBy("user_id")
    )


SQL_URL_FEATURES = """
WITH e AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsl FROM events
),
b AS (
  SELECT user_id, event_id, tsl,
         MIN(tsl) OVER (PARTITION BY user_id) AS first_ts
  FROM e
),
pu AS (
  SELECT user_id, COUNT(*) AS n,
         CAST(SUM(CASE WHEN tsl <= first_ts + 3600 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_first_hour
  FROM b GROUP BY 1
),
g AS (
  SELECT user_id, tsl, first_ts,
         tsl - LAG(tsl) OVER (PARTITION BY user_id ORDER BY tsl, event_id) AS gap
  FROM b
),
gc AS (
  SELECT user_id, gap, COUNT(*) AS c FROM g WHERE gap IS NOT NULL GROUP BY 1, 2
),
ea AS (
  SELECT user_id,
         ROUND(log2(CAST(SUM(c) AS DOUBLE))
               - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / SUM(c), 6)
           AS gap_entropy
  FROM gc GROUP BY 1
),
gfc AS (
  SELECT user_id, gap, COUNT(*) AS c FROM g
  WHERE gap IS NOT NULL AND tsl <= first_ts + 3600 GROUP BY 1, 2
),
ef AS (
  SELECT user_id,
         ROUND(log2(CAST(SUM(c) AS DOUBLE))
               - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / SUM(c), 6)
           AS fh_gap_entropy
  FROM gfc GROUP BY 1
),
top8 AS (
  SELECT user_id FROM (
    SELECT user_id, COUNT(*) AS cnt FROM e GROUP BY 1
    ORDER BY cnt DESC, user_id LIMIT 8
  ) t
),
hb AS (SELECT DISTINCT user_id, tsl // 3600 AS hb FROM e),
th AS (SELECT hb.user_id, hb.hb FROM hb JOIN top8 USING (user_id)),
co AS (
  SELECT a.user_id, ROUND(CAST(COUNT(*) AS DOUBLE) / 7, 6) AS co_density
  FROM th a JOIN th b ON a.hb = b.hb AND a.user_id <> b.user_id
  GROUP BY 1
)
SELECT pu.user_id, n, n_first_hour, gap_entropy, fh_gap_entropy, co_density
FROM pu
LEFT JOIN ea USING (user_id)
LEFT JOIN ef USING (user_id)
LEFT JOIN co USING (user_id)
ORDER BY pu.user_id
"""


ANALYTICS_QUERIES.update(
    {
        "first_wins_dim": (q_first_wins_dim, SQL_FIRST_WINS),
        "backfill_batch": (q_backfill_batch, SQL_BACKFILL_BATCH),
        "collect_names": (q_collect_names, SQL_COLLECT_NAMES),
        "render_rows": (q_render_rows, SQL_RENDER_ROWS),
        "json_props": (q_json_props, SQL_JSON_PROPS),
        "url_features": (q_url_features, SQL_URL_FEATURES),
    }
)
