"""Near-dup cluster assignment: connected components over the MinHash-LSH
candidate graph, via alternating large-star / small-star contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC 2014).

Why this shape at 100 TB: near-dup *pairs* (dedup_minhash_lsh) are not yet a
dedup decision — a duplicate cluster of size m produces O(m²) candidate pairs
and a keeper policy needs one label per document. Label propagation converges
in O(diameter) rounds (a chain of borderline near-dups can have diameter in
the thousands), while large-star/small-star provably converges in O(log n)
rounds of pure groupBy/join dataflows — every step is a hash shuffle on node
id, no windows, no driver-side graph state. Each iteration is localCheckpoint
barriered so the lineage (and Catalyst plan) stays O(1) deep regardless of
iteration count — the same barrier discipline the crawl engine uses per round.

Candidate edges come from ops.corpus.sql_lsh_pairs — the SAME SQL template
(dialect "spark") whose "duckdb" rendering feeds the recursive-CTE oracle
(ops.corpus.sql_dedup_clusters), so the two sides cluster a definitionally
identical graph.

Convergence detection: the canonical (deduped) edge set's (row count,
sum of xxhash64(u, v)) signature is compared across iterations — an
order-independent, driver-cheap fingerprint (one agg per round, two longs
collected). A 64-bit sum collision between consecutive DIFFERENT edge sets is
~2⁻⁶⁴ per iteration and would be surfaced by the oracle gate, not hidden.

Reference analog: the reference has no clustering tier (its dedup is
exact-id membership, storages/TweetStorage.scala:53-60); this operator is
part of the training-data pipeline tier layered on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from twitter_crawler_spark.ops.corpus import sql_lsh_pairs

_MAX_ITERS = 50  # provably O(log n); 50 covers n ≈ 2^50 with margin


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) undirected edge set → for every node u and neighbor v > u,
    emit (v, m) where m = min(Γ(u) ∪ {u}): large neighbors re-point at the
    neighborhood minimum."""
    nbrs = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        nbrs.where(F.col("v") > F.col("u"))
        .join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient every edge large→small, then for each node u connect its
    smaller neighborhood N (and u itself) to m = min(N): small neighbors
    collapse onto the local minimum."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    joined = oriented.join(mins, "u")
    return (
        joined.select(F.col("v").alias("u"), F.col("m").alias("v"))
        .unionByName(joined.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _signature(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(edges: DataFrame) -> DataFrame:
    """Undirected edge list (u, v) → star edges (u → component-min root) for
    every non-root node. Roots and isolated nodes emit no row."""
    cur = edges.select(
        F.col("u").cast("bigint").alias("u"), F.col("v").cast("bigint").alias("v")
    ).where(F.col("u") != F.col("v")).distinct().localCheckpoint()
    sig = _signature(cur)
    for _ in range(_MAX_ITERS):
        nxt = _small_star(_large_star(cur)).localCheckpoint()
        cur.unpersist()
        nsig = _signature(nxt)
        cur = nxt
        if nsig == sig:
            # fixpoint of small∘large star ⇒ star graphs rooted at minima
            return cur.groupBy("u").agg(F.min("v").alias("v"))
        sig = nsig
    raise RuntimeError(f"connected_components did not converge in {_MAX_ITERS} iterations")


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog entry: every document labeled with the min doc_id of its
    connected component in the LSH candidate graph (singletons → self)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    pairs = spark.sql(sql_lsh_pairs("spark"))
    stars = connected_components(
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    )
    return (
        docs.select("doc_id")
        .join(stars, docs["doc_id"] == stars["u"], "left")
        .select(
            "doc_id",
            F.coalesce(F.col("v"), F.col("doc_id")).cast("bigint").alias("cluster_id"),
        )
        .orderBy("doc_id")
    )
