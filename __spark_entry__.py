"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship scheduler query at sf0.001; ``queries`` /
``oracle_sql`` expose every implemented operator from SURVEY.md §2 plus the
training-data pipeline tier (dedup / similarity / text stats / multimodal)
for the DuckDB side-by-side correctness gate.

Implementation lives in ``twitter_crawler_spark.ops``:

* ops.analytics — scheduler/join/series/scan operators via the DataFrame API
  (each cites its reference analog file:line in the module docstring);
* ops.corpus — dedup / similarity / text statistics as Spark SQL
  higher-order-function pipelines, generated for BOTH dialects from one
  template module (ops.exprs) so the oracle can never drift;
* ops.multimodal — binary-payload plumbing via mapInPandas (the fake decode
  is deterministic byte arithmetic, so even this has a SQL oracle twin).

The crawl engine itself (twitter_crawler_spark.crawl) is validated by the
pytest golden suite against the pure-Python frontier oracle (tests/), and
benchmarked by bench.py — its iterative multi-round semantics don't fit a
single-DataFrame/SQL pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from twitter_crawler_spark.ops.analytics import ANALYTICS_QUERIES
from twitter_crawler_spark.ops.components import q_dedup_clusters
from twitter_crawler_spark.ops.corpus import CORPUS_SQL, EXTRA_ORACLE_SQL
from twitter_crawler_spark.ops.multimodal import q_multimodal_features

_CORPUS_TABLES = ("documents", "embeddings")


def _corpus_query(name: str) -> Callable[[SparkSession, str], DataFrame]:
    builder = CORPUS_SQL[name]

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in _CORPUS_TABLES:
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        return spark.sql(builder("spark"))

    run.__name__ = f"q_{name}"
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the per-host politeness
    budget pop window (the heart of the crawl scheduler, F5/F8)."""
    fn, _ = ANALYTICS_QUERIES["host_budget_rank"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (fn, _sql) in ANALYTICS_QUERIES.items():
        out[name] = fn
    for name in CORPUS_SQL:
        out[name] = _corpus_query(name)
    out["multimodal_features"] = q_multimodal_features
    out["dedup_clusters"] = q_dedup_clusters
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name, (_fn, sql) in ANALYTICS_QUERIES.items():
        if sql is not None:  # info_transfer: non-SQL (grouped Arrow UDF)
            out[name] = sql
    for name, builder in CORPUS_SQL.items():
        out[name] = builder("duckdb")
    # multimodal_features runs as mapInPandas on the Spark side, but the fake
    # decode is deterministic byte arithmetic → SQL-expressible oracle
    for name, builder in EXTRA_ORACLE_SQL.items():
        out[name] = builder("duckdb")
    return out
