from twitter_crawler_spark.oracle.frontier_oracle import FrontierOracle, OracleResult  # noqa: F401
