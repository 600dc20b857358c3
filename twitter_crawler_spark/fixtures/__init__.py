from twitter_crawler_spark.fixtures.webgen import generate_web  # noqa: F401
