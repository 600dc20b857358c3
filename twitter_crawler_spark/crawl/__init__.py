from twitter_crawler_spark.crawl.engine import CrawlEngine  # noqa: F401
