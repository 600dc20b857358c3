"""Training-data pipeline operators over the generic testdata tables.

Beyond the crawl engine (twitter_crawler_spark.crawl), this package provides
the large-scale corpus-processing operators a 100 TB web-text pipeline needs:
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding
cosine), approximate similarity search, text statistics (language id, quality
scores, token counts, fingerprints), multimodal binary-column plumbing, and
the reference's offline analytics tier (SURVEY.md §2.5-2.7, §3.3).

Every operator is expressed with JVM-side Spark SQL primitives (higher-order
functions — no Python in the hot path) wherever possible; each has a DuckDB
oracle twin generated from the same expression templates (ops.exprs), so the
driver's side-by-side correctness gate covers them.
"""
