"""End-to-end pipelines: the crawl driver and the queries surface."""
