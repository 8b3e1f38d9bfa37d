"""Round plans and the crawl driver loop."""
