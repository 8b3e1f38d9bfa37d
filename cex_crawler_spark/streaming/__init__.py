"""Structured Streaming analogs of the crawl's incremental semantics."""
