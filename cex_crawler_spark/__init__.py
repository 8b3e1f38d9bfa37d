"""cex_crawler_spark — a PySpark-native crawl frontier & fetch scheduler.

A from-scratch re-expression of the capabilities of r-hou/cex_crawler
(reference at /root/reference, read-only) as an idiomatic PySpark engine:

- a partitioned, host-bucketed URL frontier with xxhash64 identity and
  URL canonicalization (replacing per-exchange md5-of-url keys,
  cf. reference exchange/bybit.py:121),
- a URL-seen set maintained as a table + broadcast Bloom prefilter with
  exactness guaranteed by a left-anti join (replacing the
  ``os.path.exists(json_file)`` memoization, reference
  exchange/binance.py:253-255),
- a politeness scheduler expressed as a window-ranked token bucket
  (replacing the serial per-host loop with ``random_delay(2,5)``,
  reference exchange/base_scraper.py:160-164),
- a batched, Arrow-vectorized fetch/parse/validate pipeline over
  image+caption payload tables (binary column + typed metadata),
- per-round atomic snapshot commits (parquet + manifest) so a killed
  run resumes bit-identically,
- plus the large-scale training-data operators a 100 TB pipeline needs:
  exact/MinHash-LSH/SimHash dedup, ANN similarity search, language-ID,
  quality scoring, tokenization, fingerprinting.

Everything is DataFrame-first: Catalyst plans, built-in functions in the
hot path, pandas UDFs only where semantics require Python.
"""

__version__ = "0.1.0"
