"""PySpark-native crawl/analytics engine with the capabilities of the
reference repo ``XamHans/scrapy-crawler-german-real-estate-sites``.

Built from scratch on the public PySpark DataFrame API (Spark 4.x):

- ``functions``  — scalar/vectorized column semantics (German-locale parsing,
  URL normalization, text analysis) and a self-contained HTML DOM +
  XPath-subset evaluator (no lxml in this environment).
- ``operators``  — crawl-dataflow operators: portal field extraction +
  link extraction (vectorized mapInPandas), URL-seen bloom filter,
  politeness token buckets, frontier priority, dedup/similarity suites.
- ``sources``    — deterministic synthetic fixture generator (the "web" as
  a Common-Crawl-style pages table) and table IO helpers.
- ``plans``      — the crawl driver loop, the offline reference-semantics
  simulator (golden oracle), and the listing sink transforms.
- ``streaming``  — Structured Streaming frontier drain variant.

Design notes (scale): everything is declared through the DataFrame API so
Catalyst handles pushdown/pruning; the only Python on the hot path is
Arrow-batched pandas UDFs (HTML parse). See SURVEY.md §1.2/§4.
"""

__version__ = "0.1.0"
