"""gov_procurement_spider_spark — a PySpark-native distributed crawl/analytics
engine re-expressing the capabilities of the reference
``Aiting-for-you/gov-procurement-spider`` (a sequential Selenium scraper;
see SURVEY.md) as an idiomatic Spark DataFrame program:

- ``sources``    : table loaders + deterministic synthetic site/payload generators
- ``functions``  : scalar/column expression library (strings, urls, text, images)
- ``operators``  : dedup (ordered/bloom/minhash/simhash), splitter, report, top-k, ANN
- ``plans``      : crawl epoch loop, report pipeline (single Catalyst plans)
- ``streaming``  : epoch checkpoint/commit protocol, metrics
- ``crawler``    : frontier, URL-seen bloom filter, politeness, robots, fetch UDF

Everything here derives from public knowledge only: the Apache Spark / PySpark
API and the reference repo's observable behavior.
"""

__version__ = "0.1.0"
