"""sparkcrawl — PySpark-native rebuild of the kunsnat/scrapy- crawl engine.

A URL-frontier + fetch scheduler over snapshot-versioned Parquet tables
(Iceberg-emulating; SURVEY.md §0.1): partitioned bloom URL-seen set keyed by
canonicalized-URL hash, per-host politeness budgets via salted
repartition-by-host, robots.txt gating, priority/depth-ordered frontier,
vectorized Arrow/pandas UDF extraction. Pure Python — ships whole via
``spark-submit --py-files``.
"""

__version__ = "0.1.0"
