"""sparkcrawl — PySpark-native rebuild of the kunsnat/scrapy- crawl engine.

A URL-frontier + fetch scheduler over snapshot-versioned Parquet tables
(Iceberg-emulating; SURVEY.md §0.1): partitioned bloom URL-seen set keyed by
canonicalized-URL hash, per-host politeness budgets via salted
repartition-by-host, robots.txt gating, priority/depth-ordered frontier,
vectorized Arrow/pandas UDF extraction. Pure Python — ships whole via
``spark-submit --py-files``.
"""

__version__ = "0.1.0"

# Worker-side fast path (see sparkcrawl/workerperf.py): pandas UDFs are
# pickled by value, so a worker imports sparkcrawl.canon/extract (for the
# referenced kernels) rather than sparkcrawl.udfs — the package __init__ is
# the one import guaranteed to run in every worker that runs our UDFs.
# install() is a no-op outside a pyspark 4.x worker process.
from sparkcrawl.workerperf import install as _workerperf_install

_workerperf_install()
