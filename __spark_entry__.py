"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship crawl — a deterministic synthetic Common-Crawl-
  style corpus (BASELINE.json:15 mandates the pages shape; the driver's
  relational testdata has no pages table, and the round-1 instruction says to
  synthesise that shape deterministically at small scale) is crawled for a
  few rounds by the full pipeline (robots gating, per-host budget, priority
  order, bloom+anti-join dedup, UDF extraction); returns the ordered
  schedule: one row per (round, url) the crawler fetched, plus dedup stats.
- ``queries()`` / ``oracle_sql()``: one entry per operator family from
  SURVEY.md §2 + training-data ops (dedup/minhash/simhash/jaccard, ANN
  similarity search, langid/quality/token/fingerprint text analysis) over
  /root/testdata tables, each DuckDB-checked — including ``approx_users``
  (bounded-error HLL check: exact count hash-matched, estimate asserted
  within ±5% engine-side).
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end crawl of a deterministic synthetic corpus."""
    from pyspark.sql import functions as F

    from sparkcrawl.config import CrawlConfig
    from sparkcrawl.crawl import run_crawl, schedule_view
    from sparkcrawl.snapstore import SnapStore
    from sparkcrawl.synth import generate

    base = tempfile.mkdtemp(prefix="sparkcrawl_entry_")
    corpus = os.path.join(base, "corpus")
    store = os.path.join(base, "store")
    generate(corpus, seed=42, n_hosts=4, pages_per_host=10, n_seeds=2)
    cfg = CrawlConfig(round_size=32, max_rounds=6)
    run_crawl(spark, corpus, store, cfg)
    return (
        schedule_view(spark, SnapStore(store))
        .orderBy("round", F.desc("priority"), "seq")
        .select("round", "canon", "host", "depth", "priority", "seq")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from sparkcrawl.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    from sparkcrawl.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
