"""Feed exports of the ``extracted`` table (S6, SURVEY.md §2.1).

Plays the role of the reference's FeedExporter/item exporters
([scrapy: scrapy/exporters.py], [scrapy: scrapy/extensions/feedexport.py] —
pinned-spec cites, SURVEY.md §0): jsonlines and csv sinks over the snapshot
layer. Parquet remains the canonical store; these are user-facing export
formats.

- ``jsonl``: one JSON object per line; the nested ``links``
  array<struct> survives intact (Spark's json writer handles nesting).
- ``csv``: flat columns only — ``links`` is serialized with ``to_json`` so
  the row stays one line (CSV has no nested types).

Both writes are plain distributed ``DataFrameWriter`` jobs — no collect, no
single-partition coalesce; at 100 TB the export parallelism equals the
extracted table's partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.snapstore import SnapStore

EXPORT_FORMATS = ("jsonl", "csv")


def extracted_view(
    spark: SparkSession, store: SnapStore, snapshot_id: int | None = None
) -> DataFrame:
    return store.read(spark, "extracted", snapshot_id)


def export_extracted(
    spark: SparkSession,
    store: SnapStore,
    out_dir: str,
    fmt: str = "jsonl",
    snapshot_id: int | None = None,
    stages=None,
) -> int:
    """Write the extracted table (latest snapshot by default) to ``out_dir``
    in ``fmt``; returns the exported row count (via Observation — no extra
    job). ``stages`` (sparkcrawl.pipelines Stage sequence) runs the item
    pipeline chain inside the same plan as the write — the Scrapy
    items → pipelines → feed-export flow as one fused Spark job."""
    from pyspark.sql import Observation

    if fmt not in EXPORT_FORMATS:
        raise ValueError(f"fmt must be one of {EXPORT_FORMATS}, got {fmt!r}")
    obs = Observation()
    df = extracted_view(spark, store, snapshot_id)
    if stages:
        from sparkcrawl.pipelines import apply_pipelines

        df = apply_pipelines(df, stages).df
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    if fmt == "jsonl":
        df.write.mode("overwrite").json(out_dir)
    else:
        flat = df.withColumn("links", F.to_json("links"))
        flat.write.mode("overwrite").option("header", True).csv(out_dir)
    return int(obs.get["n"])
