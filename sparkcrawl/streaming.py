"""Structured Streaming surface (SURVEY.md §2.10).

The flagship crawl is round-based microbatching (BSP) by design, but the
reference's continuous ingest shape maps onto Structured Streaming: a
Common-Crawl-style ``pages`` directory consumed as a stream, with
event-time watermarking on ``warc_ts``, streaming dedup by canonical URL,
and tumbling-window per-host throughput aggregation. ``Trigger.AvailableNow``
drains whatever data exists and stops — the streaming twin of one crawl
round, and exactly how a production backfill runs; the same queries run
unbounded with a processing-time trigger on a live directory.

All transformations are native (watermark, dropDuplicatesWithinWatermark,
window agg); the only Python is the same canonicalize pandas UDF the batch
pipeline uses — streaming and batch share one kernel, so results agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparkcrawl.udfs import canonicalize_udf, host_udf

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def read_pages_stream(
    spark: SparkSession, pages_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over a pages parquet directory. Column pruning
    matters even more under streaming — select early, never carry ``html``
    into stateful operators."""
    reader = (
        spark.readStream.schema(PAGES_SCHEMA)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(pages_dir)


def canonical_pages(pages: DataFrame) -> DataFrame:
    """url → (canon, host) with the shared kernel; html pruned immediately."""
    return (
        pages.select("url", "warc_ts", "lang")
        .withColumn("canon", canonicalize_udf(F.col("url")))
        .withColumn("host", host_udf(F.col("canon")))
    )


def streaming_dedup(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming URL-seen: keep the first arrival per canonical url within
    the watermark horizon. State is bounded by the watermark — the streaming
    analogue of the seen table's bloom horizon (late duplicates past the
    watermark fall through to the batch exact dedup)."""
    return (
        canonical_pages(pages)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["canon"])
    )


def hourly_host_counts(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window per host: pages + distinct-ish langs. The
    streaming twin of the metrics table's per-round throughput counters."""
    return (
        canonical_pages(pages)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), F.col("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.approx_count_distinct("canon").alias("approx_urls"),
        )
        .select(
            F.col("win.start").alias("hour"), "host", "n_pages", "approx_urls"
        )
    )


def stateful_host_progress(pages: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-host
    cumulative crawl progress — total pages, distinct-ish canon count, and
    max event time — carried as explicit per-key state across microbatches.
    The streaming analogue of the reference's per-host Downloader.Slot state
    (scrapy/core/downloader/__init__.py::Slot); at scale, state is
    partitioned by host exactly like the batch pipeline's budget window."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("host", T.StringType()),
            T.StructField("total_pages", T.LongType()),
            T.StructField("batches_seen", T.IntegerType()),
            T.StructField("last_ts", T.TimestampType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("total_pages", T.LongType()),
            T.StructField("batches_seen", T.IntegerType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n = 0
        last_ts = None
        for pdf in pdf_iter:
            n += len(pdf)
            ts = pdf["warc_ts"].max()
            last_ts = ts if last_ts is None else max(last_ts, ts)
        if state.exists:
            total, batches = state.get
        else:
            total, batches = 0, 0
        total += n
        batches += 1
        state.update((total, batches))
        yield pd.DataFrame(
            {
                "host": [key[0]],
                "total_pages": [total],
                "batches_seen": [batches],
                "last_ts": [last_ts],
            }
        )

    return (
        canonical_pages(pages)
        .withWatermark("warc_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, query_name: str,
    output_mode: str = "append",
) -> list:
    """Drain the stream with AvailableNow into an in-memory sink; returns
    collected rows. The checkpoint gives exactly-once *processing*: a rerun
    with the same checkpoint processes no already-committed files. The
    memory sink itself is NOT fault-tolerant, so such a rerun returns []
    (the fresh in-memory table only ever holds rows processed by THIS run)
    — use a durable sink (parquet) when resumed results must be re-read.
    Aggregations use ``output_mode="complete"`` so windows still open at
    end-of-data emit."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()
