"""SparkSession factory with the pipeline's pinned physical knobs.

Knobs live in code, not user env (SURVEY.md §4.3): AQE on, Arrow on,
shuffle partitions ≈ cores, UTC session TZ (duckdb-oracle comparability),
small Arrow batches for html:binary UDF stages.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    app: str = "sparkcrawl",
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    if shuffle_partitions is None:
        # = cores, not a multiple: local-mode per-reduce-task overhead is
        # ~10-15 ms, so extra shuffle partitions cost wall time on every
        # exchange without adding parallelism (AQE splits skewed partitions
        # when one runs long). On a real cluster raise this to 2-4× cores.
        shuffle_partitions = max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html:binary rows are fat — cap Arrow batch size for UDF stages
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # extraction runs INSIDE the corpus scan stage (no shuffle of html),
        # so scan splits bound its parallelism. The default 128 MB bin-packs
        # a compressed corpus into far fewer tasks than cores — right for
        # IO-bound scans, wrong when each input byte costs ~1 ms/KB of
        # Python. 16 MB splits keep every core fed; on a real cluster size
        # this to corpus_bytes / (4 × total_cores).
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", os.environ.get("SPARKCRAWL_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    # shuffle/spill scratch on tmpfs when available: the sandbox VM disk has
    # bursty writeback latency that pollutes timing; real clusters put
    # spark.local.dir on NVMe. Overridable via SPARKCRAWL_LOCAL_DIR.
    local_dir = os.environ.get(
        "SPARKCRAWL_LOCAL_DIR",
        "/dev/shm/sparkcrawl_local" if os.path.isdir("/dev/shm") else "",
    )
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prewarm_python_workers(spark: SparkSession) -> None:
    """Spawn + warm the Arrow UDF worker pool before the first real UDF stage.

    Two distinct costs land on the first heavy Arrow stage of a fresh pool:
    (1) worker fork + pandas/pyarrow import per task slot, and (2) ~hundreds
    of core-seconds of kernel time growing each worker's allocator arenas to
    real batch size (measured: an identical extraction job runs at 38% sys /
    20% idle on a cold pool and 88% user once warm). On a long-lived cluster
    executors stay warm across rounds; in a fresh-JVM run both costs would
    otherwise land inside the first fetch-heavy round. So the warm-up job
    pushes REALISTIC page-sized html through the extraction UDFs — one full
    Arrow batch per task slot; spark.python.worker.reuse (default true) keeps
    the workers (and their grown arenas) alive for the crawl."""
    if getattr(spark, "_sparkcrawl_prewarmed", False):
        return
    from pyspark.sql import functions as F

    from sparkcrawl.udfs import canonicalize_udf, extract_page_udf

    par = spark.sparkContext.defaultParallelism
    doc = (
        "<html><head><title>w</title><meta charset=\"utf-8\"></head><body>"
        + "".join(
            f'<p>warm paragraph {i} pad pad pad pad pad pad pad</p>'
            f'<a href="/w{i}.html?b=2&a=1">w {i}</a>'
            for i in range(120)
        )
        + "</body></html>"
    )  # ≈ 9 KB — matches bench page weight so arenas grow to working size
    rows_per_slot = 1024
    n = par * 2 * rows_per_slot
    (
        spark.range(0, n, 1, par * 2)
        .withColumn("u", F.concat(F.lit("http://w.example/p?b=2&a="), F.col("id")))
        .withColumn("h", F.encode(F.lit(doc), "utf-8"))
        .select(
            canonicalize_udf("u").alias("c"),
            extract_page_udf("h", "u").alias("p"),
        )
        .select(F.count(F.lit(1)))
        .collect()
    )
    spark._sparkcrawl_prewarmed = True
