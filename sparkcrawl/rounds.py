"""One crawl round as a checkpointed DataFrame job (SURVEY.md §3.4).

Mirrors oracle/crawler.py stage by stage — the oracle docstring is the pin.
Everything is native DataFrame ops except the four UDF projections
(canonicalize/host at link discovery, text/links at extraction, robots eval).

Scale notes (the 10^10-URL design point):
- per-round IO ∝ live queue + new links (frontier table holds QUEUED only)
- seen and pages are laid out in ``bucket = pmod(xxhash64(canon), N_BUCKETS)``
  hive partitions; the fetch join and the dedup anti-join carry ``bucket``
  as a join column so partition pruning / storage-partitioned joins apply
- the per-host budget window is salted two-phase (frontier.py) so one hot
  host cannot pin a single task (P5)
- ``html`` is projected away immediately after the extraction UDFs (F6);
  no stage after extraction ever sees the binary column
- job-count discipline: each round runs a bounded number of Spark jobs —
  rows are labeled with verdict columns and every per-partition metric
  family comes from ONE groupBy over a persisted labeled DataFrame
  (per-partition lineage per BASELINE.json:6 without per-counter jobs)
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.frontier import (
    FRONTIER_COLS,
    N_BUCKETS,
    canonicalized,
    label_candidates,
    links_to_candidates,
    with_bucket,
)
from sparkcrawl.snapstore import SnapStore
from sparkcrawl.udfs import extract_links_udf, extract_text_udf, robots_allowed_udf

from pyspark.sql import types as _T

METRICS_SCHEMA = _T.StructType(
    [
        _T.StructField("round", _T.IntegerType()),
        _T.StructField("key", _T.StringType()),
        _T.StructField("partition_id", _T.IntegerType()),
        _T.StructField("n", _T.LongType()),
    ]
)


def _verdict_counts(df: DataFrame, verdict_col: str) -> list[tuple[str, int, int]]:
    """Collect (verdict, partition_id, n) triples in ONE job."""
    rows = (
        df.groupBy(
            F.col(verdict_col).alias("key"),
            F.spark_partition_id().alias("partition_id"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return [(r["key"], r["partition_id"], r["n"]) for r in rows]


def _fp_col():
    return F.unhex(F.sha2(F.concat(F.lit("GET\x00"), F.col("canon")), 256)).alias("fp")


def prepare_pages(spark: SparkSession, store: SnapStore, pages_path: str) -> int:
    """One-time corpus indexing: pages → (bucket, url_hash, canon, …),
    hive-partitioned by bucket. Stands in for the live network (S2) — the
    Common-Crawl-style corpus IS the fetch source (BASELINE.json:6)."""
    pages = spark.read.parquet(pages_path)
    idx = (
        with_bucket(canonicalized(pages))
        .repartition(N_BUCKETS, "bucket")
        .select(
            "bucket", "url_hash", "canon",
            F.col("url").alias("page_url"),
            "html", "warc_ts", "lang",
        )
    )
    return store.overwrite("pages_idx", idx, partition_by=["bucket"])


def init_crawl(spark: SparkSession, store: SnapStore, seeds_path: str,
               cfg: CrawlConfig) -> None:
    """Round-(-1) state: seeds into frontier + seen (dont_filter semantics —
    bypass dedup but record fingerprints); empty robots table."""
    from sparkcrawl.frontier import seeds_to_frontier

    seeds = spark.read.parquet(seeds_path)
    fr = seeds_to_frontier(seeds).persist()
    f_snap = store.overwrite("frontier", fr)
    seen = with_bucket(fr).select(
        "bucket", "url_hash", "canon", _fp_col(),
        F.lit(0).cast("int").alias("first_round"),
    ).repartition(1)
    s_snap = store.append("seen", seen, partition_by=["bucket"])
    empty_robots = spark.createDataFrame(
        [], "host string, status int, body string, fetched_round int"
    )
    r_snap = store.overwrite("robots", empty_robots)
    store.commit_round(-1, {"frontier": f_snap, "seen": s_snap, "robots": r_snap})
    fr.unpersist()


def one_round(spark: SparkSession, store: SnapStore, cfg: CrawlConfig,
              round_n: int, host_budget: DataFrame | None = None) -> dict:
    """Run crawl round ``round_n``; commits new snapshots + round manifest.
    Returns summary counters (driver uses ``queued_end`` for termination)."""
    frontier = store.read(spark, "frontier")
    robots_prev = store.read(spark, "robots")
    pages_idx = store.read(spark, "pages_idx")
    counts: list[tuple[str, int, int]] = []
    _prof = os.environ.get("SPARKCRAWL_PROFILE") == "1"
    _t = [time.monotonic()]

    def _tick(label: str) -> None:
        if _prof:
            now = time.monotonic()
            print(f"    [r{round_n}] {label}: {now - _t[0]:.2f}s", flush=True)
            _t[0] = now

    # --- stage 2: robots fetch for new hosts (page fetches defer one round) ---
    if cfg.obey_robots:
        corpus_robots = store.read(spark, "robots_corpus").select("host", "status", "body")
        new_robots = (
            frontier.select("host").distinct()
            .join(robots_prev.select("host"), "host", "left_anti")
            .join(corpus_robots, "host", "left")
            .withColumn("fetched_round", F.lit(round_n).cast("int"))
            .select("host", "status", "body", "fetched_round")
            .persist()
        )
        robots_snap = store.append("robots", new_robots.repartition(1))
        counts.append(("robots_fetched", -1, new_robots.count()))
        robots_all = robots_prev.unionByName(new_robots)
        _tick("robots_append")

        # --- stages 3-4: robots eval + per-host budget, one labeled DF ---
        cand = frontier.join(robots_all, "host", "left")
        eligible_flag = F.col("fetched_round") < round_n
        cand = cand.withColumn(
            "allowed",
            F.when(~eligible_flag, F.lit(None)).otherwise(
                robots_allowed_udf("status", "body", "canon")
            ),
        )
    else:
        robots_snap = store.append(
            "robots",
            spark.createDataFrame([], "host string, status int, body string, fetched_round int"),
        )
        new_robots = None
        cand = frontier.withColumn("fetched_round", F.lit(-1).cast("int")).withColumn(
            "allowed", F.lit(True)
        )
        eligible_flag = F.lit(True)

    if host_budget is not None:
        cand = cand.join(host_budget.select("host", "max_per_round"), "host", "left")
    else:
        cand = cand.withColumn("max_per_round", F.lit(None).cast("int"))
    cand = cand.withColumn(
        "cap", F.coalesce("max_per_round", F.lit(cfg.max_per_round_default))
    )

    work = label_candidates(cand, cfg).select(*FRONTIER_COLS, "verdict").persist()
    counts.extend(_verdict_counts(work, "verdict"))
    _tick("work_materialize")

    # --- stage 5: global priority order + round cap (TakeOrdered top-K) ---
    passed = work.filter(F.col("verdict") == "pass")
    scheduled = (
        passed.select(*FRONTIER_COLS)
        .orderBy(F.col("priority").desc(), F.col("seq").asc())
        .limit(cfg.round_size)
        .persist()
    )
    deferred_cap = passed.select(*FRONTIER_COLS).join(
        scheduled.select("canon"), "canon", "left_anti"
    )

    # --- stage 6: fetch = join vs the corpus index (bucket-pruned equi-join) ---
    # --- stage 7: extraction UDFs; html dropped in the same projection (F6) ---
    fetchres = (
        with_bucket(scheduled)
        .join(
            pages_idx.select("bucket", "url_hash", "canon", "page_url", "html"),
            ["bucket", "url_hash", "canon"],
            "left",
        )
        .withColumn("hit", F.col("html").isNotNull())
        .withColumn(
            "text", F.when(F.col("hit"), extract_text_udf("html"))
        )
        .withColumn(
            "links",
            F.when(F.col("hit"), extract_links_udf("html", "page_url")),
        )
        .drop("html")
        .persist()
    )
    counts.extend(
        (("fetched" if k == "true" else "fetch_miss"), p, n)
        for k, p, n in _verdict_counts(
            fetchres.withColumn("hitk", F.col("hit").cast("string")), "hitk"
        )
    )
    _tick("fetch_extract")
    fetched = fetchres.filter(F.col("hit"))
    missed = fetchres.filter(~F.col("hit")).select(*FRONTIER_COLS)

    ext_snap = store.append(
        "extracted",
        fetched.select(
            F.lit(round_n).alias("round"), "url", "canon", "url_hash",
            "text", F.size("links").alias("n_links"), "links",
        ).coalesce(8),
    )

    # --- stages 7b-8: link discovery, filters, batch dedup, seen anti-join ---
    # single pass: the dedup window orders dropped rows AFTER viable ones
    # within each canon group, so a viable row's row_number equals its rank
    # among viable rows only — no branch/union, explode + canon UDF run once
    seen_keys = store.read(spark, "seen").select(
        "bucket", "url_hash", "canon", F.lit(True).alias("_seen")
    )
    from pyspark.sql import Window

    w_dup = Window.partitionBy("canon").orderBy(
        F.col("drop_reason").isNotNull().asc(), F.col("seq").asc()
    )
    linkwork = (
        with_bucket(links_to_candidates(fetched, cfg, round_n))
        .withColumn("_rn", F.row_number().over(w_dup))
        .join(seen_keys, ["bucket", "url_hash", "canon"], "left")
        .withColumn(
            "status",
            F.when(
                F.col("drop_reason").isNotNull(),
                F.concat(F.lower(F.col("drop_reason")), F.lit("_dropped")),
            )
            .when(F.col("_rn") > 1, "dup_in_batch")
            .when(F.col("_seen").isNotNull(), "dedup_dropped")
            .otherwise("enqueued"),
        )
        .select(*FRONTIER_COLS, "bucket", "status")
        .persist()
    )
    link_counts = _verdict_counts(linkwork, "status")
    counts.extend(link_counts)
    counts.append(("links_extracted", -1, sum(n for _, _, n in link_counts)))
    _tick("linkwork")
    fresh = linkwork.filter(F.col("status") == "enqueued")

    # --- commits: seen append, frontier overwrite, terminal log, metrics ---
    seen_snap = store.append(
        "seen",
        fresh.select(
            "bucket", "url_hash", "canon", _fp_col(),
            F.lit(round_n).cast("int").alias("first_round"),
        ).repartition(8, "bucket"),
        partition_by=["bucket"],
    )

    new_frontier = (
        work.filter(F.col("verdict").isin("robots_deferred", "budget_deferred"))
        .select(*FRONTIER_COLS)
        .unionByName(deferred_cap)
        .unionByName(fresh.select(*FRONTIER_COLS))
        .repartition(8, "url_hash")
    )
    frontier_snap = store.overwrite("frontier", new_frontier)

    log = (
        fetched.select(*FRONTIER_COLS).withColumn("state", F.lit("FETCHED"))
        .unionByName(missed.withColumn("state", F.lit("ERROR")))
        .unionByName(
            work.filter(F.col("verdict") == "robots_denied")
            .select(*FRONTIER_COLS)
            .withColumn("state", F.lit("ROBOTS_DENIED"))
        )
        .withColumn("round", F.lit(round_n).cast("int"))
        .repartition(1)
    )
    _tick("seen_frontier_writes")
    log_snap = store.append("frontier_log", log)
    _tick("log_write")

    # metrics: already collected driver-side (tiny) → write without a shuffle
    key_rename = {"pass": "scheduled_budget_pass"}
    metric_rows = [
        (round_n, key_rename.get(k, k), int(p), int(n)) for k, p, n in counts
    ]
    summary: dict[str, int] = {}
    for _, k, _, n in metric_rows:
        summary[k] = summary.get(k, 0) + n
    # derive scheduled/cap_deferred from the global-cap split
    n_sched = summary.get("fetched", 0) + summary.get("fetch_miss", 0)
    n_pass = summary.get("scheduled_budget_pass", 0)
    queued_start = n_pass + sum(
        summary.get(k, 0)
        for k in ("robots_deferred", "robots_denied", "budget_deferred")
    )
    metric_rows.append((round_n, "queued_start", -1, queued_start))
    metric_rows.append((round_n, "scheduled", -1, n_sched))
    metric_rows.append((round_n, "cap_deferred", -1, n_pass - n_sched))
    queued_end = (
        summary.get("robots_deferred", 0)
        + summary.get("budget_deferred", 0)
        + (n_pass - n_sched)
        + summary.get("enqueued", 0)
    )
    metric_rows.append((round_n, "queued_end", -1, int(queued_end)))
    summary["queued_start"] = queued_start
    summary["scheduled"] = n_sched
    summary["cap_deferred"] = n_pass - n_sched
    import pyarrow as pa

    met_snap = store.append_local(
        "metrics",
        pa.table(
            {
                "round": pa.array([r[0] for r in metric_rows], pa.int32()),
                "key": pa.array([r[1] for r in metric_rows], pa.string()),
                "partition_id": pa.array([r[2] for r in metric_rows], pa.int32()),
                "n": pa.array([r[3] for r in metric_rows], pa.int64()),
            }
        ),
        METRICS_SCHEMA,
    )

    _tick("metrics_write")
    summary["queued_end"] = int(queued_end)
    summary["round"] = round_n
    store.commit_round(
        round_n,
        {
            "frontier": frontier_snap, "seen": seen_snap, "robots": robots_snap,
            "extracted": ext_snap, "frontier_log": log_snap, "metrics": met_snap,
        },
        meta={k: int(v) for k, v in summary.items()},
    )

    for df in (work, scheduled, fetchres, linkwork, new_robots):
        if df is not None:
            df.unpersist()
    _tick("commit_unpersist")
    return summary
