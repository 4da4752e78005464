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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkcrawl.config import CrawlConfig
from sparkcrawl.frontier import (
    FRONTIER_COLS,
    anti_join_seen,
    canonicalized,
    dedup_batch,
    links_to_candidates,
    per_host_budget_rank,
    with_bucket,
)
from sparkcrawl.snapstore import SnapStore
from sparkcrawl.udfs import extract_links_udf, extract_text_udf, robots_allowed_udf

def _stage_counts(df: DataFrame, key: str, round_n: int) -> DataFrame:
    """Per-partition lineage counter rows for one stage (BASELINE.json:6)."""
    pid = F.spark_partition_id().alias("partition_id")
    return df.groupBy(pid).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(round_n).alias("round"),
        F.lit(key).alias("key"),
        "partition_id",
        "n",
    )


def prepare_pages(spark: SparkSession, store: SnapStore, pages_path: str) -> int:
    """One-time corpus indexing: pages → (bucket, url_hash, canon, …),
    hive-partitioned by bucket. Stands in for the live network (S2) — the
    Common-Crawl-style corpus IS the fetch source (BASELINE.json:6)."""
    pages = spark.read.parquet(pages_path)
    idx = with_bucket(canonicalized(pages)).select(
        "bucket", "url_hash", "canon",
        F.col("url").alias("page_url"),
        "html", "warc_ts", "lang",
    )
    return store.overwrite("pages_idx", idx, partition_by=["bucket"])


def init_crawl(spark: SparkSession, store: SnapStore, seeds_path: str,
               cfg: CrawlConfig) -> None:
    """Round-(-1) state: seeds into frontier + seen (dont_filter semantics —
    bypass dedup but record fingerprints); empty robots/log tables."""
    from sparkcrawl.frontier import seeds_to_frontier

    seeds = spark.read.parquet(seeds_path)
    fr = seeds_to_frontier(seeds)
    f_snap = store.overwrite("frontier", fr)
    seen = with_bucket(fr).select(
        "bucket", "url_hash", "canon",
        F.unhex(F.sha2(F.concat(F.lit("GET\x00"), F.col("canon")), 256)).alias("fp"),
        F.lit(0).cast("int").alias("first_round"),
    )
    s_snap = store.append("seen", seen, partition_by=["bucket"])
    empty_robots = spark.createDataFrame(
        [], "host string, status int, body string, fetched_round int"
    )
    r_snap = store.overwrite("robots", empty_robots)
    store.commit_round(-1, {"frontier": f_snap, "seen": s_snap, "robots": r_snap})


def one_round(spark: SparkSession, store: SnapStore, cfg: CrawlConfig,
              round_n: int, host_budget: DataFrame | None = None) -> dict:
    """Run crawl round ``round_n``; commits new snapshots + round manifest.
    Returns summary counters (driver uses ``queued_end`` for termination)."""
    frontier = store.read(spark, "frontier")
    robots_prev = store.read(spark, "robots")
    pages_idx = store.read(spark, "pages_idx")

    metrics: list[DataFrame] = [_stage_counts(frontier, "queued_start", round_n)]

    # --- stage 2: robots fetch for new hosts (page fetches defer one round) ---
    if cfg.obey_robots:
        corpus_robots = (
            store.read(spark, "robots_corpus")
            .select("host", "status", "body")
        )
        new_hosts = (
            frontier.select("host").distinct()
            .join(robots_prev.select("host"), "host", "left_anti")
        )
        new_robots = (
            new_hosts.join(corpus_robots, "host", "left")
            .withColumn("fetched_round", F.lit(round_n).cast("int"))
            .select("host", "status", "body", "fetched_round")
        )
        metrics.append(_stage_counts(new_robots, "robots_fetched", round_n))
        robots_snap = store.append("robots", new_robots)
        robots_all = store.read(spark, "robots")

        cand = frontier.join(robots_all, "host", "left").persist()
        deferred_robots = cand.filter(
            F.col("fetched_round").isNull() | (F.col("fetched_round") == round_n)
        )
        eligible = cand.filter(F.col("fetched_round") < round_n)
        metrics.append(_stage_counts(deferred_robots, "robots_deferred", round_n))

        # --- stage 3: robots eval on the canonical url ---
        eligible = eligible.withColumn(
            "allowed", robots_allowed_udf("status", "body", "canon")
        ).persist()
        denied = eligible.filter(~F.col("allowed"))
        allowed = eligible.filter(F.col("allowed"))
        metrics.append(_stage_counts(denied, "robots_denied", round_n))
    else:
        robots_snap = store.append(
            "robots",
            spark.createDataFrame([], "host string, status int, body string, fetched_round int"),
        )
        cand = frontier.persist()
        deferred_robots = cand.filter(F.lit(False))
        denied = cand.filter(F.lit(False))
        eligible = cand
        allowed = cand

    # --- stage 4: per-host budget (salted two-phase window) ---
    if host_budget is not None:
        allowed = allowed.join(
            host_budget.select("host", "max_per_round"), "host", "left"
        )
    else:
        allowed = allowed.withColumn("max_per_round", F.lit(None).cast("int"))
    allowed = allowed.withColumn(
        "cap", F.coalesce("max_per_round", F.lit(cfg.max_per_round_default))
    )
    ranked = per_host_budget_rank(allowed, cfg).persist()
    passed = ranked.filter(
        F.col("host_rank").isNotNull() & (F.col("host_rank") <= F.col("cap"))
    )
    deferred_budget = ranked.filter(
        F.col("host_rank").isNull() | (F.col("host_rank") > F.col("cap"))
    )
    metrics.append(_stage_counts(deferred_budget, "budget_deferred", round_n))

    # --- stage 5: global priority order + round cap (TakeOrdered top-K) ---
    scheduled = (
        passed.orderBy(F.col("priority").desc(), F.col("seq").asc())
        .limit(cfg.round_size)
        .persist()
    )
    deferred_cap = passed.join(scheduled.select("canon"), "canon", "left_anti")
    metrics.append(_stage_counts(scheduled, "scheduled", round_n))
    metrics.append(_stage_counts(deferred_cap, "cap_deferred", round_n))

    # record the round's schedule (ordered) for golden comparison + lineage
    sched_log = scheduled.select(
        F.lit(round_n).alias("round"), "url", "canon", "url_hash", "host",
        "depth", "priority", "seq",
    )
    sched_snap = store.append("schedule", sched_log)

    # --- stage 6: fetch = join vs the corpus index (bucket-pruned equi-join) ---
    fetchres = (
        with_bucket(scheduled.select(*FRONTIER_COLS))
        .join(
            pages_idx.select("bucket", "url_hash", "canon", "page_url", "html"),
            ["bucket", "url_hash", "canon"],
            "left",
        )
    )
    # --- stage 7: extraction UDFs; html is dropped in the same projection ---
    fetched = (
        fetchres.filter(F.col("html").isNotNull())
        .withColumn("text", extract_text_udf("html"))
        .withColumn("links", extract_links_udf("html", "page_url"))
        .drop("html")
        .persist()
    )
    missed = fetchres.filter(F.col("html").isNull()).select(*FRONTIER_COLS).persist()
    metrics.append(_stage_counts(fetched, "fetched", round_n))
    metrics.append(_stage_counts(missed, "fetch_miss", round_n))

    ext_snap = store.append(
        "extracted",
        fetched.select(
            F.lit(round_n).alias("round"), "url", "canon", "url_hash",
            "text", F.size("links").alias("n_links"), "links",
        ),
    )

    # --- stages 7b-8: link discovery, filters, dedup ---
    linkcands = links_to_candidates(fetched, cfg, round_n)
    viable = dedup_batch(linkcands.filter(F.col("drop_reason").isNull()))
    seen = store.read(spark, "seen")
    survivors = viable.filter(~F.col("dup_in_batch"))
    fresh = anti_join_seen(survivors, seen).persist()
    linkcands = linkcands.persist()
    viable = viable.persist()

    metrics.append(_stage_counts(linkcands, "links_extracted", round_n))
    for reason, key in [
        ("NOFOLLOW", "nofollow_dropped"), ("DEPTH", "depth_dropped"),
        ("URL_GUARD", "url_guard_dropped"), ("OFFSITE", "offsite_dropped"),
    ]:
        metrics.append(
            _stage_counts(
                linkcands.filter(F.col("drop_reason") == reason), key, round_n
            )
        )
    metrics.append(
        _stage_counts(viable.filter(F.col("dup_in_batch")), "dup_in_batch", round_n)
    )
    # dedup_dropped = unique viable minus fresh
    metrics.append(
        _stage_counts(
            viable.filter(~F.col("dup_in_batch"))
            .join(fresh.select("canon"), "canon", "left_anti"),
            "dedup_dropped", round_n,
        )
    )
    metrics.append(_stage_counts(fresh, "enqueued", round_n))

    # --- commits: seen append, frontier overwrite, terminal log, metrics ---
    seen_snap = store.append(
        "seen",
        fresh.select(
            "bucket", "url_hash", "canon",
            F.unhex(F.sha2(F.concat(F.lit("GET\x00"), F.col("canon")), 256)).alias("fp"),
            F.lit(round_n).cast("int").alias("first_round"),
        ),
        partition_by=["bucket"],
    )

    new_frontier = (
        deferred_robots.select(*FRONTIER_COLS)
        .unionByName(deferred_budget.select(*FRONTIER_COLS))
        .unionByName(deferred_cap.select(*FRONTIER_COLS))
        .unionByName(fresh.select(*FRONTIER_COLS))
    )
    frontier_snap = store.overwrite("frontier", new_frontier)

    log = (
        fetched.select(*FRONTIER_COLS).withColumn("state", F.lit("FETCHED"))
        .unionByName(missed.withColumn("state", F.lit("ERROR")))
        .unionByName(denied.select(*FRONTIER_COLS).withColumn("state", F.lit("ROBOTS_DENIED")))
        .withColumn("round", F.lit(round_n).cast("int"))
    )
    log_snap = store.append("frontier_log", log)

    metrics_df = metrics[0]
    for m in metrics[1:]:
        metrics_df = metrics_df.unionByName(m)
    met_snap = store.append("metrics", metrics_df)

    # summary (small collect: one row per counter key)
    summary_rows = (
        store.read(spark, "metrics")
        .filter(F.col("round") == round_n)
        .groupBy("key").agg(F.sum("n").alias("n"))
        .collect()
    )
    summary = {r["key"]: r["n"] for r in summary_rows}
    queued_end = store.read(spark, "frontier").count()
    summary["queued_end"] = queued_end
    summary["round"] = round_n

    store.commit_round(
        round_n,
        {
            "frontier": frontier_snap, "seen": seen_snap, "robots": robots_snap,
            "extracted": ext_snap, "frontier_log": log_snap, "metrics": met_snap,
            "schedule": sched_snap,
        },
        meta={k: int(v) for k, v in summary.items()},
    )

    for df in (cand, eligible, ranked, scheduled, fetched, missed, linkcands, viable, fresh):
        try:
            df.unpersist()
        except Exception:
            pass
    return summary
