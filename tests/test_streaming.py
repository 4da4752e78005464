"""Structured Streaming surface (sparkcrawl/streaming.py): AvailableNow
drain ≡ batch results, streaming dedup, checkpointed exactly-once resume."""

import pytest
from pyspark.sql import functions as F

from sparkcrawl.streaming import (
    hourly_host_counts,
    read_pages_stream,
    run_available_now,
    streaming_dedup,
)
from sparkcrawl.synth import generate


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("stream_corpus"))
    generate(d, seed=11, n_hosts=6, pages_per_host=25, n_seeds=6)
    # re-lay the single parquet file as a multi-file directory (file source)
    src = spark.read.parquet(f"{d}/pages.parquet")
    out = f"{d}/pages_stream"
    src.repartition(4).write.parquet(out)
    return out


def test_streaming_dedup_available_now(spark, pages_dir, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_dedup"))
    stream = streaming_dedup(read_pages_stream(spark, pages_dir))
    rows = run_available_now(stream, ck, "dedup_sink")
    canons = [r["canon"] for r in rows]
    assert len(canons) == len(set(canons)), "stream must emit each canon once"
    # batch ground truth over the same files with the same kernel
    batch = (
        spark.read.parquet(pages_dir)
        .select("url").distinct().count()
    )
    assert len(canons) == batch  # synth urls are canon-unique


def test_hourly_counts_match_batch(spark, pages_dir, tmp_path_factory):
    ck = str(tmp_path_factory.mktemp("ck_agg"))
    stream = hourly_host_counts(read_pages_stream(spark, pages_dir))
    got = {
        (r["hour"], r["host"]): r["n_pages"]
        for r in run_available_now(stream, ck, "agg_sink", output_mode="complete")
    }
    from sparkcrawl.streaming import canonical_pages

    batch = (
        canonical_pages(spark.read.parquet(pages_dir))
        .groupBy(F.date_trunc("hour", "warc_ts").alias("hour"), "host")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {(r["hour"], r["host"]): r["n"] for r in batch}
    assert got == want


def test_checkpoint_resume_no_reprocess(spark, pages_dir, tmp_path_factory):
    # memory sink cannot recover a checkpoint — use the file sink (the
    # production shape) to prove exactly-once across restarts
    ck = str(tmp_path_factory.mktemp("ck_resume"))
    out = str(tmp_path_factory.mktemp("out_resume")) + "/data"

    def drain():
        q = (
            streaming_dedup(read_pages_stream(spark, pages_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    first = drain()
    assert first > 0
    # same checkpoint, new run: all files already committed → zero new rows
    assert drain() == first


def test_stateful_host_progress(spark, pages_dir, tmp_path_factory):
    from sparkcrawl.streaming import stateful_host_progress

    ck = str(tmp_path_factory.mktemp("ck_state"))
    stream = stateful_host_progress(read_pages_stream(spark, pages_dir))
    rows = run_available_now(stream, ck, "state_sink", output_mode="update")
    # last emitted update per host carries the cumulative totals
    final = {}
    for r in rows:
        cur = final.get(r["host"])
        if cur is None or r["batches_seen"] >= cur["batches_seen"]:
            final[r["host"]] = r
    want = {
        r["host"]: r["n"]
        for r in (
            spark.read.parquet(pages_dir)
            .groupBy(F.expr("parse_url(url, 'HOST')").alias("host"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    got = {h: r["total_pages"] for h, r in final.items()}
    assert got == want
    assert all(r["last_ts"] is not None for r in final.values())
