"""WARC ingest/export — Common-Crawl-style interchange for the pages table.

The north-star input is "an Iceberg table of Common-Crawl-style web pages"
(BASELINE.json input_hint); the format those pages arrive in from the
outside world is WARC (ISO 28500, the WARC/1.0 record layout published at
iipc.github.io/warc-specifications — public spec, reimplemented here from
the spec text). This module is the loading dock between that world and the
parquet/Iceberg pages table the crawl pipeline reads:

- ``warc_to_pages(spark, path)`` — distributed ingest: every ``.warc`` /
  ``.warc.gz`` shard becomes one task (``binaryFile`` source; gzip members
  are not splittable, so file-per-task is the same layout every public
  Common Crawl Spark/Hadoop pipeline uses — CC publishes ~1 GB shards
  precisely so this parallelizes). Each response record yields one pages
  row; ``text`` is filled by the SAME pinned extraction kernel the pipeline
  uses (extract.extract_text), so the byte-identical-text invariant holds
  for ingested corpora exactly as for synthetic ones.
- ``export_warc(df, out_dir)`` — distributed export: each partition of a
  pages-shaped DataFrame writes one ``part-NNNNN.warc.gz`` shard from the
  executor (a custom binary sink — Spark has no WARC writer — so
  ``mapInPandas`` + ``TaskContext.partitionId()`` is the sanctioned shape;
  the returned manifest DataFrame is tiny). Records are deterministic:
  WARC-Record-ID is a UUIDv5 of (url, date), no wall clock, no randomness.

Memory shape at scale: parsing yields rows incrementally per record and
emits small Arrow batches, so a shard's *rows* never sit in memory twice;
the shard bytes themselves do (1 GB per task at CC sizing — executors are
sized for that). html bytes flow straight from record block to the parquet
writer of the caller; nothing here shuffles.

Out of scope (documented, not silent): chunked transfer-encoding bodies
(Common Crawl stores payloads de-chunked) and revisit/request/metadata
records (skipped; only ``WARC-Type: response`` carries page bytes).
"""

from __future__ import annotations

import datetime as _dt
import gzip
import os
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from sparkcrawl.extract import extract_text

_CRLF = b"\r\n"

PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("warc_ts", T.TimestampType()),
    T.StructField("html", T.BinaryType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("latency_ms", T.LongType()),
    T.StructField("status", T.IntegerType()),
    T.StructField("location", T.StringType()),
])


# ---------------------------------------------------------------------------
# pure kernels (Spark-free, unit-testable)
# ---------------------------------------------------------------------------

def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, block)`` per WARC record; header names lowercased.

    Tolerant of trailing garbage / truncation: a malformed tail ends the
    iteration instead of raising — at corpus scale one corrupt shard tail
    must never kill an ingest job (same policy as multimodal decode)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            return
        head = data[pos:head_end]
        lines = head.split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            return
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if sep:
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        block_start = head_end + 4
        block_end = block_start + length
        if block_end > n:
            return  # truncated record
        yield headers, data[block_start:block_end]
        pos = block_end


def parse_http_response(block: bytes) -> tuple[int, str | None, bytes] | None:
    """``(status, location, body)`` from an HTTP response block, else None."""
    head_end = block.find(_CRLF + _CRLF)
    if head_end < 0:
        return None
    head_lines = block[:head_end].split(_CRLF)
    parts = head_lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        return None
    try:
        status = int(parts[1])
    except ValueError:
        return None
    location = None
    for ln in head_lines[1:]:
        k, sep, v = ln.partition(b":")
        if sep and k.strip().lower() == b"location":
            location = v.strip().decode("utf-8", "replace")
            break
    return status, location, block[head_end + 4:]


def _parse_warc_date(s: str) -> _dt.datetime | None:
    try:
        return _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%SZ")
    except ValueError:
        try:
            return _dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fZ")
        except ValueError:
            return None


def warc_pages(data: bytes) -> Iterator[dict]:
    """Pages-schema row dicts from one WARC shard's bytes (response records
    only; text extracted by the pinned kernel)."""
    for headers, block in iter_warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        http = parse_http_response(block)
        if http is None:
            continue
        status, location, body = http
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "html": body,
            "text": extract_text(body) if status == 200 else "",
            "lang": None,
            "latency_ms": None,
            "status": status,
            "location": location if 300 <= status < 400 else None,
        }


_STATUS_REASON = {200: "OK", 301: "Moved Permanently", 302: "Found",
                  404: "Not Found", 500: "Internal Server Error",
                  503: "Service Unavailable"}


def build_response_record(url: str, ts: _dt.datetime, html: bytes,
                          status: int = 200,
                          location: str | None = None) -> bytes:
    """One deterministic WARC/1.0 response record (spec §4: named fields,
    CRLF line ends, two trailing CRLFs)."""
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}#{date}")
    http_head = [f"HTTP/1.1 {status} {_STATUS_REASON.get(status, 'Unknown')}",
                 "Content-Type: text/html; charset=utf-8",
                 f"Content-Length: {len(html)}"]
    if location is not None:
        http_head.append(f"Location: {location}")
    # utf-8, not ascii: ingest decodes Location with errors="replace", so a
    # re-exported corpus can legally carry non-ASCII header values — one
    # such record must never kill the export job (module policy)
    block = ("\r\n".join(http_head) + "\r\n\r\n").encode("utf-8") + (html or b"")
    warc_head = "\r\n".join([
        "WARC/1.0",
        "WARC-Type: response",
        f"WARC-Record-ID: <urn:uuid:{rid}>",
        f"WARC-Date: {date}",
        f"WARC-Target-URI: {url}",
        "Content-Type: application/http; msgtype=response",
        f"Content-Length: {len(block)}",
    ]).encode("utf-8")
    return warc_head + _CRLF + _CRLF + block + _CRLF + _CRLF


# ---------------------------------------------------------------------------
# distributed surfaces
# ---------------------------------------------------------------------------

def warc_to_pages(spark: SparkSession, path: str) -> DataFrame:
    """Pages-schema DataFrame from a directory (or glob) of WARC shards.

    One task per shard (binaryFile is non-splittable, matching gzip); rows
    stream out in ≤1024-row Arrow batches so only the shard bytes — never
    the parsed row set — are resident per task."""
    raw = (spark.read.format("binaryFile")
           .option("pathGlobFilter", "*.warc*").load(path)
           .select("path", "content"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PAGES_SCHEMA.fields]
        for pdf in it:
            for _, row in pdf.iterrows():
                data = bytes(row["content"])
                if row["path"].endswith(".gz"):
                    data = gzip.decompress(data)  # multi-member safe
                buf: list[dict] = []
                for page in warc_pages(data):
                    buf.append(page)
                    if len(buf) >= 1024:
                        yield pd.DataFrame(buf, columns=cols)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=cols)

    return raw.mapInPandas(batches, schema=PAGES_SCHEMA)


_MANIFEST_SCHEMA = T.StructType([
    T.StructField("shard", T.StringType()),
    T.StructField("n_records", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


def export_warc(df: DataFrame, out_dir: str, compress: bool = True) -> list:
    """Write a pages-shaped DataFrame as WARC shards, one per partition,
    from the executors (no collect, no coalesce-to-1). Returns the shard
    manifest rows (shard path, record count, byte size) — one per partition,
    so materializing it is O(partitions)."""
    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"
    cols = ["url", "warc_ts", "html", "status", "location"]

    def write_part(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        raw = open(path, "wb")
        sink = gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) if compress else raw
        try:
            for pdf in it:
                for _, r in pdf.iterrows():
                    # nulls are legal here: warc_to_pages emits ts NULL for
                    # a missing/unparseable WARC-Date (and pandas turns a
                    # null int column into NaN) — pin deterministic
                    # sentinels instead of letting NaT.strftime / int(nan)
                    # kill the export task
                    ts = r["warc_ts"]
                    if pd.isna(ts):
                        ts = _dt.datetime(1970, 1, 1)
                    elif hasattr(ts, "to_pydatetime"):
                        ts = ts.to_pydatetime()
                    status = r["status"]
                    status = 200 if pd.isna(status) else int(status)
                    loc = r["location"]
                    loc = None if pd.isna(loc) else loc
                    sink.write(build_response_record(
                        r["url"], ts, bytes(r["html"]) if r["html"] is not None
                        else b"", status, loc))
                    n += 1
        finally:
            sink.close()
            if compress:
                raw.close()
        if n == 0:
            os.remove(path)  # no empty shards
            yield pd.DataFrame({"shard": pd.Series([], dtype=object),
                                "n_records": pd.Series([], dtype="int64"),
                                "n_bytes": pd.Series([], dtype="int64")})
            return
        yield pd.DataFrame([{"shard": path, "n_records": n,
                             "n_bytes": os.path.getsize(path)}])

    manifest = df.select(*cols).mapInPandas(write_part, schema=_MANIFEST_SCHEMA)
    return manifest.collect()


def main(argv: list[str] | None = None) -> int:
    import argparse

    from sparkcrawl.session import get_spark

    ap = argparse.ArgumentParser(
        prog="python -m sparkcrawl.warc",
        description="WARC <-> pages-parquet converter (S3-analogue source)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    ing = sub.add_parser("ingest", help="WARC shards -> pages parquet")
    ing.add_argument("warc_path")
    ing.add_argument("out_dir")
    exp = sub.add_parser("export", help="pages parquet -> WARC shards")
    exp.add_argument("pages_parquet")
    exp.add_argument("out_dir")
    exp.add_argument("--no-gzip", action="store_true")
    args = ap.parse_args(argv)

    spark = get_spark(extra={"spark.ui.showConsoleProgress": "false"})
    if args.cmd == "ingest":
        pages = warc_to_pages(spark, args.warc_path)
        pages.write.mode("overwrite").parquet(args.out_dir)
        n = spark.read.parquet(args.out_dir).count()
        print(f"ingested {n} pages -> {args.out_dir}")
    else:
        df = spark.read.parquet(args.pages_parquet)
        manifest = export_warc(df, args.out_dir, compress=not args.no_gzip)
        total = sum(m.n_records for m in manifest)
        print(f"exported {total} records across {len(manifest)} shards -> "
              f"{args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
