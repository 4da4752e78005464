"""WARC ingest/export: kernel unit tests + distributed round-trip against
the synthetic corpus (pages parquet -> WARC shards -> pages DataFrame)."""

import datetime
import gzip
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkcrawl.extract import extract_text
from sparkcrawl.warc import (
    build_response_record,
    export_warc,
    iter_warc_records,
    parse_http_response,
    warc_pages,
    warc_to_pages,
)

TS = datetime.datetime(2026, 3, 1, 12, 0, 0)
HTML = b"<html><body><p>hello warc world</p></body></html>"


def test_kernel_roundtrip_response_record():
    rec = build_response_record("http://h0.example/a", TS, HTML)
    pages = list(warc_pages(rec))
    assert len(pages) == 1
    p = pages[0]
    assert p["url"] == "http://h0.example/a"
    assert p["html"] == HTML
    assert p["status"] == 200
    assert p["location"] is None
    assert p["warc_ts"] == TS
    assert p["text"] == extract_text(HTML)


def test_kernel_redirect_and_skipped_record_types():
    redirect = build_response_record(
        "http://h0.example/old", TS, b"", status=301,
        location="http://h0.example/new")
    # a request record must be skipped (only WARC-Type: response is a page)
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: http://h0.example/old\r\n"
           b"Content-Length: 5\r\n\r\nGET /\r\n\r\n")
    ok = build_response_record("http://h1.example/b", TS, HTML)
    pages = list(warc_pages(req + redirect + ok))
    assert [p["url"] for p in pages] == [
        "http://h0.example/old", "http://h1.example/b"]
    assert pages[0]["status"] == 301
    assert pages[0]["location"] == "http://h0.example/new"
    assert pages[0]["text"] == ""  # non-200 never extracted (F5 semantics)


def test_kernel_truncated_tail_is_tolerated():
    good = build_response_record("http://h0.example/a", TS, HTML)
    truncated = build_response_record("http://h0.example/b", TS, HTML)[:-30]
    pages = list(warc_pages(good + truncated))
    assert [p["url"] for p in pages] == ["http://h0.example/a"]
    # header-level garbage also ends iteration instead of raising
    assert list(iter_warc_records(good + b"NOT-A-WARC")) != []


def test_parse_http_response_malformed():
    assert parse_http_response(b"garbage with no head") is None
    assert parse_http_response(b"ICY 200\r\n\r\nbody") is None


def test_record_ids_are_deterministic():
    a = build_response_record("http://h0.example/a", TS, HTML)
    b = build_response_record("http://h0.example/a", TS, HTML)
    assert a == b


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from sparkcrawl.synth import generate

    d = str(tmp_path_factory.mktemp("warc_corpus"))
    generate(d, seed=11, n_hosts=4, pages_per_host=12, n_seeds=2)
    return d


def test_spark_export_ingest_roundtrip(spark, corpus, tmp_path):
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    out = str(tmp_path / "warc_out")
    manifest = export_warc(pages.repartition(3), out)
    assert sum(m.n_records for m in manifest) == pages.count()
    assert all(m.shard.endswith(".warc.gz") for m in manifest)
    # every shard is a valid multi-member-safe gzip stream
    for m in manifest:
        with open(m.shard, "rb") as fh:
            assert gzip.decompress(fh.read()).startswith(b"WARC/1.0")

    back = warc_to_pages(spark, out)
    key = ["url", "status", "location"]
    orig = {r["url"]: r for r in
            pages.select("url", "html", "warc_ts", *key[1:]).collect()}
    got = {r["url"]: r for r in
           back.select("url", "html", "warc_ts", "text", *key[1:]).collect()}
    assert set(got) == set(orig)
    for url, r in got.items():
        o = orig[url]
        assert bytes(r["html"]) == bytes(o["html"]), url
        assert r["status"] == o["status"], url
        # location survives for 3xx only (export writes it, ingest keeps it)
        if 300 <= o["status"] < 400:
            assert r["location"] == o["location"], url
        assert r["warc_ts"].replace(tzinfo=None) == \
            o["warc_ts"].replace(tzinfo=None), url
        if o["status"] == 200:
            # ingest fills text with the pinned kernel — the same invariant
            # the pipeline guarantees (byte-identical extracted text)
            assert r["text"] == extract_text(bytes(o["html"])), url


def test_ingest_plain_and_gzip_mixed(spark, tmp_path):
    d = tmp_path / "mixed"
    d.mkdir()
    rec_a = build_response_record("http://hx.example/a", TS, HTML)
    rec_b = build_response_record("http://hx.example/b", TS, HTML)
    (d / "s0.warc").write_bytes(rec_a)
    (d / "s1.warc.gz").write_bytes(gzip.compress(rec_b))
    (d / "ignored.txt").write_bytes(b"not a warc")
    back = warc_to_pages(spark, str(d))
    assert sorted(r.url for r in back.select("url").collect()) == [
        "http://hx.example/a", "http://hx.example/b"]


def test_kernel_non_ascii_location_roundtrips():
    """Ingest decodes headers with errors="replace", so a re-exported corpus
    can carry non-ASCII Location values — build_response_record must encode
    them (utf-8), not crash on .encode("ascii")."""
    loc = "http://h0.example/café�"
    rec = build_response_record("http://h0.example/old", TS, b"",
                                status=302, location=loc)
    pages = list(warc_pages(rec))
    assert len(pages) == 1
    assert pages[0]["location"] == loc


def test_spark_export_tolerates_null_ts_and_status(spark, tmp_path):
    """warc_to_pages legitimately emits warc_ts NULL (missing/unparseable
    WARC-Date); export must pin sentinels instead of dying on NaT.strftime
    or int(nan)."""
    rows = [("http://h0.example/a", None, HTML, None, None),
            ("http://h0.example/b", TS, HTML, 200, None)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, status int,"
        " location string")
    out = str(tmp_path / "warc_nulls")
    manifest = export_warc(df.repartition(1), out, compress=False)
    assert sum(m.n_records for m in manifest) == 2
    back = {p["url"]: p for p in
            warc_pages(open(manifest[0].shard, "rb").read())}
    assert back["http://h0.example/a"]["status"] == 200
    assert back["http://h0.example/a"]["warc_ts"] == \
        datetime.datetime(1970, 1, 1)
