"""One-shot fetch/parse entry (SURVEY.md §3.3 — scrapy shell/fetch/parse
analogue): a single URL must report exactly what the crawl pipeline/oracle
would record for it — same canon, robots verdict, outcome precedence, and
byte-identical extracted text."""

import json

import pyarrow.parquet as pq
import pytest

from sparkcrawl.canon import canonicalize_url, resolve_redirect
from sparkcrawl.config import CrawlConfig
from sparkcrawl.extract import extract_text
from sparkcrawl.shell import fetch_one, main as shell_main
from sparkcrawl.synth import generate


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("shellcorpus"))
    generate(d, seed=42, n_hosts=5, pages_per_host=20, n_seeds=3)
    return d


@pytest.fixture(scope="module")
def pages(corpus):
    t = pq.read_table(corpus + "/pages.parquet")
    return t.to_pylist()


def _first(pages, pred):
    for r in pages:
        if pred(r):
            return r
    raise AssertionError("corpus lacks a row for this case")


def test_fetched_text_byte_identical(corpus, pages):
    row = _first(
        pages, lambda r: r["status"] == 200 and "/private/" not in r["url"]
    )
    rep = fetch_one(corpus, row["url"])
    assert rep["outcome"] == "FETCHED"
    assert rep["canon"] == canonicalize_url(row["url"])
    assert rep["text"].encode() == extract_text(row["html"]).encode()
    assert rep["links"], "synth pages always carry links"
    assert {lk["verdict"] for lk in rep["links"]} <= {
        "pass", "NOFOLLOW", "URL_GUARD", "EXT", "REGEX", "OFFSITE"
    }


def test_canonical_variant_hits_same_page(corpus, pages):
    row = _first(
        pages,
        lambda r: r["status"] == 200 and "?id=" in r["url"]
        and "/private/" not in r["url"],
    )
    # query-param order is canonicalized away — the variant must FETCH the
    # same corpus page (the dedup-critical D1 property, one-shot view)
    base, q = row["url"].split("?", 1)
    a, b = q.split("&", 1)
    variant = f"{base}?{b}&{a}"
    rep = fetch_one(corpus, variant)
    assert rep["outcome"] == "FETCHED"
    assert rep["canon"] == canonicalize_url(row["url"])
    assert rep["text"].encode() == extract_text(row["html"]).encode()


def test_redirect_outcome_and_target(corpus, pages):
    row = _first(pages, lambda r: 300 <= r["status"] < 400)
    rep = fetch_one(corpus, row["url"])
    assert rep["outcome"] == "REDIRECT"
    assert rep["location"] == row["location"]
    assert rep["redirect_target"] == resolve_redirect(row["url"], row["location"])


def test_retryable_and_terminal_status(corpus, pages):
    row5 = _first(
        pages, lambda r: r["status"] == 500 and "/private/" not in r["url"]
    )
    assert fetch_one(corpus, row5["url"])["outcome"] == "RETRYABLE"
    row4 = _first(
        pages, lambda r: r["status"] == 404 and "/private/" not in r["url"]
    )
    assert fetch_one(corpus, row4["url"])["outcome"] == "HTTP_404"
    # retry disabled → terminal on first sight, like retry_times=0
    rep = fetch_one(corpus, row5["url"], CrawlConfig(retry_enabled=False))
    assert rep["outcome"] == "HTTP_500"


def test_corpus_miss_is_error(corpus):
    assert fetch_one(corpus, "http://h0.example/nope-404.html")["outcome"] == "ERROR"


def test_robots_denied(corpus, pages):
    t = pq.read_table(corpus + "/robots.parquet").to_pylist()
    deny_hosts = {
        r["host"] for r in t
        if r["body"] and "Disallow: /private" in r["body"] and r["status"] == 200
    }
    if not deny_hosts:
        pytest.skip("corpus drew no denying robots host")
    host = sorted(deny_hosts)[0]
    row = _first(
        pages, lambda r: f"//{host}/" in r["url"] and "/private/" in r["url"]
    )
    rep = fetch_one(corpus, row["url"])
    assert rep["outcome"] == "ROBOTS_DENIED"
    assert rep["robots"]["allowed"] is False
    # --no-robots analogue: the same URL fetches
    rep2 = fetch_one(corpus, row["url"], CrawlConfig(obey_robots=False))
    assert rep2["outcome"] in ("FETCHED", "REDIRECT", "RETRYABLE") or (
        rep2["outcome"].startswith("HTTP_")
    )


def test_cli_prints_json(corpus, pages, capsys):
    row = _first(
        pages, lambda r: r["status"] == 200 and "/private/" not in r["url"]
    )
    shell_main([corpus, row["url"], "--no-text"])
    out = json.loads(capsys.readouterr().out)
    assert out["outcome"] == "FETCHED"
    assert "text" not in out
    assert out["url"] == row["url"]
