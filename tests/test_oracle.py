"""Oracle crawler sanity: determinism, corpus self-consistency, and the
structural behaviors the golden files rely on (robots deferral, dedup,
budget, depth decay)."""

import pytest

from oracle.crawler import crawl
from sparkcrawl.canon import canonicalize_url
from sparkcrawl.config import CrawlConfig
from sparkcrawl.extract import extract_text
from sparkcrawl.synth import generate


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_corpus"))
    generate(d, seed=42, n_hosts=5, pages_per_host=20, n_seeds=3)
    return d


def test_corpus_text_column_matches_pinned_extractor(tiny):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{tiny}/pages.parquet")
    for html, text in zip(t["html"].to_pylist()[:50], t["text"].to_pylist()[:50]):
        assert extract_text(html) == text


def test_corpus_canon_injective(tiny):
    import pyarrow.parquet as pq

    urls = pq.read_table(f"{tiny}/pages.parquet")["url"].to_pylist()
    canons = [canonicalize_url(u) for u in urls]
    assert len(set(canons)) == len(canons)


def test_oracle_deterministic(tiny):
    a = crawl(tiny, CrawlConfig(round_size=50))
    b = crawl(tiny, CrawlConfig(round_size=50))
    assert a.rounds == b.rounds and a.seen == b.seen and a.text == b.text
    assert a.metrics == b.metrics


def test_round0_is_robots_only(tiny):
    res = crawl(tiny, CrawlConfig(round_size=50))
    assert res.rounds[0] == []  # all hosts new → robots fetch, pages deferred
    assert res.metrics[0]["robots_fetched"] > 0
    assert res.metrics[0]["scheduled"] == 0


def test_obey_robots_off_schedules_round0(tiny):
    res = crawl(tiny, CrawlConfig(round_size=50, obey_robots=False))
    assert len(res.rounds[0]) == 3  # the three seeds


def test_budget_respected(tiny):
    res = crawl(tiny, CrawlConfig(round_size=1000))
    for rnd in res.rounds:
        per_host = {}
        for canon in rnd:
            h = canon.split("/")[2]
            per_host[h] = per_host.get(h, 0) + 1
        assert all(v <= 8 for v in per_host.values()), per_host


def test_round_size_cap(tiny):
    res = crawl(tiny, CrawlConfig(round_size=5))
    assert all(len(r) <= 5 for r in res.rounds)


def test_no_url_scheduled_twice_except_retries(tiny):
    # RetryMiddleware re-queues retryable failures, so a url may be
    # scheduled once per attempt; every EXTRA appearance must be accounted
    # for by the `retried` counter, and nothing exceeds 1 + retry_times.
    cfg = CrawlConfig(round_size=50)
    res = crawl(tiny, cfg)
    flat = [u for r in res.rounds for u in r]
    n_retried = sum(m["retried"] for m in res.metrics)
    assert len(flat) == len(set(flat)) + n_retried
    from collections import Counter

    assert max(Counter(flat).values()) <= 1 + cfg.retry_times


def test_no_url_scheduled_twice_with_retries_off(tiny):
    res = crawl(tiny, CrawlConfig(round_size=50, retry_enabled=False))
    flat = [u for r in res.rounds for u in r]
    assert len(flat) == len(set(flat))


def test_dedup_and_errors_exercised(tiny):
    res = crawl(tiny, CrawlConfig(round_size=50))
    agg = {k: sum(m[k] for m in res.metrics) for k in res.metrics[0] if k != "round"}
    assert agg["dedup_dropped"] > 0
    assert agg["fetch_miss"] > 0  # dead links
    assert agg["robots_denied"] > 0
    assert agg["dup_in_batch"] > 0  # canonical-duplicate edge variants


def test_allowed_domains_offsite(tiny):
    res = crawl(tiny, CrawlConfig(round_size=50, allowed_domains=("h0.example",)))
    seeds = {"http://h0.example/p0.html", "http://h1.example/p0.html", "http://h2.example/p0.html"}
    for rnd in res.rounds:
        # seeds are dont_filter (offsite-exempt, reference semantics); all
        # discovered links must be on the allowed domain
        assert all("h0.example" in u for u in rnd if u not in seeds)
    agg_offsite = sum(m["offsite_dropped"] for m in res.metrics)
    assert agg_offsite > 0
