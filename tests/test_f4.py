"""F4 LinkExtractor allow/deny regex + deny_extensions (SURVEY.md §2.2 F4):
pipeline ≡ oracle on a corpus with media links, both with extension
filtering and with allow/deny patterns active."""

import re

import pytest
from pyspark.sql import functions as F

from oracle.crawler import crawl as oracle_crawl
from sparkcrawl.config import IGNORED_EXTENSIONS, CrawlConfig
from sparkcrawl.crawl import run_crawl
from sparkcrawl.snapstore import SnapStore
from sparkcrawl.synth import generate

CFG = CrawlConfig(
    round_size=60,
    bloom_min_seen=0,           # at-scale bloom dedup path
    deny_patterns=(r"/art\.php",),
    allow_patterns=None,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus_f4"))
    # media_link_rate injects .jpg/.pdf/.zip/.mp4 links → EXT drops
    generate(d, seed=7, n_hosts=4, pages_per_host=18, n_seeds=3,
             media_link_rate=0.5)
    return d


@pytest.fixture(scope="module")
def crawled(spark, corpus, tmp_path_factory):
    store_dir = str(tmp_path_factory.mktemp("store_f4"))
    summaries = run_crawl(spark, corpus, store_dir, CFG)
    return SnapStore(store_dir), summaries


@pytest.fixture(scope="module")
def golden(corpus):
    return oracle_crawl(corpus, CFG)


def test_link_filter_reason_kernel():
    cfg = CrawlConfig()
    assert cfg.link_filter_reason("http://h.example/a/b.jpg") == "EXT"
    assert cfg.link_filter_reason("http://h.example/a/B.PDF") == "EXT"
    assert cfg.link_filter_reason("http://h.example/a/b.html") is None
    # extension lives in the PATH, not the query string
    assert cfg.link_filter_reason("http://h.example/dl?f=x.jpg") is None
    assert cfg.link_filter_reason("http://h.example/x.jpg?f=1") == "EXT"
    cfg2 = CrawlConfig(deny_extensions=())
    assert cfg2.link_filter_reason("http://h.example/a/b.jpg") is None
    cfg3 = CrawlConfig(allow_patterns=(r"/p\d+\.html",))
    assert cfg3.link_filter_reason("http://h.example/p3.html") is None
    assert cfg3.link_filter_reason("http://h.example/other.html") == "REGEX"
    cfg4 = CrawlConfig(deny_patterns=(r"/private/",))
    assert cfg4.link_filter_reason("http://h.example/private/p.html") == "REGEX"
    # pinned order: EXT wins over REGEX when both would fire
    cfg5 = CrawlConfig(deny_patterns=(r".",))
    assert cfg5.link_filter_reason("http://h.example/a.jpg") == "EXT"


def test_ignored_extensions_shape():
    assert len(IGNORED_EXTENSIONS) >= 50
    assert all(re.fullmatch(r"[a-z0-9]{1,5}", e) for e in IGNORED_EXTENSIONS)


def test_f4_crawl_ordering_and_seen_exact(spark, crawled, golden):
    store, _ = crawled
    from sparkcrawl.crawl import schedule_view

    rows = (
        schedule_view(spark, store)
        .orderBy("round", F.desc("priority"), "seq")
        .select("round", "canon")
        .collect()
    )
    got: dict[int, list[str]] = {}
    for r in rows:
        got.setdefault(r["round"], []).append(r["canon"])
    for i, g in enumerate(golden.rounds):
        assert got.get(i, []) == g, f"round {i}"
    seen = {r["canon"] for r in store.read(spark, "seen").select("canon").collect()}
    assert seen == golden.seen


def test_f4_metrics_match_oracle(spark, crawled, golden):
    store, _ = crawled
    rows = (
        store.read(spark, "metrics")
        .groupBy("round", "key")
        .agg(F.sum("n").alias("n"))
        .collect()
    )
    got: dict[int, dict[str, int]] = {}
    for r in rows:
        got.setdefault(r["round"], {})[r["key"]] = r["n"]
    saw_ext = saw_regex = 0
    for m in golden.metrics:
        rnd = m["round"]
        for key in ("ext_dropped", "regex_dropped", "dup_in_batch",
                    "dedup_dropped", "enqueued", "scheduled"):
            assert got.get(rnd, {}).get(key, 0) == m[key], (rnd, key)
        saw_ext += m["ext_dropped"]
        saw_regex += m["regex_dropped"]
    # the corpus knob + deny pattern must actually exercise both filters
    assert saw_ext > 0
    assert saw_regex > 0


def test_f4_media_urls_never_scheduled(spark, crawled):
    store, _ = crawled
    log = store.read(spark, "frontier_log").select("canon").collect()
    bad = [r["canon"] for r in log
           if re.search(r"\.(jpg|pdf|zip|mp4)$", r["canon"])
           or "/art.php" in r["canon"]]
    assert bad == []


def test_native_f4_exprs_match_python_kernel(spark):
    """The Spark-native rlike columns (frontier.f4_filter_cols) and the
    pure-python kernel (CrawlConfig.link_filter_reason) must agree on a
    battery of tricky canonical urls — guards Java-vs-Python regex
    divergence in the pinned common subset."""
    from pyspark.sql import functions as F

    from sparkcrawl.frontier import f4_filter_cols

    cfg = CrawlConfig(
        allow_patterns=(r"/p\d+", r"/docs/"),
        deny_patterns=(r"/private/", r"id=\d{3,}"),
    )
    urls = [
        "http://h.example/p1.html",
        "http://h.example/docs/a.PDF",
        "http://h.example/docs/a.pdf?x=1",
        "http://h.example/p2.jpg",
        "http://h.example/other.html",
        "http://h.example/private/p3.html",
        "http://h.example/p4?id=1234",
        "http://h.example/p5?id=12",
        "http://h.example/",
        "http://h.example",
        "http://h.example/p6.tar.gz",
        "http://h.example/p7.html#frag",
        "http://h.example:8080/p8.webm",
        "http://h.example/a.b/p9",
        "http://h.example/p10.jpeg?y=.html",
        "http://h.example/%7Euser/p11.mp3",
        "http://h.example/p12.HTML",
        "http://h.example/p13.Mp4",
    ]
    want = [cfg.link_filter_reason(u) for u in urls]
    ext_bad, regex_bad = f4_filter_cols(cfg)
    df = spark.createDataFrame([(u,) for u in urls], "canon string").select(
        "canon",
        F.when(ext_bad, "EXT").when(regex_bad, "REGEX").alias("reason"),
    )
    got = {r["canon"]: r["reason"] for r in df.collect()}
    assert [got[u] for u in urls] == want, list(zip(urls, want, [got[u] for u in urls]))
