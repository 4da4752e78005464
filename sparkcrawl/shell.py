"""One-shot fetch / parse entry points (SURVEY.md §3.3).

The reference's debugging one-shots `[scrapy: scrapy/commands/{shell,fetch,
parse}.py]` construct a single Request, run it through the same downloader
chain, and show the Response. The rebuild's analogue runs a single URL
through the SAME pinned kernels the distributed pipeline and the oracle
share — canonicalization (canon.py), robots gating (robots.py), corpus
lookup semantics (min-(url, warc_ts) per canon, exactly prepare_pages'
winner rule), outcome precedence (200 → followable-3xx → retryable →
terminal), and extraction (extract.py) — so what it prints for one URL is
bit-identical to what the crawl would record for it.

Deliberately Spark-free: an operator debugging one URL should not wait for
a JVM. The corpus parquet is streamed in record batches with only the slim
columns + the one matched html payload, so it works against the same
pages.parquet at any size without loading it.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq

from sparkcrawl.canon import canonicalize_url, fingerprint, url_host
from sparkcrawl.config import CrawlConfig
from sparkcrawl.extract import extract_page
from sparkcrawl.robots import robots_allowed


def _lookup(corpus_dir: str, canon: str):
    """Corpus hit for a canonical URL under prepare_pages' winner rule:
    among rows sharing the canon, min (url, warc_ts) wins (html-hash
    tie-break never fires on distinct-url corpora). Streamed scan: slim
    columns batch-by-batch; html is materialized only for matched rows."""
    pf = pq.ParquetFile(os.path.join(corpus_dir, "pages.parquet"))
    names = pf.schema_arrow.names
    slim = [c for c in ("url", "warc_ts", "status", "location", "latency_ms")
            if c in names]
    best = None  # (url, warc_ts, row_group, offset)
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg, columns=slim)
        urls = t["url"].to_pylist()
        tss = t["warc_ts"].to_pylist()
        for i, u in enumerate(urls):
            if canonicalize_url(u) != canon:
                continue
            key = (u, tss[i])
            if best is None or key < best[:2]:
                best = (u, tss[i], rg, i)
    if best is None:
        return None
    url, _, rg, i = best
    # read only the payload columns of the winning row group — a full
    # read_row_group would decode every row's html blob to return one page
    need = [c for c in ("html", "status", "location", "latency_ms")
            if c in names]
    row = pf.read_row_group(rg, columns=need).slice(i, 1).to_pylist()[0]
    return {
        "url": url,
        "html": row["html"],
        "status": int(row.get("status", 200) or 200),
        "location": row.get("location"),
        "latency_ms": int(row.get("latency_ms", 1000) or 1000),
    }


def _robots_verdict(corpus_dir: str, canon: str, cfg: CrawlConfig):
    """(allowed, status, sitemaps) for the URL's host, from robots.parquet —
    same robots_allowed kernel the pipeline's pandas UDF memoizes."""
    import re

    host = url_host(canon)
    path = os.path.join(corpus_dir, "robots.parquet")
    status = body = None
    if os.path.exists(path):
        t = pq.read_table(path)
        for h, s, b in zip(t["host"].to_pylist(), t["status"].to_pylist(),
                           t["body"].to_pylist()):
            if h == host:
                status, body = s, b
                break
    sitemaps = (
        re.findall(CrawlConfig.SITEMAP_LINE_RE, body) if body else []
    )
    return robots_allowed(status, body, canon), status, sitemaps


def fetch_one(corpus_dir: str, url: str,
              cfg: CrawlConfig = CrawlConfig()) -> dict:
    """`scrapy fetch` analogue: one URL through lookup + robots + outcome
    precedence + extraction. Returns a JSON-able report; `links` carries the
    per-link F1–F4 filter verdict the crawl would apply at depth+1 (the
    `parse` view)."""
    canon = canonicalize_url(url)
    report: dict = {
        "url": url,
        "canon": canon,
        "host": url_host(canon),
        "fingerprint": fingerprint(url).hex(),
    }
    if cfg.obey_robots:
        allowed, rstatus, sitemaps = _robots_verdict(corpus_dir, canon, cfg)
        report["robots"] = {
            "allowed": allowed, "status": rstatus, "sitemaps": sitemaps
        }
        if not allowed:
            report["outcome"] = "ROBOTS_DENIED"
            return report
    hit = _lookup(corpus_dir, canon)
    if hit is None:
        report["outcome"] = "ERROR"  # corpus miss (dead link)
        return report
    status = hit["status"]
    report["status"] = status
    report["latency_ms"] = hit["latency_ms"]
    # pinned outcome precedence (CrawlConfig; rounds.py and the oracle
    # mirror): 200 → followable 3xx → retryable → terminal HTTP_<code>
    if cfg.redirect_enabled and 300 <= status < 400 and hit["location"]:
        from sparkcrawl.canon import resolve_redirect

        report["outcome"] = "REDIRECT"
        report["location"] = hit["location"]
        report["redirect_target"] = resolve_redirect(hit["url"], hit["location"])
        return report
    if cfg.retry_enabled and status in cfg.retry_http_codes:
        report["outcome"] = "RETRYABLE"
        return report
    if status != 200:
        report["outcome"] = f"HTTP_{status}"
        return report
    report["outcome"] = "FETCHED"
    text, links = extract_page(hit["html"], hit["url"])
    report["text"] = text
    out_links = []
    for lk in links:
        verdict = "pass"
        lcanon = canonicalize_url(lk.url)
        # pinned F-chain order (oracle/crawler.py): NOFOLLOW → URL_GUARD →
        # EXT → REGEX → OFFSITE (depth is caller state, not shown here)
        if cfg.respect_nofollow and lk.nofollow:
            verdict = "NOFOLLOW"
        elif len(lk.url) > cfg.url_length_limit or not lk.url.startswith(
            ("http://", "https://")
        ):
            verdict = "URL_GUARD"
        else:
            f4 = cfg.link_filter_reason(lcanon)
            if f4 is not None:
                verdict = f4
            elif not cfg.host_allowed(url_host(lcanon)):
                verdict = "OFFSITE"
        out_links.append({"url": lk.url, "canon": lcanon, "verdict": verdict})
    report["links"] = out_links
    return report


def main(argv: list[str] | None = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        prog="sparkcrawl-fetch",
        description="one-shot fetch+parse of a single URL against a corpus "
                    "(scrapy shell/fetch/parse analogue)",
    )
    ap.add_argument("corpus_dir")
    ap.add_argument("url")
    ap.add_argument("--no-robots", action="store_true")
    ap.add_argument("--no-text", action="store_true",
                    help="omit the extracted text from the report")
    args = ap.parse_args(argv)
    cfg = CrawlConfig(obey_robots=not args.no_robots)
    report = fetch_one(args.corpus_dir, args.url, cfg)
    if args.no_text:
        report.pop("text", None)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
