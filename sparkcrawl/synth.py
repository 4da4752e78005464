"""Deterministic synthetic web corpus generator (FIXTURES.md §1).

Pure function of ``(seed, n_hosts, pages_per_host)`` — no clock, no network,
no external data. Produces the four input tables of the crawl pipeline as
parquet (written with pyarrow so the oracle can run Spark-free):

- ``pages``       (url, warc_ts, html:binary, text, lang) — exact
                  BASELINE.json:15 shape; ``text`` is the pinned extractor's
                  expected output for ``html`` (self-check column)
- ``seeds``       (url, priority)
- ``robots``      (host, fetched_ts, status, body)
- ``host_budget`` (host, max_per_round, crawl_delay)

Graph shape per FIXTURES.md §1.5: intra-host chains (drives depth), ~10%
cross-host edges with ~30% of them aimed at one hot host (skew), ~5%
duplicate edges varying only in query-param order or fragment
(canonicalization dedup), ~1% rel=nofollow, ~1% dead links (fetch-miss),
plus a /private/ subtree that robots rules deny on ~20% of hosts.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from xml.sax.saxutils import escape as _xml_escape

from sparkcrawl.canon import xxh64_str
from sparkcrawl.extract import extract_text

EPOCH = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)

# Bump whenever generate()'s output for the SAME parameters can change
# (new columns, different statuses/links/latencies, …). Corpus caches —
# bench.py and the scaling harness — key their directories on this, so a
# semantics change can never silently re-use (or be measured against) a
# stale corpus under the same name (VERDICT r3 #2: the r3 bench regenerated
# a same-named cache with ~12% non-2xx rows, making round-over-round
# throughput uninterpretable).
# History: v3 = all-200 corpus (rounds 1–2); v4 = status/location/retry
# semantics added in f79a68f (round 3); v5 = identical CONTENT to v4 but
# pages.parquet written with bounded row groups (round 4 — the single
# whole-table row group serialized raw-corpus scans into one task).
FORMAT_VERSION = "v5"

_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu data spark crawl frontier queue robot parse fetch"
).split()
_WORDS_L1 = "café touché naïve résumé crème déjà".split()
_LANGS = ["en", "de", "fr"]


def host_name(i: int) -> str:
    return f"h{i}.example"


def _page_path(j: int) -> str:
    if j % 9 == 7:
        return f"/private/p{j}.html"
    if j % 5 == 3:
        return f"/art.php?id={j}&ref=home"
    return f"/p{j}.html"


def page_url(i: int, j: int) -> str:
    return f"http://{host_name(i)}{_page_path(j)}"


def _swapped_variant(url: str) -> str:
    """Duplicate-edge variant: swap query params, or append a fragment."""
    if "?" in url and "&" in url:
        base, q = url.split("?", 1)
        parts = q.split("&")
        return base + "?" + "&".join(reversed(parts))
    return url + "#sec"


def _gen_host(args) -> tuple[list, list, list, list, list]:
    """Generate one host's pages — pure function of the args tuple, so the
    corpus is identical whether generated serially or via a process pool."""
    (seed, i, n_hosts, pages_per_host, n_links_lo, n_links_hi, n_paras_lo,
     n_paras_hi, media_rate) = args
    hot = 0  # host 0 is the hot host (skew target)
    urls, tss, htmls, texts, langs, lats, statuses, locations = (
        [], [], [], [], [], [], [], []
    )
    for j in range(pages_per_host):
        rng = random.Random(seed * 1_000_003 + i * 7919 + j)
        url = page_url(i, j)
        # --- outgoing links (document order matters) ---
        links: list[tuple[str, bool]] = []  # (href, nofollow)
        if j + 1 < pages_per_host:
            links.append((_page_path(j + 1), False))  # relative chain link
        for _ in range(rng.randint(n_links_lo, n_links_hi)):  # random intra-host
            links.append((_page_path(rng.randrange(pages_per_host)), False))
        if rng.random() < 0.10:  # cross-host (absolute)
            ti = hot if rng.random() < 0.30 else rng.randrange(n_hosts)
            links.append((page_url(ti, rng.randrange(pages_per_host)), False))
        if rng.random() < 0.05 and links:  # canonical-duplicate variant
            href, _nf = rng.choice(links)
            absu = href if href.startswith("http") else f"http://{host_name(i)}{href}"
            links.append((_swapped_variant(absu), False))
        if rng.random() < 0.01:
            links.append((_page_path(rng.randrange(pages_per_host)), True))
        if rng.random() < 0.01:
            links.append((f"/dead{j}-{rng.randrange(10)}.html", False))
        # media links (exercise F4 deny_extensions); short-circuit keeps the
        # rng stream — and thus existing corpora — identical at rate 0
        if media_rate > 0 and rng.random() < media_rate:
            ext = (".jpg", ".pdf", ".zip", ".mp4")[rng.randrange(4)]
            links.append((f"/media/m{rng.randrange(pages_per_host)}{ext}", False))

        latin1 = (i + j) % 17 == 0
        words = _WORDS + (_WORDS_L1 if latin1 else [])
        paras = "".join(
            "<p>" + " ".join(rng.choice(words) for _ in range(rng.randint(5, 15))) + "</p>"
            for _ in range(rng.randint(n_paras_lo, n_paras_hi))
        )
        nf_attr = ' rel="nofollow"'
        anchors = "".join(
            '<a href="{}"{}>'.format(href, nf_attr if nf else "")
            + " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
            + "</a> "
            for href, nf in links
        )
        charset = "latin-1" if latin1 else "utf-8"
        doc = (
            f'<html><head><title>page {i}-{j}</title><meta charset="{charset}">'
            f"<style>.x{{color:red}}</style></head><body>{paras}"
            f"<script>var v={j};</script>{anchors}</body></html>"
        )
        html = doc.encode("latin-1" if latin1 else "utf-8", errors="replace")
        urls.append(url)
        tss.append(EPOCH + dt.timedelta(seconds=xxh64_str(url) % 86400))
        htmls.append(html)
        texts.append(extract_text(html))
        langs.append(_LANGS[xxh64_str(url) % 3])
        # deterministic fetch latency (P4 adaptive budget input): per-host
        # base 50..950 ms + per-page jitter 0..199 ms
        lats.append(
            50 + (xxh64_str(host_name(i)) % 10) * 100 + xxh64_str(url) % 200
        )
        # deterministic HTTP status (F5 + redirect/retry): ~3% 404, ~9% 500
        # (wide enough that small test corpora exercise the retry path),
        # ~3% 301, ~3% 302, else 200 — derived from a salted url hash, so no
        # rng-stream change (existing page bytes stay identical)
        sb = xxh64_str(url + "#status") % 33
        status = (
            404 if sb == 7 else 500 if sb in (8, 11, 12)
            else 301 if sb == 9 else 302 if sb == 10 else 200
        )
        statuses.append(status)
        if 300 <= status < 400:
            # deterministic redirect target: usually same-host (sometimes as
            # a RELATIVE Location, exercising urljoin), ~20% cross-host;
            # targets can themselves be 3xx, producing organic chains
            rb = xxh64_str(url + "#redir")
            tj = (j * 7 + 3) % pages_per_host
            ti = (i + 1) % n_hosts if rb % 5 == 0 else i
            if ti == i and rb % 7 == 0:
                locations.append(_page_path(tj))  # relative Location
            else:
                locations.append(page_url(ti, tj))
        else:
            locations.append(None)
    return urls, tss, htmls, texts, langs, lats, statuses, locations


def generate(
    out_dir: str,
    seed: int = 42,
    n_hosts: int = 5,
    pages_per_host: int = 20,
    n_seeds: int = 3,
    max_per_round: int = 8,
    n_links: tuple[int, int] = (2, 4),
    n_paras: tuple[int, int] = (2, 5),
    media_link_rate: float = 0.0,
    sitemap_rate: float = 0.0,
    procs: int | None = None,
) -> dict:
    """Write the corpus tables under ``out_dir``; returns summary counts.

    ``n_links``/``n_paras`` control page richness (bench corpora use larger
    values to approximate real web pages); ``procs`` parallelizes generation
    across hosts with identical output to a serial run."""
    os.makedirs(out_dir, exist_ok=True)
    tasks = [
        (seed, i, n_hosts, pages_per_host, n_links[0], n_links[1],
         n_paras[0], n_paras[1], media_link_rate)
        for i in range(n_hosts)
    ]
    if procs and procs > 1 and n_hosts > 1:
        import multiprocessing as mp

        with mp.Pool(procs) as pool:
            parts = pool.map(_gen_host, tasks, chunksize=max(1, n_hosts // (procs * 4)))
    else:
        parts = [_gen_host(t) for t in tasks]
    urls, tss, htmls, texts, langs, lats, statuses, locations = (
        [], [], [], [], [], [], [], []
    )
    for u, t, h, x, l, la, st, lo in parts:
        urls.extend(u); tss.extend(t); htmls.extend(h); texts.extend(x)
        langs.extend(l); lats.extend(la); statuses.extend(st)
        locations.extend(lo)

    # --- sitemaps (SitemapSpider coverage): salted-hash host choice, never
    # the rng streams, so page bytes are identical at any rate and existing
    # corpora are unchanged at rate 0. Only robots-having hosts participate
    # (a sitemap is discovered via the robots `Sitemap:` directive). Hosts
    # with ≥30 pages get a <sitemapindex> + two child <urlset>s (exercising
    # the recursive fetch-next-round path); smaller hosts one <urlset>.
    # Sitemap pages fetch as plain 200s (non-2xx handling is exercised by
    # regular pages, which share the identical outcome path).
    def _has_sitemap(i: int) -> bool:
        if sitemap_rate <= 0:
            return False
        if random.Random(seed * 31 + i).random() < 0.05:
            return False  # host has no robots row (mirror of the robots loop)
        return (
            xxh64_str(f"{host_name(i)}#sitemap{seed}") % 1000
            < int(round(sitemap_rate * 1000))
        )

    _XML_HEAD = '<?xml version="1.0" encoding="UTF-8"?>\n'
    _SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"
    n_sitemap_hosts = 0
    for i in range(n_hosts):
        if not _has_sitemap(i):
            continue
        n_sitemap_hosts += 1
        base = f"http://{host_name(i)}"
        locs = [j for j in range(pages_per_host) if j % 3 == 0]

        def _urlset(js):
            body = "".join(
                f"  <url><loc>{_xml_escape(page_url(i, j))}</loc></url>\n"
                for j in js
            )
            return f'{_XML_HEAD}<urlset xmlns="{_SM_NS}">\n{body}</urlset>\n'

        sm_pages: list[tuple[str, str]] = []
        if pages_per_host >= 30:
            kids = [f"{base}/sitemap-{k}.xml" for k in (0, 1)]
            idx = "".join(f"  <sitemap><loc>{u}</loc></sitemap>\n" for u in kids)
            sm_pages.append(
                (f"{base}/sitemap.xml",
                 f'{_XML_HEAD}<sitemapindex xmlns="{_SM_NS}">\n{idx}</sitemapindex>\n')
            )
            for k in (0, 1):
                sm_pages.append(
                    (kids[k], _urlset([j for j in locs if (j // 3) % 2 == k]))
                )
        else:
            sm_pages.append((f"{base}/sitemap.xml", _urlset(locs)))
        for url, xml in sm_pages:
            html = xml.encode("utf-8")
            urls.append(url)
            tss.append(EPOCH + dt.timedelta(seconds=xxh64_str(url) % 86400))
            htmls.append(html)
            texts.append(extract_text(html))
            langs.append(_LANGS[xxh64_str(url) % 3])
            lats.append(
                50 + (xxh64_str(host_name(i)) % 10) * 100 + xxh64_str(url) % 200
            )
            statuses.append(200)
            locations.append(None)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "latency_ms": pa.array(lats, pa.int64()),
            "status": pa.array(statuses, pa.int32()),
            "location": pa.array(locations, pa.string()),
        }
    )
    # Bounded row groups: pyarrow's default writes ONE row group for the
    # whole table — measured 22.9 GB on the 800k-page scaling corpus, which
    # serializes every Spark scan of the raw corpus into a single task (a
    # split can't cross a row-group boundary; 1×176 s task in prepare_pages'
    # 873-task scan). ~2000 rows ≈ 50 MB of html keeps splits real at any
    # corpus size while staying far above the per-group metadata floor.
    pq.write_table(pages, os.path.join(out_dir, "pages.parquet"),
                   row_group_size=2000)

    # Request.meta analogue: JSON payload on alternating seeds (None on the
    # rest so the null path is exercised too); carried to redirect/retry
    # descendants by the pipeline AND the oracle, never to discovered links
    ns = min(n_seeds, n_hosts)
    seeds = pa.table(
        {
            "url": pa.array([page_url(i, 0) for i in range(ns)]),
            "priority": pa.array([0] * ns, pa.int32()),
            "meta": pa.array(
                [
                    f'{{"campaign":"c{i % 3}","tier":"seed"}}' if i % 2 == 0 else None
                    for i in range(ns)
                ],
                pa.string(),
            ),
        }
    )
    pq.write_table(seeds, os.path.join(out_dir, "seeds.parquet"))

    r_hosts, r_status, r_body = [], [], []
    for i in range(n_hosts):
        rng = random.Random(seed * 31 + i)
        x = rng.random()
        if x < 0.05:
            continue  # absent robots.txt (allow-all via status=None path)
        r_hosts.append(host_name(i))
        if x < 0.10:
            r_status.append(200)
            body = "User-agent: *\nDisallow: /\n"  # deny-all host
        elif x < 0.30:
            r_status.append(200)
            body = "User-agent: *\nDisallow: /private/\n"
        else:
            r_status.append(200)
            body = ""
        if _has_sitemap(i):
            # deny-all hosts advertise too: their sitemap candidate is then
            # ROBOTS_DENIED at schedule time (path exercised, \n-only bodies
            # — the SITEMAP_LINE_RE multiline pin)
            body += f"Sitemap: http://{host_name(i)}/sitemap.xml\n"
        r_body.append(body)
    robots = pa.table(
        {
            "host": pa.array(r_hosts, pa.string()),
            "fetched_ts": pa.array([EPOCH] * len(r_hosts), pa.timestamp("us", tz="UTC")),
            "status": pa.array(r_status, pa.int32()),
            "body": pa.array(r_body, pa.string()),
        }
    )
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))

    budget = pa.table(
        {
            "host": pa.array([host_name(i) for i in range(n_hosts)], pa.string()),
            "max_per_round": pa.array([max_per_round] * n_hosts, pa.int32()),
            "crawl_delay": pa.array([0.0] * n_hosts, pa.float64()),
        }
    )
    pq.write_table(budget, os.path.join(out_dir, "host_budget.parquet"))

    return {
        "pages": len(urls),
        "hosts": n_hosts,
        "seeds": min(n_seeds, n_hosts),
        "robots_rows": len(r_hosts),
        "sitemap_hosts": n_sitemap_hosts,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--hosts", type=int, default=5)
    ap.add_argument("--pages-per-host", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()
    print(generate(args.out_dir, args.seed, args.hosts, args.pages_per_host, args.seeds))
