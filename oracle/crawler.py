"""Single-process reference oracle for the crawl pipeline (SURVEY.md §5.2.3).

The reference checkout is empty (SURVEY.md §0), so this ~250-line pure-Python
crawler IS the executable reference: it implements exactly the pinned
semantics (FIXTURES.md §3–§4) using the same kernel functions
(sparkcrawl.canon/extract/robots) the Spark pipeline runs inside its pandas
UDFs. The Spark pipeline must reproduce, bit-for-bit:

- per-round scheduled canonical-URL sequences (ordered)
- the final URL-seen set (canonical URLs)
- extracted text per fetched canonical URL (byte-identical, UTF-8)
- per-round counters

Round algorithm (THE pin; sparkcrawl/rounds.py mirrors it stage by stage):

  1. candidates = frontier rows with state==QUEUED; stop when none.
  2. robots gating (obey_robots): hosts with candidates but no robots entry
     yet get their robots.txt fetched THIS round; their page fetches defer
     to the next round (reference parks requests until robots resolves —
     scrapy/downloadermiddlewares/robotstxt.py::RobotsTxtMiddleware).
  3. robots eval on the canonical url: denied → terminal ROBOTS_DENIED.
  4. per-host budget: within each host order by (priority DESC, seq ASC),
     keep first max_per_round; rest stay QUEUED.
  5. global order (priority DESC, seq ASC), cap at round_size → scheduled.
  6. fetch = lookup by canonical url in the pages corpus; miss → ERROR.
  7. extract text + links (pinned kernels); per-link, pinned drop order
       NOFOLLOW → DEPTH → URL_GUARD → EXT → REGEX → OFFSITE:
       depth=parent+1 ≤ depth_limit; url length/scheme guards;
       deny_extensions + allow/deny regex on the canonical url (F4,
       CrawlConfig.link_filter_reason); offsite filter vs allowed_domains;
       priority = parent_priority - depth*depth_priority;
       seq = xxh64(str(parent_seq) + '\\x00' + canon) (Spark-parity hash).
  8. batch dedup: per canonical url keep the min-seq row (order-free rule —
     a distributed engine has no "first occurrence"); then drop rows whose
     fingerprint is already in seen; survivors enter frontier QUEUED and
     their fingerprints enter seen immediately (enqueue-time dedup,
     scrapy/core/scheduler.py::Scheduler.enqueue_request semantics).
  Seeds: state QUEUED at round 0, seq = xxh64(canon), dedup-bypass
  (dont_filter) but fingerprints still recorded; duplicate seed canons keep
  min seq.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from sparkcrawl.canon import (
    canonicalize_url,
    fingerprint,
    resolve_redirect,
    seq_for_link,
    seq_for_redirect,
    seq_for_seed,
    seq_for_sitemap,
    url_host,
)
from sparkcrawl.config import CrawlConfig
from sparkcrawl.extract import extract_links, extract_text
from sparkcrawl.robots import robots_allowed


@dataclass
class FrontierRow:
    url: str
    canon: str
    host: str
    depth: int
    priority: int
    seq: int
    state: str  # QUEUED / FETCHED / REDIRECT / ERROR / ROBOTS_DENIED / HTTP_*
    discovered_round: int
    parent_url: str | None = None
    retries: int = 0
    redirects: int = 0
    meta: str | None = None  # Request.meta analogue (JSON payload)


@dataclass
class OracleResult:
    rounds: list[list[str]] = field(default_factory=list)  # scheduled canon urls, ordered
    seen: set[str] = field(default_factory=set)  # canonical urls ever enqueued
    text: dict[str, str] = field(default_factory=dict)  # canon → extracted text
    metrics: list[dict] = field(default_factory=list)
    frontier: dict[str, FrontierRow] = field(default_factory=dict)
    # CloseSpider analogue — pinned semantics + check order in
    # sparkcrawl/config.py; the wall-clock closespider_timeout is engine-only
    # (this oracle is instant), every other reason is mirrored bit-exactly.
    finish_reason: str = "max_rounds"


def load_corpus(corpus_dir: str):
    pages_t = pq.read_table(os.path.join(corpus_dir, "pages.parquet"))
    lats = (
        pages_t["latency_ms"].to_pylist()
        if "latency_ms" in pages_t.column_names
        else [1000] * pages_t.num_rows  # pinned default, matches prepare_pages
    )
    stats = (
        pages_t["status"].to_pylist()
        if "status" in pages_t.column_names
        else [200] * pages_t.num_rows  # pinned default, matches prepare_pages
    )
    locs = (
        pages_t["location"].to_pylist()
        if "location" in pages_t.column_names
        else [None] * pages_t.num_rows  # pinned default, matches prepare_pages
    )
    pages = {}
    for url, html, lat, status, loc in zip(
        pages_t["url"].to_pylist(), pages_t["html"].to_pylist(), lats, stats, locs
    ):
        pages[canonicalize_url(url)] = (url, html, int(lat), int(status), loc)
    seeds_t = pq.read_table(os.path.join(corpus_dir, "seeds.parquet"))
    metas = (
        seeds_t["meta"].to_pylist()
        if "meta" in seeds_t.column_names
        else [None] * seeds_t.num_rows  # pinned default, matches seeds_to_frontier
    )
    seeds = list(zip(seeds_t["url"].to_pylist(), seeds_t["priority"].to_pylist(), metas))
    robots = {}
    rb = os.path.join(corpus_dir, "robots.parquet")
    if os.path.exists(rb):
        rt = pq.read_table(rb)
        for h, s, b in zip(
            rt["host"].to_pylist(), rt["status"].to_pylist(), rt["body"].to_pylist()
        ):
            robots[h] = (s, b)
    budget = {}
    hb = os.path.join(corpus_dir, "host_budget.parquet")
    if os.path.exists(hb):
        bt = pq.read_table(hb)
        for h, m in zip(bt["host"].to_pylist(), bt["max_per_round"].to_pylist()):
            budget[h] = int(m)
    return pages, seeds, robots, budget


def crawl(corpus_dir: str, cfg: CrawlConfig = CrawlConfig()) -> OracleResult:
    pages, seeds, robots_corpus, budget = load_corpus(corpus_dir)
    res = OracleResult()
    fps: set[bytes] = set()

    # --- seed the frontier (round 0 state) ---
    seed_rows: dict[str, FrontierRow] = {}
    for url, prio, meta in seeds:
        canon = canonicalize_url(url)
        seq = seq_for_seed(canon)
        row = FrontierRow(
            url, canon, url_host(canon), 0, int(prio), seq, "QUEUED", 0, meta=meta
        )
        if canon not in seed_rows or seq < seed_rows[canon].seq:
            seed_rows[canon] = row
    for canon, row in seed_rows.items():
        res.frontier[canon] = row
        fps.add(fingerprint(row.url))
        res.seen.add(canon)

    robots_known: dict[str, tuple[int | None, str | None]] = {}
    lat_ewma: dict[str, int] = {}  # host → integer latency EWMA (P4)

    cs_cum = {"pagecount": 0, "itemcount": 0, "errorcount": 0}
    for rnd in range(cfg.max_rounds):
        queued = [r for r in res.frontier.values() if r.state == "QUEUED"]
        if not queued:  # only reachable with an empty seed list (the bottom
            res.finish_reason = "finished"  # -of-loop drain check broke first)
            break
        m = {
            "round": rnd, "queued_start": len(queued), "robots_fetched": 0,
            "robots_deferred": 0, "robots_denied": 0, "budget_deferred": 0,
            "cap_deferred": 0, "scheduled": 0, "fetched": 0, "fetch_miss": 0,
            "http_error": 0, "retried": 0, "redirected": 0,
            "links_extracted": 0, "sitemap_urls": 0,
            "depth_dropped": 0, "offsite_dropped": 0,
            "nofollow_dropped": 0, "url_guard_dropped": 0, "ext_dropped": 0,
            "regex_dropped": 0,
            "dup_in_batch": 0, "dedup_dropped": 0,
            "enqueued": 0,
        }

        # stage 2: robots fetch for new hosts; defer their candidates.
        # Freshly fetched bodies also surface their `Sitemap:` directives as
        # candidates THIS round (SitemapSpider robots.txt handling, pinned in
        # CrawlConfig) — they join the round's new_links for the shared
        # batch-dedup + seen anti-join at stage 8.
        new_links: list[FrontierRow] = []
        if cfg.obey_robots:
            known_before = set(robots_known)
            cand_hosts = {r.host for r in queued}
            new_hosts = sorted(cand_hosts - known_before)
            for h in new_hosts:
                robots_known[h] = robots_corpus.get(h, (None, None))
                body = robots_known[h][1]
                if not cfg.sitemap_enabled or not body:
                    continue
                for target in re.findall(CrawlConfig.SITEMAP_LINE_RE, body):
                    m["sitemap_urls"] += 1
                    # request replacement, not link discovery: only
                    # URL_GUARD → OFFSITE apply (pinned order)
                    if len(target) > cfg.url_length_limit or not target.startswith(
                        ("http://", "https://")
                    ):
                        m["url_guard_dropped"] += 1
                        continue
                    canon = canonicalize_url(target)
                    host = url_host(canon)
                    if not cfg.host_allowed(host):
                        m["offsite_dropped"] += 1
                        continue
                    new_links.append(
                        FrontierRow(
                            target, canon, host, 0, cfg.sitemap_priority,
                            seq_for_sitemap(h, canon), "QUEUED", rnd,
                            f"http://{h}/robots.txt",
                        )
                    )
            m["robots_fetched"] = len(new_hosts)
            eligible = [r for r in queued if r.host in known_before]
            m["robots_deferred"] = len(queued) - len(eligible)
        else:
            eligible = queued

        # stage 3: robots eval
        allowed: list[FrontierRow] = []
        for r in eligible:
            st, body = robots_known.get(r.host, (None, None)) if cfg.obey_robots else (None, None)
            if cfg.obey_robots and not robots_allowed(st, body, r.canon):
                r.state = "ROBOTS_DENIED"
                m["robots_denied"] += 1
            else:
                allowed.append(r)

        # stage 4: per-host budget
        by_host: dict[str, list[FrontierRow]] = {}
        for r in allowed:
            by_host.setdefault(r.host, []).append(r)
        budgeted: list[FrontierRow] = []
        for h, rows in by_host.items():
            rows.sort(key=lambda r: (-r.priority, r.seq))
            cap = budget.get(h, cfg.max_per_round_default)
            if cfg.adaptive_budget and h in lat_ewma:
                # P4 AutoThrottle analogue (pinned integer formula)
                cap = cfg.adaptive_cap(lat_ewma[h], cap)
            budgeted.extend(rows[:cap])
            m["budget_deferred"] += max(0, len(rows) - cap)

        # stage 5: global order + cap
        budgeted.sort(key=lambda r: (-r.priority, r.seq))
        scheduled = budgeted[: cfg.round_size]
        m["cap_deferred"] = len(budgeted) - len(scheduled)
        m["scheduled"] = len(scheduled)
        res.rounds.append([r.canon for r in scheduled])

        # stages 6-7: fetch + extract
        lat_obs: dict[str, list[int]] = {}  # host → [sum_ms, n]
        for r in scheduled:
            hit = pages.get(r.canon)
            if hit is None:
                r.state = "ERROR"
                m["fetch_miss"] += 1
                continue
            page_url, html, lat_ms, status, location = hit
            # latency is observed for every corpus hit, 2xx or not (the
            # server responded either way — pinned, rounds.py mirrors)
            acc = lat_obs.setdefault(r.host, [0, 0])
            acc[0] += lat_ms
            acc[1] += 1
            # pinned outcome precedence (CrawlConfig, rounds.py mirrors):
            # 200 → followable 3xx → retryable → terminal HTTP_<code>
            if (
                cfg.redirect_enabled
                and 300 <= status < 400
                and location is not None
                and r.redirects < cfg.redirect_max_times
            ):
                # RedirectMiddleware: source row terminal REDIRECT; target
                # becomes a candidate (depth unchanged, priority adjusted,
                # redirects+1, retries carried) gated by URL_GUARD → OFFSITE
                # only, then batch + seen dedup like any candidate
                r.state = "REDIRECT"
                m["redirected"] += 1
                target = resolve_redirect(page_url, location)
                if len(target) > cfg.url_length_limit or not target.startswith(
                    ("http://", "https://")
                ):
                    m["url_guard_dropped"] += 1
                    continue
                canon = canonicalize_url(target)
                host = url_host(canon)
                if not cfg.host_allowed(host):
                    m["offsite_dropped"] += 1
                    continue
                new_links.append(
                    FrontierRow(
                        target, canon, host, r.depth,
                        r.priority + cfg.redirect_priority_adjust,
                        seq_for_redirect(r.seq, canon), "QUEUED", rnd, r.url,
                        retries=r.retries, redirects=r.redirects + 1,
                        meta=r.meta,  # request.replace preserves meta
                    )
                )
                continue
            if (
                cfg.retry_enabled
                and status in cfg.retry_http_codes
                and r.retries < cfg.retry_times
            ):
                # RetryMiddleware: back to QUEUED with retries+1 and adjusted
                # priority; fingerprint already in seen (no re-dedup)
                r.retries += 1
                r.priority += cfg.retry_priority_adjust
                r.state = "QUEUED"
                m["retried"] += 1
                continue
            if status != 200:
                # F5 HTTP-status filter (HttpErrorMiddleware semantics):
                # non-retryable non-2xx, exhausted retries, and
                # redirect-cap-exhausted 3xx are terminal
                r.state = f"HTTP_{status}"
                m["http_error"] += 1
                continue
            r.state = "FETCHED"
            m["fetched"] += 1
            res.text[r.canon] = extract_text(html)
            links = extract_links(html, page_url)
            m["links_extracted"] += len(links)
            for lk in links:
                if cfg.respect_nofollow and lk.nofollow:
                    m["nofollow_dropped"] += 1
                    continue
                depth = r.depth + 1
                if depth > cfg.depth_limit:
                    m["depth_dropped"] += 1
                    continue
                if len(lk.url) > cfg.url_length_limit or not lk.url.startswith(
                    ("http://", "https://")
                ):
                    m["url_guard_dropped"] += 1
                    continue
                canon = canonicalize_url(lk.url)
                # F4 allow/deny regex + deny_extensions (pinned order:
                # … URL_GUARD → EXT → REGEX → OFFSITE)
                f4 = cfg.link_filter_reason(canon)
                if f4 is not None:
                    m[f"{f4.lower()}_dropped"] += 1
                    continue
                host = url_host(canon)
                if not cfg.host_allowed(host):
                    m["offsite_dropped"] += 1
                    continue
                new_links.append(
                    FrontierRow(
                        lk.url, canon, host, depth,
                        r.priority - depth * cfg.depth_priority,
                        seq_for_link(r.seq, canon), "QUEUED", rnd, r.url,
                    )
                )

        # stage 8: batch dedup (min-seq per canon) then seen anti-join
        best: dict[str, FrontierRow] = {}
        for row in new_links:
            cur = best.get(row.canon)
            if cur is None or row.seq < cur.seq:
                best[row.canon] = row
        m["dup_in_batch"] = len(new_links) - len(best)
        for canon, row in best.items():
            if fingerprint(row.url) in fps:
                m["dedup_dropped"] += 1
                continue
            fps.add(fingerprint(row.url))
            res.seen.add(canon)
            res.frontier[canon] = row
            m["enqueued"] += 1

        # P4: fold this round's per-host observations into the EWMA (affects
        # the NEXT round's caps, like the pipeline's host_lat table)
        for h, (s, n) in lat_obs.items():
            obs = s // n
            lat_ewma[h] = obs if h not in lat_ewma else (obs + lat_ewma[h]) // 2

        res.metrics.append(m)

        # CloseSpider stop conditions (pinned cumulative counters + check
        # order in sparkcrawl/config.py; 'finished' wins when the frontier
        # drains in the same round a threshold trips — same as run_crawl)
        cs_cum["pagecount"] += (
            m["fetched"] + m["http_error"] + m["redirected"] + m["retried"]
        )
        cs_cum["itemcount"] += m["fetched"]
        cs_cum["errorcount"] += m["http_error"] + m["fetch_miss"]
        if not any(r.state == "QUEUED" for r in res.frontier.values()):
            res.finish_reason = "finished"
            break
        stop = next(
            (
                f"closespider_{k}"
                for k in ("pagecount", "itemcount", "errorcount")
                if getattr(cfg, f"closespider_{k}")
                and cs_cum[k] >= getattr(cfg, f"closespider_{k}")
            ),
            None,
        )
        if stop is not None:
            res.finish_reason = stop
            break

    return res
