"""Crawl configuration shared by the Spark pipeline and the oracle.

Field meanings mirror upstream Scrapy settings (public
``scrapy/settings/default_settings.py`` names noted) but values are pinned
for determinism — FIXTURES.md §3/§4.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    round_size: int = 1000          # global per-round cap (CONCURRENT_REQUESTS analogue)
    depth_limit: int = 6            # DEPTH_LIMIT
    depth_priority: int = 1         # DEPTH_PRIORITY: priority = parent - depth*this
    max_per_round_default: int = 8  # CONCURRENT_REQUESTS_PER_DOMAIN analogue
    max_rounds: int = 50
    obey_robots: bool = True        # ROBOTSTXT_OBEY
    respect_nofollow: bool = True
    url_length_limit: int = 2083    # URLLENGTH_LIMIT
    allowed_domains: tuple[str, ...] | None = None  # None → allow all (offsite off)
    seed: int = 42
    # --- D2 bloom prefilter sidecar (SURVEY.md §2.3) ---
    # Probabilistic per-bucket URL-seen filters prune the exact dedup join's
    # probe volume; semantics never depend on them (no false negatives by
    # construction; false positives resolved by the exact join). Sized here
    # for sandbox corpora — at the 10^10-URL design point raise bits/bucket
    # (and N_BUCKETS) so each blob holds ~n_keys/bucket at ~1% FPP.
    dedup_bloom: bool = True
    bloom_bits_per_bucket: int = 1 << 17   # 16 KiB/bucket, 32 buckets
    bloom_k: int = 7
    # Strategy threshold: while the seen set is below this many keys the
    # exact dedup join runs directly (Spark/AQE broadcasts the small seen
    # side — fewer stages per round); past it, the bloom probe + broadcast
    # semi-join path streams the seen scan without ever shuffling it. The
    # sidecar is backfilled from the full seen set at the crossover, so
    # late activation cannot produce false negatives.
    bloom_min_seen: int = 1_000_000
    # Below this many queued candidates the budget window skips its salted
    # pre-phase (P5): one exchange instead of two. Skew only threatens when a
    # single host's queue outgrows a task, which cannot happen under this
    # bound. Verdicts are identical on both paths.
    salt_min_candidates: int = 1_000_000

    def host_allowed(self, host: str) -> bool:
        if self.allowed_domains is None:
            return True
        return any(host == d or host.endswith("." + d) for d in self.allowed_domains)
