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

    def host_allowed(self, host: str) -> bool:
        if self.allowed_domains is None:
            return True
        return any(host == d or host.endswith("." + d) for d in self.allowed_domains)
