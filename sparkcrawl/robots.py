"""Pinned robots.txt evaluation (FIXTURES.md §3).

stdlib ``urllib.robotparser`` only — Protego is absent in this sandbox and
the divergence is documented in SURVEY.md §2.5 R2 (the oracle uses the same
stdlib parser, so Spark-vs-oracle tests remain exact). Reference analogue:
``scrapy/downloadermiddlewares/robotstxt.py::RobotsTxtMiddleware`` +
``scrapy/robotstxt.py::PythonRobotParser``.
"""

from __future__ import annotations

from urllib.robotparser import RobotFileParser

AGENT = "sparkcrawl"  # pinned user-agent string

__all__ = ["AGENT", "parse_robots", "robots_allowed"]


def parse_robots(body: str) -> RobotFileParser:
    rp = RobotFileParser()
    rp.parse(body.splitlines())
    return rp


def robots_allowed(status: int | None, body: str | None, url: str) -> bool:
    """Pinned gate: absent/4xx robots → allow; 5xx → deny; 2xx-3xx → parse
    and evaluate ``can_fetch(AGENT, url)``."""
    if status is None or 400 <= status < 500:
        return True
    if status >= 500:
        return False
    return parse_robots(body or "").can_fetch(AGENT, url)
