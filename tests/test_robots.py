"""Robots gating pin tests (conceptual mirror of upstream
tests/test_downloadermiddleware_robotstxt.py; stdlib-parser semantics pinned
in FIXTURES.md §3 / SURVEY.md §2.5 R2)."""

from sparkcrawl.robots import AGENT, parse_robots, robots_allowed

BODY = """User-agent: *
Disallow: /private/
Disallow: /tmp

User-agent: sparkcrawl
Disallow: /secret/
"""


def test_specific_agent_stanza_wins():
    rp = parse_robots(BODY)
    assert rp.can_fetch(AGENT, "http://h.example/private/x")  # * stanza not ours
    assert not rp.can_fetch(AGENT, "http://h.example/secret/x")


def test_star_stanza_applies_when_no_specific():
    rp = parse_robots("User-agent: *\nDisallow: /private/\n")
    assert not rp.can_fetch(AGENT, "http://h.example/private/x")
    assert rp.can_fetch(AGENT, "http://h.example/pub")


def test_status_gates():
    assert robots_allowed(None, None, "http://h.example/")  # absent → allow
    assert robots_allowed(404, "", "http://h.example/")  # 4xx → allow
    assert not robots_allowed(500, "", "http://h.example/")  # 5xx → deny
    assert robots_allowed(200, "", "http://h.example/")  # empty body → allow
    assert not robots_allowed(
        200, "User-agent: *\nDisallow: /\n", "http://h.example/"
    )


def test_disallow_all():
    assert not robots_allowed(
        200, "User-agent: *\nDisallow: /\n", "http://h.example/any/path"
    )
