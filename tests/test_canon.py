"""Pinned-semantics tests for canonicalization / fingerprint / xxh64.

Golden cases mirror published w3lib ``canonicalize_url`` doc examples and
upstream scrapy tests/test_utils_request.py conceptually (SURVEY.md §5.1) —
the checkout being empty, FIXTURES.md §3 is the authoritative pin.
"""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcrawl.canon import (
    canonicalize_url,
    fingerprint,
    seq_for_link,
    seq_for_seed,
    url_host,
    xxh64,
    xxh64_str,
)

GOLDEN = [
    # FIXTURES.md §3 pinned vector
    ("HTTP://Ex.com:80/a%2fb?b=2&a=1#f", "http://ex.com/a%2Fb?a=1&b=2"),
    # default-port stripping per scheme
    ("https://EX.com:443/", "https://ex.com/"),
    ("https://ex.com:80/", "https://ex.com:80/"),
    # empty path → /
    ("http://ex.com", "http://ex.com/"),
    # query param sorting by (key, value)
    ("http://ex.com/?b=1&a=2&a=1", "http://ex.com/?a=1&a=2&b=1"),
    # blank values kept
    ("http://ex.com/p?a=&b=2", "http://ex.com/p?a=&b=2"),
    # unreserved percent-escapes decoded; reserved kept upper-hex
    ("http://ex.com/p?a=%61&x=%2F", "http://ex.com/p?a=a&x=%2F"),
    ("http://ex.com/%7Euser/%7euser", "http://ex.com/~user/~user"),
    # raw space encoded
    ("http://ex.com/sp ace?q=a b", "http://ex.com/sp%20ace?q=a%20b"),
    # fragment stripped
    ("http://ex.com/p#sec", "http://ex.com/p"),
    # bare % encoded
    ("http://ex.com/100%", "http://ex.com/100%25"),
    # userinfo preserved
    ("http://u:pw@Ex.com/p", "http://u:pw@ex.com/p"),
    # surrounding whitespace stripped
    ("  http://ex.com/p  ", "http://ex.com/p"),
]


def test_golden_vectors():
    for raw, want in GOLDEN:
        assert canonicalize_url(raw) == want, raw


def test_duplicate_edge_variants_collapse():
    # the synth corpus' ~2% duplicate edges vary only in param order/fragment
    a = canonicalize_url("http://h1.example/p?x=1&y=2")
    b = canonicalize_url("http://h1.example/p?y=2&x=1#frag")
    assert a == b
    assert fingerprint("http://h1.example/p?x=1&y=2") == fingerprint(
        "http://h1.example/p?y=2&x=1#frag"
    )


url_strategy = st.builds(
    lambda host, path, q: f"http://{host}.example/{path}?{q}",
    st.text("abcdefgh", min_size=1, max_size=8),
    st.text("abc/%20.~", max_size=12),
    st.text("abc=&%41", max_size=12),
)


@settings(max_examples=300, deadline=None)
@given(url_strategy)
def test_canonicalize_idempotent(u):
    c1 = canonicalize_url(u)
    assert canonicalize_url(c1) == c1


def test_fingerprint_shape():
    fp = fingerprint("http://ex.com/")
    assert isinstance(fp, bytes) and len(fp) == 32
    assert fp == hashlib.sha256(b"GET\x00http://ex.com/").digest()


def test_url_host():
    assert url_host("HTTP://H3.Example:8080/p?q=1") == "h3.example"
    assert url_host("not a url") == ""


def test_xxh64_public_vectors():
    # public xxHash reference vectors (seed 0)
    u = (1 << 64) - 1
    assert xxh64(b"", 0) & u == 0xEF46DB3751D8E999
    assert xxh64(b"a", 0) & u == 0xD24EC4F1A98C6E5B
    assert xxh64(b"abc", 0) & u == 0x44BC2CF5AD770999


def test_xxh64_spark_seed42_vectors():
    # values cross-checked against Spark 4.1.2 F.xxhash64 this session
    assert xxh64_str("abc") == 1423657621850124518
    assert xxh64_str("") == -7444071767201028348
    assert xxh64_str("http://ex.com/a%2Fb?a=1&b=2") == -2928617580097017543
    assert xxh64_str("x" * 100) == 365730103971579591
    assert xxh64_str("ünïcode→") == -1858344434189214495
    assert seq_for_link(12345, "http://ex.com/") == 4779414983602137502
    assert seq_for_link(-99, "http://h.example/p") == -7918383327109818758


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(0, 2**32))
def test_xxh64_signed_range(data, seed):
    v = xxh64(data, seed)
    assert -(1 << 63) <= v < (1 << 63)


def test_seq_determinism():
    s = seq_for_seed("http://h0.example/")
    assert s == seq_for_seed("http://h0.example/")
    assert seq_for_link(s, "http://h0.example/a") != seq_for_link(
        s, "http://h0.example/b"
    )
