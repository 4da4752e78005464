"""Pinned URL canonicalization + request fingerprint + deterministic hashes.

These pure functions ARE the reference semantics for this rebuild (the
reference checkout is empty — see SURVEY.md §0). Semantics mirror the
documented defaults of w3lib ``canonicalize_url`` and Scrapy's
``RequestFingerprinter`` (upstream symbols: ``w3lib/url.py::canonicalize_url``,
``scrapy/utils/request.py::RequestFingerprinter.fingerprint``), pinned in
FIXTURES.md §3. Both the single-process oracle (oracle/crawler.py) and the
Spark pipeline (sparkcrawl/udfs.py pandas UDFs) call these exact functions,
so "matching the reference's crawl ordering and URL-seen set" is testable
in-sandbox.

The XXH64 implementation matches Apache Spark's ``xxhash64`` SQL function
(seed 42, XXH64 over UTF-8 bytes for strings) so that ``seq`` tie-breaks
computed driver-side (oracle) and executor-side (native Spark function)
agree bit-for-bit. Parity is asserted in tests/test_canon.py.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

__all__ = [
    "canonicalize_url",
    "fingerprint",
    "url_host",
    "xxh64",
    "xxh64_str",
    "seq_for_seed",
    "seq_for_link",
    "seq_for_redirect",
    "seq_for_sitemap",
    "resolve_redirect",
]

# RFC 3986 unreserved characters: percent-escapes of these are decoded.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_UNRESERVED_SET = frozenset(_UNRESERVED)

# Characters allowed raw in a path segment (RFC 3986 pchar + "/").
_PATH_SAFE = frozenset(_UNRESERVED + "!$&'()*+,;=:@/%")
# Characters allowed raw in query keys/values (quote_plus-compatible set).
_QUERY_SAFE = frozenset(_UNRESERVED + "*-._")

_DEFAULT_PORTS = {"http": "80", "https": "443"}

_HEX = "0123456789abcdefABCDEF"


def _norm_percent(s: str, safe: frozenset) -> str:
    """Normalize percent-encoding in one URL component.

    - valid %XX where XX decodes to an unreserved char → decoded char
    - other valid %XX → kept, hex uppercased
    - raw chars in ``safe`` → kept
    - all other raw chars (incl. a bare '%') → percent-encoded (UTF-8, upper hex)
    """
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":
            if i + 2 < n and s[i + 1] in _HEX and s[i + 2] in _HEX:
                byte = int(s[i + 1 : i + 3], 16)
                ch = chr(byte)
                if ch in _UNRESERVED_SET:
                    out.append(ch)
                else:
                    out.append("%" + s[i + 1 : i + 3].upper())
                i += 3
                continue
            # bare/broken '%' → encode it
            out.append("%25")
            i += 1
            continue
        if c in safe and c != "%":
            out.append(c)
        else:
            for b in c.encode("utf-8"):
                out.append("%%%02X" % b)
        i += 1
    return "".join(out)


def _parse_qsl_keep_blank(query: str) -> list[tuple[str, str]]:
    """Minimal parse_qsl(keep_blank_values=True) over the RAW query string.

    Splits on '&' and ';' is NOT treated as a separator (modern behavior).
    Does not decode — pairs are re-normalized by _norm_percent afterwards
    so that e.g. ``a=%61`` and ``a=a`` canonicalize identically.
    """
    pairs: list[tuple[str, str]] = []
    if not query:
        return pairs
    for field in query.split("&"):
        if not field:
            continue
        if "=" in field:
            k, _, v = field.partition("=")
        else:
            k, v = field, ""
        pairs.append((k, v))
    return pairs


def canonicalize_url(url: str) -> str:
    """Pinned canonical form (FIXTURES.md §3).

    lowercase scheme+host; strip default port; strip fragment; normalize
    percent-encoding in path (decode unreserved, upper-hex the rest), empty
    path → '/'; query pairs kept (blank values too), percent-normalized,
    sorted lexicographically by (key, value), '+' treated as literal plus.
    """
    url = url.strip()
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    # IDNA hosts pass through as-is (synthetic corpora are ASCII).
    port = parts.port
    netloc = host
    if parts.username:
        userinfo = parts.username + (":" + parts.password if parts.password else "")
        netloc = userinfo + "@" + netloc
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc += ":%d" % port

    path = _norm_percent(parts.path, _PATH_SAFE) or "/"

    pairs = _parse_qsl_keep_blank(parts.query)
    norm_pairs = [
        (_norm_percent(k, _QUERY_SAFE), _norm_percent(v, _QUERY_SAFE))
        for k, v in pairs
    ]
    norm_pairs.sort()
    query = "&".join(f"{k}={v}" for k, v in norm_pairs)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += "?" + query
    return out


def url_host(url: str) -> str:
    """Lowercased host of a URL ('' when unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def fingerprint(url: str) -> bytes:
    """Request fingerprint: sha256 over method + NUL + canonical url.

    (Reference uses sha1 over method/url/body — scrapy/utils/request.py;
    we pin sha256 with the same inputs. The crawl invariant is seen-set
    equality, not hash-value equality. FIXTURES.md §3.)
    """
    return hashlib.sha256(b"GET\x00" + canonicalize_url(url).encode("utf-8")).digest()


# ---------------------------------------------------------------------------
# XXH64 — bit-exact with Spark's xxhash64 (seed 42) on string input.
# Pure-python implementation of the public XXH64 spec
# (github.com/Cyan4973/xxHash — public domain algorithm description).
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark LongType convention)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_str(s: str, seed: int = 42) -> int:
    return xxh64(s.encode("utf-8"), seed)


def seq_for_seed(canon_url: str) -> int:
    """Deterministic total-order tie-break for seed URLs (FIXTURES.md §4)."""
    return xxh64_str(canon_url)


def seq_for_link(parent_seq: int, canon_url: str) -> int:
    """Tie-break for a discovered link: hash of (parent seq, canonical url).

    Encoded as ``str(parent_seq) + '\\x00' + canon_url`` so the identical
    value is computable natively in Spark as
    ``xxhash64(concat_ws('\\x00', cast(parent_seq as string), canon_url))``.
    """
    return xxh64_str(f"{parent_seq}\x00{canon_url}")


def seq_for_redirect(parent_seq: int, canon_url: str) -> int:
    """Tie-break for a followed redirect target. The 'R' domain separator
    keeps it distinct from a link to the same canon discovered on the same
    page (different hash stream); Spark twin:
    ``xxhash64(concat_ws('\\x00', cast(seq as string), 'R', canon))``."""
    return xxh64_str(f"{parent_seq}\x00R\x00{canon_url}")


def seq_for_sitemap(src_host: str, canon_url: str) -> int:
    """Tie-break for a robots-advertised sitemap url. The advertising host
    participates in the hash so two hosts advertising the SAME sitemap url
    produce distinct seqs — min-seq batch dedup then picks a deterministic
    winner (equal seqs would make Spark's min_by tie-break arbitrary and
    diverge from the oracle on parent_url). Spark twin:
    ``xxhash64(concat_ws('\\x00', 'S', src_host, canon))``."""
    return xxh64_str(f"S\x00{src_host}\x00{canon_url}")


def resolve_redirect(base_url: str, location: str) -> str:
    """Pinned 3xx ``Location`` resolution: RFC 3986 join against the fetched
    page url (upstream semantics: scrapy/downloadermiddlewares/redirect.py::
    RedirectMiddleware resolves via urljoin — pinned-spec cite, SURVEY.md §0).
    """
    from urllib.parse import urljoin

    return urljoin(base_url, location.strip())
