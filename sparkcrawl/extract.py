"""Pinned HTML decoding, link extraction, and text extraction kernels.

Pure-Python (stdlib ``html.parser`` + ``urllib.parse``) because lxml/parsel
are absent in this sandbox (SURVEY.md §0.1). Semantics mirror the documented
behavior of Scrapy's LxmlLinkExtractor and ``TextResponse.text``
(upstream symbols: ``scrapy/linkextractors/lxmlhtml.py::LxmlLinkExtractor``,
``scrapy/http/response/text.py::TextResponse``), pinned in FIXTURES.md §3.
These exact functions run inside Arrow-batched pandas UDFs on executors
(sparkcrawl/udfs.py) AND in the single-process oracle — byte-identical
extracted text per url is the BASELINE.json:15 invariant.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from html import unescape
from html.parser import HTMLParser
from urllib.parse import urljoin

from sparkcrawl.canon import canonicalize_url

__all__ = [
    "decode_html", "extract_links", "extract_page", "extract_sitemap_links",
    "extract_text", "is_sitemap", "Link",
]

_WS_RE = re.compile(r"\s+")
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_SKIP_TAGS = frozenset({"script", "style", "template"})
# Void elements never close, so they must not affect skip-depth tracking.
_VOID = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)


@dataclass(frozen=True)
class Link:
    """Extracted hyperlink (reference analogue: scrapy/link.py::Link)."""

    url: str
    text: str
    nofollow: bool


def decode_html(html: bytes) -> str:
    """Pinned decode precedence: BOM → <meta charset> in first 4096 bytes →
    UTF-8 with errors='replace' (FIXTURES.md §3)."""
    if html.startswith(b"\xef\xbb\xbf"):
        return html[3:].decode("utf-8", errors="replace")
    if html.startswith(b"\xff\xfe"):
        return html[2:].decode("utf-16-le", errors="replace")
    if html.startswith(b"\xfe\xff"):
        return html[2:].decode("utf-16-be", errors="replace")
    m = _META_CHARSET_RE.search(html[:4096])
    if m:
        enc = m.group(1).decode("ascii", errors="replace").lower()
        try:
            return html.decode(enc, errors="replace")
        except LookupError:
            pass
    return html.decode("utf-8", errors="replace")


class _LinkParser(HTMLParser):
    """Collects <a>/<area> hrefs + anchor text + rel=nofollow, and the first
    <base href>. Raw hrefs are resolved against the final base AFTER the
    parse (document-level base semantics, w3lib get_base_url behavior)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.raw: list[list] = []  # [href, text_parts, nofollow]
        self.base_href: str | None = None
        self._open_a: list | None = None

    def _attrs_get(self, attrs, name):
        for k, v in attrs:
            if k == name:
                return v
        return None

    def handle_starttag(self, tag, attrs):
        if tag == "base" and self.base_href is None:
            href = self._attrs_get(attrs, "href")
            if href:
                self.base_href = href.strip()
        elif tag in ("a", "area"):
            href = self._attrs_get(attrs, "href")
            rel = self._attrs_get(attrs, "rel") or ""
            nofollow = "nofollow" in rel.lower().split()
            if tag == "area":
                if href is not None:
                    self.raw.append([href, [], nofollow])
            else:
                # close an unterminated previous <a> first (malformed HTML)
                if self._open_a is not None:
                    self.raw.append(self._open_a)
                self._open_a = [href, [], nofollow] if href is not None else None

    def handle_endtag(self, tag):
        if tag == "a" and self._open_a is not None:
            self.raw.append(self._open_a)
            self._open_a = None

    def handle_data(self, data):
        if self._open_a is not None:
            self._open_a[1].append(data)

    def close(self):
        super().close()
        if self._open_a is not None:
            self.raw.append(self._open_a)
            self._open_a = None


def _finalize_links(parser, base_url: str) -> list[Link]:
    """Post-parse link resolution shared by extract_links/extract_page:
    first <base href> replaces base_url; urljoin; drop non-http(s), empty,
    and fragment-only hrefs; anchor text whitespace-collapsed; per-document
    uniqueness on the canonical form, first occurrence wins."""
    base = parser.base_href or base_url
    if parser.base_href is not None:
        base = urljoin(base_url, parser.base_href)

    out: list[Link] = []
    seen_canon: set[str] = set()
    for href, text_parts, nofollow in parser.raw:
        href = (href or "").strip()
        if not href or href.startswith("#"):
            continue
        try:
            absu = urljoin(base, href)
        except ValueError:
            continue
        if not (absu.startswith("http://") or absu.startswith("https://")):
            continue
        try:
            canon = canonicalize_url(absu)
        except ValueError:
            continue
        if canon in seen_canon:
            continue
        seen_canon.add(canon)
        text = _WS_RE.sub(" ", "".join(text_parts)).strip()
        out.append(Link(url=absu, text=text, nofollow=nofollow))
    return out


def extract_links(html: bytes, base_url: str) -> list[Link]:
    """Pinned link extraction (FIXTURES.md §3). Document order; see
    :func:`_finalize_links` for the resolution rules. Sitemap documents
    (sitemaps.org ``<urlset>``/``<sitemapindex>``) yield their ``<loc>``
    entries instead of anchors — SitemapSpider semantics (upstream symbol
    ``scrapy/spiders/sitemap.py::SitemapSpider._parse_sitemap``, pinned-spec
    cite per SURVEY.md §0)."""
    doc = decode_html(html)
    if is_sitemap(doc):
        return extract_sitemap_links(doc, base_url)
    parser = _LinkParser()
    try:
        parser.feed(doc)
        parser.close()
    except Exception:
        pass  # malformed HTML: keep whatever was collected
    return _finalize_links(parser, base_url)


# --- sitemap kernels (sitemaps.org protocol; SitemapSpider analogue) ------
# Root-element detection is bounded to the document head so an HTML page
# that merely MENTIONS "<urlset" in body text is never misdetected; the
# regex parse (vs a full XML parser) is pinned spec here — the corpus model
# emits protocol-shaped sitemaps, and lxml is absent in this sandbox.
_SITEMAP_ROOT_RE = re.compile(r"<\s*(urlset|sitemapindex)[\s>]", re.IGNORECASE)
_SITEMAP_LOC_RE = re.compile(r"<\s*loc\s*>\s*([^<]+?)\s*<\s*/\s*loc\s*>", re.IGNORECASE)


def is_sitemap(doc: str) -> bool:
    """True when the decoded document's root element is ``<urlset>`` or
    ``<sitemapindex>`` (searched within the first 1024 chars — past any XML
    declaration / comments, before any real content)."""
    return _SITEMAP_ROOT_RE.search(doc[:1024]) is not None


def extract_sitemap_links(doc: str, base_url: str) -> list[Link]:
    """``<loc>`` entries of a sitemap/sitemapindex document → Links, pinned:
    XML-entity-unescaped (the protocol requires ``&amp;``-escaped urls),
    urljoined against the sitemap url (spec locs are absolute; relative ones
    resolve like any href), non-http(s) dropped, per-document uniqueness on
    the canonical form (first occurrence wins), empty text, never nofollow.
    Shared verbatim by the Spark extraction UDF and the oracle."""
    out: list[Link] = []
    seen_canon: set[str] = set()
    for m in _SITEMAP_LOC_RE.finditer(doc):
        href = unescape(m.group(1).strip())
        if not href:
            continue
        try:
            absu = urljoin(base_url, href)
        except ValueError:
            continue
        if not (absu.startswith("http://") or absu.startswith("https://")):
            continue
        try:
            canon = canonicalize_url(absu)
        except ValueError:
            continue
        if canon in seen_canon:
            continue
        seen_canon.add(canon)
        out.append(Link(url=absu, text="", nofollow=False))
    return out


class _TextParser(HTMLParser):
    """Concatenates text nodes, skipping script/style/template subtrees and
    comments (handle_comment unimplemented → dropped)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS and tag not in _VOID:
            self._skip_depth += 1

    def handle_startendtag(self, tag, attrs):
        pass  # self-closing skip tag has no subtree

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


def extract_text(html: bytes) -> str:
    """Pinned text extraction (FIXTURES.md §3): decode; drop
    script/style/template subtrees and comments; concatenate text nodes in
    document order; collapse whitespace runs to one space; strip. Sitemap
    documents have no prose — pinned to the empty string (their payload is
    the ``<loc>`` link set)."""
    doc = decode_html(html)
    if is_sitemap(doc):
        return ""
    parser = _TextParser()
    try:
        parser.feed(doc)
        parser.close()
    except Exception:
        pass
    return _WS_RE.sub(" ", "".join(parser.parts)).strip()


class _PageParser(HTMLParser):
    """Single-pass union of _LinkParser and _TextParser — the hot-path
    kernel: HTML is decoded and tokenized ONCE per page instead of once per
    extractor. Behaviorally identical to running both standalone parsers
    (equality property-tested in tests/test_extract.py): the link side sees
    every tag/data event exactly as _LinkParser does (including its default
    startendtag → starttag+endtag expansion), the text side keeps
    _TextParser's skip-subtree depth and its no-op startendtag override."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.raw: list[list] = []
        self.base_href: str | None = None
        self._open_a: list | None = None
        self.parts: list[str] = []
        self._skip_depth = 0

    def _attrs_get(self, attrs, name):
        for k, v in attrs:
            if k == name:
                return v
        return None

    def _link_start(self, tag, attrs):
        if tag == "base" and self.base_href is None:
            href = self._attrs_get(attrs, "href")
            if href:
                self.base_href = href.strip()
        elif tag in ("a", "area"):
            href = self._attrs_get(attrs, "href")
            rel = self._attrs_get(attrs, "rel") or ""
            nofollow = "nofollow" in rel.lower().split()
            if tag == "area":
                if href is not None:
                    self.raw.append([href, [], nofollow])
            else:
                if self._open_a is not None:
                    self.raw.append(self._open_a)
                self._open_a = [href, [], nofollow] if href is not None else None

    def _link_end(self, tag):
        if tag == "a" and self._open_a is not None:
            self.raw.append(self._open_a)
            self._open_a = None

    def handle_starttag(self, tag, attrs):
        self._link_start(tag, attrs)
        if tag in _SKIP_TAGS and tag not in _VOID:
            self._skip_depth += 1

    def handle_startendtag(self, tag, attrs):
        # link side: default HTMLParser expansion (start + end);
        # text side: self-closing skip tag has no subtree → depth untouched
        self._link_start(tag, attrs)
        self._link_end(tag)

    def handle_endtag(self, tag):
        self._link_end(tag)
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._open_a is not None:
            self._open_a[1].append(data)
        if self._skip_depth == 0:
            self.parts.append(data)

    def close(self):
        super().close()
        if self._open_a is not None:
            self.raw.append(self._open_a)
            self._open_a = None


def extract_page(html: bytes, base_url: str) -> tuple[str, list[Link]]:
    """One-pass (text, links) extraction — semantics identical to
    ``(extract_text(html), extract_links(html, base_url))`` at ~half the
    parse cost. Used by the pipeline's fetch stage; the standalone kernels
    remain the spec (and the oracle's implementation)."""
    doc = decode_html(html)
    if is_sitemap(doc):
        return "", extract_sitemap_links(doc, base_url)
    parser = _PageParser()
    try:
        parser.feed(doc)
        parser.close()
    except Exception:
        pass
    text = _WS_RE.sub(" ", "".join(parser.parts)).strip()
    return text, _finalize_links(parser, base_url)
