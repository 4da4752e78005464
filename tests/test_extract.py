"""Pinned link/text extraction tests (conceptual mirror of upstream
tests/test_linkextractors.py golden-list style; FIXTURES.md §3 is the pin)."""

from sparkcrawl.extract import Link, decode_html, extract_links, extract_text

BASE = "http://h0.example/dir/page.html"

HTML = b"""<html><head><title>T</title><base href="/sub/"><meta charset="utf-8"></head>
<body><p>Hello   world &amp; you</p><script>var x=1;</script><style>.a{}</style>
<a href="p1.html">First <b>link</b></a>
<a href="p1.html?b=2&a=1">second</a>
<a href="/abs.html" rel="noopener NOFOLLOW">NF</a>
<a href="#frag">skip</a>
<a href="">skip</a>
<a href="mailto:x@y">skip</a>
<a href="javascript:void(0)">skip</a>
<a href="http://other.example/x">offsite</a>
<a href="p1.html">dup-canonical-skip</a>
<area href="p2.html">
<!-- <a href="commented.html">no</a> -->
</body></html>"""


def test_extract_links_golden():
    links = extract_links(HTML, BASE)
    assert links == [
        Link("http://h0.example/sub/p1.html", "First link", False),
        Link("http://h0.example/sub/p1.html?b=2&a=1", "second", False),
        Link("http://h0.example/abs.html", "NF", True),
        Link("http://other.example/x", "offsite", False),
        Link("http://h0.example/sub/p2.html", "", False),
    ]


def test_base_href_applies_document_wide():
    # base AFTER a link still rebases it (document-level base semantics)
    html = b'<a href="x.html">a</a><base href="http://b.example/d/">'
    (l,) = extract_links(html, BASE)
    assert l.url == "http://b.example/d/x.html"


def test_unclosed_anchor_still_emitted():
    html = b'<a href="x.html">text'
    (l,) = extract_links(html, BASE)
    assert l.url == "http://h0.example/dir/x.html" and l.text == "text"


def test_extract_text_golden():
    assert (
        extract_text(HTML)
        == "T Hello world & you First link second NF skip skip skip skip offsite dup-canonical-skip"
    )


def test_text_skips_script_style_comments():
    html = b"<body>a <script>x</script>b <style>y</style>c <!--z--><template>t</template>d</body>"
    assert extract_text(html) == "a b c d"
    # no inter-node whitespace → plain concatenation (pinned)
    assert extract_text(b"a<script>x</script>b") == "ab"


def test_text_whitespace_collapse_and_strip():
    assert extract_text(b"  <p>a\n\n  b\tc</p> ") == "a b c"


def test_decode_bom():
    assert decode_html(b"\xef\xbb\xbfhi") == "hi"


def test_decode_meta_charset_latin1():
    html = '<meta charset="latin-1"><p>café</p>'.encode("latin-1")
    assert "café" in decode_html(html)
    assert extract_text(html) == "café"


def test_decode_fallback_utf8_replace():
    assert "caf" in decode_html("café".encode("latin-1"))  # bad utf-8 → replace


def test_malformed_html_no_crash():
    assert extract_text(b"<a <b> </zz>< & text") is not None
    assert extract_links(b"<a href=", BASE) == []


# --- combined one-pass kernel ≡ the two standalone kernels -------------------

_PAGE_CASES = [
    b"<html><body><p>hi</p><a href='/x.html'>x</a></body></html>",
    b"<html><head><base href='http://b.example/dir/'></head>"
    b"<body><a href='p.html'>rel</a><area href='/a2'>"
    b"<script>var x='<a href=/fake>no</a>';</script>"
    b"<a href='http://c.example/q?b=2&a=1'>abs</a>"
    b"<a href='#frag'>skip</a><a href='mailto:x@y'>skip2</a></body>",
    b"<a href='/u1'>one<a href='/u2'>two</a>",  # unclosed anchor
    b"<a href='/dup'>d1</a><a href='/dup#f'>d2</a>",  # canonical dup
    b"<a href='/nf' rel='NoFollow'>nf</a>",
    b"<div><style>.x{}</style>text<template><a href='/t'>t</a></template></div>"
    b"<a href='/ok'/>self-closing",
    b"\xef\xbb\xbf<html><body>bom <a href='/b'>b</a></body></html>",
    b"<html><meta charset='latin-1'><body>caf\xe9 <a href='/l'>l</a></body>",
    b"broken << << <a href= ></a> <a",
    b"",
]


def test_extract_page_equals_standalone_kernels():
    from sparkcrawl.extract import extract_page

    base = "http://h.example/d/p.html"
    for html in _PAGE_CASES:
        text, links = extract_page(html, base)
        assert text == extract_text(html), html
        assert links == extract_links(html, base), html


def test_extract_page_equals_on_synth_corpus(tmp_path):
    """The combined kernel must agree with the standalone kernels on every
    page of a generated corpus (the same corpora the pipeline crawls)."""
    import pyarrow.parquet as pq

    from sparkcrawl.extract import extract_page
    from sparkcrawl.synth import generate

    d = str(tmp_path / "c")
    generate(d, seed=5, n_hosts=4, pages_per_host=15, n_seeds=2)
    tab = pq.read_table(f"{d}/pages.parquet")
    for url, html in zip(tab["url"].to_pylist(), tab["html"].to_pylist()):
        text, links = extract_page(html, url)
        assert text == extract_text(html)
        assert links == extract_links(html, url)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _frag = st.sampled_from(
        ["<a href='/x'>", "</a>", "<a>", "<script>", "</script>", "<style>",
         "</style>", "text ", "&amp;", "<base href='http://z.example/'>",
         "<area href='/ar'>", "<p>", "</p>", "<a href='#f'>", "é",
         "<a href='/y' rel=nofollow>", "<!-- c -->", "<br/>", "< broken",
         "<template>", "</template>", "<a href='HTTP://U.EX/P?b=1&a=2'>"]
    )

    @given(st.lists(_frag, max_size=30))
    @settings(max_examples=200, deadline=None)
    def test_extract_page_equivalence_property(frags):
        from sparkcrawl.extract import extract_page

        html = "".join(frags).encode("utf-8")
        base = "http://h.example/q/"
        text, links = extract_page(html, base)
        assert text == extract_text(html)
        assert links == extract_links(html, base)
except ImportError:  # pragma: no cover
    pass


# --- sitemap kernels (sitemaps.org protocol; SitemapSpider analogue) ------

SITEMAP = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"  <url><loc>http://h0.example/p1.html</loc></url>\n"
    b"  <url><loc> http://h0.example/art.php?id=3&amp;ref=home </loc></url>\n"
    b"  <url><loc>/relative.html</loc></url>\n"
    b"  <url><loc>ftp://h0.example/skip</loc></url>\n"
    b"  <url><loc>http://h0.example/p1.html?</loc></url>\n"
    b"</urlset>\n"
)

SITEMAPINDEX = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b"  <sitemap><loc>http://h0.example/sitemap-0.xml</loc></sitemap>\n"
    b"  <sitemap><loc>http://h0.example/sitemap-1.xml</loc></sitemap>\n"
    b"</sitemapindex>\n"
)


def test_sitemap_loc_extraction():
    from sparkcrawl.extract import extract_page, is_sitemap

    assert is_sitemap(decode_html(SITEMAP))
    links = extract_links(SITEMAP, "http://h0.example/sitemap.xml")
    # entity-unescaped, whitespace-trimmed, relative resolved, non-http
    # dropped, per-document canonical uniqueness (trailing '?' dups p1)
    assert [l.url for l in links] == [
        "http://h0.example/p1.html",
        "http://h0.example/art.php?id=3&ref=home",
        "http://h0.example/relative.html",
    ]
    assert all(l.text == "" and not l.nofollow for l in links)
    # sitemap text pinned empty; one-pass kernel agrees with the standalones
    assert extract_text(SITEMAP) == ""
    assert extract_page(SITEMAP, "http://h0.example/sitemap.xml") == (
        "",
        links,
    )


def test_sitemapindex_recurses_as_links():
    links = extract_links(SITEMAPINDEX, "http://h0.example/sitemap.xml")
    assert [l.url for l in links] == [
        "http://h0.example/sitemap-0.xml",
        "http://h0.example/sitemap-1.xml",
    ]


def test_html_mentioning_urlset_is_not_a_sitemap():
    from sparkcrawl.extract import is_sitemap

    html = b"<html><body><p>the &lt;urlset&gt; tag and urlset word</p></body></html>"
    assert not is_sitemap(decode_html(html))
    assert extract_text(html) == "the <urlset> tag and urlset word"
