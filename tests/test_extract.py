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
