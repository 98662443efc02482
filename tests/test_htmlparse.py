"""Mini-DOM: bs4-compatible get_text/select subset used by extraction."""

from crawler_spark.htmlparse import parse_html

HTML = """
<html><body>
<nav>Home</nav>
<div class="view-content"><div class="item-list"><ul>
<li><article><h2><a href="/d/1">Title &amp; One</a></h2><p class="date">21st June 2021</p></article></li>
<li><article><h2><a href="/d/2">Title Two</a></h2><p class="date">3rd May 2022</p></article></li>
</ul></div></div>
<div class="news-page"><p>Line one.</p><p>  Line two.</p></div>
<footer>foot</footer>
</body></html>
"""


def test_select_descendants():
    root = parse_html(HTML)
    items = root.select("div.view-content li article")
    assert len(items) == 2
    a = items[0].select_one("h2 a")
    assert a.get("href") == "/d/1"
    assert a.get_text() == "Title & One"  # entity decoded, like bs4


def test_get_text_concatenates_all_descendants():
    root = parse_html(HTML)
    body = root.select_one("div.news-page")
    assert body.get_text() == "Line one.  Line two."


def test_find_by_class_and_id():
    root = parse_html('<div id="x" class="a b">hi<span class="b">!</span></div>')
    assert root.find(id="x").classes == ["a", "b"]
    assert len(root.find_all(class_="b")) == 2
    assert root.find("span", class_="b").get_text() == "!"


def test_void_and_nested():
    root = parse_html("<div><p>a<br>b</p><img src='x'><p>c</p></div>")
    assert root.find("div").get_text() == "abc"
    assert len(root.find_all("p")) == 2


# -- streaming scanner vs DOM parity (the hot-path replacement) -------------


def test_stream_extract_matches_dom_on_all_profiles():
    """parse_docpage (single-pass scanner) must byte-match the DOM twin
    on every authority's docpage shape, including depth-2 link and alert
    variants."""
    from crawler_spark import extract as X
    from crawler_spark.fixtures import BASE_AUTHORITIES, _docpage_html

    for a in BASE_AUTHORITIES:
        cfg = X.cfg_of(a)
        if cfg.get("doc_is_file") or cfg.get("listing_mode") == "href_files":
            continue  # no docpage in these flows
        for p in (1, 2):
            for i in (1, 2, 3, 4):
                nf = 2 if cfg["depth2_selector"] else 0
                html = _docpage_html(a, p, i, nf, 10)
                url = f"https://x/{a}/{p}-{i}.html"
                assert X.parse_docpage(a, url, html) == X.parse_docpage_dom(
                    a, url, html
                ), (a, p, i)


def test_stream_extract_edge_cases():
    from crawler_spark.htmlparse import stream_extract

    # entities decoded like the DOM; nested tags captured; comments and
    # doctype skipped; footer after container ignored
    html = (
        "<!doctype html><html><body><!-- note -->"
        '<div class="b"><p>A &amp; B</p><span>c&#33;</span></div>'
        "<footer>f</footer></body></html>"
    )
    text, links = stream_extract(html, "div.b")
    assert text == "A & Bc!"
    # link selector collects document-order hrefs; body may be absent
    html2 = '<div class="x"><p><a href="/1">x</a></p><a href="/2">y</a></div>'
    text2, links2 = stream_extract(html2, "div.zzz", ("div.x a",))
    assert text2 is None and links2 == [["/1", "/2"]]
    # quoted '>' inside attributes; self-closing containers
    html3 = '<div class="b" title="a>b"><p>t</p></div>'
    assert stream_extract(html3, "div.b")[0] == "t"
    # script contents are raw CDATA (no entity decoding), like HTMLParser
    html4 = '<div class="b">x<script>if (a &amp;&amp; b) {}</script>y</div>'
    assert stream_extract(html4, "div.b")[0] == "xif (a &amp;&amp; b) {}y"
    from crawler_spark.htmlparse import parse_html as ph

    assert ph(html4).select_one("div.b").get_text() == "xif (a &amp;&amp; b) {}y"
    # stray '<' treated as text
    html5 = '<div class="b">1 < 2</div>'
    assert stream_extract(html5, "div.b")[0] == ph(html5).select_one("div.b").get_text()


def test_stream_cdata_close_tag_forms():
    """Round-3 ADVICE: CDATA close must be case-insensitive and must not
    prefix-match tags like </scriptx> — mirror html.parser's
    </\\s*tag\\s*> regex, byte-equal to the DOM twin."""
    from crawler_spark.htmlparse import parse_html, stream_extract

    cases = [
        # uppercase close tag
        '<div class="b">x<script>a</SCRIPT>y</div>z',
        # mixed case + whitespace inside the close tag
        '<div class="b">x<script>a</Script >y</div>',
        '<div class="b">x<style>s</ STYLE>y</div>',
        # </scriptx> is NOT a close tag: stays raw until the real close
        '<div class="b">x<script>a</scriptx>b</script>y</div>',
        # unterminated script: html.parser drops the dangling raw text
        '<div class="b">x<script>a<b>c</div>',
    ]
    for html in cases:
        dom = parse_html(html).select_one("div.b")
        assert stream_extract(html, "div.b")[0] == dom.get_text(), html


def test_attr_value_not_fooled_by_quoted_payloads():
    """Round-3 ADVICE: attribute scan must tokenize left-to-right so a
    name= substring inside another attribute's quoted value never wins."""
    from crawler_spark.htmlparse import parse_html, stream_extract

    # class= inside title's value must not shadow the real class
    html = '<div title=" class=\'evil\'" class="real"><p>t</p></div>'
    assert stream_extract(html, "div.real")[0] == "t"
    assert stream_extract(html, "div.evil")[0] is None
    dom = parse_html(html)
    assert dom.select_one("div.real") is not None
    assert dom.select_one("div.evil") is None

    # href= inside title must not beat the real href (document order)
    html2 = '<a title="see href=\'/fake\' here" href="/real">x</a>'
    _, links = stream_extract(html2, None, ("a",))
    assert links == [["/real"]]

    # bare attribute and unquoted values tokenize cleanly
    html3 = '<div hidden class=real data-x=1><p>t</p></div>'
    assert stream_extract(html3, "div.real")[0] == "t"


def test_attr_value_quote_adjacent_attributes():
    """Round-4 ADVICE: a quote can be the only delimiter before the next
    attribute ('<div title="x"class="real">') — html.parser's
    attrfind_tolerant accepts it via its (?<=['"\\s/]) lookbehind, so the
    streaming scanner must too, and both paths must stay byte-equal."""
    from crawler_spark.htmlparse import parse_html, stream_extract

    cases = [
        '<div title="x"class="real"><p>t</p></div>',
        "<div title='x'class='real'><p>t</p></div>",
        '<div a="1"b="2"class="real"id="i1"><p>t</p></div>',
    ]
    for html in cases:
        assert stream_extract(html, "div.real")[0] == "t", html
        dom = parse_html(html)
        assert dom.select_one("div.real").get_text() == "t", html
    # id + href through a quote delimiter, document order kept
    html2 = '<a href="/1"id="x">a</a><a title="t"href="/2">b</a>'
    _, links = stream_extract(html2, None, ("a",))
    assert links == [["/1", "/2"]]
