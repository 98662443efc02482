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
