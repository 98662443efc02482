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
