"""Minimal HTML DOM with bs4-compatible get_text()/find_all semantics.

The reference extracts text with BeautifulSoup's ``soup.get_text()`` over
a per-authority container selector (e.g. ``div.news-page`` at
``pygdpr/models/dpa/finland/__init__.py:113-199``, ``div.field--name-body``
at ``pygdpr/models/dpa/ireland/__init__.py:197-200``).  bs4 is not
installed in this sandbox, so this module provides a small stdlib
(`html.parser`) DOM implementing exactly the subset the extraction
registry needs — ``find``/``find_all`` by tag/class/id, simple descendant
CSS selectors, and ``get_text()`` = concatenation of all descendant text
nodes (bs4's default separator='').

When bs4 IS available (a real cluster image), ``SOUP_BACKEND`` flips to
it so extraction byte-parity with the reference's bs4 version is
preserved; the registry code only uses the shared subset.
"""

from __future__ import annotations

from html.parser import HTMLParser

try:  # pragma: no cover - exercised only where bs4 exists
    import bs4  # noqa: F401

    SOUP_BACKEND = "bs4"
except ImportError:
    SOUP_BACKEND = "stdlib"

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: dict[str, str], parent: "Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.children: list[Node | str] = []
        self.parent = parent

    # -- bs4-compatible surface ------------------------------------------------

    def get(self, name: str, default=None):
        return self.attrs.get(name, default)

    @property
    def classes(self) -> list[str]:
        return self.attrs.get("class", "").split()

    def _matches(self, tag: str | None, class_: str | None, id_: str | None) -> bool:
        if tag and self.tag != tag:
            return False
        if class_ and class_ not in self.classes:
            return False
        if id_ and self.attrs.get("id") != id_:
            return False
        return True

    def _walk(self):
        for c in self.children:
            if isinstance(c, Node):
                yield c
                yield from c._walk()

    def find_all(self, tag=None, class_=None, id=None) -> list["Node"]:
        return [n for n in self._walk() if n._matches(tag, class_, id)]

    def find(self, tag=None, class_=None, id=None) -> "Node | None":
        for n in self._walk():
            if n._matches(tag, class_, id):
                return n
        return None

    def select(self, selector: str) -> list["Node"]:
        """Descendant-combinator CSS subset: ``div.a ul#x li a.b``."""
        parts = selector.split()
        ctx: list[Node] = [self]
        for part in parts:
            tag, class_, id_ = _parse_simple(part)
            nxt: list[Node] = []
            seen: set[int] = set()
            for c in ctx:
                for n in c.find_all(tag, class_, id_):
                    if id(n) not in seen:
                        seen.add(id(n))
                        nxt.append(n)
            ctx = nxt
        return ctx

    def select_one(self, selector: str) -> "Node | None":
        r = self.select(selector)
        return r[0] if r else None

    def get_text(self, separator: str = "", strip: bool = False) -> str:
        out: list[str] = []

        def rec(n: "Node"):
            for c in n.children:
                if isinstance(c, str):
                    out.append(c.strip() if strip else c)
                else:
                    rec(c)

        rec(self)
        if strip:
            return separator.join(s for s in out if s)
        return separator.join(out)

    @property
    def text(self) -> str:
        return self.get_text()


def _parse_simple(part: str) -> tuple[str | None, str | None, str | None]:
    tag = class_ = id_ = None
    buf, mode = "", "tag"
    for ch in part + "\0":
        if ch in ".#\0":
            if buf:
                if mode == "tag":
                    tag = buf
                elif mode == "class":
                    class_ = buf
                else:
                    id_ = buf
            buf = ""
            mode = "class" if ch == "." else "id" if ch == "#" else mode
        else:
            buf += ch
    return tag, class_, id_


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("[document]", {}, None)
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs), self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self.stack[-1].children.append(Node(tag, dict(attrs), self.stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html_text: str) -> Node:
    """Parse an HTML string into a mini-DOM root node."""
    b = _TreeBuilder()
    b.feed(html_text)
    b.close()
    return b.root
