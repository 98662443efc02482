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

import re
from html import unescape as _unescape  # same entity tables HTMLParser uses
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


# ---------------------------------------------------------------------------
# Streaming selector-directed extraction (the crawl's hot path)
# ---------------------------------------------------------------------------
#
# Building the full DOM above allocates one Node + attrs dict + children
# list per tag and a Python string per text node.  At 32 cores that object
# churn saturates the box's shared memory controller and caps N->4N
# scaling at ~0.585 (BENCH/membus_probe.py, round 2).  Document pages —
# the overwhelming majority of fetches — only ever need ONE container's
# get_text() plus the hrefs under 1-2 link selectors, so this scanner
# does a single regex pass over the raw string, maintains a stack of
# (tag, selector-prefix) tuples, and materializes text only inside the
# matched container.  Semantics mirror the DOM path exactly (same
# html.unescape entity handling, same void/self-closing/pop-through end
# tag rules); tests/test_htmlparse.py asserts byte-equality against the
# DOM on every authority's fixture pages.

#: a full start tag after '<': name + attrs honoring quoted '>' values
_STARTTAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9-]*)(?:[^>\"']|\"[^\"]*\"|'[^']*')*>")
#: a full end tag after '</'
_ENDTAG_RE = re.compile(r"([a-zA-Z][a-zA-Z0-9-]*)[^>]*>")
_CDATA_TAGS = {"script", "style"}
#: close-tag search per CDATA element — the exact regex html.parser's
#: set_cdata_mode compiles (case-insensitive, optional whitespace), so
#: </SCRIPT> closes and </scriptx> does not
_CDATA_CLOSE = {t: re.compile(r"</\s*%s\s*>" % t, re.IGNORECASE) for t in _CDATA_TAGS}

#: left-to-right attribute tokenizer: delimiter, name, optional =value
#: (quoted values consumed whole so a quoted payload can never be
#: mistaken for an attribute boundary).  The delimiter is a zero-width
#: lookbehind — exactly attrfind_tolerant's ``(?<=['"\s/])`` — so a
#: quote can delimit the NEXT attribute even though it was consumed as
#: part of the previous value's token ('<div title="x"class="real">'
#: finds class; round-4 ADVICE).
_ATTR_SCAN = re.compile(
    r"(?<=[ \t\n\r\f/\"'])([^ \t\n\r\f/>=]+)"
    r"(?:[ \t\n\r\f]*=[ \t\n\r\f]*(\"[^\"]*\"|'[^']*'|[^ \t\n\r\f>]*))?"
)


def _attr_value(s: str, lo: int, hi: int, name: str) -> str | None:
    """Value of attribute ``name`` inside the tag text s[lo:hi], or None.

    Attributes are tokenized left-to-right with quoted values consumed
    atomically, so a ``name=`` substring INSIDE another attribute's
    quoted value can never match (it is part of that value's token) —
    mirroring HTMLParser's attrfind_tolerant scan.  Bare (valueless)
    attributes return None, same as the DOM's ``attrs.get``.
    """
    for m in _ATTR_SCAN.finditer(s, lo, hi):
        if m.group(1) != name and m.group(1).lower() != name:
            continue
        v = m.group(2)
        if v is None:
            return None
        if v[:1] in "\"'":
            v = v[1:-1]
        return _unescape(v) if "&" in v else v
    return None


def _part_matches(s, tag, tag_lo, tag_hi, part) -> bool:
    ptag, pclass, pid = part
    if ptag is not None and ptag != tag:
        return False
    if pclass is not None:
        cv = _attr_value(s, tag_lo, tag_hi, "class")
        if cv is None or pclass not in cv.split():
            return False
    if pid is not None and _attr_value(s, tag_lo, tag_hi, "id") != pid:
        return False
    return True


def stream_extract(
    html_text: str,
    body_selector: str | None,
    link_selectors: tuple[str, ...] = (),
) -> tuple[str | None, list[list[str]]]:
    """One pass over ``html_text``: (text of the first element matching
    ``body_selector`` — bs4-style get_text() — or None if no match,
    [hrefs of elements matching each link selector, document order]).

    Descendant-combinator selector subset, identical to :meth:`Node.select`.
    """
    sels: list[list[tuple]] = []
    if body_selector is not None:
        sels.append([_parse_simple(p) for p in body_selector.split()])
    n_links = len(link_selectors)
    for ls in link_selectors:
        sels.append([_parse_simple(p) for p in ls.split()])
    zeros = (0,) * len(sels)
    # stack of (tag, selector-prefix-counts) frames, one per open element
    stack: list[tuple] = [("", zeros)]
    hrefs: list[list[str]] = [[] for _ in range(n_links)]
    body_parts: list[str] | None = None
    body_done = False
    capture_at = 0  # stack length the body container lives at (0 = off)
    s = html_text
    pos, n = 0, len(s)
    find = s.find
    start_match, end_match = _STARTTAG_RE.match, _ENDTAG_RE.match
    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            lt = n
        if lt > pos and capture_at:
            chunk = s[pos:lt]
            body_parts.append(_unescape(chunk) if "&" in chunk else chunk)
        if lt + 1 >= n:
            break
        c = s[lt + 1]
        if c == "/":  # end tag
            m = end_match(s, lt + 2)
            if m is None:
                if capture_at:
                    body_parts.append("<")
                pos = lt + 1
                continue
            tag = m.group(1)
            if not tag.islower():
                tag = tag.lower()
            pos = m.end()
            # pop-through to the matching open tag (DOM handle_endtag)
            for i in range(len(stack) - 1, 0, -1):
                if stack[i][0] == tag:
                    del stack[i:]
                    break
            if capture_at and len(stack) < capture_at:
                capture_at, body_done = 0, True
                if not n_links:
                    return "".join(body_parts), hrefs
            continue
        if c == "!" or c == "?":
            if s.startswith("!--", lt + 1):  # <!-- comment -->
                end = find("-->", lt + 4)
                pos = n if end == -1 else end + 3
            else:  # <!doctype ...> / <? ... >
                end = find(">", lt + 2)
                pos = n if end == -1 else end + 1
            continue
        m = start_match(s, lt + 1)
        if m is None:
            # stray '<' treated as text, like HTMLParser's invalid markup
            if capture_at:
                body_parts.append("<")
            pos = lt + 1
            continue
        tag = m.group(1)
        if not tag.islower():
            tag = tag.lower()
        tag_lo = lt + 1 + len(tag)
        tag_hi = m.end() - 1  # position of '>'
        pos = m.end()
        self_closing = s[tag_hi - 1] == "/"
        parent = stack[-1][1]
        if capture_at and not n_links:
            # inside the body container with no link selectors pending:
            # selector state cannot change anything — skip the match loop
            counts = parent
        else:
            # advance selector prefixes against this element
            counts = None
            for si, parts in enumerate(sels):
                c = parent[si]
                if c < len(parts) and _part_matches(s, tag, tag_lo, tag_hi, parts[c]):
                    c += 1
                    if c == len(parts):
                        if body_selector is not None and si == 0:
                            if body_parts is None and capture_at == 0 and not body_done:
                                body_parts = []
                                capture_at = len(stack) + 1  # this element's frame
                        else:
                            href = _attr_value(s, tag_lo, tag_hi, "href")
                            if href is not None:
                                hrefs[si - (1 if body_selector is not None else 0)].append(href)
                    if counts is None:
                        counts = list(parent)
                    counts[si] = c
            # reuse the parent's tuple when no prefix advanced (the common
            # case — one tuple per *selector-relevant* element, not per tag)
            counts = parent if counts is None else tuple(counts)
        if tag not in _VOID and not self_closing:
            stack.append((tag, counts))
            if tag in _CDATA_TAGS:
                # raw text element: no tags/entities inside (HTMLParser
                # cdata mode); capture raw if inside the body container.
                # Close only where the DOM twin's case-insensitive
                # </\s*tag\s*> regex matches — never at a prefix like
                # </scriptx or a case-mismatched </SCRIPT miss
                # (round-3 ADVICE) — and handle the close inline so
                # forms like "</ script>" pop exactly as the DOM does.
                mc = _CDATA_CLOSE[tag].search(s, pos)
                if mc is None:
                    # unterminated raw text: html.parser's goahead
                    # breaks without ever emitting it — drop it too
                    pos = n
                    continue
                if capture_at:
                    body_parts.append(s[pos : mc.start()])
                pos = mc.end()
                del stack[-1:]  # the element just pushed is on top
                if capture_at and len(stack) < capture_at:
                    capture_at, body_done = 0, True
                    if not n_links:
                        return "".join(body_parts), hrefs
        elif capture_at == len(stack) + 1:
            # degenerate: body container is void/self-closing -> empty
            capture_at, body_done = 0, True
            if not n_links:
                return "".join(body_parts), hrefs
    text = "".join(body_parts) if body_parts is not None else None
    return text, hrefs
