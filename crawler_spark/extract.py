"""Per-authority extraction registry + the vectorized fetch/extract stage.

The reference implements 29 scraper classes (~130 ``get_docs_*`` methods)
that all follow one template — ``# s0. Pagination / # s1. Results /
# s2. Documents`` (``pygdpr/models/dpa/austria/__init__.py:70,85,97``).
Here per-authority behavior is **data** (REGISTRY below: selectors, date
format, pagination kind, retention predicate, politeness delay), and one
engine executes it (SURVEY.md §7.0).

DOM shapes reproduced (citations into /root/reference):

- ``austria``  — table rows with indexed cells (title=2, date=4 in
  ``%d.%m.%Y``), next-link pagination
  (``pygdpr/models/dpa/austria/__init__.py:81-111,27-53``).
- ``ireland``  — ``div.view-content`` item list, ordinal dates
  ("21st June 2021"), all-pages pagination, ``time.sleep(5)`` politeness
  (``pygdpr/models/dpa/ireland/__init__.py:29-57,136-180,144``).
- ``denmark``  — ``div.items div.item`` with ``%d-%m-%Y`` dates and
  duplicate titles hitting the ``hash+'-'+date`` rule
  (``pygdpr/models/dpa/denmark/__init__.py:109-140``).
- ``finland``  — ``ul.results li`` listings whose doc pages hold depth-2
  file links (``pygdpr/models/dpa/finland/__init__.py:51-199``).
- ``italy``    — computed pagination ``range(1, n+1)`` from the last page
  number (``pygdpr/models/dpa/italy/__init__.py:28-95``).

File decoding (X3-X6): pdfminer/docx2txt/striprtf are not in this
sandbox, so each decoder first import-tries the real library and
otherwise decodes the deterministic FAKE container the fixture generator
emits (header + UTF-8 payload).  The Spark-side plumbing — binary
column, Arrow batches, one ``mapInPandas`` pass over html — is real and
is what the engine tests; the library call is the swappable leaf.
"""

from __future__ import annotations

import io
import re
import zipfile
from datetime import date, datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import types as T

from .htmlparse import parse_html
from .urls import canonicalize_one

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

REGISTRY: dict[str, dict] = {
    "austria": {
        "lang": "de",
        "listing_item_selector": "table.bocListTable tr.bocListDataRow",
        "item_title_selector": "a.title",
        "item_date_selector": "span.date",
        "item_link_selector": "a.title",
        "date_format": "%d.%m.%Y",
        "pagination": "next",  # F1: ul.Pages next-link
        "pagination_selector": "ul.Pages li.next a",
        "retention": "window",  # P1
        "body_selector": "div.document-body",
        "body_strip": None,
        "depth2_selector": None,
        "politeness_delay_s": 0.0,
    },
    "ireland": {
        "lang": "en",
        "listing_item_selector": "div.view-content li article",
        "item_title_selector": "h2 a",
        "item_date_selector": "p.date",
        "item_link_selector": "h2 a",
        "date_format": "ordinal %d %B %Y",  # X7 ordinal-suffix strip
        "pagination": "all",  # F2: collect every pager link
        "pagination_selector": "nav.pager a",
        "retention": "year2018",  # P2
        "body_selector": "div.field--name-body",
        "body_strip": "strip",
        "depth2_selector": None,
        "politeness_delay_s": 5.0,  # R1
    },
    "denmark": {
        "lang": "da",
        "listing_item_selector": "div.items div.item",
        "item_title_selector": "a.item-title",
        "item_date_selector": "span.date",
        "item_link_selector": "a.item-title",
        "date_format": "%d-%m-%Y",
        "pagination": "next",
        "pagination_selector": "ul.Pages li.next a",
        "retention": "year2018",
        "body_selector": "div.news-page",
        "body_strip": "lstrip",  # X2: .lstrip() variant
        "depth2_selector": None,
        "politeness_delay_s": 0.0,
    },
    "finland": {
        "lang": "fi",
        "listing_item_selector": "ul.results li.list__item",
        "item_title_selector": "a.result-link",
        "item_date_selector": "span.date",
        "item_link_selector": "a.result-link",
        "date_format": "%d.%m.%Y",
        "pagination": "next",
        "pagination_selector": "ul.Pages li.next a",
        "retention": "year2018",
        "body_selector": "div.news-page",
        "body_strip": None,
        "depth2_selector": "div.news-page p a",  # F6 depth-2 file links
        "politeness_delay_s": 0.0,
    },
    "italy": {
        "lang": "it",
        "listing_item_selector": "div.post",
        "item_title_selector": "h3 a",
        "item_date_selector": "span.date",
        "item_link_selector": "h3 a",
        "date_format": "%Y-%m-%d",
        "pagination": "computed",  # F3: synthesize range(2, n+1)
        "pagination_selector": "ul.pagination li.page-item a",
        "retention": "window",
        "body_selector": "div.post-content",
        "body_strip": None,
        "depth2_selector": None,
        "politeness_delay_s": 0.0,
    },
}

GDPR_DATE = date(2018, 5, 25)  # pygdpr/policies/gdpr_policy.py:3-5


def cfg_of(authority: str) -> dict:
    """Registry lookup that resolves clone names (``austria_7`` ->
    ``austria``) so wide synthetic frontiers (bench fixtures with
    hundreds of hosts) reuse the 5 base behavior profiles."""
    if authority not in REGISTRY and "_" in authority:
        head, _, tail = authority.rpartition("_")
        if tail.isdigit() and head in REGISTRY:
            return REGISTRY[head]
    return REGISTRY[authority]

_ORDINAL_RE = re.compile(r"(\d+)(st|nd|rd|th)")


def parse_date_str(authority: str, s: str) -> date | None:
    """X7: per-authority date parsing (6 fixed formats in the reference;
    ordinal strip per pygdpr/models/dpa/ireland/__init__.py:150-159)."""
    if s is None:
        return None
    s = s.strip()
    fmt = cfg_of(authority)["date_format"]
    if fmt.startswith("ordinal "):
        s = _ORDINAL_RE.sub(r"\1", s)
        fmt = fmt[len("ordinal "):]
    try:
        return datetime.strptime(s, fmt).date()
    except ValueError:
        return None


def retained(authority: str, d: date | None, as_of: date) -> bool:
    """P1/P2: retention predicate.

    - 'window': symmetric window today ± (today - GDPR_DATE)
      (pygdpr/specifications/should_retain_document_specification.py:4-8)
    - 'year2018': ``int(year) < 2018 -> skip``
      (pygdpr/models/dpa/denmark/__init__.py:367)
    """
    if d is None:
        return False
    if cfg_of(authority)["retention"] == "year2018":
        return d.year >= 2018
    delta = as_of - GDPR_DATE
    return (as_of - delta) <= d <= (as_of + delta)


# ---------------------------------------------------------------------------
# pure parse functions (shared by the Spark stage AND the sequential oracle,
# so byte-identity is tested on the *dataflow*, not the parser)
# ---------------------------------------------------------------------------


def parse_listing(authority: str, page_url: str, html_text: str) -> dict:
    """Parse a depth-0 listing page.

    Returns {"items": [(title, date_str, abs_href)], "next_pages":
    [(abs_href, page_no|None)]} in DOM document order (the order the
    reference's for-loops see — SURVEY.md §3.3).
    """
    cfg = cfg_of(authority)
    root = parse_html(html_text)
    items: list[tuple[str, str, str]] = []
    for el in root.select(cfg["listing_item_selector"]):
        a = el.select_one(cfg["item_title_selector"])
        d = el.select_one(cfg["item_date_selector"])
        if a is None or d is None:
            continue  # reference asserts selector hits; we skip+log
        href = a.get("href")
        if not href:
            continue
        items.append(
            (a.get_text(), d.get_text().strip(), canonicalize_one(href, page_url))
        )
    next_pages: list[tuple[str, int | None]] = []
    kind = cfg["pagination"]
    if kind == "next":
        nxt = root.select_one(cfg["pagination_selector"])
        if nxt is not None and nxt.get("href"):
            next_pages.append((canonicalize_one(nxt.get("href"), page_url), None))
    elif kind in ("all", "computed"):
        # 'all' collects every pager link at once; 'computed' reads the
        # last page number then synthesizes the URLs — by fixture
        # construction the pager carries hrefs for every page, so both
        # reduce to reading the pager links with their page numbers.
        for a in root.select(cfg["pagination_selector"]):
            href, txt = a.get("href"), a.get_text().strip()
            if href and txt.isdigit():
                next_pages.append((canonicalize_one(href, page_url), int(txt)))
    return {"items": items, "next_pages": next_pages}


def parse_docpage(authority: str, page_url: str, html_text: str) -> dict:
    """Parse a depth-1 document page -> extracted text + depth-2 links.

    Text = bs4-style ``get_text()`` of the per-authority body container
    with the reference's lstrip/strip variant (X2 citations).
    """
    cfg = cfg_of(authority)
    root = parse_html(html_text)
    body = root.select_one(cfg["body_selector"])
    text = body.get_text() if body is not None else root.get_text()
    if cfg["body_strip"] == "strip":
        text = text.strip()
    elif cfg["body_strip"] == "lstrip":
        text = text.lstrip()
    file_links: list[str] = []
    if cfg["depth2_selector"]:
        for a in root.select(cfg["depth2_selector"]):
            href = a.get("href")
            if href and (href.endswith(".pdf") or "finlex" in href):
                # pygdpr/models/dpa/finland/__init__.py:113-199
                file_links.append(canonicalize_one(href, page_url))
    return {"text": text, "file_links": file_links}


# -- file decoders (X3-X6) ---------------------------------------------------

FAKE_PDF_HEADER = b"%PDF-FAKE1.4\n%%TEXT\n"
FAKE_DOCX_HEADER = b"PK-FAKEDOCX\n"


def decode_pdf(content: bytes) -> str:
    """X3: pdfminer -> OCR fallback in the reference
    (pygdpr/services/pdf_to_text_service.py:63-88).  Here: import-try
    pdfminer, else decode the deterministic fake container."""
    try:  # pragma: no cover
        from pdfminer.high_level import extract_text as _pdf_extract

        return _pdf_extract(io.BytesIO(content)).strip()
    except ImportError:
        pass
    if content.startswith(FAKE_PDF_HEADER):
        return content[len(FAKE_PDF_HEADER):].decode("utf-8")
    raise NotImplementedError("real PDF decoding requires pdfminer (not in sandbox)")


def decode_docx(content: bytes) -> str:
    """X4: docx2txt path (pygdpr/models/dpa/united_kingdom/__init__.py:468-486)."""
    try:  # pragma: no cover
        import docx2txt  # noqa: F401

        raise NotImplementedError("wire docx2txt here on a full image")
    except ImportError:
        pass
    if content.startswith(FAKE_DOCX_HEADER):
        return content[len(FAKE_DOCX_HEADER):].decode("utf-8")
    raise NotImplementedError("real DOCX decoding requires docx2txt")


def decode_rtf(content: bytes) -> str:
    """X5: striprtf path (pygdpr/models/dpa/france/__init__.py:16);
    fallback handles the plain ``{\\rtf1 ...}`` fixtures emit."""
    s = content.decode("utf-8", errors="replace")
    m = re.match(r"^\{\\rtf1\s?(.*)\}\s*$", s, re.S)
    if m:
        return m.group(1).replace("\\par", "\n")
    raise NotImplementedError("real RTF decoding requires striprtf")


def decode_zip(content: bytes) -> str:
    """X6: Belgium zip-of-html explode
    (pygdpr/models/dpa/belgium/__init__.py:655-661) — real zipfile, member
    texts joined in name order."""
    out = []
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        for name in sorted(z.namelist()):
            out.append(parse_html(z.read(name).decode("utf-8")).get_text())
    return "\n".join(out)


def decode_file(url: str, content: bytes) -> str:
    if url.endswith(".pdf"):
        return decode_pdf(content)
    if url.endswith(".docx"):
        return decode_docx(content)
    if url.endswith(".rtf"):
        return decode_rtf(content)
    if url.endswith(".zip"):
        return decode_zip(content)
    return decode_pdf(content)  # finlex-style extensionless file links


# ---------------------------------------------------------------------------
# seq arithmetic — the deterministic crawl-order key (SURVEY.md §4.3)
# ---------------------------------------------------------------------------
# seq = ((seed_idx << PAGE_BITS | page) << ITEM_BITS | item) << LINK_BITS | link
# Pure function of parent seq + child index -> replayable, independent of
# partitioning and round boundaries (never monotonically_increasing_id).

LINK_BITS, ITEM_BITS, PAGE_BITS = 6, 12, 14
MAX_LINK, MAX_ITEM, MAX_PAGE = (1 << LINK_BITS) - 1, (1 << ITEM_BITS) - 1, (1 << PAGE_BITS) - 1


def seq_seed(seed_idx: int, page_no: int = 1) -> int:
    assert 0 <= page_no <= MAX_PAGE
    return (((seed_idx << PAGE_BITS) | page_no) << ITEM_BITS) << LINK_BITS


def seq_child_page(parent_seq: int, page_no: int | None) -> int:
    """Next/explicit listing page: bump or set the page field."""
    base = parent_seq >> (ITEM_BITS + LINK_BITS)
    seed_idx, cur_page = base >> PAGE_BITS, base & MAX_PAGE
    new_page = cur_page + 1 if page_no is None else page_no
    assert new_page <= MAX_PAGE
    return seq_seed(seed_idx, new_page)


def seq_child_item(parent_seq: int, item_idx: int) -> int:
    assert 1 <= item_idx <= MAX_ITEM
    return parent_seq | (item_idx << LINK_BITS)


def seq_child_link(parent_seq: int, link_idx: int) -> int:
    assert 1 <= link_idx <= MAX_LINK
    return parent_seq | link_idx


# ---------------------------------------------------------------------------
# the Spark stage: one mapInPandas over (frontier ⋈ pages) rows
# ---------------------------------------------------------------------------

EXTRACT_OUT = T.StructType(
    [
        T.StructField("out_kind", T.StringType(), False),  # child|doc|log
        T.StructField("url", T.StringType(), False),
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("authority", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("release_date", T.DateType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        # final/raw doc keys riding along from the frontier row (decided
        # at admission time; null on depth-0/child rows)
        T.StructField("doc_hash", T.StringType(), True),
        T.StructField("raw_hash", T.StringType(), True),
    ]
)


def make_fetch_extract(as_of: date, store_content: bool = True):
    """Build the mapInPandas function for one crawl round.

    Input rows: scheduled frontier rows already joined to ``pages`` (so
    ``html`` comes straight off the pages scan — it is never shuffled;
    the join key is the url).  Emits 'child' rows (frontier expansion,
    seq pre-assigned by the pure arithmetic above), 'doc' rows (extracted
    documents) and 'log' rows (misses) — one pass over html (SURVEY.md
    §4.4).

    ``store_content=False`` emits ``content=None`` *inside* the UDF so
    the payload bytes never cross the Python→JVM Arrow boundary at all
    (by-reference document layout: raw bytes stay addressable in the
    pages table by url).
    """

    cols = [f.name for f in EXTRACT_OUT.fields]
    FLUSH_ROWS = 512  # bound worker memory: stream output, don't batch it

    def fetch_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for r in pdf.itertuples(index=False):
                if len(rows) >= FLUSH_ROWS:
                    yield pd.DataFrame(rows, columns=cols)
                    rows = []
                base = {
                    "parent_url": r.url,
                    "authority": r.authority,
                    "doc_type": r.doc_type,
                    "priority": r.priority,
                    "lang": r.lang,
                    "title": None,
                    "release_date": None,
                    "text": None,
                    "content": None,
                    "doc_hash": getattr(r, "doc_hash", None),
                    "raw_hash": getattr(r, "raw_hash", None),
                }
                if r.html is None:  # P7: swallowed HTTP miss
                    rows.append(
                        base
                        | {
                            "out_kind": "log",
                            "url": r.url,
                            "depth": int(r.depth),
                            "seq": int(r.seq),
                            "status": "miss",
                        }
                    )
                    continue
                html_bytes = bytes(r.html)
                if int(r.depth) == 0:
                    parsed = parse_listing(
                        r.authority, r.url, html_bytes.decode("utf-8")
                    )
                    for href, page_no in parsed["next_pages"]:
                        rows.append(
                            base
                            | {
                                "out_kind": "child",
                                "url": href,
                                "depth": 0,
                                "seq": seq_child_page(int(r.seq), page_no),
                                "status": "ok",
                            }
                        )
                    for i, (title, date_str, href) in enumerate(
                        parsed["items"], start=1
                    ):
                        d = parse_date_str(r.authority, date_str)
                        if not retained(r.authority, d, as_of):
                            continue  # P1/P2 before any fetch (§4 pushdown)
                        rows.append(
                            base
                            | {
                                "out_kind": "child",
                                "url": href,
                                "depth": 1,
                                "seq": seq_child_item(int(r.seq), i),
                                "title": title,
                                "release_date": d,
                                "status": "ok",
                            }
                        )
                    rows.append(
                        base
                        | {
                            "out_kind": "log",
                            "url": r.url,
                            "depth": 0,
                            "seq": int(r.seq),
                            "status": "ok",
                        }
                    )
                elif int(r.depth) == 1:
                    parsed = parse_docpage(
                        r.authority, r.url, html_bytes.decode("utf-8")
                    )
                    for j, href in enumerate(parsed["file_links"], start=1):
                        rows.append(
                            base
                            | {
                                "out_kind": "child",
                                "url": href,
                                "depth": 2,
                                "seq": seq_child_link(int(r.seq), j),
                                "title": r.title,
                                "release_date": r.release_date,
                                "status": "ok",
                            }
                        )
                    if not parsed["file_links"]:
                        rows.append(
                            base
                            | {
                                "out_kind": "doc",
                                "url": r.url,
                                "depth": 1,
                                "seq": int(r.seq),
                                "title": r.title,
                                "release_date": r.release_date,
                                "text": parsed["text"],
                                "content": html_bytes if store_content else None,
                                "status": "ok",
                            }
                        )
                    else:
                        # marker: docpage fetched OK but its payload lives
                        # in depth-2 files — the seen-set registers the
                        # key at this point (fixtures.sequential_oracle)
                        rows.append(
                            base
                            | {
                                "out_kind": "log",
                                "url": r.url,
                                "depth": 1,
                                "seq": int(r.seq),
                                "title": r.title,
                                "release_date": r.release_date,
                                "status": "ok",
                            }
                        )
                else:  # depth 2: binary file
                    try:
                        text = decode_file(r.url, html_bytes)
                        status = "ok"
                    except NotImplementedError:
                        text, status = None, "decode_unsupported"
                    rows.append(
                        base
                        | {
                            "out_kind": "doc" if status == "ok" else "log",
                            "url": r.url,
                            "depth": 2,
                            "seq": int(r.seq),
                            "title": r.title,
                            "release_date": r.release_date,
                            "text": text,
                            "content": html_bytes if store_content else None,
                            "status": status,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows, columns=cols)

    return fetch_extract
