"""Minimal real PDF text codec (X3) — stdlib only.

The reference extracts PDF text with pdfminer's page interpreter and
falls back to OCR when the text layer is empty
(``pygdpr/services/pdf_to_text_service.py:63-88``).  pdfminer is absent
in this sandbox, so this module implements the honest subset the
engine's fixtures and tests exercise end-to-end:

* :func:`encode_pdf` writes a REAL single- or multi-page PDF — catalog /
  page-tree / Type1 WinAnsi font objects, per-page Flate-compressed
  content streams using ``Tf``/``Td``/``TL`` setup and ``Tj``/``TJ``/
  ``T*`` text operators, a byte-accurate xref table and trailer.  Any
  PDF viewer or pdfminer itself can open the output.
* :func:`decode_pdf_min` reads it back the way a real extractor does:
  parse ``startxref`` → xref table → object offsets, resolve the
  trailer ``/Root`` → ``/Pages`` → ``/Kids`` page tree IN ORDER, locate
  each page's ``/Contents`` stream, inflate ``/FlateDecode`` with
  ``zlib``, and scan the content stream's tokens — ``(...)`` literal
  strings with all escape forms, ``<...>`` hex strings, ``TJ`` arrays
  (numbers are kerning, ignored), with ``T*``/``'``/``\"``/``Td``/
  ``TD`` starting new lines.  Falls back to a linear ``N 0 obj`` scan
  when the xref is damaged, like real readers do.

Scope (documented, honest): text-only PDFs with simple fonts and
byte-oriented WinAnsi/cp1252 strings — exactly what the engine's crawl
fixtures carry.  Embedded-font /ToUnicode CMaps, object streams and
encryption are out of scope; on a full cluster image the pdfminer
import-try in ``extract.decode_pdf`` handles those first.
"""

from __future__ import annotations

import re
import zlib

_MEDIA = (612, 792)  # US-Letter points
_FONT_SIZE = 11
_LEADING = 13
_MARGIN_X, _TOP_Y = 72, 720


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

_ESC = {0x28: b"\\(", 0x29: b"\\)", 0x5C: b"\\\\"}


def _pdf_string(line: str) -> bytes:
    """A literal PDF string for ``line`` in WinAnsi (cp1252) bytes:
    parens/backslash escaped, control and high bytes as octal escapes."""
    out = bytearray(b"(")
    for b in line.encode("cp1252"):
        if b in _ESC:
            out += _ESC[b]
        elif 32 <= b < 127:
            out.append(b)
        else:
            out += b"\\%03o" % b
    out += b")"
    return bytes(out)


def _content_stream(lines: list[str]) -> bytes:
    """One page's content: set font/leading, position at the top-left,
    then one text line per ``Tj`` (even lines) or split ``TJ`` array
    with a kern number (odd lines — exercises the array operator),
    advancing with ``T*`` between lines."""
    ops = [
        b"BT",
        b"/F1 %d Tf" % _FONT_SIZE,
        b"%d TL" % _LEADING,
        b"%d %d Td" % (_MARGIN_X, _TOP_Y),
    ]
    for idx, line in enumerate(lines):
        if idx:
            ops.append(b"T*")
        if idx % 2 and len(line) > 2:
            cut = len(line) // 2
            ops.append(
                b"[" + _pdf_string(line[:cut]) + b" -12 "
                + _pdf_string(line[cut:]) + b"] TJ"
            )
        else:
            ops.append(_pdf_string(line) + b" Tj")
    ops.append(b"ET")
    return b"\n".join(ops)


def encode_pdf(text: str, lines_per_page: int = 48, compress: bool = True) -> bytes:
    """Serialize ``text`` into a minimal real PDF; round-trips exactly
    through :func:`decode_pdf_min` (``tests/test_decoders.py``)."""
    lines = text.split("\n")
    pages = [lines[i : i + lines_per_page] for i in range(0, len(lines), lines_per_page)]
    if not pages:
        pages = [[""]]

    objects: list[bytes] = []  # body of object i+1

    n_fixed = 3  # catalog, pages, font
    kid_refs = b" ".join(
        b"%d 0 R" % (n_fixed + 1 + 2 * p) for p in range(len(pages))
    )
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        b"<< /Type /Pages /Kids [" + kid_refs + b"] /Count %d >>" % len(pages)
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    for p, page_lines in enumerate(pages):
        page_no = n_fixed + 1 + 2 * p
        objects.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 3 0 R >> >>"
            b" /Contents %d 0 R >>" % (*_MEDIA, page_no + 1)
        )
        data = _content_stream(page_lines)
        if compress:
            data = zlib.compress(data)
            head = b"<< /Length %d /Filter /FlateDecode >>" % len(data)
        else:
            head = b"<< /Length %d >>" % len(data)
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free head
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += b"xref\n0 %d\n" % (len(objects) + 1)
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objects) + 1, xref_at)
    )
    return bytes(buf)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_REF_RE = re.compile(rb"/%s\s+(\d+)\s+\d+\s+R")
_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")


def _xref_offsets(data: bytes) -> dict[int, int]:
    """Object byte offsets via the trailer's startxref; classic xref
    tables only (the subset the encoder writes).  Raises on damage —
    the caller falls back to a linear object scan."""
    tail = data[-256:]
    m = None
    for m in re.finditer(rb"startxref\s+(\d+)", tail):
        pass  # last startxref wins (incremental updates)
    if m is None:
        raise ValueError("no startxref")
    pos = int(m.group(1))
    if not data.startswith(b"xref", pos):
        raise ValueError("startxref does not point at an xref table")
    offsets: dict[int, int] = {}
    pos += 4
    while True:
        mh = re.match(rb"\s*(\d+)\s+(\d+)\s*\n", data[pos : pos + 64])
        if mh is None:
            break  # 'trailer'
        first, count = int(mh.group(1)), int(mh.group(2))
        pos += mh.end()
        for k in range(count):
            ent = data[pos : pos + 20]
            if ent[17:18] == b"n":
                offsets[first + k] = int(ent[:10])
            pos += 20
    if not offsets:
        raise ValueError("empty xref")
    return offsets


def _scan_offsets(data: bytes) -> dict[int, int]:
    """Fallback: linear scan for ``N G obj`` headers (damaged xref)."""
    return {int(m.group(1)): m.start() for m in _OBJ_RE.finditer(data)}


def _object_at(data: bytes, off: int) -> bytes:
    """Raw bytes of the object starting at ``off`` (through endobj).

    The ``endobj`` token can occur BY CHANCE inside stream data (either
    literally in an uncompressed content stream or as a byte coincidence
    in Flate output — round-4 ADVICE), so when the object carries a
    /Length-delimited stream the token search starts only AFTER the
    stream body, mirroring how a real tokenizer skips the data region.
    Indirect /Length references (``5 0 R``) are not emitted by
    :func:`encode_pdf`; if one appears the skip is waived and the search
    degrades to the pre-fix first-token behavior."""
    m = _OBJ_RE.match(data, off)
    if m is None:
        # offsets from damaged xrefs may point at the preceding newline
        m = _OBJ_RE.search(data, off, off + 32)
        if m is None:
            raise ValueError(f"no object at offset {off}")
    start = m.end()
    search_from = start
    s_at = data.find(b"stream", start)
    if s_at != -1:
        e0 = data.find(b"endobj", start)
        # 'stream' before the first 'endobj' candidate => this object's
        # own stream; anything after belongs to a later object
        if e0 == -1 or s_at < e0:
            mlen = re.search(rb"/Length\s+(\d+)(?!\s+\d+\s+R)", data[start:s_at])
            if mlen:
                body_at = s_at + len(b"stream")
                if data[body_at : body_at + 2] == b"\r\n":
                    body_at += 2
                elif data[body_at : body_at + 1] == b"\n":
                    body_at += 1
                search_from = body_at + int(mlen.group(1))
    end = data.find(b"endobj", search_from)
    return data[start : end if end != -1 else len(data)]


def _dict_ref(obj: bytes, key: str) -> int | None:
    m = re.search(_REF_RE.pattern % key.encode(), obj)
    return int(m.group(1)) if m else None


def _kids(obj: bytes) -> list[int]:
    m = re.search(rb"/Kids\s*\[([^\]]*)\]", obj)
    if m is None:
        return []
    return [int(r.group(1)) for r in re.finditer(rb"(\d+)\s+\d+\s+R", m.group(1))]


def _stream_data(obj: bytes) -> bytes:
    """The stream body of ``obj`` — /Length-delimited, inflated when
    /FlateDecode."""
    at = obj.find(b"stream")
    if at == -1:
        return b""
    body_at = at + len(b"stream")
    if obj[body_at : body_at + 2] == b"\r\n":
        body_at += 2
    elif obj[body_at : body_at + 1] == b"\n":
        body_at += 1
    mlen = re.search(rb"/Length\s+(\d+)", obj[:at])
    if mlen:
        raw = obj[body_at : body_at + int(mlen.group(1))]
    else:  # tolerate a missing /Length: cut at endstream
        end = obj.find(b"endstream", body_at)
        raw = obj[body_at : end if end != -1 else len(obj)]
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode", obj[:at]):
        raw = zlib.decompress(raw)
    return raw


_OCT_ESC = {ord("n"): "\n", ord("r"): "\r", ord("t"): "\t", ord("b"): "\b", ord("f"): "\f"}


def _read_string(s: bytes, i: int) -> tuple[str, int]:
    """Literal string starting at s[i] == '(' -> (decoded text, next i).
    Handles nested parens, octal escapes, named escapes and
    line-continuation backslashes, decoding bytes as cp1252."""
    out = bytearray()
    depth, i = 1, i + 1
    n = len(s)
    while i < n and depth:
        b = s[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c = s[i]
            if 0x30 <= c <= 0x37:  # octal, up to 3 digits
                val, k = 0, 0
                while k < 3 and i < n and 0x30 <= s[i] <= 0x37:
                    val = val * 8 + (s[i] - 0x30)
                    i += 1
                    k += 1
                out.append(val & 0xFF)
                continue
            ch = _OCT_ESC.get(c)
            if ch is not None:
                out += ch.encode("latin-1")
            elif c in (0x0A, 0x0D):  # line continuation
                if c == 0x0D and i + 1 < n and s[i + 1] == 0x0A:
                    i += 1
            else:
                out.append(c)  # \( \) \\ and unknown escapes
            i += 1
            continue
        if b == 0x28:
            depth += 1
        elif b == 0x29:
            depth -= 1
            if depth == 0:
                i += 1
                break
        out.append(b)
        i += 1
    return out.decode("cp1252", errors="replace"), i


def _read_hex_string(s: bytes, i: int) -> tuple[str, int]:
    end = s.find(b">", i + 1)
    if end == -1:
        end = len(s)
    hx = re.sub(rb"\s+", b"", s[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")).decode("cp1252", "replace"), end + 1


def _page_text(content: bytes) -> str:
    """Scan one content stream's tokens; returns the page text with one
    ``\\n`` per line-advance operator (``T*``, ``'``, ``\"``, and
    ``Td``/``TD`` once text flow has begun)."""
    lines: list[str] = []
    cur: list[str] = []
    pending: list[str] = []  # strings seen since the last operator
    started = False  # any text op on this page yet

    def newline():
        nonlocal started
        if started:
            lines.append("".join(cur))
            cur.clear()

    i, n = 0, len(content)
    while i < n:
        b = content[i]
        if b in b" \t\r\n\0[]":
            i += 1
            continue
        if b == 0x28:  # (
            txt, i = _read_string(content, i)
            pending.append(txt)
            continue
        if b == 0x3C:  # <
            if content[i : i + 2] == b"<<":  # dict (inline image props etc.)
                i += 2
                continue
            txt, i = _read_hex_string(content, i)
            pending.append(txt)
            continue
        if b == 0x2F:  # /name
            m = re.match(rb"/[^\s\[\]()<>/]*", content[i:])
            i += m.end()
            continue
        if b in b"0123456789+-.":
            m = _NUM_RE.match(content, i)
            i = m.end() if m else i + 1
            continue
        m = re.match(rb"[A-Za-z'\"*]+", content[i:])
        if m is None:
            i += 1
            continue
        op = m.group(0)
        i += m.end()
        if op in (b"Tj", b"TJ"):
            started = True
            cur.extend(pending)
        elif op == b"'":
            newline()
            started = True
            cur.extend(pending)
        elif op == b'"':
            newline()
            started = True
            cur.extend(pending)
        elif op == b"T*":
            newline()
        elif op in (b"Td", b"TD"):
            newline()
        elif op == b"ET":
            pass
        pending.clear()
    if started:
        lines.append("".join(cur))
    return "\n".join(lines)


def decode_pdf_min(data: bytes) -> str:
    """Extract text from a minimal real PDF: xref walk → page tree in
    /Kids order → per-page content streams → token scan.  Pages joined
    with ``\\n`` (the page boundary the encoder writes)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF")
    try:
        offsets = _xref_offsets(data)
    except (ValueError, IndexError):
        offsets = _scan_offsets(data)
    if not offsets:
        raise ValueError("no objects found")

    def obj(num: int) -> bytes:
        return _object_at(data, offsets[num])

    # trailer /Root (search the whole tail region — also covers the
    # scan-fallback case where no trailer dict offset is known)
    mroot = None
    for mroot in re.finditer(rb"/Root\s+(\d+)\s+\d+\s+R", data):
        pass
    if mroot is None:
        raise ValueError("no /Root")
    pages_ref = _dict_ref(obj(int(mroot.group(1))), "Pages")
    if pages_ref is None:
        raise ValueError("catalog has no /Pages")

    page_nums: list[int] = []

    def walk(num: int):
        o = obj(num)
        kids = _kids(o)
        if kids and (b"/Type /Pages" in o or b"/Type/Pages" in o):
            for k in kids:
                walk(k)
        else:
            page_nums.append(num)

    walk(pages_ref)

    texts: list[str] = []
    for pn in page_nums:
        o = obj(pn)
        refs: list[int] = []
        mc = re.search(rb"/Contents\s*\[([^\]]*)\]", o)
        if mc:
            refs = [int(r.group(1)) for r in re.finditer(rb"(\d+)\s+\d+\s+R", mc.group(1))]
        else:
            r = _dict_ref(o, "Contents")
            if r is not None:
                refs = [r]
        content = b"\n".join(_stream_data(obj(r)) for r in refs)
        texts.append(_page_text(content))
    return "\n".join(texts)
