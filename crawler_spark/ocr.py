"""Deterministic OCR leaf for scanned (image-only) PDFs.

The reference OCRs PDFs whose text layer is empty by rendering pages
with pdf2image and reading them with pytesseract
(pygdpr/services/pdf_to_text_service.py:26-60).  Neither library is in
this sandbox, so :func:`crawler_spark.extract.ocr_pdf` import-tries
them first and falls back here — the same pattern the stdlib PDF codec
uses for the pdfminer gap:

- **fixtures** render text into a page raster with a fixed-metric 5x7
  bitmap font and compress it with the engine's own baseline JPEG
  codec (:func:`crawler_spark.multimodal.encode_jpeg`), embedded as a
  ``/DCTDecode`` image XObject in a real PDF with NO text operators —
  so ``decode_pdf``'s empty-text-layer dispatch genuinely fires;
- **this module** walks the PDF's image XObjects, pixel-decodes each
  JPEG (:func:`multimodal.decode_jpeg_pixels`) and reads the raster
  back by per-cell L1 template match against the same font — a
  deterministic stand-in for tesseract: the match must survive real
  JPEG quantization noise, not byte-copy the input.

The glyph set is uppercase (scanners lose information; the fixture
payloads are composed in this charset).  Cells are matched by nearest
template with ties broken in charset order, so the output is exactly
reproducible — which is what lets a scanned document flow through the
crawl with the same byte-identity guarantee as every other decoder.
"""

from __future__ import annotations

import re

#: 5x7 matrix font (classic LED-display shapes), one int per row,
#: bit 4 = leftmost column.  Any distinct bitmaps would satisfy the
#: matcher; legible shapes keep the rasters inspectable.
FONT: dict[str, tuple[int, ...]] = {
    "A": (0x0E, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "B": (0x1E, 0x11, 0x11, 0x1E, 0x11, 0x11, 0x1E),
    "C": (0x0E, 0x11, 0x10, 0x10, 0x10, 0x11, 0x0E),
    "D": (0x1E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x1E),
    "E": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x1F),
    "F": (0x1F, 0x10, 0x10, 0x1E, 0x10, 0x10, 0x10),
    "G": (0x0E, 0x11, 0x10, 0x17, 0x11, 0x11, 0x0F),
    "H": (0x11, 0x11, 0x11, 0x1F, 0x11, 0x11, 0x11),
    "I": (0x0E, 0x04, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "J": (0x07, 0x02, 0x02, 0x02, 0x02, 0x12, 0x0C),
    "K": (0x11, 0x12, 0x14, 0x18, 0x14, 0x12, 0x11),
    "L": (0x10, 0x10, 0x10, 0x10, 0x10, 0x10, 0x1F),
    "M": (0x11, 0x1B, 0x15, 0x15, 0x11, 0x11, 0x11),
    "N": (0x11, 0x19, 0x15, 0x13, 0x11, 0x11, 0x11),
    "O": (0x0E, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "P": (0x1E, 0x11, 0x11, 0x1E, 0x10, 0x10, 0x10),
    "Q": (0x0E, 0x11, 0x11, 0x11, 0x15, 0x12, 0x0D),
    "R": (0x1E, 0x11, 0x11, 0x1E, 0x14, 0x12, 0x11),
    "S": (0x0F, 0x10, 0x10, 0x0E, 0x01, 0x01, 0x1E),
    "T": (0x1F, 0x04, 0x04, 0x04, 0x04, 0x04, 0x04),
    "U": (0x11, 0x11, 0x11, 0x11, 0x11, 0x11, 0x0E),
    "V": (0x11, 0x11, 0x11, 0x11, 0x11, 0x0A, 0x04),
    "W": (0x11, 0x11, 0x11, 0x15, 0x15, 0x1B, 0x11),
    "X": (0x11, 0x11, 0x0A, 0x04, 0x0A, 0x11, 0x11),
    "Y": (0x11, 0x11, 0x0A, 0x04, 0x04, 0x04, 0x04),
    "Z": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x10, 0x1F),
    "0": (0x0E, 0x11, 0x13, 0x15, 0x19, 0x11, 0x0E),
    "1": (0x04, 0x0C, 0x04, 0x04, 0x04, 0x04, 0x0E),
    "2": (0x0E, 0x11, 0x01, 0x06, 0x08, 0x10, 0x1F),
    "3": (0x0E, 0x11, 0x01, 0x06, 0x01, 0x11, 0x0E),
    "4": (0x02, 0x06, 0x0A, 0x12, 0x1F, 0x02, 0x02),
    "5": (0x1F, 0x10, 0x1E, 0x01, 0x01, 0x11, 0x0E),
    "6": (0x06, 0x08, 0x10, 0x1E, 0x11, 0x11, 0x0E),
    "7": (0x1F, 0x01, 0x02, 0x04, 0x08, 0x08, 0x08),
    "8": (0x0E, 0x11, 0x11, 0x0E, 0x11, 0x11, 0x0E),
    "9": (0x0E, 0x11, 0x11, 0x0F, 0x01, 0x02, 0x0C),
    " ": (0, 0, 0, 0, 0, 0, 0),
    ".": (0, 0, 0, 0, 0, 0x0C, 0x0C),
    ",": (0, 0, 0, 0, 0x0C, 0x04, 0x08),
    "-": (0, 0, 0, 0x1F, 0, 0, 0),
    "_": (0, 0, 0, 0, 0, 0, 0x1F),
    "(": (0x02, 0x04, 0x08, 0x08, 0x08, 0x04, 0x02),
    ")": (0x08, 0x04, 0x02, 0x02, 0x02, 0x04, 0x08),
    "/": (0x01, 0x01, 0x02, 0x04, 0x08, 0x10, 0x10),
    ":": (0, 0x0C, 0x0C, 0, 0x0C, 0x0C, 0),
}
#: charset in deterministic match/tie-break order
CHARSET = tuple(FONT)
GLYPH_W, GLYPH_H = 5, 7
#: one blank column/row of padding per cell keeps JPEG block ringing
#: from one glyph out of its neighbor's cell
CELL_W, CELL_H = GLYPH_W + 1, GLYPH_H + 1
#: raster scale: 2 raster px per font px — enough L1 margin between
#: glyph templates (>=1000 per differing font pixel) to dominate the
#: codec's quantization noise (~6/px average at quant step 8)
SCALE = 2
INK, BG = 0, 255


def render_text_raster(text: str, scale: int = SCALE) -> list[list[int]]:
    """Rows of 0-255 luma: ``text`` stamped in the fixed bitmap font.
    Characters outside the charset render as '-' (deterministic; the
    fixture payloads never need it)."""
    lines = text.split("\n")
    n_cols = max(len(ln) for ln in lines)
    w, h = n_cols * CELL_W * scale, len(lines) * CELL_H * scale
    rows = [[BG] * w for _ in range(h)]
    for li, ln in enumerate(lines):
        for ci, ch in enumerate(ln):
            glyph = FONT.get(ch, FONT["-"])
            x0 = ci * CELL_W * scale
            y0 = li * CELL_H * scale
            for gy in range(GLYPH_H):
                bits = glyph[gy]
                for gx in range(GLYPH_W):
                    if bits & (1 << (GLYPH_W - 1 - gx)):
                        for sy in range(scale):
                            r = rows[y0 + gy * scale + sy]
                            for sx in range(scale):
                                r[x0 + gx * scale + sx] = INK
    return rows


def match_raster(rows: list[list[int]], scale: int = SCALE) -> str:
    """Read a rendered raster back: fixed-metric grid segmentation,
    per-cell L1 nearest-template match (numpy-vectorized), trailing
    blank cells/lines stripped.  Deterministic: ties break in CHARSET
    order."""
    import numpy as np

    img = np.asarray(rows, dtype=np.int16)
    h, w = img.shape
    ch, cw = CELL_H * scale, CELL_W * scale
    n_rows, n_cols = h // ch, w // cw
    if n_rows == 0 or n_cols == 0:
        return ""
    # (n_rows*n_cols, cell_px) cell matrix in reading order
    cells = (
        img[: n_rows * ch, : n_cols * cw]
        .reshape(n_rows, ch, n_cols, cw)
        .transpose(0, 2, 1, 3)
        .reshape(n_rows * n_cols, ch * cw)
    )
    tmpl = np.empty((len(CHARSET), ch * cw), dtype=np.int16)
    for gi, c in enumerate(CHARSET):
        g = np.full((ch, cw), BG, dtype=np.int16)
        bits = FONT[c]
        for gy in range(GLYPH_H):
            for gx in range(GLYPH_W):
                if bits[gy] & (1 << (GLYPH_W - 1 - gx)):
                    g[
                        gy * scale : (gy + 1) * scale,
                        gx * scale : (gx + 1) * scale,
                    ] = INK
        tmpl[gi] = g.reshape(-1)
    # L1 distances cell x glyph; argmin takes the FIRST minimum, which
    # is the charset-order tie-break
    d = np.abs(cells[:, None, :] - tmpl[None, :, :]).sum(axis=2)
    best = d.argmin(axis=1)
    chars = [CHARSET[i] for i in best]
    lines = [
        "".join(chars[r * n_cols : (r + 1) * n_cols]).rstrip()
        for r in range(n_rows)
    ]
    while lines and not lines[-1]:
        lines.pop()
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# scanned-PDF container (image XObject, no text operators)
# ---------------------------------------------------------------------------


def encode_scanned_pdf(text: str, scale: int = SCALE) -> bytes:
    """A real single-page PDF whose only content is a ``/DCTDecode``
    image XObject carrying ``text`` rendered through
    :func:`multimodal.encode_jpeg` — NO text operators, so
    ``pdfcodec.decode_pdf_min`` yields an empty text layer and
    ``extract.decode_pdf`` dispatches to OCR exactly like the
    reference does for scanned documents
    (pdf_to_text_service.py:83-88)."""
    from .multimodal import encode_jpeg

    rows = render_text_raster(text.upper(), scale)
    h, w = len(rows), len(rows[0])
    jpg = encode_jpeg(rows)

    objects: list[bytes] = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]"
        b" /Resources << /XObject << /Im0 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /ColorSpace /DeviceGray /BitsPerComponent 8 /Filter /DCTDecode"
        b" /Length %d >>\nstream\n" % (w, h, len(jpg))
        + jpg
        + b"\nendstream",
    ]
    content = b"q %d 0 0 %d 0 0 cm /Im0 Do Q" % (w, h)
    objects.append(
        b"<< /Length %d >>\nstream\n" % len(content) + content + b"\nendstream"
    )

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
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


_IMG_DICT_RE = re.compile(rb"/Subtype\s*/Image")


def _image_jpegs(data: bytes) -> list[bytes]:
    """JPEG streams of every ``/DCTDecode`` image XObject, in object
    order (the page order the fixture encoder writes)."""
    from .pdfcodec import _object_at, _scan_offsets, _xref_offsets

    try:
        offsets, _compressed = _xref_offsets(data)
    except (ValueError, IndexError):
        offsets = _scan_offsets(data)
    out: list[bytes] = []
    for num in sorted(offsets):
        try:
            obj = _object_at(data, offsets[num])
        except ValueError:
            continue
        at = obj.find(b"stream")
        if at == -1:
            continue
        head = obj[:at]
        if not _IMG_DICT_RE.search(head) or b"/DCTDecode" not in head:
            continue
        body_at = at + len(b"stream")
        if obj[body_at : body_at + 2] == b"\r\n":
            body_at += 2
        elif obj[body_at : body_at + 1] == b"\n":
            body_at += 1
        mlen = re.search(rb"/Length\s+(\d+)", head)
        if mlen:
            out.append(obj[body_at : body_at + int(mlen.group(1))])
    return out


def ocr_scanned_pdf(data: bytes, scale: int = SCALE) -> str:
    """OCR a scanned PDF: decode each image XObject's JPEG to pixels and
    template-match the rasters; pages joined with newlines.  Raises
    NotImplementedError when the PDF carries no raster images (a
    genuinely empty text layer with nothing to OCR — same outcome the
    import-try stub produced before round 5)."""
    from .multimodal import decode_jpeg_pixels

    images = _image_jpegs(data)
    if not images:
        raise NotImplementedError(
            "OCR fallback: no raster images to read (and pdf2image/"
            "pytesseract absent in sandbox)"
        )
    pages = []
    for jpg in images:
        _, _, rows = decode_jpeg_pixels(jpg)
        pages.append(match_raster(rows, scale))
    return "\n".join(pages).strip()
