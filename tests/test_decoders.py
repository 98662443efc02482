"""X3-X6 decoder leaves, including the OCR lazy-expensive branch
(pdf_to_text_service.py:26-60,83-88)."""

import io
import zipfile

import pytest

from crawler_spark import extract as X


def test_pdf_decode_plain():
    assert X.decode_pdf(X.FAKE_PDF_HEADER + b"hello world") == "hello world"


def test_pdf_empty_text_layer_falls_through_to_ocr():
    # scanned pdf: text extraction yields only whitespace -> the OCR
    # branch is entered (and raises its sandbox stub error)
    with pytest.raises(NotImplementedError, match="OCR fallback"):
        X.decode_pdf(X.FAKE_PDF_HEADER + b"   \n\t ")


def test_docx_decode_fake_container():
    assert X.decode_docx(X.FAKE_DOCX_HEADER + b"notice text") == "notice text"


def test_docx_decode_real_zip():
    from crawler_spark.fixtures import _make_docx

    text = "Penalty notice issued.\nThe controller must comply.\nFinal."
    assert X.decode_docx(_make_docx(text)) == text


def test_docx_decode_rejects_garbage():
    with pytest.raises(NotImplementedError):
        X.decode_docx(b"PK\x03\x04 not really a zip")


def test_zip_decode_member_order():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("b.html", "<html><body>second</body></html>")
        z.writestr("a.html", "<html><body>first</body></html>")
    assert X.decode_zip(buf.getvalue()) == "first\nsecond"


def test_rtf_decode():
    # control-word trailing space is the delimiter (consumed), \par is a
    # newline — striprtf semantics
    assert X.decode_rtf(b"{\\rtf1 hello\\par world}") == "hello\nworld"


def test_rtf_decode_real_document():
    rtf = (
        b"{\\rtf1\\ansi\\deff0 {\\fonttbl{\\f0 Times New Roman;}}"
        b"{\\colortbl;\\red0\\green0\\blue0;}"
        b"{\\*\\generator Word 15}"
        b"\\f0\\fs24 D\\'e9cision de la CNIL\\par Une amende de 50\\{00\\} EUR.}"
    )
    assert X.decode_rtf(rtf) == "Décision de la CNIL\nUne amende de 50{00} EUR."
