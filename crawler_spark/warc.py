"""WARC (ISO 28500) container codec + Spark source/sink plumbing.

The reference crawler persists each fetched page as a loose file on
local disk (``pygdpr/models/dpa/belgium/__init__.py:175-183`` —
``document_folder`` + ``with open(..., 'wb')`` per scraper); a
web-scale frontier over Common-Crawl-style pages stores fetch results
in the format Common Crawl itself uses: **WARC/1.0** files whose
records are each an independent gzip member (``.warc.gz``).  This
module is a from-scratch pure-stdlib implementation of that container:

- :func:`encode_record` — one ISO 28500 record: named WARC headers,
  CRLF framing, exact ``Content-Length`` byte count (binary payloads
  containing ``CRLF CRLF`` are framed by length, never by delimiter
  search), ``WARC-Payload-Digest`` as base32 sha1 like Common Crawl's
  writer.  ``response`` records wrap the payload in a minimal
  ``application/http; msgtype=response`` block, matching what a real
  crawler captures off the wire.
- :func:`encode_warc` / :func:`decode_warc` — the ``.warc.gz`` layout:
  one gzip member **per record** (``mtime=0`` so file bytes are
  deterministic), concatenated.  Member-per-record is what makes the
  format record-seekable — a CDX index row ``(urlkey, offset, length)``
  lets a reader fetch one record with a ranged read and one gunzip,
  without touching the rest of the file.  The decoder walks members
  with ``zlib.decompressobj(wbits=31)`` + ``unused_data`` (streaming,
  no whole-file second copy) and also accepts plain uncompressed WARC.
- :func:`warc_pack` / :func:`warc_scan` — the Spark sink/source pair:
  pack groups rows into one WARC blob per file key with
  ``applyInArrow`` (no pandas round-trip), scan explodes WARC blobs
  back into rows with ``mapInArrow`` reading the blob as a zero-copy
  memoryview slice of the Arrow buffer (same recipe as the fetch
  stage, ``extract._binary_accessor``).

Determinism deviation, documented: real writers mint
``WARC-Record-ID`` with ``uuid4()``; here the urn:uuid is derived from
md5(url, date) so fixture bytes, value-hashes and resumed runs are
byte-stable.  The format on the wire is identical.

Scale shape (100 TB): Common Crawl ships ~64k files of ~1 GB per
snapshot — parallelism comes from *file count*, one task per file
(``spark.read.format("binaryFile")`` on a cluster; gzip members make
intra-file splitting possible for a custom DataSource, but the
file-grain is already 64k-way).  ``warc_pack`` bounds task memory by
the file key's group size — choose keys so a group ≈ the 1 GB CC file
grain; ``warc_scan`` streams records out in bounded RecordBatches
(FLUSH_ROWS) so a 1 GB file never materializes twice in one heap.
"""

from __future__ import annotations

import base64
import hashlib
import zlib
from typing import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

#: gzip member framing for one record, deterministic bytes
_GZ_LEVEL = 6


def _record_id(url: str, date: str) -> str:
    """Deterministic ``<urn:uuid:...>`` from md5(url|date) (see module
    docstring — format-identical to a uuid4 urn, bytes stable)."""
    h = hashlib.md5(("%s|%s" % (url, date)).encode("utf-8")).hexdigest()
    return "<urn:uuid:%s-%s-%s-%s-%s>" % (h[:8], h[8:12], h[12:16], h[16:20], h[20:32])


def payload_digest(payload: bytes) -> str:
    """Common-Crawl-style ``WARC-Payload-Digest`` value: base32 sha1."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode("ascii")


def encode_record(
    url: str,
    date: str,
    payload: bytes,
    rec_type: str = "response",
    http_status: int = 200,
    content_type: str = "text/html; charset=UTF-8",
) -> bytes:
    """Serialize ONE WARC/1.0 record (uncompressed).

    ``date`` is the ISO 8601 ``WARC-Date`` string (``...Z``), passed
    through verbatim — the codec never goes through a tz-ambiguous
    datetime object.  For ``rec_type='response'`` the record body is a
    minimal HTTP/1.1 response block around ``payload`` and the WARC
    ``Content-Type`` is ``application/http; msgtype=response`` (ISO
    28500 §6.3; what Common Crawl response records contain); any other
    ``rec_type`` stores ``payload`` bare with ``content_type`` as-is.
    """
    if rec_type == "response":
        http = (
            b"HTTP/1.1 %d %s\r\n" % (http_status, _REASON.get(http_status, b"OK"))
            + b"Content-Type: %s\r\n" % content_type.encode("ascii")
            + b"Content-Length: %d\r\n\r\n" % len(payload)
        )
        block = http + payload
        block_type = b"application/http; msgtype=response"
    else:
        block = payload
        block_type = content_type.encode("ascii")
    hdrs = [
        b"WARC/1.0",
        b"WARC-Type: " + rec_type.encode("ascii"),
        b"WARC-Record-ID: " + _record_id(url, date).encode("ascii"),
        b"WARC-Date: " + date.encode("ascii"),
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"WARC-Payload-Digest: " + payload_digest(payload).encode("ascii"),
        b"Content-Type: " + block_type,
        b"Content-Length: %d" % len(block),
    ]
    return _CRLF.join(hdrs) + _CRLF + _CRLF + block + _CRLF + _CRLF


_REASON = {200: b"OK", 301: b"Moved Permanently", 404: b"Not Found",
           500: b"Internal Server Error"}


def encode_warc(records, gzip_members: bool = True) -> bytes:
    """Concatenate encoded records into one file's bytes.

    ``gzip_members=True`` (the ``.warc.gz`` layout) compresses each
    record as an INDEPENDENT gzip member with ``mtime=0`` — file bytes
    are a pure function of the records, and each member is seekable on
    its own (the property CDX offset indexes rely on).
    """
    if not gzip_members:
        return b"".join(records)
    out = bytearray()
    for rec in records:
        co = zlib.compressobj(_GZ_LEVEL, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        # zlib's gzip header with default params is deterministic
        # (mtime field zero, no name); gzip.compress(mtime=0) would
        # also work but re-checks mtime per call
        out += co.compress(rec) + co.flush()
    return bytes(out)


def _parse_http(block: memoryview) -> tuple[int, bytes]:
    """Split an ``application/http`` response block into (status,
    payload).  Framing is the header/body blank line; the payload after
    it is taken whole (the record's Content-Length already bounded the
    block — no delimiter search inside the payload)."""
    b = bytes(block)
    sep = b.find(b"\r\n\r\n")
    if sep < 0:  # header-only response (no body)
        sep = len(b)
    status_line = b[: b.find(b"\r\n") if b"\r\n" in b else len(b)]
    parts = status_line.split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        status = -1
    return status, b[sep + 4 :] if sep + 4 <= len(b) else b""


def _member_walk(buf) -> Iterator[tuple[int, int, bytes]]:
    """Yield ``(offset, compressed_length, decompressed_bytes)`` for each
    gzip member of ``buf``, feeding the decompressor BOUNDED chunks off a
    memoryview.  Feeding the whole remaining buffer per member (the naive
    ``unused_data`` loop) copies the tail into ``unused_data`` every
    member — O(members × file size), which turned a 150k-record file
    walk quadratic; this walk is O(file size) total."""
    mv = memoryview(buf)
    n = len(mv)
    pos = 0
    CHUNK = 1 << 16
    while pos < n:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        out = []
        fed = 0
        while not d.eof:
            if pos + fed >= n:
                raise ValueError("truncated gzip member in WARC file")
            chunk = mv[pos + fed : pos + fed + CHUNK]
            out.append(d.decompress(chunk))
            fed += len(chunk)
        consumed = fed - len(d.unused_data)
        yield pos, consumed, b"".join(out)
        pos += consumed


def _gunzip_members(data) -> Iterator[bytes]:
    """Decompressed bytes of each gzip member (offset-free view of
    :func:`_member_walk`)."""
    for _, _, member in _member_walk(data):
        yield member


def decode_warc(data) -> list[dict]:
    """Parse one WARC file's bytes (gzip-member or plain) into records.

    Returns dicts with keys ``url, date, rec_type, http_status,
    payload, record_id, digest_ok``.  Record framing is Content-Length
    (never a scan for the next ``WARC/`` token — binary payloads may
    contain one); a record whose declared length runs past the buffer
    raises ``ValueError`` rather than returning silently short data.
    """
    data = bytes(data) if not isinstance(data, (bytes, bytearray)) else data
    if data[:2] == _GZIP_MAGIC:
        buf = b"".join(_gunzip_members(data))
    else:
        buf = bytes(data)
    return decode_warc_plain(buf)


def decode_warc_plain(buf: bytes) -> list[dict]:
    """Record walk over an UNCOMPRESSED WARC buffer (the shared core of
    :func:`decode_warc` and the per-member CDX walk)."""
    out: list[dict] = []
    mv = memoryview(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        if buf[pos : pos + 5] != b"WARC/":
            raise ValueError("bad WARC record marker at offset %d" % pos)
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii")] = v.strip().decode(
                "utf-8", "replace"
            )
        clen = int(headers["content-length"])
        body_at = hdr_end + 4
        if body_at + clen > n:
            raise ValueError("WARC record truncated (Content-Length overruns file)")
        block = mv[body_at : body_at + clen]
        rec_type = headers.get("warc-type", "")
        ctype = headers.get("content-type", "")
        if ctype.startswith("application/http"):
            status, payload = _parse_http(block)
        else:
            status, payload = -1, bytes(block)
        want = headers.get("warc-payload-digest")
        out.append(
            {
                "url": headers.get("warc-target-uri", ""),
                "date": headers.get("warc-date", ""),
                "rec_type": rec_type,
                "http_status": status,
                "payload": payload,
                "record_id": headers.get("warc-record-id", ""),
                "digest_ok": (want == payload_digest(payload)) if want else None,
            }
        )
        pos = body_at + clen
        # consume the record-terminating CRLF CRLF (tolerate EOF)
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
    return out


# ---------------------------------------------------------------------------
# Spark sink/source
# ---------------------------------------------------------------------------

WARC_FILE_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.LongType(), False),
        T.StructField("warc", T.BinaryType(), False),
        T.StructField("n_records", T.IntegerType(), False),
    ]
)

WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_date", T.StringType(), False),
        T.StructField("rec_type", T.StringType(), False),
        T.StructField("http_status", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("digest_ok", T.BooleanType(), False),
    ]
)


def warc_pack(
    rows: DataFrame,
    file_col: str = "file_key",
    url_col: str = "url",
    date_col: str = "warc_date",
    payload_col: str = "payload",
    gzip_members: bool = True,
) -> DataFrame:
    """Sink: pack rows into one ``.warc.gz`` blob per ``file_col`` value.

    ``date_col`` is an ISO 8601 STRING (tz-proof — see encode_record).
    Rows are ordered by url inside the file so file bytes are
    deterministic regardless of upstream partitioning.  One shuffle on
    the file key (inherent: a file's rows must co-locate); the group
    runs in ``applyInArrow`` — payload bytes go Arrow→record bytes with
    no pandas materialization.  Choose ``file_col`` granularity so one
    group ≈ the ~1 GB Common-Crawl file grain.
    """
    out_schema = pa.schema(
        [
            pa.field("file_key", pa.int64()),
            pa.field("warc", pa.binary()),
            pa.field("n_records", pa.int32()),
        ]
    )

    # NOTE: deliberately annotation-free — pyspark 4.1.2's
    # infer_group_arrow_eval_type_from_func raises (then hits an
    # UnboundLocalError in applyInArrow) on partially-annotated
    # functions; no annotations → the default grouped-map Table API.
    def pack(key, table):
        urls = table.column(url_col).to_pylist()
        dates = table.column(date_col).to_pylist()
        payloads = table.column(payload_col).to_pylist()
        order = sorted(range(len(urls)), key=lambda i: urls[i])
        blob = encode_warc(
            (encode_record(urls[i], dates[i], payloads[i]) for i in order),
            gzip_members=gzip_members,
        )
        return pa.Table.from_arrays(
            [
                pa.array([key[0]], pa.int64()),
                pa.array([blob], pa.binary()),
                pa.array([len(urls)], pa.int32()),
            ],
            schema=out_schema,
        )

    slim = rows.select(
        F.col(file_col).cast("long").alias(file_col), url_col, date_col, payload_col
    )
    return slim.groupBy(file_col).applyInArrow(pack, schema=WARC_FILE_SCHEMA)


WARC_CDX_SCHEMA = T.StructType(
    [
        T.StructField("file_key", T.LongType(), False),
        T.StructField("urlkey", T.StringType(), False),
        T.StructField("ts14", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("payload_md5", T.StringType(), False),
    ]
)


def warc_cdx(files: DataFrame, file_col: str = "file_key", warc_col: str = "warc") -> DataFrame:
    """CDX index rows for ``.warc.gz`` files: one row per record with
    the record's gzip-member ``(offset, length)`` inside its file — the
    wayback/Common-Crawl index shape that turns a WARC archive into a
    random-access store (ranged read + one gunzip per record;
    ``tests/test_warc.py`` proves a record reconstructs from its CDX
    row alone).  ``urlkey`` is the SURT key (:func:`urls.surt_one`, the
    Python twin of the codegen :func:`urls.surt_key`) and ``ts14`` the
    WARC-Date digits — sorting by (urlkey, ts14) clusters a host's
    records contiguously, which is the CDX range-partitioning key at
    10^10 records.  Same mapInArrow/zero-copy shape as
    :func:`warc_scan`; offsets come free from the member walk.
    """
    from .extract import _binary_accessor
    from .urls import surt_one

    FLUSH_ROWS = 1024

    def scan(batches):
        cols: tuple[list, ...] = tuple([] for _ in range(7))

        def flush():
            rb = pa.RecordBatch.from_arrays(
                [
                    pa.array(cols[0], pa.int64()),
                    pa.array(cols[1], pa.string()),
                    pa.array(cols[2], pa.string()),
                    pa.array(cols[3], pa.string()),
                    pa.array(cols[4], pa.int64()),
                    pa.array(cols[5], pa.int64()),
                    pa.array(cols[6], pa.string()),
                ],
                names=["file_key", "urlkey", "ts14", "url", "offset",
                       "length", "payload_md5"],
            )
            for c in cols:
                c.clear()
            return rb

        for rb_in in batches:
            idx = {name: i for i, name in enumerate(rb_in.schema.names)}
            keys = rb_in.column(idx[file_col]).to_pylist()
            blob_at = _binary_accessor(rb_in.column(idx[warc_col]))
            for r in range(rb_in.num_rows):
                for off, length, member in _member_walk(blob_at(r)):
                    (rec,) = decode_warc_plain(member)
                    cols[0].append(keys[r])
                    cols[1].append(surt_one(rec["url"]))
                    cols[2].append(
                        "".join(ch for ch in rec["date"] if ch.isdigit())
                    )
                    cols[3].append(rec["url"])
                    cols[4].append(off)
                    cols[5].append(length)
                    cols[6].append(hashlib.md5(rec["payload"]).hexdigest())
                    off += length
                    if len(cols[0]) >= FLUSH_ROWS:
                        yield flush()
        if cols[0]:
            yield flush()

    slim = files.select(F.col(file_col).cast("long").alias(file_col), warc_col)
    return slim.mapInArrow(scan, schema=WARC_CDX_SCHEMA)


def warc_scan(files: DataFrame, file_col: str = "file_key", warc_col: str = "warc") -> DataFrame:
    """Source: explode WARC blobs into one row per record.

    ``mapInArrow`` over the files frame; the blob is accessed as a
    zero-copy memoryview of the Arrow binary buffer (gunzip is the
    first copy), and output streams in bounded RecordBatches.  On a
    real cluster the files frame IS ``spark.read.format("binaryFile")
    .load("s3://.../*.warc.gz")`` with ``path`` as the file key — this
    function only assumes (key, bytes).
    """
    from .extract import _binary_accessor

    out_schema = pa.schema(
        [
            pa.field("file_key", pa.int64()),
            pa.field("url", pa.string()),
            pa.field("warc_date", pa.string()),
            pa.field("rec_type", pa.string()),
            pa.field("http_status", pa.int32()),
            pa.field("payload", pa.binary()),
            pa.field("digest_ok", pa.bool_()),
        ]
    )
    FLUSH_ROWS = 512

    def scan(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cols: tuple[list, ...] = tuple([] for _ in range(7))

        def flush() -> pa.RecordBatch:
            rb = pa.RecordBatch.from_arrays(
                [pa.array(c, type=f.type) for c, f in zip(cols, out_schema)],
                schema=out_schema,
            )
            for c in cols:
                c.clear()
            return rb

        for rb_in in batches:
            idx = {name: i for i, name in enumerate(rb_in.schema.names)}
            keys = rb_in.column(idx[file_col]).to_pylist()
            blob_at = _binary_accessor(rb_in.column(idx[warc_col]))
            for r in range(rb_in.num_rows):
                for rec in decode_warc(blob_at(r)):
                    cols[0].append(keys[r])
                    cols[1].append(rec["url"])
                    cols[2].append(rec["date"])
                    cols[3].append(rec["rec_type"])
                    cols[4].append(rec["http_status"])
                    cols[5].append(rec["payload"])
                    cols[6].append(bool(rec["digest_ok"]))
                    if len(cols[0]) >= FLUSH_ROWS:
                        yield flush()
        if cols[0]:
            yield flush()

    slim = files.select(F.col(file_col).cast("long").alias(file_col), warc_col)
    return slim.mapInArrow(scan, schema=WARC_RECORD_SCHEMA)
