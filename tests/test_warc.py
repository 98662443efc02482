"""WARC codec + Spark sink/source tests (crawler_spark.warc).

Codec-level: Content-Length framing must survive payloads that contain
CRLF CRLF and even a fake ``WARC/1.0`` marker (a delimiter-scanning
parser would mis-frame both), gzip members must be byte-deterministic
and individually seekable, truncation must raise rather than return
short data.  Spark-level: pack → scan round trip is the identity on
(url, date, payload) with verified digests.
"""

from __future__ import annotations

import zlib

import pytest

from crawler_spark import warc

RECS = [
    ("https://a.example.com/x", "2024-01-01T00:00:00Z", b"hello\r\n\r\nWARC/1.0 fake\r\n"),
    ("https://b.example.com/é", "2024-02-03T04:05:06Z", b""),
    ("https://c.example.com/bin", "2024-03-01T00:00:00Z", bytes(range(256)) * 3),
]


def _blob(gz=True):
    return warc.encode_warc(
        (warc.encode_record(u, d, p) for u, d, p in RECS), gzip_members=gz
    )


def test_roundtrip_identity_gz_and_plain():
    for gz in (True, False):
        out = warc.decode_warc(_blob(gz))
        assert [(r["url"], r["date"], r["payload"]) for r in out] == RECS
        assert all(r["digest_ok"] for r in out)
        assert all(r["http_status"] == 200 for r in out)
        assert all(r["rec_type"] == "response" for r in out)


def test_deterministic_bytes():
    assert _blob() == _blob()


def test_members_individually_seekable():
    """Each gzip member decodes alone — the property CDX offset
    indexes rely on (ranged read + one gunzip per record)."""
    blob = _blob()
    offsets = [0]
    rest = blob
    while rest:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        d.decompress(rest)
        consumed = len(rest) - len(d.unused_data)
        offsets.append(offsets[-1] + consumed)
        rest = d.unused_data
    assert len(offsets) - 1 == len(RECS)
    for i, (u, _, p) in enumerate(RECS):
        member = blob[offsets[i] : offsets[i + 1]]
        (rec,) = warc.decode_warc(member)
        assert (rec["url"], rec["payload"]) == (u, p)


def test_truncation_raises():
    blob = _blob()
    with pytest.raises(ValueError):
        warc.decode_warc(blob[: len(blob) // 2])
    plain = _blob(gz=False)
    with pytest.raises(ValueError):
        warc.decode_warc(plain[:-40])
    with pytest.raises(ValueError):
        warc.decode_warc(b"HTTP/1.1 200 OK\r\n\r\n not a warc")


def test_digest_flags_corruption():
    """A flipped payload byte (with Content-Length fixed up) parses but
    fails the sha1 payload digest."""
    rec = warc.encode_record("https://a/x", "2024-01-01T00:00:00Z", b"AAAA")
    bad = rec.replace(b"AAAA", b"AAAB")
    (r,) = warc.decode_warc(bad)
    assert r["payload"] == b"AAAB" and r["digest_ok"] is False


def test_non_response_record():
    rec = warc.encode_record(
        "https://a/r", "2024-01-01T00:00:00Z", b"User-agent: *\n",
        rec_type="resource", content_type="text/plain",
    )
    (r,) = warc.decode_warc(rec)
    assert r["rec_type"] == "resource"
    assert r["http_status"] == -1
    assert r["payload"] == b"User-agent: *\n"
    assert r["digest_ok"] is True


def test_spark_pack_scan_roundtrip(spark):
    rows = [
        (i % 3, f"https://h{i}.example.com/p{i}", "2024-05-0%dT00:00:00Z" % (i % 9 + 1),
         (b"payload-%d-" % i) + bytes(range(i % 7)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "file_key long, url string, warc_date string, payload binary")
    files = warc.warc_pack(df)
    got_files = {r["file_key"]: r for r in files.collect()}
    assert sorted(got_files) == [0, 1, 2]
    assert sum(r["n_records"] for r in got_files.values()) == 40
    back = warc.warc_scan(files).collect()
    assert len(back) == 40
    want = {(u, d, bytes(p)) for _, u, d, p in rows}
    assert {(r["url"], r["warc_date"], bytes(r["payload"])) for r in back} == want
    assert all(r["digest_ok"] and r["http_status"] == 200 for r in back)


def test_spark_pack_deterministic_bytes(spark):
    """File bytes are a pure function of the rows, independent of the
    input partitioning (in-file order is canonicalized by url)."""
    rows = [(0, f"https://h/{i}", "2024-01-01T00:00:00Z", b"x%d" % i) for i in range(10)]
    schema = "file_key long, url string, warc_date string, payload binary"
    a = warc.warc_pack(spark.createDataFrame(rows, schema).repartition(1)).collect()
    b = warc.warc_pack(
        spark.createDataFrame(list(reversed(rows)), schema).repartition(8)
    ).collect()
    assert bytes(a[0]["warc"]) == bytes(b[0]["warc"])


def test_cdx_offsets_reconstruct_records(spark):
    """A CDX row alone (offset, length) must reconstruct its record via
    a ranged read + one gunzip — the random-access property the index
    exists for."""
    rows = [
        (i % 2, f"https://h{i}.EXAMPLE.com/P{i}?b=2&a=1", "2024-06-07T08:09:%02dZ" % (i % 60),
         b"body-%d" % i)
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "file_key long, url string, warc_date string, payload binary")
    files = warc.warc_pack(df)
    blobs = {r["file_key"]: bytes(r["warc"]) for r in files.collect()}
    cdx = warc.warc_cdx(files).collect()
    assert len(cdx) == 12
    from crawler_spark.urls import surt_one

    for row in cdx:
        member = blobs[row["file_key"]][row["offset"] : row["offset"] + row["length"]]
        (rec,) = warc.decode_warc(member)
        assert rec["url"] == row["url"]
        assert surt_one(rec["url"]) == row["urlkey"]
        assert row["ts14"] == "".join(c for c in rec["date"] if c.isdigit())
        import hashlib

        assert hashlib.md5(rec["payload"]).hexdigest() == row["payload_md5"]
    # offsets within a file tile it exactly: sorted offsets are
    # contiguous and end at the blob length
    for fk, blob in blobs.items():
        spans = sorted((r["offset"], r["length"]) for r in cdx if r["file_key"] == fk)
        at = 0
        for off, ln in spans:
            assert off == at
            at += ln
        assert at == len(blob)


def test_surt_spark_matches_python_twin(spark):
    """urls.surt_key (codegen) vs urls.surt_one (Python) on adversarial
    URL shapes: case, www, default/explicit ports, multi-?, empty path,
    deep subdomains, fragments."""
    from pyspark.sql import functions as F

    from crawler_spark.urls import surt_key, surt_one

    urls = [
        "https://WWW.Example.COM/Path/To?b=2&a=1",
        "http://example.com",
        "http://example.com:8080/x",
        "https://example.com:443/x?z=1",
        "http://sub.Example.org/a?q=what?why&a=1",
        "https://example.com/?",
        "http://a.b.c.d.e/deep/path/",
        "http://host/no-query#frag",
        "http://www.w.com/WWW.case",
        "http://WWW.example.com:80",
        "http://example.com?q=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["s"]
        for r in df.select("url", surt_key(F.col("url")).alias("s")).collect()
    }
    for u in urls:
        assert got[u] == surt_one(u), u
