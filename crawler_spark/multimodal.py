"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages so bytes
move driver-free, batch-at-a-time, and never enter a shuffle (the stage
is a projection; downstream joins use the extracted features, not the
bytes).  The reference stores fetched PDFs/DOCX the same way — raw bytes
on disk next to extracted text (``pygdpr/models/dpa/austria/
__init__.py:134-135``) — this module is that idea as a column.

Codecs: PNG and WAV are decoded FOR REAL with the stdlib —
:func:`decode_png` walks chunks, inflates IDAT and reconstructs all
five scanline filters per the PNG spec; :func:`decode_wav` uses
``wave``.  Matching encoders synthesize genuine payloads so the
round-trip is oracle-checkable.  Formats that need external codecs
(JPEG, video) keep the deterministic hash-geometry stand-in on the same
plumbing; :func:`extract_features` remains a deterministic
pseudo-embedding (swap in an ONNX session per executor without touching
the plan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video | doc
        StructField("bytes", BinaryType()),
        StructField("mime", StringType()),
    ]
)

DECODE_OUT = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)

FEATURE_OUT = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


# ---------------------------------------------------------------------------
# real stdlib codecs: PNG (struct + zlib + scanline filters) and WAV (wave)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """A real, spec-conformant PNG: 8-bit RGB, non-interlaced, filter 0
    scanlines, zlib IDAT, CRC-checked chunks.  Used by fixtures/tests to
    synthesize genuine image payloads without an external codec."""
    import struct
    import zlib

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter byte 0 + constant pixels
    idat = zlib.compress(row * height)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, float, float, float]:
    """Real PNG decode (8-bit RGB, non-interlaced): chunk walk, zlib
    inflate, full filter reconstruction (types 0-4 per the PNG spec).
    Returns (width, height, mean_r, mean_g, mean_b)."""
    import struct
    import zlib

    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos, width = len(_PNG_SIG), 0
    height = bit_depth = color_type = 0
    idat = b""
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(
                ">IIBB", payload[:10]
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if bit_depth != 8 or color_type != 2:
        raise ValueError("only 8-bit RGB supported")
    raw = zlib.decompress(idat)
    bpp, stride = 3, 3 * width
    prev = bytearray(stride)
    sums = [0, 0, 0]
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if ftype == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ftype == 2:
                line[x] = (line[x] + b) & 0xFF
            elif ftype == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif ftype == 4:
                line[x] = (line[x] + _paeth(a, b, c)) & 0xFF
        for x in range(0, stride, 3):
            sums[0] += line[x]
            sums[1] += line[x + 1]
            sums[2] += line[x + 2]
        prev = line
    n = width * height
    return width, height, sums[0] / n, sums[1] / n, sums[2] / n


def encode_wav(n_frames: int, amplitude: int, framerate: int = 8000) -> bytes:
    """A real mono 16-bit WAV of constant-amplitude samples (stdlib)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{n_frames}h", *([amplitude] * n_frames)))
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, float]:
    """Real WAV decode via stdlib ``wave``: (n_frames, framerate, rms)."""
    import io
    import math
    import struct
    import wave

    with wave.open(io.BytesIO(data), "rb") as w:
        n, rate = w.getnframes(), w.getframerate()
        frames = w.readframes(n)
    samples = struct.unpack(f"<{n}h", frames)
    rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
    return n, rate, rms


def _fake_geometry(digest: str) -> tuple[int, int]:
    """Deterministic stand-in geometry derived from the payload hash.

    Matches the DuckDB oracle: width = h60(md5hex) % 640 + 1,
    height = h60(reverse(md5hex)) % 480 + 1 where h60 = first 15 hex
    chars as an integer.
    """
    w = int(digest[:15], 16) % 640 + 1
    h = int(digest[::-1][:15], 16) % 480 + 1
    return w, h


def decode_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: byte length, checksum, geometry.

    One mapInPandas projection; bytes are consumed inside the batch and
    dropped from the output so no shuffle ever carries payloads.

    Dispatch per ``kind``: image payloads run the REAL stdlib PNG
    decoder (zlib inflate + filter reconstruction — :func:`decode_png`),
    audio payloads the real WAV decoder (width=n_frames,
    height=framerate); other kinds (doc/text) keep the deterministic
    hash-derived geometry that matches the DuckDB oracle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, b in zip(pdf["media_id"], pdf["kind"], pdf["bytes"]):
                if b is None:
                    rows.append((mid, kind, 0, None, None, None))
                    continue
                raw = bytes(b)
                digest = hashlib.md5(raw).hexdigest()
                if kind == "image":
                    w, h, _, _, _ = decode_png(raw)
                elif kind == "audio":
                    w, h, _ = decode_wav(raw)
                else:
                    w, h = _fake_geometry(digest)
                rows.append((mid, kind, len(raw), digest, w, h))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "n_bytes", "checksum", "width", "height",
                ],
            )

    return media.mapInPandas(run, DECODE_OUT)


def synth_png_media(docs: DataFrame) -> DataFrame:
    """documents -> a media table of REAL PNG payloads with doc_id-derived
    geometry and a constant per-image color (so the decode round-trip is
    oracle-checkable arithmetically: width = doc_id%32+9, height =
    doc_id%24+7, mean channel = the constant)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 32 + 9, did % 24 + 7
                rgb = (did % 256, (did * 3) % 256, (did * 7) % 256)
                rows.append((did, "image", encode_png(w, h, rgb), "image/png"))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "bytes", "mime"]
            )

    return docs.select("doc_id").mapInPandas(run, MEDIA)


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """documents -> a media table of REAL WAV payloads (mono 16-bit,
    constant amplitude = doc_id%1000, n_frames = doc_id%100+10) — the
    RMS of a constant signal equals the amplitude, so the real decode is
    oracle-checkable arithmetically."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                n, amp = did % 100 + 10, did % 1000
                rows.append((did, "audio", encode_wav(n, amp), "audio/wav"))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "bytes", "mime"]
            )

    return docs.select("doc_id").mapInPandas(run, MEDIA)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """Full image decode surface: geometry + per-channel means from the
    real PNG pixel reconstruction.  Output: (media_id, width, height,
    mean_r, mean_g, mean_b)."""
    out = StructType(
        [
            StructField("media_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("mean_r", DoubleType()),
            StructField("mean_g", DoubleType()),
            StructField("mean_b", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                w, h, r, g, bl = decode_png(bytes(b))
                rows.append((mid, w, h, round(r, 4), round(g, 4), round(bl, 4)))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return media.mapInPandas(run, out)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Real WAV decode surface: (media_id, n_frames, framerate, rms)."""
    out = StructType(
        [
            StructField("media_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("framerate", LongType()),
            StructField("rms", DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                n, rate, rms = decode_wav(bytes(b))
                rows.append((mid, n, rate, round(rms, 4)))
            yield pd.DataFrame(
                rows, columns=["media_id", "n_frames", "framerate", "rms"]
            )

    return media.mapInPandas(run, out)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic pseudo-embedding per payload (feature-extract stub).

    feature[i] = (int(md5(bytes || ':' || i)[:8], 16) % 1000) / 1000.0 —
    replace the body with a real model call (e.g. an ONNX session per
    executor) without touching the plan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["bytes"]:
                if b is None:
                    feats.append(None)
                    continue
                raw = bytes(b)
                feats.append(
                    [
                        (
                            int(
                                hashlib.md5(raw + b":" + str(i).encode()).hexdigest()[:8],
                                16,
                            )
                            % 1000
                        )
                        / 1000.0
                        for i in range(dim)
                    ]
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(run, FEATURE_OUT)


def frame_sample(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Frame sampling' plumbing: 1 row in -> N frame rows out.

    Stub semantics: one frame per every_n_bytes of payload (a real
    implementation samples decoded video frames at a timestamp stride —
    same 1->N mapInPandas shape, same schema discipline).
    Output: (media_id, frame_idx:long, frame_checksum:string).
    """
    out = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame_checksum", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["bytes"]):
                if b is None:
                    continue
                raw = bytes(b)
                for i in range(max(1, len(raw) // every_n_bytes)):
                    chunk = raw[i * every_n_bytes : (i + 1) * every_n_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.mapInPandas(run, out)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the documents table as a media table (text -> utf-8 bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("bytes"),
        F.lit("text/plain").alias("mime"),
    )
