"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design: image/audio/video payloads are ``binary`` columns with a typed
metadata struct; heavy per-item work (decode, resize, frame-sample,
feature-extract) runs as Arrow-batched ``mapInPandas`` stages so bytes
move driver-free, batch-at-a-time, and never enter a shuffle (the stage
is a projection; downstream joins use the extracted features, not the
bytes).  The reference stores fetched PDFs/DOCX the same way — raw bytes
on disk next to extracted text (``pygdpr/models/dpa/austria/
__init__.py:134-135``) — this module is that idea as a column.

The actual codecs (Pillow / librosa / pyav) are NOT in this container,
so the decode core is stubbed: :func:`decode_stats` computes real,
deterministic facts about the bytes (length, md5, a fake geometry
derived from the hash) and :func:`extract_features` emits a
deterministic pseudo-embedding.  The Spark-side plumbing — schema,
Arrow batching, UDF signatures, partitioning — is real and tested; swap
``_decode_image_real`` in when the codec is available.
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


def _decode_image_real(data: bytes) -> tuple[int, int]:
    """Real decoder slot — requires an image codec not in this sandbox."""
    raise NotImplementedError(
        "image codec (Pillow) unavailable in this environment; "
        "decode_stats uses the deterministic fake geometry instead"
    )


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
    """Arrow-batched 'decode': byte length, checksum, geometry.

    One mapInPandas projection; bytes are consumed inside the batch and
    dropped from the output so no shuffle ever carries payloads.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = pdf["bytes"].map(
                lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
            )
            geo = digests.map(lambda d: _fake_geometry(d) if d else (None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["bytes"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "checksum": digests,
                    "width": geo.map(lambda g: g[0]),
                    "height": geo.map(lambda g: g[1]),
                }
            )

    return media.mapInPandas(run, DECODE_OUT)


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
