"""Multimodal binary plumbing + streaming-vs-batch equivalence."""

import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from crawler_spark import multimodal, streaming

SF = "/root/testdata/sf0.001"


def test_decode_stats_matches_hashlib(spark):
    payload = b"hello multimodal world"
    df = spark.createDataFrame(
        [(1, "doc", bytearray(payload), "text/plain")], multimodal.MEDIA
    )
    row = multimodal.decode_stats(df).collect()[0]
    digest = hashlib.md5(payload).hexdigest()
    assert row["n_bytes"] == len(payload)
    assert row["checksum"] == digest
    assert row["width"] == int(digest[:15], 16) % 640 + 1
    assert 1 <= row["height"] <= 480


def test_feature_and_frames_deterministic(spark):
    payload = bytes(range(256)) * 5  # 1280 bytes -> 1 frame per 1024
    df = spark.createDataFrame(
        [(7, "video", bytearray(payload), "video/mp4")], multimodal.MEDIA
    )
    f1 = multimodal.extract_features(df).collect()[0]["feature"]
    f2 = multimodal.extract_features(df).collect()[0]["feature"]
    assert f1 == f2 and len(f1) == 8 and all(0 <= x < 1 for x in f1)
    frames = multimodal.frame_sample(df).collect()
    assert len(frames) == 1  # 1280 // 1024
    assert frames[0]["frame_checksum"] == hashlib.md5(payload[:1024]).hexdigest()


def test_png_codec_roundtrip_all_filters():
    """The stdlib PNG decoder must reconstruct every scanline filter
    type (0-4) — verified against an independent reference encoder."""
    import struct
    import zlib

    def ref_png(width, height, pix, filters):
        raw = b""
        prev = [0] * (3 * width)
        for y in range(height):
            line = [c for x in range(width) for c in pix(x, y)]
            f = filters[y % len(filters)]
            enc = []
            for i, v in enumerate(line):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if f == 0:
                    enc.append(v & 0xFF)
                elif f == 1:
                    enc.append((v - a) & 0xFF)
                elif f == 2:
                    enc.append((v - b) & 0xFF)
                elif f == 3:
                    enc.append((v - (a + b) // 2) & 0xFF)
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    enc.append((v - pred) & 0xFF)
            raw += bytes([f]) + bytes(enc)
            prev = line

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        )

    pix = lambda x, y: ((x * 7 + y * 3) % 256, (x + y) % 256, (x * x + y) % 256)
    data = ref_png(5, 6, pix, [0, 1, 2, 3, 4])
    w, h, r, g, bl = multimodal.decode_png(data)
    exp = [0.0, 0.0, 0.0]
    for y in range(6):
        for x in range(5):
            for i, c in enumerate(pix(x, y)):
                exp[i] += c
    exp = [e / 30 for e in exp]
    assert (w, h) == (5, 6)
    assert abs(r - exp[0]) < 1e-9 and abs(g - exp[1]) < 1e-9 and abs(bl - exp[2]) < 1e-9
    # encoder/decoder roundtrip with a constant color
    w2, h2, r2, g2, b2 = multimodal.decode_png(multimodal.encode_png(17, 9, (200, 30, 99)))
    assert (w2, h2, r2, g2, b2) == (17, 9, 200.0, 30.0, 99.0)
    with pytest.raises(ValueError):
        multimodal.decode_png(b"not a png")


def test_wav_codec_roundtrip():
    n, rate, rms = multimodal.decode_wav(multimodal.encode_wav(57, 345))
    assert (n, rate, rms) == (57, 8000, 345.0)


def test_jpeg_codec_constant_exact():
    # quant step 8 keeps a constant block's DC exact through the full
    # lossy pipeline; non-multiple-of-8 dims exercise padding + crop
    for v in (0, 1, 57, 128, 200, 255):
        data = multimodal.encode_jpeg([[v] * 13 for _ in range(11)])
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        w, h, mean = multimodal.decode_jpeg(data)
        assert (w, h, mean) == (13, 11, float(v))
    with pytest.raises(ValueError):
        multimodal.decode_jpeg(b"not a jpeg")


def test_jpeg_codec_gradient_matches_quant_model():
    """Decoder output equals an independent FDCT->quant->dequant->IDCT
    model computed straight from the spec (not via the codec), so the
    Huffman entropy layer and the transform are both verified — and the
    pipeline is genuinely lossy (decoded mean != original mean)."""
    import math

    pix = [[(x * 7 + y * 13) % 256 for x in range(19)] for y in range(10)]
    c = [1 / math.sqrt(2)] + [1.0] * 7
    cos = [
        [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
        for u in range(8)
    ]
    h, w = 10, 19
    ph, pw = 16, 24
    rows = [list(r) + [r[-1]] * (pw - w) for r in pix]
    rows += [rows[-1][:]] * (ph - h)
    total = 0
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            F = [[0.0] * 8 for _ in range(8)]
            for u in range(8):
                for v in range(8):
                    s = sum(
                        (rows[by + y][bx + x] - 128) * cos[u][y] * cos[v][x]
                        for y in range(8)
                        for x in range(8)
                    )
                    F[u][v] = round(0.25 * c[u] * c[v] * s / 8) * 8
            for y in range(8):
                if by + y >= h:
                    break
                for x in range(8):
                    if bx + x >= w:
                        continue
                    s = sum(
                        c[u] * c[v] * F[u][v] * cos[u][y] * cos[v][x]
                        for u in range(8)
                        for v in range(8)
                    )
                    total += min(255, max(0, int(round(s * 0.25)) + 128))
    expected = total / (w * h)
    dw, dh, mean = multimodal.decode_jpeg(multimodal.encode_jpeg(pix))
    assert (dw, dh) == (w, h)
    assert abs(mean - expected) < 1e-9
    assert mean != sum(map(sum, pix)) / (w * h)  # lossy for real


def test_avi_codec_roundtrip_constant_frames():
    # constant-luma frames survive quant step 8 exactly, so both the
    # container fields AND every frame's pixel decode are exact
    frames = [[[(7 + 37 * k) % 256] * 13 for _ in range(9)] for k in range(4)]
    data = multimodal.encode_avi(frames, fps=8)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    w, h, n, fps, mean = multimodal.decode_avi(data)
    assert (w, h, n, fps) == (13, 9, 4, 8)
    assert mean == sum((7 + 37 * k) % 256 for k in range(4)) / 4
    assert multimodal.decode_avi_frames(data) == [
        (k, float((7 + 37 * k) % 256)) for k in range(4)
    ]


def test_avi_codec_rejects_non_avi_and_truncated_movi():
    with pytest.raises(ValueError):
        multimodal.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        multimodal.decode_avi(b"\x00" * 32)
    # header/movi frame-count cross-check: bump avih dwTotalFrames so the
    # header claims 3 frames while movi carries 2
    data = bytearray(multimodal.encode_avi([[[5] * 8] * 8] * 2, fps=10))
    avih = data.find(b"avih") + 8  # chunk body start
    assert data[avih + 16 : avih + 20] == (2).to_bytes(4, "little")
    data[avih + 16 : avih + 20] = (3).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frames"):
        multimodal._avi_parse(bytes(data))
    # and a non-MJPG video stream is refused outright
    data2 = bytearray(multimodal.encode_avi([[[5] * 8] * 8] * 2, fps=10))
    strh = data2.find(b"strh") + 8
    assert data2[strh + 4 : strh + 8] == b"MJPG"
    data2[strh + 4 : strh + 8] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        multimodal._avi_parse(bytes(data2))


def test_decode_stats_dispatches_real_codecs(spark):
    rows = [
        (1, "image", bytearray(multimodal.encode_png(12, 8, (9, 9, 9))), "image/png"),
        (2, "audio", bytearray(multimodal.encode_wav(33, 100)), "audio/wav"),
        (3, "video", bytearray(multimodal.encode_avi([[[1] * 21] * 14] * 3)),
         "video/x-msvideo"),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA)
    got = {r["media_id"]: (r["width"], r["height"]) for r in multimodal.decode_stats(df).collect()}
    assert got[1] == (12, 8)  # real PNG geometry
    assert got[2] == (33, 8000)  # n_frames, framerate
    assert got[3] == (21, 14)  # real AVI header + frame geometry


def test_video_sample_frames_real_decode(spark):
    from crawler_spark.queries import q_multimodal_video, q_video_frame_sample

    stats = {
        r["media_id"]: r
        for r in q_multimodal_video(spark, SF).collect()
    }
    for did, r in stats.items():
        n = did % 6 + 2
        assert (r["width"], r["height"], r["n_frames"], r["fps"]) == (
            did % 24 + 8, did % 16 + 8, n, did % 5 + 5
        )
        expect = sum((did * 7 + 37 * k) % 256 for k in range(n)) / n
        assert abs(r["mean_luma"] - round(expect, 4)) < 1e-9
    sampled = q_video_frame_sample(spark, SF).collect()
    assert sampled and all(r["frame_idx"] % 2 == 0 for r in sampled)
    for r in sampled:
        assert r["frame_mean"] == float(
            (r["media_id"] * 7 + 37 * r["frame_idx"]) % 256
        )


def test_stream_twin_equals_batch_twin(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch = {
        (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in streaming.windowed_counts_batch(events).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events.write.parquet(src)
        out = streaming.run_stream_to_batch(
            spark,
            src,
            events.schema,
            streaming.windowed_counts_stream,
            os.path.join(tmp, "ckpt"),
        )
        stream = {
            (r["hour"], r["event_type"]): (r["n_events"], r["sum_value"])
            for r in out.collect()
        }
    assert batch == stream


def test_sessionize_stream_agrees_on_session_count(spark):
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch_sessions = streaming.sessionize_batch(events).count()
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events.write.parquet(src)
        out = streaming.run_stream_to_batch(
            spark,
            src,
            events.schema,
            streaming.sessionize_stream,
            os.path.join(tmp, "ckpt"),
        )
        assert out.count() == batch_sessions


def test_stateful_running_counts_across_batches(spark):
    """applyInPandasWithState accumulates state across micro-batches."""
    events = spark.read.parquet(f"{SF}/events.parquet")
    batch_counts = {
        r["user_id"]: r["n"]
        for r in events.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        # 3 files -> 3 micro-batches with maxFilesPerTrigger=1
        events.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming.running_counts_stream(stream)
            .writeStream.format("memory")
            .queryName("running_counts")
            .outputMode("update")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode emits one row per key per batch; the max is final
        final = {
            r["user_id"]: r["mx"]
            for r in spark.table("running_counts")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("mx"))
            .collect()
        }
    assert final == batch_counts
