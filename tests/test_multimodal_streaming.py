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
        [(1, "image", bytearray(payload), "image/png")], multimodal.MEDIA
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


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_image_real(b"\x89PNG")


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
