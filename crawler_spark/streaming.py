"""Structured Streaming skin over the engine's event-style aggregations.

The reference is batch-iterative (one sequential crawl loop), so the
crawl itself runs as explicit micro-batch rounds (rounds.py).  This
module covers the streaming surface a production ingest needs: windowed
aggregation with watermarked late-data handling, and gap-based
sessionization — each with a **batch twin** that computes the identical
result on a static DataFrame (the batch twins are what the DuckDB
oracles verify; the streaming tests assert stream == batch on the same
input, using availableNow file-source micro-batches).

Plan notes: tumbling-window aggregation is a hash aggregate keyed on
(window, event_type) — partial aggregation map-side, watermark bounds
state size at ~(windows in watermark horizon x types).  Sessionization
uses the built-in session_window (state: one open session per user);
the batch twin is the classic lag/cumsum window pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_counts_batch(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event counts/sums per type (batch twin).

    Output: (hour:timestamp, event_type, n_events:bigint, sum_value).
    Sum is exact (decimal) then surfaced as a rounded double so any
    engine computes the identical value.
    """
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
    )


def windowed_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming variant: watermarked tumbling window aggregation."""
    # watermarks require TIMESTAMP (LTZ); session tz is UTC so the cast
    # preserves the wall-clock semantics of the batch twin
    events = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
            ).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Gap-based sessions per user (batch twin of session_window).

    A new session starts when the gap to the previous event of the same
    user exceeds gap_minutes.  Output: (user_id, session_id:bigint,
    n_events:bigint, session_start, session_end).
    """
    gap = gap_minutes * 60 * 1_000_000  # microseconds, exact on any engine
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "new_session",
        F.when(
            # cast NTZ -> LTZ (session tz is UTC) so unix_micros applies;
            # identical to DuckDB's epoch_us over the naive timestamp
            F.unix_micros(F.col("ts").cast("timestamp_ltz"))
            - F.lag(F.unix_micros(F.col("ts").cast("timestamp_ltz"))).over(w)
            > gap,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("bigint"),
    ).withColumn(
        "session_id",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def sessionize_stream(events: DataFrame, gap_minutes: int = 10,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization via the built-in session_window."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", f"{gap_minutes} minutes"), "user_id")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def running_counts_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event counts across
    micro-batches via ``applyInPandasWithState`` (GroupState).

    This is the streaming analog of the crawl engine's cumulative
    per-host fetch counters (fetch_log rollup): state = one long per
    key, updated batch-by-batch, emitted in update mode.  The pattern
    generalizes to per-host politeness pacing (state = token bucket)
    without changing the plan shape.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        "user_id long, n_events long",
        "n long",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def run_stream_to_batch(
    spark, src_dir: str, schema, transform, checkpoint_dir: str
) -> DataFrame:
    """Drain a parquet dir as an availableNow stream into a memory sink.

    Used by tests to assert stream twin == batch twin on identical
    input; returns the sink contents as a DataFrame.
    """
    stream = spark.readStream.schema(schema).parquet(src_dir)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName("stream_twin")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table("stream_twin")
