"""Watermarked event-time tumbling-window aggregation.

The windowed-agg half of the streaming story (streaming/sessions.py is
the session_window half): counts and exact decimal sums per (1-hour
tumbling window, event_type) over an event stream, with a watermark
bounding both state and lateness. One expression is shared VERBATIM by
a batch twin and the streaming aggregation, so batch==stream equality
is a real invariant, not a re-implementation coincidence.

Semantics under the watermark: append mode emits each window exactly
once, when the watermark passes its end; events later than the horizon
are dropped (the documented trade — at 100 TB the alternative is
unbounded state). State = one row per open (window, type), bounded by
horizon / window_size × |types|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double")


def stream_events(spark: SparkSession, events_dir: str,
                  schema: str = EVENTS_SCHEMA,
                  max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir))


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """The shared expression: (ws_us, we_us, event_type, n, sum_value)
    per tumbling window — works unchanged on a batch frame or a
    (watermarked) stream."""
    win = F.window(F.col("ts"), window)
    return (events.groupBy(win.alias("w"), F.col("event_type"))
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"))
            .select(F.unix_micros(F.col("w.start").cast("timestamp_ltz"))
                    .alias("ws_us"),
                    F.unix_micros(F.col("w.end").cast("timestamp_ltz"))
                    .alias("we_us"),
                    "event_type", "n",
                    F.col("_s").cast("double").alias("sum_value")))


def start_windowed_stream(spark: SparkSession, events_dir: str,
                          out_dir: str, checkpoint_dir: str,
                          window: str = "1 hour",
                          horizon: str = "2 hours",
                          schema: str = EVENTS_SCHEMA):
    """events stream -> finalized windows appended to ``out_dir`` parquet
    (each window exactly once, once the watermark passes its end)."""
    ev = stream_events(spark, events_dir, schema).withWatermark("ts",
                                                                horizon)
    return (windowed_counts(ev, window)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
