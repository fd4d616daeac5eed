"""Streaming sessionization: the batch session rollup maintained
incrementally over an event stream.

Uses Spark's native stateful ``session_window`` aggregation — the same
expression as the batch ``operators/sessions.session_rollup_native`` —
over a watermarked file stream. State per open session is one (user,
window, count) row; the watermark closes sessions whose window end falls
behind it, so state is bounded by the session horizon, not the stream
length. In append output mode a session row emits exactly once, when the
watermark passes its end — the semantics a downstream incremental
consumer (per-session features, rate limits, session-level quality
signals) wants at crawl scale.

Scale shape matches the batch twin: one shuffle on (user, window-merge
key); late events inside the watermark merge into their session, later
ones are dropped — the documented trade every streaming session system
makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sessions import DEFAULT_GAP_US

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_events(spark: SparkSession, events_dir: str,
                  max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir))


def stream_session_rollup(events_stream: DataFrame,
                          gap_us: int = DEFAULT_GAP_US,
                          watermark: str = "1 day",
                          user_col: str = "user_id",
                          ts_col: str = "ts") -> DataFrame:
    """Watermarked stateful session rollup; append-mode safe.

    Identical aggregation expression to the batch
    ``session_rollup_native`` — the parity gate runs both on the same
    finite input (tests/test_streaming_sessions.py)."""
    gap_str = f"{gap_us} microseconds"
    return (events_stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.col(user_col),
                     F.session_window(F.col(ts_col), gap_str).alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(user_col,
                    F.unix_micros(F.col("w.start").cast("timestamp_ltz"))
                     .alias("start_us"),
                    (F.unix_micros(F.col("w.end").cast("timestamp_ltz"))
                     - F.lit(gap_us)).alias("end_us"),
                    "n_events"))
