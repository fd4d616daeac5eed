"""Watermarked stream-stream join: click->purchase attribution.

The one Structured Streaming state shape the streaming family did not
yet cover: a two-sided stateful JOIN. Each purchase is attributed to
every click by the same user in the preceding ``window`` — the canonical
stream-stream example shape (default 2 days, sized to the sparse
synthetic fixture; crawl-side equivalents: fetch->parse correlation,
request->response pairing, mention->link evidence within a crawl
window).

Semantics and scale notes (north rule: 10^12-row streams):

* Both sides carry an event-time watermark AND the join predicate bounds
  click_ts to [purchase_ts - window, purchase_ts]. Spark derives the
  state retention from the two together: a buffered click can be evicted
  once the purchase-side watermark passes click_ts + window, so state is
  O(rows inside the watermark+window horizon), never the stream prefix.
* The equi-key (user_id) makes the join a hash-partitioned stateful
  join — both sides shuffle on user_id exactly like the batch plan; no
  broadcast-nested-loop shape can arise.
* INNER join rows emit as soon as both sides have arrived (no
  watermark-flush latency); the left-outer variant would additionally
  emit null-padded clicks only when the watermark proves no purchase can
  still match — the same availableNow flush caveat
  ``streaming/sessions.py`` documents.

The batch twin ``attribution_join_batch`` is the identical expression on
a static DataFrame; tests/test_streaming_joins.py gates stream == batch
== DuckDB oracle on the same finite input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def stream_events(spark: SparkSession, events_dir: str,
                  max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(events_dir))


def _sides(events: DataFrame):
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("ts").alias("click_ts"),
                      F.col("user_id").alias("c_user")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("user_id").alias("p_user"),
                         F.col("value").alias("purchase_value")))
    return clicks, purchases


def _joined(clicks: DataFrame, purchases: DataFrame,
            window: str) -> DataFrame:
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts")
               >= F.col("purchase_ts") - F.expr(f"interval {window}")))
    return (clicks.join(purchases, cond)
            .select(F.col("c_user").alias("user_id"),
                    "click_id", "purchase_id", "purchase_value",
                    F.unix_micros(F.col("click_ts")
                                  .cast("timestamp_ltz")).alias("click_us"),
                    F.unix_micros(F.col("purchase_ts")
                                  .cast("timestamp_ltz"))
                    .alias("purchase_us")))


def attribution_join_stream(events_stream: DataFrame,
                            window: str = "2 days",
                            watermark: str = "40 days") -> DataFrame:
    """Stream-stream inner join; state bounded by watermark + window."""
    clicks, purchases = _sides(events_stream)
    return _joined(clicks.withWatermark("click_ts", watermark),
                   purchases.withWatermark("purchase_ts", watermark),
                   window)


def attribution_join_batch(events: DataFrame,
                           window: str = "2 days") -> DataFrame:
    """The identical join expression on a static DataFrame."""
    clicks, purchases = _sides(events)
    return _joined(clicks, purchases, window)


ATTRIBUTION_ORACLE_SQL = """
    select c.user_id,
           c.event_id as click_id,
           p.event_id as purchase_id,
           p.value as purchase_value,
           epoch_us(c.ts) as click_us,
           epoch_us(p.ts) as purchase_us
    from events c
    join events p on c.user_id = p.user_id
                 and c.event_type = 'click'
                 and p.event_type = 'purchase'
                 and c.ts <= p.ts
                 and c.ts >= p.ts - interval 2 day"""
