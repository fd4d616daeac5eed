"""Streaming session rollup == batch native rollup == batch window twin.

Append-mode emission protocol: the watermark ("40 days") exceeds the real
data's 30-day span, so no real event is ever late regardless of file
order; two far-future sentinel files (one event per user at +100d/+250d),
written last, advance the watermark past every real session's end so
append mode flushes them all. Sentinel sessions are excluded by their
start time. The batch/stream boundary caveat (half-open native windows at
exactly-threshold gaps) is vacuous here: the parity gate first asserts the
input carries no exact-threshold gap.
"""

import glob
import time

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.sessions import (DEFAULT_GAP_US,
                                                       session_rollup_native,
                                                       session_stats)
from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.streaming.sessions import (stream_events,
                                                       stream_session_rollup)

EV = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-sessions", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_batch_native_equals_window_twin(spark):
    ev = spark.read.parquet(EV)
    # exact-threshold gaps are the one boundary the two formulations
    # disagree on; assert the fixture has none
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    exact = (ev.withColumn("gap", us - F.lag(us).over(w))
             .filter(F.col("gap") == DEFAULT_GAP_US).count())
    assert exact == 0
    a = sorted(map(tuple, session_stats(ev)
                   .select("user_id", "start_us", "end_us", "n_events")
                   .collect()))
    b = sorted(map(tuple, session_rollup_native(ev)
                   .select("user_id", "start_us", "end_us", "n_events")
                   .collect()))
    assert a == b and len(a) > 20


def test_stream_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    ev = spark.read.parquet(EV)
    ev.repartition(4).write.mode("overwrite").parquet(src)
    assert len(glob.glob(src + "/part-*")) >= 3
    max_ts = ev.agg(F.max("ts")).first()[0]
    users = [r.user_id for r in ev.select("user_id").distinct().collect()]
    # two sentinel flush files, strictly newer mtime so the file source
    # (oldest-first) processes them after every real file
    for i, days in enumerate((100, 250)):
        time.sleep(1.1)
        rows = [(10_000_000 + i * 1000 + u, u) for u in users]
        (spark.createDataFrame(rows, "event_id long, user_id long")
         .select("event_id",
                 (F.lit(max_ts) + F.expr(f"interval {days} days")).alias("ts"),
                 "user_id", F.lit("flush").alias("event_type"),
                 F.lit(0.0).alias("value"), F.lit("{}").alias("props"))
         .coalesce(1).write.mode("append").parquet(src))

    rollup = stream_session_rollup(stream_events(spark, src, 1),
                                   watermark="40 days")
    q = (rollup.writeStream.format("memory").queryName("sess_rollup")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(300)

    got = (spark.table("sess_rollup")
           .filter(F.col("start_us")
                   <= F.unix_micros(F.lit(max_ts).cast("timestamp_ltz"))))
    a = sorted(map(tuple, got.select("user_id", "start_us", "end_us",
                                     "n_events").collect()))
    b = sorted(map(tuple, session_rollup_native(ev)
                   .select("user_id", "start_us", "end_us", "n_events")
                   .collect()))
    assert a == b and len(a) > 20
