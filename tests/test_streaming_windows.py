"""Watermarked tumbling-window streaming: batch==stream equality on
finalized windows, exactly-once emission across a checkpoint restart,
and the watermark's late-data boundary."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.streaming.windows import (
    start_windowed_stream, windowed_counts)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
US_H = 3_600_000_000


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-windows", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _await(q):
    assert q.awaitTermination(300), "stream did not finish in 300 s"


def _events(spark, i0, n, hour0=0):
    rows = [(i0 + i,
             T0 + dt.timedelta(hours=hour0, minutes=7 * i % 600),
             i % 9,
             ("click", "view", "error")[i % 3],
             round((i % 500) + 0.25, 2))
            for i in range(n)]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def _rows(df):
    return sorted((r.ws_us, r.we_us, r.event_type, r.n, r.sum_value)
                  for r in df.collect())


def test_stream_matches_batch_on_finalized_windows(spark, tmp_path):
    ev_dir, out, ckpt = (str(tmp_path / d) for d in
                         ("ev", "out", "ckpt"))
    ev = _events(spark, 0, 400)  # spans 10 hours
    ev.write.parquet(ev_dir)
    _await(start_windowed_stream(spark, ev_dir, out, ckpt,
                                 horizon="2 hours"))
    got = spark.read.parquet(out)
    # final watermark = max ts - 2h: only windows ending at or before it
    # are finalized and emitted
    max_us = ev.agg(F.max(F.unix_micros(
        F.col("ts").cast("timestamp_ltz")))).first()[0]
    want = windowed_counts(ev).filter(
        F.col("we_us") <= max_us - 2 * US_H)
    assert _rows(got) == _rows(want)
    assert got.count() > 0


def test_increment_flushes_and_emits_exactly_once(spark, tmp_path):
    ev_dir, out, ckpt = (str(tmp_path / d) for d in
                         ("ev", "out", "ckpt"))
    os.makedirs(ev_dir)
    first = _events(spark, 0, 200)           # hours 0..10
    first.write.mode("append").parquet(ev_dir)
    _await(start_windowed_stream(spark, ev_dir, out, ckpt,
                                 horizon="2 hours"))
    n1 = spark.read.parquet(out).count()

    second = _events(spark, 1000, 200, hour0=12)  # hours 12..22
    second.write.mode("append").parquet(ev_dir)
    _await(start_windowed_stream(spark, ev_dir, out, ckpt,
                                 horizon="2 hours"))
    got = spark.read.parquet(out)
    both = first.unionByName(second)
    max_us = both.agg(F.max(F.unix_micros(
        F.col("ts").cast("timestamp_ltz")))).first()[0]
    want = windowed_counts(both).filter(
        F.col("we_us") <= max_us - 2 * US_H)
    assert _rows(got) == _rows(want)
    assert got.count() > n1          # the increment flushed new windows
    # exactly once: no (window, type) appears twice across increments
    assert got.groupBy("ws_us", "event_type").count() \
              .filter(F.col("count") > 1).count() == 0