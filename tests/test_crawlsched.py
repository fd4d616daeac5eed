"""Crawl-schedule gates: salted two-pass slots equal the plain window
exactly (incl. a 90%-head-host skew fixture), slots are a dense
0..n-1 per host, determinism under reshuffle, timestamp arithmetic."""

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.crawlsched import (
    crawl_schedule, plain_schedule)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-crawlsched", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _urls(spark, n=400, hosts=5, head_frac=0.0):
    rows = []
    for i in range(n):
        if head_frac and i < n * head_frac:
            h = "head.example.com"
        else:
            h = f"h{i % hosts}.example.com"
        rows.append((h, f"https://{h}/p/{i}"))
    return spark.createDataFrame(rows, "host string, url string")


def _slots(df):
    return sorted((r.host, r.url, r.slot, r.fetch_us) for r in df.collect())


def test_salted_equals_plain_window(spark):
    u = _urls(spark)
    assert _slots(crawl_schedule(u)) == _slots(plain_schedule(u))


def test_salted_equals_plain_on_head_host_skew(spark):
    u = _urls(spark, n=600, head_frac=0.9)
    assert _slots(crawl_schedule(u)) == _slots(plain_schedule(u))


def test_slots_dense_per_host(spark):
    u = _urls(spark, n=300, hosts=3)
    got = crawl_schedule(u).groupBy("host").agg(
        F.count("*").alias("n"), F.min("slot").alias("lo"),
        F.max("slot").alias("hi"),
        F.count_distinct("slot").alias("d")).collect()
    for r in got:
        assert (r.lo, r.hi, r.d) == (0, r.n - 1, r.n)


def test_schedule_deterministic_under_reshuffle(spark):
    u = _urls(spark, n=250)
    a = _slots(crawl_schedule(u))
    b = _slots(crawl_schedule(u.orderBy(F.rand(7)).repartition(9)))
    assert a == b


def test_fetch_us_arithmetic(spark):
    u = _urls(spark, n=40, hosts=2)
    got = crawl_schedule(u, start_us=1000, interval_us=250).collect()
    for r in got:
        assert r.fetch_us == 1000 + r.slot * 250