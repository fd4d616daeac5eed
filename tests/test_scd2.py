"""SCD2 crawl-history dimension (operators/scd2.py).

Gates: (a) history vs the identical SQL in DuckDB, strict bitwise;
(b) incremental upsert == full batch rebuild, exactly, including urls
absent from the batch (byte-identical rows) and unchanged-hash batch
rows (no new version); (c) as-of reads reconstruct every snapshot's
content; (d) unchanged recrawls create no rows (dimension grows with
changes, not crawls).
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.scd2 import (SCD2_ORACLE_SQL, as_of,
                                                   scd2_history, scd2_upsert)
from stackoverflowner_spark.session import get_spark

SCHEMA = "url string, warc_ts timestamp, content_hash string"

HIST_COLS = ["url", "content_hash", "valid_from_us", "valid_to_us",
             "version", "is_current"]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-scd2", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _snaps(spark, n_urls=40, n_crawls=12):
    """Deterministic crawl log: content changes on a per-url cadence, so
    runs of unchanged snapshots are common (the collapse case)."""
    return (spark.range(n_urls * n_crawls)
            .withColumn("u", (F.col("id") % n_urls))
            .withColumn("c", (F.col("id") / n_urls).cast("long"))
            .select(
                F.concat(F.lit("https://site/"), F.col("u")).alias("url"),
                F.timestamp_micros(
                    F.lit(1_700_000_000_000_000)
                    + F.col("c") * 86_400_000_000
                    + F.col("u") * 1_000_000).alias("warc_ts"),
                F.concat(F.lit("h"), F.col("u"), F.lit("_"),
                         (F.col("c") / (F.col("u") % 4 + 1))
                         .cast("long")).alias("content_hash")))


def _pd(df):
    return df.select(*HIST_COLS).toPandas()


def test_history_matches_duckdb_oracle(spark, tmp_path):
    snaps = _snaps(spark)
    p = str(tmp_path / "snaps")
    snaps.write.parquet(p)
    got = _pd(scd2_history(spark.read.parquet(p)))
    con = duckdb.connect()
    con.execute(f"create view snaps as select * from read_parquet('{p}/part-*')")
    oracle = con.execute(SCD2_ORACLE_SQL).df()
    from .oracle_harness import compare
    assert len(got) > 100, "collapse made the history vacuous"
    assert not compare("scd2", got, oracle, strict=True)
    # collapse really happened: fewer versions than snapshots
    assert len(got) < snaps.count()


def test_upsert_equals_batch_rebuild(spark):
    snaps = _snaps(spark).cache()
    # split: first 9 crawls are the standing dimension, last 3 arrive as
    # a batch covering only half the urls (the rest must be untouched)
    cut = F.col("warc_ts") < F.timestamp_micros(
        F.lit(1_700_000_000_000_000 + 9 * 86_400_000_000))
    old, new = snaps.filter(cut), snaps.filter(~cut)
    batch = new.filter(F.xxhash64("url") % 2 == 0)
    hist = scd2_history(old)
    merged = scd2_upsert(hist, batch)
    rebuilt = scd2_history(old.unionByName(batch))
    from .oracle_harness import compare
    assert len(_pd(merged)) > 50
    assert not compare("scd2_upsert", _pd(merged), _pd(rebuilt), strict=True)
    # a batch whose rows all repeat current hashes is a no-op
    currents = (hist.filter("is_current")
                .select("url", F.timestamp_micros(
                    F.col("valid_from_us") + 999).alias("warc_ts"),
                    "content_hash"))
    noop = scd2_upsert(hist, currents)
    assert not compare("scd2_noop", _pd(noop), _pd(hist), strict=True)


def test_as_of_reconstructs_snapshots(spark):
    snaps = _snaps(spark, n_urls=15, n_crawls=8).cache()
    hist = scd2_history(snaps).cache()
    for crawl in (0, 3, 7):
        ts_us = 1_700_000_000_000_000 + crawl * 86_400_000_000 + 500_000_000
        live = {(r.url, r.content_hash) for r in as_of(hist, ts_us).collect()}
        truth = {(r.url, r.content_hash) for r in
                 (snaps.withColumn(
                     "us", F.unix_micros(F.col("warc_ts")
                                         .cast("timestamp_ltz")))
                  .filter(F.col("us") <= ts_us)
                  .withColumn("rn", F.row_number().over(
                      __import__("pyspark").sql.Window
                      .partitionBy("url").orderBy(F.desc("us"))))
                  .filter("rn = 1").collect())}
        assert live == truth and len(live) == 15
