"""SCD2 crawl-history dimension: effective-dated page versions.

A recrawl pipeline needs more than the latest snapshot
(``operators/crawldiff.py`` answers "what changed between two crawls");
provenance and as-of reprocessing need the full version history: for
every url, WHICH content was live WHEN. That is the classic type-2
slowly-changing dimension, built here from raw crawl snapshots:

    snapshots(url, warc_ts, content_hash, ...attrs)
      -> history(url, content_hash, valid_from_us, valid_to_us,
                 version, is_current)

Consecutive snapshots with the same content_hash collapse into one
validity interval (a recrawl that found the page unchanged extends no
interval and creates no row — the dimension grows with CHANGES, not
crawls). ``valid_to_us`` is the next version's start (NULL while
current); intervals are half-open [from, to).

Scale shape (10^12 snapshots, north rule): one shuffle on url for the
change-point window (lag + running sum), one (url, run)-keyed agg, one
url window for lead/version. Everything is JVM window/agg machinery —
no Python, no driver state; urls are independent so the job partitions
perfectly. The incremental path ``scd2_upsert`` folds a new crawl batch
into an existing dimension touching only the urls present in the batch
(broadcast- or shuffle-joined by size): close out changed current rows,
append new versions, leave every other url's rows byte-identical — and
``tests/test_scd2.py`` gates upsert(history(A), B) == history(A ∪ B)
exactly, the same incremental==batch discipline the streaming twins
use.

Precondition: (url, warc_ts) unique within the input (true of WARC
crawl logs; assert upstream if unsure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col: str) -> F.Column:
    return F.unix_micros(F.col(col).cast("timestamp_ltz"))


def scd2_history(snaps: DataFrame, key: str = "url",
                 ts: str = "warc_ts",
                 attr: str = "content_hash") -> DataFrame:
    """Collapse raw snapshots into effective-dated version rows."""
    w = Window.partitionBy(key).orderBy(ts)
    runs = (snaps
            .withColumn("_chg", F.when(
                F.lag(attr).over(w).isNull()
                | (F.lag(attr).over(w) != F.col(attr)), 1).otherwise(0))
            .withColumn("_rid", F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    grp = (runs.groupBy(key, attr, "_rid")
           .agg(F.min(_us(ts)).alias("valid_from_us")))
    wv = Window.partitionBy(key).orderBy("valid_from_us")
    return (grp
            .withColumn("valid_to_us", F.lead("valid_from_us").over(wv))
            .withColumn("version", F.row_number().over(wv))
            .withColumn("is_current", F.col("valid_to_us").isNull())
            .drop("_rid"))


SCD2_ORACLE_SQL = """
    with o as (select url, warc_ts, content_hash,
                      lag(content_hash) over
                        (partition by url order by warc_ts) as prev
               from snaps),
    runs as (select *, sum(case when prev is null or prev <> content_hash
                               then 1 else 0 end)
                        over (partition by url order by warc_ts
                              rows unbounded preceding) as rid
             from o),
    grp as (select url, content_hash, rid,
                   min(epoch_us(warc_ts)) as valid_from_us
            from runs group by 1, 2, 3)
    select url, content_hash, valid_from_us,
           lead(valid_from_us) over
             (partition by url order by valid_from_us) as valid_to_us,
           cast(row_number() over
             (partition by url order by valid_from_us) as int) as version,
           (lead(valid_from_us) over
             (partition by url order by valid_from_us) is null) as is_current
    from grp"""


def scd2_upsert(hist: DataFrame, batch: DataFrame, key: str = "url",
                ts: str = "warc_ts",
                attr: str = "content_hash") -> DataFrame:
    """Fold a new crawl batch into an existing SCD2 dimension.

    Only the batch's urls are touched: their history rows and batch
    snapshots are re-run through ``scd2_history`` together (versions
    within a url are few — this is NOT a rebuild over all snapshots,
    the collapsed history stands in for them), then stitched back over
    the untouched urls. A batch row whose hash equals the url's current
    version extends nothing and creates nothing.

    Precondition: every batch timestamp is >= the url's current
    valid_from (out-of-order backfills need the batch rebuild path).
    """
    touched_keys = batch.select(key).distinct()
    untouched = hist.join(touched_keys, key, "left_anti")
    # replay the touched urls' existing versions as pseudo-snapshots at
    # their valid_from instants, merged with the new batch rows
    replay = (hist.join(touched_keys, key, "left_semi")
              .select(key,
                      F.timestamp_micros(F.col("valid_from_us")).alias(ts),
                      attr))
    merged = replay.unionByName(batch.select(key, ts, attr))
    redone = scd2_history(merged, key=key, ts=ts, attr=attr)
    return untouched.unionByName(redone)


def as_of(hist: DataFrame, ts_us: int) -> DataFrame:
    """The dimension as of an instant: rows whose [from, to) covers it."""
    return hist.filter((F.col("valid_from_us") <= ts_us)
                       & (F.col("valid_to_us").isNull()
                          | (F.col("valid_to_us") > ts_us)))
