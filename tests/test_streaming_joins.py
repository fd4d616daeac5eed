"""Stream-stream attribution join == batch twin == DuckDB oracle.

The inner stream-stream join emits a row as soon as both sides have
arrived, so availableNow processing over a finite directory yields the
complete result without sentinel flush files (unlike the append-mode
aggregations in test_streaming_sessions.py). The watermark (40 days)
exceeds the fixture's 30-day span so no real row is ever dropped as
late regardless of file arrival order — the gate is exact equality.
"""

import glob

import pytest

from stackoverflowner_spark.session import get_spark
from stackoverflowner_spark.streaming.joins import (
    ATTRIBUTION_ORACLE_SQL, attribution_join_batch,
    attribution_join_stream, stream_events)

EV = "/root/testdata/sf0.001/events.parquet"

COLS = ["user_id", "click_id", "purchase_id", "purchase_value",
        "click_us", "purchase_us"]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-stream-joins", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_batch_matches_duckdb_oracle(spark):
    import duckdb
    got = attribution_join_batch(spark.read.parquet(EV)).toPandas()
    con = duckdb.connect()
    con.execute(f"create view events as "
                f"select * from read_parquet('{EV}')")
    oracle = con.execute(ATTRIBUTION_ORACLE_SQL).df()
    from .oracle_harness import compare
    assert len(got) > 20, "attribution join is vacuous on the fixture"
    assert not compare("attribution", got, oracle, strict=True)


def test_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    ev = spark.read.parquet(EV)
    ev.repartition(6).write.mode("overwrite").parquet(src)
    assert len(glob.glob(src + "/part-*")) >= 4

    out = attribution_join_stream(stream_events(spark, src, 2))
    q = (out.writeStream.format("memory").queryName("attr_join")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)

    streamed = sorted(map(tuple, spark.table("attr_join")
                          .select(*COLS).collect()))
    batch = sorted(map(tuple, attribution_join_batch(ev)
                       .select(*COLS).collect()))
    assert streamed == batch and len(batch) > 20


def test_stream_plan_is_stateful_hash_join(spark, tmp_path):
    """The streaming plan must be a partitioned stateful symmetric hash
    join keyed on the user equi-column — never a nested loop."""
    src = str(tmp_path / "events")
    spark.read.parquet(EV).coalesce(2).write.mode("overwrite").parquet(src)
    out = attribution_join_stream(stream_events(spark, src, 2))
    q = (out.writeStream.format("memory").queryName("attr_plan")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    last = q.lastProgress
    assert last is not None
    # the memory sink table is a LocalTableScan; the stream's own
    # execution is visible through the progress' state operators
    ops = [op for batch in [last] for op in (batch["stateOperators"] or [])]
    names = {o.get("operatorName", "") for o in ops}
    assert any("symmetricHashJoin" in n or "streamingSymmetricHashJoin" in n
               for n in names), names
