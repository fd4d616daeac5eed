"""Streaming HyperLogLog: incremental distinct-count registers over a
growing crawl.

The batch ``operators.sketch.hll_sketch`` answers "distinct values per
key in a fixed corpus"; the crawl-bookkeeping form is incremental — as
new document files land, per-key registers must advance WITHOUT
re-scanning the accumulated corpus. Because a register is a running
``max(rho)``, the sketch is exactly the kind of aggregation Structured
Streaming keeps in the state store: each micro-batch does O(batch) work
against O(keys · m) state rows (m = 256 registers at b=8 — a few KB per
key, regardless of corpus size), and the SAME projection expression is
shared verbatim with the batch operator, so stream registers equal the
batch registers over the same input bit-for-bit (max is commutative,
idempotent, and order-free — no streaming-vs-batch caveat at all, unlike
the dedup keeper-id note in streaming/dedup.py).

Sink shape: ``complete`` mode into an in-memory/console-sized table is
fine because the OUTPUT is the register table, bounded at O(keys · m)
rows — the one streaming aggregation whose full result is always small
enough to re-emit. Estimates are read off the sink snapshot with the
batch ``hll_estimate`` (streaming multi-aggregation is not supported,
and the estimate is a per-key fold over <= m rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketch import cm_sketch, hll_sketch

DOCS_SCHEMA = "doc_id long, text string, source string"


def stream_documents(spark: SparkSession, docs_dir: str,
                     schema: str = DOCS_SCHEMA,
                     max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def hll_register_stream(docs_stream: DataFrame, keys: list[str],
                        value: str, b: int = 8) -> DataFrame:
    """The register table as a streaming aggregation — literally the
    batch operator applied to a streaming source: groupBy(keys, reg)
    .max(rho) is a supported stateful agg, state = one row per occupied
    (key, register)."""
    return hll_sketch(docs_stream, keys, value, b)


def start_hll_stream(spark: SparkSession, docs_dir: str,
                     checkpoint_dir: str, table_name: str,
                     keys: list[str], value: str, b: int = 8,
                     schema: str = DOCS_SCHEMA):
    """documents stream -> complete-mode register snapshot in the
    in-memory table ``table_name`` (registers are O(keys · m), the one
    always-small streaming aggregate); state survives restarts through
    the checkpoint, so each new crawl increment advances registers in
    O(increment)."""
    regs = hll_register_stream(stream_documents(spark, docs_dir, schema),
                               keys, value, b)
    return (regs.writeStream.format("memory")
            .queryName(table_name)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start())


def start_cm_stream(spark: SparkSession, docs_dir: str,
                    checkpoint_dir: str, table_name: str,
                    keys: list[str], value: str,
                    d: int = 3, w: int = 4096,
                    schema: str = DOCS_SCHEMA):
    """The Count-Min counterpart: counts are additive, so the d x w
    counter matrix is the other always-small streaming aggregate
    (state/output <= keys * d * w rows). Stream counters equal the
    batch counters bitwise for the same reason as HLL's max — sum is
    commutative and order-free over exact integers."""
    counters = cm_sketch(stream_documents(spark, docs_dir, schema),
                         keys, value, d=d, w=w)
    return (counters.writeStream.format("memory")
            .queryName(table_name)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start())
