"""Incremental (streaming) exact dedup over a growing documents table.

The batch ``operators.dedup.exact_dedup`` answers "which rows survive in a
fixed corpus"; an incremental crawl needs the streaming form: as new
document files land, emit each previously-unseen normalized text ONCE and
silently drop re-crawls — without re-scanning the accumulated corpus per
increment. Structured Streaming's ``dropDuplicates`` keeps the seen-key set
in the state store, so each micro-batch does O(batch) work against state
lookups, not O(corpus) recomputation.

State-size story at 100 TB: the state key is the 32-char md5 of the
normalized text (not the text), so state is ~32 B x distinct documents —
the same cardinality any dedup must track somewhere. With an event-time
column, ``withWatermark`` + ``dropDuplicatesWithinWatermark`` bounds state
to the dedup horizon (re-crawls arriving within N days are dropped, older
state is evicted); the unbounded variant below is the exact-history form
the driver fixtures (no event time) exercise.

Ordering caveat (inherent to streams): the surviving doc_id for a given
content hash is the FIRST ARRIVAL, which depends on file/partition order —
unlike the batch operator's deterministic min-id keeper. The parity gate
therefore compares the surviving content-hash SET (and one-per-hash), not
keeper ids; a pipeline needing deterministic keepers runs the batch
operator over the deduped stream's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text

DOCS_SCHEMA = "doc_id long, text string"


def stream_documents(spark: SparkSession, docs_dir: str,
                     schema: str = DOCS_SCHEMA,
                     max_files_per_trigger: int = 4) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(docs_dir))


def dedup_stream(docs_stream: DataFrame, text_col: str = "text",
                 watermark_col: str | None = None,
                 horizon: str = "7 days") -> DataFrame:
    """Append-mode stream of first-seen documents.

    With ``watermark_col`` set (an event-time column), state is bounded to
    ``horizon`` via ``dropDuplicatesWithinWatermark``; without it, state
    grows with distinct content (exact-history dedup).
    """
    hashed = docs_stream.withColumn("content_hash",
                                    F.md5(normalized_text(text_col)))
    if watermark_col is not None:
        return (hashed.withWatermark(watermark_col, horizon)
                .dropDuplicatesWithinWatermark(["content_hash"]))
    return hashed.dropDuplicates(["content_hash"])


def start_dedup_stream(spark: SparkSession, docs_dir: str, out_dir: str,
                       checkpoint_dir: str,
                       schema: str = DOCS_SCHEMA):
    """documents stream -> first-seen rows appended to ``out_dir`` parquet
    (exactly-once through the streaming checkpoint)."""
    return (dedup_stream(stream_documents(spark, docs_dir, schema))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start())
