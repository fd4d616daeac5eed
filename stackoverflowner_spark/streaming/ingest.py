"""Structured Streaming ingest variant (optional per SURVEY.md §1.2).

The reference is strictly batch (corpus in, files out); at web scale the
natural deployment is incremental: a stream of newly crawled pages appended
to the pages table, mentions/triples maintained continuously. This module
wires the SAME document kernel into readStream -> transform -> writeStream:

* file-source stream over a pages parquet directory (stand-in for an Iceberg
  streaming read / Kafka crawl feed),
* the fused pages->mentions kernel applied as-is (mapInPandas works on
  streaming DataFrames),
* watermarked sliding-window mention counts as the stateful example,
* foreachBatch triple upsert (dedup against the batch — idempotent appends).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.document_kernel import MAX_HTML_BYTES, pages_to_mentions_fused
from ..operators.link import link
from ..operators.tagger import GazetteerTagger
from ..operators.triples import triples_from_linked
from ..sources.dictionary import dictionary_df
from ..sources.pages import PAGES_SCHEMA


def stream_pages(spark: SparkSession, pages_dir: str,
                 max_files_per_trigger: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_dir)
    )


def stream_mentions(pages_stream: DataFrame, tagger=None) -> DataFrame:
    return pages_to_mentions_fused(pages_stream, tagger or GazetteerTagger())


def windowed_mention_counts(pages_stream: DataFrame, tagger=None,
                            window: str = "10 minutes",
                            slide: str = "5 minutes",
                            watermark: str = "15 minutes") -> DataFrame:
    """Stateful example: mention counts per entity surface in sliding event-
    time windows of warc_ts with a late-data watermark. A dedicated kernel
    wrapper carries the event time through the Python stage so no
    stream-stream join is needed."""
    import pandas as pd

    from ..kernel.conlleval import extract_chunks
    from ..kernel.htmltext import ExtractionError, extract_text
    from ..kernel.sentencize import sentencize
    from ..kernel.bio import sentence_token_tags
    from ..kernel.sotok import TokenizerGuardError

    from ..operators.document_kernel import _tagger_broadcast
    bc = _tagger_broadcast(pages_stream.sparkSession, tagger or GazetteerTagger())

    def run(batches):
        tagger = bc.value
        batch_tag = getattr(tagger, "tag_sentences", None)
        for pdf in batches:
            # collect the micro-batch's sentences first so taggers with a
            # batched decode (memoized batched Viterbi) amortize across the
            # batch — the same phase structure as the fused batch kernel;
            # per-sentence grouping and tags are identical (gated)
            sents = []  # (url, ts, tokens, md_tags)
            for url, ts, html, text in zip(pdf["url"], pdf["warc_ts"],
                                           pdf["html"], pdf["text"]):
                try:
                    # same cap + null-row discipline as the fused batch kernel
                    # (document_kernel.pages_to_mentions_fused): a row with
                    # neither html nor text is allowed by PAGES_SCHEMA and
                    # must not fail the micro-batch
                    if html is not None:
                        extracted = extract_text(
                            bytes(html)[:MAX_HTML_BYTES].decode("utf-8", "replace"))
                    elif text is not None:
                        extracted = text[:MAX_HTML_BYTES]
                    else:
                        continue
                    final, anns = sentencize(extracted, url.rsplit("/", 1)[-1])
                    per_sent = sentence_token_tags(final, anns)
                except (ExtractionError, TokenizerGuardError):
                    continue
                for _sent_idx, toks, mds in per_sent:
                    sents.append((url, ts, toks, mds))
            if batch_tag is not None:
                all_tags = batch_tag([(t, m) for _, _, t, m in sents])
            else:
                all_tags = [tagger.tag(t, m) for _, _, t, m in sents]
            out = []
            for (url, ts, tokens, _mds), tags in zip(sents, all_tags):
                for typ, a, b in extract_chunks(tags):
                    out.append((url, ts, " ".join(tokens[a:b]).lower()))
            yield pd.DataFrame(out, columns=["url", "warc_ts", "surface_norm"])

    mentions_ts = pages_stream.select(
        "url", "warc_ts", "html",
        F.when(F.col("html").isNull(), F.col("text")).alias("text")).mapInPandas(
        run, schema="url string, warc_ts timestamp, surface_norm string")
    return (
        mentions_ts.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window, slide), F.col("surface_norm"))
        .agg(F.count("*").alias("n_mentions"))
    )


def start_triples_stream(spark: SparkSession, pages_dir: str, out_dir: str,
                         checkpoint_dir: str, tagger=None,
                         doc_consistency: bool = False):
    """pages stream -> triples parquet via foreachBatch (exactly-once per
    batch through the streaming checkpoint + idempotent batch dedup).

    ``doc_consistency`` threads the document-level label-consistency pass
    (kernel/docconsist.py) into the fused kernel; it is per-PAGE state, and
    a page row is always whole within its micro-batch, so the streaming
    result stays identical to the batch run at the same flag (gated in
    tests/test_streaming_consistency.py). Default off to match the plain
    fused kernel; KGPipeline's batch default is on.
    """
    dictionary = dictionary_df(spark)
    tagger = tagger or GazetteerTagger()

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        mentions = pages_to_mentions_fused(batch_df, tagger,
                                           doc_consistency=doc_consistency)
        triples = triples_from_linked(link(mentions, dictionary))
        (triples.withColumn("batch_id", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return (
        stream_pages(spark, pages_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
