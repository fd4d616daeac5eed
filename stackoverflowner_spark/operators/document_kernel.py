"""Distributed document kernel: pages -> extracted -> sentences -> mentions.

This is the engine's hot path. Everything per-document is row-local, so the
whole chain is *narrow* — pages are read, one ``mapInPandas`` runs the text
kernel, and downstream token/mention tables are derived with narrow
``posexplode``s. The first shuffle in the flagship pipeline happens only at
triple aggregation. At 100 TB that matters more than anything else: no
sentence-regroup shuffle exists because tokens never leave their sentence row
until they are exploded for purely columnar consumers.

Stage mirror of the reference trace (SURVEY.md §3.1):
  extract   = Extract_Text_From_XML + tokenize_and_annotae_post_body
  sentences = convert_standoff_to_conll (stokenizer + map_text_to_char + relabel)
  mentions  = gazetteer/model tagger + chunk extraction
"""

from __future__ import annotations

import json
from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.bio import sentence_token_tags, text_to_conll_rows
from ..kernel.conlleval import extract_chunks
from ..kernel.htmltext import ExtractionError, extract_text
from ..kernel.sentencize import Standoff, sentencize
from ..kernel.sotok import TokenizerGuardError

EXTRACTED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    T.StructField("final_text", T.StringType(), True),
    T.StructField("anns", T.ArrayType(T.StructType([
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("text", T.StringType()),
    ])), True),
    T.StructField("ok", T.BooleanType(), False),
    T.StructField("err", T.StringType(), True),
    T.StructField("truncated", T.BooleanType(), False),
])

SENTENCES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("sent_idx", T.IntegerType(), False),
    T.StructField("tokens", T.ArrayType(T.StringType()), False),
    T.StructField("md_tags", T.ArrayType(T.StringType()), False),
    T.StructField("starts", T.ArrayType(T.IntegerType()), False),
    T.StructField("ends", T.ArrayType(T.IntegerType()), False),
])


def extract_stage(pages: DataFrame, lang_filter: str | None = "en") -> DataFrame:
    """pages -> extracted. Column-pruned scan: only (url, html, text, lang)
    are read; the lang filter is pushed to the parquet scan before the UDF."""
    if lang_filter:
        pages = pages.filter(F.col("lang") == lang_filter)
    # text is the html-less fallback only: null it out when html exists so
    # the Arrow crossing ships one body per row, not two (rows commonly
    # carry both; this cuts Python-side ingress ~40% on such tables)
    cols = pages.select(
        "url", "html",
        F.when(F.col("html").isNull(), F.col("text")).alias("text"), "lang")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, html, text, lang in zip(pdf["url"], pdf["html"], pdf["text"], pdf["lang"]):
                trunc = False
                try:
                    if html is not None:
                        raw = bytes(html)
                        trunc = len(raw) > MAX_HTML_BYTES
                        extracted = extract_text(
                            raw[:MAX_HTML_BYTES].decode("utf-8", "replace"))
                    elif text is not None:
                        trunc = len(text) > MAX_HTML_BYTES
                        extracted = text[:MAX_HTML_BYTES]
                    else:
                        raise ExtractionError("row has neither html nor text")
                    final, anns = sentencize(extracted, url.rsplit("/", 1)[-1])
                    out.append((url, lang, final,
                                [(a.start, a.end, a.type, a.text) for a in anns],
                                True, None, trunc))
                except ExtractionError as e:
                    out.append((url, lang, None, None, False, f"extract:{e}", trunc))
            yield pd.DataFrame(out, columns=[
                "url", "lang", "final_text", "anns", "ok", "err", "truncated"])

    return cols.mapInPandas(run, schema=EXTRACTED_SCHEMA)


def sentences_stage(extracted: DataFrame) -> DataFrame:
    """extracted -> one row per sentence with aligned token/tag/offset arrays.

    Tokenizer-guard failures drop the whole document (the reference skips the
    file, anntoconll.py:265-269) and surface as rows with sent_idx == -1 so
    lineage can count them; callers filter ``sent_idx >= 0``.
    """
    rows = extracted.filter(F.col("ok")).select("url", "final_text", "anns")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, final_text, anns in zip(pdf["url"], pdf["final_text"], pdf["anns"]):
                spans = [Standoff(int(a["start"]), int(a["end"]), a["type"], a["text"])
                         for a in anns]
                try:
                    conll = text_to_conll_rows(final_text, spans)
                except TokenizerGuardError:
                    out.append((url, -1, [], [], [], []))
                    continue
                by_sent: dict = {}
                for r in conll:
                    by_sent.setdefault(r.sent_idx, []).append(r)
                for sent_idx, rs in by_sent.items():
                    out.append((
                        url, sent_idx,
                        [r.token for r in rs],
                        [r.tag for r in rs],
                        [r.start for r in rs],
                        [r.end for r in rs],
                    ))
            yield pd.DataFrame(
                out, columns=["url", "sent_idx", "tokens", "md_tags", "starts", "ends"])

    return rows.mapInPandas(run, schema=SENTENCES_SCHEMA)


def tokens_long(sentences: DataFrame) -> DataFrame:
    """Narrow explode to the token-level long table
    ``(url, sent_idx, tok_idx, token, md_tag, start, end)``."""
    z = sentences.filter(F.col("sent_idx") >= 0).select(
        "url", "sent_idx",
        F.posexplode(F.arrays_zip("tokens", "md_tags", "starts", "ends"))
        .alias("tok_idx", "z"),
    )
    return z.select(
        "url", "sent_idx", "tok_idx",
        F.col("z.tokens").alias("token"),
        F.col("z.md_tags").alias("md_tag"),
        F.col("z.starts").alias("start"),
        F.col("z.ends").alias("end"),
    )


MAX_HTML_BYTES = 2_000_000
"""Spill policy for pathological pages (SURVEY.md §4 'giant pages bounded'):
bodies above this cap are truncated at the cap before extraction and the row
is countable via the `truncated` observation column in extract_stage. A 2 MB
html body is ~50x the Common-Crawl median; beyond it the text is boilerplate
with vanishing mention yield, and unbounded rows are what OOM executors."""


# (applicationId, tagger id) -> (weak tagger ref, Broadcast). Bounded;
# stale-app entries pruned on miss, cleared wholesale past the cap.
_TAGGER_BC: dict = {}


def _tagger_broadcast(spark, tagger):
    """Ship the tagger as an explicit Broadcast instead of a task-closure
    capture.

    A learned tagger artifact is tens of MB of pickled numpy; captured in
    the UDF closure it is re-deserialized PER TASK, and at local[32] the 32
    concurrent cold unpickles (plus per-task cold feature caches) measured
    4-10x on the whole flagship versus this path — broadcast values are
    unpickled once per worker process and cached across tasks AND jobs, so
    the tagger's executor-local caches survive with them. Weakly keyed per
    (SparkContext, tagger) so repeated pipeline calls reuse one broadcast.
    """
    import weakref

    sc = spark.sparkContext
    # keyed on applicationId, not id(sc): bench.py restarts sessions
    # in-process, and a GC'd stopped context could hand its id() to a new
    # one, returning a destroyed Broadcast (ADVICE r4). applicationId is
    # unique per live context; stale-app entries are pruned eagerly below
    # instead of lingering until a size-triggered clear.
    app_id = sc.applicationId
    key = (app_id, id(tagger))
    hit = _TAGGER_BC.get(key)
    if hit is not None:
        ref, bc = hit
        if ref() is tagger:
            return bc
    for k in [k for k, (r, _) in _TAGGER_BC.items()
              if k[0] != app_id or r() is None]:
        _TAGGER_BC.pop(k, None)
    if len(_TAGGER_BC) > 16:
        _TAGGER_BC.clear()
    bc = sc.broadcast(tagger)
    _TAGGER_BC[key] = (weakref.ref(tagger), bc)
    return bc


def pages_to_mentions_fused(pages: DataFrame, tagger,
                            lang_filter: str | None = "en",
                            doc_consistency: bool = False) -> DataFrame:
    """Single-pass hot path: pages -> mentions in ONE mapInPandas.

    Same logical result as extract_stage |> sentences_stage |> mentions_stage
    (asserted in tests), but one Arrow crossing instead of three — at scale
    the kernel chain is store-and-forward per batch, so every extra hop adds
    a serialization round trip plus a Python worker in the task pipeline.
    The modular stages remain the checkpointed path (plans/pipeline.py).

    ``doc_consistency=True`` runs the document-level label-consistency
    post-pass (kernel/docconsist.py) on each page's tagged sentences before
    chunk extraction — a page IS the document and every page row is whole
    inside its Arrow batch, so the pass costs zero shuffle. Off by default
    here (the raw fused kernel stays bitwise-equal to the modular stage
    chain); KGPipeline enables it on both of its paths.
    """
    if lang_filter:
        pages = pages.filter(F.col("lang") == lang_filter)
    cols = pages.select(
        "url", "html",
        F.when(F.col("html").isNull(), F.col("text")).alias("text"))

    bc = _tagger_broadcast(pages.sparkSession, tagger)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = bc.value
        batch_tag = getattr(tagger, "tag_sentences", None)
        for pdf in batches:
            # phase 1: extract + sentencize the whole Arrow batch, collecting
            # every sentence so taggers with a batched decode amortize their
            # per-sentence numpy overhead across the batch
            sents = []  # (url, sent_idx, tokens, md_tags)
            for url, html, text in zip(pdf["url"], pdf["html"], pdf["text"]):
                try:
                    if html is not None:
                        body = bytes(html)[:MAX_HTML_BYTES].decode("utf-8", "replace")
                        extracted = extract_text(body)
                    elif text is not None:
                        extracted = text[:MAX_HTML_BYTES]
                    else:
                        continue
                    final, anns = sentencize(extracted, url.rsplit("/", 1)[-1])
                    # per-sentence arrays directly — no per-token row
                    # objects, no regroup dict (bitwise-equal to the
                    # text_to_conll_rows grouping, gated vs the modular
                    # stage chain)
                    per_sent = sentence_token_tags(final, anns)
                except (ExtractionError, TokenizerGuardError):
                    continue
                for sent_idx, toks, mds in per_sent:
                    sents.append((url, sent_idx, toks, mds))
            # phase 2: tag (batched when supported — same outputs, gated)
            if batch_tag is not None:
                all_tags = batch_tag([(toks, mds) for _, _, toks, mds in sents])
            else:
                all_tags = [tagger.tag(toks, mds) for _, _, toks, mds in sents]
            # phase 2b (opt-in): per-document label-consistency — sentences
            # of one page are contiguous in `sents`, so group runs suffice
            if doc_consistency and sents:
                from ..kernel.docconsist import doc_postpass
                all_tags = list(all_tags)
                i = 0
                while i < len(sents):
                    j = i
                    while j < len(sents) and sents[j][0] == sents[i][0]:
                        j += 1
                    all_tags[i:j] = doc_postpass(
                        [s[2] for s in sents[i:j]], all_tags[i:j])
                    i = j
            # phase 3: chunk extraction
            out = []
            for (url, sent_idx, tokens, _mds), tags in zip(sents, all_tags):
                for typ, a, b in extract_chunks(tags):
                    surface = " ".join(tokens[a:b])
                    out.append((url, sent_idx, a, b, surface,
                                surface.lower(), typ))
            yield pd.DataFrame(out, columns=[
                "url", "sent_idx", "tok_start", "tok_end", "surface",
                "surface_norm", "tag_type"])

    return cols.mapInPandas(run, schema=MENTIONS_SCHEMA)


MENTIONS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("sent_idx", T.IntegerType(), False),
    T.StructField("tok_start", T.IntegerType(), False),
    T.StructField("tok_end", T.IntegerType(), False),
    T.StructField("surface", T.StringType(), False),
    T.StructField("surface_norm", T.StringType(), False),
    T.StructField("tag_type", T.StringType(), False),
])


def seg_tags_stage(sentences: DataFrame, segmenter) -> DataFrame:
    """sentences -> sentence rows + binary seg_tags column (reference stage 6,
    E2E_SoftNER.py:65-94 + segmenter predict): the aux channel the NER model
    consumes. Row-local, narrow."""
    rows = sentences.filter(F.col("sent_idx") >= 0)
    schema = T.StructType(list(SENTENCES_SCHEMA.fields) + [
        T.StructField("seg_tags", T.ArrayType(T.StringType()), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for url, sent_idx, tokens, md_tags, starts, ends in zip(
                    pdf["url"], pdf["sent_idx"], pdf["tokens"], pdf["md_tags"],
                    pdf["starts"], pdf["ends"]):
                tokens = list(tokens)
                seg = segmenter.tag(tokens, list(md_tags))
                out.append((url, int(sent_idx), tokens, list(md_tags),
                            list(starts), list(ends), seg))
            yield pd.DataFrame(out, columns=[
                "url", "sent_idx", "tokens", "md_tags", "starts", "ends",
                "seg_tags"])

    return rows.mapInPandas(run, schema=schema)


def mentions_stage(sentences: DataFrame, tagger) -> DataFrame:
    """sentences -> mention spans using a row-local tagger.

    ``tagger`` is any ``Tagger`` from operators.tagger (gazetteer default,
    model-pluggable per SURVEY.md §7 step 5). Row-local => narrow; the tagger
    ships as an explicit broadcast, unpickled once per worker
    (see _tagger_broadcast).
    """
    rows = sentences.filter(F.col("sent_idx") >= 0)
    bc = _tagger_broadcast(sentences.sparkSession, tagger)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tagger = bc.value
        for pdf in batches:
            out = []
            for url, sent_idx, tokens, md_tags in zip(
                    pdf["url"], pdf["sent_idx"], pdf["tokens"], pdf["md_tags"]):
                tokens = list(tokens)
                tags = tagger.tag(tokens, list(md_tags))
                for typ, a, b in extract_chunks(tags):
                    surface = " ".join(tokens[a:b])
                    out.append((url, int(sent_idx), a, b, surface,
                                surface.lower(), typ))
            yield pd.DataFrame(out, columns=[
                "url", "sent_idx", "tok_start", "tok_end", "surface",
                "surface_norm", "tag_type"])

    return rows.mapInPandas(run, schema=MENTIONS_SCHEMA)
