"""Prepared-example construction (BiLSTM path, SURVEY.md §1.1 / J6).

``prepare_dataset`` (`/root/reference/code/Attentive_BiLSTM/loader_so.py:469-506`)
turns each sentence into int-id arrays: word ids (lowercased lookup with
``<UNK>``), char ids (unknown chars skipped), cap feature 0-3, tag ids, plus
auxiliary ctc/seg channels. Vocab mappings are built distributively
(create_dico/create_mapping, A1-A5) and broadcast; the per-sentence
conversion is a vectorized pandas pass.
"""

from __future__ import annotations

from typing import Dict, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from ..kernel.tagscheme import cap_class

UNK = "<UNK>"
PAD = "<PAD>"


def build_word_mapping(sentences: DataFrame, min_freq: int = 3,
                       words_col: str = "words") -> Dict[str, int]:
    """Lowercased word -> id ordered by (-freq, word); <PAD>=0-ish sentinels
    get the top ids like the reference's huge-count trick
    (loader_so.py:319-336 + create_mapping utils_so.py:68-76)."""
    counts = (
        sentences.select(F.explode(words_col).alias("w"))
        .select(F.lower("w").alias("w"))
        .groupBy("w").count()
        .filter(F.col("count") >= min_freq)
        .withColumn("item_id",
                    F.row_number().over(Window.orderBy(F.desc("count"), F.asc("w"))))
        .collect()
    )
    mapping = {PAD: 0, UNK: 1}
    for r in counts:
        mapping[r["w"]] = r["item_id"] + 1
    return mapping


def build_char_mapping(sentences: DataFrame, words_col: str = "words"
                       ) -> Dict[str, int]:
    counts = (
        sentences.select(F.explode(words_col).alias("w"))
        .select(F.explode(F.split("w", "")).alias("c"))
        .filter(F.col("c") != "")
        .groupBy("c").count()
        .withColumn("item_id",
                    F.row_number().over(Window.orderBy(F.desc("count"), F.asc("c"))))
        .collect()
    )
    return {r["c"]: r["item_id"] - 1 for r in counts}


def build_tag_mapping(sentences: DataFrame, tags_col: str = "tags") -> Dict[str, int]:
    counts = (
        sentences.select(F.explode(tags_col).alias("t"))
        .groupBy("t").count()
        .withColumn("item_id",
                    F.row_number().over(Window.orderBy(F.desc("count"), F.asc("t"))))
        .collect()
    )
    return {r["t"]: r["item_id"] - 1 for r in counts}


PREPARED_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("str_words", T.ArrayType(T.StringType())),
    T.StructField("word_ids", T.ArrayType(T.IntegerType())),
    T.StructField("char_ids", T.ArrayType(T.ArrayType(T.IntegerType()))),
    T.StructField("caps", T.ArrayType(T.IntegerType())),
    T.StructField("tag_ids", T.ArrayType(T.IntegerType())),
])


def prepare_dataset(sentences: DataFrame, spark: SparkSession,
                    word_map: Dict[str, int], char_map: Dict[str, int],
                    tag_map: Dict[str, int]) -> DataFrame:
    """sentence rows (file, sent_idx, words, tags) -> prepared int arrays.

    Unknown words -> <UNK>; unknown chars skipped (loader_so.py:485-488);
    cap feature computed on the raw word (loader_so.py:365-380)."""
    bw = spark.sparkContext.broadcast(word_map)
    bc = spark.sparkContext.broadcast(char_map)
    bt = spark.sparkContext.broadcast(tag_map)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wmap, cmap, tmap = bw.value, bc.value, bt.value
        unk = wmap[UNK]
        for pdf in batches:
            out = []
            for fname, sent_idx, words, tags in zip(
                    pdf["file"], pdf["sent_idx"], pdf["words"], pdf["tags"]):
                words = list(words)
                out.append((
                    fname, int(sent_idx), words,
                    [wmap.get(w.lower(), unk) for w in words],
                    [[cmap[c] for c in w if c in cmap] for w in words],
                    [cap_class(w) for w in words],
                    [tmap.get(t, 0) for t in tags],
                ))
            yield pd.DataFrame(out, columns=[
                "file", "sent_idx", "str_words", "word_ids", "char_ids",
                "caps", "tag_ids"])

    return sentences.select("file", "sent_idx", "words", "tags").mapInPandas(
        run, schema=PREPARED_SCHEMA)
