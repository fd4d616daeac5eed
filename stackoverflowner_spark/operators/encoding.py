"""Char-encoding repair operator (SURVEY.md P6) over gold sentence rows.

One Arrow-batched pass applies ``kernel.fixchar.fix_word_label`` to every
token, replicating labels across any retokenization (B- -> I-). Used to
regenerate/repair gold-format corpora the way the reference's
``fix_char_encoding.py`` one-time script does, but distributed.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ..kernel.fixchar import fix_word_label

FIXED_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("words", T.ArrayType(T.StringType())),
    T.StructField("md_tags", T.ArrayType(T.StringType())),
    T.StructField("tags", T.ArrayType(T.StringType())),
    T.StructField("n_fixed", T.IntegerType()),
])


def fix_char_encoding_stage(sentences: DataFrame) -> DataFrame:
    """sentence rows (file, sent_idx, words, md_tags, tags) -> repaired rows
    plus an ``n_fixed`` counter (tokens that were modified)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fname, idx, words, mds, tags in zip(
                    pdf["file"], pdf["sent_idx"], pdf["words"],
                    pdf["md_tags"], pdf["tags"]):
                new_w, new_m, new_t = [], [], []
                n_fixed = 0
                for w, m, t in zip(words, mds, tags):
                    toks, golds, raws, modified = fix_word_label(w, t, m)
                    if modified:
                        n_fixed += 1
                    for i, tok in enumerate(toks):
                        if tok.strip() == "":
                            continue
                        new_w.append(tok)
                        new_t.append("O" if tok == "'s" else golds[i])
                        new_m.append(raws[i])
                out.append((fname, int(idx), new_w, new_m, new_t, n_fixed))
            yield pd.DataFrame(out, columns=[
                "file", "sent_idx", "words", "md_tags", "tags", "n_fixed"])

    return sentences.select("file", "sent_idx", "words", "md_tags",
                            "tags").mapInPandas(run, schema=FIXED_SCHEMA)
