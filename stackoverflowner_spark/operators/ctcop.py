"""CTC column operator: fit once on the driver, broadcast, apply vectorized.

Spark wiring of the kernel CTC stack (SURVEY.md M1-M4):
  * fit: language models + Gaussian binner + MLP are fit driver-side from
    (natural, code) token corpora — the reference retrains its CTC model at
    every E2E run (E2E_SoftNER.py:155); we fit once and broadcast.
  * apply: one pandas UDF pass per token batch, with per-batch distinct-token
    dedup (tokens repeat heavily, so the model runs on the vocabulary of the
    batch, not the token stream — the reference recomputes per token
    occurrence, E2E_SoftNER.py:85,117, which SURVEY.md §4 flags as redundant).

Also provides the word-frequency Gaussian feature vector (A7-A9,
Word_Freqency_Mapper.py) as a broadcastable artifact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.ctc import CTCArtifact, GaussianBinner


def fit_ctc(natural_corpus, code_corpus, seed: int = 9911) -> CTCArtifact:
    return CTCArtifact(list(natural_corpus), list(code_corpus), seed=seed)


def with_ctc_column(tokens: DataFrame, spark: SparkSession, artifact: CTCArtifact,
                    token_col: str = "token") -> DataFrame:
    bc = spark.sparkContext.broadcast(artifact)

    @F.pandas_udf(T.IntegerType())
    def ctc_pred(tok: pd.Series) -> pd.Series:
        art = bc.value
        codes, uniques = pd.factorize(tok.fillna(""))
        preds = art.predict(list(uniques))
        return pd.Series(preds[codes].astype("int32"))

    return tokens.withColumn("ctc", ctc_pred(F.col(token_col)))


class FreqVectorArtifact:
    """Per-word Gaussian-binned train-frequency vector
    (Word_Freqency_Mapper.py:15-45; dim = bins + 2, w = 5.0)."""

    def __init__(self, word_counts: dict, bins: int = 100, w: float = 5.0):
        self.counts = dict(word_counts)
        self.binner = GaussianBinner(bins, w)
        x = np.array([[float(c)] for c in self.counts.values()] or [[0.0]])
        self.binner.fit(x, 1)

    def transform(self, words) -> np.ndarray:
        freqs = np.array([[float(self.counts.get(w, 0))] for w in words])
        if len(freqs) == 0:
            return np.zeros((0, self.binner.bins + 2))
        return self.binner.transform(freqs, 1)


def fit_freq_vector(tokens: DataFrame, token_col: str = "token",
                    max_vocab: int = 200_000) -> FreqVectorArtifact:
    """Distributed count (A7), driver-side binner fit (A8) — the vocabulary
    is capped so the driver artifact stays broadcastable."""
    counts = (
        tokens.groupBy(token_col).count()
        .orderBy(F.desc("count"), F.asc(token_col))
        .limit(max_vocab)
        .collect()
    )
    return FreqVectorArtifact({r[token_col]: r["count"] for r in counts})


def with_freq_vector(tokens: DataFrame, spark: SparkSession,
                     artifact: FreqVectorArtifact,
                     token_col: str = "token") -> DataFrame:
    bc = spark.sparkContext.broadcast(artifact)

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def freq_vec(tok: pd.Series) -> pd.Series:
        art = bc.value
        codes, uniques = pd.factorize(tok.fillna(""))
        mat = art.transform(list(uniques)).astype(np.float32)
        return pd.Series([mat[c].tolist() for c in codes])

    return tokens.withColumn("freq_vector", freq_vec(F.col(token_col)))
