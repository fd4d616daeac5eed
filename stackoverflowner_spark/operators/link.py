"""Entity linking: mentions x broadcast alias dictionary with skew handling.

North-rule operator (SURVEY.md §2.8): detected mentions are scored against a
software-entity dictionary (aliases + surface-form embeddings).

Two physical strategies, same logical result:

* ``link_broadcast`` — the dictionary is small (thousands of aliases), so the
  join is a map-side broadcast hash join: zero shuffle, immune to head-entity
  skew by construction. This is the default at any scale where the dictionary
  fits comfortably in executor memory.
* ``link_salted`` — for a dictionary too large to broadcast: explicit salted
  repartition join. The mention side gets ``salt = pmod(xxhash64(url), S)``;
  the dictionary side is replicated xS via ``explode(sequence(...))``. Head
  aliases ("python") then spread across S reducers instead of one. AQE skew
  join remains enabled as a backstop (session.py).

Scoring: cosine between the hashed surface-form embedding of the mention and
the dictionary alias embedding — vectorized numpy per Arrow batch (the
fasttext stand-in; same operator shape as the reference-mandated scoring).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernel.ctc import hashed_embedding

LINKED_COLS = [
    "url", "sent_idx", "tok_start", "tok_end", "surface", "surface_norm",
    "tag_type", "canonical_id", "entity_type", "link_score",
]


def _with_scores(joined: DataFrame) -> DataFrame:
    @F.pandas_udf(T.DoubleType())
    def cosine_score(surface: pd.Series, emb: pd.Series) -> pd.Series:
        if len(surface) == 0:
            return pd.Series([], dtype="float64")
        # head entities repeat massively: embed each distinct surface once
        # per batch, then gather (orders of magnitude fewer hash computations)
        codes, uniques = pd.factorize(surface.fillna(""))
        q_uniq = hashed_embedding(list(uniques), dim=64)
        q = q_uniq[codes]
        d = np.array([np.asarray(e, dtype=np.float64) for e in emb])
        dn = np.linalg.norm(d, axis=1)
        dn[dn == 0] = 1.0
        scores = (q * (d / dn[:, None])).sum(axis=1)
        return pd.Series(scores)

    return joined.withColumn("link_score", cosine_score("surface_norm", "embedding"))


def link_broadcast(mentions: DataFrame, dictionary: DataFrame,
                   min_score: float = 0.99) -> DataFrame:
    dict_side = dictionary.select("alias_norm", "canonical_id", "entity_type", "embedding")
    joined = mentions.join(
        F.broadcast(dict_side), mentions.surface_norm == dict_side.alias_norm, "inner")
    return _with_scores(joined).filter(F.col("link_score") >= min_score).select(*LINKED_COLS)


def link_salted(mentions: DataFrame, dictionary: DataFrame,
                n_salts: int = 16, min_score: float = 0.99) -> DataFrame:
    salted_mentions = mentions.withColumn(
        "salt", F.pmod(F.xxhash64("url", "sent_idx", "tok_start"), F.lit(n_salts)).cast("int"))
    salted_dict = (
        dictionary.select("alias_norm", "canonical_id", "entity_type", "embedding")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    )
    joined = salted_mentions.join(
        salted_dict.hint("shuffle_hash"),
        (salted_mentions.surface_norm == salted_dict.alias_norm)
        & (salted_mentions.salt == salted_dict.salt),
        "inner",
    )
    return _with_scores(joined).filter(F.col("link_score") >= min_score).select(*LINKED_COLS)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Generic skew-defeating equi-join: the big side gets a random salt,
    the small side is replicated once per salt, and the join key becomes
    (key, salt) — a hot key's rows spread over ``n_salts`` reducers instead
    of one. Results are salt-independent (oracled in the driver contract);
    use when the small side is too large to broadcast but a key is hot.

    ``how`` is restricted to the join types whose semantics survive
    replicating the small side: an unmatched small-side row would otherwise
    be emitted once per salt under right/full-outer."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the small side is "
            f"replicated {n_salts}x, so right/full-outer would duplicate "
            f"unmatched small rows; use one of {sorted(allowed)}")
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = b.join(s.hint("shuffle_hash"), [key, "_salt"], how)
    return out.drop("_salt")


def link(mentions: DataFrame, dictionary: DataFrame, strategy: str = "broadcast",
         **kw) -> DataFrame:
    if strategy == "salted":
        return link_salted(mentions, dictionary, **kw)
    return link_broadcast(mentions, dictionary, **kw)
