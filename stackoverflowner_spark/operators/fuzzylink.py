"""Fuzzy string join via FastSS deletion neighborhoods.

Entity-resolution companion to the exact/broadcast linkers in
operators/link.py (reference parity: the reference links mentions by
EXACT dictionary lookup — `code/BERT_NER/loader_so.py:443-454` word->id
maps; typo-tolerant alias matching is engine-beyond-reference surface,
the standard ER need when web-page mentions carry OCR/typo noise).

Method — deletion-neighborhood blocking (FastSS; Bocek et al. 2007,
public algorithm): every string emits its <= d-deletion variants; two
strings within Levenshtein distance d ALWAYS share a variant (each edit
op maps to <= 1 deletion on each side: substitution = delete the
position from both, insertion = delete it from the longer side,
deletion likewise), so an equi-join on variants has EXACT RECALL and an
exact `levenshtein() <= d` verify prunes the false positives (shared
variants can overshoot: 'ab'/'ba' share 'b' at ed 2). No Cartesian
product anywhere — the plan is explode -> shuffled equi-join ->
verify filter, the same bucket-join discipline as LSH banding
(operators/dedup.py) but with a deterministic, loss-free guarantee.

Scale shape at 100 TB:

* Variant fan-out is (len choose <=d): len+1 keys at d=1, O(len^2) at
  d=2 — bounded per row, so the shuffle is O(rows * len^d), never
  O(rows^2).
* Bucket skew = variant frequency. Very short strings (len <= d+1)
  degenerate (their neighborhoods include ""); `min_len` drops them to
  a caller-handled exact path. Head buckets are ordinary group skew —
  AQE-splittable, and the verify filter is a cheap JVM `levenshtein`.
* Both sides are symmetric; when one side is a dictionary it can be
  broadcast instead, but the variant join needs no such assumption.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _delete_at(s: Column, i: Column) -> Column:
    """Copy of ``s`` with the 1-indexed character ``i`` removed."""
    return F.concat(F.substring(s, F.lit(1), i - 1),
                    F.substring(s, i + 1, F.length(s)))


def deletion_variants(col: Column, d: int = 1) -> Column:
    """Array of all distinct strings reachable from ``col`` by deleting
    at most ``d`` characters (includes the string itself). d in {1, 2}.
    """
    if d not in (1, 2):
        raise ValueError("deletion_variants supports d in {1, 2}")
    empty = F.array().cast("array<string>")

    def _dels(s: Column) -> Column:
        # Spark's sequence(1, 0) runs DESCENDING ([1, 0]), so an empty
        # string must be guarded explicitly, not left to the range.
        return F.when(F.length(s) >= 1,
                      F.transform(F.sequence(F.lit(1), F.length(s)),
                                  lambda i: _delete_at(s, i))
                      ).otherwise(empty)

    one = _dels(col)
    vs = F.concat(F.array(col), one)
    if d == 2:
        vs = F.concat(vs, F.flatten(F.transform(one, _dels)))
    return F.array_distinct(vs)


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str,
               max_dist: int = 1, min_len: int = 3) -> DataFrame:
    """All (left_col, right_col, dist) pairs with
    ``levenshtein(left, right) <= max_dist``, found via exact-recall
    deletion-neighborhood blocking — bitwise-equal to the brute-force
    cross join, without ever building one.

    Inputs are deduplicated on the join string (the operator matches
    SURFACE FORMS; carry ids by re-joining on the string afterwards —
    a string-keyed equi-join, cheap relative to this one). Strings
    shorter than ``min_len`` are dropped (their deletion neighborhoods
    degenerate toward ""; route them through an exact/broadcast path).
    """
    lv = (left.select(F.col(left_col).alias("_l"))
          .filter(F.length("_l") >= min_len).distinct()
          .select("_l", F.explode(deletion_variants(F.col("_l"),
                                                    max_dist)).alias("_v")))
    rv = (right.select(F.col(right_col).alias("_r"))
          .filter(F.length("_r") >= min_len).distinct()
          .select("_r", F.explode(deletion_variants(F.col("_r"),
                                                    max_dist)).alias("_v")))
    cand = lv.join(rv, "_v").select("_l", "_r").distinct()
    dist = F.levenshtein(F.col("_l"), F.col("_r"))
    return (cand.filter(dist <= max_dist)
            .select(F.col("_l").alias(left_col),
                    F.col("_r").alias(right_col),
                    dist.cast("long").alias("dist")))
