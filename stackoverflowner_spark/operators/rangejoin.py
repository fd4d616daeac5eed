"""Point-in-interval range join without a shared equi-key.

The naive formulation — ``points JOIN intervals ON s <= pt AND pt < e``
— has no equi-condition, so Spark plans a BroadcastNestedLoopJoin (or a
cartesian product): O(|points| x |intervals|) comparisons, the classic
100-TB killer. The scalable re-expression is bin bucketing:

    intervals explode to the fixed-width bins they overlap
    (``sequence(floor(s/w), floor((e-1)/w))`` — at most len/w + 1 rows);
    each point maps to its single bin ``floor(pt/w)``; an ordinary
    shuffled equi-join on the bin meets every candidate pair exactly once
    (a point's bin is unique, and an interval covers any bin at most
    once — no post-join dedup needed); the exact containment predicate
    filters bin-mates that don't actually overlap.

Cost: shuffle O(|points| + |intervals| x bins_per_interval), join fan-in
per bin bounded by the data in one time slice. ``bin_width`` tunes the
trade: width >= max interval length caps explosion at 2 bins/interval;
narrower widths cut false bin-mates for short intervals. Hot time slices
(a flash-crowd hour) are ordinary group-skew — AQE skew-join splits them,
same story as every keyed shuffle in this engine.

Everything is a column expression (explode + join + filter): whole-stage
codegen end to end, no Python. The plan gate asserts no
BroadcastNestedLoopJoin/CartesianProduct node survives
(tests/test_asof_range_delta.py); the driver oracle verifies the result
bitwise against DuckDB's native IEJoin on the same inequality predicate
(`range_join` entry).

Reference parity note: no temporal/range join exists in the reference;
engine-beyond-reference surface (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           pt_col: str, start_col: str, end_col: str,
                           bin_width: int,
                           how: str = "inner") -> DataFrame:
    """Join each point row to every interval row with
    ``start <= pt < end`` (half-open), via bin bucketing.

    ``pt_col``/``start_col``/``end_col`` are NUMERIC (convert timestamps
    to epoch micros upstream; keeps the operator unit-agnostic). Column
    names across the two frames must not collide (select/alias first).
    ``how='left_outer'`` keeps unmatched intervals (point columns null) —
    note the left side of the outer semantics is INTERVALS.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError(f"unsupported how={how!r}")
    s, e, pt = F.col(start_col), F.col(end_col), F.col(pt_col)
    iv = (intervals.filter(e > s)  # empty/inverted intervals match nothing
          .withColumn("__bin", F.explode(F.sequence(
              F.floor(s / bin_width),
              F.floor((e - F.lit(1)) / bin_width)))))
    ptd = points.withColumn("__bin", F.floor(pt / bin_width))
    cond = (iv["__bin"] == ptd["__bin"]) & (pt >= s) & (pt < e)
    joined = iv.join(ptd, cond, how)
    return joined.drop(iv["__bin"]).drop(ptd["__bin"])


def interval_point_counts(points: DataFrame, intervals: DataFrame,
                          pt_col: str, start_col: str, end_col: str,
                          bin_width: int,
                          interval_keys: Sequence[str]) -> DataFrame:
    """Points-per-interval rollup: ``interval_keys + n_points`` for every
    interval with >= 1 contained point.

    The count never needs point identity, only how many points sit at
    each value — so points are pre-aggregated to (value, multiplicity)
    BEFORE the bin join and the rollup sums multiplicities (guide-§2.3
    aggregate-before-you-shuffle). For continuous timestamps this is a
    no-op passthrough; for discrete points (dates, bucketed times — the
    common case at corpus scale) it collapses the join's probe side and
    its fan-out by the multiplicity factor. Result identical to counting
    raw join rows: each contained point contributes its multiplicity
    exactly once (the bin join meets every (point-value, interval) pair
    exactly once)."""
    pvals = points.select(pt_col).groupBy(pt_col).agg(
        F.count("*").alias("__mult"))
    j = point_in_interval_join(pvals, intervals, pt_col, start_col,
                               end_col, bin_width)
    return (j.groupBy(*interval_keys)
            .agg(F.sum("__mult").alias("n_points")))
