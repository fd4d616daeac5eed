"""As-of join: attach the most recent build-side row at or before each
probe row's timestamp, per key.

The temporal-join primitive every snapshot/versioned-corpus query needs
(latest crawl of a url as of t, last prior click before a view, price as
of an order date). Spark has no native ASOF JOIN; the scalable
re-expression is the union-merge pattern:

    tag probe rows side=1 and build rows side=0 with null payloads on the
    opposite side; union; ONE window partitioned by key ordered by
    (ts, side); last(payload, ignorenulls) carries the newest build
    payload forward onto each probe row; filter side=1.

Cost shape: one shuffle on the key — identical to the equi-join both
tables would need anyway — and NO range explosion: the naive
inequality-join formulation (probe x build filtered on ts) is quadratic
per key, while the merge is O(n log n) per key from the window sort.
Ordering build (side=0) before probe (side=1) at equal timestamps makes
the match inclusive (probe.ts >= build.ts), the same boundary DuckDB's
ASOF JOIN uses — which is exactly how the driver oracle verifies this
operator bitwise (`asof_join` entry; tests/test_asof_range_delta.py).

At 100 TB the one worry is a pathological key whose row count exceeds a
task (the window sorts per key). The fix is time-chunking: bucket each
key's timeline into fixed-width chunks, as-of within (key, chunk), then
resolve each chunk's still-null prefix rows from the latest non-null
chunk-final state of any EARLIER chunk — a dimension-sized (one row per
key x chunk) broadcast join, not a second full-data window. Enabled via
``chunk_width_us``; equality-gated against the single-window plan in
tests.

Build rows that tie on (key, ts) must be deduplicated first — DuckDB's
ASOF leaves that pick undefined, so both engines must agree on it
explicitly (:func:`dedupe_build`: highest tiebreak wins).

Reference parity note: the reference engine has no temporal join; this is
part of the engine-beyond-reference surface a crawl-scale KG pipeline
needs (SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_BTS = "__asof_ts_b"


def dedupe_build(build: DataFrame, keys: Sequence[str], ts_col: str,
                 tiebreak: str) -> DataFrame:
    """One build row per (key, ts): highest ``tiebreak`` wins."""
    w = Window.partitionBy(*keys, ts_col).orderBy(F.col(tiebreak).desc())
    return (build.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def asof_join(probe: DataFrame, build: DataFrame, keys: Sequence[str],
              ts_col: str, payload_cols: Sequence[str],
              tolerance_us: int | None = None,
              chunk_width_us: int | None = None) -> DataFrame:
    """Backward (most-recent-at-or-before) as-of join.

    probe: any columns; keys + ts_col must exist.
    build: keys + ts_col + payload_cols; must already be unique per
        (keys, ts) — use :func:`dedupe_build` otherwise.
    Result: every probe row/column plus ``asof_ts_us`` (bigint, null when
        no build row precedes) and each payload as ``asof_<name>``.
    tolerance_us: matches older than this are nulled out (the match is
        dropped, not the probe row).
    chunk_width_us: when set, per-task window sorts are bounded to one
        (key, time-chunk) slice instead of a whole key's timeline — same
        result, pathological-key safe.
    """
    keys = list(keys)
    us = F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))
    probe_cols = probe.columns
    p = (probe.withColumn(_TS, us).withColumn(_SIDE, F.lit(1))
         .select(*probe_cols, _TS, _SIDE,
                 *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}")
                   for c in payload_cols]))
    b = (build.withColumn(_TS, us).withColumn(_SIDE, F.lit(0))
         .select(*[F.col(c) if c in keys
                   else F.lit(None).cast(probe.schema[c].dataType).alias(c)
                   for c in probe_cols], _TS, _SIDE,
                 *[F.col(c).alias(f"__b_{c}") for c in payload_cols]))
    merged = p.unionByName(b).withColumn(
        _BTS, F.when(F.col(_SIDE) == 0, F.col(_TS)))
    carried = [f"__b_{c}" for c in payload_cols] + [_BTS]

    if chunk_width_us is not None:
        merged = _chunked_carry(merged, keys, carried, chunk_width_us)
    else:
        w = (Window.partitionBy(*keys).orderBy(_TS, _SIDE)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        for c in carried:
            merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = merged.filter(F.col(_SIDE) == 1)
    if tolerance_us is not None:
        stale = (F.col(_TS) - F.col(_BTS)) > tolerance_us
        for c in carried:
            out = out.withColumn(c, F.when(~stale, F.col(c)))
    return out.select(
        *probe_cols,
        F.col(_BTS).alias("asof_ts_us"),
        *[F.col(f"__b_{c}").alias(f"asof_{c}") for c in payload_cols])


def _chunked_carry(merged: DataFrame, keys: Sequence[str],
                   carried: Sequence[str], chunk_width_us: int) -> DataFrame:
    """Equal result to the single unbounded window, with per-task sorts
    bounded to one (key, fixed-width time chunk) slice.

    Pass 1: the plain carry window inside each (key, chunk). Pass 2: a
    chunk's prefix rows (null carry — no build row yet inside the chunk)
    take the latest non-null chunk-final state among strictly earlier
    chunks of the same key. The chunk-final table is one row per
    (key, chunk) PRESENT in the data — empty chunks need no row because
    the strictly-earlier window skips over gaps — and is dimension-sized,
    so pass 2 is a broadcast join.
    """
    merged = merged.withColumn(
        "__chunk", F.floor(F.col(_TS) / F.lit(chunk_width_us)))
    w = (Window.partitionBy(*keys, "__chunk").orderBy(_TS, _SIDE)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = merged
    for c in carried:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))
    # chunk-final carried state depends ONLY on the chunk's last build row
    # (deduped per (key, ts), so max_by is deterministic) — a direct
    # aggregation, not a re-read of the pass-1 window. Probe-only chunks
    # contribute no state but must still appear as rows so the
    # strictly-earlier window can land state on them across build-free
    # gaps; hence the distinct-chunks left join.
    finals = (merged.filter(F.col(_SIDE) == 0)
              .groupBy(*keys, "__chunk")
              .agg(*[F.max_by(c, F.col(_TS)).alias(c) for c in carried]))
    chunks_present = merged.select(*keys, "__chunk").distinct()
    states = chunks_present.join(finals, [*keys, "__chunk"], "left")
    wb = (Window.partitionBy(*keys).orderBy("__chunk")
          .rowsBetween(Window.unboundedPreceding, -1))
    prev = states.select(
        *keys, "__chunk",
        *[F.last(c, ignorenulls=True).over(wb).alias(f"__prev_{c}")
          for c in carried])
    merged = filled
    joined = merged.join(F.broadcast(prev), [*keys, "__chunk"], "left")
    for c in carried:
        joined = joined.withColumn(
            c, F.coalesce(F.col(c), F.col(f"__prev_{c}")))
    return joined.drop("__chunk", *[f"__prev_{c}" for c in carried])
