"""Mergeable HyperLogLog distinct-count sketches as plain DataFrames.

The 100-TB cardinality primitive the crawl bookkeeping needs (distinct
URLs per host, distinct tokens per source, distinct entities per crawl
snapshot) in a form Spark's built-in ``approx_count_distinct`` cannot
give you: the REGISTERS are the output, stored as ordinary rows
(key, reg, rho), so sketches are

- **mergeable**: union two register tables and take max(rho) per
  (key, reg) — sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly,
  which is what lets per-snapshot / per-partition sketches roll up
  across crawls without touching the raw data again;
- **engine-portable**: registers derive from md5 (the cross-engine
  hash, see tests/test_oracle_dot_fold.py lineage) with integer-only
  arithmetic, so a DuckDB oracle replays them bitwise;
- **bitwise-estimable**: the harmonic-mean denominator is accumulated
  as an INTEGER numerator Z·2^40 (each register contributes the dyadic
  rational 2^(40-rho), rho clamped ≤ 40, so the per-key sum is an exact
  bigint ≤ 2^48 — order-independent), and the final estimate is ONE
  exact int→double conversion and ONE correctly-rounded IEEE division
  of a shared literal constant: bitwise identical across engines, no
  float-summation-order caveat at all.

Layout: m = 2^b registers (default b=8, m=256, rel. std err ≈ 6.5%).
For each value v: md5(v) hex; the first 2b bits (b/4 hex chars) pick the
register; rho = 1 + leading-zero count of the NEXT 60 bits (15 hex
chars), clamped to 40. Clamping costs nothing at any realistic
cardinality (P[rho > 40] ≈ 2^-40 per value) and is what makes the
dyadic sum exact. Estimate = alpha_m · m² · 2^40 / Z_num — the RAW HLL
estimate; the small/large-range corrections of Flajolet et al. need
ln(), which is not cross-engine-stable, so they are left to the
consumer (documented; the pytest accuracy gate runs in the raw regime).

Scale shape: sketch build is one groupBy((key, reg)) — map-side combine
reduces every partition to ≤ m rows per key before the shuffle, so the
shuffle is O(keys · m) regardless of input size; estimate is a second
O(keys · m) -> O(keys) agg; merge is a union + the same bounded agg.

Reference parity note: the reference has no sketching; this is
engine-beyond-reference surface (SURVEY §2.9 class).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RHO_MAX = 40  # dyadic-exactness clamp: sum of 2^(40-rho) stays < 2^53


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def estimate_constant(b: int = 8) -> float:
    """alpha_m * m^2 * 2^RHO_MAX as the ONE double literal both engines
    divide by the integer Z numerator. Computed the same way here and in
    the oracle-SQL generator so the literal is shared, not re-derived."""
    m = 1 << b
    return _alpha(m) * m * m * (1 << RHO_MAX)


def rho_column(hexcol: Column, b: int = 8) -> Column:
    """1 + leading-zero-bit count of the 60 bits after the register
    prefix, clamped to RHO_MAX — integer/CASE arithmetic only."""
    tail = F.substring(hexcol, b // 4 + 1, 15)
    z = F.length(F.regexp_extract(tail, r"^0*", 0))
    first = F.substring(tail, (z + 1).cast("int"), 1)
    lz = (F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
          .when(first.isin("4", "5", "6", "7"), 1)
          .when(first.isin("2", "3"), 2)
          .otherwise(3))
    return F.least(z * 4 + lz + 1, F.lit(RHO_MAX)).cast("int")


def hll_sketch(df: DataFrame, keys: list[str], value: str,
               b: int = 8) -> DataFrame:
    """-> (keys..., reg int, rho int): the register table, one row per
    (key, occupied register). Empty registers are implicit (absent)."""
    h = F.md5(F.col(value).cast("string"))
    reg = F.conv(F.substring(h, 1, b // 4), 16, 10).cast("int")
    return (df.select(*keys, reg.alias("reg"), rho_column(h, b).alias("rho"))
            .groupBy(*keys, "reg").agg(F.max("rho").alias("rho")))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union register tables; max(rho) per (keys, reg). Exactly equals
    the sketch of the unioned inputs (max is idempotent/commutative)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("reg", "rho")]
    return out.groupBy(*keys, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(regs: DataFrame, b: int = 8) -> DataFrame:
    """-> (keys..., present, zeros, z_num, est). ``z_num`` = Z·2^40 as an
    exact bigint; ``est`` = estimate_constant(b) / z_num, bitwise stable
    across engines (single conversion + single division)."""
    m = 1 << b
    keys = [c for c in regs.columns if c not in ("reg", "rho")]
    c = estimate_constant(b)
    agg = regs.groupBy(*keys).agg(
        F.count("*").cast("long").alias("present"),
        F.sum(F.expr(f"shiftleft(1L, {RHO_MAX} - rho)")).alias("z_reg"))
    zeros = (F.lit(m).cast("long") - F.col("present"))
    z_num = (F.col("z_reg")
             + zeros * F.lit(1 << RHO_MAX).cast("long")).alias("z_num")
    out = agg.select(*keys, "present", zeros.alias("zeros"), z_num)
    return out.select(*keys, "present", "zeros", "z_num",
                      (F.lit(c) / F.col("z_num").cast("double"))
                      .alias("est"))


def hll_distinct(df: DataFrame, keys: list[str], value: str,
                 b: int = 8) -> DataFrame:
    """sketch + estimate in one call — the per-key approximate
    distinct-count table (keys..., present, zeros, z_num, est)."""
    return hll_estimate(hll_sketch(df, keys, value, b), b)
