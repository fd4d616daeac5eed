"""HLL sketch gates: bitwise DuckDB register/estimate replay, merge
exactness, duplicate/order invariance, and raw-regime accuracy."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.sketch import (
    RHO_MAX, estimate_constant, hll_distinct, hll_estimate, hll_merge,
    hll_sketch)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sketch", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _vals(n, seed=""):
    return [(f"k{i % 3}", f"{seed}v{i}") for i in range(n)]


DUCK_SKETCH = """
    with h as (
      select key, md5(val) as hx from vals),
    reg as (
      select key,
             cast('0x' || substr(hx, 1, 2) as bigint) as reg,
             substr(hx, 3, 15) as tail
      from h),
    rho as (
      select key, reg,
             least(4 * length(regexp_extract(tail, '^0*')) +
                   case substr(tail,
                               length(regexp_extract(tail, '^0*')) + 1, 1)
                     when '8' then 0 when '9' then 0 when 'a' then 0
                     when 'b' then 0 when 'c' then 0 when 'd' then 0
                     when 'e' then 0 when 'f' then 0
                     when '4' then 1 when '5' then 1 when '6' then 1
                     when '7' then 1
                     when '2' then 2 when '3' then 2
                     else 3 end + 1,
                   {rho_max}) as rho
      from reg)
    select key, reg, max(rho) as rho from rho group by key, reg
"""

DUCK_EST = """
    select key,
           count(*) as present,
           256 - count(*) as zeros,
           sum(1::BIGINT << ({rho_max} - rho))
             + (256 - count(*)) * (1::BIGINT << {rho_max}) as z_num,
           {c!r} / cast(sum(1::BIGINT << ({rho_max} - rho))
             + (256 - count(*)) * (1::BIGINT << {rho_max}) as double) as est
    from ({sketch}) group by key
"""


def test_registers_bitwise_match_duckdb(spark):
    rows = _vals(500)
    sdf = spark.createDataFrame(rows, "key string, val string")
    got = (hll_sketch(sdf, ["key"], "val")
           .toPandas().sort_values(["key", "reg"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("vals", pd.DataFrame(rows, columns=["key", "val"]))
    exp = (con.execute(DUCK_SKETCH.format(rho_max=RHO_MAX) +
                       " order by key, reg").df())
    assert got["key"].tolist() == exp["key"].tolist()
    assert got["reg"].astype(int).tolist() == exp["reg"].astype(int).tolist()
    assert got["rho"].astype(int).tolist() == exp["rho"].astype(int).tolist()


def test_estimate_bitwise_matches_duckdb(spark):
    rows = _vals(800)
    sdf = spark.createDataFrame(rows, "key string, val string")
    got = (hll_distinct(sdf, ["key"], "val")
           .toPandas().sort_values("key").reset_index(drop=True))
    con = duckdb.connect()
    con.register("vals", pd.DataFrame(rows, columns=["key", "val"]))
    q = DUCK_EST.format(rho_max=RHO_MAX, c=estimate_constant(8),
                        sketch=DUCK_SKETCH.format(rho_max=RHO_MAX))
    exp = con.execute(q + " order by key").df()
    assert got["z_num"].astype(int).tolist() == \
        exp["z_num"].astype(int).tolist()
    # the headline claim: float estimate identical to the last bit
    assert got["est"].tolist() == exp["est"].tolist()


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame(_vals(400), "key string, val string")
    b = spark.createDataFrame(_vals(400, seed="x"), "key string, val string")
    merged = (hll_merge(hll_sketch(a, ["key"], "val"),
                        hll_sketch(b, ["key"], "val"))
              .toPandas().sort_values(["key", "reg"]).reset_index(drop=True))
    direct = (hll_sketch(a.unionByName(b), ["key"], "val")
              .toPandas().sort_values(["key", "reg"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(merged, direct, check_dtype=False)


def test_duplicates_and_order_invariant(spark):
    base = _vals(300)
    dup = spark.createDataFrame(base * 3, "key string, val string")
    plain = spark.createDataFrame(list(reversed(base)),
                                  "key string, val string").repartition(7)
    e1 = {r.key: r.est for r in hll_estimate(
        hll_sketch(dup, ["key"], "val")).collect()}
    e2 = {r.key: r.est for r in hll_estimate(
        hll_sketch(plain, ["key"], "val")).collect()}
    assert e1 == e2  # bit-for-bit: integer Z sum is order-independent


def test_accuracy_raw_regime(spark):
    # m=256 -> rel std err ~6.5%; 5000 distinct is far above the
    # small-range-correction regime (2.5m = 640), so raw HLL applies.
    n = 5000
    sdf = spark.createDataFrame([("k", f"u{i}") for i in range(n)],
                                "key string, val string")
    est = hll_distinct(sdf, ["key"], "val").collect()[0].est
    assert abs(est - n) / n < 0.2, est


def test_alpha_small_m(spark):
    # b=4 exercises the tabulated-alpha branch and the b-dependent
    # register-prefix width (1 hex char).
    sdf = spark.createDataFrame([("k", f"u{i}") for i in range(2000)],
                                "key string, val string")
    regs = hll_sketch(sdf, ["key"], "val", b=4)
    assert regs.agg(F.max("reg")).first()[0] <= 15
    est = hll_estimate(regs, b=4).collect()[0].est
    assert abs(est - 2000) / 2000 < 0.6  # m=16: ~26% std err
