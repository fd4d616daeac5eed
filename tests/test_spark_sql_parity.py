"""spark.sql() dialect parity: the oracle SQL strings ARE runnable Spark.

The DuckDB oracles double as documentation of each query's semantics;
for the ANSI-portable subset they should run UNCHANGED through
spark.sql() over the same fixture tables and produce the identical
result — three-way bitwise agreement (DataFrame API == spark.sql ==
DuckDB) proves a SQL-first user of this engine gets the same answers as
the DataFrame surface, with no dialect translation layer.

Queries whose oracle leans on DuckDB-only functions (epoch_us,
string_split, md5-as-hex-arithmetic, recursive CTEs) are exercised by
their own gates; this file pins the portable relational core.
"""

import pytest

from stackoverflowner_spark.relational import EXTRA_QUERIES
from stackoverflowner_spark.session import get_spark

from .oracle_harness import compare, duck_con

SF = "/root/testdata/sf0.01"

# the dual-dialect subset: plain joins/aggs/windows over the TPC-H-ish
# tables, decimal casts, date intervals — parse identically in Spark 4
# and DuckDB
PORTABLE = ["q2ish", "q8ish", "q11ish", "q12ish", "q13ish", "q15ish",
            "q19ish", "q20ish", "q4ish", "q7ish", "q9ish", "q17ish",
            "q21ish", "unpivot"]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events"]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sql-parity", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        s.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    yield s


@pytest.mark.parametrize("name", PORTABLE)
def test_sql_text_matches_dataframe_and_duckdb(spark, name):
    fn, sql = EXTRA_QUERIES[name]
    via_sql = spark.sql(sql).toPandas()
    via_df = fn(spark, SF).toPandas()
    oracle = duck_con(SF).execute(sql).df()
    assert len(via_sql) > 0
    assert not compare(f"{name}:sql_vs_df", via_sql, via_df, strict=True)
    assert not compare(f"{name}:sql_vs_duck", via_sql, oracle, strict=True)
