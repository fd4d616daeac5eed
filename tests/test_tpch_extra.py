"""Extra relational queries verified with the same mechanics as the driver
contract: Spark result vs DuckDB oracle through the harness comparator."""

import pytest

from stackoverflowner_spark.relational import EXTRA_QUERIES
from stackoverflowner_spark.session import get_spark

from .oracle_harness import compare, duck_con

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-tpch-extra", master="local[8]",
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, con, name):
    fn, sql = EXTRA_QUERIES[name]
    sdf = fn(spark, SF).toPandas()
    odf = con.execute(sql).df()
    assert len(sdf) > 0, f"{name}: vacuous (0 rows proves nothing)"
    problems = compare(name, sdf, odf)
    assert not problems, problems
