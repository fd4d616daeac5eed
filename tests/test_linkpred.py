"""Link-prediction gates (operators/linkpred.py): brute-force parity on
random graphs, the strict DuckDB oracle on fixture-derived co-mention
edges (rotation-gate twin lives in __spark_entry__.py `link_predict`),
and the hub-midpoint guard semantics."""

import math
import random

import duckdb
import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.linkpred import (link_predict,
                                                       link_predict_sql)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-linkpred", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def brute_force(edges, max_degree=None, min_cn=1):
    adj = {}
    eset = set(edges)
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for w in nodes[i + 1:]:
            if (u, w) in eset:
                continue
            common = [v for v in adj[u] & adj[w]
                      if max_degree is None or deg[v] <= max_degree]
            if len(common) >= min_cn:
                aa = 0.0
                for d in sorted(deg[v] for v in common):
                    aa += 1.0 / math.log(d)
                ra_fp = sum(10 ** 12 // deg[v] for v in common)
                out[(u, w)] = (len(common), aa, ra_fp)
    return out


@pytest.mark.parametrize("seed,max_degree", [(1, None), (2, None), (3, 6)])
def test_matches_brute_force_random_graph(spark, seed, max_degree):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(40)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(120)})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {(r.u, r.w): (r.cn, r.aa, r.ra_fp) for r in
           link_predict(df, max_degree=max_degree).collect()}
    want = brute_force(edges, max_degree=max_degree)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        # the ordered fold is order-deterministic, but JVM Math.log
        # (<=1 ulp) vs C libm (correctly rounded) disagree in the last
        # bit on real inputs — hence the tolerance here and the exact
        # integer ra_fp as the strict-oracle score
        assert math.isclose(got[k][1], want[k][1], rel_tol=1e-13), k
        assert got[k][2] == want[k][2], k


def test_duckdb_oracle_bitwise_on_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"e{i:02d}" for i in range(30)]
    edges = sorted({tuple(sorted(rng.sample(nodes, 2)))
                    for _ in range(90)})
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = (link_predict(df, max_degree=8, min_cn=2)
           .orderBy("u", "w").toPandas())
    con = duckdb.connect()
    con.execute("create table edges(src varchar, dst varchar)")
    con.executemany("insert into edges values (?, ?)", edges)
    odf = con.execute(
        link_predict_sql("select src, dst from edges", max_degree=8,
                         min_cn=2) + " order by u, w").df()
    assert len(sdf) == len(odf) and len(sdf) > 0
    assert list(sdf.u) == list(odf.u) and list(sdf.w) == list(odf.w)
    assert list(sdf.cn) == [int(x) for x in odf.cn]
    # exact integer fixed-point RA: bitwise across engines
    assert list(sdf.ra_fp) == [int(x) for x in odf.ra_fp]
    # float AA: JVM-vs-libm last-ulp gap, tolerance-gated
    for a, b in zip(sdf.aa, odf.aa):
        assert math.isclose(a, float(b), rel_tol=1e-13)


def test_hub_guard_drops_midpoint_not_endpoint(spark):
    # star: hub h connected to x0..x9; plus a path u-a-w (a has degree 2).
    # With max_degree=5 the hub cannot be a MIDPOINT (no xi-xj pair
    # predictions through h), but pairs (xi, a)-style predictions via
    # low-degree midpoints survive, as do hub-endpoint pairs.
    edges = [("h", f"x{i}") for i in range(10)] + \
            [("a", "u"), ("a", "w")]
    edges = [tuple(sorted(e)) for e in edges]
    df = spark.createDataFrame(edges, "src string, dst string")
    full = {(r.u, r.w) for r in link_predict(df).collect()}
    capped = {(r.u, r.w) for r in link_predict(df, max_degree=5).collect()}
    assert ("u", "w") in capped  # midpoint a, degree 2
    xi_pairs = {p for p in full if p[0].startswith("x") and
                p[1].startswith("x")}
    assert xi_pairs and not (xi_pairs & capped)
