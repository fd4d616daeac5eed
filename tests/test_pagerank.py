"""PageRank/HITS gates: numpy power-iteration parity, analytic closed
forms, mass conservation, and the KG entity wrapper."""

import random
from collections import defaultdict

import numpy as np
import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.pagerank import (
    entity_pagerank, entity_pagerank_weighted, hits, pagerank,
    pagerank_weighted, personalized_pagerank)
from stackoverflowner_spark.session import get_spark

D = 0.85


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-pagerank", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def np_pagerank(edges, iterations=20, damping=D):
    """Dense reference with the identical convention (distinct edges,
    uniform teleport, dangling mass redistributed uniformly)."""
    eset = set(edges)
    nodes = sorted({x for e in eset for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    out = defaultdict(list)
    for s, t in sorted(eset):
        out[s].append(t)
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if out[v]:
                w = r[idx[v]] / len(out[v])
                for t in out[v]:
                    contrib[idx[t]] += w
            else:
                dangling += r[idx[v]]
        r = (1 - damping) / n + damping * dangling / n + damping * contrib
    return dict(zip(nodes, r))


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r.node: r.rank for r in pagerank(df, **kw).collect()}


def test_cycle_stays_uniform(spark):
    n = 7
    edges = [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)]
    got = _spark_ranks(spark, edges, iterations=10)
    for v in got.values():
        assert abs(v - 1 / n) < 1e-12


def test_star_analytic(spark):
    # leaves -> center; center dangles. Closed form at the fixed point:
    # solve the 2-variable system for (center c, leaf l), n = k+1 nodes:
    #   l = (1-d)/n + d*c/n          (teleport + center's dangling share
    #                                  + its own dangling share excluded:
    #                                  leaves have out-edges)
    # wait — leaves are non-dangling, center is dangling:
    #   c = (1-d)/n + d*c/n + d*k*l  (dangling mass is c itself)
    #   l = (1-d)/n + d*c/n
    k, iters = 4, 40
    edges = [(f"l{i}", "c") for i in range(k)]
    n = k + 1
    got = _spark_ranks(spark, edges, iterations=iters)
    l = got["l0"]
    c_expect = ((1 - D) / n + D * k * ((1 - D) / n)) / \
        (1 - D / n - D * D * k / n)
    l_expect = (1 - D) / n + D * c_expect / n
    # power iteration contracts at ~damping per step: 40 steps ≈ 1e-6 here
    assert abs(got["c"] - c_expect) < 1e-5
    for i in range(k):
        assert abs(got[f"l{i}"] - l_expect) < 1e-5
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_random_graph_matches_numpy(spark):
    rng = random.Random(7)
    nodes = [f"v{i}" for i in range(60)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(300)})
    got = _spark_ranks(spark, edges, iterations=12)
    ref = np_pagerank(edges, iterations=12)
    assert set(got) == set(ref)
    tv = sum(abs(got[v] - ref[v]) for v in got)
    assert tv < 1e-9, tv
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_multi_edges_collapse(spark):
    edges = [("a", "b"), ("a", "b"), ("b", "a")]
    got = _spark_ranks(spark, edges, iterations=15)
    ref = np_pagerank([("a", "b"), ("b", "a")], iterations=15)
    assert abs(got["a"] - ref["a"]) < 1e-12


def np_hits(edges, iterations=20):
    """Dense reference for the exact half-step recurrence documented on
    :func:`hits`: h := 1; repeat a = L2norm(A^T h), h = L2norm(A a)."""
    eset = set(edges)
    nodes = sorted({x for e in eset for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, t in eset:
        A[idx[s], idx[t]] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(iterations):
        a_raw = A.T @ h
        na = np.sqrt((a_raw * a_raw).sum())
        if na == 0.0:
            break
        a = a_raw / na
        h_raw = A @ a
        nh = np.sqrt((h_raw * h_raw).sum())
        if nh == 0.0:
            break
        h = h_raw / nh
    return ({v: h[idx[v]] for v in nodes}, {v: a[idx[v]] for v in nodes})


def _spark_hits(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = hits(df, **kw).collect()
    return ({r.node: r.hub for r in rows},
            {r.node: r.authority for r in rows})


def test_hits_star_pure_roles(spark):
    # leaves -> center: center is the unit authority, leaves equal hubs,
    # and the mirror-image roles are exactly zero.
    k = 4
    edges = [(f"l{i}", "c") for i in range(k)]
    hub, auth = _spark_hits(spark, edges, iterations=5)
    assert abs(auth["c"] - 1.0) < 1e-12
    assert abs(hub["c"]) < 1e-12
    for i in range(k):
        assert abs(hub[f"l{i}"] - 1.0 / np.sqrt(k)) < 1e-12
        assert abs(auth[f"l{i}"]) < 1e-12


def test_hits_random_graph_matches_numpy(spark):
    rng = random.Random(11)
    nodes = [f"v{i}" for i in range(50)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(250)})
    hub, auth = _spark_hits(spark, edges, iterations=12)
    ref_hub, ref_auth = np_hits(edges, iterations=12)
    assert set(hub) == set(ref_hub)
    assert sum(abs(hub[v] - ref_hub[v]) for v in hub) < 1e-9
    assert sum(abs(auth[v] - ref_auth[v]) for v in auth) < 1e-9
    # L2 norms are 1 after any completed half-step pair
    assert abs(sum(x * x for x in hub.values()) - 1.0) < 1e-9
    assert abs(sum(x * x for x in auth.values()) - 1.0) < 1e-9


def test_hits_multi_edges_collapse(spark):
    hub1, auth1 = _spark_hits(
        spark, [("a", "b"), ("a", "b"), ("b", "c")], iterations=8)
    hub2, auth2 = _spark_hits(
        spark, [("a", "b"), ("b", "c")], iterations=8)
    for v in hub1:
        assert abs(hub1[v] - hub2[v]) < 1e-12
        assert abs(auth1[v] - auth2[v]) < 1e-12


def test_hits_separates_hub_from_authority(spark):
    # A directory page links to every article; articles link to one
    # another sparsely. PageRank ranks the directory low (nothing links
    # to it) — HITS is the only signal that surfaces it.
    arts = [f"art{i}" for i in range(5)]
    edges = [("dir", a) for a in arts] + [("art0", "art1"), ("art1", "art2")]
    hub, auth = _spark_hits(spark, edges, iterations=10)
    assert hub["dir"] == max(hub.values())
    assert abs(auth["dir"]) < 1e-12
    ranks = _spark_ranks(spark, edges, iterations=10)
    assert ranks["dir"] == min(ranks.values())


def np_pagerank_weighted(wedges, iterations=20, damping=D):
    agg = defaultdict(float)
    for s, t, w in wedges:
        if w > 0:
            agg[(s, t)] += float(w)
    nodes = sorted({x for e in agg for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    out = defaultdict(list)
    for (s, t), w in sorted(agg.items()):
        out[s].append((t, w))
    n = len(nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if out[v]:
                wd = sum(w for _, w in out[v])
                for t, w in out[v]:
                    contrib[idx[t]] += r[idx[v]] * w / wd
            else:
                dangling += r[idx[v]]
        r = (1 - damping) / n + damping * dangling / n + damping * contrib
    return dict(zip(nodes, r))


def test_weighted_matches_numpy(spark):
    rng = random.Random(31)
    nodes = [f"v{i}" for i in range(40)]
    wedges = sorted({(rng.choice(nodes), rng.choice(nodes),
                      rng.randint(1, 9)) for _ in range(200)})
    df = spark.createDataFrame(wedges, "src string, dst string, w int")
    got = {r.node: r.rank
           for r in pagerank_weighted(df, iterations=12).collect()}
    ref = np_pagerank_weighted(wedges, iterations=12)
    tv = sum(abs(got[v] - ref[v]) for v in got)
    assert set(got) == set(ref) and tv < 1e-9, tv
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_heavy_edge_dominates(spark):
    # a splits its vote 9:1 between b and c
    df = spark.createDataFrame(
        [("a", "b", 9), ("a", "c", 1), ("b", "a", 1), ("c", "a", 1)],
        "src string, dst string, w int")
    got = {r.node: r.rank
           for r in pagerank_weighted(df, iterations=30).collect()}
    assert got["b"] > got["c"] * 3


def test_weighted_uniform_weights_equal_unweighted(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    wdf = spark.createDataFrame([(s, t, 5) for s, t in edges],
                                "src string, dst string, w int")
    got_w = {r.node: r.rank
             for r in pagerank_weighted(wdf, iterations=15).collect()}
    got_u = _spark_ranks(spark, edges, iterations=15)
    for v in got_u:
        assert abs(got_w[v] - got_u[v]) < 1e-12


def np_ppr(edges, seeds, iterations=20, damping=D):
    eset = sorted(set(edges))
    nodes = sorted({x for e in eset for x in e} | set(seeds))
    idx = {v: i for i, v in enumerate(nodes)}
    out = defaultdict(list)
    for s, t in eset:
        out[s].append(t)
    n = len(nodes)
    t_vec = np.zeros(n)
    for s in set(seeds):
        t_vec[idx[s]] = 1.0 / len(set(seeds))
    r = t_vec.copy()
    for _ in range(iterations):
        contrib = np.zeros(n)
        dangling = 0.0
        for v in nodes:
            if out[v]:
                w = r[idx[v]] / len(out[v])
                for t in out[v]:
                    contrib[idx[t]] += w
            else:
                dangling += r[idx[v]]
        r = t_vec * ((1 - damping) + damping * dangling) \
            + damping * contrib
    return dict(zip(nodes, r))


def test_ppr_matches_numpy_and_localizes(spark):
    rng = random.Random(17)
    nodes = [f"v{i}" for i in range(50)]
    edges = sorted({(rng.choice(nodes), rng.choice(nodes))
                    for _ in range(250)})
    seeds = ["v0", "v1"]
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], "node string")
    got = {r.node: r.rank
           for r in personalized_pagerank(df, sdf,
                                          iterations=12).collect()}
    ref = np_ppr(edges, seeds, iterations=12)
    tv = sum(abs(got[v] - ref[v]) for v in got)
    assert set(got) == set(ref) and tv < 1e-9, tv
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_unreachable_component_gets_zero(spark):
    # two disjoint cycles; seeding one leaves the other at exactly 0
    edges = [("a", "b"), ("b", "a"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame(edges, "src string, dst string")
    sdf = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.rank
           for r in personalized_pagerank(df, sdf,
                                          iterations=15).collect()}
    assert got["x"] == 0.0 and got["y"] == 0.0
    assert got["a"] > got["b"] > 0
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_ppr_requires_seeds(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    empty = spark.createDataFrame([], "node string")
    with pytest.raises(ValueError):
        personalized_pagerank(df, empty)


def test_entity_pagerank_over_triples(spark):
    triples = spark.createDataFrame(
        [("pandas", "alias_of", "soft:pandas", "u1"),
         ("soft:pandas", "instance_of", "Library", "u1"),
         ("np", "alias_of", "soft:numpy", "u2"),
         ("soft:numpy", "instance_of", "Library", "u2"),
         ("soft:pandas", "mentioned_in", "u1", "u1")],
        "subj string, pred string, obj string, url string")
    got = {r.node: r.rank
           for r in entity_pagerank(triples, iterations=15).collect()}
    # mentioned_in must be excluded: no url node in the graph
    assert "u1" not in got
    # the shared type sink accumulates the most mass
    assert got["Library"] == max(got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_entity_pagerank_weighted_counts_distinct_evidence(spark):
    # pandas->Library asserted by 3 pages (one duplicated), numpy by 1:
    # weights must be DISTINCT urls (3 vs 1), matching the numpy ref
    rows = ([("soft:pandas", "instance_of", "Library", u)
             for u in ("u1", "u2", "u3", "u3")]
            + [("soft:numpy", "instance_of", "Library", "u1"),
               ("soft:pandas", "alias_of", "soft:numpy", "u1"),
               ("soft:pandas", "mentioned_in", "u1", "u1")])
    triples = spark.createDataFrame(
        rows, "subj string, pred string, obj string, url string")
    got = {r.node: r.rank
           for r in entity_pagerank_weighted(triples,
                                             iterations=12).collect()}
    ref = np_pagerank_weighted(
        [("soft:pandas", "Library", 3), ("soft:numpy", "Library", 1),
         ("soft:pandas", "soft:numpy", 1)], iterations=12)
    assert "u1" not in got          # mentioned_in stays excluded
    tv = sum(abs(got[v] - ref[v]) for v in got)
    assert set(got) == set(ref) and tv < 1e-9, tv
