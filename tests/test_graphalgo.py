"""Graph-algorithm gates: triangle counts, BFS distances, and weighted
SSSP vs local brute force; exactly-once triangle enumeration; partition
invariance; radius-bound semantics."""

import heapq
import random
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.graphalgo import (
    bfs_distances, kcore, triangle_count, weighted_sssp)
from stackoverflowner_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-graphalgo", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _random_graph(n=60, m=220, seed=7):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


def _brute_triangles(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    per = defaultdict(int)
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    per[a] += 1
                    per[b] += 1
                    per[c] += 1
    return dict(per)


def _brute_bfs(edges, seeds):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        x = q.popleft()
        for y in adj[x]:
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def test_triangles_match_brute_force(spark):
    edges = _random_graph()
    sdf = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.tri for r in triangle_count(sdf).collect()}
    assert got == _brute_triangles(edges)


def test_triangles_exactly_once(spark):
    # duplicate edges, both directions, self loops — canonicalization
    # must collapse them; sum of per-node counts is 3 * total triangles
    tri = [(1, 2), (2, 3), (3, 1)]
    noisy = tri + [(2, 1), (3, 2), (1, 1), (2, 3), (1, 3)]
    sdf = spark.createDataFrame(noisy, "src int, dst int")
    got = {r.node: r.tri for r in triangle_count(sdf).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangles_none_on_tree(spark):
    sdf = spark.createDataFrame([(i, i + 1) for i in range(20)],
                                "src int, dst int")
    assert triangle_count(sdf).count() == 0


def test_triangles_partition_invariant(spark):
    edges = _random_graph(seed=11)
    a = spark.createDataFrame(edges, "src int, dst int")
    b = spark.createDataFrame(list(reversed(edges)),
                              "src int, dst int").repartition(7)
    ga = sorted((r.node, r.tri) for r in triangle_count(a).collect())
    gb = sorted((r.node, r.tri) for r in triangle_count(b).collect())
    assert ga == gb


def test_bfs_matches_brute_force(spark):
    edges = _random_graph(n=80, m=140, seed=3)  # sparse -> wider radius
    seeds = [0, 41]
    sdf = spark.createDataFrame(edges, "src int, dst int")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node int")
    got = {r.node: r.dist for r in bfs_distances(sdf, seed_df).collect()}
    assert got == _brute_bfs(edges, seeds)


def test_bfs_unreachable_absent_and_radius_bound(spark):
    edges = [(0, 1), (1, 2), (2, 3), (10, 11)]  # two components
    sdf = spark.createDataFrame(edges, "src int, dst int")
    seed_df = spark.createDataFrame([(0,)], "node int")
    got = {r.node: r.dist for r in bfs_distances(sdf, seed_df).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    capped = {r.node: r.dist
              for r in bfs_distances(sdf, seed_df, max_iter=2).collect()}
    assert capped == {0: 0, 1: 1, 2: 2}


def _random_weighted(n=60, m=200, wmax=5, seed=13):
    rng = random.Random(seed)
    edges = {}
    while len(edges) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b and (a, b) not in edges:
            edges[(a, b)] = rng.randint(1, wmax)
    return [(a, b, w) for (a, b), w in sorted(edges.items())]


def _dijkstra(edges, seeds, max_cost):
    adj = defaultdict(list)
    for a, b, w in edges:
        adj[a].append((b, w))
    dist = {}
    heap = [(0, s) for s in seeds]
    while heap:
        c, x = heapq.heappop(heap)
        if x in dist or c > max_cost:
            continue
        dist[x] = c
        for y, w in adj[x]:
            if y not in dist and c + w <= max_cost:
                heapq.heappush(heap, (c + w, y))
    return dist


def test_sssp_matches_dijkstra(spark):
    edges = _random_weighted()
    seeds = [0, 17]
    sdf = spark.createDataFrame(edges, "src int, dst int, w int")
    seed_df = spark.createDataFrame([(s,) for s in seeds], "node int")
    got = {r.node: r.cost
           for r in weighted_sssp(sdf, seed_df, max_cost=10 ** 6).collect()}
    assert got == _dijkstra(edges, seeds, 10 ** 6)


def test_sssp_cost_bound_is_semantic(spark):
    # 0 -1-> 1 -1-> 2 -5-> 3: bound 2 reaches node 2, never node 3
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 5)]
    sdf = spark.createDataFrame(edges, "src int, dst int, w int")
    seed_df = spark.createDataFrame([(0,)], "node int")
    got = {r.node: r.cost
           for r in weighted_sssp(sdf, seed_df, max_cost=2).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


def test_sssp_prefers_cheap_long_path(spark):
    # direct hop costs 9; the three-hop detour costs 3 — Bellman-Ford's
    # later iterations must overwrite the earlier tentative cost
    edges = [(0, 3, 9), (0, 1, 1), (1, 2, 1), (2, 3, 1)]
    sdf = spark.createDataFrame(edges, "src int, dst int, w int")
    seed_df = spark.createDataFrame([(0,)], "node int")
    got = {r.node: r.cost
           for r in weighted_sssp(sdf, seed_df, max_cost=100).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_sssp_multi_edge_takes_min_and_directed(spark):
    # parallel edges collapse to min weight; direction is respected
    edges = [(0, 1, 7), (0, 1, 2), (2, 0, 1)]
    sdf = spark.createDataFrame(edges, "src int, dst int, w int")
    seed_df = spark.createDataFrame([(0,)], "node int")
    got = {r.node: r.cost
           for r in weighted_sssp(sdf, seed_df, max_cost=100).collect()}
    assert got == {0: 0, 1: 2}  # node 2 unreachable from 0 (edge is 2->0)


def _brute_kcore(edges, k):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive
                if len(adj[n] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {n: len(adj[n] & alive) for n in alive}


def _kcore_spark(spark, edges, k):
    sdf = spark.createDataFrame(edges, "src int, dst int")
    return {r.node: r.deg for r in kcore(sdf, k).collect()}


def test_kcore_triangle_survives_tail_pruned(spark):
    # triangle 1-2-3 plus a pendant path 3-4-5: 2-core = the triangle
    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)]
    assert _kcore_spark(spark, edges, 2) == {1: 2, 2: 2, 3: 2}


def test_kcore_cascade_empties_path(spark):
    # peeling must CASCADE: every path endpoint removal exposes the next
    edges = [(i, i + 1) for i in range(10)]
    assert _kcore_spark(spark, edges, 2) == {}


def test_kcore_clique(spark):
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    assert _kcore_spark(spark, edges, 4) == {n: 4 for n in range(5)}
    assert _kcore_spark(spark, edges, 5) == {}


def test_kcore_matches_brute_force(spark):
    edges = _random_graph(n=50, m=140, seed=23)
    for k in (2, 3, 4):
        assert _kcore_spark(spark, edges, k) == _brute_kcore(edges, k)


def test_cli_analytics_flag(spark, tmp_path, capsys):
    """run_pipeline --analytics emits pagerank/triangles/kcore parquet
    over the produced KG's entity edges."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from run_pipeline import main

    out = str(tmp_path / "out")
    ana = str(tmp_path / "ana")
    assert main(["--synth", "200", "--mode", "fused", "--tagger",
                 "gazetteer", "--out", out, "--analytics", ana]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()
             if x.startswith("{")]
    stats = next(l["analytics"] for l in lines if "analytics" in l)
    assert stats["edges"] > 0 and stats["pagerank_rows"] > 0
    pr = spark.read.parquet(ana + "/pagerank")
    assert pr.count() == stats["pagerank_rows"]
    assert spark.read.parquet(ana + "/kcore2").count() == \
        stats["kcore2_nodes"]
    n_comm = (spark.read.parquet(ana + "/communities")
              .select("community").distinct().count())
    assert stats["communities"] == n_comm and n_comm > 0


# ---------------------------------------------------------------- LPA --- #

def _brute_lpa(edges, max_iter=10):
    """Reference synchronous LPA with the operator's exact semantics."""
    from collections import Counter
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nbrs = defaultdict(set)
    for u, v in und:
        nbrs[u].add(v)
        nbrs[v].add(u)
    lab = {n: n for n in nbrs}
    for _ in range(max_iter):
        new = {}
        for n in nbrs:
            cnt = Counter(lab[m] for m in nbrs[n])
            new[n] = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        changed = new != lab
        lab = new
        if not changed:
            break
    return lab


def _lpa_spark(spark, edges, max_iter=10):
    from stackoverflowner_spark.operators.graphalgo import lpa_communities
    df = spark.createDataFrame(list(edges), "src long, dst long")
    return {r.node: r.community
            for r in lpa_communities(df, max_iter=max_iter).collect()}


def test_lpa_two_cliques_bridge(spark):
    clique1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    clique2 = [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
    got = _lpa_spark(spark, clique1 + clique2 + [(4, 5)])
    assert {got[n] for n in (1, 2, 3, 4)} == {1}
    assert {got[n] for n in (5, 6, 7, 8)} == {5}


def test_lpa_matches_brute_force(spark):
    edges = _random_graph(n=40, m=90, seed=31)
    assert _lpa_spark(spark, edges) == _brute_lpa(edges)
    edges2 = _random_graph(n=50, m=60, seed=47)  # sparse, many comps
    assert _lpa_spark(spark, edges2) == _brute_lpa(edges2)


def test_lpa_bipartite_oscillation_bounded(spark):
    # K2: labels swap forever under synchronous updates; max_iter bounds
    # it and parity holds at any cutoff
    edges = [(1, 2)]
    for it in (1, 2, 3, 4):
        assert _lpa_spark(spark, edges, max_iter=it) == \
            _brute_lpa(edges, max_iter=it)


def test_cli_analytics_emits_harmonic(spark, tmp_path, capsys):
    """--analytics also writes the HyperBall harmonic-centrality table
    (one row per entity-graph node, nonnegative scores)."""
    import json
    import sys
    sys.path.insert(0, "/root/repo")
    from run_pipeline import main

    out = str(tmp_path / "out_h")
    ana = str(tmp_path / "ana_h")
    assert main(["--synth", "200", "--mode", "fused", "--tagger",
                 "gazetteer", "--out", out, "--analytics", ana]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()
             if x.startswith("{")]
    stats = next(l["analytics"] for l in lines if "analytics" in l)
    h = spark.read.parquet(ana + "/harmonic")
    assert h.count() == stats["harmonic_rows"] > 0
    assert h.filter("harmonic < 0").count() == 0
