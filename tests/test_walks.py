"""Random-walk corpus + neighborhood-Jaccard merge-candidate gates
(operators/walks.py). The fixture-derived strict DuckDB twins live in the
rotation gate (__spark_entry__.py `random_walks` / `merge_candidates`);
this file gates the properties that are structurally vacuous there —
walk validity, the start-bucket filter, partitioning invariance, the
`connected` flag, and the hub-midpoint cap — plus a random-graph
cross-engine strict sweep."""

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.walks import (merge_candidates,
                                                    merge_candidates_sql,
                                                    node2vec_walks,
                                                    node2vec_walks_sql,
                                                    random_walks,
                                                    random_walks_sql,
                                                    weighted_walks,
                                                    weighted_walks_sql)
from stackoverflowner_spark.session import get_spark
from tests.oracle_harness import compare


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-walks", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "e"),
         ("d", "e"), ("a", "e"), ("e", "f")]


def _duck(edges):
    con = duckdb.connect()
    con.execute("create table e_tbl(src varchar, dst varchar)")
    con.executemany("insert into e_tbl values (?, ?)", edges)
    return con, "select src, dst from e_tbl"


def random_graph(seed, n_nodes, n_edges):
    rng = random.Random(seed)
    nodes = [f"n{i:02d}" for i in range(n_nodes)]
    pairs = set()
    while len(pairs) < n_edges:
        a, b = rng.sample(nodes, 2)
        pairs.add((min(a, b), max(a, b)))
    return sorted(pairs)


def test_walks_are_valid_paths(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = random_walks(df, walks_per_node=2, walk_len=4,
                       start_bucket=None).toPandas()
    # every node appears in the undirected adjacency, so no walk dies:
    # exactly n_nodes * wpn walks of exactly walk_len steps each
    assert len(out) == 6 * 2 * 4
    assert set(out.groupby("walk_id").size()) == {4}
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _, w in out.sort_values("step").groupby("walk_id"):
        path = list(w.node)
        assert path[0] == w.walk_id.iloc[0].split("#")[0]
        for prev, cur in zip(path, path[1:]):
            assert cur in adj[prev], (w.walk_id.iloc[0], path)


def test_walks_start_bucket_and_partitioning_invariance(spark):
    import hashlib
    edges = random_graph(7, 20, 40)
    df1 = spark.createDataFrame(edges, ["src", "dst"])
    df32 = df1.repartition(32)
    full = random_walks(df1, 1, 3, start_bucket=None).toPandas()
    # pick a bucket some (but not all) nodes hash into
    nodes = sorted({v for e in edges for v in e})
    buckets = [hashlib.md5(n.encode()).hexdigest()[0] for n in nodes]
    bucket = next(b for b in buckets if buckets.count(b) < len(nodes))
    bucketed = random_walks(df32, 1, 3, start_bucket=bucket).toPandas()
    # the bucket filter selects a strict, non-empty subset of starts
    starts_full = {w.split("#")[0] for w in full.walk_id}
    starts_b = {w.split("#")[0] for w in bucketed.walk_id}
    assert starts_b and starts_b < starts_full
    # and the walks it keeps are bitwise the same ones, regardless of
    # input partitioning
    sub = full[full.walk_id.isin(set(bucketed.walk_id))]
    assert compare("bucket-subset", sub, bucketed, strict=True) == []


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_walks_strict_oracle_random_graphs(spark, seed):
    edges = random_graph(seed, 15, 30)
    df = spark.createDataFrame(edges, ["src", "dst"])
    con, esql = _duck(edges)
    got = random_walks(df, 2, 5, start_bucket=None).toPandas()
    want = con.execute(random_walks_sql(esql, 2, 5,
                                        start_bucket=None)).df()
    assert compare(f"walks-{seed}", got, want, strict=True) == []


def test_node2vec_walks_are_valid_paths(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = node2vec_walks(df, walks_per_node=2, walk_len=5,
                         start_bucket=None).toPandas()
    assert len(out) == 6 * 2 * 5
    adj = {}
    for a, b in EDGES:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for _, w in out.sort_values("step").groupby("walk_id"):
        path = list(w.node)
        for prev, cur in zip(path, path[1:]):
            assert cur in adj[prev]


def test_node2vec_zero_return_weight_never_backtracks(spark):
    # w_return=0: a zero-weight candidate cannot win the integer
    # cumulative draw, so no walk ever revisits its previous node
    edges = random_graph(21, 20, 50)
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = node2vec_walks(df, 2, 6, w_return=0, w_near=3, w_far=2,
                         start_bucket=None).toPandas()
    assert len(out) > 0
    deg = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for _, w in out.sort_values("step").groupby("walk_id"):
        path = list(w.node)
        for i in range(2, len(path)):
            # backtracking allowed ONLY via the dead-end escape hatch
            if path[i] == path[i - 2]:
                assert deg[path[i - 1]] == 1, path
    # and walks never die: full length everywhere
    assert set(out.groupby("walk_id").size()) == {6}


def test_node2vec_partitioning_invariance_and_strict_oracle(spark):
    edges = random_graph(22, 15, 30)
    df = spark.createDataFrame(edges, ["src", "dst"])
    a = node2vec_walks(df, 2, 5, start_bucket=None).toPandas()
    b = node2vec_walks(df.repartition(32), 2, 5,
                       start_bucket=None).toPandas()
    assert compare("n2v-part", a, b, strict=True) == []
    con, esql = _duck(edges)
    want = con.execute(node2vec_walks_sql(esql, 2, 5,
                                          start_bucket=None)).df()
    assert compare("n2v-oracle", a, want, strict=True) == []


def test_weighted_walks_follow_edge_weights(spark):
    # star: c-a weighs 99, c-b weighs 1 — walks from c should step to a
    # the overwhelming majority of the time (deterministic hash draws,
    # so this is a fixed count, asserted with slack)
    df = spark.createDataFrame([("a", "c", 99), ("b", "c", 1)],
                               ["src", "dst", "w"])
    out = weighted_walks(df, walks_per_node=64, walk_len=2,
                         start_bucket=None).toPandas()
    first = out[(out.step == 1)
                & out.walk_id.str.startswith("c#")].node.tolist()
    assert len(first) == 64
    assert first.count("a") >= 55, first.count("a")
    # validity: every step follows an edge
    adj = {"a": {"c"}, "b": {"c"}, "c": {"a", "b"}}
    for _, w in out.sort_values("step").groupby("walk_id"):
        path = list(w.node)
        for prev, cur in zip(path, path[1:]):
            assert cur in adj[prev]


@pytest.mark.parametrize("seed", [31, 32])
def test_weighted_walks_strict_oracle_random_graphs(spark, seed):
    rng = random.Random(seed)
    edges = [(a, b, rng.randint(1, 9)) for a, b in random_graph(seed, 15, 30)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    con = duckdb.connect()
    con.execute("create table e_tbl(src varchar, dst varchar, w int)")
    con.executemany("insert into e_tbl values (?, ?, ?)", edges)
    got = weighted_walks(df.repartition(16), 2, 5,
                         start_bucket=None).toPandas()
    want = con.execute(weighted_walks_sql(
        "select src, dst, w from e_tbl", 2, 5, start_bucket=None)).df()
    assert compare(f"ww-{seed}", got, want, strict=True) == []


def test_merge_candidates_flags_and_rational(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    out = (merge_candidates(df, min_jaccard_pct=30, min_common=1)
           .toPandas().set_index(["u", "w"]))
    # connected flag: (a, c) is a direct edge sharing neighbors; (a, d)
    # shares neighbors without an edge
    assert out.loc[("a", "c")].connected == 1
    assert out.loc[("a", "d")].connected == 0
    # exact rational: N(b)={a,c,d}, N(e)={c,d,a,f} -> common 3, union 4
    row = out.loc[("b", "e")]
    assert (row.common, row.du, row.dw, row.uni) == (3, 3, 4, 4)
    assert row.cand == 1 and row.connected == 0
    # both cand classes present
    assert set(out.cand) == {0, 1}


def test_merge_candidates_hub_cap_drops_midpoint_only(spark):
    # star: hub h connects to s0..s5; plus edge (s0, s1). With the hub
    # capped out as a midpoint, only the wedge through s0/s1 survives —
    # but the hub's ENDPOINT role is untouched (h pairs via s0/s1).
    edges = [("h", f"s{i}") for i in range(6)] + [("s0", "s1")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    uncapped = merge_candidates(df, 1, None, 1).toPandas()
    capped = merge_candidates(df, 1, 2, 1).toPandas()
    # uncapped: all C(6,2) spoke pairs share the hub, plus (h,s0)/(h,s1)
    # through the s1/s0 midpoints
    assert len(uncapped) == 17
    # capped: spoke-spoke pairs (common neighbor = hub, degree 6) gone;
    # hub-spoke pairs via s0/s1 (degree 2) survive
    pairs = set(zip(capped.u, capped.w))
    assert ("s2", "s3") not in pairs
    assert ("h", "s1") in pairs or ("h", "s0") in pairs


@pytest.mark.parametrize("seed", [11, 12])
def test_merge_candidates_strict_oracle_random_graphs(spark, seed):
    edges = random_graph(seed, 15, 35)
    df = spark.createDataFrame(edges, ["src", "dst"])
    con, esql = _duck(edges)
    for md in (None, 3):
        got = merge_candidates(df, 40, md, 1).toPandas()
        want = con.execute(merge_candidates_sql(esql, 40, md, 1)).df()
        assert len(got) > 0
        assert compare(f"mc-{seed}-{md}", got, want, strict=True) == []


@pytest.mark.parametrize("seed", [21, 22])
def test_merge_candidates_class_collapse_strict_oracle(spark, seed):
    # Non-vacuous neighborhood-class coverage for the collapsed wedge
    # plan: a hub-leaf graph where many leaves share one neighborhood
    # (multi-member classes, within-class diagonal expansion) on top of
    # a random core (singleton classes, cross-class expansion) — every
    # class shape compared strictly against the classic DuckDB replay.
    rng = random.Random(seed)
    core = random_graph(seed, 8, 14)
    hubs = ["n00", "n01", "n02"]
    edges = set(core)
    for i in range(12):  # leaves attached to a random hub PAIR:
        h1, h2 = rng.sample(hubs, 2)  # several leaves repeat a pair ->
        leaf = f"leaf{i:02d}"         # guaranteed multi-member classes
        edges.add((min(h1, leaf), max(h1, leaf)))
        edges.add((min(h2, leaf), max(h2, leaf)))
    edges = sorted(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    con, esql = _duck(edges)
    # sanity: the fixture really exercises a multi-member class
    from collections import Counter
    nbr = {}
    for a, b in edges:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    sizes = Counter(frozenset(v) for v in nbr.values())
    assert max(sizes.values()) >= 2
    for md, mc in ((None, 1), (None, 2), (4, 1)):
        got = merge_candidates(df, 40, md, mc).toPandas()
        want = con.execute(merge_candidates_sql(esql, 40, md, mc)).df()
        assert len(got) > 0
        assert compare(f"mcc-{seed}-{md}-{mc}", got, want, strict=True) == []
