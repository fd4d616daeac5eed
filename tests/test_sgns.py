"""SGNS gates (operators/sgns.py): the distributed trainer must be
BITWISE equal to a single-process pure-Python replay (hash-random init,
hash-drawn negatives, row-local float64 with the rational fast sigmoid,
exact fixed-point gradient reduction), invariant to partitioning, and
must actually learn (positive-pair scores rise monotonically over
epochs). The pair table and the epoch-0 gradient aggregate have DuckDB
twins in __spark_entry__.py (`sgns_pairs` / `sgns_grad`, rotation-gated
in tests/test_decontam.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from stackoverflowner_spark.operators.kgembed import _FP
from stackoverflowner_spark.operators.sgns import (sgns_train, walk_pairs)
from stackoverflowner_spark.operators.walks import random_walks
from stackoverflowner_spark.session import get_spark

SEED = 0
DIM = 4
LR = 0.025
WINDOW = 2
K_NEG = 2

EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "e"),
         ("d", "e"), ("a", "e"), ("e", "f"), ("d", "f")]


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-sgns", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def walks_df(spark):
    df = spark.createDataFrame(EDGES, ["src", "dst"])
    return random_walks(df, walks_per_node=2, walk_len=5,
                        start_bucket=None).localCheckpoint()


def _unit(s: str) -> float:
    return float(int(hashlib.md5(s.encode()).hexdigest()[:15], 16)) \
        / float(16 ** 15)


def _init(ids, kind, dim=DIM, seed=SEED):
    bound = 6.0 / dim ** 0.5
    return {i: [(_unit(f"{seed}:{kind}:{i}:{d}") * 2.0 - 1.0) * bound
                for d in range(dim)] for i in ids}


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + x * y
    return acc


def _sig(x):
    return 0.5 * (1.0 + x / (1.0 + abs(x)))


def _pairs(walks, window=WINDOW):
    by_walk = {}
    for wid, step, node in walks:
        by_walk.setdefault(wid, []).append((step, node))
    out = []
    for wid, steps in by_walk.items():
        for s1, c in steps:
            for s2, x in steps:
                if 1 <= abs(s1 - s2) <= window:
                    out.append((wid, s1, s2, c, x))
    return out


def replay(walks, dim=DIM, window=WINDOW, epochs=3, lr=LR, k_neg=K_NEG,
           seed=SEED):
    """Pure-Python bit-for-bit replay of sgns_train."""
    pairs = _pairs(walks, window)
    nodes = sorted({n for _, _, n in walks})
    n = len(nodes)
    ein = _init(nodes, "in", dim, seed)
    eout = _init(nodes, "out", dim, seed)
    scale = lr / float(_FP)
    for epoch in range(epochs):
        grads = {}

        def add(nid, kind, gvec):
            for d, g in enumerate(gvec):
                key = (nid, kind, d)
                grads[key] = grads.get(key, 0) + int(g * float(_FP))

        for (wid, s1, s2, c, x) in pairs:
            u, v = ein[c], eout[x]
            coef = _sig(_dot(u, v)) - 1.0
            add(c, "in", [coef * v[d] for d in range(dim)])
            add(x, "out", [coef * u[d] for d in range(dim)])
            for k in range(k_neg):
                nid = nodes[int(hashlib.md5(
                    f"sgnsneg:{seed}:{epoch}:{wid}:{s1}:{s2}:{k}".encode()
                ).hexdigest()[:15], 16) % n]
                nv = eout[nid]
                cn = _sig(_dot(u, nv))
                add(c, "in", [cn * nv[d] for d in range(dim)])
                add(nid, "out", [cn * u[d] for d in range(dim)])
        for emb, kind in ((ein, "in"), (eout, "out")):
            for nid in emb:
                if any((nid, kind, d) in grads for d in range(dim)):
                    emb[nid] = [emb[nid][d]
                                - scale * grads.get((nid, kind, d), 0)
                                for d in range(dim)]
    return ein, eout


def _collect(emb_df):
    return {r["id"]: list(r["vec"]) for r in emb_df.collect()}


def test_trainer_equals_pure_python_replay_bitwise(spark, walks_df):
    walks = [(r.walk_id, r.step, r.node) for r in walks_df.collect()]
    want_in, want_out = replay(walks, epochs=3)
    got_in, got_out = sgns_train(walks_df, dim=DIM, window=WINDOW,
                                 epochs=3, lr=LR, k_neg=K_NEG, seed=SEED)
    assert _collect(got_in) == want_in
    assert _collect(got_out) == want_out


def test_partitioning_invariance(spark, walks_df):
    a_in, a_out = sgns_train(walks_df, dim=DIM, epochs=2)
    b_in, b_out = sgns_train(walks_df.repartition(32), dim=DIM, epochs=2,
                             partitions=7)
    assert _collect(a_in) == _collect(b_in)
    assert _collect(a_out) == _collect(b_out)


def test_pairs_brute_force(spark, walks_df):
    walks = [(r.walk_id, r.step, r.node) for r in walks_df.collect()]
    want = sorted(_pairs(walks))
    got = sorted(tuple(r) for r in walk_pairs(walks_df, WINDOW).collect())
    assert got == want


def test_learns_community_structure(spark):
    """End-to-end DeepWalk gate: SGNS over node2vec walks on two
    4-cliques joined by one bridge must embed same-clique nodes closer
    (mean intra-clique cosine > mean inter-clique cosine of the in
    embeddings). Fully deterministic — hash walks, full-batch trainer —
    so this is a fixed arithmetic fact, not a stochastic assertion."""
    import itertools
    import math

    from stackoverflowner_spark.operators.walks import node2vec_walks
    ca = [f"a{i}" for i in range(4)]
    cb = [f"b{i}" for i in range(4)]
    edges = ([(x, y) for x, y in itertools.combinations(ca, 2)]
             + [(x, y) for x, y in itertools.combinations(cb, 2)]
             + [("a0", "b0")])
    df = spark.createDataFrame(edges, ["src", "dst"])
    walks = node2vec_walks(df, walks_per_node=6, walk_len=8,
                           w_return=1, w_near=4, w_far=1,
                           start_bucket=None)
    ein, _ = sgns_train(walks, dim=8, window=2, epochs=6, lr=0.05,
                        k_neg=3)
    vecs = _collect(ein)

    def cos(u, v):
        d = sum(x * y for x, y in zip(u, v))
        nu = math.sqrt(sum(x * x for x in u))
        nv = math.sqrt(sum(x * x for x in v))
        return d / (nu * nv)

    intra = [cos(vecs[x], vecs[y]) for grp in (ca, cb)
             for x, y in itertools.combinations(grp, 2)]
    inter = [cos(vecs[x], vecs[y]) for x in ca for y in cb]
    mi, mx = sum(intra) / len(intra), sum(inter) / len(inter)
    assert mi > mx, (mi, mx)


def test_positive_scores_rise_over_epochs(spark, walks_df):
    """SGNS learns: the mean positive-pair score dot(u_center, v_ctx)
    must rise monotonically over the first epochs (full-batch
    deterministic descent — not a flaky stochastic assertion)."""
    pairs = walk_pairs(walks_df, WINDOW).localCheckpoint()

    def mean_score(emb_in, emb_out):
        u = emb_in.select(F.col("id").alias("_u"), F.col("vec").alias("uv"))
        v = emb_out.select(F.col("id").alias("_v"), F.col("vec").alias("vv"))
        j = (pairs.join(u, pairs.center == u._u)
             .join(v, pairs.ctx == v._v))
        s = F.aggregate(F.zip_with("uv", "vv", lambda a, b: a * b),
                        F.lit(0.0), lambda acc, x: acc + x)
        return j.agg(F.avg(s)).collect()[0][0]

    scores = []
    for ep in (0, 2, 4):
        ein, eout = sgns_train(walks_df, dim=DIM, epochs=ep)
        scores.append(mean_score(ein, eout))
    assert scores[0] < scores[1] < scores[2], scores
