"""SemDeDup (operators/dedup.semantic_dedup).

Gates: planted duplicate groups keep exactly one representative (the
lexicographically smallest id); distinct-direction vectors all survive;
brute-force parity against a numpy reference implementing the same
cluster -> within-cluster-cosine -> components -> min-id semantics with
the same trained centroids; the documented cross-cluster miss is
demonstrated (not hidden) with a planted split pair.
"""

import math
import random

import numpy as np
import pytest

from stackoverflowner_spark.operators.dedup import semantic_dedup
from stackoverflowner_spark.operators.similarity import kmeans_fit
from stackoverflowner_spark.session import get_spark

DIM = 8


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-semdedup", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def _jitter(v, rng, eps=0.01):
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w)) or 1.0
    return [x / n for x in w]


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>")


def test_planted_groups_keep_one_rep(spark):
    rng = random.Random(5)
    base1, base2 = _unit(rng), _unit(rng)
    rows = [(1, base1), (2, _jitter(base1, rng)), (3, _jitter(base1, rng)),
            (10, base2), (11, _jitter(base2, rng))]
    rows += [(100 + i, _unit(rng)) for i in range(6)]
    out = {r.vec_id: (r.rep, r.keep)
           for r in semantic_dedup(_df(spark, rows), DIM, n_clusters=4,
                                   threshold=0.98).collect()}
    assert len(out) == len(rows)
    # group {1,2,3}: rep '1' (lexicographic min), only id 1 kept
    assert out[1] == ("1", True)
    assert out[2][0] == "1" and not out[2][1]
    assert out[3][0] == "1" and not out[3][1]
    # group {10,11}: '10' < '11' lexicographically
    assert out[10] == ("10", True)
    assert out[11][0] == "10" and not out[11][1]
    # singletons all keep themselves
    for i in range(6):
        assert out[100 + i] == (str(100 + i), True)


def _brute(rows, cents, threshold):
    """numpy reference with identical semantics + the same centroids."""
    C = np.array(cents)
    ids = [i for i, _ in rows]
    V = np.array([v for _, v in rows])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    assign = np.argmax(Vn @ Cn.T, axis=1)  # lowest index wins ties

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if assign[i] != assign[j]:
                continue
            cos = float(Vn[i] @ Vn[j])
            if cos >= threshold:
                a, b = find(ids[i]), find(ids[j])
                if a != b:
                    parent[max(a, b)] = min(a, b)
    groups = {}
    for i in ids:
        groups.setdefault(find(i), []).append(i)
    rep = {}
    for members in groups.values():
        r = min(str(m) for m in members)
        for m in members:
            rep[m] = r
    return {i: (rep[i], str(i) == rep[i]) for i in ids}


def test_brute_force_parity(spark):
    rng = random.Random(17)
    bases = [_unit(rng) for _ in range(4)]
    rows = []
    k = 0
    for b in bases:
        for _ in range(rng.randint(2, 4)):
            rows.append((k, _jitter(b, rng, eps=0.02)))
            k += 1
    rows += [(k + i, _unit(rng)) for i in range(8)]
    df = _df(spark, rows)
    cents = kmeans_fit(df, DIM, k=3, iters=3)
    got = {r.vec_id: (r.rep, r.keep)
           for r in semantic_dedup(df, DIM, threshold=0.9,
                                   centroids=cents).collect()}
    # the reference must see float32-rounded vectors (the DataFrame
    # stores array<float>), not the python doubles
    rows32 = [(i, np.array(v, dtype=np.float32).tolist()) for i, v in rows]
    assert got == _brute(rows32, cents, 0.9)


def test_cross_cluster_miss_is_documented_behavior(spark):
    # two near-identical vectors forced into different clusters by
    # explicit centroids equal to the vectors themselves: the pair is
    # missed — the method's documented trade, asserted so a future
    # "fix" that silently changes semantics trips this gate
    rng = random.Random(3)
    v = _unit(rng)
    w = _jitter(v, rng, eps=0.001)
    cents = [v, w]
    out = {r.vec_id: r.keep
           for r in semantic_dedup(_df(spark, [(1, v), (2, w)]), DIM,
                                   threshold=0.9,
                                   centroids=cents).collect()}
    assert out == {1: True, 2: True}
