"""Recall gates for the approximate similarity paths (VERDICT r01 item 3).

Banded LSH ANN and IVF-probe search must reach >= 0.9 recall@k against the
exact brute-force ``cosine_topk`` on a clustered corpus (base vectors plus
small perturbations — the regime ANN is for; on isotropic random vectors no
sublinear method retains recall, which is why r01's single-band variant
looked fine on the fixture while being a recall cliff on real data).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stackoverflowner_spark.operators.dedup import embedding_near_dup_pairs
from stackoverflowner_spark.operators.similarity import (
    cosine_topk, ivf_topk, lsh_ann_topk)
from stackoverflowner_spark.session import get_spark

DIM = 32


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app_name="sokg-recall", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def clustered(spark):
    """40 cluster centers x 10 members: members of a cluster have cosine
    ~0.97+ to each other; cross-cluster cosine ~0."""
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(40, DIM))
    rows = []
    vid = 0
    for c in centers:
        base = c / np.linalg.norm(c)
        for _ in range(10):
            v = base + rng.normal(scale=0.08, size=DIM)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema).cache()


def _recall(approx_df, exact_df) -> float:
    exact = {(r.q_id, r.vec_id) for r in exact_df.collect()}
    approx = {(r.q_id, r.vec_id) for r in approx_df.collect()}
    return len(exact & approx) / len(exact)


def test_banded_lsh_ann_recall(spark, clustered):
    queries = clustered.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(clustered, queries, k=5)
    approx = lsh_ann_topk(clustered, queries, dim=DIM, k=5,
                          bands=4, rows_per_band=3)
    assert _recall(approx, exact) >= 0.9


def test_ivf_probe_recall(spark, clustered):
    queries = clustered.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(clustered, queries, k=5)
    approx = ivf_topk(clustered, queries, dim=DIM, k=5,
                      n_centroids=8, nprobe=4)
    assert _recall(approx, exact) >= 0.9


def test_banded_near_dup_catches_seeded_pairs(spark, clustered):
    """Every within-cluster pair is a near-duplicate at threshold 0.9; the
    banded self-join must surface >= 90% of them (single-band r01 design
    missed any pair differing in one bit)."""
    pairs = embedding_near_dup_pairs(clustered, dim=DIM, threshold=0.9,
                                     bands=3, rows_per_band=4)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    # ground truth from the exact pairwise cosine within clusters
    rows = clustered.collect()
    vecs = {r.vec_id: np.array(r.embedding) for r in rows}
    truth = set()
    for a in vecs:
        for b in vecs:
            if a < b and a // 10 == b // 10:
                ca, cb = vecs[a], vecs[b]
                cos = ca @ cb / (np.linalg.norm(ca) * np.linalg.norm(cb))
                if cos >= 0.9:
                    truth.add((a, b))
    assert truth, "fixture must contain true near-dup pairs"
    assert len(found & truth) / len(truth) >= 0.9


def test_kmeans_fit_matches_local_lloyd_and_improves_ivf(spark, clustered):
    """Distributed Lloyd (kmeans_fit) must (a) agree with a local numpy
    Lloyd run from the same init within float tolerance, (b) reduce
    within-cluster scatter vs the seed centroids, and (c) not hurt IVF
    probe recall when its centroids replace the seeds."""
    from stackoverflowner_spark.operators.similarity import (
        ivf_centroids, kmeans_fit)

    K, ITERS = 8, 3
    got = kmeans_fit(clustered, dim=DIM, k=K, iters=ITERS)

    vecs = np.array([r.embedding for r in
                     clustered.orderBy("vec_id").collect()], dtype=np.float64)
    cents = np.array(ivf_centroids(DIM, K), dtype=np.float64)

    def assign(V, C):
        # cosine argmax with lowest-index tie-break, like _nearest_col
        sims = (V @ C.T) / np.maximum(
            np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return sims.argmax(axis=1)

    ref = cents.copy()
    for _ in range(ITERS):
        a = assign(vecs, ref)
        for c in range(K):
            if (a == c).any():
                ref[c] = vecs[a == c].mean(axis=0)
    assert np.allclose(np.array(got), ref, atol=1e-5)

    def scatter(C):
        a = assign(vecs, C)
        sims = (vecs @ C.T) / np.maximum(
            np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        Cn = np.maximum(np.linalg.norm(C, axis=1), 1e-12)
        return float(np.mean(sims[np.arange(len(vecs)), a] / Cn[a]))

    assert scatter(np.array(got)) > scatter(cents)  # higher mean cosine

    queries = clustered.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = cosine_topk(clustered, queries, k=5)
    trained = ivf_topk(clustered, queries, dim=DIM, k=5, n_centroids=K,
                       nprobe=4, centroids=got)
    assert _recall(trained, exact) >= 0.9
