"""kmeans_train tests (operators/similarity.py): foreign cross-check
against an independent NumPy Lloyd implementation with the same
determinism contract, plus edge paths (empty cluster, k>n, invariance
under repartition)."""

import numpy as np
import pytest

from accelerator_spark.operators.similarity import kmeans_train


def _numpy_lloyd(X, k, iters, coord_dp=6, score_dp=4):
    """Independent reference: same contract (init = k lowest-id rows,
    unit-centroid rounded-dot argmax with lowest-id tiebreak, means
    rounded per iteration, empty cluster keeps its centroid)."""
    cents = X[:k].astype(np.float64).copy()
    sizes = np.zeros(k, dtype=int)
    for _ in range(iters):
        norms = np.sqrt((cents ** 2).sum(axis=1))
        units = cents / np.where(norms > 0, norms, 1.0)[:, None]
        scores = np.round(X @ units.T, score_dp)
        assign = np.argmax(scores, axis=1)  # argmax takes FIRST max
        sizes = np.bincount(assign, minlength=k)
        for c in range(k):
            if sizes[c]:
                cents[c] = np.round(X[assign == c].mean(axis=0), coord_dp)
    return cents, sizes


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    X = np.round(rng.randn(120, 8), 3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(len(X))],
        "vec_id long, embedding array<double>")
    cents_df, assigned = kmeans_train(df, k=3, iters=3)
    got = {r.c_id: (list(r.c_emb), r.n_members) for r in cents_df.collect()}
    ref_c, ref_n = _numpy_lloyd(X, 3, 3)
    for c in range(3):
        assert got[c][1] == ref_n[c]
        np.testing.assert_allclose(got[c][0], ref_c[c], atol=1e-9)
    # assigned covers the corpus exactly once with the final centroids
    assert assigned.count() == 120
    norms = np.sqrt((ref_c ** 2).sum(axis=1))
    units = ref_c / norms[:, None]
    final_ref = np.argmax(np.round(X @ units.T, 4), axis=1)
    got_assign = {r.vec_id: r.c_id for r in assigned.collect()}
    assert [got_assign[i] for i in range(120)] == list(final_ref)


def test_empty_cluster_keeps_centroid(spark):
    # vec 0 and 1 are near-identical: everything assigns to c0 (ties
    # break low), so c1 empties and must keep its seed coordinates
    rows = [(0, [1.0, 0.0]), (1, [1.0, 1e-9]), (2, [0.9, 0.0]),
            (3, [0.8, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents_df, _ = kmeans_train(df, k=2, iters=2)
    got = {r.c_id: (list(r.c_emb), r.n_members) for r in cents_df.collect()}
    assert got[1] == ([1.0, 1e-9], 0)
    assert got[0][1] == 4
    assert got[0][0] == [round(3.7 / 4, 6), 0.0]


def test_validation_and_invariance(spark):
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(5)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        kmeans_train(df, k=9, iters=1)
    with pytest.raises(ValueError):
        kmeans_train(df, k=0)
    a, _ = kmeans_train(df, k=2, iters=2)
    b, _ = kmeans_train(df.repartition(7), k=2, iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
