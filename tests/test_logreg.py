"""logreg_train tests (operators/analytics.py): foreign cross-check
against an independent NumPy gradient-descent reference with the same
rounding contract, a separable-data sanity check, and scoring."""

import numpy as np
import pytest

from accelerator_spark.operators.analytics import logreg_score, logreg_train


def _numpy_gd(X, y, iters, lr=1.0, dp=6):
    n, dim = X.shape
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        r = 1.0 / (1.0 + np.exp(-(X @ w + b))) - y
        w = np.round(w - lr * (X.T @ r) / n, dp)
        b = round(b - lr * float(r.sum()) / n, dp)
    return w, b


def test_matches_numpy_reference(spark):
    rng = np.random.RandomState(11)
    # generic (unrounded) values: decimal-rounded inputs combined with
    # the exactly-0.5 first-iteration sigmoid land gradient values
    # exactly ON 6dp rounding boundaries, where summation-order noise
    # flips the rounded digit — real float data has no such alignment
    X = rng.randn(80, 6)
    y = (X[:, 0] + 0.5 * X[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], float(y[i]))
         for i in range(80)],
        "vec_id long, embedding array<double>, label double")
    w, b = logreg_train(df, iters=4)
    rw, rb = _numpy_gd(X, y, 4)
    np.testing.assert_allclose(w, rw, atol=1e-9)
    assert b == pytest.approx(rb, abs=1e-9)


def test_learns_separable_data(spark):
    rows = [(i, [1.0 if i % 2 else -1.0], float(i % 2))
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label double")
    w, b = logreg_train(df, iters=50, lr=2.0)
    scored = logreg_score(df, w, b)
    got = [(r.label, r.prob) for r in scored.collect()]
    assert all((p > 0.5) == (lab == 1.0) for lab, p in got)


def test_validation(spark):
    df = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label double")
    with pytest.raises(ValueError):
        logreg_train(df)
    with pytest.raises(ValueError):
        logreg_train(df, iters=0)
