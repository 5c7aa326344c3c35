"""Quality-classifier training (operators/classifier.py): distributed
full-batch logistic GD must equal the closed-form numpy trajectory, learn a
separable problem, and deploy as pure-codegen scoring."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from autoextraction_spark.operators import classifier


def _numpy_gd(X: np.ndarray, y: np.ndarray, lr: float, iters: int) -> list[np.ndarray]:
    w = np.zeros(X.shape[1])
    snaps = [w.copy()]
    for _ in range(iters):
        err = 1.0 / (1.0 + np.exp(-X @ w)) - y
        w = w - lr * (X.T @ err) / len(y)
        snaps.append(w.copy())
    return snaps


@pytest.fixture(scope="module")
def toy(spark):
    # separable-ish synthetic features: y=1 rows get higher x1
    rows = []
    rng = np.random.RandomState(7)
    for i in range(200):
        y = i % 2
        rows.append((
            float(y), 1.0, 0.3 + 0.4 * y + 0.05 * rng.rand(),
            0.1 * rng.rand(), 0.2 + 0.1 * rng.rand(), 0.5,
        ))
    df = spark.createDataFrame(rows, "y double, x0 double, x1 double, "
                                     "x2 double, x3 double, x4 double")
    return df, np.array([r[1:] for r in rows]), np.array([r[0] for r in rows])


def test_logreg_matches_numpy(toy):
    df, X, y = toy
    out = classifier.logreg_train(df, lr=2.0, iters=3).toPandas()
    out = out.sort_values("iter").reset_index(drop=True)
    snaps = _numpy_gd(X, y, 2.0, 3)
    assert len(out) == 4
    for k, w_ref in enumerate(snaps):
        got = out.loc[k, [f"w{j}" for j in range(5)]].to_numpy(dtype=float)
        assert np.allclose(got, np.round(w_ref, 6), atol=2e-6), (k, got, w_ref)


def test_logreg_learns_separable(toy):
    df, X, y = toy
    out = classifier.logreg_train(df, lr=2.0, iters=8).toPandas()
    final = out.sort_values("iter").iloc[-1]
    w = np.array([final[f"w{j}"] for j in range(5)], dtype=float)
    # loss must decrease vs w=0 and x1 (the signal feature) must dominate
    def loss(w):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        return -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))
    assert loss(w) < loss(np.zeros(5))
    assert w[1] > 0 and abs(w[1]) == max(abs(w[j]) for j in range(1, 5))


def test_classify_plan_and_semantics(spark):
    docs = spark.createDataFrame(
        [(0, "the cat sat on the mat."), (1, "zzz qqq xxx")],
        "doc_id long, text string",
    )
    out = classifier.classify(docs, [4.0, 0.0, 0.0, -1.0, 0.0], threshold=0.5)
    rows = {r["doc_id"]: r for r in out.collect()}
    # stopword-rich doc: x3 > 0 pulls score below sigmoid(4)=0.982
    assert rows[0]["score"] < rows[1]["score"]
    assert rows[0]["keep"] == 1 and rows[1]["keep"] == 1
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    with pytest.raises(ValueError):
        classifier.classify(docs, [1.0, 2.0])
