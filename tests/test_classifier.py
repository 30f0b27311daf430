"""Quality-classifier gates — yase_spark.classifier.

The replay is the same full-batch GD in numpy on the collected
features: identical iteration count, learning rate, clamps. Spark's
cross-partition sum order is not fixed, so weights match to 1e-9
relative (documented), predictions exactly.
"""

import numpy as np
import pytest

from yase_spark.classifier import featurize, predict, train_logreg

RNG_ROWS = [
    # two clearly separable blobs in (x1, x2): label 1 high, label 0 low
    *[(i, 1.0, 3.0 + 0.01 * i, 0.8, 0.5, 1.0) for i in range(20)],
    *[(100 + i, 1.0, 1.0 + 0.01 * i, 0.2, 0.1, 0.0) for i in range(20)],
]


@pytest.fixture(scope="module")
def xy(spark):
    feats = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3], r[4]) for r in RNG_ROWS],
        ["doc_id", "x0", "x1", "x2", "x3"],
    )
    labels = spark.createDataFrame(
        [(r[0], r[5]) for r in RNG_ROWS], ["doc_id", "y"]
    )
    return feats, labels


def _np_gd(X, y, n_iters, lr, l2=0.0):
    w = np.zeros(X.shape[1])
    losses = []
    for _ in range(n_iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        losses.append(
            float(
                np.mean(
                    -(
                        y * np.log(np.maximum(p, 1e-12))
                        + (1 - y) * np.log(np.maximum(1 - p, 1e-12))
                    )
                )
            )
        )
        w = w - lr * ((X.T @ (p - y)) / len(y) + l2 * w)
    return w, losses


def test_gd_matches_numpy_replay(xy):
    feats, labels = xy
    w, losses = train_logreg(feats, labels, n_iters=40, lr=0.5)
    X = np.array([[r[1], r[2], r[3], r[4]] for r in RNG_ROWS])
    y = np.array([r[5] for r in RNG_ROWS])
    wn, ln = _np_gd(X, y, 40, 0.5)
    assert np.allclose(w, wn, rtol=1e-9, atol=1e-12)
    assert np.allclose(losses, ln, rtol=1e-9, atol=1e-12)
    # loss decreases on a separable problem
    assert losses[-1] < losses[0]


def test_separable_is_perfectly_classified(xy):
    feats, labels = xy
    w, _ = train_logreg(feats, labels, n_iters=60, lr=0.5)
    got = {
        r["doc_id"]: r["pred"] for r in predict(feats, w).collect()
    }
    for r in RNG_ROWS:
        assert got[r[0]] == (r[5] == 1.0)


def test_standardized_gd_matches_numpy_replay(xy):
    feats, labels = xy
    w, losses = train_logreg(
        feats, labels, n_iters=40, lr=0.5, standardize=True
    )
    X = np.array([[r[1], r[2], r[3], r[4]] for r in RNG_ROWS])
    y = np.array([r[5] for r in RNG_ROWS])
    mu, sd = X.mean(axis=0), X.std(axis=0)
    mu[0], sd[0] = 0.0, 1.0  # bias untouched
    sd[sd == 0] = 1.0
    Xs = (X - mu) / sd
    ws, ln = _np_gd(Xs, y, 40, 0.5)
    raw = ws / sd
    raw[0] = ws[0] - np.sum(ws[1:] * mu[1:] / sd[1:])
    assert np.allclose(w, raw, rtol=1e-8, atol=1e-10)
    assert np.allclose(losses, ln, rtol=1e-8, atol=1e-10)
    assert losses[-1] < losses[0]


def test_learns_on_real_corpus_features(spark):
    # trusted-slice weak label (docs >= 300 chars — the testdata lang/
    # source columns are uniform random metadata, uncorrelated with
    # text, so a metadata label is unlearnable BY CONSTRUCTION; length
    # is the one real signal) must beat the base rate by a wide margin:
    # GD has to recover the threshold through the nonlinear log-words /
    # mean-word-len features
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    feats = featurize(docs)
    labels = docs.selectExpr(
        "doc_id", "CAST(n_chars >= 300 AS DOUBLE) AS y"
    )
    w, losses = train_logreg(
        feats, labels, n_iters=30, lr=0.5, standardize=True
    )
    assert losses[-1] < losses[0] < 0.7
    joined = predict(feats, w).join(labels, "doc_id")
    acc = joined.selectExpr(
        "avg(CAST(pred = (y = 1.0) AS DOUBLE)) AS a"
    ).collect()[0]["a"]
    base = max(
        labels.selectExpr("avg(y) AS p").collect()[0]["p"],
        1 - labels.selectExpr("avg(y) AS p").collect()[0]["p"],
    )
    assert acc >= base + 0.25


def test_l2_shrinks_weights(xy):
    feats, labels = xy
    w0, _ = train_logreg(feats, labels, n_iters=30, lr=0.5, l2=0.0)
    w1, _ = train_logreg(feats, labels, n_iters=30, lr=0.5, l2=0.5)
    assert np.linalg.norm(np.array(w1)) < np.linalg.norm(np.array(w0))


def test_featurize_shape_and_map_only(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox", "en", "s", 19)],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    f = featurize(docs)
    assert f.columns == ["doc_id", "x0", "x1", "x2", "x3", "x4"]
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure map-side featurization
    row = f.collect()[0]
    assert row["x0"] == 1.0 and row["x1"] > 0


def test_rejects_bad_args(xy):
    feats, labels = xy
    with pytest.raises(ValueError):
        train_logreg(feats, labels, n_iters=0)
    with pytest.raises(ValueError):
        train_logreg(feats, labels.filter("y > 5"), n_iters=3)
