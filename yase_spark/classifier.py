"""Trainable quality classifier — distributed logistic regression over
the heuristic quality features, the fastText-style filter stage
(CCNet / GPT-3 WebText classifier, Brown et al. 2020 §A) every
curation pipeline trains: fit on weak labels (a trusted slice vs the
rest), then score and threshold the whole corpus.

Distributed shape: batch gradient descent where EACH iteration is ONE
map-side-combinable aggregation — the executors compute per-partition
partial sums of x_i·(sigmoid(x·w) − y), the driver reduces d+1 doubles
and updates w (d ≈ 5: the weight vector is broadcast as literals into
the next iteration's expression; nothing model-sized ever shuffles).
That is exactly how a parameter-server-free batch trainer runs at
100 TB: iterations cost one corpus pass each, the update is O(d) on
the driver, convergence gates live in the training loop.

All per-row math is pure JVM expression (sigmoid via exp; the dot
product unrolls over the fixed feature list — no UDF). Float sum order
across partitions is not fixed, so trained weights match a single-node
replay to ~1e-9 relative, not bitwise; predictions are thresholded and
the contract entry reports (doc_id, prob rounded, pred) — stable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURES = ["bias", "log_words", "mean_word_len", "alnum_ratio", "stop_ratio"]


def featurize(docs: DataFrame) -> DataFrame:
    """(doc_id, x0..x4) from the heuristic quality features: bias,
    log1p(word count), mean word length, alnum ratio, English-stopword
    ratio. Map-only (one WholeStageCodegen span over the scan)."""
    from .textstats import quality_scores

    q = quality_scores(docs)
    return q.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.log1p(F.col("n_words").cast("double")).alias("x1"),
        F.col("mean_word_len").alias("x2"),
        F.col("alnum_ratio").alias("x3"),
        F.col("stop_ratio").alias("x4"),
    )


def _dot(w: list[float]):
    expr = None
    for i, wi in enumerate(w):
        term = F.col(f"x{i}") * F.lit(float(wi))
        expr = term if expr is None else expr + term
    return expr


def train_logreg(
    feats: DataFrame,
    labels: DataFrame,
    n_iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
    standardize: bool = False,
) -> tuple[list[float], list[float]]:
    """Fit w by full-batch gradient descent.

    ``feats``: (doc_id, x0..xd-1); ``labels``: (doc_id, y) with y in
    {0.0, 1.0}. Returns (weights, per-iteration mean log-loss). The
    joined frame is persisted once; each iteration is a single
    aggregation job (d gradient sums + the loss), so the total cost is
    n_iters corpus passes and nothing else.

    ``standardize=True`` z-scores the non-bias features first (one
    extra aggregation for the d means/stds — raw ratio/length features
    span an order of magnitude, which makes fixed-lr GD diverge) and
    maps the fitted weights BACK to raw-feature space, so ``predict``
    always takes raw ``featurize`` output.
    """
    if n_iters <= 0 or lr <= 0:
        raise ValueError("n_iters and lr must be positive")
    d = sum(1 for c in feats.columns if c.startswith("x"))
    xy = feats.join(labels, "doc_id").persist()
    n = xy.count()
    if n == 0:
        raise ValueError("no labeled rows")
    mu = [0.0] * d
    sd = [1.0] * d
    if standardize:
        stats = xy.agg(
            *[F.avg(f"x{i}").alias(f"m{i}") for i in range(1, d)],
            *[F.stddev_pop(f"x{i}").alias(f"s{i}") for i in range(1, d)],
        ).collect()[0]
        for i in range(1, d):
            mu[i] = float(stats[f"m{i}"])
            s = float(stats[f"s{i}"])
            sd[i] = s if s > 0 else 1.0
        xy = xy.select(
            "doc_id",
            "y",
            F.col("x0"),
            *[
                ((F.col(f"x{i}") - mu[i]) / sd[i]).alias(f"x{i}")
                for i in range(1, d)
            ],
        ).persist()
    w = [0.0] * d
    losses: list[float] = []
    try:
        for _ in range(n_iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(w)))
            err = p - F.col("y")
            aggs = [F.sum(F.col(f"x{i}") * err).alias(f"g{i}") for i in range(d)]
            # clamped log-loss: the 1e-12 floor keeps saturated rows
            # finite (same guard a numpy replay needs)
            aggs.append(
                F.avg(
                    -(
                        F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
                        + (1.0 - F.col("y"))
                        * F.log(F.greatest(1.0 - p, F.lit(1e-12)))
                    )
                ).alias("loss")
            )
            row = xy.agg(*aggs).collect()[0]
            losses.append(float(row["loss"]))
            w = [
                wi - lr * (float(row[f"g{i}"]) / n + l2 * wi)
                for i, wi in enumerate(w)
            ]
    finally:
        xy.unpersist()
    if standardize:
        # back to raw-feature space: w_raw_i = w_i/sd_i,
        # bias_raw = w_0 - Σ w_i·mu_i/sd_i
        raw = [w[i] / sd[i] for i in range(d)]
        raw[0] = w[0] - sum(w[i] * mu[i] / sd[i] for i in range(1, d))
        w = raw
    return w, losses


def predict(feats: DataFrame, w: list[float], threshold: float = 0.5) -> DataFrame:
    """(doc_id, prob_r, pred) — map-only scoring with the trained
    weights inlined as literals."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(w)))
    return feats.select(
        "doc_id",
        F.round(p, 6).alias("prob_r"),
        (p >= threshold).alias("pred"),
    )


def sigmoid(z: float) -> float:
    return 1.0 / (1.0 + math.exp(-z))
