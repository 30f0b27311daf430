"""Learning-to-rank: candidate feature extraction, a trainable
pointwise re-ranker on the distributed logistic trainer, and linear
re-scoring — the ES Learning-To-Rank plugin shape (feature logging ->
offline train -> rescore window), reduced to the pointwise-linear case
so serving is exactly SQL-replayable.

Split of verification burden, mirroring the quality classifier:

* SERVING (``ltr_rerank``) takes CONSTANT weights, so the full ranking
  is a closed-form expression over oracle-recomputable features — a
  full-value driver oracle.
* TRAINING (``ltr_train``) reuses ``classifier.train_logreg`` —
  full-batch GD where each iteration is one map-side-combinable
  aggregation (the parameter-server-free 100-TB trainer shape); float
  partial-sum order makes weights ~1e-9-reproducible, not bitwise, so
  training is pytest-gated (planted preference recovered, loss
  decreasing) rather than driver-oracled.

Features are deliberately the ones a search engine already has at
rescore time — no second corpus pass: the BM25 score and matched-term
count come from the contribution lane the candidate fetch already ran,
doc length and recency from the docs dimension (doc_id-keyed broadcast
join against a depth-bounded candidate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenize import analyze_query

# x0 bias, x1 bm25, x2 matched-fraction, x3 length norm, x4 recency
LTR_FEATURES = ["bias", "bm25", "matched_frac", "dl_norm", "recency"]


def dot_sql(weights: list[float], cols: list[str]) -> str:
    """SQL text of the linear score — fixed term order, double-cast
    constants (the shared-expression parity device): engine and oracle
    evaluate the identical expression."""
    if len(weights) != len(cols):
        raise ValueError("weights/cols length mismatch")
    return " + ".join(
        f"cast({float(w)!r} as double) * ({c})" for w, c in zip(weights, cols)
    )


def ltr_features(rd, query: str, depth: int = 50) -> DataFrame:
    """(doc_id, x0..x4) for the BM25 top-``depth`` candidates of
    ``query``:

    - x0 = 1 (bias)
    - x1 = the BM25 score (the first-pass ranker's output)
    - x2 = matched distinct query terms / |query terms|
    - x3 = doc_len / avgdl (length prior)
    - x4 = doc_id / n_docs (ingest-order recency proxy in [0, 1])

    Scale shape: ONE contribution-lane pass (score + matched count in
    the same doc_id-keyed aggregation), TakeOrdered to ``depth``, then
    a doc_id join against the docs dimension where the candidate side
    is depth-bounded — broadcast-eligible by construction. This is the
    feature-logging half of the LTR loop; at 10^12 docs nothing here
    exceeds the cost of the rescore window that follows."""
    qterms = list(dict.fromkeys(analyze_query(query)))
    if not qterms or depth <= 0:
        return rd.spark.createDataFrame(
            [], schema="doc_id long, x0 double, x1 double, x2 double, "
            "x3 double, x4 double"
        )
    per_doc = (
        rd.contrib_df(qterms, include_term=True)
        .groupBy("doc_id")
        .agg(
            F.sum("contrib").alias("bm25"),
            F.count("term").alias("matched"),
        )
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(depth)
    )
    docs = rd.cat.read(rd.spark, "docs").select("doc_id", "doc_len")
    nq, avgdl, n = float(len(qterms)), float(rd.avgdl), float(rd.n_docs)
    return per_doc.join(docs, "doc_id").select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        F.col("bm25").alias("x1"),
        (F.col("matched") / F.lit(nq)).alias("x2"),
        (F.col("doc_len") / F.lit(avgdl)).alias("x3"),
        (F.col("doc_id") / F.lit(n)).alias("x4"),
    )


def ltr_rerank(
    rd, query: str, weights: list[float], k: int = 10, depth: int = 50
) -> DataFrame:
    """Linear LTR re-scoring of the BM25 top-``depth`` window (the ES
    rescore contract: a doc outside the window can never enter):
    ltr = w · x over ``LTR_FEATURES``, final order (ltr DESC, doc_id).
    Output (rank, doc_id, ltr_r, bm25_r) — both rounded 5.

    The linear form is not a toy: it is the densified last step of
    every production LTR stack (a GBDT's leaf scores are summed the
    same way), and the property that matters for the oracle — serving
    is a pure expression over recomputable features — is what makes
    model rollouts auditable at all."""
    from pyspark.sql import Window

    feats = ltr_features(rd, query, depth)
    expr = dot_sql(weights, [f"x{i}" for i in range(len(LTR_FEATURES))])
    scored = feats.select(
        "doc_id", F.expr(expr).alias("ltr"), F.col("x1").alias("bm25")
    )
    top = scored.orderBy(F.desc("ltr"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("ltr"), F.asc("doc_id"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).select(
        "rank", "doc_id",
        F.round("ltr", 5).alias("ltr_r"),
        F.round("bm25", 5).alias("bm25_r"),
    )


def ltr_train(
    feats: DataFrame, labels: DataFrame, n_iters: int = 60, lr: float = 0.5
) -> tuple[list[float], list[float]]:
    """Pointwise LTR training: logistic regression of relevance labels
    (0/1) on the ranking features — ``classifier.train_logreg``
    verbatim (each iteration = one map-combinable aggregation; weights
    broadcast as literals). Returns (weights, per-iteration loss)."""
    from .classifier import train_logreg

    return train_logreg(feats, labels, n_iters=n_iters, lr=lr,
                        standardize=True)
