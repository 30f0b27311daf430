"""Ranking evaluation — the Elasticsearch ``_rank_eval`` API surface.

Given a batch of ranked retrieval results and a graded judgment list
(qrels), compute the standard offline relevance metrics per query:
precision@k, recall@k, MRR (ES ``mean_reciprocal_rank``), DCG and
nDCG@k (ES ``dcg`` with ``normalize: true``), exactly as ES defines
them (exponential gain ``2^grade - 1``, ``log2(rank + 1)`` discount,
ideal DCG from the top-k grades of the FULL judged set).

Relational shape: rank assignment is one per-query window over the
result set (results are query_id-keyed and k-capped — thousands of
rows per query at most, never corpus-sized); the judged join is a
(query_id, doc_id) equi-join; every metric is then ONE query_id-keyed
aggregation. Judgment lists are small by construction (human- or
LLM-graded samples), so Spark broadcasts them into the join; nothing
here touches the corpus — at 100 TB the expensive part is producing
``results`` (the serving lane), not scoring it.

Determinism: ranks tie-break on doc_id; integer grades; metrics are
float but each is a sum/extremum of <= k terms, rounded at the
contract boundary (6 dp) like every ranked surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_eval(results: DataFrame, judgments: DataFrame, k: int = 10) -> DataFrame:
    """Per-query relevance metrics at cutoff ``k``.

    ``results``: (query_id, doc_id, score) — ranked candidates per
    query (any number of rows; only the top-``k`` by (score DESC,
    doc_id ASC) are evaluated). ``judgments``: (query_id, doc_id,
    grade) with integer grade >= 0; grade > 0 means relevant. Docs
    absent from the judgment list count as grade 0 (the ES default for
    unjudged hits).

    Output: (query_id, n_rel, precision_r, recall_r, mrr_r, dcg_r,
    ndcg_r), one row per query_id appearing in ``results``, ordered by
    query_id. Queries with an empty relevant set report 0 recall/nDCG
    (ES reports 0 there too, rather than NaN).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    rel = judgments.filter(F.col("grade") > 0)

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (
        results.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )

    gain = F.pow(F.lit(2.0), F.col("grade")) - 1.0
    hits = topk.join(F.broadcast(rel), ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("grade"), F.lit(0)).alias("grade"),
    )
    per = hits.groupBy("query_id").agg(
        F.sum(F.when(F.col("grade") > 0, 1).otherwise(0)).alias("rel_at_k"),
        F.sum(gain / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        F.max(
            F.when(F.col("grade") > 0, 1.0 / F.col("rank")).otherwise(0.0)
        ).alias("mrr"),
    )

    totals = rel.groupBy("query_id").agg(F.count("*").alias("total_rel"))
    iw = Window.partitionBy("query_id").orderBy(F.desc("grade"), F.asc("doc_id"))
    ideal = (
        rel.withColumn("i", F.row_number().over(iw))
        .filter(F.col("i") <= k)
        .groupBy("query_id")
        .agg(F.sum(gain / F.log2(F.col("i") + 1.0)).alias("idcg"))
    )

    return (
        per.join(F.broadcast(totals), "query_id", "left")
        .join(F.broadcast(ideal), "query_id", "left")
        .select(
            "query_id",
            F.col("rel_at_k").cast("long").alias("n_rel"),
            F.round(F.col("rel_at_k") / float(k), 6).alias("precision_r"),
            F.round(
                F.when(
                    F.coalesce(F.col("total_rel"), F.lit(0)) > 0,
                    F.col("rel_at_k") / F.col("total_rel"),
                ).otherwise(0.0),
                6,
            ).alias("recall_r"),
            F.round("mrr", 6).alias("mrr_r"),
            F.round("dcg", 6).alias("dcg_r"),
            F.round(
                F.when(
                    F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                    F.col("dcg") / F.col("idcg"),
                ).otherwise(0.0),
                6,
            ).alias("ndcg_r"),
        )
        .orderBy("query_id")
    )
