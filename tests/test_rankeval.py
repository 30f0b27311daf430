"""Ranking-evaluation gates — yase_spark.rankeval.

Closed-form hand computations on a tiny fixed qrels/results pair,
plus the structural invariants: a perfect ranking has nDCG == 1, a
fully-unjudged result list scores 0 everywhere, and rank assignment
tie-breaks on doc_id.
"""

import math

import pytest

from yase_spark.rankeval import rank_eval

# query 0: docs 1..4 returned with descending scores; grades 2,0,1,0;
# one more relevant doc (9, grade 3) never retrieved.
RESULTS = [
    (0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0), (0, 4, 6.0),
    # query 1: perfect ranking of its two relevant docs
    (1, 5, 5.0), (1, 6, 4.0),
    # query 2: nothing judged
    (2, 7, 3.0), (2, 8, 2.0),
]
JUDGMENTS = [
    (0, 1, 2), (0, 3, 1), (0, 9, 3),
    (1, 5, 2), (1, 6, 1),
]


def _dcg(grades):
    return sum(
        (2.0 ** g - 1.0) / math.log2(i + 2.0) for i, g in enumerate(grades)
    )


@pytest.fixture(scope="module")
def metrics(spark):
    res = spark.createDataFrame(RESULTS, ["query_id", "doc_id", "score"])
    jd = spark.createDataFrame(JUDGMENTS, ["query_id", "doc_id", "grade"])
    rows = rank_eval(res, jd, k=3).collect()
    return {r["query_id"]: r for r in rows}


def test_query0_hand_computed(metrics):
    r = metrics[0]
    # top-3 = docs 1,2,3 with grades 2,0,1; relevant set size 3
    assert r["n_rel"] == 2
    assert r["precision_r"] == round(2 / 3, 6)
    assert r["recall_r"] == round(2 / 3, 6)
    assert r["mrr_r"] == 1.0
    assert r["dcg_r"] == round(_dcg([2, 0, 1]), 6)
    assert r["ndcg_r"] == round(_dcg([2, 0, 1]) / _dcg([3, 2, 1]), 6)


def test_perfect_ranking_is_ndcg_one(metrics):
    r = metrics[1]
    assert r["ndcg_r"] == 1.0
    assert r["precision_r"] == round(2 / 3, 6)  # only 2 exist, k=3
    assert r["recall_r"] == 1.0
    assert r["mrr_r"] == 1.0


def test_unjudged_query_scores_zero(metrics):
    r = metrics[2]
    assert (
        r["n_rel"], r["precision_r"], r["recall_r"], r["mrr_r"], r["ndcg_r"]
    ) == (0, 0.0, 0.0, 0.0, 0.0)


def test_rank_ties_break_on_doc_id(spark):
    # equal scores: doc 11 must outrank doc 12, so with k=1 only doc 11
    # (relevant) is inside the cutoff
    res = spark.createDataFrame(
        [(0, 12, 1.0), (0, 11, 1.0)], ["query_id", "doc_id", "score"]
    )
    jd = spark.createDataFrame([(0, 11, 1)], ["query_id", "doc_id", "grade"])
    r = rank_eval(res, jd, k=1).collect()[0]
    assert r["n_rel"] == 1 and r["mrr_r"] == 1.0


def test_k_must_be_positive(spark):
    res = spark.createDataFrame([(0, 1, 1.0)], ["query_id", "doc_id", "score"])
    with pytest.raises(ValueError):
        rank_eval(res, res.selectExpr("query_id", "doc_id", "1 AS grade"), k=0)
