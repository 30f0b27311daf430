"""Percolation gates (yase_spark/percolate.py): CNF semantics against a
pure-python replay, validation errors, and the no-cross-join plan."""

import re

import pytest
from pyspark.sql import functions as F

from yase_spark.percolate import percolate

DOCS = [
    (0, "spark streams data fast"),
    (1, "flink handles the stream"),
    (2, "spark but no s-t-r-e-a-m word here"),
    (3, "plain text about nothing"),
    (4, "stream only, no engines"),
]
QUERIES = [
    (10, [["spark", "flink"], ["stream", "streams"]]),  # engine AND stream*
    (11, [["spark"]]),
    (12, [["nothing"], ["text"]]),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_percolate_matches_python_replay(spark, docs):
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, QUERIES).collect()
    )
    want = []
    for d, text in DOCS:
        toks = {w for w in re.split("[^a-z0-9]+", text.lower()) if w}
        for qid, groups in QUERIES:
            if all(any(t in toks for t in g) for g in groups):
                want.append((d, qid))
    assert got == sorted(want)
    assert (0, 10) in got and (1, 10) in got
    assert (2, 10) not in got  # has engine, lacks stream
    assert (4, 10) not in got  # has stream, lacks engine


def test_percolate_validation():
    import yase_spark.percolate as P

    class _FakeDF:  # never reached — validation fires first
        sparkSession = None

    with pytest.raises(ValueError, match="empty CNF"):
        P.percolate(_FakeDF(), [(1, [])])
    with pytest.raises(ValueError, match="empty OR-group"):
        P.percolate(_FakeDF(), [(1, [[]])])
    with pytest.raises(ValueError, match="single"):
        P.percolate(_FakeDF(), [(1, [["two words"]])])


def test_percolate_no_cross_join(spark, docs):
    plan = (
        percolate(docs, QUERIES)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
