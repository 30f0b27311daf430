"""Golden parity: engine vs independent naive oracle on the reference
query set — rank-identical top-k doc_ids and BITWISE float64 score
equality (BASELINE.json:6; SURVEY.md §5.3)."""

import struct

import pytest

from yase_spark.oracle import build_naive
from yase_spark.query import IndexReader
from yase_spark.synth import gen_corpus_pdf, reference_query_set


@pytest.fixture(scope="module")
def reader(spark, tiny_index):
    root, cfg, _ = tiny_index
    return IndexReader(spark, root, cfg)


@pytest.fixture(scope="module")
def naive():
    pdf = gen_corpus_pdf(1000).sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    return build_naive([(i + 1, t) for i, t in enumerate(pdf["content"])])


def _bits(x: float) -> bytes:
    return struct.pack("<d", x)


@pytest.mark.parametrize("q", reference_query_set(), ids=lambda q: q["query_id"])
def test_reference_query_parity(reader, naive, q):
    if q["kind"] == "topk":
        got = reader.topk(q["query"], q["k"])
        want = naive.topk(q["query"], q["k"])
        assert [g[1] for g in got] == [w[1] for w in want], "rank identity"
        assert [g[0] for g in got] == [w[0] for w in want]
        for g, w in zip(got, want):
            assert _bits(g[2]) == _bits(w[2]), f"bitwise score {g} vs {w}"
    elif q["kind"] == "bool_and":
        assert list(reader.bool_and(q["query"])) == naive.bool_and(q["query"])
    else:
        assert list(reader.bool_or(q["query"])) == naive.bool_or(q["query"])


def test_stats_parity(reader, naive):
    assert reader.n_docs == naive.n_docs
    assert _bits(reader.avgdl) == _bits(naive.avgdl)


def test_distributed_topk_rank_parity(reader):
    """The cluster-side serving path must agree with driver WAND on
    doc_id ranks (scores can differ in final ulps — different sum order)."""
    for q in ["table", "getUserName json", "value part hash"]:
        drv = reader.topk(q, 10)
        dist = reader.topk_distributed(q, 10).orderBy("rank").collect()
        assert [(r["rank"], r["doc_id"]) for r in dist] == [
            (r, d) for r, d, _ in drv
        ]
        for (_, _, s1), r in zip(drv, dist):
            assert abs(s1 - r["score"]) < 1e-9


def test_wand_equals_naive_executor(reader):
    """WAND pruning must be invisible: identical output to the unpruned
    engine executor, including ties (score DESC, doc_id ASC)."""
    queries = [
        "table", "getUserName json", "value part hash", "zzz_absent",
        "key row scan slow fast", "norm_grad copy",
    ]
    for q in queries:
        for k in (1, 5, 25, 100):
            a = reader.topk(q, k, use_wand=True)
            b = reader.topk(q, k, use_wand=False)
            assert a == b, (q, k)
