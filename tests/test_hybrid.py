"""RRF fusion gates (yase_spark/hybrid.py) — pure-driver arithmetic,
so the tests are direct; the driver row ``hybrid_topk`` replays both
rankings and the fusion in SQL."""

from yase_spark.hybrid import hybrid_topk, rrf_fuse


def test_rrf_basic_fusion():
    text = [(1, 10, 5.0), (2, 20, 4.0), (3, 30, 3.0)]
    vec = [(1, 20, 0.9), (2, 40, 0.8)]
    got = rrf_fuse([text, vec], k=10, c=60)
    # doc 20: 1/62 + 1/61 beats doc 10: 1/61
    assert [d for _, d, _ in got] == [20, 10, 40, 30]
    assert got[0][2] == 1.0 / 62 + 1.0 / 61
    assert got[0][0] == 1 and got[-1][0] == 4


def test_rrf_tie_breaks_on_doc_id():
    a = [(1, 7, 0.0)]
    b = [(1, 3, 0.0)]
    got = rrf_fuse([a, b], k=10)
    assert [(r, d) for r, d, _ in got] == [(1, 3), (2, 7)]
    assert got[0][2] == got[1][2]


def test_rrf_k_cap_and_missing_lists():
    text = [(i, i, 0.0) for i in range(1, 31)]
    got = hybrid_topk(text, [], k=5)
    assert len(got) == 5
    assert [d for _, d, _ in got] == [1, 2, 3, 4, 5]
