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


# ------------------------------------------------------------- minmax_fuse

def test_minmax_fuse_hand_computed():
    from yase_spark.hybrid import minmax_fuse

    text = [(1, 10, 8.0), (2, 11, 6.0), (3, 12, 4.0)]   # norm: 1, .5, 0
    vec = [(1, 11, 0.9), (2, 13, 0.5)]                  # norm: 1, 0
    out = minmax_fuse([text, vec], [0.7, 0.3], k=10)
    want = {10: 0.7, 11: 0.35 + 0.3, 12: 0.0, 13: 0.0}
    assert [(d, round(s, 9)) for _, d, s in out] == sorted(
        ((d, round(s, 9)) for d, s in want.items()),
        key=lambda x: (-x[1], x[0]),
    )
    assert [r for r, _, _ in out] == [1, 2, 3, 4]


def test_minmax_fuse_degenerate_and_validation():
    import pytest

    from yase_spark.hybrid import minmax_fuse

    flat = [(1, 1, 5.0), (2, 2, 5.0)]       # all-equal -> every norm 1.0
    out = minmax_fuse([flat], [1.0], k=10)
    assert [(d, s) for _, d, s in out] == [(1, 1.0), (2, 1.0)]
    assert minmax_fuse([[]], [1.0]) == []
    with pytest.raises(ValueError):
        minmax_fuse([flat], [1.0, 2.0])


def test_minmax_magnitude_beats_rank_when_dominant():
    # the property RRF cannot express: one dominant text hit with a
    # flat tail keeps its lead under linear fusion even when the vector
    # ranking mildly prefers another doc
    from yase_spark.hybrid import minmax_fuse, rrf_fuse

    text = [(1, 1, 100.0), (2, 2, 1.01), (3, 3, 1.0)]
    vec = [(1, 2, 0.9), (2, 1, 0.89), (3, 3, 0.1)]
    lin = minmax_fuse([text, vec], [0.5, 0.5], k=1)
    assert lin[0][1] == 1  # doc 1 dominates on magnitude
    rrf = rrf_fuse([[(r, d) for r, d, _ in text], [(r, d) for r, d, _ in vec]], k=2)
    assert {rrf[0][1], rrf[1][1]} == {1, 2}  # rank-only: 1 and 2 tie-ish
