"""Learning-to-rank (ltr.py): feature extraction, linear re-ranking,
pointwise training on the distributed logistic trainer.

Gates: features equal a python recompute from the engine's own full
ranking + docs dimension; re-ranking with hand weights equals a python
argsort of the same dot products (and weight={bm25:1} degenerates to
the BM25 order); training on a planted preference (docs containing the
preferred term labeled relevant) learns weights that rank a
preferred-term doc above a same-BM25 unpreferred one, with decreasing
loss.
"""

import pytest
from pyspark.sql import functions as F

from yase_spark.ltr import LTR_FEATURES, dot_sql, ltr_features, ltr_rerank, ltr_train
from yase_spark.query import IndexReader

Q = "merge sort scan"
DEPTH = 40


@pytest.fixture(scope="module")
def rd(spark, tiny_index):
    root, cfg, _ = tiny_index
    return IndexReader(spark, root, cfg)


@pytest.fixture(scope="module")
def base(rd, spark):
    rows = rd.topk_msm(Q, min_match=1, k=rd.n_docs).collect()
    dls = {
        r["doc_id"]: r["doc_len"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "doc_len").collect()
    }
    return {
        r["doc_id"]: (r["score"], r["matched"], dls[r["doc_id"]])
        for r in rows
    }


def test_features_match_replay(rd, base):
    feats = {r["doc_id"]: r for r in ltr_features(rd, Q, DEPTH).collect()}
    assert len(feats) == DEPTH
    top = sorted(base.items(), key=lambda kv: (-kv[1][0], kv[0]))[:DEPTH]
    assert set(feats) == {d for d, _ in top}
    nq, avgdl, n = 3.0, rd.avgdl, float(rd.n_docs)
    for d, (s, m, dl) in top:
        r = feats[d]
        assert r["x0"] == 1.0
        assert r["x1"] == pytest.approx(s, rel=1e-12)
        assert r["x2"] == pytest.approx(m / nq, rel=1e-12)
        assert r["x3"] == pytest.approx(dl / avgdl, rel=1e-12)
        assert r["x4"] == pytest.approx(d / n, rel=1e-12)


def test_rerank_matches_python_dot(rd, base):
    w = [0.0, 1.0, 0.8, -0.3, 0.5]
    feats = {r["doc_id"]: r for r in ltr_features(rd, Q, DEPTH).collect()}
    exp = sorted(
        (
            -(sum(wi * r[f"x{i}"] for i, wi in enumerate(w))),
            d,
        )
        for d, r in feats.items()
    )[:10]
    got = ltr_rerank(rd, Q, w, k=10, depth=DEPTH).collect()
    assert [r["doc_id"] for r in got] == [d for _s, d in exp]
    for r, (ns, _d) in zip(got, exp):
        assert r["ltr_r"] == pytest.approx(round(-ns, 5), abs=2e-5)
    # pure-bm25 weights degenerate to the BM25 window order
    got_bm = ltr_rerank(rd, Q, [0.0, 1.0, 0.0, 0.0, 0.0], k=10).collect()
    bm = sorted(((-s, d) for d, (s, _m, _dl) in base.items()))[:10]
    assert [r["doc_id"] for r in got_bm] == [d for _s, d in bm]
    with pytest.raises(ValueError):
        dot_sql([1.0], ["x0", "x1"])


def test_train_learns_planted_preference(spark):
    """Corpus where half the docs contain 'gold': label those relevant.
    The trained model must push a gold doc above a same-shape plain
    doc, and the loss must come down."""
    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    import tempfile

    texts = []
    for i in range(40):
        base = "merge sort scan " + ("hash " * (i % 3))
        texts.append(base + ("gold value" if i % 2 == 0 else "lead value"))
    corpus = spark.createDataFrame(
        [("r", f"{i:04d}", "h", "py", t) for i, t in enumerate(texts)],
        "repo string, path string, commit string, lang string, content string",
    )
    root = tempfile.mkdtemp(prefix="ltr_ix_") + "/ix"
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, hot_term_df=10**9)
    build_index(spark, corpus, root, cfg)
    rd = IndexReader(spark, root, cfg)
    # query includes 'gold', so matched_frac separates the classes
    q = "merge sort gold"
    feats = ltr_features(rd, q, depth=40)
    orig = {
        r["doc_id"]: int(r["path"])
        for r in rd.cat.read(spark, "docs").select("doc_id", "path").collect()
    }
    lab = spark.createDataFrame(
        [(d, 1.0 if orig[d] % 2 == 0 else 0.0) for d in
         [r["doc_id"] for r in feats.select("doc_id").collect()]],
        "doc_id long, y double",
    )
    w, losses = ltr_train(feats, lab, n_iters=40, lr=0.5)
    assert len(w) == len(LTR_FEATURES)
    assert losses[-1] < losses[0] * 0.8
    ranked = ltr_rerank(rd, q, w, k=40, depth=40).collect()
    # mean rank of relevant docs must beat irrelevant
    ranks = {orig[r["doc_id"]] % 2 == 0: [] for r in ranked}
    for r in ranked:
        ranks[orig[r["doc_id"]] % 2 == 0].append(r["rank"])
    assert sum(ranks[True]) / len(ranks[True]) < sum(ranks[False]) / len(ranks[False])
