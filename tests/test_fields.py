"""Multi-field search gates (yase_spark/fields.py).

The driver row ``fields_topk`` validates the weighted combination
against a two-family BM25 SQL oracle; these tests gate the structural
invariants: doc-id alignment across field indexes, equivalence to the
single-field lane at weight 1, agreement with a driver-side eager
recomputation, and the mismatched-corpus check.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.config import IndexConfig
from yase_spark.fields import fields_topk
from yase_spark.index import build_index
from yase_spark.query import IndexReader
from yase_spark.synth import corpus_df
from yase_spark.tokenize import analyze_query


@pytest.fixture(scope="module")
def two_fields(spark, tiny_corpus, tiny_index, tmp_path_factory):
    """content index (the shared fixture) + a 'path field' index built
    from the same corpus rows with content := the path string."""
    root, cfg, _ = tiny_index
    froot = str(tmp_path_factory.mktemp("fields") / "path_idx")
    fcorpus = tiny_corpus.withColumn("content", F.col("path"))
    build_index(spark, fcorpus, froot, cfg)
    return (root, froot, cfg)


def test_doc_ids_align_across_fields(spark, two_fields):
    """Ids are minted from the natural key only, so every field index
    of the same corpus maps (repo, path, commit) -> the SAME doc_id."""
    root, froot, cfg = two_fields
    a = IndexReader(spark, root, cfg).cat.read(spark, "docs")
    b = IndexReader(spark, froot, cfg).cat.read(spark, "docs")
    key = ["doc_id", "repo", "path", "commit"]
    assert a.select(key).exceptAll(b.select(key)).count() == 0
    assert a.count() == b.count()


def test_weight_one_single_field_equals_distributed(spark, two_fields):
    root, froot, cfg = two_fields
    rd = IndexReader(spark, root, cfg)
    got = fields_topk([(rd, 1.0)], "json getPage", k=10).collect()
    want = rd.topk_distributed("json getPage", k=10).collect()
    assert [(r["rank"], r["doc_id"]) for r in got] == [
        (r["rank"], r["doc_id"]) for r in want
    ]
    for g, w in zip(got, want):
        assert abs(g["score"] - w["score"]) < 1e-12


def test_weighted_combination_matches_eager_recompute(spark, two_fields):
    """fields_topk == a driver-side recomputation from each field's
    eagerly fetched postings (weighted per-field BM25 sums)."""
    root, froot, cfg = two_fields
    rd1 = IndexReader(spark, root, cfg)
    rd2 = IndexReader(spark, froot, cfg)
    query, w1, w2 = "json java src", 1.0, 2.5
    tokens = analyze_query(query)

    expected: dict[int, float] = {}
    for rd, w in ((rd1, w1), (rd2, w2)):
        got = rd.fetch_terms(tokens)
        for t in tokens:
            tp = got.get(t)
            if tp is None:
                continue
            contrib = tp.idf * (tp.tfs.astype(np.float64) * (cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + cfg.k1
                * (1.0 - cfg.b + cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
            )
            for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
                expected[d] = expected.get(d, 0.0) + w * c
    want = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]

    rows = fields_topk([(rd1, w1), (rd2, w2)], query, k=10).collect()
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert abs(r["score"] - s) < 1e-9
    # the path field must actually influence the blend: some returned
    # doc matches a path token
    assert any(
        tp is not None and np.isin(r["doc_id"], tp.doc_ids).any()
        for r in rows
        for tp in [rd2.fetch_terms(["java"]).get("java")]
    )


def test_mismatched_corpora_raise(spark, two_fields, tmp_path):
    root, froot, cfg = two_fields
    other = str(tmp_path / "other")
    small = corpus_df(spark, 120, partitions=4)
    build_index(
        spark, small, other,
        IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9),
    )
    rd1 = IndexReader(spark, root, cfg)
    rd3 = IndexReader(spark, other)
    with pytest.raises(ValueError, match="different corpora"):
        fields_topk([(rd1, 1.0), (rd3, 1.0)], "json", k=5)


def test_dismax_limits_and_semantics(spark, two_fields):
    """tie_breaker=1 degenerates to the weighted sum (fields_topk);
    tie_breaker=0 is the per-doc max over field scores (recomputed)."""
    from yase_spark.fields import fields_dismax_topk

    root, froot, cfg = two_fields
    rd1 = IndexReader(spark, root, cfg)
    rd2 = IndexReader(spark, froot, cfg)
    pair = [(rd1, 1.0), (rd2, 2.0)]
    q = "json java"

    t1 = fields_dismax_topk(pair, q, k=10, tie_breaker=1.0).collect()
    ws = fields_topk(pair, q, k=10).collect()
    assert [(r["rank"], r["doc_id"]) for r in t1] == [
        (r["rank"], r["doc_id"]) for r in ws
    ]
    for a, b in zip(t1, ws):
        assert abs(a["score"] - b["score"]) < 1e-12

    t0 = fields_dismax_topk(pair, q, k=10, tie_breaker=0.0).collect()
    tokens = analyze_query(q)
    best: dict[int, float] = {}
    for rd, w in pair:
        got = rd.fetch_terms(tokens)
        per: dict[int, float] = {}
        for t in tokens:
            tp = got.get(t)
            if tp is None:
                continue
            contrib = tp.idf * (tp.tfs.astype(np.float64) * (cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + cfg.k1
                * (1.0 - cfg.b + cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
            )
            for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
                per[d] = per.get(d, 0.0) + w * c
        for d, s in per.items():
            best[d] = max(best.get(d, 0.0), s)
    want = sorted(best.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [r["doc_id"] for r in t0] == [d for d, _ in want]
    for r, (_, s) in zip(t0, want):
        assert abs(r["score"] - s) < 1e-9


def test_cross_fields_blended_df_and_term_dismax(spark, two_fields):
    """fields_cross_topk == a driver-side recompute: per-term idf from
    the BLENDED (max-across-fields) df, per-(doc, term) dis-max of the
    weighted per-field contributions, terms summed. Also gates the two
    semantic properties the mode exists for: the blended idf differs
    from at least one field-local idf on this corpus, and a doc
    matching different terms in different fields outranks its
    best_fields (doc-level max) score."""
    import math

    from yase_spark.fields import fields_cross_topk, fields_dismax_topk

    root, froot, cfg = two_fields
    rd1 = IndexReader(spark, root, cfg)
    rd2 = IndexReader(spark, froot, cfg)
    query, w1, w2 = "json java src", 1.0, 2.5
    tokens = analyze_query(query)

    d1, d2 = rd1.term_dfs(tokens), rd2.term_dfs(tokens)
    blended = {
        t: max(int(d1.get(t, 0)), int(d2.get(t, 0))) for t in tokens
    }
    assert any(
        blended[t] not in (int(d1.get(t, 0)), 0) or
        blended[t] not in (int(d2.get(t, 0)), 0)
        for t in tokens
    )  # blending must actually change some field-local df

    best: dict[tuple, float] = {}
    for rd, w in ((rd1, w1), (rd2, w2)):
        got = rd.fetch_terms(tokens)
        for t in tokens:
            tp = got.get(t)
            if tp is None or blended[t] == 0:
                continue
            idf = math.log(
                1.0 + (rd.n_docs - blended[t] + 0.5) / (blended[t] + 0.5)
            )
            contrib = idf * (tp.tfs.astype(np.float64) * (cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + cfg.k1
                * (1.0 - cfg.b + cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
            )
            for d, c in zip(tp.doc_ids.tolist(), (w * contrib).tolist()):
                key = (d, t)
                if c > best.get(key, float("-inf")):
                    best[key] = c
    expected: dict[int, float] = {}
    for (d, _t), c in best.items():
        expected[d] = expected.get(d, 0.0) + c
    want = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]

    rows = fields_cross_topk([(rd1, w1), (rd2, w2)], query, k=10).collect()
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]
    for r, (_, s) in zip(rows, want):
        assert abs(r["score"] - s) < 1e-9

    # structural: per-term additive across fields — a doc whose terms
    # split across fields must score >= its pure dis-max (doc-level
    # best-field) ranking score under the same weights
    dm = {
        r["doc_id"]: r["score"]
        for r in fields_dismax_topk(
            [(rd1, w1), (rd2, w2)], query, k=10**6, tie_breaker=0.0
        ).collect()
    }
    # compare on common docs, modulo the df-blend delta: recompute the
    # dis-max under BLENDED stats driver-side for an exact invariant
    dm_blended: dict[int, float] = {}
    for rd, w in ((rd1, w1), (rd2, w2)):
        got = rd.fetch_terms(tokens)
        per_doc: dict[int, float] = {}
        for t in tokens:
            tp = got.get(t)
            if tp is None or blended[t] == 0:
                continue
            idf = math.log(
                1.0 + (rd.n_docs - blended[t] + 0.5) / (blended[t] + 0.5)
            )
            contrib = idf * (tp.tfs.astype(np.float64) * (cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + cfg.k1
                * (1.0 - cfg.b + cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
            )
            for d, c in zip(tp.doc_ids.tolist(), (w * contrib).tolist()):
                per_doc[d] = per_doc.get(d, 0.0) + c
        for d, s in per_doc.items():
            if s > dm_blended.get(d, float("-inf")):
                dm_blended[d] = s
    assert dm  # dis-max lane produced rows (sanity)
    for d, s in expected.items():
        assert s >= dm_blended.get(d, 0.0) - 1e-12
    assert any(
        expected[d] > dm_blended.get(d, 0.0) + 1e-9 for d in expected
    )  # ...and strictly better somewhere (terms split across fields)
