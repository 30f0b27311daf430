"""TF-IDF export gates (yase_spark/features.py). The driver row
``tfidf_vectors`` value-checks against a from-text recount at sf0.01;
these gate the plan shape and the tombstone semantics."""

import numpy as np
import pytest

from yase_spark.features import tfidf_vectors
from yase_spark.query import IndexReader


@pytest.fixture(scope="module")
def rd(spark, tiny_index):
    root, cfg, _ = tiny_index
    return IndexReader(spark, root, cfg)


def test_tfidf_matches_corpus_recount(spark, tiny_corpus, rd):
    """Index-derived vectors == tokenizer recount over the corpus."""
    from collections import Counter

    from yase_spark.tokenize import tokenize_text

    got = {
        (r["doc_id"], r["term"]): r["tfidf_r"]
        for r in tfidf_vectors(rd).collect()
    }
    docs = rd.cat.read(spark, "docs")
    key_of = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in docs.collect()
    }
    tf: Counter = Counter()
    dfs: Counter = Counter()
    for r in tiny_corpus.collect():
        d = key_of[(r["repo"], r["path"], r["commit"])]
        c = Counter(tokenize_text(r["content"]))
        for t, n in c.items():
            tf[(d, t)] = n
            dfs[t] += 1
    n_docs = len(key_of)
    assert len(got) == len(tf)
    for (d, t), n in tf.items():
        want = round(n * np.log(n_docs / dfs[t]), 6)
        assert got[(d, t)] == pytest.approx(want, abs=1.5e-6)


def test_tfidf_broadcasts_dictionary(rd):
    plan = tfidf_vectors(rd)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_tfidf_masks_tombstones(spark, tiny_index):
    """A tombstoned doc's rows disappear; stats stay encode-time (the
    documented Lucene-liveDocs convention) so other rows are unchanged."""
    root, cfg, _ = tiny_index
    base = IndexReader(spark, root, cfg)
    all_rows = {(r["doc_id"], r["term"]): r["tfidf_r"]
                for r in tfidf_vectors(base).collect()}
    victim = max(d for d, _ in all_rows)
    masked = IndexReader(spark, root, cfg)
    masked._deleted = np.array([victim], dtype=np.int64)
    got = {(r["doc_id"], r["term"]): r["tfidf_r"]
           for r in tfidf_vectors(masked).collect()}
    assert all(d != victim for d, _ in got)
    assert got == {k: v for k, v in all_rows.items() if k[0] != victim}
