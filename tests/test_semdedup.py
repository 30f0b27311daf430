"""SemDeDup (similarity.semantic_dedup): saturated single-cluster run
equals exact all-pairs semantic dedup (naive union-find oracle);
clustered runs equal the naive components over WITHIN-cluster pairs
under the engine's own deterministic k-means assignment; keep-rule
invariants hold (one keeper per group, keeper = min id).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.similarity import semantic_dedup, train_ivf_centroids

DIM, THR = 8, 0.9


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    base = rng.randn(20, DIM)
    rows = []
    vid = 0
    for i in range(20):
        rows.append((vid, base[i])); vid += 1
        # two near-clones for every 4th base vector -> planted groups
        if i % 4 == 0:
            for _ in range(2):
                rows.append((vid, base[i] + 0.01 * rng.randn(DIM))); vid += 1
    df = spark.createDataFrame(
        [(int(v), [float(x) for x in e]) for v, e in rows],
        schema="vec_id long, embedding array<float>",
    )
    # float32 storage: recompute the naive oracle from the STORED values
    stored = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
              for r in df.collect()}
    return df, stored


def _sim(a, b):
    return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)


def _components(ids, pairs):
    lbl = {i: i for i in ids}

    def find(x):
        while lbl[x] != x:
            lbl[x] = lbl[lbl[x]]
            x = lbl[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lbl[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def _naive(stored, cid_of=None):
    ids = sorted(stored)
    pairs = [
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if (cid_of is None or cid_of[a] == cid_of[b])
        and _sim(stored[a], stored[b]) >= THR
    ]
    comp = _components(ids, pairs)
    return [(i, comp[i], i == comp[i]) for i in ids]


def test_saturated_equals_exact_all_pairs(spark, emb):
    df, stored = emb
    got = [tuple(r) for r in semantic_dedup(df, THR, n_clusters=1).collect()]
    assert got == _naive(stored)
    # the planted clones actually deduplicate
    assert sum(1 for _, _, k in got if not k) >= 10


def test_clustered_equals_within_cluster_components(spark, emb):
    df, stored = emb
    C = train_ivf_centroids(df, n_centroids=4, iters=5)
    X = np.stack([stored[i] for i in sorted(stored)])
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    cid_of = dict(zip(sorted(stored), np.argmax(Xn @ C.T, axis=1)))
    got = [tuple(r) for r in semantic_dedup(df, THR, n_clusters=4).collect()]
    assert got == _naive(stored, cid_of)


def test_keep_invariants_and_validation(spark, emb):
    df, _ = emb
    rows = semantic_dedup(df, THR, n_clusters=2).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m["keep"] for m in members) == 1
        assert min(m["vec_id"] for m in members) == cid
        assert next(m for m in members if m["keep"])["vec_id"] == cid
    with pytest.raises(ValueError):
        semantic_dedup(df, THR, n_clusters=0)
