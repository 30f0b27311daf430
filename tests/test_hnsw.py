"""HNSW centroid graph (yase_spark/hnsw.py) gates.

The driver-contract row ``ann_hnsw_topk`` validates the saturated
configuration (ef = nprobe = K) against the brute-force SQL oracle;
these tests gate what the oracle can't see: the saturated-search ==
brute-force identity on the GRAPH itself (including under adversarial
pruning, where the prune-exempt level-0 chain is what keeps the base
layer connected), pruned-search recall, the visited-count pruning
telemetry (the whole point of the graph is visiting << K nodes), and
build determinism.
"""

import numpy as np
import pytest

from yase_spark.hnsw import HNSW, hnsw_ann_topk
from yase_spark.similarity import cosine_topk


def _unit_rows(rng, n, d):
    X = rng.standard_normal((n, d))
    return X / np.linalg.norm(X, axis=1, keepdims=True)


def _brute(vecs, q, k):
    sims = vecs @ q
    order = np.lexsort((np.arange(len(sims)), -sims))
    return order[:k]


def test_saturated_search_is_brute_force():
    """ef >= K never prunes and the chain keeps level 0 connected, so
    the beam visits every node and the ranking equals argsort — the
    identity the driver oracle leans on, checked for EVERY k and
    several K/M shapes."""
    rng = np.random.default_rng(7)
    for K, M in [(1, 2), (2, 2), (17, 2), (64, 4), (200, 8)]:
        vecs = _unit_rows(rng, K, 16)
        g = HNSW(vecs, M=M, seed=3)
        for qi in range(4):
            q = _unit_rows(rng, 1, 16)[0]
            want = _brute(vecs, q, K)
            got = g.search(q, K, ef=K)
            assert g.visited_last == K, (K, M, g.visited_last)
            # full ranking identical up to similarity ties (lexsort and
            # the heap tie-break can differ on exact-equal sims; random
            # reals make ties measure-zero, so demand exact equality)
            assert np.array_equal(got, want), (K, M, qi)


def test_chain_survives_adversarial_pruning():
    """Clustered data with tiny M drives the degree trim hard — learned
    edges concentrate inside clusters and inter-cluster links get
    pruned. The prune-exempt chain must still make a saturated search
    exact (this is the regression the implicit i<->i-1 edges pin)."""
    rng = np.random.default_rng(11)
    centers = _unit_rows(rng, 4, 16)
    pts = np.repeat(centers, 50, axis=0) + 0.01 * rng.standard_normal(
        (200, 16)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    g = HNSW(pts, M=2, ef_construction=4, seed=5)
    q = _unit_rows(rng, 1, 16)[0]
    got = g.search(q, 200, ef=200)
    assert g.visited_last == 200
    assert np.array_equal(got, _brute(pts, q, 200))


def test_pruned_search_visits_less_and_recalls():
    """The serving regime: ef << K must visit a strict subset of the
    graph (the telemetry that proves the O(ef·M·log K) claim) while
    keeping recall@10 high on random data."""
    rng = np.random.default_rng(23)
    K = 2000
    vecs = _unit_rows(rng, K, 32)
    g = HNSW(vecs, M=8, ef_construction=64, seed=9)
    hits = total = 0
    worst_visited = 0
    for qi in range(8):
        q = _unit_rows(rng, 1, 32)[0]
        got = g.search(q, 10, ef=64)
        worst_visited = max(worst_visited, g.visited_last)
        want = set(_brute(vecs, q, 10).tolist())
        hits += len(want & set(got.tolist()))
        total += 10
    assert worst_visited < K / 2, worst_visited
    assert hits / total >= 0.9, hits / total


def test_build_deterministic():
    """Same matrix, same params -> identical graph (levels, edges,
    entry) and identical search results — the repo-wide build
    reproducibility contract."""
    rng = np.random.default_rng(31)
    vecs = _unit_rows(rng, 120, 8)
    a, b = HNSW(vecs, M=4, seed=13), HNSW(vecs, M=4, seed=13)
    assert np.array_equal(a.levels, b.levels)
    assert a.entry == b.entry
    assert a.edges == b.edges
    q = _unit_rows(rng, 1, 8)[0]
    assert np.array_equal(a.search(q, 10), b.search(q, 10))


def test_empty_and_single():
    assert HNSW(np.zeros((0, 4))).search(np.ones(4), 5).size == 0
    one = HNSW(_unit_rows(np.random.default_rng(1), 1, 4))
    assert one.search(np.ones(4), 5).tolist() == [0]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_saturated_hnsw_topk_equals_exact(spark, emb):
    """The driver-contract configuration: HNSW-selected probes at
    ef = nprobe = K probe every list, so the Spark output must equal
    the exact brute-force top-k (ids, rank order, 6-dp sims)."""
    exact = cosine_topk(emb, n_queries=4, k=10).collect()
    got = hnsw_ann_topk(emb, n_queries=4, k=10, n_centroids=16).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert [
        (r["query_id"], r["rank"], r["vec_id"], r["sim_r"])
        for r in sorted(exact, key=key)
    ] == [
        (r["query_id"], r["rank"], r["vec_id"], r["sim_r"])
        for r in sorted(got, key=key)
    ]


def test_pruned_probes_saturated_walk_equals_ivf(spark, emb):
    """nprobe=4 of 16 with a SATURATED graph walk (ef=16): the walk's
    centroid ranking equals brute-force centroid argsort, so the probe
    sets — and therefore the full output — must equal ivf_ann_topk at
    the same nprobe, row for row. This pins graph probe selection
    against the already-gated IVF lane without inheriting its recall
    looseness."""
    from yase_spark.similarity import ivf_ann_topk

    key = lambda r: (r["query_id"], r["rank"])
    ivf = sorted(
        ivf_ann_topk(emb, n_queries=8, k=10, n_centroids=16, nprobe=4)
        .collect(), key=key,
    )
    got = sorted(
        hnsw_ann_topk(
            emb, n_queries=8, k=10, n_centroids=16, nprobe=4, ef=16
        ).collect(), key=key,
    )
    assert [(r["query_id"], r["rank"], r["vec_id"], r["sim_r"]) for r in ivf] \
        == [(r["query_id"], r["rank"], r["vec_id"], r["sim_r"]) for r in got]


def test_pruned_hnsw_topk_recall(spark, emb):
    """Fully pruned serving shape (nprobe=4 of 16 via an ef=8 walk):
    recall@10 against exact — same 0.5 bar as the IVF pruned gate
    (random fixture vectors are the hard case for list locality); in
    practice this sits near 0.8."""
    exact = cosine_topk(emb, n_queries=8, k=10)
    got = hnsw_ann_topk(
        emb, n_queries=8, k=10, n_centroids=16, nprobe=4, ef=8
    )
    want, have = _topk_sets(exact), _topk_sets(got)
    hits = sum(len(want[q] & have.get(q, set())) for q in want)
    assert hits / sum(len(v) for v in want.values()) >= 0.5
