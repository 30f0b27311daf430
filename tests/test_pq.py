"""Product-quantized ANN (yase_spark/pq.py) gates.

The driver-contract row ``ann_pq_topk`` validates the saturated-codebook
configuration against the brute-force SQL oracle; these tests gate the
parts the oracle can't see: the compressed regime's recall, the exact
re-rank contract, codebook determinism, and the code payload shape.
"""

import numpy as np
import pytest

from yase_spark.pq import (
    ivf_pq_topk,
    pq_ann_topk,
    pq_encode,
    train_pq_codebooks,
)
from yase_spark.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def test_saturated_pq_equals_exact(spark, emb):
    """ks >= n makes reconstruction lossless, so ADC ranking (refine=0)
    must equal the exact brute-force top-k — same ids, same rank order,
    sims equal to 6 dp. This is the identity the driver oracle leans on."""
    n = emb.count()
    exact = cosine_topk(emb, n_queries=4, k=10).collect()
    got = pq_ann_topk(
        emb, n_queries=4, k=10, m=8, ks=n, iters=1, refine=0
    ).collect()
    key = lambda r: (r["query_id"], r["rank"])
    exact = sorted(exact, key=key)
    got = sorted(got, key=key)
    assert [(r["query_id"], r["rank"], r["vec_id"]) for r in exact] == [
        (r["query_id"], r["rank"], r["vec_id"]) for r in got
    ]
    for e, g in zip(exact, got):
        assert abs(e["sim_r"] - g["sim_r"]) <= 2e-6


def test_compressed_pq_recall_with_refine(spark, emb):
    """The production shape: a genuinely lossy codebook (m=16 x ks=32 ⇒
    16 bytes/vector vs 256 uncompressed, 16x scan compression) + exact
    re-rank of a 4x candidate slice must keep recall@10 high, and the
    reported sims must be EXACT cosines (bitwise-comparable to the
    brute-force path for the ids both kept)."""
    exact = cosine_topk(emb, n_queries=8, k=10)
    got = pq_ann_topk(emb, n_queries=8, k=10, m=16, ks=32, iters=5, refine=30)
    want, have = _topk_sets(exact), _topk_sets(got)
    recalls = [len(want[q] & have.get(q, set())) / len(want[q]) for q in want]
    recall = sum(recalls) / len(recalls)
    assert recall >= 0.85, f"recall@10 = {recall:.3f} (per-query {recalls})"
    exact_sims = {(r["query_id"], r["vec_id"]): r["sim_r"] for r in exact.collect()}
    for r in got.collect():
        k = (r["query_id"], r["vec_id"])
        if k in exact_sims:
            assert r["sim_r"] == exact_sims[k]


def test_adc_only_recall(spark, emb):
    """Without the re-rank the raw ADC ordering still finds most of the
    true neighbours — the floor a scan-only (no-refine) deployment gets."""
    want = _topk_sets(cosine_topk(emb, n_queries=8, k=10))
    have = _topk_sets(
        pq_ann_topk(emb, n_queries=8, k=10, m=16, ks=32, iters=5, refine=0)
    )
    recalls = [len(want[q] & have.get(q, set())) / len(want[q]) for q in want]
    assert sum(recalls) / len(recalls) >= 0.5


def test_saturated_ivfpq_equals_exact(spark, emb):
    """Full probe (IVF == brute force) + saturated residual codebook
    (lossless reconstruction) + exact re-rank must reproduce the
    brute-force top-k exactly — ids, ranks, and sims. This composes
    coarse train / residual encode / ADC-with-offset / rank in the
    configuration the driver oracle runs."""
    n = emb.count()
    key = lambda r: (r["query_id"], r["rank"])
    exact = sorted(cosine_topk(emb, n_queries=4, k=10).collect(), key=key)
    got = sorted(
        ivf_pq_topk(
            emb, n_queries=4, k=10, n_centroids=8, m=8, ks=n,
            coarse_iters=2, iters=1, refine=5,
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in exact] == [tuple(r) for r in got]


def test_ivfpq_pruned_recall(spark, emb):
    """The production regime: probe 4 of 16 lists (4x scan pruning on
    top of the 16x PQ compression) with exact re-rank — recall@10 must
    stay high. Probing more lists must not hurt (monotone in nprobe)."""
    want = _topk_sets(cosine_topk(emb, n_queries=8, k=10))

    def rec(nprobe):
        have = _topk_sets(
            ivf_pq_topk(
                emb, n_queries=8, k=10, n_centroids=16, nprobe=nprobe,
                m=16, ks=32, coarse_iters=3, iters=5, refine=30,
            )
        )
        rs = [len(want[q] & have.get(q, set())) / len(want[q]) for q in want]
        return sum(rs) / len(rs)

    r4, r8 = rec(4), rec(8)
    assert r4 >= 0.7, f"recall@10 nprobe=4: {r4:.3f}"
    assert r8 >= 0.85, f"recall@10 nprobe=8: {r8:.3f}"
    assert r8 >= r4 - 0.05  # probing more lists can't meaningfully hurt


def test_codebooks_deterministic(spark, emb):
    """No-RNG init + sorted partial reduction ⇒ bitwise-identical
    codebooks across runs (the resume/replay invariant every other
    stage of the engine holds)."""
    a = train_pq_codebooks(emb, m=4, ks=8, iters=3)
    b = train_pq_codebooks(emb, m=4, ks=8, iters=3)
    assert a.shape == (4, 8, 16)
    assert np.array_equal(a, b)


def test_codes_shape_and_range(spark, emb):
    """The compressed payload: one code per subspace, every code a
    valid centroid index. (m int32s here; a production sink packs m
    uint8s — the 4x gap is a storage detail, not a scan-cost one.)"""
    C = train_pq_codebooks(emb, m=8, ks=16, iters=2)
    rows = pq_encode(emb, C).collect()
    assert len(rows) == emb.count()
    for r in rows[:50]:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_ivfpq_materialized_roundtrip(spark, emb, tmp_path):
    """write -> read full-probe saturated == brute force (the same
    structural identity as the in-memory path), and the pruned read's
    cid filter reaches the codes scan as a PARTITION filter."""
    from yase_spark.pq import ivfpq_read_topk, ivfpq_write

    root = str(tmp_path / "ivfpq")
    n = emb.count()
    ivfpq_write(emb, root, n_centroids=8, m=8, ks=n, coarse_iters=2, iters=1)
    key = lambda r: (r["query_id"], r["rank"])
    exact = sorted(cosine_topk(emb, n_queries=4, k=10).collect(), key=key)
    got = sorted(
        ivfpq_read_topk(spark, emb, root, n_queries=4, k=10, refine=5).collect(),
        key=key,
    )
    assert [tuple(r) for r in exact] == [tuple(r) for r in got]

    pruned = ivfpq_read_topk(
        spark, emb, root, n_queries=4, k=10, nprobe=2, refine=5
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    # pruned probe still finds most true neighbours
    want = {}
    for r in exact:
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    have = {}
    for r in pruned.collect():
        have.setdefault(r["query_id"], set()).add(r["vec_id"])
    rec = sum(len(want[q] & have.get(q, set())) / 10 for q in want) / len(want)
    assert rec >= 0.5


def test_bounded_collect_guard(spark):
    """The 100-TB driver-collect contract (round 4): every codebook/
    centroid/query-vector collect goes through bounded_collect, whose
    plan-level limit caps what reaches the driver and whose bound
    check raises instead of silently materializing a corpus-sized
    result."""
    import pytest

    from yase_spark.similarity import bounded_collect

    ok = bounded_collect(spark.range(10), 10, "fits")
    assert len(ok) == 10
    with pytest.raises(RuntimeError, match="exceeded its 10-row bound"):
        bounded_collect(spark.range(1000), 10, "overflow")
