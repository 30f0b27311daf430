"""ColBERT-style MaxSim late-interaction retrieval gates
(yase_spark/similarity.py maxsim_topk).

The driver-contract row ``maxsim_topk`` checks the operator against a
DuckDB replay of the same integer-micro-unit scoring; these tests gate
what that can't see: parity against an independent from-scratch numpy
MaxSim (float math, no shared code path), the exactness property the
integer lift buys (score invariant under repartitioning — the
float-sum summation-order hazard ROUND_NOTES documents cannot occur),
the self-exclusion / block-grouping contract, and the plan shape (the
doc-token side is read map-side against a broadcast query bag — no
vector shuffle).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.similarity import maxsim_topk

SF_EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(SF_EMB)


def _numpy_maxsim(pdf, v, n_queries, k):
    """Independent float-math MaxSim: returns {query_id: [(doc_id,
    score_u6), ...]} ranked by (score_u6 desc, doc_id)."""
    vecs = np.array(pdf.sort_values("vec_id")["embedding"].tolist(), dtype=np.float64)
    ids = pdf.sort_values("vec_id")["vec_id"].to_numpy()
    doc_of = ids // v
    docs = np.unique(doc_of)
    norms = np.linalg.norm(vecs, axis=1)
    out = {}
    for q in range(n_queries):
        qvecs = vecs[doc_of == q]
        qnorms = norms[doc_of == q]
        scores = []
        for d in docs:
            if d == q:
                continue
            dv = vecs[doc_of == d]
            dn = norms[doc_of == d]
            sims = (qvecs @ dv.T) / np.outer(qnorms, dn)
            per_tok = np.round(sims.max(axis=1), 6)
            u6 = int(np.rint(per_tok * 1e6).astype(np.int64).sum())
            scores.append((d, u6))
        scores.sort(key=lambda x: (-x[1], x[0]))
        out[q] = scores[:k]
    return out


def test_matches_numpy_brute_force(spark, emb):
    got = maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10).collect()
    want = _numpy_maxsim(emb.toPandas(), 5, 4, 10)
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(want)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        assert [(r.doc_id, r.score_u6) for r in rows] == want[q]


def test_partitioning_invariance(spark, emb):
    """The BIGINT micro-unit ranking key is exact: any repartitioning
    (different partial-agg grouping / summation order) yields the
    IDENTICAL result set, not merely a close one."""
    base = maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10).collect()
    shuffled = maxsim_topk(
        emb.repartition(13, "vec_id"), vecs_per_doc=5, n_queries=4, k=10
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, shuffled))


def test_self_doc_excluded_and_k_cap(spark, emb):
    rows = maxsim_topk(emb, vecs_per_doc=5, n_queries=3, k=7).collect()
    assert all(r.doc_id != r.query_id for r in rows)
    from collections import Counter

    per_q = Counter(r.query_id for r in rows)
    assert set(per_q) == {0, 1, 2}
    assert all(c == 7 for c in per_q.values())


def test_single_vector_docs_reduce_to_cosine_ranking(spark, emb):
    """v=1 collapses MaxSim to plain cosine top-k: same ranking as the
    dense lane on the same fixture (scores in micro-units)."""
    from yase_spark.similarity import cosine_topk

    ms = maxsim_topk(emb, vecs_per_doc=1, n_queries=4, k=10).collect()
    cs = cosine_topk(emb, n_queries=4, k=10).collect()
    ms_rank = {(r.query_id, r.rank): (r.doc_id, r.score_u6) for r in ms}
    for r in cs:
        if r.query_id >= 4:
            continue
        doc, u6 = ms_rank[(r.query_id, r.rank)]
        assert doc == r.vec_id
        assert u6 == int(round(r.sim_r * 1e6))


def test_plan_no_vector_shuffle(spark, emb):
    """The query bag broadcasts; the only exchanges carry scalar
    (query, token, doc, max) aggregation rows — the doc-token vector
    column must not appear under any Exchange's input schema."""
    df = maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the big side reaches the broadcast join without an Exchange:
    # every shuffle in the plan sits ABOVE the per-token max agg (its
    # partial already dropped embeddings), so no shuffled operator
    # carries an embedding column
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "embedding" not in m.group(1)


def test_validation():
    for bad in [dict(vecs_per_doc=0), dict(n_queries=0), dict(k=0)]:
        with pytest.raises(ValueError):
            maxsim_topk(None, **bad)


# ------------------------------------------------ IVF-pruned MaxSim


def test_maxsim_ivf_saturated_is_exact(spark, emb):
    """nprobe = n_centroids probes every list, so the candidate set is
    every document and the result equals brute-force MaxSim row for
    row — the identity the driver oracle leans on."""
    from yase_spark.similarity import maxsim_ivf_topk

    exact = sorted(
        map(tuple, maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10).collect())
    )
    sat = sorted(
        map(
            tuple,
            maxsim_ivf_topk(
                emb, vecs_per_doc=5, n_queries=4, k=10, n_centroids=8
            ).collect(),
        )
    )
    assert sat == exact


def test_maxsim_ivf_pruned_recall_and_pruning(spark, emb):
    """Pruned probing must (a) actually shrink the candidate set and
    (b) keep recall@10 high — MaxSim needs only ONE token collision in
    a probed list to keep a candidate, so the pruned recall floor is
    gated at 0.8 like the other pruned ANN lanes."""
    from yase_spark.similarity import maxsim_ivf_topk

    exact = maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10).collect()
    pruned = maxsim_ivf_topk(
        emb, vecs_per_doc=5, n_queries=4, k=10, n_centroids=16, nprobe=2
    ).collect()
    want = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.doc_id)
    got = {}
    for r in pruned:
        got.setdefault(r.query_id, set()).add(r.doc_id)
    hits = sum(len(want[q] & got.get(q, set())) for q in want)
    total = sum(len(v) for v in want.values())
    assert hits / total >= 0.8
    # pruning telemetry: reconstruct the candidate sets from the same
    # public pieces and require that nprobe=2 of 16 actually skipped
    # documents for at least one query (the scan-cost win is the point)
    from yase_spark.similarity import ivf_assign, train_ivf_centroids

    C = train_ivf_centroids(emb, n_centroids=16, iters=5)
    assigned = ivf_assign(emb, C).toPandas()
    assigned["doc_id"] = assigned["vec_id"] // 5
    doc_lists = assigned.groupby("doc_id")["cid"].agg(set).to_dict()
    qp = emb.filter(F.col("vec_id") < 20).toPandas()
    vecs = np.stack(qp.sort_values("vec_id")["embedding"].to_numpy()).astype(
        np.float64
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    n_docs = len(doc_lists)
    for q in range(4):
        srows = vecs[q * 5 : (q + 1) * 5] @ C.T
        probed = {
            int(c)
            for srow in srows
            for c in np.argsort(-srow, kind="stable")[:2]
        }
        n_cand = sum(
            1
            for d, lists in doc_lists.items()
            if d != q and lists & probed
        )
        if n_cand < n_docs - 1:
            break
    else:
        pytest.fail("nprobe=2 of 16 never pruned a single candidate")
