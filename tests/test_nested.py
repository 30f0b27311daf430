"""Parent/child (has_child / has_parent) gates — yase_spark.nested.

The recount is a from-scratch Python replay: tokenize, window into
chunks with the same integer math as curation.chunk_docs, score each
chunk with child-corpus BM25, aggregate per parent under every
score_mode. Independent of Spark except for the inputs.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from yase_spark.curation import chunk_docs
from yase_spark.nested import (
    has_child_inner_hits,
    has_child_topk,
    has_parent_children,
)

CHUNK, STRIDE = 4, 3
K1, B = 1.2, 0.75

DOCS = [
    (1, "en", "alpha beta gamma alpha beta delta alpha zeta"),
    (2, "de", "beta beta beta gamma epsilon alpha"),
    (3, "en", "zeta eta theta iota kappa"),
    (4, "de", "alpha gamma"),
    (5, "fr", ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "lang", "text"])


@pytest.fixture(scope="module")
def kids(docs):
    return chunk_docs(docs, chunk=CHUNK, stride=STRIDE).persist()


def _py_chunks():
    out = []
    for doc_id, _lang, text in DOCS:
        w = re.findall(r"[a-z0-9_]+", text.lower())
        if not w:
            continue
        n_win = 1 + -(-max(len(w) - CHUNK, 0) // STRIDE)
        for c in range(n_win):
            toks = w[c * STRIDE : c * STRIDE + CHUNK]
            out.append((doc_id, c, toks))
    return out


def _py_child_scores(terms):
    chunks = _py_chunks()
    dfs = {
        t: sum(1 for _, _, toks in chunks if t in toks) for t in terms
    }
    n = len(chunks)
    avgdl = sum(len(toks) for _, _, toks in chunks) / n
    scores = {}
    for doc_id, cid, toks in chunks:
        s = 0  # exact BIGINT micro-units, like the engine
        hit = False
        for t in terms:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit = True
            idf = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            c = idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * (len(toks) / avgdl))
            )
            s += int(math.floor(c * 1e6 + 0.5))  # HALF_UP like F.round
        if hit:
            scores[(doc_id, cid)] = s
    return scores


def _py_has_child(terms, k, mode, min_children=1):
    cs = _py_child_scores(terms)
    per = {}
    for (doc_id, _), s in cs.items():
        per.setdefault(doc_id, []).append(s)
    agg = {
        "max": max,
        "sum": sum,
        "min": min,
        "avg": lambda v: sum(v) / len(v),
        "none": lambda v: 1_000_000.0,
    }[mode]
    rows = [
        (d, len(v), agg(v))
        for d, v in per.items()
        if len(v) >= min_children
    ]
    rows.sort(key=lambda r: (-r[2], r[0]))
    return [
        (i + 1, d, nm, round(u6 / 1e6, 6))
        for i, (d, nm, u6) in enumerate(rows[:k])
    ]


TERMS = ["alpha", "epsilon"]


@pytest.mark.parametrize("mode", ["max", "sum", "avg", "min", "none"])
def test_has_child_all_score_modes(kids, mode):
    got = [
        (r["rank"], r["doc_id"], r["n_matched"], r["score_r"])
        for r in has_child_topk(kids, TERMS, k=10, score_mode=mode).collect()
    ]
    assert got == _py_has_child(TERMS, 10, mode)


def test_has_child_min_children(kids):
    got = [
        (r["rank"], r["doc_id"], r["n_matched"], r["score_r"])
        for r in has_child_topk(
            kids, TERMS, k=10, score_mode="sum", min_children=2
        ).collect()
    ]
    want = _py_has_child(TERMS, 10, "sum", min_children=2)
    assert got == want
    assert all(nm >= 2 for _, _, nm, _ in got)


def test_has_child_rejects_bad_args(kids):
    with pytest.raises(ValueError):
        has_child_topk(kids, TERMS, score_mode="blended")
    with pytest.raises(ValueError):
        has_child_topk(kids, [], k=10)


def _py_inner_hits(terms, k, m):
    cs = _py_child_scores(terms)
    per = {}
    for (doc_id, cid), s in cs.items():
        per.setdefault(doc_id, []).append((cid, s))
    parents = sorted(
        ((d, max(s for _, s in v)) for d, v in per.items()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    out = []
    for rank, (d, u6) in enumerate(parents, start=1):
        kids_sorted = sorted(per[d], key=lambda cs_: (-cs_[1], cs_[0]))[:m]
        for crank, (cid, s) in enumerate(kids_sorted, start=1):
            out.append(
                (rank, d, round(u6 / 1e6, 6), crank, cid, round(s / 1e6, 6))
            )
    return sorted(out)


def test_inner_hits_match_python_replay(kids):
    got = sorted(
        (r["rank"], r["doc_id"], r["score_r"], r["crank"], r["chunk_id"],
         r["cscore_r"])
        for r in has_child_inner_hits(
            kids, TERMS, k=10, m=2, score_mode="max"
        ).collect()
    )
    assert got == _py_inner_hits(TERMS, 10, 2)
    # max-mode consistency: every parent's score equals its crank-1
    # child's score
    best = {(r[0], r[1]): r[2] for r in got}
    for rank, d, score, crank, _cid, cs in got:
        if crank == 1:
            assert best[(rank, d)] == cs


def test_inner_hits_rejects_bad_m(kids):
    with pytest.raises(ValueError):
        has_child_inner_hits(kids, TERMS, m=0)


def test_has_parent_children(docs, kids):
    got = sorted(
        (r["doc_id"], r["chunk_id"], r["lang"], r["n_tokens"])
        for r in has_parent_children(docs, kids, "lang = 'de'").collect()
    )
    want = sorted(
        (d, c, lang, len(toks))
        for d, c, toks in _py_chunks()
        for did, lang, _ in DOCS
        if did == d and lang == "de"
    )
    assert got == want


def test_has_parent_broadcasts_parent_dim(docs, kids):
    plan = has_parent_children(docs, kids, "lang = 'de'")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
