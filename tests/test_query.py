"""WAND executor correctness, Spark-free (SURVEY.md §5.4): randomized
posting lists, WAND top-k must equal the naive full scan exactly —
including tie-breaks and block boundaries."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yase_spark.codec import encode_postings
from yase_spark.query import TermPostings, bool_and, bool_or, naive_topk, wand_topk

K1, B = 1.2, 0.75


def _mk_term(rng, n_docs_universe: int, df: int, block_size: int, n_total: int, avgdl: float):
    ids = np.sort(rng.choice(np.arange(1, n_docs_universe + 1), size=df, replace=False))
    tfs = rng.integers(1, 12, size=df).astype(np.int64)
    dls = (50 + (ids * 37) % 400).astype(np.int64)  # deterministic per doc
    idf = math.log(1.0 + (n_total - df + 0.5) / (df + 0.5))
    payload, meta = encode_postings(
        ids, tfs, dls, block_size=block_size, idf=idf, k1=K1, b=B, avgdl=avgdl
    )
    return TermPostings(
        term=f"t{df}",
        df=df,
        idf=idf,
        doc_ids=ids,
        tfs=tfs,
        dls=dls,
        block_last=np.array([m["block_last"] for m in meta], dtype=np.int64),
        block_max=np.array([m["max_score"] for m in meta], dtype=np.float64),
        block_size=block_size,
    )


@given(
    seed=st.integers(0, 10_000),
    nt=st.integers(1, 5),
    k=st.sampled_from([1, 3, 10, 50]),
    block=st.sampled_from([4, 16, 128]),
)
@settings(max_examples=120, deadline=None)
def test_wand_equals_naive_random(seed, nt, k, block):
    rng = np.random.default_rng(seed)
    universe = int(rng.integers(50, 2000))
    avgdl = 250.0
    terms = [
        _mk_term(
            rng, universe, int(rng.integers(1, max(2, universe // 2))), block,
            universe, avgdl,
        )
        for _ in range(nt)
    ]
    a = wand_topk(terms, k, K1, B, avgdl)
    b = naive_topk(terms, k, K1, B, avgdl)
    assert a == b


def test_wand_tie_break_smaller_doc_wins():
    """Docs with byte-identical scores must rank by doc_id ASC, and WAND
    must not prune a tied doc (the >= threshold rule)."""
    rng = np.random.default_rng(7)
    # identical tf and dl for all docs -> every doc has the same score
    ids = np.arange(1, 301, dtype=np.int64)
    tfs = np.full(300, 3, dtype=np.int64)
    dls = np.full(300, 100, dtype=np.int64)
    idf = math.log(1.0 + (300 - 300 + 0.5) / (300 + 0.5))
    payload, meta = encode_postings(ids, tfs, dls, block_size=16, idf=idf, avgdl=100.0)
    t = TermPostings(
        term="x", df=300, idf=idf, doc_ids=ids, tfs=tfs, dls=dls,
        block_last=np.array([m["block_last"] for m in meta]),
        block_max=np.array([m["max_score"] for m in meta]),
        block_size=16,
    )
    got = wand_topk([t], 10, K1, B, 100.0)
    assert [d for _, d, _ in got] == list(range(1, 11))
    assert got == naive_topk([t], 10, K1, B, 100.0)


def test_bool_ops():
    def mk(ids):
        a = np.array(ids, dtype=np.int64)
        return TermPostings(
            term="t", df=a.size, idf=1.0, doc_ids=a,
            tfs=np.ones(a.size, dtype=np.int64),
            dls=np.ones(a.size, dtype=np.int64),
            block_last=a[-1:], block_max=np.ones(1), block_size=128,
        )

    x, y = mk([1, 3, 5, 9]), mk([3, 4, 5, 10])
    assert list(bool_and([x, y])) == [3, 5]
    assert list(bool_or([x, y])) == [1, 3, 4, 5, 9, 10]
    assert list(bool_and([x])) == [1, 3, 5, 9]
    assert bool_and([]).size == 0
    assert bool_or([]).size == 0


def test_empty_and_k0():
    assert wand_topk([], 10, K1, B, 100.0) == []
    rng = np.random.default_rng(1)
    t = _mk_term(rng, 100, 10, 8, 100, 50.0)
    assert wand_topk([t], 0, K1, B, 50.0) == []


def test_dense_topk_bitwise_equals_naive(spark, tiny_index):
    """The dense-accumulator scorer must be bitwise-identical to the
    positional naive scorer (same contribution expression, same per-doc
    term-order summation) on every reference query."""
    from yase_spark.query import IndexReader, dense_topk, naive_topk
    from yase_spark.synth import reference_query_set

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    for q in [x for x in reference_query_set() if x["kind"] == "topk"]:
        tp = rd._postings(q["query"])
        k = q.get("k", 10)
        a = naive_topk(tp, k, cfg.k1, cfg.b, rd.avgdl)
        b = dense_topk(tp, k, cfg.k1, cfg.b, rd.avgdl, rd.n_docs)
        assert a == b, q["query"]


def test_cold_fetch_job_cap_is_global(spark, tiny_index, monkeypatch):
    """VERDICT round 2 item 8: concurrent cold queries must share ONE
    process-wide budget of in-flight fetch jobs — two readers fanning
    out 8 terms each may never exceed the semaphore's cap."""
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from yase_spark import query as qmod
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    monkeypatch.setattr(qmod, "_FETCH_SEM", threading.BoundedSemaphore(3))

    state = {"cur": 0, "max": 0}
    lock = threading.Lock()
    orig = IndexReader._fetch_table

    def tracked(self, ts, columns):
        with lock:
            state["cur"] += 1
            state["max"] = max(state["max"], state["cur"])
        try:
            import time
            time.sleep(0.05)  # widen the overlap window
            return orig(self, ts, columns)
        finally:
            with lock:
                state["cur"] -= 1

    monkeypatch.setattr(IndexReader, "_fetch_table", tracked)

    terms = ["json", "get", "page", "sync", "list", "user", "name", "data"]

    def cold_query(_):
        rd = IndexReader(spark, root)
        rd.n_docs = 10**9  # force the concurrent fan-out gate open
        rd.fetch_terms(terms)

    with ThreadPoolExecutor(4) as ex:
        list(ex.map(cold_query, range(4)))
    assert state["max"] >= 2, "fan-out never overlapped — test is vacuous"
    assert state["max"] <= 3, f"{state['max']} concurrent fetch jobs > cap 3"


def test_boolean_ast_driver_cluster_and_topk(spark, tiny_index):
    """SURVEY §1.4/§3.3 query AST: nested And/Or trees must evaluate
    identically in the driver set-kernel walk and the one-shuffle
    cluster lane, and TopK-over-a-filter must rank the matched set with
    the standard contribution formula and tie-break."""
    import math

    import numpy as np

    from yase_spark.query import And, IndexReader, Or, Term, TopK

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    t1, t2, t3, t4 = "json", "get", "page", "sync"
    got_terms = rd.fetch_terms([t1, t2, t3, t4])

    def docs(t):
        tp = got_terms.get(t)
        return set(tp.doc_ids.tolist()) if tp is not None else set()

    trees = {
        "or_and": (
            And([Or([Term(t1), Term(t2)]), Term(t3)]),
            (docs(t1) | docs(t2)) & docs(t3),
        ),
        "and_or_nested": (
            Or([And([Term(t1), Term(t3)]), And([Term(t2), Term(t4)])]),
            (docs(t1) & docs(t3)) | (docs(t2) & docs(t4)),
        ),
        "deep": (
            And([Or([Term(t1), And([Term(t2), Term(t4)])]), Term(t3)]),
            (docs(t1) | (docs(t2) & docs(t4))) & docs(t3),
        ),
    }
    for name, (tree, want) in trees.items():
        assert want, f"{name}: fixture term choice made the test vacuous"
        got = set(int(x) for x in rd.search(tree))
        assert got == want, name
        got_df = set(r["doc_id"] for r in rd.search_df(tree).collect())
        assert got_df == want, f"{name}: cluster lane diverges"

    # TopK over the first tree: rank matched docs by summed contributions
    tree, want = trees["or_and"]
    res = rd.search_topk(TopK(tree, k=5))
    scores = {}
    for t in (t1, t2, t3, t4):
        tp = got_terms.get(t)
        if tp is None:
            continue
        contrib = tp.idf * (tp.tfs.astype(np.float64) * (rd.cfg.k1 + 1.0)) / (
            tp.tfs.astype(np.float64)
            + rd.cfg.k1 * (1.0 - rd.cfg.b + rd.cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            if d in want and t in (t1, t2, t3):  # leaf tokens of the tree only
                scores[d] = scores.get(d, 0.0) + c
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(d, round(s, 9)) for _, d, s in res] == [
        (d, round(s, 9)) for d, s in exp
    ]


def test_boolean_ast_not(spark, tiny_index):
    """AND-NOT (round-3+): Not beside a positive conjunct must
    set-difference identically in the driver and cluster lanes; negated
    leaves must not contribute to TopK scores; a bare complement (Not at
    the root, Not under Or, And of only Nots) must be rejected."""
    import numpy as np
    import pytest as _pytest

    from yase_spark.query import And, IndexReader, Not, Or, Term, TopK

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    t1, t2, t3 = "json", "get", "parse"
    got_terms = rd.fetch_terms([t1, t2, t3])

    def docs(t):
        tp = got_terms.get(t)
        return set(tp.doc_ids.tolist()) if tp is not None else set()

    tree = And([Or([Term(t1), Term(t2)]), Not(Term(t3))])
    want = (docs(t1) | docs(t2)) - docs(t3)
    assert want and docs(t3), "fixture term choice made the test vacuous"
    got = set(int(x) for x in rd.search(tree))
    assert got == want
    got_df = set(r["doc_id"] for r in rd.search_df(tree).collect())
    assert got_df == want, "cluster lane diverges"

    # TopK: scores must come from positive leaves only (t1, t2)
    res = rd.search_topk(TopK(tree, k=5))
    scores = {}
    for t in (t1, t2):
        tp = got_terms.get(t)
        contrib = tp.idf * (tp.tfs.astype(np.float64) * (rd.cfg.k1 + 1.0)) / (
            tp.tfs.astype(np.float64)
            + rd.cfg.k1 * (1.0 - rd.cfg.b + rd.cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            if d in want:
                scores[d] = scores.get(d, 0.0) + c
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(d, round(s, 9)) for _, d, s in res] == [
        (d, round(s, 9)) for d, s in exp
    ]

    for bad in (
        Not(Term(t1)),
        And([Not(Term(t1)), Not(Term(t2))]),
        Or([Term(t1), Not(Term(t2))]),
    ):
        with _pytest.raises(TypeError):
            rd.search(bad)
        with _pytest.raises(TypeError):
            rd.search_df(bad)


def test_topk_where_filtered_serving(spark, tiny_index):
    """topk_where: ranking restricted to a docs-metadata slice under
    FULL-corpus statistics must equal filtering the dense scorer's full
    ranking to the slice; the tie-break order is preserved."""
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json getPage"
    langs = {r["doc_id"]: r["lang"] for r in rd.cat.read(spark, "docs").collect()}
    target = sorted({v for v in langs.values()})[0]
    allowed = {d for d, l in langs.items() if l == target}
    assert allowed and len(allowed) < len(langs)

    full = rd.topk(q, 10**9, use_wand=False)  # every scored doc
    exp = [(d, s) for _, d, s in full if d in allowed][:10]
    got = rd.topk_where(q, 10, f"lang = '{target}'").collect()
    assert [int(r["doc_id"]) for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert abs(float(r["score"]) - s) < 1e-9  # distributed sum ulps


def test_topk_after_pages_concatenate(spark, tiny_index):
    """searchAfter contract: page1 ++ page2 (cursor = last of page1)
    must equal the single top-2k ranking bitwise, and pages never
    overlap."""
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json getPage value"
    whole = rd.topk(q, 20)
    p1 = rd.topk_after(q, 10)
    assert [(d, s) for _, d, s in p1] == [(d, s) for _, d, s in whole[:10]]
    cursor = (p1[-1][2], p1[-1][1])
    p2 = rd.topk_after(q, 10, after=cursor)
    assert [(d, s) for _, d, s in p2] == [(d, s) for _, d, s in whole[10:]]
    assert {d for _, d, _ in p1}.isdisjoint({d for _, d, _ in p2})
    # re-executing a page with the same cursor is stable
    assert rd.topk_after(q, 10, after=cursor) == p2


def test_topk_boosted_collapse_fscore(spark, tiny_index):
    """Serving compositions on the contribution lane: boosts scale
    contributions (weight 1 == the plain distributed lane), collapse
    keeps exactly the best doc per field value, function-score
    multiplies by the docs expression."""
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json getPage"

    plain = rd.topk_distributed(q, 10).collect()
    noop = rd.topk_boosted(f"{q.split()[0]}^1.0 {q.split()[1]}", 10).collect()
    assert [(r["rank"], r["doc_id"]) for r in plain] == [
        (r["rank"], r["doc_id"]) for r in noop
    ]
    for p, n in zip(plain, noop):
        assert abs(p["score"] - n["score"]) < 1e-12

    # a 3x boost on a term must change scores in that term's favor
    boosted = rd.topk_boosted("json^3 getPage", 10).collect()
    assert boosted[0]["score"] > plain[0]["score"]

    col = rd.topk_collapse(q, "lang", 10).collect()
    langs = [r["lang"] for r in col]
    assert len(langs) == len(set(langs))  # one representative per field
    # each representative is its group's best: recompute from the lane
    from pyspark.sql import functions as F

    from yase_spark.tokenize import analyze_query

    per_doc = (
        rd.contrib_df(analyze_query(q))
        .groupBy("doc_id").agg(F.sum("contrib").alias("s"))
    )
    docs = rd.cat.read(spark, "docs").select("doc_id", "lang")
    best = {
        r["lang"]: (r["m"],)
        for r in per_doc.join(docs, "doc_id").groupBy("lang")
        .agg(F.max("s").alias("m")).collect()
    }
    for r in col:
        assert abs(r["score"] - best[r["lang"]][0]) < 1e-9

    fs = rd.topk_function_score(q, "case when lang = 'java' then 2.0 else 1.0 end", 10).collect()
    doc_lang = {r["doc_id"]: r["lang"] for r in docs.collect()}
    plain_scores = {
        r["doc_id"]: r["s"] for r in per_doc.collect()
    }
    for r in fs:
        mult = 2.0 if doc_lang[r["doc_id"]] == "java" else 1.0
        assert abs(r["score"] - plain_scores[r["doc_id"]] * mult) < 1e-9


def test_topk_lmd_properties(spark, tiny_index):
    """LM Dirichlet similarity: matches the pure-python Lucene-form
    recompute over the fetched postings, and is a genuinely different
    ranking signal than BM25 (shorter-doc prior)."""
    import numpy as np

    from yase_spark.query import IndexReader
    from yase_spark.tokenize import analyze_query

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    q = "json getPage"
    mu = 500.0
    rows = rd.topk_lmd(q, 10, mu=mu)
    assert len(rows) == 10
    scores = [s for _, _, s in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s >= 0 for s in scores)  # per-term clamp at 0

    tokens = analyze_query(q)
    got = rd.fetch_terms(tokens)
    from pyspark.sql import functions as F

    cf = {
        r["term"]: r["cf"]
        for r in rd._segments.filter(F.col("term").isin(tokens))
        .groupBy("term").agg(F.max("cf").alias("cf")).collect()
    }
    T = float(rd._total_postings_upper)
    expected: dict[int, float] = {}
    for t in tokens:
        tp = got.get(t)
        if tp is None:
            continue
        p = cf[t] / T
        for d, tf, dl in zip(
            tp.doc_ids.tolist(), tp.tfs.tolist(), tp.dls.tolist()
        ):
            c = max(0.0, np.log(1.0 + tf / (mu * p)) + np.log(mu / (mu + dl)))
            expected[d] = expected.get(d, 0.0) + c
    want = sorted(expected.items(), key=lambda x: (-x[1], x[0]))[:10]
    assert [(d, s) for _, d, s in rows] == [(d, pytest.approx(s)) for d, s in want]
