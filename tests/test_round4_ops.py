"""Round-4 operators: minimum_should_match ranking, completion
suggester, rescore window, unigram-LM perplexity, composite paging,
exact cardinality (query.topk_msm / topk_rescore, expand.complete,
textstats.unigram_perplexity, aggs.py).

Gates: msm == a naive driver recount over the decoded postings at every
min_match level (AND and OR as the degenerate ends); completion == a
pure-Python dictionary scan; composite pages tile the full bucket list
exactly (no gap, no overlap, ES after-semantics); rescore respects the
window (a doc outside the top-``window`` candidates never enters, even
with the bonus); perplexity matches a closed-form hand computation.
"""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yase_spark.aggs import composite_agg, distinct_counts
from yase_spark.query import IndexReader
from yase_spark.textstats import unigram_perplexity


@pytest.fixture(scope="module")
def rd(spark, tiny_index):
    root, cfg, _ = tiny_index
    return IndexReader(spark, root, cfg)


def _naive_msm(rd, terms, min_match, k):
    got = rd.fetch_terms(terms)
    per_doc: dict[int, list] = {}
    for t in terms:
        tp = got.get(t)
        if tp is None:
            continue
        from yase_spark.query import bm25_scores_np

        sc = bm25_scores_np(tp.tfs, tp.dls, tp.idf, rd.cfg.k1, rd.cfg.b, rd.avgdl)
        for d, s in zip(tp.doc_ids.tolist(), sc.tolist()):
            per_doc.setdefault(d, []).append(s)
    rows = [
        (d, sum(ss), len(ss)) for d, ss in per_doc.items() if len(ss) >= min_match
    ]
    rows.sort(key=lambda x: (-x[1], x[0]))
    return rows[:k]


QTERMS = ["json", "get", "page", "sync"]


@pytest.mark.parametrize("min_match", [1, 2, 3, 4])
def test_msm_matches_naive(rd, min_match):
    got = [
        (r["doc_id"], round(r["score"], 9), r["matched"])
        for r in rd.topk_msm(" ".join(QTERMS), min_match, k=10).collect()
    ]
    want = [(d, round(s, 9), m) for d, s, m in _naive_msm(rd, QTERMS, min_match, 10)]
    assert got == want


def test_msm_ends_are_and_or(rd):
    """min_match == n degenerates to AND, == 1 to OR (same doc sets as
    the boolean lanes; ranking is BM25 over matched terms)."""
    n = len(QTERMS)
    and_docs = set(rd.bool_and(" ".join(QTERMS)).tolist())
    all_and = {
        r["doc_id"] for r in rd.topk_msm(" ".join(QTERMS), n, k=10**6).collect()
    }
    assert all_and == and_docs
    or_docs = set(rd.bool_or(" ".join(QTERMS)).tolist())
    all_or = {
        r["doc_id"] for r in rd.topk_msm(" ".join(QTERMS), 1, k=10**6).collect()
    }
    assert all_or == or_docs


def test_completion_matches_dictionary_scan(spark, rd):
    from yase_spark.expand import TermExpander, build_term_dictionary

    build_term_dictionary(spark, rd.cat.root)
    ex = TermExpander(spark, rd.cat.root)
    dic = {r["term"]: r["df"] for r in rd.cat.read(spark, "dictionary").collect()}
    for prefix in ("ge", "s", "zzz"):
        got = [(r["term"], r["weight"]) for r in ex.complete(prefix, k=7).collect()]
        want = sorted(
            ((t, df) for t, df in dic.items() if t.startswith(prefix)),
            key=lambda x: (-x[1], x[0]),
        )[:7]
        assert got == want, prefix


def test_composite_pages_tile_exactly(spark, tiny_corpus):
    docs = tiny_corpus.select("repo", "lang").withColumnRenamed("repo", "source")
    full = sorted(
        (
            (r["lang"], r["source"], r["count"])
            for r in docs.groupBy("lang", "source")
            .agg(F.count("*").alias("count"))
            .collect()
        )
    )
    pages, after = [], None
    while True:
        rows = composite_agg(
            docs, ["lang", "source"], size=7, after=after
        ).collect()
        if not rows:
            break
        pages.extend((r["lang"], r["source"], r["doc_count"]) for r in rows)
        after = (rows[-1]["lang"], rows[-1]["source"])
        assert len(rows) <= 7
    assert pages == full  # no gap, no overlap, full ordered tiling


def test_composite_after_validation(spark, tiny_corpus):
    with pytest.raises(ValueError):
        composite_agg(tiny_corpus, ["lang"], after=("a", "b"))
    with pytest.raises(ValueError):
        composite_agg(tiny_corpus, [])


def test_distinct_counts_exact(spark):
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "lang": ["py", "py", "go", "go"],
        "text": ["a b c", "b c d", "x y", "y z z"],
    })
    docs = spark.createDataFrame(pdf)
    got = {
        r["lang"]: (r["n_terms"], r["n_docs"])
        for r in distinct_counts(docs, "lang", "[^a-z0-9]+").collect()
    }
    assert got == {"py": (4, 2), "go": (3, 2)}


def test_unigram_perplexity_closed_form(spark):
    # corpus: doc1 = "a a b", doc2 = "b"; counts a=2, b=2, T=4, V=2
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a a b", "b"]})
    )
    got = {
        r["doc_id"]: (r["dl"], r["ppl"])
        for r in unigram_perplexity(docs, alpha=1.0).collect()
    }
    p = (2 + 1.0) / (4 + 1.0 * 2)  # = 0.5 for both terms
    want_ppl = math.exp(-math.log(p))  # = 2.0
    assert got[1][0] == 3 and got[2][0] == 1
    assert abs(got[1][1] - want_ppl) < 1e-9
    assert abs(got[2][1] - want_ppl) < 1e-9


def test_bigram_perplexity_closed_form(spark):
    from yase_spark.textstats import bigram_perplexity

    # fit corpus: "a b a b" + "b c" -> C(ab)=2, C(ba)=1, C(bc)=1;
    # unigrams a=2 b=3 c=1, T=6
    fit = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["a b a b", "b c"]})
    )
    # score a doc with one unseen bigram (c a) and one OOV token (d)
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a b a b", "b c", "c a d"]})
    )
    got = {
        r["doc_id"]: (r["n_bg"], r["ppl"])
        for r in bigram_perplexity(score, fit_docs=fit).collect()
    }
    # doc1: S(b|a)=2/2, S(a|b)=1/3, S(b|a)=1 -> ppl = 3^(1/3)
    assert got[1][0] == 3 and abs(got[1][1] - 3 ** (1 / 3)) < 1e-9
    # doc2: S(c|b)=1/3 -> ppl = 3
    assert got[2][0] == 1 and abs(got[2][1] - 3.0) < 1e-9
    # doc3: backoff both pairs — (c,a): 0.4*2/6, (a,d): OOV floor 0.4*1/6
    want = math.exp(-(math.log(0.4 * 2 / 6) + math.log(0.4 / 6)) / 2)
    assert got[3][0] == 2 and abs(got[3][1] - want) < 1e-9


def test_bigram_perplexity_self_fit_never_backs_off(spark):
    from yase_spark.textstats import bigram_perplexity

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["x y z x y", "z z q"]})
    )
    # fit-on-self: every scored bigram is in the counts, so every lp is
    # ln(Cb/C1) > ln(0) — all finite, and a doc made ONLY of the
    # corpus's most predictable transitions scores lowest
    rows = bigram_perplexity(docs).collect()
    assert len(rows) == 2 and all(r["ppl"] > 0 for r in rows)
    with pytest.raises(ValueError):
        bigram_perplexity(docs, fit_docs=docs.filter("doc_id > 99"))


def test_rescore_window_semantics(spark, pos_index):
    """The bonus re-ranks WITHIN the window only: with window=k the
    result is a permutation-with-bonus of the plain top-k, and a
    phrase-matching doc ranked below the window never enters."""
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    q, phrase = "json get page", "json get"
    base = rd.topk(q, 30)
    hits = set(int(d) for d in rd.phrase(phrase))

    got = rd.topk_rescore(q, phrase, k=10, window=30, bonus=2.0)
    # recompute from the window definition
    rescored = [(d, s + (2.0 if d in hits else 0.0)) for _r, d, s in base]
    rescored.sort(key=lambda x: (-x[1], x[0]))
    want = [(i + 1, d, s) for i, (d, s) in enumerate(rescored[:10])]
    assert got == want

    # window=k: candidate SET is exactly the plain top-k's docs
    got_k = rd.topk_rescore(q, phrase, k=10, window=10, bonus=2.0)
    assert {d for _r, d, _s in got_k} == {d for _r, d, _s in rd.topk(q, 10)}


def test_filtered_ann_matches_naive(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    n, dim = 60, 8
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    labels = (np.arange(n) % 4).astype(int)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]], int(labels[i])) for i in range(n)],
        schema="vec_id long, embedding array<float>, label int",
    )
    from yase_spark.similarity import cosine_topk_where

    got = cosine_topk_where(emb, "label = 2", n_queries=3, k=5).collect()
    # naive: filter then exact cosine, same rounding/tie-break
    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    for qid in range(3):
        cand = [
            (round(cos(vecs[qid].astype(np.float64), vecs[j].astype(np.float64)), 6), j)
            for j in range(n) if labels[j] == 2 and j != qid
        ]
        cand.sort(key=lambda x: (-x[0], x[1]))
        want = [(j, s) for s, j in cand[:5]]
        mine = [
            (r["vec_id"], r["sim_r"])
            for r in sorted(
                (x for x in got if x["query_id"] == qid), key=lambda x: x["rank"]
            )
        ]
        assert mine == want, qid
    # every hit satisfies the filter
    assert all(labels[r["vec_id"]] == 2 for r in got)


def test_group_percentiles_closed_form(spark):
    from yase_spark.aggs import group_percentiles

    pdf = pd.DataFrame({
        "g": ["a"] * 10 + ["b"] * 4,
        "v": list(range(10, 110, 10)) + [5, 5, 5, 5],
    })
    docs = spark.createDataFrame(pdf)
    got = {
        (r["g"], r["p"]): r["value"]
        for r in group_percentiles(docs, "g", "v", [0.5, 0.9, 1.0]).collect()
    }
    # group a: n=10 -> ranks ceil(.5*10)=5, ceil(.9*10)=9, 10
    assert got[("a", 0.5)] == 50 and got[("a", 0.9)] == 90 and got[("a", 1.0)] == 100
    # group b: all ties -> every quantile is 5 regardless of tie order
    assert got[("b", 0.5)] == 5 and got[("b", 0.9)] == 5 and got[("b", 1.0)] == 5
    with pytest.raises(ValueError):
        group_percentiles(docs, "g", "v", [])


def test_term_vectors_bounded_recount(spark):
    from yase_spark.textstats import term_vectors

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["a b a", "b c", "z z z"],
    }))
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in term_vectors(docs, [1, 2]).collect()
    }
    assert got == {(1, "a"): 2, (1, "b"): 1, (2, "b"): 1, (2, "c"): 1}
    with pytest.raises(ValueError):
        term_vectors(docs, [])


def test_doclens_residency_bitwise(spark, tiny_index, monkeypatch):
    """The resident doc-length array path (norms posture: skip the dls
    varint stream, gather from the docs table instead) must produce
    bitwise-identical TermPostings to the payload-decode path, and the
    array itself must equal every decoded dls stream value."""
    root, cfg, _ = tiny_index
    IndexReader.clear_shared_meta()
    rd_norm = IndexReader(spark, root, cfg)
    monkeypatch.setattr(IndexReader, "DOCLENS_MIN_DF", 1)  # force gather
    terms = ["json", "get", "page", "zzz_absent"]
    got_n = rd_norm.fetch_terms(terms)
    assert rd_norm._shared.doclens_state == 1  # array actually loaded

    rd_pay = IndexReader(spark, root, cfg, shared_meta=False)  # payload path
    got_p = rd_pay.fetch_terms(terms)
    for t in terms:
        a, b = got_n[t], got_p[t]
        assert (a is None) == (b is None), t
        if a is None:
            continue
        assert np.array_equal(a.doc_ids, b.doc_ids)
        assert np.array_equal(a.tfs, b.tfs)
        assert np.array_equal(a.dls, b.dls)          # the gather == stream
        assert np.array_equal(a.block_max, b.block_max)
        assert np.array_equal(a.block_last, b.block_last)
    IndexReader.clear_shared_meta()


def test_topk_grouped_matches_naive(spark, rd):
    """Grouped top hits == a pandas recount: per-field windows of the
    fully-scored doc set, groups ranked by best hit; k_per_group=1
    degenerates to the collapse contract."""
    q = "json get page"
    per_doc = {
        r["doc_id"]: r["score"]
        for r in rd.contrib_df(["json", "get", "page"])
        .groupBy("doc_id").agg(F.sum("contrib").alias("score")).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "lang").collect()
    }
    by_lang: dict[str, list] = {}
    for d, s in per_doc.items():
        by_lang.setdefault(langs[d], []).append((d, s))
    kept = {}
    for lang, rows in by_lang.items():
        rows.sort(key=lambda x: (-x[1], x[0]))
        kept[lang] = rows[:3]
    order = sorted(
        kept, key=lambda g: (-kept[g][0][1], kept[g][0][0])
    )[:2]
    want = []
    for gr, lang in enumerate(order, 1):
        for hr, (d, s) in enumerate(kept[lang], 1):
            want.append((lang, gr, hr, d, round(s, 9)))

    got = [
        (r["lang"], r["group_rank"], r["hit_rank"], r["doc_id"],
         round(r["score"], 9))
        for r in rd.topk_grouped(q, "lang", k_per_group=3, groups=2).collect()
    ]
    assert got == want

    # degenerate: k_per_group=1 == collapse representatives
    col = [
        (r["lang"], r["doc_id"])
        for r in rd.topk_collapse(q, "lang", k=2).collect()
    ]
    g1 = [
        (r["lang"], r["doc_id"])
        for r in rd.topk_grouped(q, "lang", k_per_group=1, groups=2).collect()
    ]
    assert col == g1


def test_federated_equals_single_index(spark, tiny_corpus, tiny_index, tmp_path):
    """dfs_query_then_fetch over two shard indexes must reproduce the
    single-index ranking BITWISE (global integer stats -> identical idf/
    avgdl; per-doc postings shard-independent; natural-key tie-break)."""
    from yase_spark.config import IndexConfig
    from yase_spark.federate import dfs_query_then_fetch
    from yase_spark.index import build_index

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"shard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))

    full = IndexReader(spark, root_full, cfg)
    keys = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in full.cat.read(spark, "docs")
        .select("doc_id", "repo", "path", "commit").collect()
    }
    for q in ["json", "json get page", "sync_list user name", "zzz_absent"]:
        want = [
            (i + 1, *keys[d], s)
            for i, (_r, d, s) in enumerate(full.topk(q, 10, use_wand=False))
        ]
        got = dfs_query_then_fetch(readers, q, k=10)
        assert got == want, q

    with pytest.raises(ValueError):
        bad = IndexReader(spark, readers[0].cat.root,
                          IndexConfig(**{**cfg.__dict__}))
        object.__setattr__(bad.cfg, "k1", 9.9)
        dfs_query_then_fetch([readers[0], bad], "json")


def test_federated_facets_equal_single_index(spark, tiny_corpus, tiny_index, tmp_path):
    from yase_spark.federate import federated_facet_counts
    from yase_spark.index import build_index
    from yase_spark.query import And, Term

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"fshard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))
    full = IndexReader(spark, root_full, cfg)
    tree = And([Term("json"), Term("get")])
    want = [
        (r["lang"], r["cnt"]) for r in full.facet_counts(tree, "lang").collect()
    ]
    got = federated_facet_counts(readers, tree, "lang")
    assert got == want


def test_federated_overcap_shard_uses_sharded_lane(spark, tiny_corpus, tiny_index, tmp_path, monkeypatch):
    """A shard whose query postings exceed its driver-fetch cap must be
    served through topk_sharded with the GLOBAL stats override — and the
    merged result must still be bitwise the single-index ranking."""
    from yase_spark.federate import dfs_query_then_fetch
    from yase_spark.index import build_index

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"oshard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))
    # force BOTH shards over-cap for any real query
    for r in readers:
        r.driver_fetch_max_postings = 1
    calls = {"sharded": 0}
    orig = IndexReader.topk_sharded

    def counting(self, *a, **kw):
        calls["sharded"] += 1
        assert kw.get("stats_override") is not None
        return orig(self, *a, **kw)

    monkeypatch.setattr(IndexReader, "topk_sharded", counting)

    full = IndexReader(spark, root_full, cfg)
    keys = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in full.cat.read(spark, "docs")
        .select("doc_id", "repo", "path", "commit").collect()
    }
    q = "json get page"
    want = [
        (i + 1, *keys[d], s)
        for i, (_r, d, s) in enumerate(full.topk(q, 10, use_wand=False))
    ]
    got = dfs_query_then_fetch(readers, q, k=10)
    assert got == want
    assert calls["sharded"] == 2  # both shards took the cluster lane


def test_federated_suggest_equal_single_index(spark, tiny_corpus, tiny_index, tmp_path):
    """federated_complete / federated_spell_suggest over two disjoint
    shards must reproduce the single-index rankings exactly — dfs are
    additive over disjoint shards, so every weight is the single-index
    weight bit-for-bit. Also gates max_values: an over-bound per-shard
    candidate set raises instead of flooding the coordinator."""
    import pytest as _pytest

    from yase_spark.expand import TermExpander
    from yase_spark.federate import federated_complete, federated_spell_suggest
    from yase_spark.index import build_index
    from yase_spark.suggest import spell_suggest

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"sshard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))
    full = IndexReader(spark, root_full, cfg)

    for prefix in ("ge", "s", "zzz"):
        want = [
            (r["term"], r["weight"])
            for r in TermExpander(spark, full.cat.root)
            .complete(prefix, k=7).collect()
        ]
        assert federated_complete(readers, prefix, k=7) == want, prefix

    words = ["jsonn", "gte", "zzzzz"]
    want = [
        (r["word"], r["rank"], r["suggestion"], r["df"])
        for r in spell_suggest(spark, full.cat.root, words, k=3)
        .orderBy("word", "rank").collect()
    ]
    assert federated_spell_suggest(readers, words, k=3) == want

    with _pytest.raises(RuntimeError, match="exceeded its 1-row bound"):
        federated_complete(readers, "s", k=5, max_values=1)


def test_federated_mlt_equals_single_index(spark, tiny_corpus, tiny_index, tmp_path):
    """federated_more_like_this over two disjoint shards must reproduce
    the single-index MLT EXACTLY: global tf*ln(N/df) selection picks the
    same term set (integer-additive dfs), and per-shard dense ranking
    under global idf/avgdl yields bit-identical per-doc scores (same
    per-doc summation order = selection order)."""
    from yase_spark.federate import federated_more_like_this
    from yase_spark.index import build_index

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"mshard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))
    full = IndexReader(spark, root_full, cfg)
    keys = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in full.cat.read(spark, "docs")
        .select("doc_id", "repo", "path", "commit").collect()
    }

    seeds = (
        tiny_corpus.orderBy("repo", "path", "commit")
        .select("repo", "path", "commit", "content").limit(3).collect()
    )
    inv = {v: k for k, v in keys.items()}
    for srow in seeds:
        seed_key = (srow["repo"], srow["path"], srow["commit"])
        for m in (5, 25):
            want = [
                (i + 1, *keys[d], s)
                for i, (_r, d, s) in enumerate(
                    full.more_like_this(
                        srow["content"], k=10, m=m, exclude=inv[seed_key]
                    )
                )
            ]
            got = federated_more_like_this(
                readers, srow["content"], k=10, m=m, exclude_key=seed_key
            )
            assert got == want, (seed_key, m)

    assert federated_more_like_this(readers, "", k=10) == []
    assert federated_more_like_this(readers, seeds[0]["content"], k=0) == []


def test_federated_sigterms_equal_single_corpus(spark, tiny_corpus):
    """significant_terms_federated over a disjoint split must equal the
    single-corpus aggregation bitwise (every JLH input is an additive
    integer), and the merge plan must stay cluster-side (union +
    re-aggregation — no Python row transfer)."""
    from yase_spark.cooccur import significant_terms, significant_terms_federated

    docs = tiny_corpus.select(
        F.col("path").alias("doc_id"), F.col("lang"),
        F.col("content").alias("text"),
    )
    shards = [
        docs.filter(F.pmod(F.abs(F.xxhash64("doc_id")), F.lit(3)) == p)
        for p in range(3)
    ]
    pred = "lang = 'python'"
    want = significant_terms(docs, pred, k=15).collect()
    fed = significant_terms_federated(shards, pred, k=15)
    assert fed.collect() == want
    assert "BatchEvalPython" not in fed._jdf.queryExecution().executedPlan().toString()

    with pytest.raises(ValueError):
        significant_terms_federated([], pred)


def test_sq_ann_full_rescore_is_brute_force(spark):
    """SQ8 with rescore=None must equal exact cosine_topk row-for-row:
    the exact re-rank sees every candidate, so quantization error can
    only vanish — this is the oracle identity the driver row leans on."""
    from yase_spark.similarity import cosine_topk, sq_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    want = sorted(map(tuple, cosine_topk(emb, n_queries=4, k=10).collect()))
    got = sorted(map(tuple, sq_ann_topk(emb, n_queries=4, k=10).collect()))
    assert got == want


def test_sq_ann_pruned_rescore_recall(spark):
    """The scale configuration (rescore << N): the uint8 scan proposes a
    bounded candidate pool and recall@10 vs brute force stays high —
    the quantizer's 255-step grid on normalized dims keeps approximate
    and exact rankings close."""
    from yase_spark.similarity import cosine_topk, sq_ann_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    rescore = 64
    assert rescore < n, "fixture must exercise real pruning"
    truth = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(emb, n_queries=4, k=10).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in sq_ann_topk(emb, n_queries=4, k=10, rescore=rescore).collect()
    }
    assert len(got & truth) / len(truth) >= 0.9


def test_sq_codes_are_one_byte_per_dim(spark):
    """The bandwidth claim: a code cell is exactly dim bytes (8x less
    than the float64 array the oracle scans, 4x less than float32), and
    dequantization error is bounded by half a grid step per dim."""
    import numpy as np

    from yase_spark.similarity import sq_encode, sq_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dim = len(emb.select("embedding").first()["embedding"])
    mn, mx = sq_train(emb)
    assert mn.shape == (dim,) and np.all(mx >= mn)
    rows = (
        sq_encode(emb, mn, mx).join(emb, "vec_id")
        .select("code", "embedding").limit(20).collect()
    )
    span = np.maximum(mx - mn, 1e-12)
    for r in rows:
        code = np.frombuffer(r["code"], dtype=np.uint8)
        assert code.shape == (dim,)
        x = np.asarray(r["embedding"], dtype=np.float64)
        xn = x / max(float(np.linalg.norm(x)), 1e-12)
        deq = code.astype(np.float64) * span / 255.0 + mn
        assert np.max(np.abs(deq - xn)) <= np.max(span) / 255.0 / 2 + 1e-9


def test_topk_sort_field_matches_naive(spark, rd):
    """ES sort-by-field: (a) equals a pandas recount over the match set
    ∪ docs dimension, desc and asc; (b) a string query means OR of its
    tokens (parity with an explicit Or tree); (c) non-dimension fields
    are rejected loudly."""
    import pandas as pd
    import pytest as _pytest

    from yase_spark.query import Or, Term
    from yase_spark.tokenize import analyze_query

    q = "json getPage"
    docs = rd.cat.read(spark, "docs").select("doc_id", "doc_len").toPandas()
    toks = analyze_query(q)
    match = sorted(
        {int(x) for t in toks for x in rd.fetch_terms([t]).get(t, None).doc_ids}
        if all(rd.fetch_terms([t]).get(t) is not None for t in toks)
        else set().union(
            *[
                set(map(int, tp.doc_ids))
                for tp in rd.fetch_terms(toks).values()
            ]
        )
    )
    m = docs[docs.doc_id.isin(match)]
    for asc in (False, True):
        want = m.sort_values(
            ["doc_len", "doc_id"], ascending=[asc, True]
        ).head(5)
        got = rd.topk_sort_field(q, "doc_len", k=5, ascending=asc).collect()
        assert [(r["doc_id"], r["doc_len"]) for r in got] == list(
            map(tuple, want[["doc_id", "doc_len"]].itertuples(index=False))
        ), f"asc={asc}"
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))

    tree = Or([Term(t) for t in toks])
    a = rd.topk_sort_field(q, "doc_len", k=5).collect()
    b = rd.topk_sort_field(tree, "doc_len", k=5).collect()
    assert a == b

    with _pytest.raises(ValueError, match="docs-dimension"):
        rd.topk_sort_field(q, "content_sha256", k=5)
    with _pytest.raises(ValueError, match="docs-dimension"):
        rd.topk_sort_field(q, "nope", k=5)


def test_federated_sort_equals_single_index(spark, tiny_corpus, tiny_index, tmp_path):
    """federated_sort_field over two shards must reproduce the
    single-index sorted browse and the tree-filtered sort exactly
    (natural-key tie-break == doc_id tie-break on this corpus shape:
    engine doc order follows the natural-key sort)."""
    from yase_spark.federate import federated_sort_field
    from yase_spark.index import build_index
    from yase_spark.query import Term

    root_full, cfg, _ = tiny_index
    readers = []
    for parity in (0, 1):
        shard = tiny_corpus.filter(
            F.pmod(F.abs(F.xxhash64("path")), F.lit(2)) == parity
        )
        root = str(tmp_path / f"sshard{parity}")
        build_index(spark, shard, root, cfg)
        readers.append(IndexReader(spark, root, cfg))

    full = IndexReader(spark, root_full, cfg)
    keys = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in full.cat.read(spark, "docs")
        .select("doc_id", "repo", "path", "commit").collect()
    }
    for tree, asc in [(None, False), (None, True), (Term("json"), False)]:
        want = [
            (r["rank"], *keys[r["doc_id"]], r["doc_len"])
            for r in full.topk_sort_field(
                tree, "doc_len", k=10, ascending=asc
            ).collect()
        ]
        got = federated_sort_field(readers, tree, "doc_len", k=10, ascending=asc)
        assert got == want, (tree, asc)
    assert federated_sort_field([], None, "doc_len") == []
