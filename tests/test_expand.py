"""Dictionary expansion (prefix/wildcard/regex/fuzzy), ranked/boolean
multi-term rewrites, and facet counts (expand.py + IndexReader hooks).

Gates: expansions == a pure-Python scan of the collected dictionary;
the sorted-dictionary path == the segments-scan fallback AND its prefix
predicate reaches the Parquet scan (PushedFilters); the boolean rewrite
== union of per-term doc sets; the ranked rewrite == a naive
fixed-order BM25 disjunction; facets == a pandas recount of the match
set; the expansion cap raises.
"""

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.expand import (
    MAX_EXPANSIONS,
    TermExpander,
    build_term_dictionary,
    literal_prefix,
    wildcard_to_regex,
)
from yase_spark.query import IndexReader


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.fixture(scope="module")
def rd(spark, tiny_index):
    root, cfg, _ = tiny_index
    n = build_term_dictionary(spark, root)
    assert n > 0
    return IndexReader(spark, root, cfg)


@pytest.fixture(scope="module")
def all_terms(spark, rd):
    return {
        r["term"]: r["df"]
        for r in rd.cat.read(spark, "dictionary").collect()
    }


def _naive_expand(all_terms, pred, limit=MAX_EXPANSIONS):
    hits = sorted(
        (t for t in all_terms if pred(t)),
        key=lambda t: (-all_terms[t], t),
    )
    assert len(hits) <= limit
    return hits


def test_expansions_match_naive(rd, all_terms):
    assert rd.expand_terms("prefix", "get") == _naive_expand(
        all_terms, lambda t: t.startswith("get")
    )
    rx = re.compile(wildcard_to_regex("s*nc"))
    assert rd.expand_terms("wildcard", "s*nc") == _naive_expand(
        all_terms, lambda t: rx.match(t)
    )
    assert rd.expand_terms("regex", "^ev[a-z]+$") == _naive_expand(
        all_terms, lambda t: re.match("^ev[a-z]+$", t)
    )
    assert rd.expand_terms("fuzzy", "jsom", max_edits=1) == _naive_expand(
        all_terms, lambda t: _levenshtein(t, "jsom") <= 1
    )
    assert "json" in rd.expand_terms("fuzzy", "jsom", max_edits=1)


def test_wildcard_helpers():
    assert wildcard_to_regex("a*b?c") == "^a.*b.c$"
    assert literal_prefix("abc*d") == "abc"
    assert literal_prefix("*x") == ""


def test_dictionary_path_equals_fallback(spark, rd, tiny_index, all_terms):
    root, _, _ = tiny_index
    ex = TermExpander(spark, root)
    # force the fallback (segments (term, df) scan)
    fb = TermExpander.__new__(TermExpander)
    fb.spark, fb.cat = spark, ex.cat
    fb._dic = ex.cat.read(spark, "segments").select("term", "df")
    for kind, arg in [("prefix", "co"), ("fuzzy", "page")]:
        assert getattr(ex, kind)(arg) == getattr(fb, kind)(arg)


def test_prefix_predicate_pushdown(spark, rd):
    """The sorted dictionary table turns a prefix lookup into a pushed
    range predicate — at scale that is Parquet row-group pruning."""
    dic = rd.cat.read(spark, "dictionary")
    from yase_spark.expand import _prefix_range

    plan = dic.filter(_prefix_range(F.col("term"), "get"))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(term," in plan


def test_multi_term_search_is_union(rd):
    terms = rd.expand_terms("prefix", "get")
    got = rd.multi_term_search("prefix", "get")
    union = np.unique(
        np.concatenate(
            [tp.doc_ids for tp in rd.fetch_terms(terms).values() if tp is not None]
        )
    )
    assert got.tolist() == union.tolist()


def test_multi_term_topk_matches_naive(rd):
    terms = rd.expand_terms("prefix", "ge")
    got = rd.multi_term_topk("prefix", "ge", k=10)
    assert len(got) == 10
    # naive disjunction in the SAME term order (fixed summation order)
    tps = [tp for tp in rd.fetch_terms(terms).values() if tp is not None]
    scores: dict[int, float] = {}
    for tp in tps:
        contrib = tp.idf * (tp.tfs.astype(np.float64) * (rd.cfg.k1 + 1.0)) / (
            tp.tfs.astype(np.float64)
            + rd.cfg.k1
            * (1.0 - rd.cfg.b + rd.cfg.b * (tp.dls.astype(np.float64) / rd.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            scores[d] = scores.get(d, 0.0) + c
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, s) for _, d, s in got] == ref  # bitwise


def test_expansion_cap_raises(rd):
    with pytest.raises(ValueError, match="max_expansions"):
        rd.expand_terms("prefix", "", limit=3)


@pytest.fixture(scope="module")
def doc_texts(spark, rd, tiny_corpus):
    return {
        r["doc_id"]: r["content"]
        for r in rd.cat.read(spark, "docs")
        .join(
            tiny_corpus.select("repo", "path", "commit", "content"),
            ["repo", "path", "commit"],
        )
        .select("doc_id", "content")
        .collect()
    }


def test_mlt_terms_match_naive(rd, doc_texts):
    """Term selection == a pure-Python tf*ln(N/df) ranking where df is
    recomputed from every document's analyzed token SET (the index df
    definition), N = corpus size."""
    import math
    from collections import Counter

    from yase_spark.tokenize import tokenize_text

    n = len(doc_texts)
    df = Counter(
        t
        for txt in doc_texts.values()
        for t in set(tokenize_text(txt, ngrams=rd.cfg.ngrams))
    )
    for src in (5, 77, 400):
        tf = Counter(tokenize_text(doc_texts[src], ngrams=rd.cfg.ngrams))
        scored = sorted(
            ((t, c * math.log(n / df[t])) for t, c in tf.items() if df[t]),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert rd.mlt_terms(doc_texts[src], m=15) == [t for t, _ in scored[:15]]


def test_more_like_this_scores_and_excludes(rd, doc_texts):
    src = 5
    terms = rd.mlt_terms(doc_texts[src], m=15)
    got = rd.more_like_this(doc_texts[src], k=10, m=15, exclude=src)
    assert len(got) == 10
    assert src not in {d for _, d, _ in got}
    # without exclusion the source doc itself must win or place: it
    # contains every selected term by construction
    got_incl = rd.more_like_this(doc_texts[src], k=10, m=15)
    assert src in {d for _, d, _ in got_incl}
    # naive fixed-order summation over the same fetched postings
    tps = [tp for t in terms for tp in [rd.fetch_terms([t])[t]] if tp is not None]
    scores: dict[int, float] = {}
    for tp in tps:
        contrib = tp.idf * (tp.tfs.astype("float64") * (rd.cfg.k1 + 1.0)) / (
            tp.tfs.astype("float64")
            + rd.cfg.k1
            * (1.0 - rd.cfg.b + rd.cfg.b * (tp.dls.astype("float64") / rd.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            scores[d] = scores.get(d, 0.0) + c
    scores.pop(src, None)
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, s) for _, d, s in got] == ref  # bitwise


def test_facet_counts(spark, rd):
    from yase_spark.query import And, Term

    tree = And([Term("get"), Term("page")])
    got = rd.facet_counts(tree, "lang", topn=10).collect()
    matched = rd.search(tree)
    docs = {
        r["doc_id"]: r["lang"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "lang").collect()
    }
    counts: dict[str, int] = {}
    for d in matched.tolist():
        counts[docs[d]] = counts.get(docs[d], 0) + 1
    ref = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["lang"], r["cnt"]) for r in got] == ref


def test_facet_ranges_and_histogram(spark, rd):
    """Range + histogram facets (round 4) == pandas recounts of the
    match set's doc_len: every range bucket emitted (zeros included),
    out-of-range values in no bucket; histogram emits non-empty
    buckets only, floor(dl/interval)*interval keyed."""
    from yase_spark.query import And, Term

    tree = And([Term("get"), Term("page")])
    matched = rd.search(tree).tolist()
    dls = {
        r["doc_id"]: r["doc_len"]
        for r in rd.cat.read(spark, "docs").select("doc_id", "doc_len").collect()
    }
    vals = [dls[d] for d in matched]
    assert vals, "empty match set makes the gate vacuous"

    edges = [0.0, 50.0, 100.0, 200.0, 400.0]
    got = rd.facet_ranges(tree, "doc_len", edges).collect()
    assert [(r["lo"], r["hi"]) for r in got] == list(zip(edges, edges[1:]))
    for r in got:
        ref = sum(1 for v in vals if r["lo"] <= v < r["hi"])
        assert r["cnt"] == ref
    # out-of-range values fall in no bucket
    assert sum(r["cnt"] for r in got) == sum(
        1 for v in vals if edges[0] <= v < edges[-1]
    )
    # a deliberately clipped edge list must under-count (proves the
    # bounds bind)
    clipped = rd.facet_ranges(tree, "doc_len", [0.0, 1.0]).collect()
    assert sum(r["cnt"] for r in clipped) == sum(1 for v in vals if v < 1)

    hist = rd.facet_histogram(tree, "doc_len", 100.0).collect()
    ref_h: dict[float, int] = {}
    for v in vals:
        b = float(v // 100 * 100)
        ref_h[b] = ref_h.get(b, 0) + 1
    assert [(r["bucket"], r["cnt"]) for r in hist] == sorted(ref_h.items())


def test_facet_stats_exact_power_sums(spark, rd):
    """extended_stats facet == a pandas recount: per-lang n/min/max/sum
    over the match set, avg and sample variance from the exact integer
    power sums with the explicit two-sum formula (singletons -> 0.0)."""
    from yase_spark.query import And, Term

    tree = And([Term("get"), Term("page")])
    matched = set(rd.search(tree).tolist())
    rows = rd.cat.read(spark, "docs").select("doc_id", "lang", "doc_len").collect()
    by_lang: dict = {}
    for r in rows:
        if r["doc_id"] in matched:
            by_lang.setdefault(r["lang"], []).append(r["doc_len"])
    assert by_lang
    got = {r["lang"]: r for r in rd.facet_stats(tree, "lang", "doc_len").collect()}
    assert sorted(got) == sorted(by_lang)
    for lang, vs in by_lang.items():
        r = got[lang]
        n, s, ss = len(vs), sum(vs), sum(v * v for v in vs)
        assert (r["n"], r["min"], r["max"], r["sum"]) == (n, min(vs), max(vs), s)
        assert r["avg_r"] == round(s / n, 6)
        want_var = 0.0 if n <= 1 else round((ss - s * s / n) / (n - 1.0), 6)
        assert r["var_r"] == want_var


def test_synonyms(spark, rd, tiny_index, all_terms):
    """Synonym expansion (round 4): analyzer-applied build (multi-token
    entries rejected), Solr expand=true pair semantics, deterministic
    query-order-then-variant-ASC rewrite with first-occurrence dedup,
    boolean OR == the verified search kernel on the same set, ranked
    rewrite bitwise == a naive fixed-order BM25 disjunction, and the
    max_expansions cap binds."""
    from yase_spark.expand import build_synonyms
    from yase_spark.query import Or, Term

    root, _, _ = tiny_index

    # no synonyms table yet: the rewrite is the identity
    assert rd.synonym_expand("get page") == ["get", "page"]

    # a camelCase entry analyzes to several parts -> loud rejection
    with pytest.raises(ValueError, match="analyzes to"):
        build_synonyms(spark, root, [["getUserName", "json"]])

    # analyzer-applied: case folds to the index terms; 2-group -> 2
    # ordered pairs, 3-group -> 6
    n = build_synonyms(spark, root, [["JSON", "Page"], ["get", "load", "sync"]])
    assert n == 8

    assert rd.synonym_expand("get json") == ["get", "load", "sync", "json", "page"]
    # dedup keeps the first occurrence across overlapping groups
    assert rd.synonym_expand("page json get") == ["page", "json", "get", "load", "sync"]

    terms = rd.synonym_expand("get json")
    ids = rd.synonym_search("get json")
    ref_ids = rd.search(Or([Term(t) for t in terms]))
    assert np.array_equal(ids, ref_ids)
    # the expansion can only widen the match set
    base = rd.search(Or([Term("get"), Term("json")]))
    assert set(base.tolist()) <= set(ids.tolist())

    got = rd.synonym_topk("get json", k=10)
    fetched = rd.fetch_terms(terms)
    scores: dict[int, float] = {}
    for t in terms:
        tp = fetched.get(t)
        if tp is None:
            continue
        contrib = tp.idf * (tp.tfs.astype("float64") * (rd.cfg.k1 + 1.0)) / (
            tp.tfs.astype("float64")
            + rd.cfg.k1
            * (1.0 - rd.cfg.b + rd.cfg.b * (tp.dls.astype("float64") / rd.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            scores[d] = scores.get(d, 0.0) + c
    ref = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(d, s) for _, d, s in got] == ref  # bitwise

    with pytest.raises(ValueError, match="max_expansions"):
        rd.synonym_expand("get json", limit=3)
