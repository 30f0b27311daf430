"""Spell suggestion (suggest.py) and co-occurrence mining (cooccur.py).

Gates:
* deletion-neighborhood candidates are EXACT for edit distance 1: the
  SymSpell join finds the identical suggestion set as a brute-force
  levenshtein scan of the dictionary, for every probe word.
* ranking contract: df DESC, suggestion ASC; the word never suggests
  itself; unknown-neighborhood words yield no rows.
* did_you_mean keeps known words and corrects unknown ones.
* the deletions probe broadcasts the tiny side and pushes the IN-list
  into the parquet scan.
* related_terms PMI matches a pure-python replay; the seed never
  reports itself; min_pair filters.
* collocations PMI matches a pure-python replay over the same
  empty-filtered token stream; bigrams never cross doc boundaries.
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from yase_spark.cooccur import collocations, related_terms
from yase_spark.suggest import (
    build_deletion_index,
    did_you_mean,
    py_deletion_variants,
    spell_suggest,
)

DOCS = [
    "spark shuffle merge spark table",
    "spark table hash merge",
    "shark table spike hash",
    "spork merge merge window",
    "stark window table spark",
]


@pytest.fixture(scope="module")
def sugg_ix(spark, tmp_path_factory):
    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index

    root = str(tmp_path_factory.mktemp("sugg") / "ix")
    corpus = spark.createDataFrame(
        [("r", f"{i:04d}", "h", "py", t) for i, t in enumerate(DOCS)],
        "repo string, path string, commit string, lang string, content string",
    )
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, hot_term_df=10**9)
    build_index(spark, corpus, root, cfg)
    n = build_deletion_index(spark, root)
    assert n > 0
    return root


def _dict_terms(spark, root):
    from yase_spark.catalog import Catalog

    return {
        r["term"]: r["df"]
        for r in Catalog(root).read(spark, "dictionary").collect()
    }


def _brute(dic: dict, word: str, k: int = 5):
    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return d[n]

    cand = [(t, df) for t, df in dic.items() if t != word and lev(t, word) == 1]
    cand.sort(key=lambda x: (-x[1], x[0]))
    return cand[:k]


def test_variants_exact_vs_brute(spark, sugg_ix):
    dic = _dict_terms(spark, sugg_ix)
    probes = ["spark", "spork", "tble", "hash", "windoww", "zzz", "merg"]
    got = spell_suggest(spark, sugg_ix, probes, k=5).collect()
    by_word = {}
    for r in got:
        by_word.setdefault(r["word"], []).append(r)
    for w in probes:
        exp = _brute(dic, w)
        rows = sorted(by_word.get(w, []), key=lambda r: r["rank"])
        assert [(r["suggestion"], r["df"]) for r in rows] == exp, w
        assert [r["rank"] for r in rows] == list(range(1, len(exp) + 1))
        assert all(r["suggestion"] != w for r in rows)


def test_variants_helper():
    assert py_deletion_variants("ab") == ["ab", "b", "a"]
    # dedup: "aa" deletes to "a" twice
    assert py_deletion_variants("aa") == ["aa", "a"]


def test_did_you_mean(spark, sugg_ix):
    out = dict(did_you_mean(spark, sugg_ix, ["spark", "spork", "zzzzzz"]))
    assert out["spark"] == "spark"          # known, kept
    # spork is itself in the dictionary (df 1) so it is kept too
    assert out["spork"] == "spork"
    assert out["zzzzzz"] == "zzzzzz"        # nothing nearby -> unchanged
    out2 = dict(did_you_mean(spark, sugg_ix, ["spork"], min_df=2))
    # with min_df=2 spork (df 1) is "unknown" and corrects to spark
    assert out2["spork"] == "spark"


def test_probe_plan_broadcasts_and_pushes(spark, sugg_ix):
    plan = (
        spell_suggest(spark, sugg_ix, ["spark"], k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert re.search(r"PushedFilters: \[.*In\(variant", plan), plan


# ------------------------------------------------------------ cooccur
def _py_tok(t):
    return [w for w in re.split("[^a-z0-9]+", t.lower()) if w]


def test_related_terms_vs_python(spark):
    docs = spark.createDataFrame(
        list(enumerate(DOCS)), "doc_id bigint, text string"
    )
    out = related_terms(docs, "spark", k=10, min_pair=1).collect()
    sets = {i: set(_py_tok(t)) for i, t in enumerate(DOCS)}
    n = len(DOCS)
    seed_docs = {i for i, s in sets.items() if "spark" in s}
    exp = []
    for t in {w for s in sets.values() for w in s} - {"spark"}:
        c_xy = sum(1 for i in seed_docs if t in sets[i])
        df = sum(1 for s in sets.values() if t in s)
        if c_xy >= 1:
            exp.append((t, c_xy, df, round(math.log(c_xy * n / (df * len(seed_docs))), 5)))
    exp.sort(key=lambda x: (-x[3], x[0]))
    got = sorted(out, key=lambda r: r["rank"])
    assert [(r["term"], r["c_xy"], r["df"], r["pmi_r"]) for r in got] == exp[:10]
    assert all(r["term"] != "spark" for r in got)


def test_related_terms_min_pair_and_dictionary(spark):
    docs = spark.createDataFrame(
        list(enumerate(DOCS)), "doc_id bigint, text string"
    )
    base = related_terms(docs, "spark", k=50, min_pair=2).collect()
    assert all(r["c_xy"] >= 2 for r in base)
    # passing an explicit background dictionary gives identical results
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term")
    ).filter("term <> ''").distinct()
    dic = toks.groupBy("term").agg(F.count("*").alias("df"))
    via_dic = related_terms(docs, "spark", dictionary=dic, k=50, min_pair=2).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, via_dic))


def test_collocations_vs_python(spark):
    docs = spark.createDataFrame(
        list(enumerate(DOCS)), "doc_id bigint, text string"
    )
    out = collocations(docs, k=100, min_count=2).collect()
    streams = [_py_tok(t) for t in DOCS]
    uni, big = {}, {}
    for s in streams:
        for w in s:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(s, s[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    u = sum(uni.values())
    t_big = sum(max(len(s) - 1, 0) for s in streams)
    exp = [
        (f"{a} {b}", c, round(math.log((c / t_big) / ((uni[a] / u) * (uni[b] / u))), 5))
        for (a, b), c in big.items()
        if c >= 2
    ]
    exp.sort(key=lambda x: (-x[2], x[0]))
    got = sorted(out, key=lambda r: r["rank"])
    assert [(r["bigram"], r["c_ab"], r["pmi_r"]) for r in got] == exp
    # cross-doc adjacency must NOT collocate: doc0 ends 'table', doc1
    # starts 'spark'; 'table spark' count comes only from doc 4
    counts = {r["bigram"]: r["c_ab"] for r in got}
    assert counts.get("window table", 0) <= 1 or "window table" not in counts


def test_collocations_survives_empty_and_one_token_docs(spark):
    """Docs whose filtered token stream is empty or one token long must
    not crash the slice-based bigram builder (r6 regression gate: a
    negative slice length throws in Spark) and must contribute no
    bigrams."""
    docs = spark.createDataFrame(
        [(0, "spark merge spark merge spark merge"), (1, "!!! ??? ..."),
         (2, ""), (3, "solo"), (4, "spark merge")],
        "doc_id bigint, text string",
    )
    out = collocations(docs, k=10, min_count=2).collect()
    counts = {r["bigram"]: r["c_ab"] for r in out}
    assert counts["spark merge"] == 4  # 3 from doc0 + 1 from doc4
    assert all(" " in b for b in counts)


# ------------------------------------------------------------- explain
def test_explain_decomposes_topk(spark, sugg_ix):
    from yase_spark.config import IndexConfig
    from yase_spark.query import IndexReader

    rd = IndexReader(spark, sugg_ix)
    q = "spark merge"
    rows = rd.explain(q, k=3)
    tops = rd.topk(q, k=3)
    assert rows
    by_doc = {}
    for r, d, t, tf, contrib, total in rows:
        by_doc.setdefault((r, d, total), []).append(contrib)
    # one group per hit, contributions sum to the hit's total score
    assert len(by_doc) == len(tops)
    for (r, d, total), contribs in by_doc.items():
        assert abs(sum(contribs) - total) < 1e-9
    # every reported tf is positive and terms are query terms
    assert all(tf >= 1 for _, _, _, tf, _, _ in rows)
    assert {t for _, _, t, _, _, _ in rows} <= {"spark", "merge"}


# --------------------------------------------- staleness after append
def test_dictionary_and_deletions_staleness(spark, tmp_path):
    """An append bumps the segments version; the sorted dictionary and
    the deletion index are then STALE and every consumer must fall back
    to the live (term, df) projection — delta-only terms stay visible
    (no silent recall loss) — until the publishers re-run."""
    from yase_spark.catalog import Catalog
    from yase_spark.config import IndexConfig
    from yase_spark.expand import (
        TermExpander,
        build_term_dictionary,
        dictionary_is_fresh,
    )
    from yase_spark.index import IndexBuilder, build_index
    from yase_spark.suggest import deletions_are_fresh

    root = str(tmp_path / "ix")
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, hot_term_df=10**9)

    def corp(rows):
        return spark.createDataFrame(
            [("r", p, "h", "py", t) for p, t in rows],
            "repo string, path string, commit string, lang string, content string",
        )

    build_index(spark, corp([("a", "spark merge table"), ("b", "spark hash")]), root, cfg)
    build_term_dictionary(spark, root)
    build_deletion_index(spark, root)
    cat = Catalog(root)
    assert dictionary_is_fresh(cat) and deletions_are_fresh(cat)

    # delta introduces a brand-new term 'zzyzx'
    b = IndexBuilder(spark, root, cfg)
    b.append(corp([("c", "zzyzx merge")]))
    assert not dictionary_is_fresh(cat)
    assert not deletions_are_fresh(cat)

    # expander fallback sees the delta-only term
    ex = TermExpander(spark, root)
    assert "zzyzx" in ex.prefix("zz")
    # spell fallback suggests the delta-only term (distance 1)
    got = spell_suggest(spark, root, ["zzyzxx"], k=3).collect()
    assert [r["suggestion"] for r in got] == ["zzyzx"]
    # did_you_mean corrects toward it as well
    assert dict(did_you_mean(spark, root, ["zzyzxx"]))["zzyzxx"] == "zzyzx"

    # republish -> fresh again, fast path gives the identical answer
    build_deletion_index(spark, root)
    assert dictionary_is_fresh(cat) and deletions_are_fresh(cat)
    got2 = spell_suggest(spark, root, ["zzyzxx"], k=3).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, got2))


def test_significant_terms_vs_python(spark):
    from yase_spark.cooccur import significant_terms

    rows = [
        (i, ("der die das common " if i % 2 == 0 else "the a an common ")
            + f"w{i % 3}", "de" if i % 2 == 0 else "en")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = significant_terms(docs, "lang = 'de'", k=10, min_fg_df=2).collect()

    sets = {i: (set(_py_tok(t)), lang) for i, t, lang in rows}
    n, n_fg = len(rows), sum(1 for _, (_, l) in sets.items() if l == "de")
    exp = []
    for t in {w for s, _ in sets.values() for w in s}:
        fg = sum(1 for s, l in sets.values() if l == "de" and t in s)
        df = sum(1 for s, _ in sets.values() if t in s)
        fgr, bgr = fg / n_fg, df / n
        if fg >= 2 and fgr > bgr:
            exp.append((t, fg, df, round((fgr - bgr) * (fgr / bgr), 6)))
    exp.sort(key=lambda x: (-x[3], x[0]))
    assert [(r["term"], r["fg_df"], r["df"], r["score_r"]) for r in out] == exp[:10]
    # the German-only stopwords dominate; shared terms never appear
    top = {r["term"] for r in out[:3]}
    assert top <= {"der", "die", "das"}
    assert all(r["term"] != "common" for r in out)


def test_significant_text_equals_terms_on_same_foreground(spark):
    """significant_text (match-set foreground) must equal
    significant_terms (predicate foreground) when the id set is the
    same foreground — the JLH chain is shared, only the flag-attachment
    differs (left join vs predicate). Plus: a query-shaped foreground
    surfaces the query-co-occurring vocabulary."""
    from yase_spark.cooccur import significant_terms, significant_text

    rows = [
        (i, ("der die das common " if i % 2 == 0 else "the a an common ")
            + f"w{i % 3}", "de" if i % 2 == 0 else "en")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    fg = docs.filter("lang = 'de'").select("doc_id")
    via_text = significant_text(docs, fg, k=10, min_fg_df=2).collect()
    via_pred = significant_terms(docs, "lang = 'de'", k=10, min_fg_df=2).collect()
    assert [tuple(r) for r in via_text] == [tuple(r) for r in via_pred]
    # foreground ids not present in docs are harmless (left join)
    fg2 = fg.union(spark.createDataFrame([(10**9,)], "doc_id bigint"))
    via_text2 = significant_text(docs, fg2, k=10, min_fg_df=2).collect()
    assert [tuple(r) for r in via_text2] == [tuple(r) for r in via_pred]


def test_phrase_suggest_bigram_overrides_unigram(spark, tmp_path):
    """The phrase-LM point: 'cable' is the more frequent unigram
    correction for 'gable' (both at plain levenshtein 1), but 'data table' is what the corpus says —
    the Stupid-Backoff bigram score must rank 'data table' first. Also:
    exact match against an independent pure-Python recompute, unknown
    tokens give no rows, over-cap lattice raises."""
    import itertools
    import math
    import re

    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.suggest import build_deletion_index, phrase_suggest

    texts = (
        ["data table join"] * 6
        + ["cable news", "cable car", "cable tv", "cable cut",
           "cable drum", "cable tie", "cable long", "cable short"]
        + ["data point"] * 3
    )
    root = str(tmp_path / "pix")
    corpus = spark.createDataFrame(
        [("r", f"{i:04d}", "h", "py", t) for i, t in enumerate(texts)],
        "repo string, path string, commit string, lang string, content string",
    )
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, hot_term_df=10**9)
    build_index(spark, corpus, root, cfg)
    build_deletion_index(spark, root)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )

    # sanity of the plant: cable strictly more frequent than table
    toks = [w for t in texts for w in re.split("[^a-z0-9]+", t.lower()) if w]
    assert toks.count("cable") > toks.count("table")

    got = phrase_suggest(spark, root, docs, "data gable", k=3, per_word=3)
    rows = [(r["rank"], r["phrase"], r["score_r"]) for r in got.collect()]
    assert rows and rows[0][1] == "data table"

    # independent recompute of the whole spec
    dic = _dict_terms(spark, root)
    def cands(word, pw=3):
        c = [(t, df) for t, df in dic.items()
             if _brute_lev(t, word) <= 1]
        c.sort(key=lambda x: (-x[1], x[0]))
        return [t for t, _ in c[:pw]]
    uni = {}
    for w in toks:
        uni[w] = uni.get(w, 0) + 1
    bi = {}
    for t in texts:
        ws = [w for w in re.split("[^a-z0-9]+", t.lower()) if w]
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n = len(toks)
    exp = []
    for p in itertools.product(cands("data"), cands("gable")):
        if any(uni.get(t, 0) == 0 for t in p):
            continue
        s = math.log10(uni[p[0]] / n)
        cb = bi.get((p[0], p[1]), 0)
        s += (math.log10(cb / uni[p[0]]) if cb > 0
              else math.log10(0.4 * uni[p[1]] / n))
        exp.append((" ".join(p), s))
    exp.sort(key=lambda x: (-x[1], x[0]))
    want = [(i + 1, ph, round(s, 6)) for i, (ph, s) in enumerate(exp[:3])]
    assert rows == want

    # published-LM lane: build the bigram/unigram sibling tables and
    # re-run — bitwise-identical output, corpus no longer scanned
    from yase_spark.catalog import Catalog
    from yase_spark.suggest import bigrams_are_fresh, build_bigram_table

    st = build_bigram_table(spark, root, docs)
    assert st["bigram_rows"] > 0 and st["n_tokens"] == len(toks)
    assert bigrams_are_fresh(Catalog(root))
    got2 = phrase_suggest(spark, root, docs.limit(0), "data gable",
                          k=3, per_word=3)
    rows2 = [(r["rank"], r["phrase"], r["score_r"]) for r in got2.collect()]
    assert rows2 == rows  # docs.limit(0): the table lane truly served

    # a token with no neighborhood anywhere -> no suggestion rows
    assert phrase_suggest(spark, root, docs, "zzqqxx table").count() == 0

    # over-cap lattice is a loud error, never a silent truncation
    with pytest.raises(ValueError, match="max_phrases"):
        phrase_suggest(spark, root, docs, "data gable", per_word=3,
                       max_phrases=1)


def _brute_lev(a, b):
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_suggest_modes(spark, sugg_ix):
    """ES term-suggester suggest_mode: missing drops in-vocabulary
    probes entirely; popular keeps only corrections with df strictly
    above the probe's own df; both replayed from the raw dictionary."""
    dic = _dict_terms(spark, sugg_ix)
    probes = ["spark", "spork", "tble", "zzz"]

    # --- missing: only OOV probes produce rows
    got = spell_suggest(
        spark, sugg_ix, probes, k=5, suggest_mode="missing"
    ).collect()
    words = {r["word"] for r in got}
    for w in probes:
        if w in dic:
            assert w not in words, f"{w} is in-vocabulary, must be dropped"
    by_word = {}
    for r in got:
        by_word.setdefault(r["word"], []).append(r)
    for w in [p for p in probes if p not in dic]:
        exp = _brute(dic, w)
        rows = sorted(by_word.get(w, []), key=lambda r: r["rank"])
        assert [(r["suggestion"], r["df"]) for r in rows] == exp

    # --- popular: df must strictly beat the probe's own df
    got = spell_suggest(
        spark, sugg_ix, probes, k=5, suggest_mode="popular"
    ).collect()
    by_word = {}
    for r in got:
        by_word.setdefault(r["word"], []).append(r)
    for w in probes:
        floor = dic.get(w, 0)
        exp = [(s, d) for s, d in _brute(dic, w) if d > floor]
        rows = sorted(by_word.get(w, []), key=lambda r: r["rank"])
        assert [(r["suggestion"], r["df"]) for r in rows] == exp, w
        assert [r["rank"] for r in rows] == list(range(1, len(exp) + 1))

    with pytest.raises(ValueError, match="suggest_mode"):
        spell_suggest(spark, sugg_ix, ["x"], suggest_mode="maybe")
