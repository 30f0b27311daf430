"""Positional sibling index + phrase/proximity queries (positions.py).

Gates:
* engine phrase/proximity results == a brute-force pure-Python oracle
  (all position combinations, no greedy) on the synthetic corpus;
* greedy window matcher == brute force on randomized position lists;
* tombstoned docs stop matching immediately; after apply_deletes the
  positional index is rewritten (renumbered) and phrase results equal a
  fresh build over the remaining corpus;
* incremental build after append covers the delta (and the reader
  refuses to serve from a stale positional index);
* parallelism invariance: position payloads are identical at different
  shuffle widths.
"""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder, build_index
from yase_spark.positions import build_positions, match_ordered_window
from yase_spark.query import IndexReader
from yase_spark.tokenize import _ident, analyze_phrase, split_parts


def parts_stream(text):
    out = []
    for ident in _ident.findall(text):
        out.extend(split_parts(ident))
    return out


def brute_phrase(docs: dict, query: str, slop: int = 0) -> list[int]:
    """All-combinations oracle: doc matches iff ANY strictly-increasing
    position tuple of the query parts has span <= (n-1)+slop."""
    qp = analyze_phrase(query)
    hits = []
    for d, text in docs.items():
        pos = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        if any(t not in pos for t in qp):
            continue
        if len(qp) == 1:
            hits.append(d)
            continue
        found = False
        for combo in itertools.product(*(pos[t] for t in qp)):
            if all(b > a for a, b in zip(combo, combo[1:])) and (
                combo[-1] - combo[0] <= len(qp) - 1 + slop
            ):
                found = True
                break
        if found:
            hits.append(d)
    return sorted(hits)


# pos_index / doc_texts are session-scoped fixtures in conftest.py
# (shared with test_highlight.py — build_positions is incremental, so
# a per-module rebuild on the shared root would be a noop).

PHRASES = [
    ("get page", 0),
    ("copy zone lock", 0),
    ("sync list", 0),
    ("getPage", 0),          # multi-part identifier as a phrase
    ("json exec", 1),
    ("get zone", 2),
    ("count utc infer", 0),
    ("nosuchtoken page", 0),  # absent part -> empty
]


def test_phrase_matches_brute_force(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    nonzero = 0
    for q, slop in PHRASES:
        eng = rd.phrase(q, slop=slop).tolist()
        ref = brute_phrase(doc_texts, q, slop=slop)
        assert eng == ref, (q, slop)
        nonzero += bool(eng)
    assert nonzero >= 5  # the gate exercises real matches, not misses


def test_phrase_topk_scores_bitwise(spark, pos_index, doc_texts):
    """phrase_topk == restrict-then-score: the phrase filter selects,
    BM25 over the unique parts ranks; scores must equal topk()'s scorer
    bitwise for docs in both (same fixed summation order)."""
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    got = rd.phrase_topk("get page", k=10)
    assert len(got) == 10
    full = {d: s for _, d, s in rd.topk("get page", k=10**6)}
    for _, d, s in got:
        assert s == full[d]  # bitwise
    # ranked subset of the phrase match set
    matched = set(rd.phrase("get page").tolist())
    assert {d for _, d, _ in got} <= matched


def test_chunked_rows_exist(spark, pos_index):
    """pos_row_docs=256 over 1000 docs forces multi-row terms; the
    reader's shard-ordered concat must still be doc-ordered (implied by
    the brute-force gate, asserted structurally here)."""
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    segs = rd.cat.read(spark, "pos_segments")
    multi = segs.groupBy("term").count().filter(F.col("count") > 1).count()
    assert multi > 0
    pp = rd._positions().fetch(["page"])["page"]
    assert np.all(np.diff(pp.doc_ids) > 0)
    assert pp.counts.sum() == pp.pos.size


def test_greedy_window_equals_brute_force():
    rng = np.random.default_rng(7)
    for trial in range(200):
        n_terms = int(rng.integers(2, 5))
        slop = int(rng.integers(0, 4))
        # one synthetic doc per trial, dense positions
        lists = []
        for _ in range(n_terms):
            k = int(rng.integers(1, 6))
            lists.append(np.unique(rng.integers(0, 20, size=k)).astype(np.int64))
        # brute force
        found = False
        for combo in itertools.product(*lists):
            if all(b > a for a, b in zip(combo, combo[1:])) and (
                combo[-1] - combo[0] <= n_terms - 1 + slop
            ):
                found = True
                break
        got = match_ordered_window([x.copy() for x in lists], slop)
        assert (got.size > 0) == found, (trial, lists, slop)


def test_phrase_respects_tombstones(spark, tiny_corpus, tmp_path):
    root = str(tmp_path / "ix")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    sub = tiny_corpus.limit(200)
    build_index(spark, sub, root, cfg)
    build_positions(spark, root, sub, cfg)
    rd = IndexReader(spark, root, cfg)
    before = rd.phrase("get page")
    assert before.size > 0
    victim = int(before[0])
    IndexBuilder(spark, root, cfg).delete(doc_ids=[victim])
    rd2 = IndexReader(spark, root, cfg)
    after = rd2.phrase("get page")
    assert victim not in after.tolist()
    assert sorted(after.tolist() + [victim]) == before.tolist()


@pytest.mark.slow
def test_compaction_rewrites_positions(spark, tiny_corpus, tmp_path):
    """delete + apply_deletes -> phrase results bitwise-equal a fresh
    build over the remaining corpus (matched by natural key)."""
    root = str(tmp_path / "ix")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    sub = tiny_corpus.limit(300).persist()
    build_index(spark, sub, root, cfg)
    build_positions(spark, root, sub, cfg)
    b = IndexBuilder(spark, root, cfg)
    b.delete(predicate="pmod(doc_id, 5) = 2")
    b.apply_deletes()
    rd = IndexReader(spark, root, cfg)

    # fresh build over the remaining corpus
    root2 = str(tmp_path / "ix2")
    kept = (
        rd.cat.read(spark, "docs").select("repo", "path", "commit")
        .join(sub, ["repo", "path", "commit"])
        .select("repo", "path", "commit", "lang", "content")
        .persist()
    )
    build_index(spark, kept, root2, cfg)
    build_positions(spark, root2, kept, cfg)
    rd2 = IndexReader(spark, root2, cfg)

    for q, slop in [("get page", 0), ("json exec", 1), ("copy zone lock", 0)]:
        a = rd.phrase(q, slop=slop).tolist()
        bq = rd2.phrase(q, slop=slop).tolist()
        assert a == bq, q
    ta = rd.phrase_topk("get page", k=10)
    tb = rd2.phrase_topk("get page", k=10)
    assert ta == tb  # bitwise scores, identical renumbered ids
    sub.unpersist()
    kept.unpersist()


@pytest.mark.slow
def test_incremental_positions_after_append(spark, tiny_corpus, tmp_path):
    root = str(tmp_path / "ix")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    full = tiny_corpus.limit(300).persist()
    even = F.pmod(F.xxhash64("path"), F.lit(2)) == 0
    build_index(spark, full.filter(even), root, cfg)
    build_positions(spark, root, full.filter(even), cfg)
    b = IndexBuilder(spark, root, cfg)
    b.append(full.filter(~even))

    # stale reader must refuse (docs changed since the positions build)
    with pytest.raises(ValueError, match="stale"):
        IndexReader(spark, root, cfg).phrase("get page")

    out = build_positions(spark, root, full, cfg)
    assert out["positions_docs"] > 0
    rd = IndexReader(spark, root, cfg)

    root2 = str(tmp_path / "ix2")
    build_index(spark, full, root2, cfg)
    build_positions(spark, root2, full, cfg)
    rd2 = IndexReader(spark, root2, cfg)
    for q, slop in [("get page", 0), ("json exec", 1)]:
        a = (
            rd.cat.read(spark, "docs")
            .join(
                spark.createDataFrame(
                    [(int(d),) for d in rd.phrase(q, slop=slop)], "doc_id long"
                ),
                "doc_id",
            )
            .select("repo", "path", "commit")
        )
        bq = (
            rd2.cat.read(spark, "docs")
            .join(
                spark.createDataFrame(
                    [(int(d),) for d in rd2.phrase(q, slop=slop)], "doc_id long"
                ),
                "doc_id",
            )
            .select("repo", "path", "commit")
        )
        assert a.exceptAll(bq).count() == 0 and bq.exceptAll(a).count() == 0, q
    full.unpersist()


def test_phrase_in_boolean_ast(spark, tiny_corpus, pos_index):
    """Phrase as a BooleanQuery clause: And/Or/Not compose with the
    positional match set, and TopK ranks it over the phrase PARTS +
    sibling terms (the PhraseQuery scoring contract)."""
    import numpy as np

    from yase_spark.query import And, IndexReader, Not, Or, Phrase, Term, TopK

    root, pcfg = pos_index
    rd = IndexReader(spark, root)
    ph = "json getPage"
    base = rd.phrase(ph)
    assert base.size > 0
    term_docs = rd.search(Term("value"))

    got_and = rd.search(And([Phrase(ph), Term("value")]))
    assert np.array_equal(
        got_and, np.intersect1d(base, term_docs, assume_unique=True)
    )
    got_or = rd.search(Or([Phrase(ph), Term("value")]))
    assert np.array_equal(got_or, np.union1d(base, term_docs))
    got_not = rd.search(And([Phrase(ph), Not(Term("value"))]))
    assert np.array_equal(
        got_not, base[~np.isin(base, term_docs, assume_unique=True)]
    )

    # TopK over the composed filter == rank_doc_set over the match set
    # with the DFS token order (phrase parts first, then the sibling)
    rows = rd.search_topk(TopK(And([Phrase(ph), Term("value")]), 5))
    from yase_spark.tokenize import analyze_phrase

    tokens = list(dict.fromkeys(analyze_phrase(ph) + ["value"]))
    manual = rd.rank_doc_set(got_and, "", 5, tokens=tokens)
    assert rows == manual

    # the corpus-sized lane rejects phrase leaves loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="Phrase"):
        rd.search_df(And([Phrase(ph), Term("value")]))


# ------------------------------------------------------------- span queries
def brute_span_near(docs: dict, terms, slop: int, in_order: bool) -> list[int]:
    """All-combinations oracle for span_near: one occurrence per clause,
    ordered (strictly increasing) or any arrangement, span
    max-min <= (n-1)+slop."""
    hits = []
    for d, text in docs.items():
        pos = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        if any(t not in pos for t in terms):
            continue
        found = False
        for combo in itertools.product(*(pos[t] for t in terms)):
            if in_order and not all(b > a for a, b in zip(combo, combo[1:])):
                continue
            if max(combo) - min(combo) <= len(terms) - 1 + slop:
                found = True
                break
        if found:
            hits.append(d)
    return sorted(hits)


SPANS = [
    (["get", "page"], 0, False),
    (["page", "get"], 0, False),          # clause order must not matter
    (["json", "exec"], 2, False),
    (["copy", "zone", "lock"], 1, False),
    (["get", "zone"], 2, True),           # ordered == the phrase path
    (["count", "utc", "infer"], 3, False),
    (["nosuchtoken", "page"], 0, False),  # absent clause -> empty
]


def test_span_near_matches_brute_force(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    nonzero = 0
    for terms, slop, in_order in SPANS:
        eng = rd.span_near(terms, slop=slop, in_order=in_order).tolist()
        ref = brute_span_near(doc_texts, terms, slop, in_order)
        assert eng == ref, (terms, slop, in_order)
        nonzero += bool(eng)
    assert nonzero >= 5


def brute_span_within(docs: dict, little: str, big, slop: int) -> list[int]:
    """All-combinations oracle for span_within: a little occurrence p
    inside SOME legal big tuple (one occurrence per clause, span
    max-min <= (n-1)+slop, min <= p <= max)."""
    hits = []
    for d, text in docs.items():
        pos = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        if little not in pos or any(t not in pos for t in big):
            continue
        limit = len(big) - 1 + slop
        found = False
        for combo in itertools.product(*(pos[t] for t in big)):
            if max(combo) - min(combo) > limit:
                continue
            if any(min(combo) <= p <= max(combo) for p in pos[little]):
                found = True
                break
        if found:
            hits.append(d)
    return sorted(hits)


WITHINS = [
    ("zone", ["copy", "lock"], 2),
    ("page", ["get", "json"], 4),
    ("exec", ["json", "page"], 6),
    ("utc", ["count", "infer"], 3),
    ("get", ["copy", "zone"], 5),
    ("nosuchtoken", ["get", "page"], 3),   # absent little -> empty
    ("page", ["get", "nosuchtoken"], 3),   # absent clause -> empty
]


def test_span_within_matches_brute_force(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    nonzero = 0
    for little, big, slop in WITHINS:
        eng = rd.span_within(little, big, slop=slop).tolist()
        ref = brute_span_within(doc_texts, little, big, slop)
        assert eng == ref, (little, big, slop)
        # span_containing is the same doc-level predicate, flipped args
        assert rd.span_containing(big, little, slop=slop).tolist() == ref
        nonzero += bool(eng)
    assert nonzero >= 4
    # within implies the big span matches at all
    for little, big, slop in WITHINS[:3]:
        w = set(rd.span_within(little, big, slop=slop).tolist())
        near = set(rd.span_near(big, slop=slop).tolist())
        assert w <= near, (little, big)


def test_span_within_wide_tuple_not_missed(spark, tiny_corpus, tmp_path):
    """The minimal-cover-only trap: the narrowest big tuple ending at
    each anchor misses the little, but a wider still-legal tuple
    contains it — 'wa ... little ... wa wb': tuple (wa@0, wb@4) spans
    the little@2 while the narrowest cover (wa@3, wb@4) does not."""
    from yase_spark.positions import build_positions

    df = tiny_corpus.limit(1).select(
        F.lit("r").alias("repo"), F.lit("p").alias("path"),
        F.lit("c").alias("commit"), F.lit("py").alias("lang"),
        F.lit("spanwa filler spanlit spanwa spanwb").alias("content"),
    )
    root = str(tmp_path / "withinidx")
    cfg = IndexConfig(block_size=16)
    build_index(spark, df, root, cfg)
    build_positions(spark, root, df, cfg)
    rd = IndexReader(spark, root, cfg)
    # slop 3: limit = 1 + 3 = 4 >= span(0,4); the wide tuple is legal
    assert rd.span_within("spanlit", ["spanwa", "spanwb"], slop=3).size == 1
    # slop 0: only the narrow tuple (3,4) is legal; little@2 outside
    assert rd.span_within("spanlit", ["spanwa", "spanwb"], slop=0).size == 0
    # little ON the boundary counts (min <= p <= max)
    assert rd.span_within("spanwb", ["spanwa", "spanwb"], slop=0).size == 1


def test_span_near_unordered_vs_ordered(spark, pos_index, doc_texts):
    """Unordered is clause-order-invariant and a superset of ordered;
    on this corpus the containment is STRICT for a common pair (some doc
    matches only in reverse order) — the semantics actually differ."""
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    a = rd.span_near(["json", "exec"], slop=1).tolist()
    b = rd.span_near(["exec", "json"], slop=1).tolist()
    assert a == b
    ordered = set(rd.span_near(["json", "exec"], slop=1, in_order=True).tolist())
    assert ordered <= set(a)
    assert ordered < set(a), "corpus should contain a reverse-order-only hit"


def test_span_near_slop_boundary(spark, tiny_corpus, tmp_path):
    """Deterministic boundary doc: 'alpha x beta' — unordered
    (beta, alpha) needs slop >= 2 at distance 2 (limit = 1 + slop)."""
    from pyspark.sql import Row

    from yase_spark.positions import build_positions

    df = tiny_corpus.limit(1).select(
        F.lit("r").alias("repo"), F.lit("p").alias("path"),
        F.lit("c").alias("commit"), F.lit("py").alias("lang"),
        F.lit("spanalpha filler spanbeta").alias("content"),
    )
    root = str(tmp_path / "spanidx")
    cfg = IndexConfig(block_size=16)
    build_index(spark, df, root, cfg)
    build_positions(spark, root, df, cfg)
    rd = IndexReader(spark, root, cfg)
    assert rd.span_near(["spanbeta", "spanalpha"], slop=0).size == 0
    assert rd.span_near(["spanbeta", "spanalpha"], slop=1).size == 1
    # ordered in the written order needs the same slop; reversed never
    assert rd.span_near(["spanalpha", "spanbeta"], slop=1, in_order=True).size == 1
    assert rd.span_near(["spanbeta", "spanalpha"], slop=9, in_order=True).size == 0
    # span_first: 0-based position < end
    assert rd.span_first("spanbeta", 2).size == 0
    assert rd.span_first("spanbeta", 3).size == 1
    assert rd.span_first("spanalpha", 1).size == 1


def test_span_first_matches_brute_force(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    nonzero = 0
    for term, end in [("get", 1), ("page", 5), ("zone", 30), ("json", 2)]:
        eng = rd.span_first(term, end).tolist()
        ref = sorted(
            d for d, text in doc_texts.items()
            if any(p < end for p, t in enumerate(parts_stream(text)) if t == term)
        )
        assert eng == ref, (term, end)
        nonzero += bool(eng)
    assert nonzero >= 2


def test_span_rejects_bad_clauses(spark, pos_index):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    with pytest.raises(ValueError, match="single-term"):
        rd.span_near(["getUserName", "page"])
    with pytest.raises(ValueError, match="distinct"):
        rd.span_near(["get", "get"])
    with pytest.raises(ValueError, match="single-term"):
        rd.span_first("get page", 3)
    # duplicates ARE legal ordered (strictly-increasing chain)
    assert rd.span_near(["get", "get"], slop=5, in_order=True).size >= 0


def test_positions_repair_after_props_crash(spark, tiny_corpus, tmp_path, monkeypatch):
    """A crash BETWEEN the pos_segments commit (durable, tag carries
    max_doc) and the props update leaves positions_state behind the
    committed high-water mark. The next build_positions must repair
    from the tags and NO-OP — never re-append covered docs."""
    from yase_spark.catalog import Catalog

    root = str(tmp_path / "ix")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    full = tiny_corpus.limit(200).persist()
    even = F.pmod(F.xxhash64("path"), F.lit(2)) == 0
    build_index(spark, full.filter(even), root, cfg)
    build_positions(spark, root, full.filter(even), cfg)
    b = IndexBuilder(spark, root, cfg)
    b.append(full.filter(~even))
    covered0 = int(Catalog(root).get_properties()["positions_state"]["max_doc"])

    real = Catalog.set_properties
    tripped = []

    def boom(self, props):
        st = props.get("positions_state")
        if st and int(st["max_doc"]) > covered0 and not tripped:
            tripped.append(1)
            raise RuntimeError("simulated crash before props update")
        return real(self, props)

    monkeypatch.setattr(Catalog, "set_properties", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        build_positions(spark, root, full, cfg)
    assert tripped  # the extension DID commit data before "crashing"

    out = build_positions(spark, root, full, cfg)  # replay
    assert out.get("noop") is True

    # repaired state serves, and postings are NOT duplicated: the total
    # (term, doc) pair count matches a fresh single-shot sibling build
    root2 = str(tmp_path / "ix2")
    build_index(spark, full, root2, cfg)
    build_positions(spark, root2, full, cfg)
    cat, cat2 = Catalog(root), Catalog(root2)
    n_a = cat.read(spark, "pos_segments").agg(F.sum("df")).collect()[0][0]
    n_b = cat2.read(spark, "pos_segments").agg(F.sum("df")).collect()[0][0]
    assert n_a == n_b
    rd, rd2 = IndexReader(spark, root, cfg), IndexReader(spark, root2, cfg)
    key = {r["doc_id"]: r["path"] for r in cat.read(spark, "docs").collect()}
    key2 = {r["doc_id"]: r["path"] for r in cat2.read(spark, "docs").collect()}
    for q in ("get page", "json exec"):
        a = sorted(key[int(d)] for d in rd.phrase(q))
        want = sorted(key2[int(d)] for d in rd2.phrase(q))
        assert a == want, q
    full.unpersist()


# ---------------------------------------------------------------- phrase_prefix

def _prefix_variants(doc_texts, prefix):
    """(variant -> df) for every corpus token extending ``prefix``."""
    df: dict = {}
    for text in doc_texts.values():
        for t in set(parts_stream(text)):
            if t.startswith(prefix):
                df[t] = df.get(t, 0) + 1
    return df


def test_phrase_prefix_matches_brute_force(spark, pos_index, doc_texts):
    rd = IndexReader(spark, root_cfg := pos_index[0], pos_index[1])
    nonzero = 0
    for q, prefix in [("get pa", "pa"), ("sync li", "li"), ("json ex", "ex")]:
        variants = _prefix_variants(doc_texts, prefix)
        ref = sorted(
            {d for v in variants for d in brute_phrase(doc_texts, f"{q.rsplit(' ', 1)[0]} {v}")}
        )
        eng = rd.phrase_prefix(q, max_expansions=10_000).tolist()
        assert eng == ref, q
        nonzero += bool(eng)
    assert nonzero >= 2


def test_phrase_prefix_cap_is_df_ranked(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    variants = _prefix_variants(doc_texts, "pa")
    assert len(variants) >= 2  # the cap must actually bite
    top = sorted(variants.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    eng = rd.phrase_prefix("get pa", max_expansions=1).tolist()
    assert eng == brute_phrase(doc_texts, f"get {top}")


def test_phrase_prefix_no_variant_is_empty(spark, pos_index):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    assert rd.phrase_prefix("get zzzzzz").size == 0


def test_phrase_prefix_single_token_is_prefix_match(spark, pos_index, doc_texts):
    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    variants = _prefix_variants(doc_texts, "pa")
    ref = sorted(
        {
            d
            for d, text in doc_texts.items()
            if any(t.startswith("pa") for t in parts_stream(text))
        }
    )
    assert rd.phrase_prefix("pa", max_expansions=10_000).tolist() == ref


# ----------------------------------------------------- span_not / span_or

def brute_span_not(docs: dict, include, excludes, pre, post) -> list[int]:
    hits = []
    for d, text in docs.items():
        pos: dict = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        inc = pos.get(include, [])
        exc = sorted(p for e in excludes for p in pos.get(e, []))
        if any(
            not any(p - pre <= q <= p + post for q in exc) for p in inc
        ):
            hits.append(d)
    return sorted(hits)


def test_span_not_matches_brute_force(spark, pos_index, doc_texts):
    rd = IndexReader(spark, pos_index[0], pos_index[1])
    cases = [
        ("get", ["page"], 0, 1),   # get NOT immediately followed by page
        ("get", ["page"], 1, 1),
        ("json", ["exec", "page"], 1, 1),  # span_or exclusion
        ("page", ["nosuchtoken"], 2, 2),   # absent exclude -> all get docs
        ("zone", ["zone"], 0, 0),  # self-exclusion at pre=post=0 kills all
    ]
    nonzero = 0
    for inc, exc, pre, post in cases:
        eng = rd.span_not(inc, exc, pre=pre, post=post).tolist()
        ref = brute_span_not(doc_texts, inc, exc, pre, post)
        assert eng == ref, (inc, exc, pre, post)
        nonzero += bool(eng)
    assert nonzero >= 3
    # pre=post=0 never excludes DISTINCT positions (unit spans)
    assert rd.span_not("get", ["page"], 0, 0).tolist() == sorted(
        {d for d, t in doc_texts.items() if "get" in parts_stream(t)}
    )


def brute_span_near_or(docs, clauses, slop) -> list[int]:
    hits = []
    for d, text in docs.items():
        pos: dict = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        alt_pos = [
            sorted(p for a in cl for p in pos.get(a, [])) for cl in clauses
        ]
        if any(not ps for ps in alt_pos):
            continue
        if any(
            max(c) - min(c) <= len(clauses) - 1 + slop
            for c in itertools.product(*alt_pos)
        ):
            hits.append(d)
    return sorted(hits)


def test_span_near_with_span_or_clause(spark, pos_index, doc_texts):
    rd = IndexReader(spark, pos_index[0], pos_index[1])
    cases = [
        ([["get", "set"], ["page"]], 1),
        ([["json"], ["exec", "lock"]], 2),
        ([["copy", "merge"], ["zone"], ["lock"]], 2),
    ]
    nonzero = 0
    for clauses, slop in cases:
        eng = rd.span_near(clauses, slop=slop).tolist()
        ref = brute_span_near_or(doc_texts, clauses, slop)
        assert eng == ref, (clauses, slop)
        nonzero += bool(eng)
    assert nonzero >= 2
    # single-alt clauses must equal the plain path
    plain = rd.span_near(["get", "page"], slop=1).tolist()
    assert rd.span_near([["get"], ["page"]], slop=1).tolist() == plain
    import pytest as _pt

    with _pt.raises(ValueError, match="unordered-only"):
        rd.span_near([["get", "set"], ["page"]], slop=1, in_order=True)
    with _pt.raises(ValueError, match="distinct"):
        rd.span_near([["get", "page"], ["page"]], slop=1)
