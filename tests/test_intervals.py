"""Intervals query gates (yase_spark/intervals.py).

The reference oracle is a from-scratch itertools enumeration over the
documents' parts streams — every choice of one occurrence per term /
one interval per sub-rule is tried (no greedy chaining), then each
node's contract is applied literally: max_gaps filter, then prune to
the minimal-interval set (Lucene emits only minimal intervals; a wide
early match must not shadow-relax a parent's gap constraint — see the
module docstring and test_minimality_is_semantics below).
"""

import itertools

import numpy as np
import pytest

from yase_spark.intervals import _norm, intervals_docs
from yase_spark.query import IndexReader
from yase_spark.tokenize import analyze_phrase

from tests.test_positions import parts_stream


# ------------------------------------------------- brute-force reference


def _prune_minimal(ivs: set) -> list[tuple[int, int]]:
    """Drop intervals that weakly contain another (quadratic, fine for
    a reference)."""
    out = [
        a
        for a in ivs
        if not any(
            b != a and b[0] >= a[0] and b[1] <= a[1] for b in ivs
        )
    ]
    return sorted(out)


def _ref_intervals(pos: dict, tree) -> list[tuple[int, int]]:
    """Minimal intervals of a normalized rule tree over one document's
    term->positions dict: enumerate all choices, gaps-filter, prune."""
    if tree[0] == "match":
        _, parts, max_gaps, ordered = tree
        lists = [pos.get(t, []) for t in parts]
        if any(not l for l in lists):
            return []
        out = []
        for combo in itertools.product(*lists):
            if ordered:
                if not all(b > a for a, b in zip(combo, combo[1:])):
                    continue
            else:
                if len(set(combo)) != len(combo):
                    continue
            s, e = min(combo), max(combo)
            if max_gaps >= 0 and (e - s + 1) - len(parts) > max_gaps:
                continue
            out.append((s, e))
        return _prune_minimal(set(out))
    if tree[0] == "any_of":
        out = set()
        for sub in tree[1]:
            out.update(_ref_intervals(pos, sub))
        return _prune_minimal(out)
    _, subs, max_gaps, ordered = tree
    lists = [_ref_intervals(pos, s) for s in subs]
    if any(not l for l in lists):
        return []
    out = set()
    for combo in itertools.product(*lists):
        if ordered:
            if not all(n[0] > p[1] for p, n in zip(combo, combo[1:])):
                continue
        else:
            ok = True
            for i in range(len(combo)):
                for j in range(i + 1, len(combo)):
                    a, b = combo[i], combo[j]
                    if not (b[0] > a[1] or a[0] > b[1]):
                        ok = False
            if not ok:
                continue
        cs = min(c[0] for c in combo)
        ce = max(c[1] for c in combo)
        if max_gaps >= 0:
            width_sum = sum(c[1] - c[0] + 1 for c in combo)
            if (ce - cs + 1) - width_sum > max_gaps:
                continue
        out.add((cs, ce))
    return _prune_minimal(out)


def _ref_docs(doc_texts: dict, rule) -> list[int]:
    tree = _norm(rule)
    hits = []
    for d, text in doc_texts.items():
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(parts_stream(text)):
            pos.setdefault(t, []).append(i)
        if _ref_intervals(pos, tree):
            hits.append(d)
    return sorted(hits)


@pytest.fixture(scope="module")
def rd(spark, pos_index):
    root, cfg = pos_index
    return IndexReader(spark, root, cfg)


RULES = [
    # exact phrase == ordered max_gaps=0 ("get page" is adjacent in
    # the synth vocab, same device as test_positions.py)
    {"match": {"query": "get page", "ordered": True, "max_gaps": 0}},
    # sloppy ordered
    {"match": {"query": "json exec", "ordered": True, "max_gaps": 3}},
    # unordered pair
    {"match": {"query": "get zone", "max_gaps": 2}},
    # unordered triple, unlimited gaps (co-occurrence)
    {"match": {"query": "copy zone lock"}},
    # any_of union
    {"any_of": {"intervals": [
        {"match": {"query": "get page", "ordered": True, "max_gaps": 0}},
        {"match": {"query": "sync"}},
    ]}},
    # ordered all_of over a phrase-ish leaf and a term leaf
    {"all_of": {"ordered": True, "max_gaps": 4, "intervals": [
        {"match": {"query": "get page", "ordered": True, "max_gaps": 1}},
        {"match": {"query": "json"}},
    ]}},
    # unordered all_of (no-overlap contract)
    {"all_of": {"max_gaps": 6, "intervals": [
        {"match": {"query": "get zone", "max_gaps": 2}},
        {"match": {"query": "list"}},
    ]}},
    # nested: all_of over an any_of
    {"all_of": {"ordered": True, "max_gaps": 8, "intervals": [
        {"any_of": {"intervals": [
            {"match": {"query": "json"}},
            {"match": {"query": "exec"}},
        ]}},
        {"match": {"query": "page"}},
    ]}},
]


@pytest.mark.parametrize("rule", RULES, ids=lambda r: next(iter(r)))
def test_intervals_matches_brute_force(rd, doc_texts, rule):
    got = rd.intervals(rule).tolist()
    want = _ref_docs(doc_texts, rule)
    assert got == want
    assert len(want) > 0, "rule must actually match on the fixture corpus"


def test_intervals_phrase_equivalence(rd, doc_texts):
    """ordered max_gaps=0 == the phrase lane (independent impls)."""
    got = rd.intervals(
        {"match": {"query": "get page", "ordered": True, "max_gaps": 0}}
    )
    want = rd._positions().phrase_docs("get page", slop=0)
    assert got.tolist() == want.tolist()


def test_intervals_unordered_match_equals_span_near(rd):
    """unordered match max_gaps=g == unordered span_near slop=g
    (gaps = span - (n-1) definitions line up for unit terms)."""
    got = rd.intervals({"match": {"query": "copy zone lock", "max_gaps": 2}})
    want = rd.span_near(["copy", "zone", "lock"], slop=2, in_order=False)
    assert got.tolist() == sorted(want.tolist())


def test_intervals_validation(rd):
    with pytest.raises(ValueError, match="one-key"):
        _norm({"match": {}, "any_of": {}})
    with pytest.raises(ValueError, match="single-part"):
        _norm({"match": {"query": "getUserName"}})
    with pytest.raises(ValueError, match="distinct"):
        _norm({"match": {"query": "get get"}})
    with pytest.raises(ValueError, match="2-4"):
        _norm({"all_of": {"intervals": [{"match": {"query": "get"}}]}})
    with pytest.raises(ValueError, match="max_gaps"):
        _norm({"match": {"query": "get", "max_gaps": -2}})
    with pytest.raises(ValueError, match="unknown"):
        _norm({"between": {}})
    # ordered duplicate terms ARE legal (strictly-increasing chain)
    t = _norm({"match": {"query": "get get", "ordered": True}})
    assert t[1] == ["get", "get"]


def test_intervals_empty_on_missing_term(rd):
    got = rd.intervals({"match": {"query": "zzzqx get", "max_gaps": 1}})
    assert got.size == 0
    # any_of shrugs off the dead branch
    got = rd.intervals({"any_of": {"intervals": [
        {"match": {"query": "zzzqx"}},
        {"match": {"query": "get"}},
    ]}})
    assert got.size > 0


def _eval_on_positions(pos: dict, rule):
    """Run the ENGINE's interval algebra directly on a handcrafted
    term->positions dict (no index needed)."""
    from yase_spark.intervals import _eval

    tree = _norm(rule)
    per_term = {
        t: {0: np.asarray(ps, dtype=np.int64)} for t, ps in pos.items()
    }
    for t in set(_flat_terms(tree)) - set(pos):
        per_term[t] = {}
    s, e = _eval(tree, 0, per_term)
    return sorted(zip(s.tolist(), e.tolist()))


def _flat_terms(tree):
    if tree[0] == "match":
        return list(tree[1])
    return [t for s in tree[1] for t in _flat_terms(s)]


def test_minimality_is_semantics():
    """The doc 'merge table ... table hash' (positions merge@0,
    table@1, table@5, hash@6): ordered 'table hash' has ONE minimal
    interval (5,6) — the wide greedy-from-1 candidate (1,6) contains
    it and must be pruned, so all_of([merge, table hash], ordered,
    max_gaps=0) must NOT match (gap merge->5 is 4), even though the
    non-minimal (1,6) would have gap 0. An engine keeping greedy
    supersets gets this wrong."""
    pos = {"merge": [0], "table": [1, 5], "hash": [6]}
    leaf = {"match": {"query": "table hash", "ordered": True, "max_gaps": 4}}
    assert _eval_on_positions(pos, leaf) == [(5, 6)]
    parent = {"all_of": {"ordered": True, "max_gaps": 0, "intervals": [
        {"match": {"query": "merge"}}, leaf,
    ]}}
    assert _eval_on_positions(pos, parent) == []
    relaxed = {"all_of": {"ordered": True, "max_gaps": 4, "intervals": [
        {"match": {"query": "merge"}}, leaf,
    ]}}
    assert _eval_on_positions(pos, relaxed) == [(0, 6)]


def test_algebra_randomized_vs_reference():
    """Engine algebra == the all-choices reference on randomized
    position layouts, across rule shapes — independent of any index."""
    rng = np.random.default_rng(17)
    rules = [
        {"match": {"query": "a b", "ordered": True, "max_gaps": 1}},
        {"match": {"query": "a b c", "max_gaps": 3}},
        {"any_of": {"intervals": [
            {"match": {"query": "a b", "ordered": True, "max_gaps": 0}},
            {"match": {"query": "c"}},
        ]}},
        {"all_of": {"ordered": True, "max_gaps": 2, "intervals": [
            {"match": {"query": "a"}},
            {"match": {"query": "b c", "max_gaps": 1}},
        ]}},
        {"all_of": {"max_gaps": 4, "intervals": [
            {"match": {"query": "a b", "ordered": True, "max_gaps": 2}},
            {"match": {"query": "c"}},
        ]}},
    ]
    for trial in range(60):
        n = int(rng.integers(3, 14))
        stream = rng.choice(["a", "b", "c", "x"], size=n)
        pos: dict[str, list[int]] = {}
        for i, t in enumerate(stream):
            pos.setdefault(str(t), []).append(i)
        for rule in rules:
            tree = _norm(rule)
            got = _eval_on_positions(pos, rule)
            want = _ref_intervals(pos, tree)
            assert got == want, (trial, rule, stream.tolist(), got, want)


def test_ordered_duplicate_terms_brute(rd, doc_texts):
    """two occurrences of the same term in order within a window —
    the greedy chain demands strictly-increasing positions."""
    rule = {"match": {"query": "get get", "ordered": True, "max_gaps": 4}}
    got = rd.intervals(rule).tolist()
    # reference: any strictly-increasing pair within span
    hits = []
    for d, text in doc_texts.items():
        ps = [i for i, t in enumerate(parts_stream(text)) if t == "get"]
        if any(
            b > a and (b - a + 1) - 2 <= 4
            for a, b in itertools.combinations(ps, 2)
        ):
            hits.append(d)
    assert got == sorted(hits)
    assert len(hits) > 0
