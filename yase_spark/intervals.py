"""ES/Lucene ``intervals`` query: minimal-interval semantics over the
positional sibling index.

The intervals query is ES's modern positional DSL (the successor to the
span family): a rule tree of

- ``{"match": {"query": str, "max_gaps": int, "ordered": bool}}`` —
  one interval per way the analyzed terms fit in a window; ``max_gaps``
  bounds the number of positions inside the interval NOT covered by the
  matched terms (``-1`` = unlimited; ``0, ordered`` = exact phrase),
- ``{"any_of": {"intervals": [rule, ...]}}`` — the union of the
  sub-rules' intervals (Lucene ``Intervals.or``),
- ``{"all_of": {"intervals": [rule, ...], "max_gaps": int,
  "ordered": bool}}`` — one interval per choice of NON-OVERLAPPING
  sub-intervals, in rule order when ``ordered``; the combined
  ``max_gaps`` counts the positions between/around the chosen
  sub-intervals (combined width minus the sum of sub-widths).

Semantics notes (the deterministic contract this engine implements):

* Matching is doc-level: a document matches when AT LEAST ONE interval
  satisfies the root rule. Clarke & Cormack's minimal-interval algebra
  (GC-lists) underpins Lucene's implementation: every node emits only
  MINIMAL intervals (none weakly containing another), and parents
  compose over those. Minimality is semantics, not an optimization — a
  wide early leaf match must not shadow-relax a parent's gap
  constraint that the tight later match would fail (e.g. terms
  ``merge@0 table@1 table@5 hash@6``: ordered ``table hash`` has
  minimal interval (5,6) only; an all_of ``[merge, table hash]`` with
  ``max_gaps=0`` must NOT match via the non-minimal (1,6)). Node
  contract, in order: enumerate candidate intervals, apply the node's
  own ``max_gaps`` filter (a combined extent passes when SOME choice
  with that extent passes), then prune to the minimal set.
* ``all_of`` enforces NON-overlapping sub-intervals in both modes —
  Lucene's ``UNORDERED_NO_OVERLAP`` for the unordered case. (ES's
  default unordered all_of permits overlap, but its gap arithmetic is
  then order-of-evaluation dependent; the no-overlap variant is the
  deterministic one, and is what Lucene itself recommends for
  relevance-carrying composition.)
* ``match`` terms analyze through the shared query analyzer
  (``analyze_phrase``) — one part per term, identical to the span
  family's contract; a multi-part identifier is rejected loudly.
  Unordered ``match``/nested duplicate terms are rejected like
  ``span_near`` (distinct-occurrence semantics are not implemented).

Scale shape: candidate documents come from the rule tree's doc-set
algebra over the terms' postings (intersection under match/all_of,
union under any_of) — ONE batched, bucket-pruned positional fetch for
all leaf terms, then per-candidate-document interval evaluation in
numpy at the driver. This is the Lucene spans-enumeration cost shape
(cost ∝ postings of the involved terms, never a corpus scan) and the
same serving-lane story as ``span_near_docs``; combination fan-out per
document is capped loudly (``_COMBO_CAP``).
"""

from __future__ import annotations

import numpy as np

from .tokenize import analyze_phrase

_COMBO_CAP = 500_000  # per-doc all_of choice cross-product, loud cap


# --------------------------------------------------------------- AST


def _norm(rule) -> tuple:
    """Normalize an ES-shaped rule dict into an internal tuple tree:
    ("match", parts, max_gaps, ordered) | ("any_of", [sub]) |
    ("all_of", [sub], max_gaps, ordered). Validates loudly."""
    if not isinstance(rule, dict) or len(rule) != 1:
        raise ValueError(f"intervals rule must be a one-key dict, got {rule!r}")
    kind, body = next(iter(rule.items()))
    if kind == "match":
        q = body.get("query")
        if not q or not isinstance(q, str):
            raise ValueError("match needs a non-empty 'query' string")
        max_gaps = int(body.get("max_gaps", -1))
        ordered = bool(body.get("ordered", False))
        parts: list[str] = []
        for tok in q.split():
            ps = analyze_phrase(tok)
            if len(ps) != 1:
                raise ValueError(
                    f"match term {tok!r} analyzes to {ps} — intervals "
                    "match takes single-part terms (split multi-part "
                    "identifiers into separate terms)"
                )
            parts.append(ps[0])
        if max_gaps < -1:
            raise ValueError("max_gaps must be >= -1")
        if not ordered and len(set(parts)) != len(parts):
            raise ValueError(
                f"unordered match requires distinct terms (got {parts}); "
                "duplicate-term distinct-occurrence semantics are not "
                "implemented (same contract as span_near)"
            )
        return ("match", parts, max_gaps, ordered)
    if kind == "any_of":
        subs = [_norm(r) for r in body.get("intervals", [])]
        if not subs:
            raise ValueError("any_of needs >= 1 sub-rule")
        return ("any_of", subs)
    if kind == "all_of":
        subs = [_norm(r) for r in body.get("intervals", [])]
        if not 2 <= len(subs) <= 4:
            raise ValueError(
                "all_of takes 2-4 sub-rules (per-doc choice enumeration "
                "is the cost driver; nest all_of rules for deeper trees)"
            )
        max_gaps = int(body.get("max_gaps", -1))
        if max_gaps < -1:
            raise ValueError("max_gaps must be >= -1")
        return ("all_of", subs, max_gaps, bool(body.get("ordered", False)))
    raise ValueError(f"unknown intervals rule kind {kind!r}")


def _leaf_terms(tree) -> list[str]:
    if tree[0] == "match":
        return list(tree[1])
    subs = tree[1]
    return [t for s in subs for t in _leaf_terms(s)]


def _cand_docs(tree, got) -> np.ndarray:
    """Doc-set algebra over postings: the candidate superset of docs
    that can possibly match the rule."""
    if tree[0] == "match":
        arrs = []
        for t in dict.fromkeys(tree[1]):
            pp = got[t]
            if pp is None:
                return np.empty(0, dtype=np.int64)
            arrs.append(pp.doc_ids)
        arrs.sort(key=lambda a: a.size)
        out = arrs[0]
        for a in arrs[1:]:
            out = np.intersect1d(out, a, assume_unique=True)
            if out.size == 0:
                break
        return out
    if tree[0] == "any_of":
        out = np.empty(0, dtype=np.int64)
        for s in tree[1]:
            out = np.union1d(out, _cand_docs(s, got))
        return out
    subs = sorted((_cand_docs(s, got) for s in tree[1]), key=lambda a: a.size)
    out = subs[0]
    for a in subs[1:]:
        out = np.intersect1d(out, a, assume_unique=True)
        if out.size == 0:
            break
    return out


# -------------------------------------------- per-doc interval algebra

_EMPTY = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))


def _minimal(s: np.ndarray, e: np.ndarray):
    """Prune to the minimal-interval set: drop any interval that
    (weakly) contains another. Lucene's interval iterators only ever
    emit minimal intervals, and composition over minimal intervals is
    what gives the algebra its semantics — a wide early match must NOT
    shadow-relax a parent's gap constraint that the tight later match
    would fail (see module docstring). Dedup + two sorted passes."""
    if s.size <= 1:
        return s, e
    order = np.lexsort((e, s))
    s, e = s[order], e[order]
    first = np.concatenate(([True], s[1:] != s[:-1]))
    s, e = s[first], e[first]  # same start: keep smallest end
    if s.size == 1:
        return s, e
    # starts strictly increasing: (s_i, e_i) contains a later interval
    # iff some e_j <= e_i for j > i
    min_later = np.minimum.accumulate(e[::-1])[::-1]
    keep = np.empty(s.size, dtype=bool)
    keep[-1] = True
    keep[:-1] = e[:-1] < min_later[1:]
    return s[keep], e[keep]


def _match_intervals(pos_lists, max_gaps, ordered):
    """Minimal intervals of one match leaf over a single document's
    per-term position arrays (each sorted ascending)."""
    n = len(pos_lists)
    if any(p is None or p.size == 0 for p in pos_lists):
        return _EMPTY
    if n == 1:
        p = pos_lists[0]
        return p, p
    if ordered:
        # greedy chain per start: for a fixed first-term occurrence the
        # smallest strictly-later occurrence of each next term yields
        # the minimal end (the match_ordered_window argument)
        start = pos_lists[0]
        cur = start
        for ks in pos_lists[1:]:
            if cur.size == 0:
                return _EMPTY
            idx = np.searchsorted(ks, cur, side="right")
            ok = idx < ks.size
            cur, start = ks[idx[ok]], start[ok]
        s, e = start, cur
    else:
        # minimal covers via the sliding two-pointer over the merged
        # (position, term-id) stream; l only moves right, so recorded
        # covers are mutually non-nested (all minimal)
        p = np.concatenate(pos_lists)
        t = np.concatenate(
            [np.full(pl.size, i, dtype=np.int64) for i, pl in enumerate(pos_lists)]
        )
        order = np.argsort(p, kind="stable")
        p, t = p[order], t[order]
        counts = np.zeros(n, dtype=np.int64)
        have, l = 0, 0
        ss, es = [], []
        for r in range(p.size):
            if counts[t[r]] == 0:
                have += 1
            counts[t[r]] += 1
            if have < n:
                continue
            while counts[t[l]] > 1:
                counts[t[l]] -= 1
                l += 1
            ss.append(p[l])
            es.append(p[r])
            counts[t[l]] -= 1
            have -= 1
            l += 1
        s = np.asarray(ss, dtype=np.int64)
        e = np.asarray(es, dtype=np.int64)
    if max_gaps >= 0:
        keep = (e - s + 1) - n <= max_gaps
        s, e = s[keep], e[keep]
    return _minimal(s, e)


def _union_intervals(parts):
    ss = np.concatenate([s for s, _ in parts])
    es = np.concatenate([e for _, e in parts])
    return _minimal(ss, es)


def _all_of_intervals(subs, max_gaps, ordered):
    """Combined intervals: one choice per sub-list, non-overlapping
    (in rule order when ordered); gaps = combined width - sum of
    sub-widths. Full choice enumeration via meshgrid — per-candidate-
    document fan-out, capped loudly."""
    k = len(subs)
    sizes = [s[0].size for s in subs]
    if any(sz == 0 for sz in sizes):
        return _EMPTY
    total = 1
    for sz in sizes:
        total *= sz
    if total > _COMBO_CAP:
        raise ValueError(
            f"all_of choice fan-out {total} exceeds {_COMBO_CAP} in one "
            "document; tighten the sub-rules (add max_gaps) or reduce "
            "term frequency exposure"
        )
    grids = np.meshgrid(*[np.arange(sz) for sz in sizes], indexing="ij")
    st = np.stack([subs[i][0][grids[i].ravel()] for i in range(k)])
    en = np.stack([subs[i][1][grids[i].ravel()] for i in range(k)])
    if ordered:
        valid = np.ones(st.shape[1], dtype=bool)
        for i in range(k - 1):
            valid &= st[i + 1] > en[i]
    else:
        valid = np.ones(st.shape[1], dtype=bool)
        for i in range(k):
            for j in range(i + 1, k):
                valid &= (st[j] > en[i]) | (st[i] > en[j])
    cs = st.min(axis=0)
    ce = en.max(axis=0)
    if max_gaps >= 0:
        # a combined extent passes when SOME choice with that extent
        # passes — gaps = combined width minus the chosen sub-widths
        widths = (en - st + 1).sum(axis=0)
        valid &= (ce - cs + 1) - widths <= max_gaps
    return _minimal(cs[valid], ce[valid])


def _eval(tree, rank, per_term):
    if tree[0] == "match":
        _, parts, max_gaps, ordered = tree
        return _match_intervals(
            [per_term[t].get(rank) for t in parts], max_gaps, ordered
        )
    if tree[0] == "any_of":
        parts = [_eval(s, rank, per_term) for s in tree[1]]
        parts = [p for p in parts if p[0].size]
        if not parts:
            return _EMPTY
        return _union_intervals(parts)
    _, subs, max_gaps, ordered = tree
    evs = []
    for s in subs:
        ev = _eval(s, rank, per_term)
        if ev[0].size == 0:
            return _EMPTY
        evs.append(ev)
    return _all_of_intervals(evs, max_gaps, ordered)


def intervals_docs(reader, rule) -> np.ndarray:
    """Sorted doc ids with >= 1 interval matching ``rule`` (ES-shaped
    dict tree, see module docstring). ``reader`` is a PositionsReader
    (or anything with its ``fetch``)."""
    tree = _norm(rule)
    terms = list(dict.fromkeys(_leaf_terms(tree)))
    got = reader.fetch(terms)
    cand = _cand_docs(tree, got)
    if cand.size == 0:
        return cand
    # per-term, per-candidate-doc position arrays (rank-keyed)
    per_term: dict[str, dict[int, np.ndarray]] = {}
    for t in terms:
        pp = got[t]
        if pp is None:
            per_term[t] = {}
            continue
        mask = np.isin(pp.doc_ids, cand, assume_unique=True)
        ranks = np.searchsorted(cand, pp.doc_ids[mask])
        cnts = pp.counts[mask]
        pos = pp.pos[np.repeat(mask, pp.counts)]
        splits = np.split(pos, np.cumsum(cnts)[:-1]) if cnts.size else []
        per_term[t] = dict(zip(ranks.tolist(), splits))
    hits = [
        int(cand[r])
        for r in range(cand.size)
        if _eval(tree, r, per_term)[0].size
    ]
    return np.asarray(hits, dtype=np.int64)
