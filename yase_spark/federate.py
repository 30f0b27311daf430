"""Federated multi-shard ranked search with GLOBAL statistics — the
ES ``dfs_query_then_fetch`` contract (SURVEY.md §2.6 Q41).

The 1000-executor serving architecture IS this shape: the corpus is
sharded into independent indexes (by doc range, tenant, time, …), and a
query must rank ACROSS shards exactly as one big index would. Plain
query-then-fetch scores each shard with its LOCAL df/avgdl — a term
rare in one shard but common elsewhere gets inflated there, and merged
rankings disagree with the single-index truth. DFS mode fixes it with
two phases:

1. **DFS phase**: collect per-shard term dfs and (n_docs, total_tokens)
   — dictionary-sized per shard (the shared-registry df cache makes
   repeats free) — and combine into global idf / avgdl. Integer sums,
   so the globals are BITWISE the single-index values.
2. **Query phase**: every shard scores its own postings with the
   GLOBAL stats (same contribution expression, same analyzer-order
   summation), returns its local top-k, and the coordinator merges
   ≤ shards·k rows by (score DESC, natural key ASC).

Exactness: each doc lives in exactly one shard and its (tf, dl) are
shard-independent, so its score under global stats is bit-identical to
the single-index score; a doc in the global top-k ranks ≤ k within its
own shard under the same total order (shard-local tie-break = natural
key order = the global tie-break restricted to the shard), so the
per-shard top-k union is a superset of the global top-k.
"""

from __future__ import annotations

import dataclasses
import math

from pyspark.sql import functions as F

from .query import IndexReader, dense_topk
from .tokenize import analyze_query


def dfs_query_then_fetch(
    readers: list[IndexReader], query: str, k: int = 10
) -> list[tuple[int, str, str, str, float]]:
    """Exact global-stats ranked top-k across shard indexes. Returns
    ``(rank, repo, path, commit, score)`` rows — natural keys, because
    shard-local doc ids collide across shards by construction (each
    shard mints its own dense 1..n space).

    Scale shape: phase 1 moves O(q terms × shards) integers; phase 2 is
    each shard's ordinary eager/dense evaluation (every shard lane —
    pruned, sharded, block-selected — applies per shard unchanged since
    only idf/avgdl constants differ); the coordinator merges
    shards·k rows and hydrates k natural keys per shard via the
    k-row-isin docs join. Nothing corpus-sized anywhere."""
    if not readers:
        return []
    k1, b = readers[0].cfg.k1, readers[0].cfg.b
    for r in readers[1:]:
        if (r.cfg.k1, r.cfg.b) != (k1, b):
            raise ValueError("shards disagree on k1/b — rankings undefined")
    qterms = analyze_query(query)
    if not qterms or k <= 0:
        return []

    # ---- DFS phase: global collection statistics ----------------------
    shard_dfs = [r.term_dfs(qterms) for r in readers]
    g_df = {t: sum(int(d.get(t, 0)) for d in shard_dfs) for t in set(qterms)}
    g_n = sum(r.n_docs for r in readers)
    g_tok = sum(r._total_postings_upper for r in readers)
    g_avgdl = (g_tok / g_n) if g_n else 0.0

    # ---- query phase: per-shard top-k under the GLOBAL stats ----------
    merged: list[tuple[float, tuple[str, str, str]]] = []
    for r, sdfs in zip(readers, shard_dfs):
        # honor the shard's own driver-fetch cap (a df~10^11 term must
        # never be driver-fetched here either): over-cap shards serve
        # cluster-side through topk_sharded with the global scoring
        # stats overridden — same contribution expression, exact
        if sum(int(v) for v in sdfs.values()) > r.driver_fetch_max_postings:
            local = r.topk_sharded(
                query, k,
                stats_override=(g_n, g_avgdl, {t: g_df[t] for t in qterms}),
            )
        else:
            got = r.fetch_terms(qterms)
            tps = []
            for t in qterms:
                tp = got.get(t)
                if tp is None:
                    continue
                gidf = math.log(1.0 + (g_n - g_df[t] + 0.5) / (g_df[t] + 0.5))
                tps.append(dataclasses.replace(tp, idf=gidf))
            local = dense_topk(tps, k, k1, b, g_avgdl, r.n_docs)
        if not local:
            continue
        ids = [d for _rk, d, _s in local]
        keys = {
            row["doc_id"]: (row["repo"], row["path"], row["commit"])
            for row in r.cat.read(r.spark, "docs")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "repo", "path", "commit")
            .collect()
        }
        merged.extend((s, keys[d]) for _rk, d, s in local)

    merged.sort(key=lambda x: (-x[0], x[1]))
    return [
        (i + 1, key[0], key[1], key[2], s)
        for i, (s, key) in enumerate(merged[:k])
    ]


def federated_more_like_this(
    readers: list[IndexReader],
    text: str,
    k: int = 10,
    m: int = 25,
    exclude_key: tuple[str, str, str] | None = None,
    min_df: int = 1,
) -> list[tuple[int, str, str, str, float]]:
    """Cross-shard More-Like-This — exact vs the single-index operator.

    MLT has TWO places local statistics can leak, and both are fixed
    with the same DFS-phase trick as :func:`dfs_query_then_fetch`:

    1. **Term selection**: the Lucene interestingness ``tf * ln(N/df)``
       must use GLOBAL N and df, or a term common corpus-wide but rare
       in the seed's shard gets selected there and nowhere else — the
       shards would then rank against *different* term sets. One
       dictionary-sized ``term_dfs`` probe per shard (integer-additive)
       reproduces the single-index selection bit-for-bit.
    2. **Scoring**: the selected disjunction is ranked per shard under
       global idf/avgdl (same per-doc summation order = selection
       order), merged ≤ shards·(k+1) rows, seed excluded by natural key
       (shard-local doc ids collide across shards), top-k cut.

    Each shard fetches k+1 local hits so the merge stays a superset of
    the global top-k even after the seed — which lives in exactly one
    shard — is dropped. Returns (rank, repo, path, commit, score)."""
    from collections import Counter

    from .tokenize import tokenize_text

    if not readers or k <= 0:
        return []
    k1, b = readers[0].cfg.k1, readers[0].cfg.b
    ngrams = readers[0].cfg.ngrams
    for r in readers[1:]:
        if (r.cfg.k1, r.cfg.b, r.cfg.ngrams) != (k1, b, ngrams):
            raise ValueError("shards disagree on k1/b/analyzer — MLT undefined")

    tf = Counter(tokenize_text(text, ngrams=ngrams))
    if not tf:
        return []

    # ---- DFS phase: global df over the candidate terms ---------------
    cands = sorted(tf)
    shard_dfs = [r.term_dfs(cands) for r in readers]
    g_df = {t: sum(int(d.get(t, 0)) for d in shard_dfs) for t in cands}
    g_n = sum(r.n_docs for r in readers)
    g_tok = sum(r._total_postings_upper for r in readers)
    g_avgdl = (g_tok / g_n) if g_n else 0.0

    # single-index selection rule (query.IndexReader.mlt_terms), global
    # stats substituted: tf * ln(N/df), (score DESC, term ASC), top-m
    scored = [
        (t, tf[t] * math.log(float(g_n) / g_df[t]))
        for t in cands
        if g_df.get(t, 0) >= max(min_df, 1)
    ]
    scored.sort(key=lambda kv: (-kv[1], kv[0]))
    terms = [t for t, _ in scored[:m]]
    if not terms:
        return []

    # ---- query phase: per-shard dense ranking under global stats -----
    merged: list[tuple[float, tuple[str, str, str]]] = []
    for r in readers:
        sdfs = r.term_dfs(terms)
        local_k = k + 1  # seed exclusion happens at the merge
        if sum(int(v) for v in sdfs.values()) > r.driver_fetch_max_postings:
            local = r.topk_sharded(
                " ".join(terms), local_k,
                stats_override=(g_n, g_avgdl, {t: g_df[t] for t in terms}),
            )
        else:
            got = r.fetch_terms(terms)
            tps = []
            for t in terms:  # selection order = per-doc summation order
                tp = got.get(t)
                if tp is None:
                    continue
                gidf = math.log(1.0 + (g_n - g_df[t] + 0.5) / (g_df[t] + 0.5))
                tps.append(dataclasses.replace(tp, idf=gidf))
            local = dense_topk(tps, local_k, k1, b, g_avgdl, r.n_docs)
        if not local:
            continue
        ids = [d for _rk, d, _s in local]
        keys = {
            row["doc_id"]: (row["repo"], row["path"], row["commit"])
            for row in r.cat.read(r.spark, "docs")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "repo", "path", "commit")
            .collect()
        }
        merged.extend((s, keys[d]) for _rk, d, s in local)

    if exclude_key is not None:
        merged = [(s, key) for s, key in merged if key != tuple(exclude_key)]
    merged.sort(key=lambda x: (-x[0], x[1]))
    return [
        (i + 1, key[0], key[1], key[2], s)
        for i, (s, key) in enumerate(merged[:k])
    ]


def federated_facet_counts(
    readers: list[IndexReader], tree, col: str, topn: int = 10,
    max_values: int = 100_000,
) -> list[tuple[str, int]]:
    """Facet counts across shard indexes — exact, because per-value
    match counts are ADDITIVE over disjoint shards. Each shard runs its
    ordinary executor-side facet lane and returns its FULL value->count
    map (facet columns are low-cardinality by definition — this is ES
    ``shard_size`` set to unbounded, the accuracy-over-wire-bytes
    choice; a per-shard top-N would silently undercount values that
    straddle shard popularity, the classic distributed-terms-agg error
    this function exists to avoid). The coordinator sums and takes the
    global top-N (count DESC, value ASC).

    ``max_values`` bounds the per-shard collect (similarity.
    bounded_collect's contract): faceting on a doc-unique column would
    otherwise drag a corpus-sized map to the driver — that is a loud
    error, not an OOM."""
    from collections import defaultdict

    from .similarity import bounded_collect

    acc: dict = defaultdict(int)
    for r in readers:
        rows = bounded_collect(
            r.facet_counts(tree, col, topn=max_values + 1),
            max_values,
            f"federated_facet_counts({col})",
        )
        for row in rows:
            acc[row[col]] += int(row["cnt"])
    out = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:topn]
    return [(v, c) for v, c in out]


def federated_complete(
    readers: list[IndexReader], prefix: str, k: int = 10,
    max_values: int = 100_000,
) -> list[tuple[str, int]]:
    """Completion suggest across shard indexes — exact, for the same
    reason as ``federated_facet_counts``: a term's document frequency
    is ADDITIVE over disjoint shards. Each shard range-prunes its
    sorted dictionary under the prefix and returns its FULL
    (term, df) map under that prefix (a per-shard top-k would
    undercount terms popular everywhere but dominant nowhere — the
    distributed-terms-agg error again); the coordinator sums and ranks
    (weight DESC, term ASC). ``max_values`` bounds the per-shard
    collect: a one-letter prefix over a 10^9-term dictionary must fail
    loudly, not OOM the coordinator."""
    from collections import defaultdict

    from .expand import TermExpander
    from .similarity import bounded_collect

    acc: dict = defaultdict(int)
    for r in readers:
        rows = bounded_collect(
            TermExpander(r.spark, r.cat.root).complete(
                prefix, k=max_values + 1
            ),
            max_values,
            f"federated_complete({prefix!r})",
        )
        for row in rows:
            acc[row["term"]] += int(row["weight"])
    out = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, w) for t, w in out]


def federated_spell_suggest(
    readers: list[IndexReader], words: list[str], k: int = 5,
    max_candidates: int = 100_000,
) -> list[tuple[str, int, str, int]]:
    """Did-you-mean across shard indexes: per-shard distance-1
    candidate sets (the deletion-neighborhood join when the shard's
    deletion index is fresh, the exact banded-levenshtein fallback
    otherwise — either way the FULL candidate set per word, never a
    shard-local top-k), dfs summed over shards, re-ranked per word by
    (df DESC, suggestion ASC). Exact: edit distance is
    shard-independent and df is additive; a correction indexed in only
    one shard still surfaces with its true global weight. Returns
    (word, rank, suggestion, df) rows like single-index
    ``spell_suggest``."""
    from collections import defaultdict

    from .similarity import bounded_collect
    from .suggest import spell_suggest

    acc: dict = defaultdict(int)
    for r in readers:
        rows = bounded_collect(
            spell_suggest(r.spark, r.cat.root, words, k=max_candidates),
            max_candidates,
            "federated_spell_suggest",
        )
        for row in rows:
            acc[(row["word"], row["suggestion"])] += int(row["df"])
    out: list[tuple[str, int, str, int]] = []
    for w in sorted({wd for wd, _ in acc}):
        cands = sorted(
            ((s, d) for (wd, s), d in acc.items() if wd == w),
            key=lambda x: (-x[1], x[0]),
        )[:k]
        out.extend((w, i + 1, s, d) for i, (s, d) in enumerate(cands))
    return out


def federated_sort_field(
    readers: list[IndexReader], tree, field: str, k: int = 10,
    ascending: bool = False,
) -> list[tuple]:
    """Cross-shard sort-by-field search (the ES ``sort`` API over a
    multi-shard index): each shard answers its own EXACT top-k by the
    field — through whatever lane its sort-sibling state dispatches
    (early-terminated prefix scan when fresh, classic TakeOrdered
    otherwise; ``tree=None`` is the match-all browse) — and the
    coordinator merges shards·k rows. Exact by the same containment
    argument as DFS ranking: a shard's local field order IS the global
    order restricted to that shard, so the global top-k is contained in
    the union of per-shard top-k. Returns ``(rank, repo, path, commit,
    <field value>)`` — natural keys, because shard-local doc ids
    collide across shards.

    Scale shape: per-shard cost is the shard's own sorted lane; the
    coordinator handles shards·k rows and hydrates k natural keys per
    shard via the k-row isin docs join — nothing corpus-sized."""
    if not readers or k <= 0:
        return []
    merged: list[tuple] = []
    for r in readers:
        rows = r.topk_sort_field(tree, field, k=k, ascending=ascending).collect()
        if not rows:
            continue
        ids = [int(row["doc_id"]) for row in rows]
        keys = {
            row["doc_id"]: (row["repo"], row["path"], row["commit"])
            for row in r.cat.read(r.spark, "docs")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id", "repo", "path", "commit")
            .collect()
        }
        merged.extend((row[field], keys[row["doc_id"]]) for row in rows)
    # natural-key ASC tie-break under either value order (stable 2-pass)
    merged.sort(key=lambda x: x[1])
    merged.sort(key=lambda x: x[0], reverse=not ascending)
    return [
        (i + 1, key[0], key[1], key[2], v)
        for i, (v, key) in enumerate(merged[:k])
    ]
