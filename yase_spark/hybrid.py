"""Hybrid retrieval: fuse lexical (BM25) and vector (cosine) rankings
with Reciprocal Rank Fusion.

The modern search-serving shape (Elasticsearch/OpenSearch/Vespa hybrid
mode): run the text ranking and the embedding ranking independently to
depth ``d``, then fuse by rank only::

    rrf(doc) = sum_r 1 / (c + rank_r(doc))        (c = 60 by default)

Rank-based fusion is the robust choice for heterogeneous scorers — BM25
scores and cosine similarities live on incomparable scales, and RRF
(Cormack et al., SIGIR'09) needs no calibration. Docs missing from one
ranking simply contribute nothing for it.

Determinism: ranks are integers, the fused score is a short sum of
exact binary fractions' doubles computed in ranking order, ties break
on doc_id ASC — bitwise reproducible and SQL-replayable (the driver row
``hybrid_topk`` fuses the BM25 SQL ranking with the brute-force cosine
SQL ranking in DuckDB).

Scale shape: fusion touches 2·d (doc_id, rank) pairs per query — driver
arithmetic on ranking RESULTS, never on postings or vectors. The heavy
lifting stays in the underlying lanes (WAND/sharded for text, IVF-PQ
for vectors), each already scale-shaped; any rankings whose doc-id
spaces align can be fused (text+vector, text+text across fields,
vector+vector across embedding models).
"""

from __future__ import annotations


def rrf_fuse(
    rankings: list[list[tuple]], k: int = 10, c: int = 60
) -> list[tuple[int, int, float]]:
    """Fuse rankings given as ``[(rank, doc_id, ...), ...]`` lists
    (rank 1-based, the shape every topk lane returns). Returns
    [(rank, doc_id, rrf_score)] — top ``k`` by (score DESC, doc_id
    ASC). Contributions are summed in rankings order (fixed add
    order, the engine-wide determinism convention)."""
    scores: dict[int, float] = {}
    for ranking in rankings:
        for row in ranking:
            r, d = int(row[0]), int(row[1])
            scores[d] = scores.get(d, 0.0) + 1.0 / (c + r)
    order = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(order)]


def hybrid_topk(
    text_ranking: list[tuple],
    vector_ranking: list[tuple],
    k: int = 10,
    c: int = 60,
) -> list[tuple[int, int, float]]:
    """Two-way convenience wrapper: BM25 ranking + vector ranking →
    RRF-fused top-k. Both rankings must be over the SAME doc-id space
    (the caller maps engine ids to source ids first when the lanes
    disagree — the driver row does exactly that)."""
    return rrf_fuse([text_ranking, vector_ranking], k=k, c=c)


def minmax_fuse(
    rankings: list[list[tuple]],
    weights: list[float],
    k: int = 10,
) -> list[tuple[int, int, float]]:
    """Weighted linear fusion with min-max score normalization — the
    OTHER standard hybrid combiner (the ES 8.x retriever's ``min_max``
    normalizer / OpenSearch hybrid ``arithmetic_mean``): each ranking's
    scores are rescaled to [0, 1] over its OWN retrieved depth
    (``(s - min) / (max - min)``; a degenerate all-equal ranking maps to
    1.0 — every retrieved doc is "the best" of that ranking), then
    ``fused = Σ wᵢ · normᵢ``, top-k by (fused DESC, doc_id ASC).

    Unlike RRF this uses the score MAGNITUDES, so a ranking with one
    dominant hit and a flat tail concentrates its weight on the hit —
    the reason both combiners ship in every hybrid stack. Rows are
    ``(rank, doc_id, score)`` (every topk lane's shape); docs missing
    from a ranking contribute nothing for it. A doc gets at most one
    contribution per ranking, and IEEE addition of two terms is
    order-independent, so the fusion is bitwise SQL-replayable."""
    if len(rankings) != len(weights):
        raise ValueError("one weight per ranking")
    fused: dict[int, float] = {}
    for ranking, w in zip(rankings, weights):
        if not ranking:
            continue
        ss = [float(row[2]) for row in ranking]
        mn, mx = min(ss), max(ss)
        for row in ranking:
            d, s = int(row[1]), float(row[2])
            nrm = 1.0 if mx == mn else (s - mn) / (mx - mn)
            fused[d] = fused.get(d, 0.0) + w * nrm
    order = sorted(fused.items(), key=lambda x: (-x[1], x[0]))[:k]
    return [(i + 1, d, s) for i, (d, s) in enumerate(order)]
