"""Query serving: boolean AND/OR + ranked top-k with Block-Max WAND
(SURVEY.md §2.6 Q1–Q9).

Spec (BASELINE.json:6): "posting-list intersection with block-max WAND
pruning and a bounded min-heap, reproducing yase's reference query set
with rank-identical top-k docIDs and bitwise-matching BM25 scores".

Bitwise determinism contract (shared with yase_spark/oracle.py):
* idf per term computed with scalar ``math.log`` (never numpy's
  vectorized log, which can differ by 1 ulp);
* a doc's score is accumulated over unique query terms in
  first-occurrence query order with plain IEEE-754 double adds;
* final order ``(score DESC, doc_id ASC)``, rank 1-based.

Exactness of the pruned executor (vs the naive full scan) follows from
block ``max_score`` being a true upper bound and from evaluating on
``>= threshold`` (not ``>``): a doc tied with the heap floor can still
win the ``doc_id ASC`` tie-break, so it must be scored.
"""

from __future__ import annotations

import heapq
import math
import time
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .codec import decode_postings, decode_postings_nodl
from .config import IndexConfig
from .postings import term_bucket
from .tokenize import analyze_phrase, analyze_query


@dataclass
class TermPostings:
    term: str
    df: int
    idf: float
    doc_ids: np.ndarray       # int64, sorted ascending
    tfs: np.ndarray
    dls: np.ndarray
    block_last: np.ndarray    # int64 per block (block i covers fixed-size slices)
    block_max: np.ndarray     # float64 per block
    block_size: int

    @property
    def max_score(self) -> float:
        return float(self.block_max.max()) if self.block_max.size else 0.0


def _score_one(tf: float, dl: float, idf: float, k1: float, b: float, avgdl: float) -> float:
    """One term's contribution — textually identical expression to
    oracle.NaiveIndex.topk and codec.bm25_term_scores."""
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def bm25_scores_np(
    tfs: np.ndarray, dls: np.ndarray, idf: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


# --------------------------------------------------------------- executor
def wand_topk(
    terms: list[TermPostings],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> list[tuple[int, int, float]]:
    """Block-Max WAND over decoded postings -> [(rank, doc_id, score)].

    ``terms`` must be in analyzer (query) order — that order defines the
    score summation order for every fully-evaluated document.
    """
    terms = [t for t in terms if t.doc_ids.size]
    if not terms or k <= 0:
        return []
    nt = len(terms)
    ptr = [0] * nt
    # heap of (score, -doc_id): worst element = lowest score, then largest doc
    heap: list[tuple[float, int]] = []

    def cur_doc(i: int) -> int:
        p = ptr[i]
        return int(terms[i].doc_ids[p]) if p < terms[i].doc_ids.size else 1 << 62

    def seek(i: int, target: int) -> None:
        """Advance term i's pointer to the first doc >= target (galloping
        via searchsorted — the skip-pointer jump)."""
        t = terms[i]
        p = ptr[i]
        if p < t.doc_ids.size and t.doc_ids[p] < target:
            ptr[i] = p + int(np.searchsorted(t.doc_ids[p:], target, side="left"))

    def block_of(i: int) -> int:
        return ptr[i] // terms[i].block_size

    INF = 1 << 62
    order = list(range(nt))
    while True:
        order.sort(key=cur_doc)
        if cur_doc(order[0]) >= INF:
            break
        threshold = heap[0][0] if len(heap) >= k else -math.inf
        # pivot: first prefix whose summed global term upper bounds reach θ
        acc = 0.0
        pivot = -1
        for j, i in enumerate(order):
            if cur_doc(i) >= INF:
                break
            acc += terms[i].max_score
            if acc >= threshold:
                pivot = j
                break
        if pivot < 0:
            break  # even all remaining terms together can't beat θ
        pivot_doc = cur_doc(order[pivot])
        if pivot_doc >= INF:
            break

        if cur_doc(order[0]) == pivot_doc:
            # block-max refinement: tighter per-block upper bound
            bm = 0.0
            contributors = []
            for i in order:
                if cur_doc(i) > pivot_doc:
                    break
                contributors.append(i)
                t = terms[i]
                blk = block_of(i)
                bm += float(t.block_max[blk])
            if bm >= threshold:
                # full evaluation over ALL query terms in analyzer order
                score = 0.0
                for i in range(nt):
                    seek(i, pivot_doc)
                    t = terms[i]
                    p = ptr[i]
                    if p < t.doc_ids.size and int(t.doc_ids[p]) == pivot_doc:
                        score += _score_one(
                            float(t.tfs[p]), float(t.dls[p]), t.idf, k1, b, avgdl
                        )
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for i in range(nt):
                    p = ptr[i]
                    t = terms[i]
                    if p < t.doc_ids.size and int(t.doc_ids[p]) == pivot_doc:
                        ptr[i] = p + 1
            else:
                # skip: jump past the smallest block end among contributors,
                # but never past the first non-contributor's current doc —
                # docs beyond it may gain that term's contribution and are
                # not covered by the bm bound (exactness).
                nxt = min(
                    int(terms[i].block_last[block_of(i)]) for i in contributors
                ) + 1
                if len(contributors) < nt:
                    nxt = min(nxt, cur_doc(order[len(contributors)]))
                nxt = max(nxt, pivot_doc + 1)
                for i in contributors:
                    seek(i, nxt)
        else:
            # advance all terms before the pivot up to the pivot doc
            for j in range(pivot):
                seek(order[j], pivot_doc)

    ranked = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(r + 1, -nd, s) for r, (s, nd) in enumerate(ranked)]


INF_DOC = 1 << 62

# process-wide cap on concurrent per-term cold-fetch Spark jobs (VERDICT
# round 2 item 8): each cold multi-term query fans its Arrow collects out
# to up to 8 driver threads; without a global bound, N concurrent cold
# queries schedule 8N simultaneous jobs and the scheduler fixed costs eat
# the transfer win. BoundedSemaphore so a buggy double-release fails loud.
import threading

FETCH_JOB_CAP = 8
_FETCH_SEM = threading.BoundedSemaphore(FETCH_JOB_CAP)


class _SharedIndexMeta:
    """Process-wide DICTIONARY-SIZED reader state for ONE index version.

    What a cold query used to pay per fresh ``IndexReader`` was one
    Spark job for the stats row, one for tombstones, one for the
    dictionary df pre-check and (block-selected lane) one more for block
    metadata — all over data that is dictionary-sized, identical for
    every reader of the same index version, and tiny next to payloads.
    This registry keeps exactly that state resident per
    ``(root, segments/stats/deletes versions)`` key — the Lucene
    terms-index-in-RAM posture (VERDICT round-3 item 2: "cache the
    dictionary/block-meta driver-side across queries") — so a dispatched
    cold query costs exactly ONE Spark job (its payload or slice fetch).

    Never cached here: posting payloads or decoded postings (index-sized
    — they stay in the per-reader caches). Invalidation is by key: any
    append/delete/compact bumps a catalog VERSION and lands on a fresh
    entry. ``meta`` is bounded by ``IndexReader.META_CACHE_MAX_BLOCKS``
    (compact numpy first/last/max_score arrays, ~24 B/block).

    Total registry budget: ``_META_REGISTRY_MAX`` (8) live versions ×
    (block-meta cap ~100 MB + doclens int32[n_docs+1], 256 MB at the
    64M-doc residency cap) — worst case ~2.8 GB driver RSS under
    append-heavy serving where stale versions linger until FIFO
    eviction; an evicted entry drops its doclens with it. Dictionary-
    sized per version by construction, but the MULTIPLIER is the
    registry depth — lower ``_META_REGISTRY_MAX`` on thin drivers."""

    def __init__(self):
        self.lock = threading.Lock()
        self.stats_row: dict | None = None
        self.deleted_loaded = False
        self.deleted = None                      # np.ndarray | None
        self.df: dict[str, int] = {}
        self.meta: dict[str, list | None] = {}   # term -> shard entries
        self.meta_blocks = 0
        self.spark_ref = None                    # session the cached df binds to
        self.segments_df = None
        # per-doc length array (Lucene norms posture): 0 = unloaded,
        # 1 = loaded, -1 = unavailable/too big for residency
        self.doclens = None                      # np.int32[n_docs + 1] | None
        self.doclens_state = 0
        # request cache (IndexReader.topk_cached): (query, k) -> rows;
        # version-keyed like everything here, so never stale
        self.results: dict = {}


_META_REGISTRY: dict[tuple, _SharedIndexMeta] = {}
_META_REGISTRY_LOCK = threading.Lock()
_META_REGISTRY_MAX = 8


class LazyTermPostings:
    """Block-lazy cursor over one term's postings, built from segment
    rows WITHOUT decoding payloads (SURVEY.md §2.6 Q6, VERDICT round 1
    item 2: the stored ``block_meta.byte_offset``/``tf_off``/``dl_off``
    let the executor decode only the blocks the WAND pointer actually
    lands on; skipped blocks never touch their bytes).

    ``rows``: (payload, block_meta, idf_stored, avgdl_stored) per shard
    row in shard order (shard runs are doc-range-disjoint and
    doc-ordered, so their block lists concatenate into one term-wide
    block sequence; the delta chain resets at each row's first block —
    ``chain_prev`` handles it).

    Stored block max_scores were computed with the encode-time global
    stats (idf, avgdl); after an incremental append both change.
    max_score is linear in idf, and under an avgdl change the per-doc
    BM25 tf-factor grows by at most avgdl_now/avgdl_stored (the
    avgdl-bearing denominator term shrinks at most proportionally; the
    avgdl-free denominator part only dampens the effect), so the stored
    bound is rescaled by
    (idf_now/idf_stored) * max(1, avgdl_now/avgdl_stored), nudged one
    ulp up to absorb float rounding — a loose bound is safe, a
    tight-by-1ulp (or avgdl-ignoring: ADVICE round 2, high) bound could
    prune a true top-k doc.
    """

    __slots__ = (
        "term", "df", "idf", "block_first", "block_last", "block_max",
        "block_n", "b_gap", "b_tf", "b_dl", "pay_idx", "chain_prev",
        "payloads", "nb", "bi", "p", "ids", "tfs", "dls",
        "blocks_decoded", "max_score", "loaded",
    )

    def __init__(
        self, term: str, df: int, idf_now: float, rows: list,
        avgdl_now: float | None = None,
    ):
        self.term = term
        self.df = df
        self.idf = idf_now
        first, last, mx, nn, bg, bt, bd, pi, cp = [], [], [], [], [], [], [], [], []
        self.payloads = []
        for payload, metas, idf_stored, avgdl_stored in rows:
            ratio = 1.0 if idf_stored == idf_now else idf_now / idf_stored
            if (
                avgdl_now is not None
                and avgdl_stored > 0.0
                and avgdl_now > avgdl_stored
            ):
                ratio *= avgdl_now / avgdl_stored
            self.payloads.append(payload)
            prev = 0
            for m in metas:
                first.append(m["block_first"])
                last.append(m["block_last"])
                s = m["max_score"] * ratio
                mx.append(s if ratio == 1.0 else np.nextafter(s * (1.0 + 1e-12), np.inf))
                nn.append(m["n_docs"])
                bg.append(m["byte_offset"])
                bt.append(m["tf_off"])
                bd.append(m["dl_off"])
                pi.append(len(self.payloads) - 1)
                cp.append(prev)
                prev = m["block_last"]
        self.block_first = np.asarray(first, dtype=np.int64)
        self.block_last = np.asarray(last, dtype=np.int64)
        self.block_max = np.asarray(mx, dtype=np.float64)
        self.block_n = np.asarray(nn, dtype=np.int64)
        self.b_gap = np.asarray(bg, dtype=np.int64)
        self.b_tf = np.asarray(bt, dtype=np.int64)
        self.b_dl = np.asarray(bd, dtype=np.int64)
        self.pay_idx = np.asarray(pi, dtype=np.int64)
        self.chain_prev = np.asarray(cp, dtype=np.int64)
        self.nb = self.block_last.size
        self.max_score = float(self.block_max.max()) if self.nb else 0.0
        self.blocks_decoded = 0
        # start VIRTUAL at block 0: position/bound checks run on metadata
        # alone; bytes are first touched when a value is actually read
        self.bi = 0
        self.p = 0
        self.loaded = False
        self.ids = self.tfs = self.dls = None

    # ------------------------------------------------------------ blocks
    def _load(self, bi: int) -> None:
        from .codec import varint_decode

        buf = np.frombuffer(self.payloads[self.pay_idx[bi]], dtype=np.uint8)
        n = int(self.block_n[bi])
        gaps, _ = varint_decode(buf, int(self.b_gap[bi]), n)
        tfs, _ = varint_decode(buf, int(self.b_tf[bi]), n)
        dls, _ = varint_decode(buf, int(self.b_dl[bi]), n)
        self.ids = np.cumsum(gaps.astype(np.int64)) + int(self.chain_prev[bi])
        self.tfs = tfs.astype(np.int64)
        self.dls = dls.astype(np.int64)
        self.bi = bi
        self.p = 0
        self.loaded = True
        self.blocks_decoded += 1

    def _virtual(self, bi: int) -> None:
        """Position at the FIRST posting of block ``bi`` without decoding:
        block_first IS that posting's doc id (stored metadata), so
        cur_doc/bound checks need no payload bytes. The decode happens
        lazily in ``_ensure_loaded`` only if the executor actually reads
        values or moves inside the block — a block the WAND bound rejects
        is skipped for free. This is what makes single-term (and
        last-surviving-cursor) skips decode-free: their seeks land
        exactly on the next block boundary."""
        self.bi = bi
        self.p = 0
        self.loaded = False

    def _ensure_loaded(self) -> None:
        if not self.loaded:
            self._load(self.bi)

    # ------------------------------------------------------------ cursor
    def cur_doc(self) -> int:
        if self.bi >= self.nb:
            return INF_DOC
        if not self.loaded:
            return int(self.block_first[self.bi])
        return int(self.ids[self.p])

    def cur_tf_dl(self):
        self._ensure_loaded()
        return float(self.tfs[self.p]), float(self.dls[self.p])

    def block_max_cur(self) -> float:
        return float(self.block_max[self.bi])

    def block_last_cur(self) -> int:
        return int(self.block_last[self.bi])

    def seek(self, target: int) -> None:
        """First posting >= target; skipped blocks are never decoded, and
        a landing at or before a block's first doc stays metadata-only."""
        if self.bi >= self.nb or self.cur_doc() >= target:
            return
        if target > int(self.block_last[self.bi]):
            nbi = int(np.searchsorted(self.block_last, target, side="left"))
            if nbi >= self.nb:
                self.bi = self.nb  # exhausted
                return
            if target <= int(self.block_first[nbi]):
                self._virtual(nbi)
            else:
                self._load(nbi)
                self.p = int(np.searchsorted(self.ids, target, side="left"))
        else:
            self._ensure_loaded()
            self.p += int(np.searchsorted(self.ids[self.p:], target, side="left"))

    def advance(self) -> None:
        self._ensure_loaded()
        self.p += 1
        if self.p >= self.ids.size:
            if self.bi + 1 < self.nb:
                self._virtual(self.bi + 1)
            else:
                self.bi = self.nb


class _ClippedCursor:
    """Restrict a LazyTermPostings cursor to doc ids in [lo, hi): ids at
    or beyond ``hi`` present as exhaustion. The sharded executor ships a
    straddling block to every range it overlaps; clipping guarantees each
    doc is fully evaluated by exactly ONE range — a doc evaluated where
    another term's postings for it are absent would get a partial score.
    ``max_score`` is the slice-local bound (only range-overlapping blocks
    are present), which is tighter than the term-global bound and still a
    valid upper bound for every doc in the range."""

    __slots__ = ("c", "hi")

    def __init__(self, c: LazyTermPostings, lo: int, hi: int):
        c.seek(lo)
        self.c = c
        self.hi = hi

    @property
    def nb(self):
        return self.c.nb

    @property
    def idf(self):
        return self.c.idf

    @property
    def max_score(self):
        return self.c.max_score

    @property
    def blocks_decoded(self):
        return self.c.blocks_decoded

    def cur_doc(self) -> int:
        d = self.c.cur_doc()
        return INF_DOC if d >= self.hi else d

    def cur_tf_dl(self):
        return self.c.cur_tf_dl()

    def block_max_cur(self) -> float:
        return self.c.block_max_cur()

    def block_last_cur(self) -> int:
        return self.c.block_last_cur()

    def seek(self, target: int) -> None:
        self.c.seek(target)

    def advance(self) -> None:
        self.c.advance()


def wand_topk_lazy(
    cursors: list[LazyTermPostings],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
) -> list[tuple[int, int, float]]:
    """Block-Max WAND over LAZY cursors -> [(rank, doc_id, score)].

    Same decision structure (and bitwise-identical full-evaluation
    scoring) as ``wand_topk``; the difference is that posting blocks are
    decoded on demand, so blocks skipped by the block-max bound never
    cost decode work or memory. ``cursors`` in analyzer (query) order.
    """
    cursors = [c for c in cursors if c.nb]
    if not cursors or k <= 0:
        return []
    nt = len(cursors)
    heap: list[tuple[float, int]] = []
    order = list(range(nt))
    while True:
        order.sort(key=lambda i: cursors[i].cur_doc())
        if cursors[order[0]].cur_doc() >= INF_DOC:
            break
        threshold = heap[0][0] if len(heap) >= k else -math.inf
        acc = 0.0
        pivot = -1
        for j, i in enumerate(order):
            if cursors[i].cur_doc() >= INF_DOC:
                break
            acc += cursors[i].max_score
            if acc >= threshold:
                pivot = j
                break
        if pivot < 0:
            break
        pivot_doc = cursors[order[pivot]].cur_doc()
        if pivot_doc >= INF_DOC:
            break

        if cursors[order[0]].cur_doc() == pivot_doc:
            bm = 0.0
            contributors = []
            for i in order:
                if cursors[i].cur_doc() > pivot_doc:
                    break
                contributors.append(i)
                bm += cursors[i].block_max_cur()
            if bm >= threshold:
                score = 0.0
                for i in range(nt):
                    c = cursors[i]
                    c.seek(pivot_doc)
                    if c.cur_doc() == pivot_doc:
                        tf, dl = c.cur_tf_dl()
                        score += _score_one(tf, dl, c.idf, k1, b, avgdl)
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
                for i in range(nt):
                    if cursors[i].cur_doc() == pivot_doc:
                        cursors[i].advance()
            else:
                nxt = min(
                    cursors[i].block_last_cur() for i in contributors
                ) + 1
                if len(contributors) < nt:
                    nxt = min(nxt, cursors[order[len(contributors)]].cur_doc())
                nxt = max(nxt, pivot_doc + 1)
                for i in contributors:
                    cursors[i].seek(nxt)
        else:
            for j in range(pivot):
                cursors[order[j]].seek(pivot_doc)

    ranked = sorted(heap, key=lambda it: (-it[0], -it[1]))
    return [(r + 1, -nd, s) for r, (s, nd) in enumerate(ranked)]


def est_surviving_fraction(per_term: list, k: int) -> float:
    """Metadata-only estimate of how much a block-max WAND kernel could
    skip: the fraction of blocks whose doc-interval SUMMED upper bound
    reaches the k-th best per-block lower bound (within one term,
    distinct blocks hold distinct docs, so k blocks certify k docs).

    ``per_term``: one entry per query term, each a tuple of equal-length
    numpy arrays ``(first, last, ub, lb)`` over that term's blocks
    (bounds already rescaled to current stats). This is the same sweep
    the block-selected lane runs driver-side, packaged so the sharded
    executor can run it per doc-range from the sliced block metadata it
    already holds — free relative to a decode. Purely advisory: kernel
    choice never changes results (all kernels are exact)."""
    theta = -math.inf
    for _f, _l, _u, lb in per_term:
        if lb.size >= k:
            theta = max(theta, float(np.partition(lb, lb.size - k)[lb.size - k]))
    if not math.isfinite(theta):
        return 1.0
    pts = np.unique(np.concatenate(
        [f for f, _l, _u, _b in per_term] + [l + 1 for _f, l, _u, _b in per_term]
    ))
    diff = np.zeros(pts.size + 1)
    segs = []
    for f, l, ub, _b in per_term:
        lo = np.searchsorted(pts, f, side="right") - 1
        hi = np.searchsorted(pts, l, side="right") - 1
        np.add.at(diff, lo, ub)
        np.add.at(diff, hi + 1, -ub)
        segs.append((lo, hi))
    surv_pref = np.concatenate(([0], np.cumsum(np.cumsum(diff[:-1]) >= theta)))
    sel = total = 0
    for lo, hi in segs:
        sel += int(((surv_pref[hi + 1] - surv_pref[lo]) > 0).sum())
        total += lo.size
    return (sel / total) if total else 1.0


def dense_topk(
    terms: list[TermPostings],
    k: int,
    k1: float,
    b: float,
    avgdl: float,
    n_docs: int,
) -> list[tuple[int, int, float]]:
    """Dense-accumulator full evaluation: one scatter-add per term into a
    doc_id-indexed score array, then an exact top-k selection.

    Bitwise-identical to :func:`naive_topk` (same per-term contribution
    expression, same per-doc summation order = term order), but O(n_docs
    + postings) instead of the O(P log P) sort ``np.unique`` costs on
    multi-million-posting unions — measured 536 ms -> ~60 ms p50 on the
    1.6M-doc reference mix. Used when ``n_docs`` is driver-affordable
    (the reader dispatches; beyond that the query is cluster-served
    anyway)."""
    terms = [t for t in terms if t.doc_ids.size]
    if not terms or k <= 0:
        return []
    scores = np.zeros(n_docs + 1, dtype=np.float64)
    for t in terms:  # analyzer order -> fixed per-doc add order
        contrib = t.idf * (t.tfs.astype(np.float64) * (k1 + 1.0)) / (
            t.tfs.astype(np.float64)
            + k1 * (1.0 - b + b * (t.dls.astype(np.float64) / avgdl))
        )
        scores[t.doc_ids] += contrib  # ids unique within a term
    # exact top-k with (score DESC, doc_id ASC): find the kth value via
    # argpartition, widen to ALL ties at the boundary, then sort exactly
    hit = scores > 0.0
    n_hits = int(np.count_nonzero(hit))
    if n_hits == 0:
        return []
    kk = min(k, n_hits)
    part = np.argpartition(scores, -kk)[-kk:]
    kth = scores[part].min()
    cand = np.flatnonzero(scores >= kth)
    order = np.lexsort((cand, -scores[cand]))[:k]
    return [(r + 1, int(cand[i]), float(scores[cand[i]])) for r, i in enumerate(order)]


def naive_topk(
    terms: list[TermPostings], k: int, k1: float, b: float, avgdl: float
) -> list[tuple[int, int, float]]:
    """Un-pruned full evaluation (shadow oracle for WAND, Q5 fixed-order)."""
    terms = [t for t in terms if t.doc_ids.size]
    if not terms or k <= 0:
        return []
    all_docs = np.unique(np.concatenate([t.doc_ids for t in terms]))
    scores = np.zeros(all_docs.size, dtype=np.float64)
    for t in terms:  # analyzer order -> fixed per-doc add order
        pos = np.searchsorted(all_docs, t.doc_ids)
        contrib = t.idf * (t.tfs.astype(np.float64) * (k1 + 1.0)) / (
            t.tfs.astype(np.float64)
            + k1 * (1.0 - b + b * (t.dls.astype(np.float64) / avgdl))
        )
        scores[pos] += contrib
    order = np.lexsort((all_docs, -scores))[:k]
    return [(r + 1, int(all_docs[i]), float(scores[i])) for r, i in enumerate(order)]


def bool_and(terms: list[TermPostings]) -> np.ndarray:
    """Q3: rarest-first posting intersection."""
    if not terms:
        return np.empty(0, dtype=np.int64)
    ts = sorted(terms, key=lambda t: t.doc_ids.size)
    if ts[0].doc_ids.size == 0:
        return np.empty(0, dtype=np.int64)
    out = ts[0].doc_ids
    for t in ts[1:]:
        out = out[np.isin(out, t.doc_ids, assume_unique=True)]
        if out.size == 0:
            break
    return out


def bool_or(terms: list[TermPostings]) -> np.ndarray:
    """Q4: posting union."""
    arrs = [t.doc_ids for t in terms if t.doc_ids.size]
    if not arrs:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(arrs))


# ------------------------------------------------- boolean query AST
# SURVEY.md §1.4 / §3.3: queries are a tiny programmatic AST — no SQL
# parser. A Term's text goes through the SAME analyzer as indexing
# (T4 parity); if analysis splits it (camelCase → parts + bigrams off),
# the leaf means the conjunction of its tokens, matching how bool_and
# treats a typed identifier.
@dataclass(frozen=True)
class Term:
    t: str


@dataclass(frozen=True)
class And:
    kids: tuple

    def __init__(self, kids):
        object.__setattr__(self, "kids", tuple(kids))


@dataclass(frozen=True)
class Or:
    kids: tuple

    def __init__(self, kids):
        object.__setattr__(self, "kids", tuple(kids))


@dataclass(frozen=True)
class Not:
    """Negation clause, valid ONLY as a direct child of ``And`` with at
    least one positive sibling (the Lucene MUST_NOT rule): an AND-NOT is
    a cheap set-difference bounded by the positive conjuncts, while a
    bare complement is corpus-sized by construction — at 10^12 docs
    that query is a mistake, and the engine rejects it instead of
    silently materializing it. Negated terms never contribute to BM25
    scores in ``TopK`` (standard retrieval semantics)."""

    kid: object


@dataclass(frozen=True)
class Phrase:
    """Positional leaf: matches docs whose parts stream contains
    ``q``'s parts as an ordered window of span ≤ (n-1)+``slop`` (exact
    phrase at slop=0) — Lucene's PhraseQuery as a BooleanQuery clause.
    Requires the positional sibling index (``build_positions``). In
    ``TopK`` the phrase's PARTS score like ordinary terms (Lucene's
    PhraseQuery scoring contract: match requires adjacency, score is
    the standard per-term sum). Driver-lane only: a phrase match set is
    selective by construction; ``search_df`` (the corpus-sized-result
    lane) rejects it loudly."""

    q: str
    slop: int = 0


@dataclass(frozen=True)
class TopK:
    expr: object
    k: int = 10


def _ast_leaf_tokens(node, positive_only: bool = False, chain=None) -> list[str]:
    """Analyzed leaf tokens in DFS first-occurrence order — the fixed
    BM25 summation order for TopK over an AST (same contract as
    analyze_query for string queries). ``positive_only`` skips ``Not``
    subtrees (scoring); the default includes them (fetch planning).
    ``chain``: the index's analysis chain (analysis.AnalyzerChain),
    applied to every leaf's tokens for query-side parity."""
    from .analysis import chain_terms

    out: list[str] = []

    def _an(terms):
        return terms if chain is None or chain.is_noop \
            else chain_terms(terms, chain)

    def walk(n):
        if isinstance(n, Term):
            out.extend(_an(analyze_query(n.t)))
        elif isinstance(n, Phrase):
            out.extend(_an(analyze_phrase(n.q)))
        elif isinstance(n, (And, Or)):
            for c in n.kids:
                walk(c)
        elif isinstance(n, Not):
            if not positive_only:
                walk(n.kid)
        elif isinstance(n, TopK):
            walk(n.expr)
        else:
            raise TypeError(f"not an AST node: {n!r}")

    walk(node)
    return list(dict.fromkeys(out))


def _reject_bare_not(n) -> None:
    raise TypeError(
        "Not(...) is only supported as a direct child of And(...) with at "
        "least one positive sibling — a bare complement is corpus-sized"
    )


# ----------------------------------------------------------------- reader
class IndexReader:
    """Query-time view of a built index.

    Term fetch (Q1) prunes by the term-bucket partition layout (C7) and
    pushes the term predicate to the Parquet scan; decoded postings are
    cached driver-side for p95 latency (Q9 warm path).
    """

    def __init__(self, spark: SparkSession, index_root: str,
                 cfg: IndexConfig | None = None, shared_meta: bool = True,
                 pit: dict[str, int] | None = None):
        self.spark = spark
        if pit is not None:
            # point-in-time reader (ES _pit / Iceberg snapshot-pinned):
            # EVERY table access below — stats, segments, deletes, docs
            # hydration, siblings — resolves through the pinned
            # versions, so concurrent appends/deletes/compactions are
            # invisible for this reader's whole lifetime. The shared-
            # meta registry keys on current_version(), which the pinned
            # catalog answers with the pins: PIT readers of the same
            # snapshot share meta with each other and with nobody else.
            from .catalog import PinnedCatalog

            self.cat: Catalog = PinnedCatalog(index_root, pit)
        else:
            self.cat = Catalog(index_root)
        # adopt the build's persisted config (catalog properties): a reader
        # with a different term_buckets computes wrong bucket pruning and
        # silently misses terms; k1/b/block_size mismatches silently change
        # scores. Caller-supplied cfg is validated against it.
        props = self.cat.get_properties() or {}
        persisted = props.get("index_config")
        if persisted is not None:
            if cfg is not None:
                mism = {
                    f: (persisted.get(f), getattr(cfg, f))
                    for f in IndexConfig.SEMANTIC_FIELDS
                    if persisted.get(f) != getattr(cfg, f)
                }
                if mism:
                    raise ValueError(
                        f"reader config mismatches the build's persisted "
                        f"config on {mism} (persisted vs requested)"
                    )
            known = {k: v for k, v in persisted.items() if k in IndexConfig.__dataclass_fields__}
            self.cfg = IndexConfig(**known)
        else:
            self.cfg = cfg or IndexConfig()
        # the index's declared analysis chain (analysis.py): adopted
        # with the semantic config above, applied to every query string
        # through self._analyze — parity is structural, not caller
        # discipline
        from .analysis import chain_from_config

        self.chain = chain_from_config(self.cfg)
        # shared dictionary-sized state keyed by index VERSION (see
        # _SharedIndexMeta): any catalog commit bumps a version and lands
        # on a fresh entry, so staleness is structurally impossible
        self._shared: _SharedIndexMeta | None = None
        if shared_meta:
            import os as _os

            key = (
                _os.path.realpath(index_root),
                self.cat.current_version("segments"),
                self.cat.current_version("stats"),
                self.cat.current_version("deletes")
                if self.cat.exists("deletes") else -1,
            )
            with _META_REGISTRY_LOCK:
                sh = _META_REGISTRY.get(key)
                if sh is None:
                    sh = _SharedIndexMeta()
                    _META_REGISTRY[key] = sh
                    while len(_META_REGISTRY) > _META_REGISTRY_MAX:
                        _META_REGISTRY.pop(next(iter(_META_REGISTRY)))
            self._shared = sh
        if self._shared is not None and self._shared.stats_row is not None:
            srow = self._shared.stats_row
        else:
            r = self.cat.read(spark, "stats").collect()[0]
            srow = {"n_docs": r["n_docs"], "total_tokens": r["total_tokens"]}
            if self._shared is not None:
                self._shared.stats_row = srow
        self.n_docs = int(srow["n_docs"])
        self.avgdl = (srow["total_tokens"] / srow["n_docs"]) if srow["n_docs"] else 0.0
        if (
            self._shared is not None
            and self._shared.segments_df is not None
            and self._shared.spark_ref is spark
        ):
            self._segments = self._shared.segments_df
        else:
            self._segments = self.cat.read(spark, "segments")
            if self._shared is not None:
                self._shared.spark_ref = spark
                self._shared.segments_df = self._segments
        self._cache: dict[str, TermPostings | None] = {}
        self._row_cache: dict[str, list | None] = {}   # term -> shard rows
        # df + block-meta caches alias the shared entry when enabled, so
        # every reader of this index version sees one dictionary
        self._df_cache: dict[str, int] = (
            self._shared.df if self._shared is not None else {}
        )
        self._meta_cache: dict[str, list | None] = (
            self._shared.meta if self._shared is not None else {}
        )
        # above this many total postings across the query's terms, topk()
        # dispatches to the cluster-side path instead of materializing
        # posting payloads on the driver (VERDICT round 1 item 3) — df is
        # known from a dictionary-only columnar read before any payload
        # bytes move.
        self.driver_fetch_max_postings = 20_000_000
        # total_tokens bounds total postings (a posting is a distinct
        # (term, doc) pair, every token contributes to exactly one); when
        # the WHOLE index fits under the driver-fetch cap, the per-query
        # dictionary df pre-check can never trigger a dispatch and is
        # skipped — cold queries on small/medium indexes cost ONE Spark
        # job (the payload fetch) instead of two.
        self._total_postings_upper = int(srow["total_tokens"])
        # tombstoned doc ids (IndexBuilder.delete — Lucene-liveDocs
        # semantics): masked out at every decode funnel, while the
        # encode-time collection stats stay in force until
        # apply_deletes() physically compacts. Pruning lanes that reason
        # from stored block bounds keyed by block_first (which may be a
        # tombstoned doc) fall back to full-decode executors while any
        # tombstone exists — compaction restores them, exactly as a
        # Lucene merge re-enables its skip optimizations.
        self._deleted: np.ndarray | None = None
        if self._shared is not None and self._shared.deleted_loaded:
            self._deleted = self._shared.deleted
        else:
            if self.cat.exists("deletes"):
                darr = np.unique(
                    np.asarray(
                        self.cat.read(spark, "deletes")
                        .toArrow().column("doc_id").to_pylist(),
                        dtype=np.int64,
                    )
                )
                if darr.size > self.DELETE_DRIVER_CAP:
                    raise ValueError(
                        f"{darr.size} tombstones exceed the reader cap "
                        f"({self.DELETE_DRIVER_CAP}); run "
                        "IndexBuilder.apply_deletes() first"
                    )
                self._deleted = darr if darr.size else None
            if self._shared is not None:
                self._shared.deleted = self._deleted
                self._shared.deleted_loaded = True

    @classmethod
    def clear_shared_meta(cls) -> None:
        """Drop the process-wide shared metadata registry (benchmark
        lanes and tests that need a metadata-cold reader)."""
        with _META_REGISTRY_LOCK:
            _META_REGISTRY.clear()

    # readers materialize the tombstone set (it rides every decode);
    # beyond this, physical compaction is overdue and cheaper
    DELETE_DRIVER_CAP = 50_000_000
    # shared block-meta cache bound: compact numpy arrays, ~24 B/block
    # -> ~100 MB ceiling. Dictionary-sized by construction (blocks of
    # QUERIED terms only, payloads never cached); wipes wholesale when
    # exceeded rather than tracking LRU — refetch is one metadata job.
    META_CACHE_MAX_BLOCKS = 4_000_000

    def _analyze(self, query: str) -> list[str]:
        """Query-side analysis with the index's declared chain: the
        pinned tokenizer first, then the chain's stopword filter and
        stemmer (analysis.chain_terms — the driver mirror of the build
        kernel's dictionary-level application). Every string-query lane
        funnels through here, so a chained index can't be queried with
        surface forms by accident."""
        from .analysis import chain_terms

        terms = analyze_query(query)
        if self.chain.is_noop:
            return terms
        return chain_terms(terms, self.chain)

    def _mask_deleted(self, ids: np.ndarray) -> np.ndarray:
        """Boolean keep-mask over ``ids`` (True = not tombstoned)."""
        return ~np.isin(ids, self._deleted, assume_unique=False)

    # ------------------------------------------------------------- fetch
    def _collect_segments(self, missing: list[str], columns: list[str]):
        """Bucket-pruned columnar fetch of segment rows for ``missing``
        terms as ONE pyarrow table. Arrow-native collect: payload bytes
        cross the JVM->Python boundary as Arrow IPC batches instead of
        Py4J row pickling (the measured cold-fetch bottleneck at 1.6M
        docs was that transfer, ~30 MB/s pickled). A multi-term fetch
        runs as per-term CONCURRENT Spark jobs from driver threads —
        the Arrow socket stream of a single collect is serial, so cold
        wall time drops toward the slowest term's transfer instead of
        the sum (socket reads release the GIL; Spark supports
        concurrent actions per session)."""
        import pyarrow as pa

        def one(ts: list[str]):
            # the process-wide semaphore bounds TOTAL in-flight fetch
            # jobs across all readers and queries (VERDICT round 2 item
            # 8): a single query still fans out, but N concurrent cold
            # queries share the same FETCH_JOB_CAP job budget instead of
            # scheduling 8N jobs
            with _FETCH_SEM:
                return self._fetch_table(ts, columns)

        # concurrency only pays when per-term payloads dwarf per-job
        # setup (~30-60 ms each): on a small index a 40-term prefetch
        # as 40 jobs is SLOWER than one batched scan (measured 0.4 s ->
        # 1.2 s on the sf0.1 warm prefetch), while at 1.6M docs the
        # split is a 1.5-2.6x win. Gate on corpus size.
        if len(missing) <= 1 or self.n_docs < 200_000:
            return self._fetch_table(missing, columns)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(8, len(missing))) as ex:
            tables = list(ex.map(lambda t: one([t]), missing))
        return pa.concat_tables(tables)

    def _fetch_table(self, ts: list[str], columns: list[str]):
        """One bucket-pruned columnar scan for ``ts`` -> pyarrow table
        (split out so tests can instrument in-flight job concurrency)."""
        bs = sorted({term_bucket(t, self.cfg.term_buckets) for t in ts})
        return (
            self._segments.filter(
                F.col("bucket").isin(bs) & F.col("term").isin(ts)
            )
            .select(*columns)
            .toArrow()
        )

    # doc-length residency bounds (the Lucene norms analogue): the array
    # is int32[n_docs + 1] -> 256 MB at the 64M-doc cap; beyond it the
    # dls stream decodes from the payload as always. The gather only
    # pays for itself on big lists, so small terms skip it too.
    DOCLENS_MAX_DOCS = 64_000_000
    DOCLENS_MIN_DF = 500_000

    def _get_doclens(self) -> np.ndarray | None:
        """Resident per-doc length array shared across readers of this
        index version (loaded once from the docs table's (doc_id,
        doc_len) projection — doc ids are minted dense 1..n, so the
        array indexes by doc_id directly). Why: dl is per-DOC data that
        payloads duplicate per posting, and its varint stream is ~60%
        of decode wall; with the array resident the eager decode skips
        those bytes entirely and gathers instead (codec
        decode_postings_nodl). Returns None when residency is off
        (non-shared reader, > DOCLENS_MAX_DOCS, or no docs table)."""
        sh = self._shared
        if sh is None:
            return None
        if sh.doclens_state == 0:
            with sh.lock:
                if sh.doclens_state == 0:
                    sh.doclens_state = -1  # sticky on any failure path
                    if self.n_docs <= self.DOCLENS_MAX_DOCS and self.cat.exists("docs"):
                        tbl = (
                            self.cat.read(self.spark, "docs")
                            .select("doc_id", "doc_len")
                            .toArrow()
                        )
                        ids = tbl.column("doc_id").combine_chunks().to_numpy(
                            zero_copy_only=False
                        )
                        dls = tbl.column("doc_len").combine_chunks().to_numpy(
                            zero_copy_only=False
                        )
                        if ids.size and int(ids.max()) <= self.n_docs:
                            arr = np.zeros(self.n_docs + 1, dtype=np.int32)
                            arr[ids] = dls
                            sh.doclens = arr
                            sh.doclens_state = 1
        return sh.doclens

    def _rows_to_postings(self, t: str, rs: list) -> TermPostings | None:
        """Decode shard rows (shard-sorted) into one TermPostings.

        Block bounds are recomputed here (one vectorized pass over
        the already-decoded arrays) rather than trusted from the
        stored metadata: (a) shard-split terms have partial interior
        blocks that break fixed-stride indexing, and (b) after an
        incremental corpus append the stored max_score is stale
        under the NEW global stats (larger N -> larger idf), and a
        too-small upper bound would make WAND prune real hits. The
        stored block_meta remains the scan-time skip structure for
        executors that decode lazily per block."""
        if not rs:
            return None
        df_g = int(rs[0]["df"])
        dl_arr = (
            self._get_doclens() if df_g >= self.DOCLENS_MIN_DF else None
        )
        ids_l, tfs_l, dls_l = [], [], []
        for r in rs:
            if dl_arr is not None:
                ids, tfs = decode_postings_nodl(r["payload"], int(r["n"]))
            else:
                ids, tfs, dls = decode_postings(r["payload"], int(r["n"]))
                dls_l.append(dls)
            ids_l.append(ids)
            tfs_l.append(tfs)
        idf = math.log(1.0 + (self.n_docs - df_g + 0.5) / (df_g + 0.5))
        ids = np.concatenate(ids_l)
        tfs = np.concatenate(tfs_l)
        if dl_arr is not None:
            # per-doc lengths gathered from the resident array — equal
            # by construction to the payload's dls stream (same build
            # pipeline wrote both; bitwise-gated in tests)
            dls = dl_arr[ids].astype(np.int64)
        else:
            dls = np.concatenate(dls_l)
        if self._deleted is not None:
            # tombstone mask (Lucene-liveDocs): the doc stops
            # matching; df/idf stay encode-time until compaction
            keep = self._mask_deleted(ids)
            ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            if not ids.size:
                return None
        bsz = self.cfg.block_size
        starts = np.arange(0, ids.size, bsz)
        scores = bm25_scores_np(
            tfs, dls, idf, self.cfg.k1, self.cfg.b, self.avgdl
        )
        block_last = ids[np.minimum(starts + bsz - 1, ids.size - 1)]
        block_max = np.maximum.reduceat(scores, starts)
        return TermPostings(
            term=t,
            df=df_g,
            idf=idf,
            doc_ids=ids,
            tfs=tfs,
            dls=dls,
            block_last=block_last.astype(np.int64),
            block_max=block_max.astype(np.float64),
            block_size=self.cfg.block_size,
        )

    def _fetch_decode_one(self, t: str) -> TermPostings | None:
        """One term's fetch job + decode, for the pipelined cold path."""
        with _FETCH_SEM:
            tbl = self._fetch_table([t], ["term", "shard", "df", "n", "payload"])
        rs = [
            {"shard": tbl.column("shard")[i].as_py(),
             "df": tbl.column("df")[i].as_py(),
             "n": tbl.column("n")[i].as_py(),
             "payload": tbl.column("payload")[i].as_py()}
            for i in range(tbl.num_rows)
        ]
        rs.sort(key=lambda r: r["shard"])
        return self._rows_to_postings(t, rs)

    def fetch_terms(self, terms: list[str]) -> dict[str, TermPostings | None]:
        missing = [t for t in dict.fromkeys(terms) if t not in self._cache]
        if missing:
            # big-index multi-term cold fetch: pipeline per-term
            # fetch+decode in driver threads — the decode of the first
            # terms overlaps the transfer of the rest (numpy releases
            # the GIL on large arrays), so cold wall time approaches
            # max(transfer) + one term's decode instead of
            # sum(transfer) + sum(decode). The measured 1.6M-doc eager
            # worst case was 0.46 s fetch + ~2.4 s serial decode — the
            # decode, not the socket, dominated (round-3 VERDICT item
            # 2). Same size gate as _collect_segments: per-job overhead
            # swamps the win on small indexes.
            if len(missing) > 1 and self.n_docs >= 200_000:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=min(8, len(missing))) as ex:
                    for t, tp in zip(missing, ex.map(self._fetch_decode_one, missing)):
                        self._cache[t] = tp
            else:
                tbl = self._collect_segments(
                    missing, ["term", "shard", "df", "n", "payload"]
                )
                cols = {
                    name: tbl.column(name).to_pylist()
                    for name in ("term", "shard", "df", "n")
                }
                payloads = tbl.column("payload")
                by_term: dict[str, list] = {}
                for i in range(tbl.num_rows):
                    by_term.setdefault(cols["term"][i], []).append(
                        {"shard": cols["shard"][i], "df": cols["df"][i],
                         "n": cols["n"][i], "payload": payloads[i].as_py()}
                    )
                for t in missing:
                    rs = sorted(by_term.get(t, []), key=lambda r: r["shard"])
                    self._cache[t] = self._rows_to_postings(t, rs)
        return {t: self._cache[t] for t in dict.fromkeys(terms)}

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        """Dictionary-only lookup: global df per term from a bucket-pruned
        columnar read of (term, df) — parquet never materializes the
        payload column, so this is safe at any index size and is what the
        driver/distributed dispatch decision is based on."""
        missing = [t for t in dict.fromkeys(terms) if t not in self._df_cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in missing})
            rows = (
                self._segments.filter(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .groupBy("term")
                .agg(F.max("df").alias("df"))
                .collect()
            )
            got = {r["term"]: int(r["df"]) for r in rows}
            for t in missing:
                self._df_cache[t] = got.get(t, 0)
        return {t: self._df_cache[t] for t in dict.fromkeys(terms)}

    def term_block_meta(self, terms: list[str]) -> dict[str, list | None]:
        """Per-term block METADATA (no payload bytes): for each term a
        shard-sorted list of ``{shard, df, idf, avgdl, first, last,
        max_score}`` entries with compact numpy block arrays, or None
        for absent terms. Shared process-wide across readers of the same
        index version (``_SharedIndexMeta``), so a fresh reader's cold
        block-selected query skips the metadata hop entirely — the fused
        replacement for hop 1 (VERDICT round-3 item 2). Also settles df,
        so the dispatch pre-check and this fetch are one job, not two.
        Bounded by ``META_CACHE_MAX_BLOCKS``; parquet column pruning
        keeps payload bytes unread (same scan shape as ``term_dfs``)."""
        # grab references to already-cached entries FIRST: the shared
        # cache may be wiped wholesale (by this call's own over-bound
        # eviction or by a concurrent reader's) between here and the
        # return, and the local references survive the wipe — indexing
        # the cache at return time would KeyError on evicted terms
        _absent = object()
        out: dict[str, list | None] = {}
        missing: list[str] = []
        for t in dict.fromkeys(terms):
            v = self._meta_cache.get(t, _absent)
            if v is _absent:
                missing.append(t)
            else:
                out[t] = v
        if missing:
            tbl = self._collect_segments(
                missing, ["term", "shard", "df", "block_meta", "idf", "avgdl"]
            )
            cols = {
                n: tbl.column(n).to_pylist()
                for n in ("term", "shard", "df", "idf", "avgdl")
            }
            # arrow-native flatten of the list<struct> column: one
            # zero-ish-copy pass to contiguous numpy + per-row offset
            # slices — to_pylist materialized one Python dict per block
            # and dominated the metadata hop (~0.7-1.0 s at 40k blocks)
            bm = tbl.column("block_meta").combine_chunks()
            vals = bm.values
            offs = bm.offsets.to_numpy()
            f_all = vals.field("block_first").to_numpy(zero_copy_only=False)
            l_all = vals.field("block_last").to_numpy(zero_copy_only=False)
            s_all = vals.field("max_score").to_numpy(zero_copy_only=False)
            by_term: dict[str, list] = {}
            n_new = 0
            for i in range(tbl.num_rows):
                lo, hi = int(offs[i]), int(offs[i + 1])
                n_new += hi - lo
                by_term.setdefault(cols["term"][i], []).append({
                    "shard": int(cols["shard"][i]),
                    "df": int(cols["df"][i]),
                    "idf": float(cols["idf"][i]),
                    "avgdl": float(cols["avgdl"][i]),
                    "first": np.ascontiguousarray(f_all[lo:hi], dtype=np.int64),
                    "last": np.ascontiguousarray(l_all[lo:hi], dtype=np.int64),
                    "max_score": np.ascontiguousarray(s_all[lo:hi], dtype=np.float64),
                })
            sh = self._shared
            if sh is not None:
                with sh.lock:
                    sh.meta_blocks += n_new
                    if sh.meta_blocks > self.META_CACHE_MAX_BLOCKS:
                        sh.meta.clear()
                        sh.meta_blocks = n_new
            for t in missing:
                rs = sorted(by_term.get(t, []), key=lambda r: r["shard"])
                out[t] = rs or None
                self._meta_cache[t] = out[t]
                self._df_cache[t] = int(rs[0]["df"]) if rs else 0
        return out

    def fetch_term_rows(self, terms: list[str]) -> dict[str, list | None]:
        """Q1 lazy variant: fetch segment rows (payload + block skip
        metadata) WITHOUT decoding postings; decode happens block-by-block
        inside the WAND executor only for surviving blocks."""
        missing = [t for t in dict.fromkeys(terms) if t not in self._row_cache]
        if missing:
            # concurrent Arrow-native collect (see _collect_segments) —
            # payload and the list<struct> block_meta ride Arrow IPC.
            tbl = self._collect_segments(
                missing,
                ["term", "shard", "df", "n", "payload", "block_meta", "idf", "avgdl"],
            )
            cols = {
                name: tbl.column(name).to_pylist()
                for name in ("term", "shard", "df", "n", "block_meta", "idf", "avgdl")
            }
            payloads = tbl.column("payload")
            by_term: dict[str, list] = {}
            for i in range(tbl.num_rows):
                by_term.setdefault(cols["term"][i], []).append(
                    {"shard": cols["shard"][i], "df": cols["df"][i], "n": cols["n"][i],
                     "payload": payloads[i], "block_meta": cols["block_meta"][i],
                     "idf": cols["idf"][i], "avgdl": cols["avgdl"][i]}
                )
            for t in missing:
                rs = sorted(by_term.get(t, []), key=lambda r: r["shard"])
                self._row_cache[t] = rs or None
                if rs:
                    self._df_cache[t] = int(rs[0]["df"])
        return {t: self._row_cache[t] for t in dict.fromkeys(terms)}

    def _lazy_cursors(self, query: str) -> list[LazyTermPostings]:
        qterms = self._analyze(query)
        got = self.fetch_term_rows(qterms)
        out = []
        for t in qterms:
            rs = got.get(t)
            if not rs:
                continue
            df_g = int(rs[0]["df"])
            idf_now = math.log(1.0 + (self.n_docs - df_g + 0.5) / (df_g + 0.5))
            out.append(
                LazyTermPostings(
                    t, df_g, idf_now,
                    [
                        (r["payload"].as_py(), r["block_meta"], float(r["idf"]),
                         float(r["avgdl"]))
                        for r in rs
                    ],
                    avgdl_now=self.avgdl,
                )
            )
        return out

    def topk_lazy(self, query: str, k: int = 10, return_stats: bool = False):
        """Ranked top-k via block-lazy WAND: only surviving blocks are
        decoded (the cold-query path — no full-payload decode, and after
        the row fetch no further Spark jobs). Results are identical to
        ``topk``; with ``return_stats`` also returns
        {'blocks_decoded', 'blocks_total'}."""
        if self._deleted is not None:
            # stored block bounds/firsts can reference tombstoned docs;
            # serve via the masked full-decode scorer until compaction
            tp = self._postings(query)
            res = (
                dense_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl,
                           self.n_docs)
                if self.n_docs <= self.DENSE_MAX_DOCS
                else naive_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl)
            )
            if return_stats:
                return res, {"blocks_decoded": 0, "blocks_total": 0,
                             "tombstone_fallback": True}
            return res
        cursors = self._lazy_cursors(query)
        res = wand_topk_lazy(cursors, k, self.cfg.k1, self.cfg.b, self.avgdl)
        if return_stats:
            stats = {
                "blocks_decoded": sum(c.blocks_decoded for c in cursors),
                "blocks_total": int(sum(c.nb for c in cursors)),
            }
            return res, stats
        return res

    def topk_block_selected(self, query: str, k: int = 10, return_stats: bool = False):
        """Cold-path exact top-k with BLOCK-SELECTED (byte-range) fetch
        (VERDICT round 2 item 3 / ROUND_NOTES open item 2): the measured
        cold bottleneck at 1.6M docs was payload TRANSFER, so this lane
        moves only the bytes of blocks that can matter.

        Hop 1 reads dictionary + block metadata ONLY (parquet column
        pruning keeps payload bytes unread). Driver-side, from stored
        per-block max_scores it derives:

        * θ0 — a certified LOWER bound on the k-th best total score:
          within one term, distinct blocks hold distinct docs, and the
          doc achieving a block's encode-time max has, under current
          stats, a score >= stored·(idf_now/idf_stored)·min(1,
          avgdl_now/avgdl_stored) (the tf-factor shrinks at most
          proportionally to an avgdl DROP — mirror of the upper-bound
          argument). So for any term with >= k blocks, the k-th largest
          such per-block lower bound is achieved by >= k distinct docs;
          θ0 = max over terms.
        * an interval sweep of per-doc-range UPPER bounds (sum of each
          term's covering-block upper bound); a block is fetched iff
          some doc interval it covers has UB >= θ0.

        When θ0 alone prunes nothing (multi-rare-term queries: every
        summed UB beats the best single-term bound), an ADAPTIVE second
        round probes the highest-UB intervals within a small block
        budget, scores them exactly on the partial cursors, and uses the
        k-th achieved score as θ1 — a certified lower bound on S_k, since
        partial sums only underestimate and any k achieved scores are
        real docs' scores — then re-selects. Only if θ1 still prunes less
        than BLOCKSEL_MAX_FRACTION does the lane bail to the eager fetch.

        Exactness: any doc with true score >= θ0 lies in a surviving
        interval, so ALL its blocks (every term) are fetched and it is
        scored fully; an unfetched doc has true score < θ0 <= S_k and
        cannot enter the top-k (a partially-scored doc's computed score
        only underestimates an already-losing score). Scores of the
        returned docs are computed by the same lazy-WAND kernel —
        bitwise-identical to every other exact lane.

        Hop 2 slices exactly the selected blocks executor-side
        (codec.slice_blocks — byte surgery, no decode) and collects the
        slices; at 10^11-posting terms the moved bytes are ∝ surviving
        blocks, not ∝ posting lists. Results are NOT cached (slices are
        partial; the warm cache stays full-fidelity)."""
        from .codec import slice_blocks

        qterms = list(dict.fromkeys(self._analyze(query)))
        empty_stats = {"blocks_selected": 0, "blocks_total": 0}
        if not qterms or k <= 0:
            return ([], empty_stats) if return_stats else []
        if self._deleted is not None:
            # block selection certifies theta from stored per-block
            # bounds whose achieving doc may be tombstoned; fall back to
            # the masked full-decode scorer until compaction
            res = self.topk_lazy(query, k)
            if return_stats:
                return res, dict(empty_stats, tombstone_fallback=True)
            return res

        # ---- hop 1: metadata only (process-shared, so usually free) ------
        meta = self.term_block_meta(qterms)
        terms = [t for t in qterms if meta.get(t)]
        if not terms:
            return ([], empty_stats) if return_stats else []

        info: dict[str, dict] = {}
        blocks_total = 0
        for t in terms:
            rs = meta[t]
            df_g = rs[0]["df"]
            idf_now = math.log(1.0 + (self.n_docs - df_g + 0.5) / (df_g + 0.5))
            firsts, lasts, ubs, lbs, row_of, idx_in_row = [], [], [], [], [], []
            for ri, r in enumerate(rs):
                ir = idf_now / r["idf"] if r["idf"] else 1.0
                ar = (self.avgdl / r["avgdl"]) if r["avgdl"] > 0.0 else 1.0
                up = ir * max(1.0, ar)
                dn = ir * min(1.0, ar)
                nb = r["first"].size
                firsts.append(r["first"])
                lasts.append(r["last"])
                ubs.append(np.nextafter(r["max_score"] * up * (1.0 + 1e-12), np.inf))
                lbs.append(np.nextafter(r["max_score"] * dn * (1.0 - 1e-12), -np.inf))
                row_of.append(np.full(nb, ri, dtype=np.int64))
                idx_in_row.append(np.arange(nb, dtype=np.int64))
            info[t] = {
                "df": df_g, "idf_now": idf_now, "rows": rs,
                "first": np.concatenate(firsts),
                "last": np.concatenate(lasts),
                "ub": np.concatenate(ubs), "lb": np.concatenate(lbs),
                "row_of": np.concatenate(row_of), "idx": np.concatenate(idx_in_row),
            }
            blocks_total += int(info[t]["first"].size)

        theta0 = -math.inf
        for t in terms:
            lb = info[t]["lb"]
            if lb.size >= k:
                theta0 = max(theta0, float(np.partition(lb, lb.size - k)[lb.size - k]))

        # ---- interval sweep over merged block boundaries ----------------
        pts = np.unique(np.concatenate(
            [info[t]["first"] for t in terms] + [info[t]["last"] + 1 for t in terms]
        ))
        diff = np.zeros(pts.size + 1)
        for t in terms:
            lo = np.searchsorted(pts, info[t]["first"], side="right") - 1
            hi = np.searchsorted(pts, info[t]["last"], side="right") - 1
            np.add.at(diff, lo, info[t]["ub"])
            np.add.at(diff, hi + 1, -info[t]["ub"])
            info[t]["lo_seg"], info[t]["hi_seg"] = lo, hi
        ub_seg = np.cumsum(diff[:-1])

        def select(surviving: np.ndarray):
            """Surviving-interval mask -> per-(term, shard) block pick: a
            block is fetched iff it overlaps >=1 surviving interval."""
            surv_pref = np.concatenate(([0], np.cumsum(surviving)))
            sel_map: dict[tuple[str, int], np.ndarray] = {}
            n_sel = 0
            for t in terms:
                inf_t = info[t]
                need = (surv_pref[inf_t["hi_seg"] + 1] - surv_pref[inf_t["lo_seg"]]) > 0
                n_sel += int(need.sum())
                for ri, r in enumerate(inf_t["rows"]):
                    sel = inf_t["idx"][(inf_t["row_of"] == ri) & need]
                    if sel.size:
                        sel_map[(t, r["shard"])] = np.sort(sel)
            return sel_map, n_sel

        meta_t = (
            "array<struct<block_first:long,block_last:long,max_tf:int,"
            "max_score:double,byte_offset:long,tf_off:long,dl_off:long,"
            "n_docs:int>>"
        )

        def fetch_cursors(sel_map):
            """Slice exactly the selected blocks executor-side
            (codec.slice_blocks — byte surgery, no decode) and build lazy
            cursors over the partial payloads; moved bytes are ∝ selected
            blocks, never ∝ posting lists."""
            fetch_terms = sorted({t for (t, _s) in sel_map})
            if not fetch_terms:
                return []

            def slice_sel(batches):
                import pandas as pd

                for pdf in batches:
                    out = {"term": [], "shard": [], "payload": [], "block_meta": []}
                    for r in pdf.itertuples():
                        sel = sel_map.get((r.term, int(r.shard)))
                        if sel is None:
                            continue
                        pl, ms = slice_blocks(bytes(r.payload), list(r.block_meta), sel)
                        out["term"].append(r.term)
                        out["shard"].append(int(r.shard))
                        out["payload"].append(pl)
                        out["block_meta"].append(ms)
                    if out["term"]:
                        yield pd.DataFrame(out)

            buckets = sorted(
                {term_bucket(t, self.cfg.term_buckets) for t in fetch_terms}
            )
            segs = self._segments.filter(
                F.col("bucket").isin(buckets) & F.col("term").isin(fetch_terms)
            ).select("term", "shard", "payload", "block_meta")
            got = segs.mapInPandas(
                slice_sel, schema=f"term string, shard int, payload binary, block_meta {meta_t}"
            ).toArrow()
            g = {n: got.column(n).to_pylist() for n in ("term", "shard", "block_meta")}
            pays = got.column("payload")
            sub_rows: dict[str, list] = {}
            for i in range(got.num_rows):
                sub_rows.setdefault(g["term"][i], []).append(
                    (int(g["shard"][i]), pays[i].as_py(), g["block_meta"][i])
                )
            cursors = []
            for t in terms:
                rs = sub_rows.get(t)
                if not rs:
                    continue
                rs.sort(key=lambda x: x[0])
                stored = {r["shard"]: (r["idf"], r["avgdl"]) for r in info[t]["rows"]}
                cursors.append(
                    LazyTermPostings(
                        t, info[t]["df"], info[t]["idf_now"],
                        [
                            (pl, ms, stored[sh][0], stored[sh][1])
                            for sh, pl, ms in rs
                        ],
                        avgdl_now=self.avgdl,
                    )
                )
            return cursors

        sel_map, blocks_selected = select(ub_seg >= theta0)
        cap = self.BLOCKSEL_MAX_FRACTION * blocks_total
        theta1 = None
        probe_blocks = 0
        if (
            blocks_selected > cap
            and len(terms) >= 2
            and blocks_total >= self.BLOCKSEL_PROBE_MIN_BLOCKS
        ):
            # ---- adaptive second round (round-3 open item 2) ------------
            # theta0 is a SINGLE-term bound (within one term, distinct
            # blocks hold distinct docs, so k blocks certify k docs); on
            # multi-rare-term queries the SUMMED upper bounds exceed it
            # almost everywhere — exactly the regime that used to bail to
            # eager. Probe the highest-UB intervals within a small block
            # budget and score them exactly: per-term contributions on
            # fetched blocks are exact, a doc with missing blocks only
            # UNDERESTIMATES its true score, and the k-th best achieved
            # score over ANY doc subset lower-bounds the global S_k — so
            # theta1 is certified and re-selection with it stays exact.
            budget = max(
                self.BLOCKSEL_PROBE_MIN_BLOCKS // 2,
                int(self.BLOCKSEL_PROBE_FRACTION * blocks_total),
            )
            order = np.argsort(-ub_seg, kind="stable")
            m = min(max(4 * k, 16), order.size)
            while True:
                mask = np.zeros(ub_seg.size, dtype=bool)
                mask[order[:m]] = True
                sel_p, n_p = select(mask)
                if n_p <= budget or m <= 1:
                    break
                m //= 2
            if 0 < n_p < blocks_selected:
                probe_blocks = n_p
                res_p = wand_topk_lazy(
                    fetch_cursors(sel_p), k, self.cfg.k1, self.cfg.b, self.avgdl
                )
                if len(res_p) == k and res_p[-1][2] > theta0:
                    theta1 = float(res_p[-1][2])
                    sel_map, blocks_selected = select(ub_seg >= theta1)

        theta = theta0 if theta1 is None else theta1
        if blocks_selected > cap:
            # bail-out (1.6M-doc study): when even the adaptive threshold
            # leaves most summed upper bounds above theta (flat multi-
            # common-term score distributions, sel fraction ~1.0), the
            # multi-hop path just adds payload-free metadata/probe jobs;
            # fall back to the one-job eager fetch + dense scorer. The
            # selective regimes — single-term / idf-dominated (theta0)
            # and multi-rare-term (theta1) — measured 0.1-9 % fetch.
            tp = self._postings(query)
            if self.n_docs <= self.DENSE_MAX_DOCS:
                res = dense_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl,
                                 self.n_docs)
            else:
                res = naive_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl)
            if return_stats:
                return res, {
                    "blocks_selected": blocks_selected,
                    "blocks_total": blocks_total,
                    "theta": theta,
                    "theta1": theta1,
                    "probe_blocks": probe_blocks,
                    "fallback": True,
                }
            return res

        # ---- hop 2: slice-fetch ONLY the selected blocks ----------------
        cursors = fetch_cursors(sel_map)
        res: list[tuple[int, int, float]] = []
        if cursors:
            res = wand_topk_lazy(cursors, k, self.cfg.k1, self.cfg.b, self.avgdl)
        if return_stats:
            return res, {
                "blocks_selected": blocks_selected,
                "blocks_total": blocks_total,
                "theta": theta,
                "theta1": theta1,
                "probe_blocks": probe_blocks,
            }
        return res

    def _postings(self, query: str) -> list[TermPostings]:
        qterms = self._analyze(query)
        got = self.fetch_terms(qterms)
        return [got[t] for t in qterms if got[t] is not None]

    # ----------------------------------------------------------- queries
    # Below this candidate-postings count the numpy full-scan scorer beats
    # the per-pivot Python loop of the WAND executor (measured: ~2 ms vs
    # ~500 ms at 10^5 postings; a 7M-posting 5-common-term query is ~2 s
    # via the eager-WAND loop vs ~100 ms via the dense scatter-add).
    # Queries above ``driver_fetch_max_postings`` never reach the warm
    # driver path at all (cluster dispatch), so the dense/naive scorer is
    # the universal WARM executor; block-max WAND serves the cold lane
    # (``topk_lazy``, where skipped blocks save fetch+decode, not just
    # score work) and the executor-side kernels.
    WAND_MIN_POSTINGS = 20_000_000
    # below this corpus size the full-scan scorer uses a dense doc_id-
    # indexed accumulator (O(n_docs) memory, ~8 B/doc driver-side) —
    # an np.unique over multi-million-posting unions was the measured
    # warm-path p50 at 1.6M docs
    DENSE_MAX_DOCS = 20_000_000

    def topk(self, query: str, k: int = 10, use_wand: bool | None = None):
        """Ranked top-k. ``use_wand=None`` picks the executor by cost:
        WAND's per-pivot Python loop only pays off when pruning skips a
        large share of a big posting universe; for small universes the
        numpy full-scan scorer is faster. Both are exact and produce
        bitwise-identical scores (tests/test_query.py), so the dispatch
        is invisible in results.

        When the query's total postings (known from a dictionary-only df
        lookup BEFORE any payload moves) exceed
        ``driver_fetch_max_postings``, the query is served cluster-side
        (``topk_distributed``) instead of materializing payloads on the
        driver — a df~10^11 term must never be driver-fetched. Below
        that cap the cold path fetches + fully decodes (vectorized) and
        scores through the dense accumulator: the measured 1.6M-doc
        breakdown of a 12M-posting query is collect 2.1 s / decode+dense
        ~0.3 s / lazy-WAND cursor loop 3.4 s — once the payload bytes
        have crossed the socket, the vectorized full decode beats lazy
        per-block decode at every driver-served size (the block skip
        structure earns its keep executor-side and in ``topk_lazy``,
        where CPU, not transfer, is the budget). Both paths return
        identical results (tests/test_lazy_wand.py)."""
        qterms = self._analyze(query)
        uncached = [t for t in qterms if t not in self._cache]
        if uncached and self._total_postings_upper > self.driver_fetch_max_postings:
            dfs = self.term_dfs(uncached)
            total = sum(dfs.values())
            if total > self.driver_fetch_max_postings:
                # over-cap single query -> the pruned SHARDED executor
                # (round-2 VERDICT item 1: topk_distributed decoded and
                # shuffled every posting; topk_sharded ships compressed
                # blocks once and block-max-prunes per range)
                return self.topk_sharded(query, k)
            # under-cap COLD query on a big index: try the block-selected
            # lane when pruning is plausible — (a) one term's idf
            # dominates the rest (theta0 regime, measured 0.1-9 % fetch:
            # single-term, or rare-term + stopwords), or (b) EVERY term
            # is rare (the adaptive-theta1 regime: co-occurrence docs
            # dominate and the probe certifies a threshold above any
            # single-term bound). The dictionary dfs are already in
            # hand; a mis-predict costs one payload-free metadata job
            # (+ a budget-capped probe in regime (b)) before the in-lane
            # eager bail-out.
            all_dfs = self.term_dfs(qterms)
            idfs = sorted(
                (
                    math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))
                    for d in all_dfs.values() if d > 0
                ),
                reverse=True,
            )
            if self._deleted is None and idfs and (
                len(idfs) == 1
                # dominance alone stopped being enough once the eager
                # lane got 3x cheaper (doclens residency + pipelined
                # decode): a merely-RELATIVELY-dominant common term
                # (e.g. df = n/2 towering over stopwords) certifies a
                # weak theta0, and the slice/probe jobs cost more than
                # the now-0.4s eager fetch (measured: 1.9s vs 0.45s on
                # the 1.6M study's q004). Require the dominant term to
                # be genuinely selective too.
                or (idfs[0] >= 2.0 * sum(idfs[1:]) and idfs[0] >= math.log(33.0))
                or idfs[-1] >= math.log(33.0)   # every df <= ~n_docs/32
            ):
                return self.topk_block_selected(query, k)
        tp = self._postings(query)
        if use_wand is None:
            use_wand = sum(t.doc_ids.size for t in tp) > self.WAND_MIN_POSTINGS
        if use_wand:
            return wand_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl)
        if self.n_docs <= self.DENSE_MAX_DOCS:
            return dense_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl, self.n_docs)
        return naive_topk(tp, k, self.cfg.k1, self.cfg.b, self.avgdl)

    def _term_docs_df(self, qterms: list[str]) -> DataFrame:
        """(doc_id, term) rows decoded executor-side from the
        bucket-pruned segments scan — the boolean-query analogue of
        ``topk_distributed``'s contribution kernel. No posting bytes
        reach the driver."""
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "n", "payload")
        bdel = (
            self.spark.sparkContext.broadcast(self._deleted)
            if self._deleted is not None
            else None
        )

        def docs_of(batches):
            import pandas as pd

            for pdf in batches:
                frames = []
                for r in pdf.itertuples():
                    ids, _, _ = decode_postings(bytes(r.payload), int(r.n))
                    if bdel is not None:
                        ids = ids[~np.isin(ids, bdel.value, assume_unique=True)]
                    frames.append(pd.DataFrame({"doc_id": ids, "term": r.term}))
                if frames:
                    yield pd.concat(frames, ignore_index=True)

        return segs.mapInPandas(docs_of, schema="doc_id long, term string")

    def bool_and_df(self, query: str) -> DataFrame:
        """Cluster-side boolean AND -> DataFrame(doc_id). The result of
        a conjunction over common terms can itself be corpus-sized, so
        the scale-correct return type is a DataFrame (write it, join
        it, count it — don't collect it). A term absent from the index
        yields an empty result (no doc can reach the full distinct-term
        count)."""
        qterms = list(dict.fromkeys(self._analyze(query)))
        if not qterms:
            return self.spark.createDataFrame([], schema="doc_id long")
        return (
            self._term_docs_df(qterms)
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"))
            .filter(F.col("nt") == len(qterms))
            .select("doc_id")
        )

    def bool_or_df(self, query: str) -> DataFrame:
        """Cluster-side boolean OR -> DataFrame(doc_id), distinct."""
        qterms = list(dict.fromkeys(self._analyze(query)))
        if not qterms:
            return self.spark.createDataFrame([], schema="doc_id long")
        return self._term_docs_df(qterms).select("doc_id").distinct()

    def search(self, tree) -> np.ndarray:
        """Boolean AST evaluation, driver lane (SURVEY.md §3.3): walks
        the tree bottom-up with the Q3/Q4 set kernels — rarest-first
        numpy intersection for AND, union for OR; a Term whose analysis
        yields several tokens is their conjunction. Returns the sorted
        matching doc_id array. Use :meth:`search_df` when the RESULT
        itself may be corpus-sized."""
        tokens = _ast_leaf_tokens(tree, chain=self.chain)
        got = self.fetch_terms(tokens)

        def docs_of(tok: str) -> np.ndarray:
            tp = got.get(tok)
            return tp.doc_ids if tp is not None else np.empty(0, dtype=np.int64)

        def ev(n) -> np.ndarray:
            if isinstance(n, Term):
                toks = self._analyze(n.t)
                if not toks:
                    return np.empty(0, dtype=np.int64)
                sets = sorted((docs_of(t) for t in toks), key=lambda a: a.size)
                out = sets[0]
                for s in sets[1:]:
                    if out.size == 0:
                        break
                    out = out[np.isin(out, s, assume_unique=True)]
                return out
            if isinstance(n, And):
                pos = [c for c in n.kids if not isinstance(c, Not)]
                neg = [c.kid for c in n.kids if isinstance(c, Not)]
                if neg and not pos:
                    _reject_bare_not(n)
                sets = sorted((ev(c) for c in pos), key=lambda a: a.size)
                if not sets:
                    return np.empty(0, dtype=np.int64)
                out = sets[0]
                for s in sets[1:]:
                    if out.size == 0:
                        break
                    out = out[np.isin(out, s, assume_unique=True)]
                # AND-NOT: set-difference bounded by the positive result
                for m in neg:
                    if out.size == 0:
                        break
                    out = out[~np.isin(out, ev(m), assume_unique=True)]
                return out
            if isinstance(n, Or):
                arrs = [a for a in (ev(c) for c in n.kids) if a.size]
                if not arrs:
                    return np.empty(0, dtype=np.int64)
                return np.unique(np.concatenate(arrs))
            if isinstance(n, Phrase):
                return self._positions().phrase_docs(n.q, slop=n.slop)
            if isinstance(n, Not):
                _reject_bare_not(n)
            raise TypeError(f"not a boolean AST node: {n!r}")

        return ev(tree)

    def search_df(self, tree) -> DataFrame:
        """Boolean AST evaluation, cluster lane: ONE executor-side decode
        of the leaf terms' postings, ONE shuffle (per-doc leaf-presence
        flags via map-side-combinable max-aggregation), then the whole
        tree compiles to a single JVM boolean expression over the flag
        columns — a depth-d tree costs d Column ops, not d shuffles of
        INTERSECT/UNION nodes. The scale shape for corpus-sized results
        at 10^12 docs.

        ``Phrase`` leaves are rejected loudly: the flag compilation
        would silently degrade a phrase to AND-of-parts (wrong
        semantics), and a phrase match set is selective by construction
        — use the driver lane (``search``/``search_topk``)."""

        def no_phrase(n):
            if isinstance(n, Phrase):
                raise ValueError(
                    "search_df does not evaluate Phrase leaves (the flag "
                    "lane would degrade them to AND-of-parts); use "
                    "search()/search_topk() — phrase match sets are "
                    "doc-id bounded"
                )
            if isinstance(n, (And, Or)):
                for c in n.kids:
                    no_phrase(c)
            elif isinstance(n, Not):
                no_phrase(n.kid)
            elif isinstance(n, TopK):
                no_phrase(n.expr)

        no_phrase(tree)
        tokens = _ast_leaf_tokens(tree, chain=self.chain)
        if not tokens:
            return self.spark.createDataFrame([], schema="doc_id long")
        flag_of = {t: f"_l{i}" for i, t in enumerate(tokens)}
        td = self._term_docs_df(tokens)
        flags = td.groupBy("doc_id").agg(
            *[
                F.max(
                    F.when(F.col("term") == t, F.lit(True)).otherwise(F.lit(False))
                ).alias(c)
                for t, c in flag_of.items()
            ]
        )

        def cond(n):
            if isinstance(n, Term):
                toks = self._analyze(n.t)
                if not toks:
                    return F.lit(False)
                c = F.col(flag_of[toks[0]])
                for t in toks[1:]:
                    c = c & F.col(flag_of[t])
                return c
            if isinstance(n, And):
                pos = [c for c in n.kids if not isinstance(c, Not)]
                neg = [c for c in n.kids if isinstance(c, Not)]
                if neg and not pos:
                    _reject_bare_not(n)
                out = F.lit(True)
                for c in pos:
                    out = out & cond(c)
                # a doc matching the And holds >= 1 positive leaf, so it
                # is present in the flags table and the negated leaf's
                # flag is an honest False when absent — ~cond is exact
                for m in neg:
                    out = out & ~cond(m.kid)
                return out
            if isinstance(n, Or):
                out = F.lit(False)
                for k in n.kids:
                    out = out | cond(k)
                return out
            if isinstance(n, Not):
                _reject_bare_not(n)
            raise TypeError(f"not a boolean AST node: {n!r}")

        return flags.filter(cond(tree)).select("doc_id")

    def search_topk(self, node: TopK):
        """Ranked top-k over a boolean filter (SURVEY.md §1.4
        ``TopK(expr, k)``): docs matching ``expr`` are BM25-scored over
        the expr's leaf tokens in DFS first-occurrence order (the same
        fixed summation order as string queries) with the deterministic
        (score DESC, doc_id ASC) tie-break — the boolean filter selects,
        the scorer ranks. Driver lane (the filter result is doc-id
        bounded by the rarest conjunct; corpus-sized filters belong to
        the DataFrame lanes)."""
        assert isinstance(node, TopK)
        matched = self.search(node.expr)
        if matched.size == 0 or node.k <= 0:
            return []
        # negated leaves filter but never score (standard retrieval
        # semantics — a MUST_NOT clause has no tf to reward)
        tokens = _ast_leaf_tokens(node.expr, positive_only=True, chain=self.chain)
        got = self.fetch_terms(tokens)
        scores = np.zeros(matched.size, dtype=np.float64)
        for t in tokens:  # DFS order -> fixed per-doc add order
            tp = got.get(t)
            if tp is None:
                continue
            pos = np.searchsorted(tp.doc_ids, matched)
            ok = (pos < tp.doc_ids.size) & (
                tp.doc_ids[np.minimum(pos, tp.doc_ids.size - 1)] == matched
            )
            contrib = tp.idf * (tp.tfs.astype(np.float64) * (self.cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + self.cfg.k1
                * (1.0 - self.cfg.b + self.cfg.b * (tp.dls.astype(np.float64) / self.avgdl))
            )
            scores[ok] += contrib[pos[ok]]
        order = np.lexsort((matched, -scores))[: node.k]
        return [(r + 1, int(matched[i]), float(scores[i])) for r, i in enumerate(order)]

    # ------------------------------------------------- phrase / proximity
    def _positions(self):
        """Lazily-constructed positional sibling reader (positions.py);
        shares this reader's tombstone mask so phrase results honor
        deletes exactly like every other lane."""
        if not hasattr(self, "_pos_reader"):
            from .positions import PositionsReader

            self._pos_reader = PositionsReader(
                self.spark, self.cat.root, self.cfg, deleted=self._deleted
            )
        return self._pos_reader

    def phrase(self, query: str, slop: int = 0) -> np.ndarray:
        """Exact-phrase (slop=0) / ordered-proximity match over the
        positional index: sorted doc ids whose parts stream contains the
        query's parts as an ordered window of span ≤ (n-1)+slop.
        Requires ``build_positions`` to have run for this index."""
        return self._positions().phrase_docs(query, slop=slop)

    def phrase_df(self, query: str, slop: int = 0) -> DataFrame:
        """Phrase match as a doc_id DataFrame (harness/hydration lane)."""
        ids = self.phrase(query, slop=slop)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def phrase_prefix(
        self, query: str, max_expansions: int = 50, slop: int = 0
    ) -> np.ndarray:
        """ES ``match_phrase_prefix`` (search-as-you-type): the last
        analyzed token is a prefix, expanded to at most
        ``max_expansions`` dictionary terms (df DESC, term ASC — capped,
        never raising) and phrase-verified per variant. See
        ``PositionsReader.phrase_prefix_docs``."""
        return self._positions().phrase_prefix_docs(
            query, max_expansions=max_expansions, slop=slop
        )

    def phrase_prefix_df(
        self, query: str, max_expansions: int = 50, slop: int = 0
    ) -> DataFrame:
        ids = self.phrase_prefix(query, max_expansions=max_expansions, slop=slop)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def span_near(
        self, terms: list[str], slop: int = 0, in_order: bool = False
    ) -> np.ndarray:
        """Lucene/ES ``span_near`` over single-term clauses (ordered or
        unordered window, span ≤ (n-1)+slop) — see
        ``PositionsReader.span_near_docs``. Tombstone-masked like every
        positional lane."""
        return self._positions().span_near_docs(
            terms, slop=slop, in_order=in_order
        )

    def span_multi_near(
        self, kind: str, pattern: str, others: list, slop: int = 0, **kw
    ) -> np.ndarray:
        """ES ``span_multi`` (Lucene ``SpanMultiTermQueryWrapper``):
        wrap a multi-term query — ``kind`` in prefix|wildcard|regex|
        fuzzy — as a SPAN CLAUSE by rewriting it into a span_or over
        the dictionary terms it matches (exactly Lucene's SpanOr
        rewrite), then run the unordered span_near with the remaining
        clauses. The expansion is the Q15 dictionary scan
        (range-pruned sorted dictionary, df-ordered deterministic cap,
        loud past max_expansions — the maxClauseCount contract), so
        the positional matcher never sees an unbounded clause.
        Unordered only, like every span_or clause.

        This index is DUAL-GRANULARITY (compound identifiers index
        alongside their split parts), while the positional stream is
        parts-only — so expansions that analyze to multiple parts
        (``sync_list`` -> sync, list) are PHRASES, not span terms, and
        are dropped from the clause: exactly the span_near single-term
        contract, applied to the rewrite set. Lucene never faces this
        (one token space per field)."""
        from .tokenize import analyze_phrase

        alts = [
            t
            for t in self.expand_terms(kind, pattern, **kw)
            if len(analyze_phrase(t)) == 1
        ]
        if not alts:
            return np.empty(0, dtype=np.int64)
        return self.span_near([alts, *others], slop=slop, in_order=False)

    def span_first(self, term: str, end: int) -> np.ndarray:
        """Lucene ``span_first``: docs where ``term`` occurs at 0-based
        position < ``end`` — see ``PositionsReader.span_first_docs``."""
        return self._positions().span_first_docs(term, end)

    def span_not(
        self, include: str, exclude, pre: int = 0, post: int = 0
    ) -> np.ndarray:
        """Lucene/ES ``span_not``: docs where some ``include``
        occurrence has no ``exclude`` occurrence within [p-pre, p+post]
        — see ``PositionsReader.span_not_docs``. ``exclude`` may be a
        list (span_or exclusion)."""
        return self._positions().span_not_docs(include, exclude, pre, post)

    def span_not_df(
        self, include: str, exclude, pre: int = 0, post: int = 0
    ) -> DataFrame:
        ids = self.span_not(include, exclude, pre=pre, post=post)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def span_near_df(
        self, terms: list[str], slop: int = 0, in_order: bool = False
    ) -> DataFrame:
        ids = self.span_near(terms, slop=slop, in_order=in_order)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def span_within(
        self, little: str, big: list[str], slop: int = 0
    ) -> np.ndarray:
        """Lucene/ES ``span_within``: docs where a ``little`` occurrence
        lies inside an unordered span_near match of ``big`` — see
        ``PositionsReader.span_within_docs``."""
        return self._positions().span_within_docs(little, big, slop=slop)

    def span_containing(
        self, big: list[str], little: str, slop: int = 0
    ) -> np.ndarray:
        """Lucene/ES ``span_containing``: ``big`` matches containing a
        ``little`` occurrence — doc-level identical to ``span_within``
        with flipped arguments (see PositionsReader docstring)."""
        return self._positions().span_containing_docs(big, little, slop=slop)

    def span_within_df(
        self, little: str, big: list[str], slop: int = 0
    ) -> DataFrame:
        ids = self.span_within(little, big, slop=slop)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def span_containing_df(
        self, big: list[str], little: str, slop: int = 0
    ) -> DataFrame:
        ids = self.span_containing(big, little, slop=slop)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def span_first_df(self, term: str, end: int) -> DataFrame:
        ids = self.span_first(term, end)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def intervals(self, rule) -> np.ndarray:
        """ES ``intervals`` query (match / any_of / all_of rule tree,
        minimal-interval semantics) — see ``yase_spark.intervals``."""
        from .intervals import intervals_docs

        return intervals_docs(self._positions(), rule)

    def intervals_df(self, rule) -> DataFrame:
        ids = self.intervals(rule)
        return self.spark.createDataFrame(
            [(int(d),) for d in ids], schema="doc_id long"
        )

    def rank_doc_set(
        self, matched, query: str, k: int = 10,
        tokens: list[str] | None = None,
    ):
        """BM25-rank a pre-selected SORTED doc-id set: the caller's
        filter (phrase match, trigram grep, any candidate generator)
        selects, the standard scorer ranks over the query's unique
        tokens in first-occurrence order with the deterministic
        (score DESC, doc_id ASC) tie-break — the generic Lucene
        filter-query + scorer composition. Full-corpus statistics
        (restriction commutes with scoring, the ``topk_where``
        convention). Returns [(rank, doc_id, score)]."""
        matched = np.asarray(matched, dtype=np.int64)
        if matched.size == 0 or k <= 0:
            return []
        if tokens is None:
            tokens = list(dict.fromkeys(self._analyze(query)))
        got = self.fetch_terms(tokens)
        scores = np.zeros(matched.size, dtype=np.float64)
        for t in tokens:
            tp = got.get(t)
            if tp is None:
                continue
            pos = np.searchsorted(tp.doc_ids, matched)
            ok = (pos < tp.doc_ids.size) & (
                tp.doc_ids[np.minimum(pos, tp.doc_ids.size - 1)] == matched
            )
            contrib = tp.idf * (tp.tfs.astype(np.float64) * (self.cfg.k1 + 1.0)) / (
                tp.tfs.astype(np.float64)
                + self.cfg.k1
                * (1.0 - self.cfg.b + self.cfg.b * (tp.dls.astype(np.float64) / self.avgdl))
            )
            scores[ok] += contrib[pos[ok]]
        order = np.lexsort((matched, -scores))[:k]
        return [(r + 1, int(matched[i]), float(scores[i])) for r, i in enumerate(order)]

    def topk_lmd(self, query: str, k: int = 10, mu: float = 2000.0):
        """Ranked top-k under the LM Dirichlet similarity (Zhai &
        Lafferty query likelihood, Lucene ``LMDirichletSimilarity``
        formulation): per MATCHED term::

            max(0, ln(1 + tf / (mu * cf/T)) + ln(mu / (mu + dl)))

        with ``cf`` the term's collection frequency, ``T`` total corpus
        tokens, and the per-term clamp at 0 Lucene applies. Pluggable-
        similarity row: same fetch, same union-of-postings eager lane,
        same (score DESC, doc_id ASC) tie-break as BM25 — only the
        contribution expression differs, which is the whole point of a
        similarity abstraction. Returns [(rank, doc_id, score)]."""
        tokens = list(dict.fromkeys(self._analyze(query)))
        if not tokens or k <= 0:
            return []
        got = self.fetch_terms(tokens)
        present = [t for t in tokens if got.get(t) is not None]
        if not present:
            return []
        # collection frequencies: dictionary-sized aggregate (cf is the
        # term-global value duplicated per shard row, like df)
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in present})
        cf_rows = (
            self._segments.filter(
                F.col("bucket").isin(buckets) & F.col("term").isin(present)
            )
            .groupBy("term").agg(F.max("cf").alias("cf"))
            .collect()
        )
        cf = {r["term"]: int(r["cf"]) for r in cf_rows}
        # exact corpus token count (stats table), not avgdl*n_docs —
        # the float product is not bit-identical to the stored integer
        total_tokens = float(self._total_postings_upper)

        lists = [got[t].doc_ids for t in present]
        union = lists[0]
        for arr in lists[1:]:
            union = np.union1d(union, arr)
        scores = np.zeros(union.size, dtype=np.float64)
        for t in present:
            tp = got[t]
            p_c = cf[t] / total_tokens
            pos = np.searchsorted(tp.doc_ids, union)
            ok = (pos < tp.doc_ids.size) & (
                tp.doc_ids[np.minimum(pos, tp.doc_ids.size - 1)] == union
            )
            tf = tp.tfs.astype(np.float64)
            dl = tp.dls.astype(np.float64)
            # ln(1 + x) spelled as in the SQL oracle (log1p's extra
            # precision would diverge in the last ulp)
            contrib = np.maximum(
                0.0,
                np.log(1.0 + tf / (mu * p_c)) + np.log(mu / (mu + dl)),
            )
            scores[ok] += contrib[pos[ok]]
        order = np.lexsort((union, -scores))[:k]
        return [
            (r + 1, int(union[i]), float(scores[i]))
            for r, i in enumerate(order)
        ]

    def topk_after(
        self, query: str, k: int = 10, after: tuple[float, int] | None = None
    ):
        """Deep paging (Lucene ``searchAfter``): the next ``k`` results
        STRICTLY after the ``(score, doc_id)`` cursor in the global
        (score DESC, doc_id ASC) order — page boundaries are exact and
        stable because the cursor is a value, not an offset (a
        re-executed page never skips or repeats under identical data).

        Served from the eager lane: deep cursors make block-max pruning
        ineffective by construction (the heap threshold falls with
        every page), so the honest cost model is the full candidate
        scoring the dense path already does — the same decay Lucene
        accepts for searchAfter. Scores are computed by the identical
        per-term accumulation as ``rank_doc_set``/``topk``, so pages
        concatenate bitwise with page one.

        ``after=None`` returns page one (== ``topk`` modulo lane).
        Returns [(rank, doc_id, score)] with rank continuing 1..k
        within the page."""
        tokens = list(dict.fromkeys(self._analyze(query)))
        if not tokens or k <= 0:
            return []
        got = self.fetch_terms(tokens)
        lists = [got[t].doc_ids for t in tokens if got.get(t) is not None]
        if not lists:
            return []
        union = lists[0]
        for arr in lists[1:]:
            union = np.union1d(union, arr)
        ranked = self.rank_doc_set(union, query, union.size, tokens=tokens)
        if after is not None:
            a_s, a_d = float(after[0]), int(after[1])
            ranked = [
                (r, d, s) for r, d, s in ranked
                if s < a_s or (s == a_s and d > a_d)
            ]
        return [(i + 1, d, s) for i, (_, d, s) in enumerate(ranked[:k])]

    def phrase_topk(self, query: str, k: int = 10, slop: int = 0):
        """BM25-ranked phrase results: the phrase filter selects, the
        scorer ranks over the phrase's UNIQUE parts in first-occurrence
        order (the engine's fixed summation order) with the
        deterministic (score DESC, doc_id ASC) tie-break — Lucene's
        PhraseQuery contract (match requires adjacency, score is the
        standard per-term sum). Returns [(rank, doc_id, score)]."""
        return self.rank_doc_set(
            self.phrase(query, slop=slop), query, k,
            tokens=list(dict.fromkeys(analyze_phrase(query))),
        )

    def highlight_topk(self, query: str, k: int = 10, width: int = 30):
        """Ranked top-k with a best-passage highlight per hit: the
        ``width``-token window of each result doc containing the most
        DISTINCT query parts (tie: smallest start), from the positional
        sibling index. Lucene's unified-highlighter contract shape —
        only the k hits are highlighted, never the corpus. Returns
        ``[(rank, doc_id, score, win_start, n_hits)]`` with 0-based
        parts-stream positions; hydrate text via
        ``positions.snippet_df`` (content never lives in the index)."""
        rows = self.topk(query, k)
        if not rows:
            return []
        parts = list(dict.fromkeys(analyze_phrase(query)))
        wins = self._positions().best_windows(
            parts, [d for _, d, _ in rows], width=width
        )
        # a hit with none of the query PARTS (e.g. matched only via an
        # n-gram token) gets the honest empty window
        return [
            (r, d, s, *wins.get(d, (-1, 0))) for r, d, s in rows
        ]

    def explain(self, query: str, k: int = 10):
        """Per-term score breakdown for the top-k hits (Lucene's
        ``IndexSearcher.explain`` contract, batched): one row per
        (hit, matched query term) with the raw tf and that term's BM25
        contribution, plus the hit's total. The ranking comes from the
        ordinary ``topk`` dispatch; the breakdown reuses the already-
        fetched postings (searchsorted per term over k doc ids — no new
        corpus or index IO beyond the query itself), so explaining is
        O(q terms * k), independent of corpus size.

        Returns ``[(rank, doc_id, term, tf, contrib, total)]`` sorted
        by (rank, term); terms absent from a hit emit no row."""
        rows = self.topk(query, k)
        if not rows:
            return []
        qterms = list(dict.fromkeys(self._analyze(query)))
        got = self.fetch_terms(qterms)
        out = []
        for r, d, total in rows:
            for t in qterms:
                tp = got.get(t)
                if tp is None:
                    continue
                i = int(np.searchsorted(tp.doc_ids, d))
                if i >= tp.doc_ids.size or tp.doc_ids[i] != d:
                    continue
                contrib = _score_one(
                    float(tp.tfs[i]), float(tp.dls[i]), tp.idf,
                    self.cfg.k1, self.cfg.b, self.avgdl,
                )
                out.append((r, d, t, int(tp.tfs[i]), contrib, total))
        return out

    # ------------------------------------------- multi-term expansion
    def _expander(self):
        """Lazily-constructed dictionary expander (expand.py): prefers
        the sorted ``dictionary`` table (Parquet min/max range pruning),
        falls back to a columnar (term, df) scan of segments."""
        if not hasattr(self, "_term_expander"):
            from .expand import TermExpander

            self._term_expander = TermExpander(self.spark, self.cat.root)
        return self._term_expander

    def expand_terms(self, kind: str, pattern, **kw) -> list[str]:
        """Dictionary expansion: ``kind`` in prefix|wildcard|regex|fuzzy
        (Lucene MultiTermQuery analogues), capped at max_expansions
        (highest-df first)."""
        ex = self._expander()
        return getattr(ex, kind)(pattern, **kw)

    def multi_term_search(self, kind: str, pattern, **kw) -> np.ndarray:
        """Boolean OR over the expansion set -> sorted doc ids (the
        constant-score MultiTermQuery rewrite). Driver lane; the
        expansion cap bounds the fetch."""
        terms = self.expand_terms(kind, pattern, **kw)
        if not terms:
            return np.empty(0, dtype=np.int64)
        got = self.fetch_terms(terms)
        tps = [tp for tp in got.values() if tp is not None]
        return bool_or(tps) if tps else np.empty(0, dtype=np.int64)

    def multi_term_topk(self, kind: str, pattern, k: int = 10, **kw):
        """BM25-ranked disjunction over the expansion set (the scoring
        MultiTermQuery rewrite): the expansion terms feed the same
        block-max WAND executor as an ordinary multi-term query, in the
        expander's deterministic (df DESC, term ASC) order."""
        terms = self.expand_terms(kind, pattern, **kw)
        if not terms or k <= 0:
            return []
        got = self.fetch_terms(terms)
        tps = [got[t] for t in terms if got[t] is not None]
        return wand_topk(tps, k, self.cfg.k1, self.cfg.b, self.avgdl)

    def match_bool_prefix(
        self, query: str, k: int = 10, max_expansions: int = 50
    ):
        """ES ``match_bool_prefix``: every analyzed token is a term
        clause except the LAST, which is a prefix — "quick brown f"
        matches docs containing quick, brown, or anything starting with
        f (the unordered complement of ``match_phrase_prefix``, which
        demands adjacency). The prefix expands through the sorted
        dictionary CAPPED at ``max_expansions`` in df-DESC order
        (``prefix_capped`` — search-as-you-type must degrade, never
        error), and the union of full terms + expansions ranks as an
        ordinary BM25 disjunction on the block-max WAND executor — the
        scoring MultiTermQuery rewrite, consistent with
        ``multi_term_topk`` (Lucene's constant-score prefix default is
        deliberately not reproduced: a ranked suggest surface wants the
        idf signal). Returns [(rank, doc_id, score)]."""
        toks = self._analyze(query)
        if not toks or k <= 0:
            return []
        full, pre = toks[:-1], toks[-1]
        expansions = self._expander().prefix_capped(pre, max_expansions)
        terms = list(dict.fromkeys(full + expansions))
        if not terms:
            return []
        got = self.fetch_terms(terms)
        tps = [got[t] for t in terms if got[t] is not None]
        if not tps:
            return []
        return wand_topk(tps, k, self.cfg.k1, self.cfg.b, self.avgdl)

    # ---------------------------------------------- request cache
    RESULTS_CACHE_MAX = 256

    def topk_cached(self, query: str, k: int = 10):
        """ES shard-request-cache analogue: memoize ranked top-k
        results in the process-shared per-index-VERSION registry
        (``_SharedIndexMeta``), so a repeated query costs zero Spark
        jobs for every reader of the same index version. Invalidation
        is STRUCTURAL, never TTL: any append/delete/compact bumps a
        catalog version, new readers key onto a fresh registry entry,
        and the stale entry ages out of the FIFO registry — exactly why
        ES keys its request cache on the shard's reader version.
        Bounded: ``RESULTS_CACHE_MAX`` entries per version, LRU; each
        entry is k rows. A reader without shared metadata
        (``shared_meta=False``) serves uncached."""
        if self._shared is None:
            return self.topk(query, k)
        key = ("topk", query, int(k))
        sh = self._shared
        with sh.lock:
            hit = sh.results.get(key)
            if hit is not None:
                sh.results.pop(key)      # LRU touch: reinsert newest
                sh.results[key] = hit
                return [tuple(r) for r in hit]
        rows = [tuple(r) for r in self.topk(query, k)]
        with sh.lock:
            sh.results[key] = tuple(rows)
            while len(sh.results) > self.RESULTS_CACHE_MAX:
                sh.results.pop(next(iter(sh.results)))
        return rows

    # ---------------------------------------------------- synonyms
    def synonyms_for(self, terms: list[str]) -> dict[str, list[str]]:
        """Variants per analyzed query term from the ``synonyms``
        sibling table (build_synonyms). One vocabulary-sized scan with
        the term list pushed as an ``isin`` predicate (Parquet min/max
        pruning — the table is written term-sorted); an index without
        a synonyms table expands to nothing."""
        if not terms or not self.cat.exists("synonyms"):
            return {}
        rows = (
            self.cat.read(self.spark, "synonyms")
            .filter(F.col("term").isin(sorted(set(terms))))
            .collect()
        )
        out: dict[str, list[str]] = {}
        for r in rows:
            out.setdefault(r["term"], []).append(r["variant"])
        return {t: sorted(vs) for t, vs in out.items()}

    def synonym_expand(self, query: str, limit: int | None = None) -> list[str]:
        """Query-time synonym rewrite: each analyzed query term is
        followed by its variants (variant ASC — deterministic),
        first-occurrence dedup, capped at ``max_expansions`` like every
        other expansion (Lucene maxClauseCount)."""
        from .expand import MAX_EXPANSIONS

        limit = MAX_EXPANSIONS if limit is None else limit
        qterms = self._analyze(query)
        syn = self.synonyms_for(qterms)
        out: list[str] = []
        seen: set[str] = set()
        for t in qterms:
            for c in [t] + syn.get(t, []):
                if c not in seen:
                    seen.add(c)
                    out.append(c)
        if len(out) > limit:
            raise ValueError(
                f"synonym expansion yields {len(out)} clauses > "
                f"max_expansions={limit}; shrink the groups or the query"
            )
        return out

    def synonym_search(self, query: str) -> np.ndarray:
        """Boolean OR over the synonym-expanded term set (the
        constant-score rewrite) -> sorted doc ids."""
        terms = self.synonym_expand(query)
        if not terms:
            return np.empty(0, dtype=np.int64)
        got = self.fetch_terms(terms)
        tps = [tp for tp in got.values() if tp is not None]
        return bool_or(tps) if tps else np.empty(0, dtype=np.int64)

    def synonym_topk(self, query: str, k: int = 10):
        """BM25-ranked disjunction over the synonym-expanded set: the
        expansion feeds the ordinary block-max WAND executor in the
        deterministic synonym_expand order (each variant scores as its
        own term with its own df — the expansion rewrite, not Lucene's
        blended-df SynonymQuery, and the oracle replays exactly that)."""
        terms = self.synonym_expand(query)
        if not terms or k <= 0:
            return []
        got = self.fetch_terms(terms)
        tps = [got[t] for t in terms if got[t] is not None]
        if not tps:
            return []
        return wand_topk(tps, k, self.cfg.k1, self.cfg.b, self.avgdl)

    # ---------------------------------------------------- stemming
    def stems_for(self, stems: list[str]) -> dict[str, list[str]]:
        """Index terms per S-stem, df-descending (term ASC tie-break).
        Served from the published ``stems`` sibling when fresh (sorted
        by stem -> Parquet min/max pruning on the isin lookup); falls
        back to stemming the live (term, df) vocabulary projection on
        the fly after an append/compact — correct, loses the pruning —
        exactly the dictionary-staleness posture."""
        from .expand import s_stem_sql, stems_are_fresh

        if not stems:
            return {}
        want = sorted(set(stems))
        if stems_are_fresh(self.cat):
            d = self.cat.read(self.spark, "stems")
        else:
            d = (
                self._expander()._dic
                .select(F.expr(s_stem_sql("term")).alias("stem"), "term", "df")
            )
        rows = d.filter(F.col("stem").isin(want)).collect()
        out: dict[str, list[tuple[int, str]]] = {}
        for r in rows:
            out.setdefault(r["stem"], []).append((-int(r["df"]), r["term"]))
        return {s: [t for _, t in sorted(v)] for s, v in out.items()}

    def stem_expand(self, query: str, limit: int | None = None) -> list[str]:
        """Stemmed-query rewrite: each analyzed query term maps to ALL
        index terms sharing its S-stem ("tables" finds docs that only
        ever say "table"). Expansion order per term: df DESC, term ASC
        (recall-first, deterministic — the same cap ordering as every
        other MultiTermQuery rewrite); first-occurrence dedup across
        terms; capped at ``max_expansions``. A term whose stem matches
        nothing in the vocabulary contributes no clause (it cannot
        match anyway)."""
        from .expand import MAX_EXPANSIONS, s_stem

        limit = MAX_EXPANSIONS if limit is None else limit
        qterms = self._analyze(query)
        by_stem = self.stems_for([s_stem(t) for t in qterms])
        out: list[str] = []
        seen: set[str] = set()
        for t in qterms:
            for c in by_stem.get(s_stem(t), []):
                if c not in seen:
                    seen.add(c)
                    out.append(c)
        if len(out) > limit:
            raise ValueError(
                f"stem expansion yields {len(out)} clauses > "
                f"max_expansions={limit}"
            )
        return out

    def stem_topk(self, query: str, k: int = 10):
        """BM25-ranked disjunction over the stem-expanded term set —
        the expansion rewrite (each surface form scores with its own
        df), fed to the standard block-max WAND executor in the
        deterministic stem_expand order. The oracle replays the same
        stemmer (shared SQL text) over the corpus vocabulary and the
        same disjunction."""
        terms = self.stem_expand(query)
        if not terms or k <= 0:
            return []
        got = self.fetch_terms(terms)
        tps = [got[t] for t in terms if got[t] is not None]
        if not tps:
            return []
        return wand_topk(tps, k, self.cfg.k1, self.cfg.b, self.avgdl)

    # ------------------------------------------------ more-like-this
    def mlt_terms(self, text: str, m: int = 25, min_df: int = 1) -> list[str]:
        """Lucene-MoreLikeThis term selection: re-analyze the source
        text with the index analyzer, score each candidate term
        ``tf * ln(N/df)`` (the classic MLT interestingness), keep the
        top-m (score DESC, term ASC — deterministic). df comes from the
        dictionary/segments (term, df) projection with the candidate
        list pushed into the scan — one dictionary-sized lookup, no
        postings move."""
        from collections import Counter

        from .tokenize import tokenize_text

        tf = Counter(tokenize_text(text, ngrams=self.cfg.ngrams))
        if not tf:
            return []
        dic = self._expander()._dic.filter(F.col("term").isin(sorted(tf)))
        dfs: dict[str, int] = {
            r["term"]: int(r["df"]) for r in dic.collect()
        }
        n = float(self.n_docs)
        scored = [
            (t, tf[t] * math.log(n / dfs[t]))
            for t in sorted(tf)
            if dfs.get(t, 0) >= max(min_df, 1)
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        return [t for t, _ in scored[:m]]

    def more_like_this(
        self,
        text: str,
        k: int = 10,
        m: int = 25,
        exclude: int | None = None,
        min_df: int = 1,
    ):
        """Find-similar: the source text's top-m interesting terms
        scored as an ordinary BM25 disjunction; ``exclude`` drops the
        source document itself from the ranking (MLT's "don't return
        the query doc" rule). Driver exact lane — dense accumulation
        over the fetched postings in the fixed mlt_terms order (the
        same scorer shape as phrase_topk); a corpus-sized serve belongs
        to ``topk_where`` with a ``doc_id != …`` predicate."""
        terms = self.mlt_terms(text, m=m, min_df=min_df)
        if not terms or k <= 0:
            return []
        got = self.fetch_terms(terms)
        tps = [got[t] for t in terms if got[t] is not None]
        if not tps:
            return []
        allids = np.unique(np.concatenate([tp.doc_ids for tp in tps]))
        scores = np.zeros(allids.size, dtype=np.float64)
        for tp in tps:
            pos = np.searchsorted(allids, tp.doc_ids)
            contrib = tp.idf * (
                tp.tfs.astype(np.float64) * (self.cfg.k1 + 1.0)
            ) / (
                tp.tfs.astype(np.float64)
                + self.cfg.k1
                * (1.0 - self.cfg.b
                   + self.cfg.b * (tp.dls.astype(np.float64) / self.avgdl))
            )
            scores[pos] += contrib
        if exclude is not None:
            keep = allids != int(exclude)
            allids, scores = allids[keep], scores[keep]
        order = np.lexsort((allids, -scores))[:k]
        return [
            (r + 1, int(allids[i]), float(scores[i]))
            for r, i in enumerate(order)
        ]

    def facet_counts(self, tree, col: str, topn: int = 10) -> DataFrame:
        """Facet collection over a boolean match set: top-N values of a
        docs-table column among matching docs, (count DESC, value ASC).
        Executor-side end-to-end: the match set comes from the
        one-shuffle ``search_df`` lane and joins the docs dimension
        before a single count aggregation — nothing corpus-sized ever
        reaches the driver."""
        matched = self.search_df(tree)
        docs = self.cat.read(self.spark, "docs").select("doc_id", col)
        return (
            matched.join(docs, "doc_id")
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc(col))
            .limit(topn)
        )

    def facet_ranges(self, tree, col: str, edges: list[float]) -> DataFrame:
        """Range facets (the ES ``range`` aggregation): matching-doc
        counts per ``[edges[i], edges[i+1])`` bucket of a numeric docs
        column, every bucket emitted (count 0 included), ordered by
        bucket start. Same executor-side shape as ``facet_counts`` —
        the heavy side is one scan + count aggregation over the
        ``search_df`` match set; the bucket table is len(edges)-1 rows,
        broadcast by Catalyst. Values outside [edges[0], edges[-1])
        fall in no bucket (ES semantics for bounded ranges)."""
        assert len(edges) >= 2 and list(edges) == sorted(edges)
        matched = self.search_df(tree)
        c = F.col(col).cast("double")
        bidx = F.when(c < float(edges[0]), F.lit(None).cast("int"))
        for i in range(len(edges) - 1):
            bidx = bidx.when(c < float(edges[i + 1]), F.lit(i))
        docs = self.cat.read(self.spark, "docs").select("doc_id", col)
        counts = (
            matched.join(docs, "doc_id")
            .select(bidx.alias("bidx"))
            .filter(F.col("bidx").isNotNull())
            .groupBy("bidx")
            .agg(F.count("*").alias("cnt"))
        )
        buckets = self.spark.createDataFrame(
            [(i, float(edges[i]), float(edges[i + 1]))
             for i in range(len(edges) - 1)],
            "bidx int, lo double, hi double",
        )
        return (
            buckets.join(counts, "bidx", "left")
            .select("lo", "hi", F.coalesce("cnt", F.lit(0)).alias("cnt"))
            .orderBy("lo")
        )

    def facet_histogram(self, tree, col: str, interval: float) -> DataFrame:
        """Fixed-interval histogram facet (the ES ``histogram``
        aggregation, min_doc_count=1): bucket = floor(col/interval) *
        interval over the boolean match set, non-empty buckets only,
        ordered by bucket. One scan + one count aggregation; bucket
        arithmetic is a JVM expression (WholeStageCodegen), so the
        plan is identical to a plain groupBy at any scale."""
        assert interval > 0
        matched = self.search_df(tree)
        docs = self.cat.read(self.spark, "docs").select("doc_id", col)
        bucket = (
            F.floor(F.col(col).cast("double") / F.lit(float(interval)))
            * F.lit(float(interval))
        ).alias("bucket")
        return (
            matched.join(docs, "doc_id")
            .groupBy(bucket)
            .agg(F.count("*").alias("cnt"))
            .orderBy("bucket")
        )

    def facet_stats(self, tree, group_col: str, value_col: str) -> DataFrame:
        """ES ``extended_stats`` inside a terms bucket: per
        ``group_col`` value of the MATCHING docs, (n, min, max, sum,
        avg_r, var_r) over the integer ``value_col``. Variance is the
        sample variance computed from EXACT integer power sums with the
        explicit formula ``(Σx² − (Σx)²/n) / (n−1)`` written as the
        same arithmetic expression on both the Spark and the oracle
        side — integer sums are exact, so the doubles match bitwise
        where a built-in single-pass (Welford) estimator would not.
        Singleton buckets report variance 0.0 (ES convention). Same
        executor-side shape as the other facets: one scan + one
        grouped aggregation over the ``search_df`` match set."""
        matched = self.search_df(tree)
        docs = self.cat.read(self.spark, "docs").select(
            "doc_id", group_col, value_col
        )
        v = F.col(value_col).cast("long")
        g = (
            matched.join(docs, "doc_id")
            .groupBy(group_col)
            .agg(
                F.count("*").alias("n"),
                F.min(v).alias("mn"),
                F.max(v).alias("mx"),
                F.sum(v).alias("s"),
                F.sum(v * v).alias("ss"),
            )
        )
        n, s, ss = F.col("n"), F.col("s"), F.col("ss")
        var = F.when(
            n > 1,
            (ss.cast("double") - s.cast("double") * s.cast("double") / n.cast("double"))
            / (n.cast("double") - 1.0),
        ).otherwise(F.lit(0.0))
        return g.select(
            group_col,
            "n",
            F.col("mn").alias("min"),
            F.col("mx").alias("max"),
            F.col("s").alias("sum"),
            F.round(s.cast("double") / n.cast("double"), 6).alias("avg_r"),
            F.round(var, 6).alias("var_r"),
        ).orderBy(group_col)

    def bool_and(self, query: str) -> np.ndarray:
        """Driver boolean AND (sorted doc_id array). Dispatches to the
        cluster kernel when the dictionary-estimated postings exceed
        the driver-fetch cap — same guard as ``topk`` (the ndarray
        return still materializes the RESULT driver-side; use
        ``bool_and_df`` when the result itself may be corpus-sized)."""
        qterms = self._analyze(query)
        if self._total_postings_upper > self.driver_fetch_max_postings:
            dfs = self.term_dfs(qterms)
            if sum(dfs.values()) > self.driver_fetch_max_postings:
                rows = self.bool_and_df(query).collect()
                return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))
        tp = self._postings(query)
        qn = len(qterms)
        if len(tp) < qn:  # a query term absent from the index -> empty AND
            return np.empty(0, dtype=np.int64)
        return bool_and(tp)

    def bool_or(self, query: str) -> np.ndarray:
        """Driver boolean OR (sorted doc_id array); same cluster
        dispatch guard as ``bool_and``."""
        if self._total_postings_upper > self.driver_fetch_max_postings:
            dfs = self.term_dfs(self._analyze(query))
            if sum(dfs.values()) > self.driver_fetch_max_postings:
                rows = self.bool_or_df(query).collect()
                return np.sort(np.array([r["doc_id"] for r in rows], dtype=np.int64))
        return bool_or(self._postings(query))

    def topk_distributed(self, query: str, k: int = 10) -> DataFrame:
        """Cluster-side ranked top-k for bulk/batch workloads: decode
        segment payloads per bucket partition (mapInPandas, numpy), emit
        per-term BM25 contributions, aggregate per doc JVM-side, window
        top-k. No postings ever reach the driver — this is the serving
        path when a query set is large or the index is too big for
        driver-side fetch; the driver WAND path stays the bitwise-exact
        low-latency reference (scores here sum in arbitrary order, so
        they may differ from the oracle in final ulps; ranks agree except
        on exact float ties, which BM25 surfaces only for identical
        (tf, dl, df) tuples — in that case both orders are valid by the
        scoring rule and the deterministic doc_id tie-break still
        applies)."""
        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )
        # orderBy().limit(k) compiles to TakeOrderedAndProject — each
        # partition keeps a local k-heap, the driver merges P·k rows; the
        # rank window then runs on k rows only (never a global sort).
        top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
            "rank", "doc_id", "score"
        )

    def contrib_df(
        self, qterms: list[str], weight: float | dict = 1.0,
        include_term: bool = False,
        df_override: dict | None = None,
    ) -> DataFrame:
        """Executor-side per-term BM25 contributions for ``qterms`` as a
        (doc_id, contrib) DataFrame — the building block of the
        cluster-side ranked lanes: decode segment payloads per bucket
        partition (mapInPandas, numpy), emit one weighted contribution
        row per (term, doc) posting. ``weight`` scales every
        contribution — a float applies uniformly (multi-field
        composition, fields.py), a {term: w} dict applies per term
        (query-time term boosts; missing terms default to 1).
        ``include_term`` adds the term column (one row per (term, doc)
        across shards — shards split a term by disjoint doc ranges, so
        no (term, doc) pair ever repeats) for consumers that need
        per-doc matched-term counts (``topk_msm``). ``df_override``
        replaces a term's stored df in the idf (missing terms keep
        their own) — the BLENDED-statistics hook of cross-field
        scoring (fields.fields_cross_topk), mirroring the federation
        lane's global-stats override."""
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "df", "n", "payload")
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b
        per_term = dict(weight) if isinstance(weight, dict) else None
        wgt = 1.0 if per_term is not None else float(weight)
        dfo = dict(df_override) if df_override else None
        bdel_d = (
            self.spark.sparkContext.broadcast(self._deleted)
            if self._deleted is not None
            else None
        )

        def contribs(batches):
            import pandas as pd

            for pdf in batches:
                out_doc, out_sc, out_t = [], [], []
                for r in pdf.itertuples():
                    ids, tfs, dls = decode_postings(bytes(r.payload), int(r.n))
                    if bdel_d is not None:
                        keep = ~np.isin(ids, bdel_d.value, assume_unique=True)
                        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    dfv = dfo.get(r.term, int(r.df)) if dfo is not None else int(r.df)
                    idf = math.log(1.0 + (n_docs - dfv + 0.5) / (dfv + 0.5))
                    sc = bm25_scores_np(tfs, dls, idf, k1, b, avgdl)
                    w = per_term.get(r.term, 1.0) if per_term is not None else wgt
                    out_doc.append(ids)
                    out_sc.append(sc if w == 1.0 else sc * w)
                    if include_term:
                        out_t.append(np.full(ids.size, r.term, dtype=object))
                if out_doc:
                    cols = {
                        "doc_id": np.concatenate(out_doc),
                        "contrib": np.concatenate(out_sc),
                    }
                    if include_term:
                        cols["term"] = np.concatenate(out_t)
                    yield pd.DataFrame(cols)

        schema = "doc_id long, contrib double"
        if include_term:
            schema += ", term string"
        return segs.mapInPandas(contribs, schema=schema)

    def tf_df(self, qterms: list[str]) -> DataFrame:
        """RAW per-term frequencies for ``qterms`` as a (term, doc_id,
        tf) DataFrame — the same bucket-pruned executor-side segment
        decode as :meth:`contrib_df`, emitting frequencies instead of
        scores. The building block of TERM-CENTRIC cross-field scoring
        (fields.fields_combined_topk), where tf must combine ACROSS
        fields before any BM25 saturation — a contribution lane can't
        express that (saturation is not additive). Tombstone-masked
        like every serving lane; shards split a term by disjoint doc
        ranges, so no (term, doc) pair ever repeats."""
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "n", "payload")
        bdel_d = (
            self.spark.sparkContext.broadcast(self._deleted)
            if self._deleted is not None
            else None
        )

        def rows(batches):
            import pandas as pd

            for pdf in batches:
                out_t, out_doc, out_tf = [], [], []
                for r in pdf.itertuples():
                    ids, tfs, _dls = decode_postings(bytes(r.payload), int(r.n))
                    if bdel_d is not None:
                        keep = ~np.isin(ids, bdel_d.value, assume_unique=True)
                        ids, tfs = ids[keep], tfs[keep]
                    out_t.append(np.full(ids.size, r.term, dtype=object))
                    out_doc.append(ids)
                    out_tf.append(tfs)
                if out_doc:
                    yield pd.DataFrame(
                        {
                            "term": np.concatenate(out_t),
                            "doc_id": np.concatenate(out_doc),
                            "tf": np.concatenate(out_tf),
                        }
                    )

        return segs.mapInPandas(rows, schema="term string, doc_id long, tf long")

    def topk_msm(self, query: str, min_match: int, k: int = 10) -> DataFrame:
        """Ranked top-k with ``minimum_should_match`` (the ES/Lucene
        BooleanQuery knob): only docs matching at least ``min_match``
        DISTINCT query terms are eligible; eligible docs rank by the
        standard BM25 sum over their matched terms. ``min_match =
        len(terms)`` degenerates to pure AND, ``1`` to pure OR.

        Scale shape: the cluster contribution lane with the term column
        kept through the per-doc aggregation — ONE shuffle keyed by
        doc_id computes both the score and the distinct-matched count
        (shards split a term by disjoint doc ranges, so count(term) ==
        count of matched terms), then TakeOrdered merges P·k rows."""
        qterms = list(dict.fromkeys(self._analyze(query)))
        if not qterms or k <= 0 or min_match <= 0:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double, matched long"
            )
        per_doc = (
            self.contrib_df(qterms, include_term=True)
            .groupBy("doc_id")
            .agg(
                F.sum("contrib").alias("score"),
                F.count("term").alias("matched"),
            )
            .filter(F.col("matched") >= min_match)
        )
        top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "doc_id", "score", "matched")

    def topk_rescore(
        self, query: str, phrase: str, k: int = 10,
        window: int = 30, bonus: float = 2.0, slop: int = 0,
    ) -> list[tuple[int, int, float]]:
        """Two-pass window rescoring (the ES ``rescore`` contract): the
        cheap BM25 ranker selects the top ``window`` candidates; only
        those are re-scored by the expensive second signal — here an
        exact-phrase (or slop-``slop`` proximity) bonus from the
        positional sibling index — and re-ranked; the final top ``k``
        come from the rescored window ONLY (a doc outside the window can
        never enter, even with the bonus — exactly ES semantics, which
        trades global exactness for bounding the expensive scorer to
        ``window`` docs).

        Scale shape: pass 1 is the standard dispatched top-k (pruned /
        sharded as its size demands); pass 2 touches ``window`` doc ids
        against the phrase lane — never corpus-sized."""
        cand = self.topk(query, window)
        if not cand:
            return []
        hits = set(int(d) for d in self.phrase(phrase, slop=slop))
        rescored = [
            (d, s + (bonus if d in hits else 0.0)) for _r, d, s in cand
        ]
        rescored.sort(key=lambda x: (-x[1], x[0]))
        return [(i + 1, d, s) for i, (d, s) in enumerate(rescored[:k])]

    @staticmethod
    def _take_ranked(per_doc: DataFrame, k: int, score_col: str = "score") -> DataFrame:
        """(rank, doc_id, score) top-k from a per-doc score frame:
        orderBy().limit(k) compiles to TakeOrderedAndProject (per-
        partition heaps, P·k driver merge), the rank window then runs
        on k rows only — never a global sort."""
        from pyspark.sql import Window

        top = per_doc.orderBy(F.desc(score_col), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc(score_col), F.asc("doc_id"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "doc_id", F.col(score_col).alias("score"))

    def topk_boosted(self, query: str, k: int = 10) -> DataFrame:
        """Ranked top-k with query-time term boosts — Lucene's ``^``
        syntax: ``"json getPage^2.5 value^0.5"`` multiplies each
        chunk's analyzed terms' BM25 contributions by its boost (the
        BoostQuery contract: boosts scale scores, never matching).
        Runs on the cluster contribution lane (weights applied
        executor-side during decode — no extra pass)."""
        weights: dict[str, float] = {}
        order: list[str] = []
        for chunk in query.split():
            if "^" in chunk:
                raw, _, wtxt = chunk.rpartition("^")
                w = float(wtxt)
            else:
                raw, w = chunk, 1.0
            for t in self._analyze(raw):
                weights[t] = w
                if t not in order:
                    order.append(t)
        if not order:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(order, weight=weights)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )
        return self._take_ranked(per_doc, k)

    def dis_max_topk(
        self, queries: list[str], k: int = 10, tie_breaker: float = 0.0
    ) -> DataFrame:
        """Query-level dis-max (the ES ``dis_max`` compound query,
        Lucene DisjunctionMaxQuery over arbitrary sub-queries): each
        sub-query scores independently as an ordinary BM25 disjunction,
        and a doc's final score is its BEST sub-query score plus
        ``tie_breaker`` times the rest — the classic fix for unioned
        rephrasings where summing would overcount docs matching every
        variant. tie_breaker=0 is pure max; tie_breaker=1 degenerates
        to the summed union (both pytest-gated).

        Determinism: the cross-sub-query sum folds in sub-query index
        order via a sorted-array aggregate (fixed IEEE add order — the
        same device as the fixed analyzer-order term summation), so the
        combine is reproducible for any number of sub-queries.

        Scale shape: one contribution-lane pass per sub-query (each the
        standard fetch + per-doc aggregation), frames union by
        partition concat (no barrier), ONE doc_id-keyed aggregation
        combines, TakeOrdered caps."""
        if not queries:
            raise ValueError("dis_max_topk needs at least one sub-query")
        # TakeOrdered allocates a k-sized heap per partition — clamp the
        # "give me everything" k to the corpus size
        k = min(int(k), self.n_docs)
        frames = []
        for qi, q in enumerate(queries):
            qterms = self._analyze(q)
            if not qterms:
                continue
            frames.append(
                self.contrib_df(qterms)
                .groupBy("doc_id")
                .agg(F.sum("contrib").alias("score"))
                .withColumn("qi", F.lit(qi))
            )
        if not frames:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        u = frames[0]
        for fdf in frames[1:]:
            u = u.unionByName(fdf)
        tie = float(tie_breaker)
        per_doc = (
            u.groupBy("doc_id")
            .agg(
                F.max("score").alias("best"),
                F.expr(
                    "aggregate(transform(array_sort(collect_list("
                    "struct(qi, score))), x -> x.score), "
                    "cast(0.0 as double), (a, x) -> a + x)"
                ).alias("total"),
            )
            .select(
                "doc_id",
                (
                    F.col("best")
                    + F.lit(tie) * (F.col("total") - F.col("best"))
                ).alias("score"),
            )
        )
        return self._take_ranked(per_doc, k)

    def pinned_topk(
        self, pinned_ids: list[int], query: str, k: int = 10
    ) -> DataFrame:
        """Pinned query (the ES ``pinned`` query): the given doc_ids
        rank first IN THE GIVEN ORDER (editorial promotions), organic
        BM25 results follow with the pinned docs excluded; pinned docs
        count toward ``k`` (the ES semantics). Output (rank, doc_id,
        pinned, score) — pinned rows carry score 0.0 and pinned=1 so
        the two strata are auditable. Unknown ids are skipped (ES skips
        ids the index doesn't hold). Scale shape: the organic ranking
        is the ordinary dispatched top-k asked for k + |pinned| rows
        (exclusion can displace at most |pinned| of them); the pinned
        list is serving-request-sized driver data."""
        # Filter unknown/deleted ids BEFORE truncating to k: ES skips
        # missing ids and still pins the rest, so a dead id early in
        # the list must not consume budget that a valid id past
        # position k could have used.
        ids = list(dict.fromkeys(int(i) for i in pinned_ids))
        known = {
            r["doc_id"]
            for r in self.cat.read(self.spark, "docs")
            .filter(F.col("doc_id").isin(ids))
            .select("doc_id")
            .collect()
        }
        if self._deleted is not None:
            known -= set(int(d) for d in self._deleted)
        ids = [i for i in ids if i in known][:k]
        organic = [
            (d, s)
            for _, d, s in self.topk(query, k + len(ids))
            if d not in set(ids)
        ][: k - len(ids)]
        rows = [
            (rank + 1, d, 1, 0.0) for rank, d in enumerate(ids)
        ] + [
            (len(ids) + rank + 1, d, 0, float(s))
            for rank, (d, s) in enumerate(organic)
        ]
        return self.spark.createDataFrame(
            rows, schema="rank long, doc_id long, pinned int, score double"
        )

    def topk_grouped(
        self, query: str, field: str, k_per_group: int = 3, groups: int = 10
    ) -> DataFrame:
        """Grouped top hits (the ES ``terms`` aggregation with a
        ``top_hits`` sub-aggregation; Lucene grouping with
        groupDocsLimit > 1): the best ``k_per_group`` docs per distinct
        value of the docs-table column ``field``, for the top ``groups``
        values ranked by their best hit — "show me the 3 best matches
        per repo, for the 10 most relevant repos". ``k_per_group=1``
        degenerates to ``topk_collapse``. Output (field value,
        group_rank, hit_rank, doc_id, score), deterministic
        (score DESC, doc_id ASC everywhere).

        Scale shape: contribution lane → per-doc agg → join to the docs
        dimension → ONE field-partitioned window keeps k_per_group rows
        per group (state per task = k_per_group rows per group key),
        then groups rank by their max score and TakeOrdered caps —
        output is groups·k_per_group rows, never corpus-sized."""
        from pyspark.sql import Window

        qterms = self._analyze(query)
        empty = self.spark.createDataFrame(
            [],
            schema=f"{field} string, group_rank long, hit_rank long, "
            "doc_id long, score double",
        )
        if not qterms or k_per_group <= 0 or groups <= 0:
            return empty
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )
        docs = self.cat.read(self.spark, "docs").select("doc_id", field)
        scored = per_doc.join(docs, "doc_id")
        wg = Window.partitionBy(field).orderBy(F.desc("score"), F.asc("doc_id"))
        hits = scored.withColumn("hit_rank", F.row_number().over(wg)).filter(
            F.col("hit_rank") <= k_per_group
        )
        best = (
            hits.groupBy(field)
            .agg(F.max("score").alias("best"), F.min(
                F.when(F.col("hit_rank") == 1, F.col("doc_id"))
            ).alias("best_doc"))
            .orderBy(F.desc("best"), F.asc("best_doc"))
            .limit(groups)
        )
        wr = Window.orderBy(F.desc("best"), F.asc("best_doc"))
        ranked_groups = best.withColumn(
            "group_rank", F.row_number().over(wr).cast("long")
        ).select(field, "group_rank")
        return (
            hits.join(F.broadcast(ranked_groups), field)
            .select(
                field, "group_rank",
                F.col("hit_rank").cast("long").alias("hit_rank"),
                "doc_id", "score",
            )
            .orderBy("group_rank", "hit_rank")
        )

    def topk_collapse(self, query: str, field: str, k: int = 10) -> DataFrame:
        """Field-collapsed ranked search (the ES ``collapse`` /
        Lucene grouping contract): at most ONE hit per distinct value
        of the docs-table column ``field`` — each group is represented
        by its best-scoring doc (doc_id tiebreak), then the group
        representatives rank normally. Output: (rank, field value,
        doc_id, score).

        Scale shape: contribution lane → per-doc agg → broadcast-safe
        join to the docs dimension for the field → ONE window partitioned
        by field (shuffles the scored docs once, grouped by field) →
        TakeOrdered top-k. Nothing corpus-sized reaches the driver."""
        from pyspark.sql import Window

        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema=f"rank long, {field} string, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )
        docs = self.cat.read(self.spark, "docs").select("doc_id", field)
        scored = per_doc.join(docs, "doc_id")
        wg = Window.partitionBy(field).orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        best = scored.withColumn("rn", F.row_number().over(wg)).filter(
            F.col("rn") == 1
        )
        top = best.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", field, "doc_id", "score")

    def topk_sort_field(
        self, tree, field: str, k: int = 10, ascending: bool = False,
        early_terminate: bool | None = None,
        after: tuple | None = None,
    ) -> DataFrame:
        """Sort-by-field search (the ES ``sort`` API): docs matching the
        query ordered by a docs-dimension column instead of relevance —
        "newest matches", "longest matches". ``tree`` is a boolean AST
        node, a query string (analyzed to an OR over its tokens, the
        match-anything-scored semantics of ranked search), or None for
        the match-all browse ("newest 10 docs, period"). Output:
        (rank, doc_id, <field>), doc_id ASC tiebreak.

        Dispatch: when a FRESH sorted sibling for ``field`` exists
        (``sortindex.build_sort_index`` — Lucene index sorting), the
        early-terminated prefix scan answers from the first file(s) of
        the sort order instead of the whole dimension; results are
        bitwise the classic lane's (pytest-gated). ``early_terminate``:
        None = auto, True = require the sibling (raise if missing),
        False = force the classic lane.

        Classic-lane scale shape: the match set comes from ``search_df``
        (the corpus-sized-result flag lane — one executor-side decode,
        one shuffle), joins the docs dimension on doc_id, and
        ``orderBy().limit(k)`` compiles to TakeOrderedAndProject
        (per-partition heaps, P·k rows at the driver) — never a global
        sort. The rank window runs on the k-row result only.

        ``after=(field_value, doc_id)`` is the ES sort + ``search_after``
        combination: the next page strictly after a VALUE cursor in the
        (field, doc_id) sort order — exact and stable under
        re-execution like ``topk_after``, no offset skip/repeat. Cursor
        pages ride the early-terminated lane too when the sibling is
        fresh: the prefix scan seeds past every file wholly before the
        cursor (``sortindex.sorted_scan_topk(after=)`` — metadata-only
        skip; value-straddling files are read and row-filtered), so
        page N+1 reads only the files overlapping the remaining
        suffix. The classic lane's filter + TakeOrdered remains the
        exact fallback at any depth."""
        from pyspark.sql import Window

        from . import sortindex

        docs = self.cat.read(self.spark, "docs")
        if field not in docs.columns or field == "content_sha256":
            raise ValueError(
                f"sort field {field!r} is not a docs-dimension column"
            )
        if isinstance(tree, str):
            toks = self._analyze(tree)
            if not toks:
                return self.spark.createDataFrame(
                    [], schema=f"rank long, doc_id long, {field} string"
                )
            # tokens are analyzer output, and the analyzer is idempotent
            # on its own output — each Term leaf stays a single token
            tree = Or([Term(t) for t in toks]) if len(toks) > 1 else Term(toks[0])
        from .catalog import PinnedCatalog

        pinned = isinstance(self.cat, PinnedCatalog)
        use_et = early_terminate
        if use_et is None:
            # a PIT reader must not serve from the LIVE sort sibling
            # (properties/sibling state are not snapshot-pinned)
            use_et = (
                not pinned and sortindex.fresh_state(self.cat, field) is not None
            )
        elif use_et and pinned:
            raise ValueError(
                "PIT readers answer sort queries through the classic lane "
                "(the sort sibling is not snapshot-pinned)"
            )
        if use_et:
            match = None
            if tree is not None:
                # one materialization feeds every batch's semi-join
                match = self.search_df(tree).select("doc_id").persist()
            try:
                return sortindex.sorted_scan_topk(
                    self.spark, self.cat.root, field, k=k,
                    ascending=ascending, match_ids=match, after=after,
                )
            finally:
                if match is not None:
                    match.unpersist()
        if tree is not None:
            # search_df masks tombstones already (_term_docs_df)
            base = self.search_df(tree).join(
                docs.select("doc_id", field), "doc_id"
            )
        else:
            base = docs.select("doc_id", field)
            if self.cat.exists("deletes"):
                base = base.join(
                    F.broadcast(
                        self.cat.read(self.spark, "deletes").select("doc_id")
                    ),
                    "doc_id",
                    "left_anti",
                )
        ordcol = F.col(field).asc() if ascending else F.col(field).desc()
        if after is not None:
            av, aid = after
            strictly = (
                (F.col(field) > F.lit(av))
                if ascending
                else (F.col(field) < F.lit(av))
            )
            base = base.filter(
                strictly
                | ((F.col(field) == F.lit(av)) & (F.col("doc_id") > F.lit(int(aid))))
            )
        top = base.orderBy(ordcol, F.col("doc_id").asc()).limit(k)
        w = Window.orderBy(ordcol, F.col("doc_id").asc())
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "doc_id", field)

    def topk_function_score(
        self, query: str, boost_expr: str, k: int = 10
    ) -> DataFrame:
        """Function-score ranking (the ES ``function_score`` multiply
        mode): final score = BM25(query) * ``boost_expr``, a SQL
        expression over the docs-table columns (recency decay, source
        weights, length priors…). The expression must be positive for
        the ranking to stay meaningful; matching is unchanged — only
        scores scale. Same lane shape as ``topk_collapse``."""
        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("bm25"))
        )
        docs = self.cat.read(self.spark, "docs")
        scored = per_doc.join(docs, "doc_id").select(
            "doc_id", (F.col("bm25") * F.expr(boost_expr)).alias("score")
        )
        return self._take_ranked(scored, k)

    @staticmethod
    def rank_feature_expr(
        field: str, function: str = "saturation", pivot: float = 1.0,
        boost: float = 1.0, exponent: float = 1.0,
    ) -> str:
        """SQL text of the ES ``rank_feature`` query functions over a
        numeric docs-column expression — emitted as SHARED text (the
        decay_expr parity device: every constant double-cast so any
        replaying engine stays on the IEEE double path):

        - saturation: boost · x / (x + pivot)   (the ES default)
        - log:        boost · ln(pivot + x)     (pivot = ES scaling)
        - sigmoid:    boost · x^exp / (x^exp + pivot^exp)

        All three are monotone in the feature, bounded (saturation and
        sigmoid in [0, boost)), and ADD to the query score — the ES
        semantics where rank_feature is a should clause boosting by
        document importance (pagerank, freshness, stars) without ever
        changing matching."""
        x = f"cast({field} as double)"
        p = f"cast({float(pivot)} as double)"
        b = f"cast({float(boost)} as double)"
        if function == "saturation":
            return f"{b} * {x} / ({x} + {p})"
        if function == "log":
            return f"{b} * ln({p} + {x})"
        if function == "sigmoid":
            e = f"cast({float(exponent)} as double)"
            return (
                f"{b} * pow({x}, {e}) / (pow({x}, {e}) + pow({p}, {e}))"
            )
        raise ValueError(
            f"unknown rank_feature function {function!r} "
            "(saturation | log | sigmoid)"
        )

    def topk_rank_feature(
        self, query: str, field: str, k: int = 10,
        function: str = "saturation", pivot: float = 1.0,
        boost: float = 1.0, exponent: float = 1.0,
    ) -> DataFrame:
        """Ranked top-k with an additive ``rank_feature`` clause (the
        ES ``rank_feature`` query as a should clause next to the match):
        score = BM25(query) + rank_feature(field) — static document
        importance folded into relevance without touching matching
        (``topk_function_score`` is the MULTIPLICATIVE sibling). Same
        lane shape: contribution sum, one docs-dimension join, the
        feature expression in JVM codegen, TakeOrdered."""
        expr_txt = self.rank_feature_expr(
            field, function=function, pivot=pivot, boost=boost,
            exponent=exponent,
        )
        # TakeOrdered allocates a k-sized heap per partition — clamp the
        # "give me everything" k to the corpus size (as in dis_max_topk)
        k = min(int(k), self.n_docs)
        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("bm25"))
        )
        docs = self.cat.read(self.spark, "docs")
        scored = per_doc.join(docs, "doc_id").select(
            "doc_id", (F.col("bm25") + F.expr(expr_txt)).alias("score")
        )
        return self._take_ranked(scored, k)

    @staticmethod
    def distance_feature_expr(
        field: str, origin: float, pivot: float, boost: float = 1.0
    ) -> str:
        """SQL text of the ES ``distance_feature`` query function over
        a numeric docs-column expression: ``boost · pivot / (pivot +
        |field − origin|)`` — 1·boost AT the origin, boost/2 at
        distance ``pivot``, monotone-decreasing beyond. ES applies it
        to date/geo proximity; dates reduce to this numeric form in
        epoch units, geo passes a haversine expression as ``field``
        with ``origin = 0`` (the distance IS the deviation). Emitted
        as SHARED expression text with every constant double-cast (the
        rank_feature/decay parity device)."""
        if pivot <= 0:
            raise ValueError("pivot must be > 0")
        x = f"abs(cast({field} as double) - cast({float(origin)} as double))"
        p = f"cast({float(pivot)} as double)"
        b = f"cast({float(boost)} as double)"
        return f"{b} * {p} / ({p} + {x})"

    def topk_distance_feature(
        self, query: str, field: str, origin: float, pivot: float,
        k: int = 10, boost: float = 1.0,
    ) -> DataFrame:
        """Ranked top-k with an additive ``distance_feature`` clause:
        score = BM25(query) + boost·pivot/(pivot + |field − origin|) —
        the ES recency/proximity boost (distance_feature is the
        proximity sibling of ``topk_rank_feature``: importance decays
        with distance from an origin instead of growing with a
        feature). Same lane shape: contribution sum, one
        docs-dimension join, the feature expression in JVM codegen,
        TakeOrdered."""
        expr_txt = self.distance_feature_expr(
            field, origin=origin, pivot=pivot, boost=boost
        )
        k = min(int(k), self.n_docs)
        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(qterms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("bm25"))
        )
        docs = self.cat.read(self.spark, "docs")
        scored = per_doc.join(docs, "doc_id").select(
            "doc_id", (F.col("bm25") + F.expr(expr_txt)).alias("score")
        )
        return self._take_ranked(scored, k)

    @staticmethod
    def decay_expr(
        kind: str, field: str, origin: float, scale: float,
        decay: float = 0.5, offset: float = 0.0,
    ) -> str:
        """SQL text of the ES ``function_score`` decay functions
        (gauss / exp / linear) over a numeric docs-column expression
        ``field``: the multiplier is ``decay`` at distance ``scale``
        from ``origin`` (after subtracting ``offset``), 1 inside the
        offset, and follows the named curve beyond — exactly the ES
        formulas:

        - gauss:  exp(-d² / (2σ²)),  σ² = -scale² / (2·ln decay)
        - exp:    exp(λ·d),          λ  = ln(decay) / scale
        - linear: max(0, (s - d)/s), s  = scale / (1 - decay)

        with d = max(0, |field - origin| - offset). Returned as a SQL
        STRING (not a Column) so the engine and a SQL oracle can
        evaluate the IDENTICAL expression text — the same parity
        device as the PII pattern dictionary."""
        import math as _m

        if decay <= 0.0 or decay >= 1.0:
            raise ValueError("decay must be in (0, 1)")
        if scale <= 0.0:
            raise ValueError("scale must be > 0")

        # exact-double constants: a bare decimal literal is DECIMAL in
        # Spark SQL (and would drag the whole expression into decimal
        # arithmetic, off the oracle's double path by ~1e-12) — the
        # cast keeps BOTH engines in IEEE doubles end to end
        def c(x: float) -> str:
            return f"cast({float(x)!r} as double)"

        d = f"greatest({c(0.0)}, abs(({field}) - {c(origin)}) - {c(offset)})"
        if kind == "gauss":
            sigma2 = -(scale * scale) / (2.0 * _m.log(decay))
            return f"exp(-({d}) * ({d}) / {c(2.0 * sigma2)})"
        if kind == "exp":
            lam = _m.log(decay) / scale
            return f"exp({c(lam)} * ({d}))"
        if kind == "linear":
            s = scale / (1.0 - decay)
            return f"greatest({c(0.0)}, ({c(s)} - ({d})) / {c(s)})"
        raise ValueError(f"unknown decay kind: {kind!r}")

    def topk_decay(
        self, query: str, field: str, origin: float, scale: float,
        kind: str = "gauss", decay: float = 0.5, offset: float = 0.0,
        k: int = 10,
    ) -> DataFrame:
        """ES ``function_score`` decay ranking (multiply boost_mode):
        BM25(query) · decay(field) — the canonical recency/proximity
        re-ranking (newer docs, nearer offices, shorter files…). Pure
        composition: the decay curve compiles to a WholeStageCodegen
        expression over the docs dimension; matching is unchanged.

        Scale shape: identical to ``topk_function_score`` — the decay
        multiplier never touches postings, only the per-doc score frame
        joined to the docs dimension (doc_id-keyed, broadcast-eligible
        on the k-bounded side)."""
        return self.topk_function_score(
            query, self.decay_expr(kind, field, origin, scale, decay, offset), k
        )

    # a & m for the random mix below — the classic minstd/C-library LCG
    # constants; any fixed odd multiplier works, these are recognizable
    RANDOM_A = 1103515245
    RANDOM_M = 2147483648

    def topk_random(
        self, query: str, seed: int, field: str = "cast(path as bigint)",
        k: int = 10,
    ) -> DataFrame:
        """ES ``function_score`` ``random_score`` (seeded, multiply
        mode): BM25 · r(doc), r = a deterministic hash of a STABLE
        per-doc integer (``field``) and ``seed``, uniform on [0, 1) —
        reproducible shuffling of comparably-scored results (result
        diversification / A-B jitter) that never changes the match set.
        The mix is a plain LCG step in exact int64 arithmetic
        ((id·a + seed) mod 2³¹ / 2³¹) rather than a library hash so any
        SQL engine replays it bit-for-bit — ES likewise keys its hash
        on a stable doc field (_seq_no) for the same reproducibility
        contract.

        Mix: h = (id·a + seed) mod 2³¹, r = (h² + h mod 2³¹) / 2³¹.
        The squaring step matters: a bare LCG is AFFINE in the seed, so
        two seeds differ by a constant circular shift of every r —
        near-identical orderings for nearby seeds. h² mod m is
        nonlinear in the seed (distinct seeds decorrelate), still exact
        int64 arithmetic (h < 2³¹ ⇒ h² < 2⁶²), still replayable by any
        SQL engine."""
        return self.topk_function_score(
            query, self.random_expr(seed, field), k
        )

    @classmethod
    def random_expr(cls, seed: int, field: str) -> str:
        """Shared SQL text of the seeded-random mix (see topk_random) —
        exposed so oracles can evaluate the IDENTICAL expression over
        their own id column."""
        a, m = cls.RANDOM_A, cls.RANDOM_M
        h = f"((({field}) * {a} + {int(seed)}) % {m})"
        return f"(({h}) * ({h}) + ({h})) % {m} / cast({m} as double)"

    def topk_terms_set(
        self, query: str, required_expr: str, k: int = 10
    ) -> DataFrame:
        """ES ``terms_set`` query: like ``minimum_should_match``, but
        the required matched-term count is PER-DOCUMENT — a SQL
        expression over the docs-table columns (ES's
        ``minimum_should_match_field``; classic use: a skills table
        where each row states how many of the query's skills it
        requires). Eligible docs rank by the standard BM25 sum over
        their matched terms.

        Scale shape: the ``topk_msm`` lane plus ONE doc_id-keyed join
        of the per-doc aggregate against the docs dimension to evaluate
        the requirement — the aggregate side is match-set-sized and the
        join keys on the same doc_id the aggregation just shuffled on,
        so AQE plans it without a second exchange of the big side."""
        qterms = list(dict.fromkeys(self._analyze(query)))
        if not qterms or k <= 0:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double, matched long"
            )
        per_doc = (
            self.contrib_df(qterms, include_term=True)
            .groupBy("doc_id")
            .agg(
                F.sum("contrib").alias("score"),
                F.count("term").alias("matched"),
            )
        )
        docs = self.cat.read(self.spark, "docs")
        eligible = (
            per_doc.join(docs, "doc_id")
            .withColumn("required", F.expr(required_expr).cast("long"))
            .filter(F.col("matched") >= F.col("required"))
            .select("doc_id", "score", "matched", "required")
        )
        top = eligible.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "doc_id", "score", "matched", "required")

    def topk_boosting(
        self, positive: str, negative: str, negative_boost: float = 0.5,
        k: int = 10,
    ) -> DataFrame:
        """ES/Lucene ``boosting`` query: rank by the POSITIVE query's
        BM25; docs that ALSO match the negative query keep matching but
        their score is demoted by ``negative_boost`` (downranking
        without the recall loss of must_not — ES's canonical "apple the
        fruit, not the company" query).

        Scale shape: the contribution lane for the positive terms, plus
        the negative match set as a doc_id frame LEFT-joined in — the
        negative side is a match SET (no scores), so it flows through
        the same pruned boolean machinery as any filter and the join is
        doc_id-keyed on already-shuffled data."""
        if not (0.0 < negative_boost <= 1.0):
            raise ValueError("negative_boost must be in (0, 1]")
        pos_terms = self._analyze(positive)
        neg_terms = self._analyze(negative)
        if not pos_terms or k <= 0:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        per_doc = (
            self.contrib_df(pos_terms)
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("bm25"))
        )
        if neg_terms:
            neg = (
                self.search_df(Or([Term(t) for t in neg_terms]))
                .select("doc_id", F.lit(True).alias("_neg"))
            )
            scored = per_doc.join(neg, "doc_id", "left").select(
                "doc_id",
                F.when(
                    F.col("_neg").isNotNull(),
                    F.col("bm25") * F.lit(float(negative_boost)),
                )
                .otherwise(F.col("bm25"))
                .alias("score"),
            )
        else:
            scored = per_doc.select("doc_id", F.col("bm25").alias("score"))
        return self._take_ranked(scored, k)

    # target postings per range task of the sharded executor: large
    # enough that per-task overhead amortizes, small enough that one
    # range's slices fit executor memory comfortably (compressed ~2-4 B
    # per posting → tens of MB per task)
    SHARD_TARGET_POSTINGS = 5_000_000
    SHARD_MAX_RANGES = 256
    # block-selected fetch: above this selected fraction the two-hop
    # path cannot beat the single-job eager fetch (measured), so it
    # bails out to eager after the (cheap, payload-free) metadata hop
    BLOCKSEL_MAX_FRACTION = 0.5
    # adaptive second round: probe block budget as a fraction of the
    # query's total blocks (the probe pays one extra slice-fetch job; it
    # must stay cheap relative to the eager fetch it tries to avoid),
    # and the minimum total-block count below which probing is pointless
    # (the eager fetch is already tiny)
    BLOCKSEL_PROBE_FRACTION = 0.05
    BLOCKSEL_PROBE_MIN_BLOCKS = 64
    # sharded "auto" kernel pick: run the per-range lazy WAND only when
    # the metadata-estimated surviving-block fraction is below this —
    # above it the bounds barely prune and the vectorized dense kernel
    # beats WAND's per-pivot Python loop (1.6M-doc study: WAND decode
    # fraction 0.80 on flat two-common-term queries)
    SHARD_WAND_MAX_SURVIVING = 0.4

    def topk_sharded(self, query: str, k: int = 10, n_ranges: int | None = None,
                     return_stats: bool = False, kernel: str = "auto",
                     stats_override: tuple | None = None):
        """Exact ranked top-k for ONE huge query, cluster-side AND pruned
        (VERDICT round 2 item 1 — the missing lane): doc-id space is cut
        into R ranges; a slicing kernel ships each stored block (bytes
        only, no decode) to the range(s) it overlaps; per range the exact
        lazy block-max WAND kernel runs with a local k-heap over cursors
        CLIPPED to the range; the driver merges <= R·k rows.

        Why this is exact: block max_scores are global upper bounds, so a
        local heap's threshold only prunes less than the global one
        (superset of the global top-k per range); clipping guarantees
        each doc is fully evaluated by exactly one range (every term's
        blocks overlapping that range are present); scores sum per doc in
        analyzer order with the same ``_score_one`` expression, so they
        are bitwise-identical to the driver path and the final
        (score DESC, doc_id ASC) merge reproduces its ranking.

        Why this scales where ``topk_distributed`` did not: shuffle
        volume is the COMPRESSED payload bytes (each block moves once,
        +1 straddling block per range boundary per term) instead of a
        decoded (doc_id, contrib) row per posting, and the per-range WAND
        prunes whole blocks (never decoded) instead of scoring every
        posting. Parallelism scales with posting volume (R ~
        total/SHARD_TARGET_POSTINGS), not query count — a single
        two-stopword query at 10^12 docs fans out to R tasks with
        bounded memory each.

        ``kernel``: per-range executor choice. ``"wand"`` runs the lazy
        block-max cursor loop (blocks skipped by the bound are never
        decoded — the win on skewed/selective score distributions);
        ``"dense"`` fully decodes each range's slices (the slice
        rewrite makes every sub-payload standalone-decodable) and
        scatter-adds into a range-local dense accumulator — pure numpy,
        no Python-per-pivot loop, the measured winner when bounds prune
        little (the flat-distribution regime: 1.6M-doc study, WAND
        decode fraction 0.80). ``"auto"`` estimates the pruning
        potential per range from the sliced block metadata (the same
        summed-UB interval sweep the block-selected lane runs
        driver-side — free relative to a decode) and picks WAND when
        the estimated surviving fraction is below
        ``SHARD_WAND_MAX_SURVIVING``, dense otherwise; ranges wider
        than the dense accumulator cap always take WAND. All kernels
        are bitwise-identical (same per-term contribution expression,
        same per-doc summation order), so the dispatch is invisible in
        results.
        """
        from .codec import slice_blocks

        qterms = list(dict.fromkeys(self._analyze(query)))
        if not qterms or k <= 0:
            return ([], {"n_ranges": 0, "blocks_decoded": 0, "blocks_total": 0}) \
                if return_stats else []
        if n_ranges is None:
            total = sum(self.term_dfs(qterms).values())
            n_ranges = int(
                max(2, min(self.SHARD_MAX_RANGES,
                           -(-total // self.SHARD_TARGET_POSTINGS)))
            )
        bdel_sh = None
        if self._deleted is not None:
            # tombstones: stored block bounds may be achieved by deleted
            # docs, so the per-range WAND kernel is unsafe — force the
            # dense kernel (exact under masking) and keep every range
            # within its accumulator cap
            kernel = "dense"
            n_ranges = max(n_ranges, -(-self.n_docs // self.DENSE_MAX_DOCS))
            bdel_sh = self.spark.sparkContext.broadcast(self._deleted)
        bounds = sorted(
            {1 + (i * self.n_docs) // n_ranges for i in range(n_ranges)}
            | {self.n_docs + 1}
        )
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "shard", "df", "payload", "block_meta", "idf", "avgdl")

        meta_t = (
            "array<struct<block_first:long,block_last:long,max_tf:int,"
            "max_score:double,byte_offset:long,tf_off:long,dl_off:long,"
            "n_docs:int>>"
        )

        def slice_ranges(batches):
            import pandas as pd

            bnd = np.asarray(bounds, dtype=np.int64)
            for pdf in batches:
                cols = {
                    "range_id": [], "term": [], "shard": [], "df": [],
                    "idf": [], "avgdl": [], "payload": [], "block_meta": [],
                }
                for r in pdf.itertuples():
                    metas = list(r.block_meta)
                    nb = len(metas)
                    firsts = np.fromiter(
                        (m["block_first"] for m in metas), dtype=np.int64, count=nb
                    )
                    lasts = np.fromiter(
                        (m["block_last"] for m in metas), dtype=np.int64, count=nb
                    )
                    r_lo = np.searchsorted(bnd, firsts, side="right") - 1
                    r_hi = np.searchsorted(bnd, lasts, side="right") - 1
                    pay = bytes(r.payload)
                    for rid in range(int(r_lo.min()), int(r_hi.max()) + 1):
                        sel = np.flatnonzero((r_lo <= rid) & (r_hi >= rid))
                        if not sel.size:
                            continue
                        pl, ms = slice_blocks(pay, metas, sel)
                        cols["range_id"].append(rid)
                        cols["term"].append(r.term)
                        cols["shard"].append(r.shard)
                        cols["df"].append(r.df)
                        cols["idf"].append(r.idf)
                        cols["avgdl"].append(r.avgdl)
                        cols["payload"].append(pl)
                        cols["block_meta"].append(ms)
                if cols["term"]:
                    yield pd.DataFrame(cols)

        sliced = segs.mapInPandas(
            slice_ranges,
            schema=(
                "range_id int, term string, shard int, df long, idf double, "
                f"avgdl double, payload binary, block_meta {meta_t}"
            ),
        )

        # stats_override = (n_docs, avgdl, {term: df}) lets a FEDERATION
        # coordinator score this shard's postings under GLOBAL collection
        # statistics (federate.dfs_query_then_fetch's over-cap path).
        # Only the SCORING constants change: doc-id ranges stay in the
        # local id space, and the stored-bound rescale (idf_now /
        # idf_stored) upper-bounds correctly for ANY idf_now, so every
        # kernel stays exact under the override.
        if stats_override is not None:
            n_docs_, avgdl_, gdf_ = stats_override
        else:
            n_docs_, avgdl_, gdf_ = self.n_docs, self.avgdl, None
        k1, b = self.cfg.k1, self.cfg.b
        order = {t: i for i, t in enumerate(qterms)}
        kernel_mode = kernel
        dense_cap = self.DENSE_MAX_DOCS
        wand_max_surv = self.SHARD_WAND_MAX_SURVIVING

        def run_range(key, group):
            import pandas as pd

            rid = int(key[0])
            lo, hi = bounds[rid], bounds[rid + 1]
            term_rows = []
            for t in sorted(group["term"].unique(), key=order.get):
                rs = group[group["term"] == t]
                rs = rs.assign(
                    _bf=[m[0]["block_first"] for m in rs["block_meta"]]
                ).sort_values(["shard", "_bf"])
                df_g = int(rs["df"].iloc[0])
                if gdf_ is not None:
                    df_g = int(gdf_.get(t, df_g))
                idf_now = math.log(1.0 + (n_docs_ - df_g + 0.5) / (df_g + 0.5))
                term_rows.append((t, df_g, idf_now, rs))

            if kernel_mode == "dense":
                use_dense = True
            elif kernel_mode == "wand" or (hi - lo) > dense_cap:
                use_dense = False
            elif len(term_rows) > 1 and max(
                r[2] for r in term_rows
            ) >= max(
                2.0 * (sum(r[2] for r in term_rows) - max(r[2] for r in term_rows)),
                math.log(33.0),  # absolute selectivity floor (df <= n/32),
                # mirroring the driver dispatch: RELATIVE dominance of a
                # merely-common term routes to WAND's per-pivot Python
                # loop with nothing to prune
            ):
                # spiky regime (round-3 VERDICT item 3): one term's idf
                # towers over the rest (rare needle + stopword list).
                # The block-certified estimator below can't see this —
                # a df~10^2 needle fits in ONE block, which certifies
                # only one doc, never k — but the REAL threshold passes
                # the needle's contribution after k needle hits and then
                # every stopword block without a needle doc is skipped.
                # Same dominance test as the driver dispatch
                # (topk(): idf[0] >= 2 * sum(rest)); advisory only —
                # kernels are bitwise-identical.
                use_dense = False
            else:
                # "auto" (round-3 open item 3): estimate the pruning
                # potential from the sliced block metadata already in
                # hand — the range-local summed-UB sweep — and pick WAND
                # only when the bounds would actually skip blocks; on
                # flat distributions (fraction ~1.0) the vectorized
                # dense kernel wins because WAND decodes almost
                # everything anyway THROUGH a per-pivot Python loop.
                per_term = []
                for t, df_g, idf_now, rs in term_rows:
                    fs, ls, ubs, lbs = [], [], [], []
                    for r in rs.itertuples():
                        ir = idf_now / r.idf if r.idf else 1.0
                        ar = (avgdl_ / r.avgdl) if r.avgdl > 0.0 else 1.0
                        up, dn = ir * max(1.0, ar), ir * min(1.0, ar)
                        for m in r.block_meta:
                            fs.append(m["block_first"])
                            ls.append(m["block_last"])
                            s = m["max_score"]
                            ubs.append(np.nextafter(s * up * (1.0 + 1e-12), np.inf))
                            lbs.append(np.nextafter(s * dn * (1.0 - 1e-12), -np.inf))
                    per_term.append((
                        np.asarray(fs, dtype=np.int64),
                        np.asarray(ls, dtype=np.int64),
                        np.asarray(ubs), np.asarray(lbs),
                    ))
                use_dense = (
                    est_surviving_fraction(per_term, k) > wand_max_surv
                )

            if use_dense:
                # vectorized full evaluation over the range: the slice
                # rewrite made every sub-payload standalone-decodable, so
                # one decode_postings per sub-row + clip + scatter-add
                # into a range-local accumulator reproduces dense_topk
                # bit-for-bit (same contribution expression, same
                # per-term add order). At extreme range widths (auto
                # caps at DENSE_MAX_DOCS) the WAND kernel takes over.
                width = hi - lo
                scores = np.zeros(width, dtype=np.float64)
                total_blocks = dec = 0
                for t, df_g, idf_now, rs in term_rows:
                    ids_l, tfs_l, dls_l = [], [], []
                    for r in rs.itertuples():
                        metas = list(r.block_meta)
                        total_blocks += len(metas)
                        n = int(sum(m["n_docs"] for m in metas))
                        ids, tfs, dls = decode_postings(bytes(r.payload), n)
                        ids_l.append(ids)
                        tfs_l.append(tfs)
                        dls_l.append(dls)
                    ids = np.concatenate(ids_l)
                    tfs = np.concatenate(tfs_l)
                    dls = np.concatenate(dls_l)
                    m = (ids >= lo) & (ids < hi)
                    if bdel_sh is not None:
                        m &= ~np.isin(ids, bdel_sh.value, assume_unique=True)
                    ids, tfs, dls = ids[m], tfs[m], dls[m]
                    contrib = idf_now * (tfs.astype(np.float64) * (k1 + 1.0)) / (
                        tfs.astype(np.float64)
                        + k1 * (1.0 - b + b * (dls.astype(np.float64) / avgdl_))
                    )
                    scores[ids - lo] += contrib
                dec = total_blocks
                n_hits = int(np.count_nonzero(scores > 0.0))
                res = []
                if n_hits:
                    kk = min(k, n_hits)
                    part = np.argpartition(scores, -kk)[-kk:]
                    kth = scores[part].min()
                    cand = np.flatnonzero(scores >= kth)
                    sel = np.lexsort((cand, -scores[cand]))[:k]
                    res = [
                        (r + 1, int(cand[i]) + lo, float(scores[cand[i]]))
                        for r, i in enumerate(sel)
                    ]
            else:
                cursors = []
                for t, df_g, idf_now, rs in term_rows:
                    base = LazyTermPostings(
                        t, df_g, idf_now,
                        [
                            (bytes(r.payload), list(r.block_meta), float(r.idf),
                             float(r.avgdl))
                            for r in rs.itertuples()
                        ],
                        avgdl_now=avgdl_,
                    )
                    cursors.append(_ClippedCursor(base, lo, hi))
                total_blocks = sum(c.nb for c in cursors)
                res = wand_topk_lazy(cursors, k, k1, b, avgdl_)
                dec = sum(c.blocks_decoded for c in cursors)
            rows = [(rid, rk, d, s, dec, total_blocks) for rk, d, s in res]
            # stats marker row: ranges whose local top-k is empty still
            # report decode counts (rank -1, filtered by the merge)
            rows.append((rid, -1, -1, 0.0, dec, total_blocks))
            return pd.DataFrame(
                rows,
                columns=["range_id", "rank", "doc_id", "score",
                         "blocks_decoded", "blocks_total"],
            )

        out_df = sliced.groupBy("range_id").applyInPandas(
            run_range,
            schema=("range_id int, rank long, doc_id long, score double, "
                    "blocks_decoded long, blocks_total long"),
        )
        if return_stats == "df":
            # plan-gate hook: hand back the un-executed DataFrame so
            # tests can assert pruning/Arrow shape without running it
            return out_df
        out = out_df.collect()

        cand = sorted(
            ((r["score"], r["doc_id"]) for r in out if r["rank"] > 0),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        res = [(i + 1, int(d), float(s)) for i, (s, d) in enumerate(cand)]
        if return_stats:
            per_range = {r["range_id"]: (r["blocks_decoded"], r["blocks_total"])
                         for r in out}
            stats = {
                "n_ranges": len(per_range),
                "blocks_decoded": int(sum(v[0] for v in per_range.values())),
                "blocks_total": int(sum(v[1] for v in per_range.values())),
            }
            return res, stats
        return res

    def topk_where(self, query: str, k: int = 10, predicate: str = "true") -> DataFrame:
        """Ranked top-k restricted to docs matching a METADATA predicate
        (SQL over the docs table's columns, e.g. ``"lang = 'java'"`` or
        ``"repo = 'r3' and path like 'src/%'"``) — the filtered-serving
        shape ("rank only within this language/repo slice").

        Scale shape: the allowed set can be corpus-sized, so it is never
        driver-materialized — per-term BM25 contributions (executor
        decode, tombstone-masked) LEFT-SEMI-join the predicate-filtered
        docs scan on doc_id BEFORE the per-doc aggregation, so filtered
        docs never reach the agg and the predicate pushes down to the
        docs parquet scan. Exactness: restriction commutes with scoring
        (a doc's score does not depend on other docs), so this equals
        ranking the filtered corpus under the FULL-corpus statistics —
        the standard filtered-search contract (df/idf are collection
        stats, not slice stats). Returns (rank, doc_id, score)."""
        qterms = self._analyze(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        allowed = (
            self.cat.read(self.spark, "docs").filter(predicate).select("doc_id")
        )
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "df", "n", "payload")
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b
        bdel_w = (
            self.spark.sparkContext.broadcast(self._deleted)
            if self._deleted is not None
            else None
        )

        def contribs(batches):
            import pandas as pd

            for pdf in batches:
                out_doc, out_sc = [], []
                for r in pdf.itertuples():
                    ids, tfs, dls = decode_postings(bytes(r.payload), int(r.n))
                    if bdel_w is not None:
                        keep = ~np.isin(ids, bdel_w.value, assume_unique=True)
                        ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    idf = math.log(
                        1.0 + (n_docs - int(r.df) + 0.5) / (int(r.df) + 0.5)
                    )
                    out_doc.append(ids)
                    out_sc.append(bm25_scores_np(tfs, dls, idf, k1, b, avgdl))
                if out_doc:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(out_doc),
                            "contrib": np.concatenate(out_sc),
                        }
                    )

        per_doc = (
            segs.mapInPandas(contribs, schema="doc_id long, contrib double")
            .join(allowed, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.sum("contrib").alias("score"))
        )
        top = per_doc.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        return top.withColumn(
            "rank", F.row_number().over(w).cast("long")
        ).select("rank", "doc_id", "score")

    def topk_set_distributed(self, queries: list[dict]) -> DataFrame:
        """Executor-side block-max WAND for BATCH workloads (the scale
        path when the query set is large): queries are analyzed
        driver-side (tiny), the (query_id, pos, term, k) pairs are
        broadcast-joined against the bucket-pruned segments scan, each
        query's term rows shuffle to ONE task, and the exact lazy-WAND
        kernel runs per query inside ``applyInPandas`` — only surviving
        blocks are decoded, no posting bytes ever reach the driver, and
        parallelism scales with the number of queries.

        One-task-per-query bounds each task's memory by the query's
        total term payload, so queries whose dictionary-estimated
        postings exceed ``driver_fetch_max_postings`` (the same cap that
        governs driver fetch — a task has the same order of memory) are
        SPLIT OUT and served through the sharded per-range executor
        (``topk_sharded``), which bounds per-task memory by range, then
        unioned back (VERDICT round 2 "What's wrong" item 3). Both lanes
        produce the same scores, so the split is invisible in results.

        Scores are bitwise-identical to the driver ``topk`` path (same
        ``_score_one`` expression summed in analyzer order). Queries with
        no term hits simply emit no rows. Returns a DataFrame
        (query_id string, rank long, doc_id long, score double).
        """
        if self._deleted is not None:
            # tombstones make the executor WAND kernel's stored bounds
            # unsafe; serve the batch through the masked driver/sharded
            # dispatch per query until compaction restores the fast lane
            rows = []
            for q in queries:
                for r, d, s in self.topk(q["query"], q.get("k", 10)):
                    rows.append((q["query_id"], r, d, s))
            return self.spark.createDataFrame(
                rows or [],
                schema="query_id string, rank long, doc_id long, score double",
            )
        huge = []
        if queries and self._total_postings_upper > self.driver_fetch_max_postings:
            dfs = self.term_dfs(
                [t for q in queries for t in self._analyze(q["query"])]
            )
            small = []
            for q in queries:
                if sum(dfs[t] for t in self._analyze(q["query"])) \
                        > self.driver_fetch_max_postings:
                    huge.append(q)
                else:
                    small.append(q)
            queries = small
        pairs = []
        for q in queries:
            for pos, t in enumerate(self._analyze(q["query"])):
                pairs.append((q["query_id"], pos, t, int(q.get("k", 10))))
        huge_rows = [
            (q["query_id"], r, d, s)
            for q in huge
            for r, d, s in self.topk_sharded(q["query"], int(q.get("k", 10)))
        ]
        huge_df = self.spark.createDataFrame(
            huge_rows or [],
            schema="query_id string, rank long, doc_id long, score double",
        ) if huge else None
        if not pairs:
            empty = self.spark.createDataFrame(
                [], schema="query_id string, rank long, doc_id long, score double"
            )
            return huge_df if huge_df is not None else empty
        pdf = self.spark.createDataFrame(
            pairs, schema="query_id string, pos int, term string, k int"
        )
        terms = sorted({p[2] for p in pairs})
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in terms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        ).select("term", "shard", "df", "payload", "block_meta", "idf", "avgdl")
        joined = segs.join(F.broadcast(pdf), "term")
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b

        def run_one(key, group: "pd.DataFrame"):
            import pandas as pd

            group = group.sort_values(["pos", "shard"])
            k = int(group["k"].iloc[0])
            cursors = []
            for pos in group["pos"].unique():
                rs = group[group["pos"] == pos]
                df_g = int(rs["df"].iloc[0])
                idf_now = math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
                cursors.append(
                    LazyTermPostings(
                        str(rs["term"].iloc[0]), df_g, idf_now,
                        [
                            (bytes(r.payload), list(r.block_meta), float(r.idf),
                             float(r.avgdl))
                            for r in rs.itertuples()
                        ],
                        avgdl_now=avgdl,
                    )
                )
            res = wand_topk_lazy(cursors, k, k1, b, avgdl)
            return pd.DataFrame(
                [(key[0], r, d, s) for r, d, s in res],
                columns=["query_id", "rank", "doc_id", "score"],
            )

        out = joined.groupBy("query_id").applyInPandas(
            run_one, schema="query_id string, rank long, doc_id long, score double"
        )
        return out.unionByName(huge_df) if huge_df is not None else out

    def topk_df(self, query: str, k: int = 10, hydrate: bool = False) -> DataFrame:
        """Top-k as a DataFrame, optionally hydrated with doc metadata
        via a broadcast join (Q7/Q8)."""
        rows = self.topk(query, k)
        df = self.spark.createDataFrame(
            rows or [], schema="rank int, doc_id long, score double"
        )
        if hydrate:
            docs = self.cat.read(self.spark, "docs").select(
                "doc_id", "repo", "path", "commit", "lang"
            )
            df = df.join(docs, "doc_id", "left").orderBy("rank")
        return df

    def run_query_set(self, queries: list[dict], reps: int = 1, prefetch: bool = True) -> dict:
        """Q9: batch runner -> results + latency stats (p50/p95).

        ``prefetch`` warms the dictionary cache with ONE bucket-pruned
        Spark scan for all query terms (vs one job per cold query) —
        the warm path is then pure driver-side numpy.
        """
        if prefetch:
            all_terms: list[str] = []
            for q in queries:
                all_terms.extend(self._analyze(q["query"]))
            self.fetch_terms(all_terms)
        results = {}
        lat = []
        for _ in range(reps):
            for q in queries:
                t0 = time.perf_counter()
                if q["kind"] == "topk":
                    out = self.topk(q["query"], q.get("k", 10))
                elif q["kind"] == "bool_and":
                    out = self.bool_and(q["query"]).tolist()
                else:
                    out = self.bool_or(q["query"]).tolist()
                lat.append(time.perf_counter() - t0)
                results[q["query_id"]] = out
        lat_s = sorted(lat)
        return {
            "results": results,
            "n": len(lat),
            "p50_ms": 1000 * lat_s[len(lat_s) // 2],
            "p95_ms": 1000 * lat_s[min(len(lat_s) - 1, int(len(lat_s) * 0.95))],
            "mean_ms": 1000 * sum(lat_s) / len(lat_s),
        }


# ----------------------------------------------- pure-DataFrame BM25 (M1)
def bm25_topk_df(
    tf: DataFrame,
    query_terms: list[str],
    k: int,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
) -> DataFrame:
    """Declarative BM25 top-k over the (term, doc_id, tf, dl) table —
    the M1 minimum slice and the relational shadow of the WAND path.
    Whole plan stays JVM-side: broadcast term list, hash agg, top-k sort.
    """
    if not query_terms:
        spark = tf.sparkSession
        return spark.createDataFrame([], schema="doc_id long, score double")
    qt = tf.sparkSession.createDataFrame([(t,) for t in query_terms], schema="term string")
    dfs = (
        tf.join(F.broadcast(qt), "term")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(qt), "term")
        .join(F.broadcast(dfs), "term")
        .withColumn(
            "idf", F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5))
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * (F.col("dl") / avgdl))),
        )
        .groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
    return scored
