"""HNSW graph over the IVF coarse centroids — the online-serving lever
for nprobe selection at large list counts.

The IVF stack (similarity.py / pq.py) partitions the corpus into K
inverted lists and, per query, scores all K centroids to pick the
``nprobe`` nearest — an O(K·d) driver-side argsort that is fine at
K=16..4096 but becomes the latency floor when a 100-TB corpus wants
K ~ 10^5..10^6 lists (list size is the real knob, so K grows with the
corpus). Lucene/ES serve online kNN with an HNSW graph (Malkov &
Yashunin 2016, public algorithm) for exactly this reason; here the
graph lives over the CENTROIDS — a driver-local, dictionary-sized
structure (K·M int32 edges) that cuts centroid selection to
O(ef·M·log K) dot products while the heavy candidate scoring stays the
partition-pruned Spark scan it already is. The same pattern serves
per-list graphs if single lists ever get hot.

Design notes:

* **Similarity = inner product** on the (already normalized) spherical
  k-means centroids — identical ordering to the brute-force
  ``argsort(-(C @ q))`` the IVF lanes use today.
* **Deterministic**: level draws come from a seeded generator keyed by
  insertion index, so the same centroid matrix always yields the same
  graph (build reproducibility is a repo-wide contract).
* **Connected by construction**: level 0 carries an implicit,
  prune-EXEMPT chain edge ``i <-> i-1`` (materialized lazily in
  ``_neighbors``, never subject to the per-node degree trim), so the
  base layer is connected no matter how adversarially the learned
  edges prune. A saturated search (``ef >= K``) therefore visits the
  whole graph and returns EXACTLY the brute-force ranking — that
  identity is the driver-contract oracle for ``ann_hnsw_topk`` (the
  same saturation trick as ivf's nprobe=K full-value oracle) and is
  asserted in tests. Pruned recall (small ef) is recall-gated.
"""

from __future__ import annotations

import heapq

import numpy as np


class HNSW:
    """Driver-local hierarchical navigable small-world graph over a
    row-normalized matrix ``vecs`` (K x d), similarity = dot product."""

    def __init__(
        self,
        vecs: np.ndarray,
        M: int = 8,
        ef_construction: int = 64,
        seed: int = 42,
    ):
        self.vecs = np.ascontiguousarray(vecs, dtype=np.float64)
        self.K = int(self.vecs.shape[0])
        self.M = int(M)
        self.ef_construction = int(ef_construction)
        # deterministic geometric level per node (keyed draw)
        rng = np.random.RandomState(seed)
        ml = 1.0 / np.log(max(2.0, float(M)))
        u = rng.random_sample(self.K)
        self.levels = np.floor(-np.log(np.clip(u, 1e-12, 1.0)) * ml).astype(
            np.int64
        )
        self.max_level = int(self.levels.max(initial=0))
        # adjacency: per level, list of neighbor-lists
        self.edges: list[list[list[int]]] = [
            [[] for _ in range(self.K)] for _ in range(self.max_level + 1)
        ]
        self.entry = 0
        self.visited_last = 0  # search telemetry for the pruning gates
        for i in range(1, self.K):
            self._insert(i)

    # ------------------------------------------------------------ build
    def _neighbors(self, node: int, level: int):
        """Adjacency of ``node`` on ``level``. Level 0 adds the implicit
        chain edges ``node-1`` / ``node+1`` — prune-exempt (they are
        never stored, so the degree trim in ``_insert`` cannot drop
        them), guaranteeing base-layer connectivity and hence the
        saturated-search == brute-force identity. Duplicates with the
        learned edges are harmless: the caller's visited-set skips
        them."""
        nbrs = self.edges[level][node]
        if level == 0:
            extra = []
            if node > 0:
                extra.append(node - 1)
            if node + 1 < self.K:
                extra.append(node + 1)
            if extra:
                return nbrs + extra
        return nbrs

    def _search_layer(self, q, entry: list[int], ef: int, level: int):
        """Beam search on one layer: returns [(sim, node)] best-first,
        up to ef nodes. Standard HNSW SEARCH-LAYER with a max-heap
        frontier and a bounded best-set. Similarities are computed
        PER VISITED NODE (the whole point: O(visited·d), never O(K·d)
        — the visited count is the gated pruning telemetry)."""
        vecs = self.vecs

        def sim(i: int) -> float:
            return float(vecs[i] @ q)

        visited = set(entry)
        # frontier: max-heap by sim (python heapq is a min-heap: negate)
        frontier = [(-sim(e), e) for e in entry]
        heapq.heapify(frontier)
        best = [(-negs, e) for negs, e in frontier]  # min-heap of kept
        heapq.heapify(best)
        while len(best) > ef:
            heapq.heappop(best)
        while frontier:
            negs, node = heapq.heappop(frontier)
            if best and -negs < best[0][0] and len(best) >= ef:
                break  # nearest frontier is worse than the worst kept
            for nb in self._neighbors(node, level):
                if nb in visited:
                    continue
                visited.add(nb)
                s = sim(nb)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(best, (s, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
                    heapq.heappush(frontier, (-s, nb))
        self.visited_last = len(visited)
        return sorted(best, reverse=True)

    def _insert(self, i: int) -> None:
        q = self.vecs[i]
        lvl = int(self.levels[i])
        ep = [self.entry]
        # greedy descent through the upper layers
        for level in range(self.max_level, lvl, -1):
            ep = [self._search_layer(q, ep, 1, level)[0][1]]
        for level in range(min(lvl, self.max_level), -1, -1):
            cand = self._search_layer(q, ep, self.ef_construction, level)
            m = self.M if level > 0 else 2 * self.M
            chosen = [n for _s, n in cand[:m] if n != i]
            if not chosen and ep:
                chosen = [ep[0]]  # connectivity fallback: entry chain
            for n in chosen:
                self.edges[level][i].append(n)
                self.edges[level][n].append(i)
                if len(self.edges[level][n]) > m:
                    # keep the node's m most-similar neighbors
                    nbrs = self.edges[level][n]
                    s = self.vecs[nbrs] @ self.vecs[n]
                    keep = np.argsort(-s, kind="stable")[:m]
                    self.edges[level][n] = [nbrs[j] for j in keep]
            ep = [n for _s, n in cand] or [self.entry]
        if lvl > int(self.levels[self.entry]):
            self.entry = i

    # ----------------------------------------------------------- search
    def search(self, q, k: int, ef: int | None = None) -> np.ndarray:
        """Top-k centroid ids by dot product, best-first. ``ef >= K``
        saturates: the graph is connected by construction, the beam
        never prunes, and the result is exactly brute force."""
        if self.K == 0:
            return np.empty(0, dtype=np.int64)
        q = np.asarray(q, dtype=np.float64)
        ef = max(int(ef if ef is not None else 4 * k), k)
        ep = [self.entry]
        for level in range(self.max_level, 0, -1):
            ep = [self._search_layer(q, ep, 1, level)[0][1]]
        best = self._search_layer(q, ep, ef, 0)
        out = [n for _s, n in best[:k]]
        return np.asarray(out, dtype=np.int64)


def hnsw_ann_topk(
    emb,
    n_queries: int = 8,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int | None = None,
    ef: int | None = None,
    iters: int = 5,
    M: int = 8,
):
    """IVF cosine top-k with HNSW-selected probes: identical to
    ``similarity.ivf_ann_topk`` except the per-query nprobe centroid
    selection walks the centroid graph instead of scoring all K.
    Saturated (``nprobe = n_centroids``, ``ef >= n_centroids``, the
    defaults) this is EXACTLY brute force — the driver-contract oracle
    configuration; pruned ef/nprobe is the recall-gated serving path."""
    from pyspark.sql import functions as F

    from .similarity import (
        _ranked,
        bounded_collect,
        ivf_assign,
        train_ivf_centroids,
    )

    C = train_ivf_centroids(emb, n_centroids, iters)
    graph = HNSW(C, M=M)
    assign = ivf_assign(emb, C)
    if nprobe is None:
        nprobe = n_centroids
    nprobe = min(nprobe, n_centroids)
    if ef is None:
        ef = n_centroids

    qrows = bounded_collect(
        emb.filter(F.col("vec_id") < n_queries).select("vec_id", "embedding"),
        n_queries,
        "hnsw_ann_topk query vectors",
    )
    pq, pc = [], []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        qv /= max(float(np.linalg.norm(qv)), 1e-12)
        top = graph.search(qv, nprobe, ef=ef)
        pq.extend([int(r["vec_id"])] * len(top))
        pc.extend(int(c) for c in top)
    spark = emb.sparkSession
    probe_df = spark.createDataFrame(
        list(zip(pq, pc)), schema="query_id long, cid int"
    )
    cand = (
        assign.join(F.broadcast(probe_df), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    qe = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    joined = (
        cand.join(emb.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qe), "query_id")
    )
    return _ranked(joined, k)
