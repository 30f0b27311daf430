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
from .codec import decode_postings
from .config import IndexConfig
from .postings import term_bucket
from .tokenize import analyze_query


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


# ----------------------------------------------------------------- reader
class IndexReader:
    """Query-time view of a built index.

    Term fetch (Q1) prunes by the term-bucket partition layout (C7) and
    pushes the term predicate to the Parquet scan; decoded postings are
    cached driver-side for p95 latency (Q9 warm path).
    """

    def __init__(self, spark: SparkSession, index_root: str, cfg: IndexConfig | None = None):
        self.spark = spark
        self.cfg = cfg or IndexConfig()
        self.cat = Catalog(index_root)
        srow = self.cat.read(spark, "stats").collect()[0]
        self.n_docs = int(srow["n_docs"])
        self.avgdl = (srow["total_tokens"] / srow["n_docs"]) if srow["n_docs"] else 0.0
        self._segments = self.cat.read(spark, "segments")
        self._cache: dict[str, TermPostings | None] = {}

    # ------------------------------------------------------------- fetch
    def fetch_terms(self, terms: list[str]) -> dict[str, TermPostings | None]:
        missing = [t for t in dict.fromkeys(terms) if t not in self._cache]
        if missing:
            buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in missing})
            rows = (
                self._segments.filter(
                    F.col("bucket").isin(buckets) & F.col("term").isin(missing)
                )
                .select("term", "shard", "df", "n", "payload")
                .collect()
            )
            by_term: dict[str, list] = {}
            for r in rows:
                by_term.setdefault(r["term"], []).append(r)
            for t in missing:
                rs = sorted(by_term.get(t, []), key=lambda r: r["shard"])
                if not rs:
                    self._cache[t] = None
                    continue
                ids_l, tfs_l, dls_l = [], [], []
                df_g = int(rs[0]["df"])
                for r in rs:
                    ids, tfs, dls = decode_postings(bytes(r["payload"]), int(r["n"]))
                    ids_l.append(ids)
                    tfs_l.append(tfs)
                    dls_l.append(dls)
                idf = math.log(1.0 + (self.n_docs - df_g + 0.5) / (df_g + 0.5))
                ids = np.concatenate(ids_l)
                tfs = np.concatenate(tfs_l)
                dls = np.concatenate(dls_l)
                # Block bounds are recomputed here (one vectorized pass over
                # the already-decoded arrays) rather than trusted from the
                # stored metadata: (a) shard-split terms have partial interior
                # blocks that break fixed-stride indexing, and (b) after an
                # incremental corpus append the stored max_score is stale
                # under the NEW global stats (larger N -> larger idf), and a
                # too-small upper bound would make WAND prune real hits. The
                # stored block_meta remains the scan-time skip structure for
                # executors that decode lazily per block.
                bsz = self.cfg.block_size
                starts = np.arange(0, ids.size, bsz)
                scores = bm25_scores_np(
                    tfs, dls, idf, self.cfg.k1, self.cfg.b, self.avgdl
                )
                block_last = ids[np.minimum(starts + bsz - 1, ids.size - 1)]
                block_max = np.maximum.reduceat(scores, starts)
                self._cache[t] = TermPostings(
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
        return {t: self._cache[t] for t in dict.fromkeys(terms)}

    def _postings(self, query: str) -> list[TermPostings]:
        qterms = analyze_query(query)
        got = self.fetch_terms(qterms)
        return [got[t] for t in qterms if got[t] is not None]

    # ----------------------------------------------------------- queries
    # Below this candidate-postings count the numpy full-scan scorer beats
    # the per-pivot Python loop of the WAND executor (measured: ~2 ms vs
    # ~500 ms at 10^5 postings); WAND's pruning pays once lists are large
    # enough that even one vectorized pass over them dominates.
    WAND_MIN_POSTINGS = 5_000_000

    def topk(self, query: str, k: int = 10, use_wand: bool | None = None):
        """Ranked top-k. ``use_wand=None`` picks the executor by cost:
        WAND's per-pivot Python loop only pays off when pruning skips a
        large share of a big posting universe; for small universes the
        numpy full-scan scorer is faster. Both are exact and produce
        bitwise-identical scores (tests/test_query.py), so the dispatch
        is invisible in results."""
        tp = self._postings(query)
        if use_wand is None:
            use_wand = sum(t.doc_ids.size for t in tp) > self.WAND_MIN_POSTINGS
        fn = wand_topk if use_wand else naive_topk
        return fn(tp, k, self.cfg.k1, self.cfg.b, self.avgdl)

    def bool_and(self, query: str) -> np.ndarray:
        tp = self._postings(query)
        qn = len(analyze_query(query))
        if len(tp) < qn:  # a query term absent from the index -> empty AND
            return np.empty(0, dtype=np.int64)
        return bool_and(tp)

    def bool_or(self, query: str) -> np.ndarray:
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
        qterms = analyze_query(query)
        if not qterms:
            return self.spark.createDataFrame(
                [], schema="rank long, doc_id long, score double"
            )
        buckets = sorted({term_bucket(t, self.cfg.term_buckets) for t in qterms})
        segs = self._segments.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(qterms)
        ).select("term", "df", "n", "payload")
        n_docs, avgdl = self.n_docs, self.avgdl
        k1, b = self.cfg.k1, self.cfg.b

        def contribs(batches):
            import pandas as pd

            for pdf in batches:
                out_doc, out_sc = [], []
                for r in pdf.itertuples():
                    ids, tfs, dls = decode_postings(bytes(r.payload), int(r.n))
                    idf = math.log(1.0 + (n_docs - int(r.df) + 0.5) / (int(r.df) + 0.5))
                    sc = bm25_scores_np(tfs, dls, idf, k1, b, avgdl)
                    out_doc.append(ids)
                    out_sc.append(sc)
                if out_doc:
                    yield pd.DataFrame(
                        {
                            "doc_id": np.concatenate(out_doc),
                            "contrib": np.concatenate(out_sc),
                        }
                    )

        per_doc = (
            segs.mapInPandas(contribs, schema="doc_id long, contrib double")
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
                all_terms.extend(analyze_query(q["query"]))
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
