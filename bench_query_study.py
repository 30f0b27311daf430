#!/usr/bin/env python
"""Large-index query-lane study (round-3 artifacts for VERDICT items 1
and 4): builds (or reuses) a big synthetic index and measures, per
reference-style query:

* cold EAGER driver lane (full payload fetch + vectorized decode + dense
  scorer — the round-2 cold default);
* cold BLOCK-SELECTED lane (two-hop: metadata, then only surviving
  blocks' bytes — ``topk_block_selected``);
* the two cluster lanes for over-cap queries: unpruned
  ``topk_distributed`` (round-2 dispatch target) vs the pruned sharded
  ``topk_sharded`` (round-3 dispatch target).

All lanes are asserted result-identical per query before timings are
reported (score rounding 1e-9 for the distributed lane, bitwise for the
rest). Usage::

    YASE_STUDY_DOCS=1600000 python bench_query_study.py
    YASE_STUDY_APPEND=1 ... # also append the summary to BENCH/BASELINE.md

The index is cached under /dev/shm keyed by doc count, so re-runs skip
the build.
"""

from __future__ import annotations

import json
import os
import sys
import time


def pctl(xs, p):
    xs = sorted(xs)
    return xs[min(len(xs) - 1, int(len(xs) * p))]


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(os.environ.get("YASE_STUDY_DOCS", "1600000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.query import IndexReader
    from yase_spark.session import get_spark
    from yase_spark.synth import corpus_df, reference_query_set
    from yase_spark.tokenize import analyze_query

    spark = get_spark(cpus=cpus, app="yase-study", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    root = f"{base}/yase_study_{n_docs}"
    cfg = IndexConfig(shuffle_partitions=2 * cpus, term_buckets=256)
    out: dict = {"n_docs": n_docs, "cpus": cpus}
    if not os.path.exists(os.path.join(root, "stats", "VERSION")):
        corpus = corpus_df(spark, n_docs, partitions=4 * cpus)
        t0 = time.perf_counter()
        s = build_index(spark, corpus, root, cfg)
        out["build_s"] = round(time.perf_counter() - t0, 1)
        out["build_docs_per_s"] = round(s["docs_per_s"], 1)

    topks = [q for q in reference_query_set() if q["kind"] == "topk"]

    # ---- cold driver lanes -------------------------------------------
    # eager = forced one-job full fetch + dense; blocksel = the two-hop
    # block-selected lane (with its in-lane adaptive eager bail-out);
    # regimes are reported separately — the production dispatch (topk())
    # only routes idf-dominated/single-term queries at the lane.
    eager, blocksel = [], []
    sel_e, sel_b = [], []
    n_selective = 0
    for q in topks:
        rd = IndexReader(spark, root)  # fresh caches per query = cold
        t0 = time.perf_counter()
        want = rd.topk(q["query"], q.get("k", 10), use_wand=False)
        e = time.perf_counter() - t0
        eager.append(e)

        rd2 = IndexReader(spark, root)
        t0 = time.perf_counter()
        got, st = rd2.topk_block_selected(q["query"], q.get("k", 10),
                                          return_stats=True)
        bs = time.perf_counter() - t0
        blocksel.append(bs)
        if not st.get("fallback") and st["blocks_total"]:
            n_selective += 1
            sel_e.append(e)
            sel_b.append(bs)
        assert got == want, f"block-selected mismatch on {q['query_id']}"
    out["cold_eager_p50_s"] = round(pctl(eager, 0.5), 3)
    out["cold_eager_p95_s"] = round(pctl(eager, 0.95), 3)
    out["cold_blocksel_p50_s"] = round(pctl(blocksel, 0.5), 3)
    out["cold_blocksel_p95_s"] = round(pctl(blocksel, 0.95), 3)
    out["n_selective_queries"] = n_selective
    if sel_e:
        out["selective_eager_mean_s"] = round(sum(sel_e) / len(sel_e), 3)
        out["selective_blocksel_mean_s"] = round(sum(sel_b) / len(sel_b), 3)

    # ---- cluster lanes on the heaviest queries -----------------------
    rd = IndexReader(spark, root)
    heavy = sorted(
        topks,
        key=lambda q: -sum(rd.term_dfs(analyze_query(q["query"])).values()),
    )[:5]
    dist, shard, shard_stats = [], [], []
    for q in heavy:
        k = q.get("k", 10)
        want = rd.topk(q["query"], k)
        t0 = time.perf_counter()
        rows = rd.topk_distributed(q["query"], k).collect()
        dist.append(time.perf_counter() - t0)
        got_d = [(int(r["rank"]), int(r["doc_id"]), round(float(r["score"]), 9))
                 for r in rows]
        assert got_d == [(r, d, round(s, 9)) for r, d, s in want], q["query_id"]

        t0 = time.perf_counter()
        got_s, st = rd.topk_sharded(q["query"], k, return_stats=True)
        shard.append(time.perf_counter() - t0)
        shard_stats.append(st)
        assert got_s == want, f"sharded mismatch on {q['query_id']}"
    out["overcap_distributed_mean_s"] = round(sum(dist) / len(dist), 3)
    out["overcap_sharded_mean_s"] = round(sum(shard) / len(shard), 3)
    out["sharded_ranges_mean"] = round(
        sum(s["n_ranges"] for s in shard_stats) / len(shard_stats), 1
    )
    out["sharded_decode_fraction_mean"] = round(
        sum(s["blocks_decoded"] / max(1, s["blocks_total"])
            for s in shard_stats) / len(shard_stats), 4,
    )
    print(json.dumps(out))

    if os.environ.get("YASE_STUDY_APPEND") == "1":
        stamp = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH", "BASELINE.md"), "a") as f:
            f.write(f"\n## Query-lane study {stamp} ({n_docs} docs)\n\n")
            for k, v in out.items():
                f.write(f"- {k}: {v}\n")
    spark.stop()


if __name__ == "__main__":
    main()
