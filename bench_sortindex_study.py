#!/usr/bin/env python
"""Index-sorting study: what early termination buys at the 1.6M-doc
study index (same cached index as bench_query_study.py).

Measures, with results asserted identical between lanes:

* sort-sibling build cost (one range shuffle of the docs dimension);
* match-all "longest 10 docs" browse — early-terminated prefix scan
  vs the classic full-dimension TakeOrdered lane (cold reader each);
* the same browse under a metadata predicate (lang filter);
* files_read / files_total for the ET lane (the IO-pruning evidence).

Usage::

    YASE_STUDY_DOCS=1600000 python bench_sortindex_study.py
    YASE_STUDY_APPEND=1 ...   # also append the summary to BENCH/BASELINE.md
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    n_docs = int(os.environ.get("YASE_STUDY_DOCS", "1600000"))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("YASE_STUDY_ROUNDS", "5"))

    from yase_spark.catalog import Catalog
    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.query import IndexReader
    from yase_spark.session import get_spark
    from yase_spark.sortindex import build_sort_index, sorted_scan_topk
    from yase_spark.synth import corpus_df

    spark = get_spark(cpus=cpus, app="yase-sortidx-study",
                      shuffle_partitions=2 * cpus)
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

    t0 = time.perf_counter()
    s = build_sort_index(spark, root, "doc_len")
    out["sort_build_s"] = round(time.perf_counter() - t0, 2)
    out["sort_files"] = s["files"]
    out["sort_noop"] = s["noop"]

    lang = Catalog(root).read(spark, "docs").select("lang").first()["lang"]
    cases = [
        ("match_all", None),
        ("predicate", f"lang = '{lang}'"),
    ]
    for name, pred in cases:
        et_t, cl_t = [], []
        for _ in range(rounds):
            t0 = time.perf_counter()
            et_df, stats = sorted_scan_topk(
                spark, root, "doc_len", k=10, predicate=pred,
                return_stats=True,
            )
            et_rows = [tuple(r) for r in et_df.collect()]
            et_t.append(time.perf_counter() - t0)

            rd = IndexReader(spark, root, shared_meta=False)
            base_df = Catalog(root).read(spark, "docs")
            t0 = time.perf_counter()
            cl_df = rd.topk_sort_field(
                None, "doc_len", k=10, early_terminate=False
            )
            if pred:
                # classic lane with the same predicate: filter + TakeOrdered
                from pyspark.sql import Window
                from pyspark.sql import functions as F

                d = base_df.filter(pred).select("doc_id", "doc_len")
                w = Window.orderBy(F.desc("doc_len"), F.asc("doc_id"))
                cl_df = (
                    d.orderBy(F.desc("doc_len"), F.asc("doc_id")).limit(10)
                    .withColumn("rank", F.row_number().over(w).cast("long"))
                    .select("rank", "doc_id", "doc_len")
                )
            cl_rows = [tuple(r) for r in cl_df.collect()]
            cl_t.append(time.perf_counter() - t0)
            assert et_rows == cl_rows, f"{name}: lanes disagree"
        out[name] = {
            "et_best_s": round(min(et_t), 3),
            "classic_best_s": round(min(cl_t), 3),
            "speedup": round(min(cl_t) / min(et_t), 2),
            "files_read": stats["files_read"],
            "files_total": stats["files_total"],
            "rows_in_read_files": stats["rows_in_read_files"],
            "rows_total": stats["rows_total"],
        }

    print(json.dumps(out, indent=1))
    if os.environ.get("YASE_STUDY_APPEND") == "1":
        md = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "BENCH", "BASELINE.md")
        with open(md, "a") as f:
            f.write(
                f"\n## Index-sorting study "
                f"{datetime.datetime.now().isoformat(timespec='seconds')} "
                f"({n_docs} docs, local[{cpus}])\n\n"
                f"- sort-sibling build: {out['sort_build_s']}s "
                f"({out['sort_files']} range files"
                f"{', noop' if out['sort_noop'] else ''})\n"
            )
            for name, _ in cases:
                r = out[name]
                f.write(
                    f"- {name} browse top-10 by doc_len: ET best "
                    f"{r['et_best_s']}s vs classic {r['classic_best_s']}s "
                    f"(**{r['speedup']}x**), files {r['files_read']}/"
                    f"{r['files_total']}, rows scanned "
                    f"{r['rows_in_read_files']}/{r['rows_total']}; "
                    f"results identical\n"
                )


if __name__ == "__main__":
    main()
