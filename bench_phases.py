#!/usr/bin/env python
"""Phase-level build timing at one parallelism level (scaling-forensics
artifact): same protocol as bench_scaling's workers — /dev/shm corpus
stage + index roots, untimed warmup build, identical DATA-derived
partitioning — but runs ONE level per invocation and prints the
per-phase breakdown, so 8-vs-32 losses can be attributed to a stage
(tokenize/merge: memory-bandwidth-bound, ceiling measured by
bench_contention.py) or to fixed costs (fingerprint scan, doclen stats,
commits — Amdahl).

    python bench_phases.py 8   && python bench_phases.py 32

Recorded calm-window result (2026-08-17, steal 0, single-proc contention
probe within 4% of baseline): T8 = 75.5 s, T32 = 30.0 s ->
efficiency 0.629; tokenize 36.3 -> 13.7 s (2.65x vs the 2.94x
bandwidth ceiling), merge groups 33.7 -> 13.3 s (2.53x), fixed phases
~3 s. During phantom-neighbor windows (no /proc/stat steal; aggregate
bandwidth collapses while single-core throughput stays within 5%) the
same run measures T32 = 48-104 s — see BENCH/BASELINE.md for the
window log."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, repo)
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_docs = int(os.environ.get("YASE_SCALE_DOCS", "400000"))

    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.session import get_spark
    from yase_spark.synth import corpus_df

    spark = get_spark(cpus=cpus, app=f"yase-phases-{cpus}",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    stage = f"{base}/yase_phase_corpus_{n_docs}"
    if not os.path.exists(stage + "/_SUCCESS"):
        corpus_df(spark, n_docs, partitions=64).write.mode(
            "overwrite"
        ).parquet(stage)
    corpus = spark.read.parquet(stage)
    cfg = IndexConfig(build_groups=2, shuffle_partitions=2 * cpus,
                      term_buckets=256)
    build_index(spark, corpus_df(spark, 2000, partitions=2 * cpus),
                tempfile.mkdtemp(prefix="yase_phwarm_", dir=base), cfg)
    t0 = time.perf_counter()
    s = build_index(
        spark, corpus, tempfile.mkdtemp(prefix=f"yase_ph{cpus}_", dir=base), cfg
    )
    print(json.dumps({
        "cpus": cpus, "n_docs": n_docs,
        "wall_s": round(time.perf_counter() - t0, 1),
        "docs_per_s": round(s["docs_per_s"], 1),
        "phases": s["phases"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
