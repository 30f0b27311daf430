#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json:14: N vs 4N executors,
throughput scaling efficiency >= 0.8).

No real cluster exists in this sandbox; per the driver instruction the
criterion is evidenced by running the SAME job on the SAME input at two
pinned local parallelism levels (``YASE_SCALE_LEVELS``, default "8,32";
"2,8" is the pairing that best approximates a real 4x-executor cluster
on one box — per-core memory bandwidth and cache stay constant across
levels, as they would across nodes) in fresh processes, reporting
throughput at both plus ``efficiency = (T_N / T_4N) / 4``. Also asserts
parallelism-invariance: the index contents (docs table + segments
signature) and every reference-query result must be identical at both
levels. Results are appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = """
import json, os, sys, tempfile, time
sys.path.insert(0, __REPO__)
# tmpfs roots: removes disk write-back noise from the measurement (the
# build writes ~GBs of staging+segments; /tmp flushing dominated run-to-
# run variance). Falls back to /tmp when shm is absent.
_BENCH_TMP = "/dev/shm" if os.path.isdir("/dev/shm") else None
from pyspark.sql import functions as F
from yase_spark.session import get_spark
from yase_spark.synth import corpus_df, reference_query_set
from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.query import IndexReader
from yase_spark.catalog import Catalog

cpus = __CPUS__
n_docs = __NDOCS__
stage = __STAGE__  # corpus parquet staged ONCE by the parent (byte-identical input)
spark = get_spark(cpus=cpus, app=f"yase-scale-{cpus}", shuffle_partitions=2 * cpus, **__SPARK_KW__)
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet(stage)
# term_buckets=256: the merge's reduce side is bucket-partitioned, so 64
# buckets = 2 task waves on 32 cores and the bucket-skew tail caps the 4N
# level; 256 gives ~8 waves and smooth balance at BOTH levels (identical
# output modulo the bucket column, which is a pure function of term).
cfg = IndexConfig(build_groups=2, shuffle_partitions=2 * cpus, term_buckets=256)

# untimed warmup: a tiny build exercises every stage type once so Python
# worker spawn/imports and JVM codegen/JIT are excluded from the timed
# run (both levels warm identically; measured cold-start is ~45s at N=8
# vs ~6s at 4N purely from worker startup serialization)
warm_corpus = corpus_df(spark, 2000, partitions=2 * cpus)
build_index(spark, warm_corpus, tempfile.mkdtemp(prefix="yase_warm_", dir=_BENCH_TMP), cfg)
# executor JVM count (0 = local mode, where the driver IS the executor);
# the cluster harness asserts this matches the worker count it launched
n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

root = tempfile.mkdtemp(prefix=f"yase_scale_{cpus}_", dir=_BENCH_TMP)
t0 = time.perf_counter()
summary = build_index(spark, corpus, root, cfg)
wall = time.perf_counter() - t0

# content signature: must be identical across parallelism levels
cat = Catalog(root)
seg_sig = (
    cat.read(spark, "segments")
    .agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(xxhash64(term, shard, df, cf, n, sha2(payload, 256)))").alias("x"),
    )
    .collect()[0]
)
docs_sig = (
    cat.read(spark, "docs")
    .agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(xxhash64(doc_id, repo, path, commit, doc_len, content_sha256))").alias("x"),
    )
    .collect()[0]
)
rd = IndexReader(spark, root, cfg)
qs = reference_query_set()
lat = rd.run_query_set(qs, reps=3)
import hashlib
qsig = hashlib.md5(
    str(sorted((k, str(v)) for k, v in lat["results"].items())).encode()
).hexdigest()
print("RESULT " + json.dumps({
    "cpus": cpus, "executors": n_exec, "wall_s": wall, "docs_per_s": n_docs / wall,
    "postings": summary["postings"],
    "postings_per_s": summary["postings"] / wall,
    "skew_ratio": summary["skew_ratio"],
    "seg_sig": [int(seg_sig["c"]), int(seg_sig["x"])],
    "docs_sig": [int(docs_sig["c"]), int(docs_sig["x"])],
    "query_sig": qsig,
    "q_p50_ms": lat["p50_ms"], "q_p95_ms": lat["p95_ms"],
    "phases": summary.get("phases", {}),
}))
spark.stop()
"""


def stage_corpus(n_docs: int) -> str:
    """Generate + write the benchmark corpus once, unpinned (untimed)."""
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    stage = tempfile.mkdtemp(prefix="yase_scale_corpus_", dir=base) + "/corpus"
    code = f"""
import sys
sys.path.insert(0, {repo!r})
from yase_spark.session import get_spark
from yase_spark.synth import corpus_df
spark = get_spark(cpus=32, app="yase-stage", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
corpus_df(spark, {n_docs}, partitions=64).write.mode("overwrite").parquet({stage!r})
spark.stop()
"""
    env = dict(os.environ, PYTHONPATH=repo)
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=3600)
    if p.returncode != 0:
        raise RuntimeError(f"staging failed: {p.stderr[-2000:]}")
    return stage


def run_level(cpus: int, n_docs: int, stage: str) -> dict:
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (
        WORKER.replace("__REPO__", repr(repo))
        .replace("__CPUS__", str(cpus))
        .replace("__NDOCS__", str(n_docs))
        .replace("__STAGE__", repr(stage))
        .replace("__SPARK_KW__", "{}")
    )
    # per-core-constant heap (0.75 GiB/core): a real 4N cluster has 4x the
    # total executor memory, and a same-size heap at 4x the task threads
    # measurably GC-throttles the big level; huge heaps (48g) are also
    # pathological on this box (page-zeroing churn), so the scale is
    # capped well below that.
    heap = os.environ.get("YASE_HEAP_PER_CORE_MB", "768")
    env = dict(
        os.environ, PYTHONPATH=repo,
        YASE_DRIVER_MEM=f"{max(6144, cpus * int(heap)) // 1024}g",
    )
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/yase_spark_local", exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = "/dev/shm/yase_spark_local"
    # pin the process tree to exactly `cpus` cores: local[8] on a 32-core
    # box would otherwise borrow idle cores for its Python UDF workers
    # (each task = 1 JVM thread + 1 Python worker), silently inflating the
    # small-cluster level and corrupting the N-vs-4N comparison
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code]
    p = subprocess.run(
        cmd, capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker cpus={cpus} failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}")


def main() -> None:
    n_docs = int(os.environ.get("YASE_SCALE_DOCS", "400000"))
    reps = int(os.environ.get("YASE_SCALE_REPS", "1"))
    # the driver instruction permits any N vs 4N core pairing as the
    # two-cluster-size evidence. 2,8 approximates a real 4x-executor
    # cluster best on a single box (per-core resources stay constant);
    # 8,32 additionally reports the fully-loaded-box behavior, where all
    # 32 cores share one memory subsystem — a contention a multi-NODE 4x
    # cluster does not have.
    lo_cpus, hi_cpus = (
        int(x) for x in os.environ.get("YASE_SCALE_LEVELS", "8,32").split(",")
    )
    assert hi_cpus == 4 * lo_cpus, "levels must be N and 4N"
    stage = stage_corpus(n_docs)
    print(f"staged {n_docs} docs at {stage}", file=sys.stderr)
    levels = {}
    for cpus in (lo_cpus, hi_cpus):
        runs = [run_level(cpus, n_docs, stage) for _ in range(reps)]
        runs.sort(key=lambda r: r["wall_s"])
        levels[cpus] = runs[len(runs) // 2]  # median
        print(f"local[{cpus}]: {levels[cpus]['wall_s']:.1f}s "
              f"({levels[cpus]['docs_per_s']:.0f} docs/s) "
              f"phases={levels[cpus].get('phases')}", file=sys.stderr)

    a, b = levels[lo_cpus], levels[hi_cpus]
    eff = (a["wall_s"] / b["wall_s"]) / 4.0
    invariant = (
        a["seg_sig"] == b["seg_sig"]
        and a["docs_sig"] == b["docs_sig"]
        and a["query_sig"] == b["query_sig"]
    )
    out = {
        "n_docs": n_docs,
        "N": {"cpus": lo_cpus, **{k: a[k] for k in ("wall_s", "docs_per_s", "postings_per_s", "q_p95_ms")}},
        "4N": {"cpus": hi_cpus, **{k: b[k] for k in ("wall_s", "docs_per_s", "postings_per_s", "q_p95_ms")}},
        "scaling_efficiency": round(eff, 3),
        "gate_0.8": eff >= 0.8,
        "parallelism_invariant_output": invariant,
    }
    print(json.dumps(out, indent=1))

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        import datetime

        f.write(
            f"\n## Scaling run {datetime.datetime.now().isoformat(timespec='seconds')}\n\n"
            f"- input: {n_docs} synthetic docs (seed=42), identical at both levels\n"
            f"- N = local[{lo_cpus}]: {a['wall_s']:.1f}s build, {a['docs_per_s']:.0f} docs/s, "
            f"{a['postings_per_s']:.0f} postings/s, query p95 {a['q_p95_ms']:.2f} ms\n"
            f"- 4N = local[{hi_cpus}]: {b['wall_s']:.1f}s build, {b['docs_per_s']:.0f} docs/s, "
            f"{b['postings_per_s']:.0f} postings/s, query p95 {b['q_p95_ms']:.2f} ms\n"
            f"- efficiency (T_N/T_4N)/4 = **{eff:.3f}** (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
            f"- outputs identical across levels (docs, segments, all query results): "
            f"{'YES' if invariant else 'NO'}\n"
        )


if __name__ == "__main__":
    try:
        main()
    finally:
        import glob
        import shutil

        for d in glob.glob("/dev/shm/yase_*"):
            shutil.rmtree(d, ignore_errors=True)
