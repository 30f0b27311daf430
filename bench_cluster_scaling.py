#!/usr/bin/env python
"""TRUE multi-JVM two-cluster-size scaling evidence (BASELINE.json:14).

``bench_scaling.py`` evidences the N-vs-4N criterion with two local[]
parallelism levels inside ONE JVM; that conflates engine scaling with a
single shared heap/GC domain across all task threads. This harness
instead runs a REAL Spark standalone cluster on this box — the exact
processes a multi-node deployment runs (separate master, worker, and
executor JVMs, each executor with its own heap and its own Python worker
pool) — and builds the same index over the same staged corpus at two
cluster sizes:

- N  = 1 worker x C cores  -> 1 executor JVM
- 4N = 4 workers x C cores -> 4 executor JVMs

Each worker is ``taskset``-pinned to its own disjoint C-core block, so
every "node" has an identical per-core cache/bandwidth share at both
levels — the single-box analogue of adding nodes. The executor shape
(cores, heap) is IDENTICAL at both levels, exactly as on a real cluster;
only the number of executors changes. The driver JVM floats unpinned (a
real cluster gives it its own node); at the 4N level it competes with
the workers for cycles, which biases measured efficiency DOWN
(conservative). Pairings: C=2 (total 2 vs 8 cores — per-core DRAM/LLC
share comfortably constant, the cleanest node-add analogue this box can
express) and C=8 (total 8 vs 32 — fully loads the box, where
``bench_contention.py`` shows a no-Spark 1.36x/core shared-memory
degradation; reported with that context).

Outputs must be bitwise-identical across levels (docs + segments
signatures, every reference-query result) — the same
parallelism-invariance gate as the local harness. Results append to
BENCH/BASELINE.md. Usage:

    python bench_cluster_scaling.py            # C from YASE_CLUSTER_CORES (default 2)
    YASE_CLUSTER_CORES=8 python bench_cluster_scaling.py
"""

from __future__ import annotations

import datetime
import glob
import json
import os
import shutil
import subprocess
import sys
import time

from bench_scaling import WORKER, stage_corpus

REPO = os.path.dirname(os.path.abspath(__file__))
MASTER_URL = "spark://127.0.0.1:7077"


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _pgrep(pattern: str) -> list[int]:
    p = subprocess.run(["pgrep", "-f", pattern], capture_output=True, text=True)
    return [int(x) for x in p.stdout.split()]


def ensure_master() -> None:
    if _pgrep(r"java .*spark\.deploy\.master\.Master"):
        return
    home = _spark_home()
    log = "/tmp/yase_master.log"
    subprocess.run(
        ["bash", "-c",
         f"setsid nohup env SPARK_SCALA_VERSION=2.13 SPARK_HOME={home} "
         f"java -Xmx1g -cp '{home}/jars/*' org.apache.spark.deploy.master.Master "
         f"--host 127.0.0.1 --port 7077 --webui-port 0 > {log} 2>&1 < /dev/null &"],
        check=True,
    )
    for _ in range(30):
        time.sleep(1)
        if os.path.exists(log) and "started" in open(log).read():
            return
    raise RuntimeError("standalone master failed to start; see /tmp/yase_master.log")


def stop_workers() -> None:
    for pid in _pgrep(r"java .*spark\.deploy\.worker\.Worker"):
        subprocess.run(["kill", str(pid)])
    deadline = time.time() + 20
    while _pgrep(r"java .*spark\.deploy\.worker\.Worker") and time.time() < deadline:
        time.sleep(0.5)


def start_workers(count: int, cores: int, mem: str) -> None:
    """Launch ``count`` workers, worker i pinned to cores [i*C, (i+1)*C)."""
    stop_workers()
    home = _spark_home()
    for i in range(count):
        lo, hi = i * cores, (i + 1) * cores - 1
        wdir = f"/tmp/yase_cworker{i}"
        shutil.rmtree(wdir, ignore_errors=True)
        local = f"/dev/shm/yase_cluster_local{i}" if os.path.isdir("/dev/shm") else wdir
        os.makedirs(local, exist_ok=True)
        log = f"/tmp/yase_cworker{i}.log"
        open(log, "w").close()
        subprocess.run(
            ["bash", "-c",
             f"setsid nohup env SPARK_SCALA_VERSION=2.13 SPARK_HOME={home} "
             f"SPARK_WORKER_DIR={wdir} SPARK_LOCAL_DIRS={local} "
             f"taskset -c {lo}-{hi} "
             f"java -Xmx1g -cp '{home}/jars/*' org.apache.spark.deploy.worker.Worker "
             f"--host 127.0.0.1 --cores {cores} --memory {mem} --webui-port 0 "
             f"{MASTER_URL} > {log} 2>&1 < /dev/null &"],
            check=True,
        )
    deadline = time.time() + 60
    pending = set(range(count))
    while pending and time.time() < deadline:
        time.sleep(1)
        for i in list(pending):
            if "Successfully registered with master" in open(f"/tmp/yase_cworker{i}.log").read():
                pending.discard(i)
    if pending:
        raise RuntimeError(f"workers {sorted(pending)} did not register; see /tmp/yase_cworker*.log")


def run_level(n_workers: int, cores: int, mem: str, n_docs: int, stage: str) -> dict:
    start_workers(n_workers, cores, mem)
    total = n_workers * cores
    spark_kw = {
        "master": MASTER_URL,
        "extra": {
            "spark.executor.cores": str(cores),
            "spark.executor.memory": mem,
            "spark.cores.max": str(total),
            "spark.pyspark.python": sys.executable,
            "spark.executorEnv.PYSPARK_PYTHON": sys.executable,
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL": "mimalloc",
            "spark.executorEnv.YASE_ARROW_BATCH": os.environ.get("YASE_ARROW_BATCH", "512"),
        },
    }
    code = (
        WORKER.replace("__REPO__", repr(REPO))
        .replace("__CPUS__", str(total))
        .replace("__NDOCS__", str(n_docs))
        .replace("__STAGE__", repr(stage))
        .replace("__SPARK_KW__", repr(spark_kw))
    )
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_SCALA_VERSION="2.13")
    if os.path.isdir("/dev/shm"):
        os.makedirs("/dev/shm/yase_spark_local", exist_ok=True)
        env["SPARK_LOCAL_DIRS"] = "/dev/shm/yase_spark_local"
    # the driver subprocess is NOT taskset-pinned: executors do the work,
    # and pinning the driver into a worker's block would perturb that
    # block asymmetrically across levels
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            r = json.loads(line[len("RESULT "):])
            if r["executors"] != n_workers:
                raise RuntimeError(
                    f"expected {n_workers} executor JVMs, app saw {r['executors']}"
                )
            return r
    raise RuntimeError(
        f"cluster level {n_workers}x{cores} failed:\n{p.stdout[-2000:]}\n{p.stderr[-4000:]}"
    )


def main() -> None:
    n_docs = int(os.environ.get("YASE_SCALE_DOCS", "400000"))
    cores = int(os.environ.get("YASE_CLUSTER_CORES", "2"))
    # executor heap: per-core-constant (same floor logic as the local
    # harness) and IDENTICAL per executor at both levels
    heap_mb = max(2048, cores * int(os.environ.get("YASE_HEAP_PER_CORE_MB", "768")))
    mem = f"{heap_mb // 1024}g"
    assert 4 * cores <= os.cpu_count(), "4 workers must fit the box"
    ensure_master()
    stage = stage_corpus(n_docs)
    print(f"staged {n_docs} docs at {stage}", file=sys.stderr)
    try:
        levels = {}
        for n_workers in (1, 4):
            levels[n_workers] = run_level(n_workers, cores, mem, n_docs, stage)
            r = levels[n_workers]
            print(
                f"{n_workers} executor(s) x {cores} cores: {r['wall_s']:.1f}s "
                f"({r['docs_per_s']:.0f} docs/s)",
                file=sys.stderr,
            )
        a, b = levels[1], levels[4]
        eff = (a["wall_s"] / b["wall_s"]) / 4.0
        invariant = (
            a["seg_sig"] == b["seg_sig"]
            and a["docs_sig"] == b["docs_sig"]
            and a["query_sig"] == b["query_sig"]
        )
        out = {
            "mode": "standalone-cluster (separate master/worker/executor JVMs)",
            "n_docs": n_docs,
            "executor_shape": f"{cores} cores / {mem} heap, taskset-pinned per-worker core blocks",
            "N": {"executors": 1, **{k: a[k] for k in ("wall_s", "docs_per_s", "postings_per_s", "q_p95_ms")}},
            "4N": {"executors": 4, **{k: b[k] for k in ("wall_s", "docs_per_s", "postings_per_s", "q_p95_ms")}},
            "scaling_efficiency": round(eff, 3),
            "gate_0.8": eff >= 0.8,
            "parallelism_invariant_output": invariant,
        }
        print(json.dumps(out, indent=1))
        md = os.path.join(REPO, "BENCH", "BASELINE.md")
        with open(md, "a") as f:
            f.write(
                f"\n## Cluster scaling run {datetime.datetime.now().isoformat(timespec='seconds')}"
                f" (REAL standalone cluster, multi-JVM)\n\n"
                f"- mode: standalone master + taskset-pinned workers; separate executor JVMs,\n"
                f"  each {cores} cores / {mem} heap (identical executor shape at both levels);\n"
                f"  driver unpinned (competes with workers at 4N: conservative bias)\n"
                f"- input: {n_docs} synthetic docs (seed=42), identical at both levels\n"
                f"- N = 1 executor x {cores} cores: {a['wall_s']:.1f}s build, {a['docs_per_s']:.0f} docs/s, "
                f"{a['postings_per_s']:.0f} postings/s, query p95 {a['q_p95_ms']:.2f} ms\n"
                f"- 4N = 4 executors x {cores} cores: {b['wall_s']:.1f}s build, {b['docs_per_s']:.0f} docs/s, "
                f"{b['postings_per_s']:.0f} postings/s, query p95 {b['q_p95_ms']:.2f} ms\n"
                f"- efficiency (T_N/T_4N)/4 = **{eff:.3f}** (gate >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'})\n"
                f"- outputs identical across levels (docs, segments, all query results): "
                f"{'YES' if invariant else 'NO'}\n"
            )
    finally:
        stop_workers()
        for d in glob.glob("/dev/shm/yase_*") + glob.glob("/tmp/yase_cworker*"):
            shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
