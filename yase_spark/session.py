"""SparkSession factory (SURVEY.md §7 M0).

One place to pin the configs that matter at scale: AQE (runtime
coalesce + skew-join splitting), Arrow execution for pandas UDFs, and
shuffle partitions scaled with cores (BASELINE.json:14: partitioning
handled explicitly; two-cluster-size protocol in BASELINE.md §2 runs this
factory at local[8] and local[32]).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import DEFAULT_CPUS


def get_spark(
    cpus: int | None = None,
    app: str = "yase_spark",
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """``master`` overrides the default ``local[cpus]`` — pass a
    ``spark://host:port`` URL to run against a standalone cluster (the
    multi-JVM scaling evidence in ``bench_cluster_scaling.py`` does);
    ``cpus`` then sizes shuffle partitions only, and executor count/size
    come from ``extra`` (``spark.executor.cores`` / ``spark.cores.max``).
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle = shuffle_partitions or max(2 * cpus, 8)
    # pin pyarrow's allocator in every Python worker (inherited env):
    # the DEFAULT pool selection measurably degrades under 32 concurrent
    # workers (2.4x per-proc slowdown in the tokenize kernel vs 1.2x
    # with an explicit pool)
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
    b = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # small Arrow batches keep each Python worker's transient arrays
        # cache-resident; at 32 concurrent workers, 16384-row batches of
        # document content (~170MB of transient numpy/pandas per batch)
        # drove the kernel to 80% sys time (page churn) — 512 measured
        # 3.7x faster on the tokenize pass at local[32]
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("YASE_ARROW_BATCH", "512"),
        )
        # 8g measured FASTER than per-core sizing on this box (1.6M-doc
        # build at local[32]: 254 s @ 8g vs 383 s @ 24g, tokenize stage
        # 102 s vs 250 s) — large heaps hit the same first-touch
        # page-zeroing pathology BENCH/README.md records for 48g. Real
        # clusters size executor memory per node; override with
        # YASE_DRIVER_MEM when a workload actually spills.
        .config("spark.driver.memory", os.environ.get("YASE_DRIVER_MEM", "8g"))
        # committer v2: task commits rename straight into the output dir,
        # so the job-commit step stops being a driver-serial walk over
        # every written file (hundreds of partitionBy files per stage —
        # a measured flat cost that caps N->4N scaling efficiency)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # CPU-heavy scans (sha256, tokenize, sort) need many more input
        # splits than IO-bound ones: at 128m a ~300MB corpus collapses to
        # ~3 scan tasks and serializes the whole ingest regardless of
        # cores. 8m is right for this engine's per-row work; on a 100TB
        # deployment this knob trades task count vs per-task overhead and
        # is the first thing to retune (DESIGN.md §1).
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("YASE_SPLIT_BYTES", "8m"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
