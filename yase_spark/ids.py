"""Deterministic, parallelism-invariant doc_id minting (SURVEY.md §1.1).

``doc_id`` = 1-based position in the global ``ORDER BY repo, path, commit``
over the deduplicated corpus. Rank-identical top-k across N and 4N
executors (BASELINE.json:14) forbids ``monotonically_increasing_id()``
(partition-dependent).

Two implementations:

* ``assign_doc_ids`` — scalable two-phase zip: range-sort, count rows per
  sorted partition (one tiny collect), then per-partition offset +
  running row number inside ``mapInPandas``. No global single-partition
  window, no RDDs; cost is one range shuffle, which a 10^12-row build
  pays once at ingest. The result is boundary-invariant: the sort order
  is total (keys are unique after dedup), so the id of a row does not
  depend on where range boundaries fall.
* ``assign_doc_ids_window`` — single-partition ``row_number`` oracle used
  in tests to prove the scalable path correct at small scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["repo", "path", "commit"]


def assign_doc_ids(df: DataFrame, sort_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    n_part = sort_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = (
        df.repartitionByRange(n_part, *KEY)
        .sortWithinPartitions(*KEY)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in s.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(s.schema.fields) + [StructField("doc_id", LongType())])

    def zip_ids(batches):
        seen = 0
        for pdf in batches:
            base = boff.value.get(int(pdf["_pid"].iloc[0]), 0) if len(pdf) else 0
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    out = s.mapInPandas(zip_ids, schema=schema).drop("_pid")
    # expose the persisted sort stage so the build can release it once
    # downstream tables are materialized
    out._yase_persisted_source = s
    return out


def assign_doc_ids_window(df: DataFrame) -> DataFrame:
    """Small-scale oracle: global window row_number (single partition)."""
    w = Window.orderBy(*KEY)
    return df.withColumn("doc_id", F.row_number().over(w))


def dedup_and_assign_ids(
    corpus: DataFrame, sort_partitions: int | None = None, id_offset: int = 0
) -> DataFrame:
    """Fused dedup + deterministic doc_id mint in ONE content shuffle.

    A separate ``groupBy(key)`` dedup would shuffle the full ``content``
    column once for the dedup and again for the id sort — at 10^12-file
    scale that doubles the dominant network cost. Instead: range-partition
    by the natural key (equal keys land in one partition), sort within
    partitions by (key, lang, content), drop non-first duplicate keys
    streamingly (equal-key runs are adjacent; ties broken by the sort =
    lexicographic min, same semantics as the groupBy-min path), then
    two-phase zip the dense 1-based doc_id exactly like assign_doc_ids.
    """
    spark = corpus.sparkSession
    n_part = sort_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = (
        corpus.repartitionByRange(n_part, *KEY)
        .sortWithinPartitions(*KEY, "lang", "content")
        .withColumn("_pid", F.spark_partition_id())
    )

    def dedup(batches):
        prev_key = None
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.drop_duplicates(subset=KEY, keep="first")
            if prev_key is not None:
                first = tuple(pdf.iloc[0][k] for k in KEY)
                if first == prev_key:
                    pdf = pdf.iloc[1:]
            if len(pdf):
                prev_key = tuple(pdf.iloc[-1][k] for k in KEY)
                yield pdf

    from pyspark.storagelevel import StorageLevel

    s1 = s.mapInPandas(dedup, schema=s.schema).persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in s1.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, id_offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(list(s1.schema.fields) + [StructField("doc_id", LongType())])

    def zip_ids(batches):
        seen = 0
        for pdf in batches:
            if pdf.empty:
                continue
            base = boff.value.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf

    out = s1.mapInPandas(zip_ids, schema=schema).drop("_pid")
    out._yase_persisted_source = s1
    out._yase_total_rows = acc - id_offset  # deduped row count, free here
    return out
