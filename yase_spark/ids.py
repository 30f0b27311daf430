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


def dedup_sorted(
    corpus: DataFrame, sort_partitions: int | None = None, id_offset: int = 0
):
    """Fused dedup + the two-phase id-mint PREP in ONE content shuffle:
    returns ``(s1, offsets_broadcast, total_rows)`` where ``s1`` is the
    persisted, range-sorted, deduplicated corpus (plus ``_pid`` and a
    ``content_sha256`` column computed while content is already in the
    Python worker) and ``offsets`` maps _pid -> doc_id base. Downstream
    kernels (tokenize+encode, docs projection) zip doc_ids themselves —
    fusing the zip avoids a dedicated mapInPandas pass that would move
    the full content column through Arrow one extra round trip.

    A separate ``groupBy(key)`` dedup would shuffle the full ``content``
    column once for the dedup and again for the id sort — at 10^12-file
    scale that doubles the dominant network cost. Instead: range-partition
    by the natural key (equal keys land in one partition), sort within
    partitions by (key, lang, content), drop non-first duplicate keys
    streamingly (equal-key runs are adjacent; ties broken by the sort =
    lexicographic min, same semantics as the groupBy-min path).

    ``sort_partitions`` should be DATA-size-derived (build passes
    bytes/sort_partition_bytes), never core-count-derived: the partition
    count determines runs-per-term in the merge, so tying it to cluster
    size makes a bigger cluster do more merge work (the round-1 N->4N
    scaling inversion).
    """
    import hashlib

    spark = corpus.sparkSession
    n_part = sort_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    s = (
        corpus.repartitionByRange(n_part, *KEY)
        .sortWithinPartitions(*KEY, "lang", "content")
        .withColumn("_pid", F.spark_partition_id())
    )
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(s.schema.fields) + [StructField("content_sha256", StringType())]
    )

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    names = [f.name for f in s.schema.fields]
    ki = [names.index(k) for k in KEY]
    ci = names.index("content")

    def dedup(batches):
        # Arrow end-to-end: rows arrive sorted by KEY; equal-key runs are
        # adjacent, so dedup is a vectorized neighbor comparison, and
        # sha256 reads the utf-8 bytes straight out of the Arrow string
        # buffer — the content column never becomes Python objects.
        prev_key = None
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            keep = np.ones(n, dtype=bool)
            if n > 1:
                dup = None
                for i in ki:
                    col = rb.column(i)
                    eq = pc.equal(col.slice(1), col.slice(0, n - 1))
                    dup = eq if dup is None else pc.and_(dup, eq)
                keep[1:] = ~dup.to_numpy(zero_copy_only=False)
            first = tuple(rb.column(i)[0].as_py() for i in ki)
            if prev_key is not None and first == prev_key:
                keep[0] = False
            prev_key = tuple(rb.column(i)[n - 1].as_py() for i in ki)
            if not keep.any():
                continue
            out = rb.filter(pa.array(keep)) if not keep.all() else rb
            content = out.column(ci)
            odt = np.int64 if pa.types.is_large_string(content.type) else np.int32
            offs = np.frombuffer(content.buffers()[1], dtype=odt)
            offs = offs[content.offset : content.offset + out.num_rows + 1]
            mv = memoryview(content.buffers()[2])
            shas = [
                hashlib.sha256(mv[offs[i] : offs[i + 1]]).hexdigest()
                for i in range(out.num_rows)
            ]
            yield out.append_column(
                pa.field("content_sha256", pa.string()), pa.array(shas, type=pa.string())
            )

    from pyspark.storagelevel import StorageLevel

    s1 = s.mapInArrow(dedup, schema=out_schema).persist(StorageLevel.MEMORY_AND_DISK)
    counts = {
        r["_pid"]: r["cnt"]
        for r in s1.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, id_offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)
    return s1, boff, acc - id_offset


def dedup_and_assign_ids(
    corpus: DataFrame, sort_partitions: int | None = None, id_offset: int = 0
) -> DataFrame:
    """Back-compat wrapper over :func:`dedup_sorted`: one more Arrow pass
    zips the dense 1-based doc_id (exactly like assign_doc_ids). The
    staged build uses dedup_sorted + fused kernels instead."""
    s1, boff, total = dedup_sorted(corpus, sort_partitions, id_offset)
    spark = corpus.sparkSession

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

    out = s1.mapInPandas(zip_ids, schema=schema).drop("_pid", "content_sha256")
    out._yase_persisted_source = s1
    out._yase_total_rows = total  # deduped row count, free here
    return out
