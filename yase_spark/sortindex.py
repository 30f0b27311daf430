"""Index sorting (Lucene ``index.sort`` / ES index sorting) and the
early-terminated sort-by-field scan it enables.

``topk_sort_field`` (query.py) is exact but reads the WHOLE docs
dimension to rank matches by a field. Lucene's answer is to store
segments pre-sorted by the field so a sort query collects the first k
docs per segment and stops. The Spark-native analogue built here:

- **Build** (``build_sort_index``): rewrite the docs dimension as a
  sibling table range-partitioned AND sorted by ``(field, doc_id)`` —
  ``repartitionByRange`` gives totally-ordered, NON-OVERLAPPING files
  (equal keys land in one partition), which is the property early
  termination needs. Per-file ``(min, max, rows)`` boundaries are
  recorded in the commit tag (table-relative paths, so the index stays
  relocatable). Cost ∝ docs-dimension bytes (one range shuffle of the
  narrow dimension — never content), the same cost class as a Lucene
  segment sort on merge.

- **Query** (``sorted_scan_topk``): read files in sort order in
  geometrically growing batches, keep the best k seen, STOP when the
  k-th collected value strictly beats the next unread file's boundary.
  The strictness handles the one subtle case: a run of equal field
  values split across a file boundary, where the doc_id tie-break
  lives in a file not yet read — on equality the scan keeps reading.
  Exactness therefore never depends on luck: either the boundary proof
  holds or more files are read. Tombstones are anti-joined per batch;
  a predicate (ES: sorted search with a filter) and a match-id set
  (sorted search over a query's match set) push into each batch's scan.

At 100 TB this is the difference between "newest 10 documents" reading
one file vs the whole dimension: files_read is the gate, and the scan
degrades gracefully — a selective predicate just reads a longer prefix,
with correctness unconditional.

Staleness contract (same as the positions/trigram siblings): the tag
records the docs-table version it was built from; any docs rewrite
(append, compaction) makes the sibling loudly stale until rebuilt —
Lucene likewise re-sorts on merge. Tombstones do NOT stale it (they
are masked at read time).
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog

SORT_TABLE_FMT = "docs_sorted_{field}"
DEFAULT_ROWS_PER_FILE = 65536


def _table_name(field: str) -> str:
    return SORT_TABLE_FMT.format(field=field)


def build_sort_index(
    spark: SparkSession,
    index_root: str,
    field: str,
    files: int | None = None,
) -> dict:
    """Materialize the sorted docs sibling for ``field``. Idempotent:
    a fresh sibling for the current docs version is a no-op."""
    cat = Catalog(index_root)
    if not cat.exists("docs"):
        raise ValueError("build the main index first (docs table missing)")
    docs_v = cat.current_version("docs")
    name = _table_name(field)
    st = _state(cat, field)
    if st is not None and int(st["docs_version"]) == docs_v:
        return {"noop": True, "files": len(st["ranges"])}
    t0 = time.time()
    docs = cat.read(spark, "docs")
    if field not in docs.columns or field in ("content_sha256",):
        raise ValueError(f"{field!r} is not a sortable docs-dimension column")
    d = docs.filter(F.col(field).isNotNull())
    n = d.count()
    if n == 0:
        raise ValueError("docs table is empty")
    files = files or max(4, math.ceil(n / DEFAULT_ROWS_PER_FILE))
    cat.write(
        name,
        d.repartitionByRange(files, F.asc(field), F.asc("doc_id"))
        .sortWithinPartitions(F.asc(field), F.asc("doc_id")),
        tag={"sort_field": field, "docs_version": docs_v},
    )
    # per-file boundaries, read back column-pruned from the committed
    # files (one tiny job over (field, doc_id) only); paths stored
    # table-relative so a moved index root keeps working
    troot = os.path.join(cat.root, name)
    stats = (
        cat.read(spark, name)
        .select(field, F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(
            F.min(field).alias("lo"),
            F.max(field).alias("hi"),
            F.count("*").alias("rows"),
        )
        .collect()
    )
    ranges = sorted(
        (
            {
                "path": os.path.relpath(r["f"].removeprefix("file:"), troot),
                "lo": r["lo"],
                "hi": r["hi"],
                "rows": int(r["rows"]),
            }
            for r in stats
        ),
        key=lambda e: (e["lo"], e["hi"]),
    )
    props = cat.get_properties() or {}
    props.setdefault("sort_index_state", {})[field] = {
        "docs_version": docs_v,
        "ranges": ranges,
    }
    cat.set_properties(props)
    return {
        "noop": False,
        "files": len(ranges),
        "rows": n,
        "wall_s": time.time() - t0,
    }


def _state(cat: Catalog, field: str) -> dict | None:
    props = cat.get_properties() or {}
    return (props.get("sort_index_state") or {}).get(field)


def fresh_state(cat: Catalog, field: str) -> dict | None:
    """The sort-index state iff it matches the CURRENT docs version."""
    st = _state(cat, field)
    if st is not None and int(st["docs_version"]) == cat.current_version("docs"):
        return st
    return None


def sorted_scan_topk(
    spark: SparkSession,
    index_root: str,
    field: str,
    k: int = 10,
    ascending: bool = False,
    predicate: str | None = None,
    match_ids: DataFrame | None = None,
    return_stats: bool = False,
):
    """Early-terminated exact top-k by ``field`` over the sorted
    sibling. Output (rank, doc_id, <field>) — identical to
    ``IndexReader.topk_sort_field`` — plus a stats dict
    (files_read/files_total/rows_in_read_files) when asked."""
    cat = Catalog(index_root)
    st = _state(cat, field)
    if st is None:
        raise ValueError(f"no sort index for {field!r}; run build_sort_index")
    if int(st["docs_version"]) != cat.current_version("docs"):
        raise ValueError(
            f"sort index for {field!r} is stale (docs table changed since "
            "the build) — rebuild with build_sort_index"
        )
    ranges = st["ranges"] if ascending else list(reversed(st["ranges"]))
    troot = os.path.join(cat.root, _table_name(field))
    deletes = (
        cat.read(spark, "deletes").select("doc_id")
        if cat.exists("deletes")
        else None
    )

    acc: list = []  # (field_value, doc_id) best-k so far, sorted
    i, batch = 0, 1
    files_read = rows_read = 0
    ftype = None
    while i < len(ranges):
        take = ranges[i : i + batch]
        i += len(take)
        batch *= 2
        files_read += len(take)
        rows_read += sum(e["rows"] for e in take)
        df = spark.read.parquet(*(os.path.join(troot, e["path"]) for e in take))
        if ftype is None:
            ftype = df.schema[field].dataType  # footer already read
        if predicate:
            df = df.filter(predicate)
        if match_ids is not None:
            df = df.join(match_ids.select("doc_id"), "doc_id", "semi")
        if deletes is not None:
            df = df.join(F.broadcast(deletes), "doc_id", "left_anti")
        ordcol = F.col(field).asc() if ascending else F.col(field).desc()
        rows = (
            df.select(field, "doc_id")
            .orderBy(ordcol, F.col("doc_id").asc())
            .limit(k)
            .collect()
        )
        acc.extend((r[field], r["doc_id"]) for r in rows)
        # stable two-pass sort: doc_id ASC tie-break under either order
        acc.sort(key=lambda t: t[1])
        acc.sort(key=lambda t: t[0], reverse=not ascending)
        acc = acc[:k]
        if len(acc) == k and i < len(ranges):
            nxt = ranges[i]
            boundary = nxt["lo"] if ascending else nxt["hi"]
            kth = acc[-1][0]
            # STRICT: on a boundary tie the doc_id tie-break may live in
            # the unread file — keep reading
            if (kth < boundary) if ascending else (kth > boundary):
                break
        elif len(acc) == k and i >= len(ranges):
            break
    from pyspark.sql.types import LongType, StructField, StructType

    out = spark.createDataFrame(
        [(r + 1, d, v) for r, (v, d) in enumerate(acc)],
        schema=StructType(
            [
                StructField("rank", LongType(), False),
                StructField("doc_id", LongType(), False),
                StructField(field, ftype, True),
            ]
        ),
    )
    stats = {
        "files_total": len(ranges),
        "files_read": files_read,
        "rows_in_read_files": rows_read,
        "rows_total": sum(e["rows"] for e in ranges),
    }
    return (out, stats) if return_stats else out
