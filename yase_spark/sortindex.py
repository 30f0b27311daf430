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
  recorded in the sibling state (table-relative paths, so the index
  stays relocatable). Cost ∝ docs-dimension bytes (one range shuffle of
  the narrow dimension — never content), the same cost class as a
  Lucene segment sort on merge.

- **Generations** (the Lucene per-segment model): an APPEND extends the
  sibling incrementally — delta doc_ids are strictly above the covered
  high-water mark, so the new docs sort into their own generation of
  range files (cost ∝ delta, one catalog append commit) and the scan
  k-way merges generations exactly like Lucene collects per-segment
  and merges. A COMPACTION renumbers doc ids, which is detected (the
  covered-prefix row count changes) and triggers a full rebuild — the
  same trade Lucene makes re-sorting on merge.

- **Query** (``sorted_scan_topk``): per generation, read files in sort
  order in geometrically growing batches, keep the global best k, STOP
  only when the k-th collected value strictly beats EVERY generation's
  next unread boundary. The strictness handles the one subtle case: a
  run of equal field values split across a file (or generation)
  boundary, where the doc_id tie-break lives in data not yet read — on
  equality the scan keeps reading. Exactness therefore never depends
  on luck. Tombstones are anti-joined per batch; a predicate (ES:
  sorted search with a filter) and a match-id set (sorted search over
  a query's match set) push into each batch's scan.

At 100 TB this is the difference between "newest 10 documents" reading
one file vs the whole dimension: files_read is the gate, and the scan
degrades gracefully — a selective predicate just reads a longer prefix,
with correctness unconditional.

Staleness contract: the state records the docs-table version; after a
docs rewrite the sibling is stale until ``build_sort_index`` runs again
(incremental for appends, full for compactions). Tombstones do NOT
stale it (they are masked at read time). ``fresh_state`` is what the
``topk_sort_field`` auto-dispatch checks — a stale sibling silently
falls back to the classic lane, never serves wrong order.
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


def _file_ranges(spark, cat, name, field) -> list[dict]:
    """Per-file (path, lo, hi, rows) boundaries of the NEWEST committed
    data dir only (the generation just written — cost ∝ that commit,
    never the whole sibling), column-pruned read-back, table-relative
    paths."""
    troot = os.path.join(cat.root, name)
    e = cat._manifest(name)["data_dirs"][-1]
    rel_dir = e if isinstance(e, str) else e["path"]
    df = spark.read.parquet(os.path.join(troot, rel_dir))
    stats = (
        df.select(field, F.input_file_name().alias("f"))
        .groupBy("f")
        .agg(
            F.min(field).alias("lo"),
            F.max(field).alias("hi"),
            F.count("*").alias("rows"),
        )
        .collect()
    )
    return sorted(
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


def _sync_state_with_commits(spark, cat, name: str, field: str, st):
    """Crash-window repair (the positions-builder convention): a sibling
    DATA commit whose props update never landed must be ADOPTED from the
    committed manifest, never written twice. Three cases:

    - state references exactly the manifest's data dirs → consistent;
    - manifest has extra dirs beyond the state's (append committed,
      props lost) → each orphan dir becomes an adopted generation;
    - state references dirs the manifest no longer lists (a full
      rebuild's overwrite committed, props lost) → the state is rebuilt
      from the manifest's dirs wholesale.

    Replayed micro-batches therefore no-op instead of duplicating a
    generation — the property streaming sibling extension needs."""
    if st is None or not cat.exists(name):
        return st
    man = cat._manifest(name)
    dirs = [e if isinstance(e, str) else e["path"] for e in man["data_dirs"]]
    recorded = {
        os.path.dirname(r["path"])
        for g in st["generations"]
        for r in g["ranges"]
    }
    if recorded == set(dirs):
        return st
    tag_v = int(man.get("tag", {}).get("docs_version", st["docs_version"]))

    def _gen_from_dir(rel_dir: str) -> dict:
        troot = os.path.join(cat.root, name)
        df = spark.read.parquet(os.path.join(troot, rel_dir))
        agg = df.agg(
            F.count("*").alias("n"), F.max("doc_id").alias("m")
        ).collect()[0]
        stats = (
            df.select(field, F.input_file_name().alias("f"))
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
        return {"ranges": ranges, "rows": int(agg["n"]), "max_doc": int(agg["m"])}

    if recorded - set(dirs):
        # an overwrite superseded the recorded dirs: rebuild the state
        # from what is actually committed
        st = {
            "docs_version": tag_v,
            "generations": [_gen_from_dir(d) for d in dirs],
        }
    else:
        orphans = [d for d in dirs if d not in recorded]
        st = {
            "docs_version": tag_v,
            "generations": st["generations"] + [_gen_from_dir(d) for d in orphans],
        }
    _save(cat, field, st)
    return st


def build_sort_index(
    spark: SparkSession,
    index_root: str,
    field: str,
    files: int | None = None,
) -> dict:
    """Materialize (or incrementally extend) the sorted docs sibling for
    ``field``. Idempotent per docs version; an append extends with a new
    sorted GENERATION (cost ∝ delta); a compaction/renumber triggers a
    full rebuild. A crashed prior attempt (data committed, state update
    lost) is adopted from the committed manifest, never written twice."""
    cat = Catalog(index_root)
    if not cat.exists("docs"):
        raise ValueError("build the main index first (docs table missing)")
    docs_v = cat.current_version("docs")
    name = _table_name(field)
    st = _sync_state_with_commits(spark, cat, name, field, _state(cat, field))
    if st is not None and int(st["docs_version"]) == docs_v:
        return {
            "noop": True,
            "files": sum(len(g["ranges"]) for g in st["generations"]),
            "generations": len(st["generations"]),
        }
    t0 = time.time()
    docs = cat.read(spark, "docs")
    if field not in docs.columns or field in ("content_sha256",):
        raise ValueError(f"{field!r} is not a sortable docs-dimension column")
    d = docs.filter(F.col(field).isNotNull())

    if st is not None and all(
        g.get("max_doc") is not None for g in st["generations"]
    ):
        covered_max = max(int(g["max_doc"]) for g in st["generations"])
        covered_rows = sum(g["rows"] for g in st["generations"])
        agg = d.agg(
            F.sum(F.when(F.col("doc_id") <= covered_max, 1).otherwise(0)).alias("old"),
            F.sum(F.when(F.col("doc_id") > covered_max, 1).otherwise(0)).alias("new"),
        ).collect()[0]
        if int(agg["old"] or 0) == covered_rows:
            # covered prefix intact -> append-only delta above the
            # high-water mark: sort it into its own generation
            n_new = int(agg["new"] or 0)
            if n_new == 0:
                st = {**st, "docs_version": docs_v}
                _save(cat, field, st)
                return {
                    "noop": True,
                    "files": sum(len(g["ranges"]) for g in st["generations"]),
                    "generations": len(st["generations"]),
                }
            gfiles = files or max(1, math.ceil(n_new / DEFAULT_ROWS_PER_FILE))
            delta = d.filter(F.col("doc_id") > covered_max)
            cat.write(
                name,
                delta.repartitionByRange(gfiles, F.asc(field), F.asc("doc_id"))
                .sortWithinPartitions(F.asc(field), F.asc("doc_id")),
                mode="append",
                tag={"sort_field": field, "docs_version": docs_v,
                     "gen_min_doc": covered_max + 1},
            )
            ranges = _file_ranges(spark, cat, name, field)
            gen = {
                "ranges": ranges,
                "rows": n_new,
                "max_doc": int(
                    delta.agg(F.max("doc_id").alias("m")).collect()[0]["m"]
                ),
            }
            st = {
                "docs_version": docs_v,
                "generations": st["generations"] + [gen],
            }
            _save(cat, field, st)
            return {
                "noop": False,
                "incremental": True,
                "files": sum(len(g["ranges"]) for g in st["generations"]),
                "generations": len(st["generations"]),
                "rows": n_new,
                "wall_s": time.time() - t0,
            }
        # covered prefix changed (compaction renumbered / rows removed):
        # fall through to the full rebuild

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
    ranges = _file_ranges(spark, cat, name, field)
    max_doc = int(d.agg(F.max("doc_id").alias("m")).collect()[0]["m"])
    _save(cat, field, {
        "docs_version": docs_v,
        "generations": [{"ranges": ranges, "rows": n, "max_doc": max_doc}],
    })
    return {
        "noop": False,
        "incremental": False,
        "files": len(ranges),
        "generations": 1,
        "rows": n,
        "wall_s": time.time() - t0,
    }


def _save(cat: Catalog, field: str, st: dict) -> None:
    props = cat.get_properties() or {}
    props.setdefault("sort_index_state", {})[field] = st
    cat.set_properties(props)


def _state(cat: Catalog, field: str) -> dict | None:
    st = ((cat.get_properties() or {}).get("sort_index_state") or {}).get(field)
    if st is not None and "generations" not in st:
        # pre-generation state shape (single flat ranges list)
        st = {
            "docs_version": st["docs_version"],
            "generations": [{
                "ranges": st["ranges"],
                "rows": sum(e["rows"] for e in st["ranges"]),
                "max_doc": None,
            }],
        }
    return st


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
    after: tuple | None = None,
    return_stats: bool = False,
):
    """Early-terminated exact top-k by ``field`` over the sorted
    sibling's generations (k-way merged prefix scans). Output
    (rank, doc_id, <field>) — identical to
    ``IndexReader.topk_sort_field`` — plus a stats dict
    (files_read/files_total/rows_in_read_files/generations) when
    asked.

    ``after=(field_value, doc_id)`` is the sort + ``search_after``
    cursor: rows strictly after the cursor in the (field, doc_id
    ASC-tiebreak) order. Cursor pages stay early-terminated — each
    generation's scan SEEDS at the first file that can contain a
    post-cursor row, skipping files wholly on the served side
    undecoded: descending order skips every file with ``lo > value``
    (all its rows sort before the cursor), ascending skips
    ``hi < value``. A file straddling the cursor value is read and
    row-filtered — the doc_id tie-break lives in data, not metadata,
    so value-equality can never be skipped on. Page depth therefore
    costs O(files overlapping the remaining suffix), not O(pages·k)
    re-scans, which is what makes deep paging over a 100-TB dimension
    viable."""
    cat = Catalog(index_root)
    st = _state(cat, field)
    if st is None:
        raise ValueError(f"no sort index for {field!r}; run build_sort_index")
    if int(st["docs_version"]) != cat.current_version("docs"):
        raise ValueError(
            f"sort index for {field!r} is stale (docs table changed since "
            "the build) — rebuild with build_sort_index"
        )
    troot = os.path.join(cat.root, _table_name(field))
    deletes = (
        cat.read(spark, "deletes").select("doc_id")
        if cat.exists("deletes")
        else None
    )
    ordcol = F.col(field).asc() if ascending else F.col(field).desc()

    def _cursor_skippable(e) -> bool:
        """Every row of this file sorts strictly BEFORE the cursor
        (already served on an earlier page), so the file needs no
        read. Equality with the cursor value is never skippable: the
        doc_id tie-break needs the rows."""
        if after is None:
            return False
        av = after[0]
        return e["hi"] < av if ascending else e["lo"] > av

    files_skipped = 0
    # per-generation cursor over its sort-ordered file list, seeded
    # past the files wholly before the search_after cursor
    gens = []
    for g in st["generations"]:
        ranges = g["ranges"] if ascending else list(reversed(g["ranges"]))
        i = 0
        while i < len(ranges) and _cursor_skippable(ranges[i]):
            i += 1
        files_skipped += i
        gens.append({"ranges": ranges, "i": i, "batch": 1})

    def boundary_beaten(kth) -> bool:
        """kth strictly beats every generation's next unread boundary."""
        for g in gens:
            if g["i"] >= len(g["ranges"]):
                continue
            nxt = g["ranges"][g["i"]]
            b = nxt["lo"] if ascending else nxt["hi"]
            if not ((kth < b) if ascending else (kth > b)):
                return False
        return True

    acc: list = []  # (field_value, doc_id), global best-k, sorted
    files_read = rows_read = 0
    ftype = None
    while any(g["i"] < len(g["ranges"]) for g in gens):
        # one round: advance every non-exhausted generation by its batch
        take = []
        for g in gens:
            part = g["ranges"][g["i"] : g["i"] + g["batch"]]
            g["i"] += len(part)
            g["batch"] *= 2
            take.extend(part)
        files_read += len(take)
        rows_read += sum(e["rows"] for e in take)
        df = spark.read.parquet(*(os.path.join(troot, e["path"]) for e in take))
        if ftype is None:
            ftype = df.schema[field].dataType  # footer already read
        if after is not None:
            av, aid = after
            strict = (
                F.col(field) > F.lit(av)
                if ascending
                else F.col(field) < F.lit(av)
            )
            df = df.filter(
                strict
                | ((F.col(field) == F.lit(av)) & (F.col("doc_id") > aid))
            )
        if predicate:
            df = df.filter(predicate)
        if match_ids is not None:
            df = df.join(match_ids.select("doc_id"), "doc_id", "semi")
        if deletes is not None:
            df = df.join(F.broadcast(deletes), "doc_id", "left_anti")
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
        if len(acc) == k and boundary_beaten(acc[-1][0]):
            break
    from pyspark.sql.types import LongType, StructField, StructType

    if ftype is None:
        # cursor past all data: no file was read; type from one footer
        first = st["generations"][0]["ranges"][0]["path"]
        ftype = (
            spark.read.parquet(os.path.join(troot, first))
            .schema[field].dataType
        )
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
    all_ranges = [e for g in st["generations"] for e in g["ranges"]]
    stats = {
        "files_total": len(all_ranges),
        "files_read": files_read,
        "files_cursor_skipped": files_skipped,
        "rows_in_read_files": rows_read,
        "rows_total": sum(e["rows"] for e in all_ranges),
        "generations": len(gens),
    }
    return (out, stats) if return_stats else out
