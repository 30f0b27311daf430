"""Index sorting + early-terminated sort-by-field scan (sortindex.py).

Gates: the early-terminated lane is BITWISE the classic full-dimension
lane (match-all, string field, predicate, query-tree, and tombstone
cases); early termination actually happens (files_read < files_total on
a skewed field) yet NEVER fires unsoundly (an all-ties field forces the
strict boundary rule to read every file and still agree); staleness is
loud after a docs rewrite and the auto-dispatch falls back to the
classic lane instead of serving stale order.
"""

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.query import IndexReader, Term
from yase_spark.sortindex import (
    build_sort_index,
    fresh_state,
    sorted_scan_topk,
)
from yase_spark.synth import corpus_df


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("sortidx"))
    cfg = IndexConfig(build_groups=2, shuffle_partitions=16, hot_term_df=400)
    build_index(spark, corpus_df(spark, 600, partitions=8), root, cfg)
    s = build_sort_index(spark, root, "doc_len", files=24)
    assert not s["noop"] and s["files"] >= 2
    build_sort_index(spark, root, "path", files=24)
    return root, cfg


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_rebuild_is_noop(spark, sidx):
    root, _ = sidx
    assert build_sort_index(spark, root, "doc_len")["noop"]
    assert fresh_state(Catalog(root), "doc_len") is not None


@pytest.mark.parametrize("ascending", [False, True])
def test_match_all_browse_bitwise(spark, sidx, ascending):
    root, cfg = sidx
    rd = IndexReader(spark, root, cfg)
    et = rd.topk_sort_field(None, "doc_len", k=12, ascending=ascending)
    classic = rd.topk_sort_field(
        None, "doc_len", k=12, ascending=ascending, early_terminate=False
    )
    assert _rows(et) == _rows(classic) and len(_rows(et)) == 12


def test_string_field_and_stats(spark, sidx):
    root, cfg = sidx
    rd = IndexReader(spark, root, cfg)
    et = rd.topk_sort_field(None, "path", k=5, ascending=True)
    classic = rd.topk_sort_field(
        None, "path", k=5, ascending=True, early_terminate=False
    )
    assert _rows(et) == _rows(classic)
    _, stats = sorted_scan_topk(
        spark, root, "path", k=5, ascending=True, return_stats=True
    )
    # 24 requested files over 600 docs: top-5 by a unique string key
    # must come from a short prefix
    assert stats["files_read"] < stats["files_total"]
    assert stats["files_read"] <= 3


def test_predicate_pushes_into_scan(spark, sidx):
    root, cfg = sidx
    rd = IndexReader(spark, root, cfg)
    lang = Catalog(root).read(spark, "docs").select("lang").first()["lang"]
    pred = f"lang = '{lang}'"
    et, stats = sorted_scan_topk(
        spark, root, "doc_len", k=8, predicate=pred, return_stats=True
    )
    classic = (
        Catalog(root)
        .read(spark, "docs")
        .filter(pred)
        .select("doc_id", "doc_len")
        .orderBy(F.desc("doc_len"), F.asc("doc_id"))
        .limit(8)
        .collect()
    )
    assert [(r["doc_id"], r["doc_len"]) for r in et.collect()] == [
        (r["doc_id"], r["doc_len"]) for r in classic
    ]


def test_query_tree_match_set(spark, sidx):
    root, cfg = sidx
    rd = IndexReader(spark, root, cfg)
    et = rd.topk_sort_field(Term("json"), "doc_len", k=10)
    classic = rd.topk_sort_field(
        Term("json"), "doc_len", k=10, early_terminate=False
    )
    assert _rows(et) == _rows(classic) and len(_rows(et)) == 10


def test_all_ties_never_stops_early_and_stays_exact(spark, tmp_path):
    # constant field: the strict boundary rule can never prove the
    # prefix, so the scan must read EVERYTHING and still match the
    # classic answer (doc_id tie-break lives in the asc-first files)
    root = str(tmp_path / "ties")
    cat = Catalog(root)
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id").isin(7, 93, 150), 9).otherwise(7).alias("doc_len"),
    )
    cat.write("docs", docs)
    build_sort_index(spark, root, "doc_len", files=10)
    out, stats = sorted_scan_topk(
        spark, root, "doc_len", k=6, return_stats=True
    )
    got = [(r["doc_id"], r["doc_len"]) for r in out.collect()]
    # three 9s (doc_id asc), then the smallest-id 7s
    assert got == [(7, 9), (93, 9), (150, 9), (0, 7), (1, 7), (2, 7)]
    assert stats["files_read"] == stats["files_total"]


def test_early_termination_fires_on_skewed_field(spark, tmp_path):
    root = str(tmp_path / "skew")
    cat = Catalog(root)
    cat.write(
        "docs",
        spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.col("id").alias("doc_len")
        ),
    )
    build_sort_index(spark, root, "doc_len", files=20)
    out, stats = sorted_scan_topk(spark, root, "doc_len", k=10, return_stats=True)
    assert [r["doc_id"] for r in out.collect()] == list(range(1999, 1989, -1))
    assert stats["files_read"] == 1 and stats["files_total"] >= 15


def test_tombstones_masked_in_both_lanes(spark, tmp_path):
    from yase_spark.index import IndexBuilder

    root = str(tmp_path / "del")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=400)
    build_index(spark, corpus_df(spark, 300, partitions=4), root, cfg)
    build_sort_index(spark, root, "doc_len", files=8)
    rd = IndexReader(spark, root, cfg)
    top = rd.topk_sort_field(None, "doc_len", k=3).collect()
    victim = top[0]["doc_id"]
    IndexBuilder(spark, root, cfg).delete(doc_ids=[victim])
    rd2 = IndexReader(spark, root, cfg, shared_meta=False)
    et = rd2.topk_sort_field(None, "doc_len", k=3)
    classic = rd2.topk_sort_field(None, "doc_len", k=3, early_terminate=False)
    ids = [r["doc_id"] for r in et.collect()]
    assert victim not in ids
    assert _rows(et) == _rows(classic)


def test_staleness_is_loud_and_auto_falls_back(spark, sidx):
    root, cfg = sidx
    cat = Catalog(root)
    docs = cat.read(spark, "docs")
    v = cat.current_version("docs")
    # bump the docs version without changing rows (empty append)
    cat.write("docs", docs.limit(0), mode="append")
    try:
        assert fresh_state(cat, "doc_len") is None
        with pytest.raises(ValueError, match="stale"):
            sorted_scan_topk(spark, root, "doc_len", k=5)
        rd = IndexReader(spark, root, cfg, shared_meta=False)
        # auto dispatch silently uses the classic lane
        out = rd.topk_sort_field(None, "doc_len", k=5)
        classic = rd.topk_sort_field(
            None, "doc_len", k=5, early_terminate=False
        )
        assert _rows(out) == _rows(classic)
        # re-running the build refreshes: the empty append has no new
        # docs above the high-water mark, so the covered generations are
        # re-stamped to the new docs version WITHOUT any rewrite (noop)
        assert build_sort_index(spark, root, "doc_len", files=24)["noop"]
        assert fresh_state(cat, "doc_len") is not None
    finally:
        if cat.current_version("docs") != v:
            cat.rollback("docs", v)
            build_sort_index(spark, root, "doc_len", files=24)


@pytest.mark.parametrize("ascending", [False, True])
def test_cursor_pages_ride_et_lane_and_skip_files(
    spark, tmp_path, ascending
):
    """sort + search_after through the early-terminated lane: pages
    tile the full ordering bitwise vs the classic lane, and page 2+
    SEEDS past the files wholly before the cursor (files_cursor_skipped
    > 0, files_read < files_total) instead of re-scanning the prefix."""
    root = str(tmp_path / "cursor")
    cat = Catalog(root)
    cat.write(
        "docs",
        spark.range(0, 2000).select(
            F.col("id").alias("doc_id"), F.col("id").alias("doc_len")
        ),
    )
    # ~20 docs/file: a k=10 page crosses a file boundary every 2 pages,
    # so the skip becomes observable from page 3 on
    build_sort_index(spark, root, "doc_len", files=100)
    classic_full = (
        cat.read(spark, "docs")
        .orderBy(
            F.asc("doc_len") if ascending else F.desc("doc_len"),
            F.asc("doc_id"),
        )
        .limit(55)
        .collect()
    )
    want = [(r["doc_id"], r["doc_len"]) for r in classic_full]
    got, cursor = [], None
    # k=11 (not 10): 20-row files mean a k that divides the file size
    # parks every cursor exactly ON a file boundary (lo == value), which
    # is legitimately unskippable — equality needs the doc_id tie-break
    for page in range(5):
        out, stats = sorted_scan_topk(
            spark, root, "doc_len", k=11, ascending=ascending,
            after=cursor, return_stats=True,
        )
        rows = out.collect()
        got.extend((r["doc_id"], r["doc_len"]) for r in rows)
        cursor = (rows[-1]["doc_len"], rows[-1]["doc_id"])
        if page == 0:
            assert stats["files_cursor_skipped"] == 0
        elif page >= 2:
            # the served prefix is now at least one whole file: deep
            # pages seed past it undecoded
            assert stats["files_cursor_skipped"] > 0
        assert stats["files_read"] < stats["files_total"]
    assert got == want
    # cursor strictly past ALL data: empty page, nothing read (a cursor
    # ON the extreme value still reads one file — the doc_id tie-break
    # is in data, not metadata)
    end = (-1, 0) if not ascending else (2000, 0)
    out, stats = sorted_scan_topk(
        spark, root, "doc_len", k=10, ascending=ascending,
        after=end, return_stats=True,
    )
    assert out.count() == 0 and stats["files_read"] == 0


def test_cursor_equal_value_run_not_skipped(spark, tmp_path):
    """A run of equal field values spanning files: the cursor sits
    inside the run, so value metadata alone cannot prove a file served
    — straddling files must be read and doc_id-filtered."""
    root = str(tmp_path / "tiecur")
    cat = Catalog(root)
    cat.write(
        "docs",
        spark.range(0, 300).select(
            F.col("id").alias("doc_id"), F.lit(7).alias("doc_len")
        ),
    )
    build_sort_index(spark, root, "doc_len", files=10)
    got, cursor = [], None
    for _ in range(4):
        out = sorted_scan_topk(
            spark, root, "doc_len", k=25, after=cursor
        )
        rows = out.collect()
        got.extend((r["doc_id"], r["doc_len"]) for r in rows)
        cursor = (rows[-1]["doc_len"], rows[-1]["doc_id"])
    # all-ties order is doc_id ASC; 4 pages of 25 = the first 100 ids
    assert got == [(i, 7) for i in range(100)]


def test_reader_cursor_dispatch_uses_et_lane(spark, sidx):
    """IndexReader.topk_sort_field(after=) rides the ET lane when the
    sibling is fresh and stays bitwise the classic lane — with a query
    match set, both pages."""
    root, cfg = sidx
    rd = IndexReader(spark, root, cfg)
    p1 = rd.topk_sort_field(Term("json"), "doc_len", k=10).collect()
    cur = (p1[-1]["doc_len"], p1[-1]["doc_id"])
    et = rd.topk_sort_field(Term("json"), "doc_len", k=10, after=cur)
    classic = rd.topk_sort_field(
        Term("json"), "doc_len", k=10, after=cur, early_terminate=False
    )
    assert _rows(et) == _rows(classic) and len(_rows(et)) == 10


def test_validation(spark, sidx):
    root, _ = sidx
    with pytest.raises(ValueError, match="not a sortable"):
        build_sort_index(spark, root, "content_sha256")
    with pytest.raises(ValueError, match="no sort index"):
        sorted_scan_topk(spark, root, "commit", k=5)


# ------------------------------------------------------------- generations

@pytest.fixture(scope="module")
def gen_idx(spark, tmp_path_factory):
    """Index built on 300 docs, 200 more appended, sort sibling built
    BEFORE the append and extended incrementally after it."""
    from yase_spark.index import IndexBuilder

    root = str(tmp_path_factory.mktemp("genidx"))
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=400)
    allc = corpus_df(spark, 500, partitions=4).persist()
    part_a = allc.limit(300).persist()
    part_b = allc.subtract(part_a).persist()
    build_index(spark, part_a, root, cfg)
    s0 = build_sort_index(spark, root, "doc_len", files=6)
    assert s0["generations"] == 1 and not s0["noop"]
    IndexBuilder(spark, root, cfg).append(part_b)
    s1 = build_sort_index(spark, root, "doc_len", files=4)
    assert s1["incremental"] and s1["generations"] == 2
    assert s1["rows"] == 200  # cost ∝ delta
    return root, cfg


def test_incremental_append_extends_not_rebuilds(spark, gen_idx):
    root, cfg = gen_idx
    assert build_sort_index(spark, root, "doc_len")["noop"]
    st = fresh_state(Catalog(root), "doc_len")
    assert st is not None and len(st["generations"]) == 2
    # generations partition the doc-id space at the high-water mark
    g0, g1 = st["generations"]
    assert g0["max_doc"] == 300 and g1["max_doc"] == 500
    assert g0["rows"] == 300 and g1["rows"] == 200


@pytest.mark.parametrize("ascending", [False, True])
def test_generational_scan_bitwise(spark, gen_idx, ascending):
    root, cfg = gen_idx
    rd = IndexReader(spark, root, cfg)
    et, stats = sorted_scan_topk(
        spark, root, "doc_len", k=15, ascending=ascending, return_stats=True
    )
    classic = rd.topk_sort_field(
        None, "doc_len", k=15, ascending=ascending, early_terminate=False
    )
    assert _rows(et) == _rows(classic) and len(_rows(et)) == 15
    assert stats["generations"] == 2
    # the merged prefix scan still prunes: both generations contribute
    # at most a prefix
    assert stats["files_read"] < stats["files_total"]


def test_generational_query_tree(spark, gen_idx):
    root, cfg = gen_idx
    rd = IndexReader(spark, root, cfg)
    et = rd.topk_sort_field(Term("json"), "doc_len", k=10)
    classic = rd.topk_sort_field(
        Term("json"), "doc_len", k=10, early_terminate=False
    )
    assert _rows(et) == _rows(classic)


def test_compaction_forces_full_rebuild(spark, tmp_path):
    from yase_spark.index import IndexBuilder

    root = str(tmp_path / "cmp")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=400)
    build_index(spark, corpus_df(spark, 300, partitions=4), root, cfg)
    build_sort_index(spark, root, "doc_len", files=6)
    b = IndexBuilder(spark, root, cfg)
    victims = [r["doc_id"] for r in Catalog(root).read(spark, "docs")
               .orderBy("doc_id").limit(5).collect()]
    b.delete(doc_ids=victims)
    b.apply_deletes()  # renumbers doc ids -> covered prefix changes
    s = build_sort_index(spark, root, "doc_len", files=6)
    assert not s["noop"] and s["incremental"] is False
    assert s["generations"] == 1 and s["rows"] == 295
    rd = IndexReader(spark, root, cfg, shared_meta=False)
    et = rd.topk_sort_field(None, "doc_len", k=8)
    classic = rd.topk_sort_field(None, "doc_len", k=8, early_terminate=False)
    assert _rows(et) == _rows(classic)


# ------------------------------------------------------- crash-window repair

def _snapshot_props(root):
    import copy
    return copy.deepcopy(Catalog(root).get_properties() or {})


def test_append_crash_window_is_adopted_not_duplicated(spark, tmp_path):
    """A committed sibling generation whose props update never landed
    (crash between the catalog append and _save) must be ADOPTED from
    the manifest on the next build — not written twice."""
    from yase_spark.index import IndexBuilder

    root = str(tmp_path / "crash")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=400)
    allc = corpus_df(spark, 400, partitions=4).persist()
    part_a = allc.limit(250).persist()
    build_index(spark, part_a, root, cfg)
    build_sort_index(spark, root, "doc_len", files=5)
    pre_append_props = _snapshot_props(root)
    IndexBuilder(spark, root, cfg).append(allc.subtract(part_a))
    s = build_sort_index(spark, root, "doc_len", files=3)
    assert s["incremental"]
    good = _snapshot_props(root)
    # simulate the crash: the generation is committed in the sibling
    # table, but the props still show the pre-append state
    cat = Catalog(root)
    stale = dict(good)
    stale["sort_index_state"] = pre_append_props["sort_index_state"]
    cat.set_properties(stale)
    s2 = build_sort_index(spark, root, "doc_len", files=3)
    st = fresh_state(cat, "doc_len")
    assert st is not None and len(st["generations"]) == 2
    assert s2["noop"]  # adopted, nothing rewritten
    assert st == good["sort_index_state"]["doc_len"]
    rd = IndexReader(spark, root, cfg, shared_meta=False)
    assert _rows(rd.topk_sort_field(None, "doc_len", k=9)) == _rows(
        rd.topk_sort_field(None, "doc_len", k=9, early_terminate=False)
    )
    allc.unpersist(); part_a.unpersist()


def test_rebuild_crash_window_is_adopted(spark, tmp_path):
    """Same for a FULL rebuild's overwrite commit: a props snapshot
    referencing the superseded dirs is replaced wholesale from the
    manifest instead of appending a duplicate generation."""
    root = str(tmp_path / "crash2")
    cat = Catalog(root)
    cat.write("docs", spark.range(0, 300).select(
        F.col("id").alias("doc_id"), (F.col("id") % 37).alias("doc_len")))
    build_sort_index(spark, root, "doc_len", files=4)
    pre = _snapshot_props(root)
    # a compaction-like rewrite: same rows, new docs version with one
    # row dropped -> full rebuild path
    docs = cat.read(spark, "docs").filter("doc_id <> 0")
    cat.write("docs", docs)
    build_sort_index(spark, root, "doc_len", files=4)
    good = _snapshot_props(root)
    stale = dict(good)
    stale["sort_index_state"] = pre["sort_index_state"]
    cat.set_properties(stale)
    s = build_sort_index(spark, root, "doc_len", files=4)
    st = fresh_state(cat, "doc_len")
    assert s["noop"] and st is not None and len(st["generations"]) == 1
    assert st == good["sort_index_state"]["doc_len"]
    out, stats = sorted_scan_topk(spark, root, "doc_len", k=5, return_stats=True)
    assert stats["rows_total"] == 299
    assert [r["doc_id"] for r in out.collect()][:1] == [36]  # 36 is max(id%37), min id
