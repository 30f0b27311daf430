"""Point-in-time readers (catalog.open_pit / PinnedCatalog /
IndexReader(pit=)): a PIT opened before concurrent writes serves
bitwise the pre-write index — appends, deletes, and sibling tables
created after the pin are invisible — while live readers see them;
pinned catalogs refuse writes and reads past the pin."""

import pytest

from yase_spark.catalog import Catalog, PinnedCatalog, open_pit
from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder, build_index
from yase_spark.query import IndexReader

SCHEMA = "repo string, path string, commit string, lang string, content string"
CFG = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)


def _corpus(spark, lo, hi):
    return spark.createDataFrame(
        [("r", f"{i:04d}", "c", "py",
          f"alpha{i % 5} beta json getPage gamma{i % 3}")
         for i in range(lo, hi)],
        schema=SCHEMA,
    )


@pytest.fixture(scope="module")
def pit_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pit") / "ix")
    build_index(spark, _corpus(spark, 0, 80), root, CFG)
    pit = open_pit(root)
    pre = IndexReader(spark, root, CFG, shared_meta=False)
    pre_topk = pre.topk("alpha1 beta json", 10)
    pre_n = pre.n_docs
    IndexBuilder(spark, root, CFG).append(_corpus(spark, 80, 140))
    return root, pit, pre_topk, pre_n


def test_pit_reader_is_bitwise_preappend(spark, pit_index):
    root, pit, pre_topk, pre_n = pit_index
    live = IndexReader(spark, root, CFG)
    pinned = IndexReader(spark, root, CFG, pit=pit)
    assert live.n_docs == 140 and pinned.n_docs == pre_n == 80
    # scores AND ids bitwise-equal to the reader that ran pre-append
    assert pinned.topk("alpha1 beta json", 10) == pre_topk
    # the live ranking differs (df/avgdl moved) — the pin is doing work
    assert live.topk("alpha1 beta json", 10) != pre_topk


def test_pit_df_excludes_appended_docs(spark, pit_index):
    root, pit, _t, _n = pit_index
    pinned = IndexReader(spark, root, CFG, pit=pit)
    live = IndexReader(spark, root, CFG)
    # 'beta' is in every doc: df equals the pinned/live doc counts
    assert pinned.term_dfs(["beta"])["beta"] == 80
    assert live.term_dfs(["beta"])["beta"] == 140


def test_pit_invisible_to_later_deletes(spark, pit_index):
    root, pit, _t, _n = pit_index
    b = IndexBuilder(spark, root, CFG)
    b.delete(predicate="path = '0000'")
    live = IndexReader(spark, root, CFG)
    pinned = IndexReader(spark, root, CFG, pit=pit)
    live_ids = {d for _r, d, _s in live.topk("alpha0 json", 200)}
    pin_ids = {d for _r, d, _s in pinned.topk("alpha0 json", 200)}
    doc0 = {
        r["doc_id"]
        for r in pinned.cat.read(spark, "docs")
        .filter("path = '0000'").select("doc_id").collect()
    }
    assert doc0 and doc0 <= pin_ids        # PIT still serves it
    assert not (doc0 & live_ids)           # live readers don't


def test_pinned_catalog_guards(spark, pit_index):
    root, pit, _t, _n = pit_index
    pc = PinnedCatalog(root, pit)
    # unpinned table (created after the PIT) reads as nonexistent
    assert pc.current_version("no_such_table") == 0
    assert not pc.exists("no_such_table")
    # reads past the pin refuse; reads below it are fine (immutable)
    live_v = Catalog(root).current_version("segments")
    assert live_v > pit["segments"]
    with pytest.raises(ValueError, match="past this PIT"):
        pc.read(spark, "segments", version=live_v)
    assert pc.read(spark, "segments", version=pit["segments"]).count() > 0
    # writes refuse
    with pytest.raises(ValueError, match="pinned"):
        pc.drop("segments")
    with pytest.raises(ValueError, match="pinned"):
        pc.set_properties({})


def test_pit_search_after_paging_is_stable(spark, pit_index):
    """The ES PIT use case: deep paging stays consistent while the
    index keeps changing. Page 1 + page 2 through the SAME pit equal
    the pre-append top-20 exactly."""
    root, pit, _t, _n = pit_index
    pinned = IndexReader(spark, root, CFG, pit=pit)
    q = "alpha2 beta getPage"
    full = pinned.topk_after(q, 20)
    p1 = pinned.topk_after(q, 10)
    cursor = (p1[-1][2], p1[-1][1])
    p2 = pinned.topk_after(q, 10, after=cursor)
    got = [(d, s) for _r, d, s in p1] + [(d, s) for _r, d, s in p2]
    assert got == [(d, s) for _r, d, s in full]
