"""Reindex (yase_spark/reindex.py — ES _reindex/_split/_shrink +
Lucene IndexUpgrader, content-free): rewriting block_size/term_buckets
is bitwise read-invariant; rewriting k1/b equals a fresh build at the
new params; sibling indexes (positions, trigrams) survive a bucket
change; delete tombstones and append noop-detection carry over; the
destination's physical layout actually changed."""

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.grep import GrepReader, build_trigrams
from yase_spark.index import IndexBuilder
from yase_spark.positions import build_positions
from yase_spark.query import IndexReader
from yase_spark.reindex import reindex

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _corpus(spark, n0, n1):
    rows = [
        ("r", f"{i:04d}", "c", "python",
         f"alpha{i % 37} beta{i % 11} gamma getPage delta{i % 5}"
         + (" needle mark" if i % 29 == 0 else ""))
        for i in range(n0, n1)
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


@pytest.fixture(scope="module")
def src_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("reidx") / "src")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=32,
                      ngrams=False, merge_cap=50, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(_corpus(spark, 0, 300))
    b.append(_corpus(spark, 300, 400))
    b.delete(predicate="path = '0007'")
    full = _corpus(spark, 0, 400)
    build_positions(spark, root, full, cfg)
    build_trigrams(spark, root, full, cfg)
    from yase_spark.suggest import build_bigram_table

    build_bigram_table(
        spark, root,
        full.selectExpr("monotonically_increasing_id() AS doc_id",
                        "content AS text"),
    )
    from yase_spark.expand import build_stems

    assert build_stems(spark, root) > 0
    return root, cfg, full


def test_layout_reindex_is_bitwise_read_invariant(spark, src_index, tmp_path):
    root, cfg, _ = src_index
    dst = str(tmp_path / "dst")
    st = reindex(spark, root, dst, block_size=64, term_buckets=8)
    assert st["changed"] == {"block_size": 64, "term_buckets": 8}
    assert st["segment_rows"] > 0 and st["postings"] > 0
    assert set(st["tables"]) >= {"docs", "stats", "deletes", "pos_segments",
                                 "tri_segments", "segments"}

    rs = IndexReader(spark, root, cfg)
    rd = IndexReader(spark, dst)           # adopts dst persisted config
    assert rd.cfg.block_size == 64 and rd.cfg.term_buckets == 8
    assert rd.cfg.k1 == cfg.k1 and rd.cfg.ngrams == cfg.ngrams
    for q in ("gamma alpha3", "beta7 getPage", "needle mark"):
        assert rd.topk(q, 10, use_wand=False) == rs.topk(q, 10, use_wand=False)
        assert rd.topk(q, 10, use_wand=True) == rs.topk(q, 10, use_wand=True)

    # the tombstoned doc stays dead on the destination
    dead = {r["doc_id"] for r in Catalog(root).read(spark, "deletes").collect()}
    assert dead and not dead & {d for _, d, _ in rd.topk("alpha7 gamma", 400)}

    # physical layout really changed: coarser blocks, fewer buckets
    segs = Catalog(dst).read(spark, "segments")
    agg = segs.select(
        F.countDistinct("bucket").alias("nb"),
        F.max(F.size("block_meta")).alias("max_blocks"),
        F.max(F.expr(
            "aggregate(block_meta, 0, (a, m) -> int(greatest(a, m.n_docs)))"
        )).alias("max_blk_docs"),
    ).collect()[0]
    assert agg["nb"] <= 8
    assert agg["max_blk_docs"] > 16          # blocks coarser than source
    assert agg["max_blk_docs"] <= 64
    src_rows = Catalog(root).read(spark, "segments").count()
    assert segs.count() == src_rows          # shard split preserved

    # payload bytes carried IDENTICALLY (join on term+shard)
    a = Catalog(root).read(spark, "segments").select(
        "term", "shard", F.sha2(F.col("payload"), 256).alias("h"))
    bdf = segs.select("term", "shard", F.sha2(F.col("payload"), 256).alias("h2"))
    assert a.join(bdf, ["term", "shard"]).filter("h != h2").count() == 0

    # siblings survived the bucket change
    assert sorted(rd.phrase("needle mark").tolist()) == sorted(
        rs.phrase("needle mark").tolist())
    assert rd.phrase_topk("get page", k=5) == rs.phrase_topk("get page", k=5)
    full = src_index[2]
    g_dst = GrepReader(spark, dst, full).grep("needle")
    g_src = GrepReader(spark, root, full).grep("needle")
    assert sorted(r["doc_id"] for r in g_dst.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in g_src.select("doc_id").collect())

    # history carried: re-appending the SAME delta is recognized (noop);
    # without carried_tags a reindex would double-index every re-run
    s = IndexBuilder(spark, dst, rd.cfg).append(_corpus(spark, 300, 400))
    assert s.get("noop") is True

    # LM sibling tables carried with a re-stamped docs version: the
    # phrase suggester's published lane stays fresh on the destination
    from yase_spark.suggest import bigrams_are_fresh

    assert bigrams_are_fresh(Catalog(dst))

    # stems sibling carried + re-stamped (re-layout never changes the
    # term set): stemmed expansion identical on both roots, served from
    # the PUBLISHED table on dst (freshness true)
    from yase_spark.expand import stems_are_fresh

    assert stems_are_fresh(Catalog(dst))
    assert rd.stem_expand("marks gammas") == rs.stem_expand("marks gammas")
    assert "mark" in rd.stem_expand("marks gammas")

    # destination-exists guard
    with pytest.raises(ValueError, match="already exists"):
        reindex(spark, root, dst)


def test_scoring_reindex_equals_fresh_build(spark, src_index, tmp_path):
    """k1/b rewrite: block bounds recomputed index-side must reproduce a
    from-corpus build at the new params bitwise (same payloads, scoring
    happens at query time — only the WAND bounds had to move)."""
    root, cfg, full = src_index
    dst = str(tmp_path / "k1b")
    reindex(spark, root, dst, k1=0.9, b=0.4)

    from dataclasses import replace
    fresh_root = str(tmp_path / "fresh")
    fcfg = replace(cfg, k1=0.9, b=0.4)
    fb = IndexBuilder(spark, fresh_root, fcfg)
    fb.build(full)
    fb.delete(predicate="path = '0007'")

    rd = IndexReader(spark, dst)
    rf = IndexReader(spark, fresh_root, fcfg)
    assert rd.cfg.k1 == 0.9 and rd.cfg.b == 0.4
    for q in ("gamma alpha3", "beta7 getPage"):
        assert rd.topk(q, 10, use_wand=True) == rf.topk(q, 10, use_wand=True)
        assert rd.topk(q, 10, use_wand=False) == rf.topk(q, 10, use_wand=False)


def test_reindex_rejects_missing_source(spark, tmp_path):
    with pytest.raises(ValueError, match="no index"):
        reindex(spark, str(tmp_path / "nope"), str(tmp_path / "d"))
