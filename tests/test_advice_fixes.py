"""Regression tests for the round-1 ADVICE findings:

1. a crash between the docs commit and the stats commit must not leave
   the index permanently unreadable (the resume branch now re-commits
   stats when the table is missing);
2. the build's IndexConfig is persisted as catalog properties and the
   reader adopts it / rejects semantic mismatches (a term_buckets
   mismatch silently returned empty postings before);
3. append commits stats AFTER the segments overwrite, and the idempotent
   no-op path heals a crash between the two commits.
"""

import pytest

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder, build_index
from yase_spark.query import IndexReader
from yase_spark.synth import corpus_df


def test_resume_heals_missing_stats(spark, tmp_path):
    corpus = corpus_df(spark, 200, partitions=4)
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    build_index(spark, corpus, root, cfg)

    # simulate a crash window: docs + local_segments committed, stats not
    cat = Catalog(root)
    cat.drop("stats")
    with pytest.raises(FileNotFoundError):
        IndexReader(spark, root)

    # re-running the build takes the resume branch and must heal stats
    build_index(spark, corpus, root, cfg)
    rd = IndexReader(spark, root)
    assert rd.n_docs == 200
    assert rd.topk("json", k=3)


def test_reader_adopts_persisted_config(spark, tmp_path):
    corpus = corpus_df(spark, 200, partitions=4)
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=16)
    build_index(spark, corpus, root, cfg)

    # cfg=None adopts the persisted build config (not the default 64)
    rd = IndexReader(spark, root)
    assert rd.cfg.term_buckets == 16
    assert rd.topk("json", k=3), "bucket pruning works with adopted cfg"

    # a semantically mismatched caller cfg is rejected, not silently wrong
    with pytest.raises(ValueError, match="term_buckets"):
        IndexReader(spark, root, IndexConfig(term_buckets=64))

    # rebuilding in-place with a different semantic config is rejected too
    with pytest.raises(ValueError, match="different semantic config"):
        build_index(spark, corpus, root, IndexConfig(build_groups=2, term_buckets=64))


def test_append_noop_heals_stale_stats(spark, tmp_path):
    corpus = corpus_df(spark, 200, partitions=4)
    delta = corpus_df(spark, 260, partitions=4).join(
        corpus.select("repo", "path", "commit"), ["repo", "path", "commit"], "left_anti"
    )
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    b = IndexBuilder(spark, root, cfg)
    b.build(corpus)
    cat = Catalog(root)
    base_stats_rows = cat.read(spark, "stats").collect()

    s = b.append(delta)
    assert not s["noop"] and s["appended_docs"] == 60
    full_stats = cat.read(spark, "stats").collect()[0]
    assert full_stats["n_docs"] == 260

    # simulate the crash window: segments committed, stats rolled back
    cat.write("stats", spark.createDataFrame(base_stats_rows), mode="overwrite",
              tag={"unit": "stats"})
    s2 = IndexBuilder(spark, root, cfg).append(delta)
    assert s2["noop"], "idempotent re-append is a no-op"
    healed = cat.read(spark, "stats").collect()[0]
    assert healed["n_docs"] == 260, "no-op path healed the stale stats"


def test_lazy_bounds_survive_avgdl_raising_append(spark, tmp_path):
    """ADVICE round 2 (high): the stored block max_score was computed with
    encode-time avgdl; an append that RAISES global avgdl raises every
    BM25 score (dl/avgdl shrinks), so rescaling the bound by idf alone
    under-estimates true block maxima and lets WAND prune true top-k
    docs. The bound must also scale by max(1, avgdl_now/avgdl_stored)."""
    import numpy as np

    schema = "repo string, path string, commit string, lang string, content string"
    short = [
        ("r", f"{i:04d}", "c", "python", "needle " * (1 + i % 7) + "pad")
        for i in range(600)
    ]
    longd = [
        ("r", f"9{i:04d}", "c", "python",
         " ".join(f"w{j} filler{j}" for j in range(200)))
        for i in range(120)
    ]
    root = str(tmp_path / "idx")
    cfg = IndexConfig(
        build_groups=2, shuffle_partitions=8, block_size=16, ngrams=False
    )
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(short, schema=schema))
    b.append(spark.createDataFrame(longd, schema=schema))

    rd = IndexReader(spark, root)
    # avgdl must actually have jumped, else the test proves nothing
    assert rd.avgdl > 50, rd.avgdl

    # bound-validity gate: every lazy block bound must dominate the true
    # per-block maximum contribution recomputed under the NEW stats
    tp = rd.fetch_terms(["needle"])["needle"]
    from yase_spark.query import bm25_scores_np

    true_scores = bm25_scores_np(
        tp.tfs, tp.dls, tp.idf, rd.cfg.k1, rd.cfg.b, rd.avgdl
    )
    cur = rd._lazy_cursors("needle")[0]
    pos = 0
    for bi in range(cur.nb):
        n = int(cur.block_n[bi])
        assert cur.block_max[bi] >= true_scores[pos:pos + n].max() - 1e-12, (
            f"block {bi} bound under-estimates after avgdl append"
        )
        pos += n

    # end-to-end: lazy (pruned) results bitwise-match the full decode
    for k in (1, 5, 20):
        assert rd.topk_lazy("needle", k) == rd.topk("needle", k, use_wand=False)
