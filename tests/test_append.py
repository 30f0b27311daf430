"""Incremental corpus append (SURVEY.md §2.9): append(B) onto build(A)
must index the union — identical per-term df/cf/n and identical global
stats as a from-scratch build over A∪B (doc_ids may differ: append ids
extend the old range instead of re-sorting the union, which is the point
— old ids never change)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder, build_index
from yase_spark.query import IndexReader
from yase_spark.synth import corpus_df


@pytest.mark.slow
def test_append_equivalence(spark, tmp_path):
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    all_corpus = corpus_df(spark, 800, partitions=6).persist()
    part_a = all_corpus.limit(500).persist()
    # the delta overlaps part_a by 100 docs -> dedup must drop them
    part_b = all_corpus.subtract(part_a.limit(400)).persist()

    full_root = str(tmp_path / "full")
    build_index(spark, all_corpus, full_root, cfg)

    inc_root = str(tmp_path / "inc")
    build_index(spark, part_a, inc_root, cfg)
    b = IndexBuilder(spark, inc_root, cfg)
    summary = b.append(part_b)
    assert summary["appended_docs"] == 300
    assert summary["n_docs"] == 800

    # identical stats
    cat_f, cat_i = Catalog(full_root), Catalog(inc_root)
    sf = cat_f.read(spark, "stats").collect()[0]
    si = cat_i.read(spark, "stats").collect()[0]
    assert (sf["n_docs"], sf["total_tokens"]) == (si["n_docs"], si["total_tokens"])

    # identical per-term df/cf/n
    def sig(root):
        segs = Catalog(root).read(spark, "segments")
        per_term = segs.groupBy("term").agg(
            F.first("df").alias("df"), F.first("cf").alias("cf"), F.sum("n").alias("n")
        )
        return {
            r["term"]: (r["df"], r["cf"], r["n"]) for r in per_term.collect()
        }

    assert sig(full_root) == sig(inc_root)

    # queries agree modulo doc_id relabeling: compare natural keys + scores
    rd_f = IndexReader(spark, full_root, cfg)
    rd_i = IndexReader(spark, inc_root, cfg)
    docs_f = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in cat_f.read(spark, "docs").collect()
    }
    docs_i = {
        r["doc_id"]: (r["repo"], r["path"], r["commit"])
        for r in cat_i.read(spark, "docs").collect()
    }
    for q in ["getUserName json", "key row scan", "norm_grad copy table"]:
        tf_ = [(docs_f[d], round(s, 9)) for _, d, s in rd_f.topk(q, 10)]
        ti_ = [(docs_i[d], round(s, 9)) for _, d, s in rd_i.topk(q, 10)]
        assert sorted(tf_) == sorted(ti_), q


@pytest.mark.slow
def test_append_idempotent(spark, tmp_path):
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    a = corpus_df(spark, 300, partitions=4).persist()
    b_delta = corpus_df(spark, 400, partitions=4).subtract(a).persist()
    root = str(tmp_path / "ix")
    build_index(spark, a, root, cfg)
    builder = IndexBuilder(spark, root, cfg)
    s1 = builder.append(b_delta)
    assert not s1["noop"] and s1["appended_docs"] == 100
    s2 = IndexBuilder(spark, root, cfg).append(b_delta)
    assert s2["noop"]


def test_append_bucket_cow_preserves_unaffected_files(spark, tmp_path):
    """VERDICT round 2 item 2: append must be bucket-level copy-on-write —
    buckets containing no delta term keep their previously committed
    parquet FILES (byte-identical paths), and the rewrite cost is
    ∝ delta + affected buckets, never ∝ the whole index."""
    import os

    schema = "repo string, path string, commit string, lang string, content string"
    base = [
        ("r", f"{i:04d}", "c", "python", f"alpha{i % 37} beta{i % 11} gamma")
        for i in range(400)
    ]
    # delta reuses a SINGLE term so few buckets are affected
    delta = [("r", f"9{i:03d}", "c", "python", "gamma") for i in range(20)]
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=32,
                      ngrams=False)
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(base, schema=schema))
    cat = Catalog(root)

    def files_by_bucket():
        out = {}
        for r in (
            cat.read(spark, "segments")
            .select("bucket", F.input_file_name().alias("f"))
            .distinct().collect()
        ):
            out.setdefault(int(r["bucket"]), set()).add(r["f"])
        return out

    before = files_by_bucket()
    s = b.append(spark.createDataFrame(delta, schema=schema))
    assert s["appended_docs"] == 20
    after = files_by_bucket()

    from yase_spark.postings import term_bucket
    gb = term_bucket("gamma", cfg.term_buckets)
    changed = {bk for bk in after if after[bk] != before.get(bk)}
    assert gb in changed
    untouched = set(before) - changed
    assert untouched, "no bucket was carried forward — COW is not bucket-level"
    for bk in untouched:
        assert after[bk] == before[bk], f"bucket {bk} files changed paths"

    # cost class: the new commit dir holds ONLY the affected buckets
    m = cat._manifest("segments")
    new_dir = cat._entry_path("segments", m["data_dirs"][-1])
    new_parts = {d for d in os.listdir(new_dir) if d.startswith("bucket=")}
    assert new_parts == {f"bucket={bk}" for bk in changed}

    # correctness: merged index equals a one-shot build over the union
    full_root = str(tmp_path / "full")
    build_index(
        spark,
        spark.createDataFrame(base + delta, schema=schema),
        full_root, cfg,
    )
    segs_i = {
        (r["term"], r["df"], r["cf"])
        for r in cat.read(spark, "segments").select("term", "df", "cf").collect()
    }
    segs_f = {
        (r["term"], r["df"], r["cf"])
        for r in Catalog(full_root).read(spark, "segments")
        .select("term", "df", "cf").collect()
    }
    assert segs_i == segs_f


def test_force_merge_coalesces_rows_bitwise(spark, tmp_path):
    """force_merge (Lucene forceMerge(1) analogue): under a tiny
    merge_cap hot terms shard-split into multiple segment rows; the
    merge coalesces every split term to ONE row by byte concatenation,
    query results stay bitwise identical on both the eager and the lazy
    WAND lanes, untouched buckets keep byte-identical parquet files, and
    a second call is a commit-free noop."""
    schema = "repo string, path string, commit string, lang string, content string"
    base = [
        ("r", f"{i:04d}", "c", "python",
         f"alpha{i % 37} beta{i % 11} gamma delta{i % 5}")
        for i in range(400)
    ]
    root = str(tmp_path / "fm")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=32,
                      ngrams=False, merge_cap=50, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(base, schema=schema))
    cat = Catalog(root)

    def files_by_bucket():
        out = {}
        for r in (
            cat.read(spark, "segments")
            .select("bucket", F.input_file_name().alias("f"))
            .distinct().collect()
        ):
            out.setdefault(int(r["bucket"]), set()).add(r["f"])
        return out

    segs = cat.read(spark, "segments")
    split_terms = {
        r["term"]
        for r in segs.groupBy("term").count()
        .filter(F.col("count") > 1).select("term").collect()
    }
    assert "gamma" in split_terms and len(split_terms) > 1
    totals_before = {
        r["term"]: (int(r["n"]), int(r["df"]))
        for r in segs.groupBy("term")
        .agg(F.sum("n").alias("n"), F.first("df").alias("df")).collect()
    }
    rd = IndexReader(spark, root, cfg)
    q = "gamma alpha3"
    want = rd.topk(q, 10, use_wand=False)
    assert rd.topk(q, 10, use_wand=True) == want
    before = files_by_bucket()

    s = b.force_merge()
    assert s["noop"] is False
    assert s["merged_terms"] == len(split_terms)

    segs2 = cat.read(spark, "segments")
    assert segs2.groupBy("term").count().filter(F.col("count") > 1).count() == 0
    totals_after = {
        r["term"]: (int(r["n"]), int(r["df"]))
        for r in segs2.groupBy("term")
        .agg(F.sum("n").alias("n"), F.first("df").alias("df")).collect()
    }
    assert totals_after == totals_before

    rd2 = IndexReader(spark, root, cfg)
    assert rd2.topk(q, 10, use_wand=False) == want
    assert rd2.topk(q, 10, use_wand=True) == want
    # a merged term decodes to the same postings as the pre-merge concat
    pp_old, pp_new = rd.fetch_terms(["gamma"]), rd2.fetch_terms(["gamma"])
    assert np.array_equal(pp_old["gamma"].doc_ids, pp_new["gamma"].doc_ids)
    assert np.array_equal(pp_old["gamma"].tfs, pp_new["gamma"].tfs)

    from yase_spark.postings import term_bucket
    affected = {term_bucket(t, cfg.term_buckets) for t in split_terms}
    after = files_by_bucket()
    changed = {bk for bk in after if after[bk] != before.get(bk)}
    assert changed == affected
    for bk in set(before) - changed:
        assert after[bk] == before[bk], f"bucket {bk} files changed paths"

    v = cat.current_version("segments")
    assert b.force_merge()["noop"] is True
    assert cat.current_version("segments") == v  # noop commits nothing
