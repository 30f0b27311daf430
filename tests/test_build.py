"""Index-build invariants over the shared 1000-doc synthetic corpus
(SURVEY.md §5.5): segment consistency, sha256 invariant, doc_id
determinism, salting equivalence."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.codec import decode_postings
from yase_spark.corpus import check_sha256
from yase_spark.ids import assign_doc_ids, assign_doc_ids_window
from yase_spark.oracle import sha256_hex
from yase_spark.stats import salted_two_phase_count
from yase_spark.synth import gen_corpus_pdf


def test_build_summary(tiny_index):
    root, cfg, summary = tiny_index
    assert summary["n_docs"] == 1000
    assert summary["postings"] > 100_000
    assert summary["groups_built"] == cfg.build_groups


def test_segments_consistent(spark, tiny_index):
    root, cfg, _ = tiny_index
    cat = Catalog(root)
    segs = cat.read(spark, "segments")
    rows = segs.orderBy(F.desc("df")).limit(50).collect()
    assert rows
    for r in rows:
        ids, tfs, dls = decode_postings(bytes(r["payload"]), int(r["n"]))
        assert ids.size == r["n"]
        assert np.all(np.diff(ids) > 0), "doc_ids strictly increasing"
        assert tfs.min() >= 1
        meta = r["block_meta"]
        assert sum(m["n_docs"] for m in meta) == r["n"]
        assert meta[0]["block_first"] == int(ids[0])
        assert meta[-1]["block_last"] == int(ids[-1])
        # block-max really is an upper bound on the naive per-doc scores
        assert all(m["max_score"] > 0 for m in meta)
    # df totals match a recount from decoded postings
    total_postings = segs.agg(F.sum("n")).collect()[0][0]
    df_total = segs.agg(F.sum("df")).collect()[0][0]
    assert total_postings == df_total  # no sharded terms in tiny corpus


def test_docs_table(spark, tiny_index):
    root, _, _ = tiny_index
    cat = Catalog(root)
    docs = cat.read(spark, "docs")
    assert docs.count() == 1000
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert sorted(ids) == list(range(1, 1001)), "dense 1-based doc_ids"
    # doc_len matches tokenizer on driver side for a sample
    from yase_spark.tokenize import tokenize_text

    sample = docs.orderBy("doc_id").limit(5).collect()
    pdf = gen_corpus_pdf(1000)
    by_key = {(r.repo, r.path, r.commit): r for r in pdf.itertuples()}
    for r in sample:
        src = by_key[(r["repo"], r["path"], r["commit"])]
        assert r["doc_len"] == len(tokenize_text(src.content))
        assert r["content_sha256"] == sha256_hex(src.content)


def test_sha256_invariant(spark, tiny_corpus):
    manifest = tiny_corpus.select(
        "repo", "path", "commit", F.sha2(F.col("content"), 256).alias("content_sha256")
    )
    assert check_sha256(tiny_corpus, manifest) == 0
    # corrupt one row -> exactly one violation
    bad = manifest.withColumn(
        "content_sha256",
        F.when(F.col("path").endswith("File0.py"), F.lit("deadbeef")).otherwise(
            F.col("content_sha256")
        ),
    )
    assert check_sha256(tiny_corpus, bad) >= 1


def test_doc_id_scalable_matches_window(spark, tiny_corpus):
    a = assign_doc_ids(tiny_corpus, sort_partitions=7).select(
        "repo", "path", "commit", "doc_id"
    )
    b = assign_doc_ids_window(tiny_corpus).select("repo", "path", "commit", "doc_id")
    diff = a.join(b, ["repo", "path", "commit"]).filter(
        a["doc_id"] != b["doc_id"]
    )
    assert diff.count() == 0


def test_doc_id_partition_invariant(spark, tiny_corpus):
    a = assign_doc_ids(tiny_corpus, sort_partitions=3)
    b = assign_doc_ids(tiny_corpus, sort_partitions=17)
    merged = a.select("repo", "path", "commit", F.col("doc_id").alias("ida")).join(
        b.select("repo", "path", "commit", F.col("doc_id").alias("idb")),
        ["repo", "path", "commit"],
    )
    assert merged.filter(F.col("ida") != F.col("idb")).count() == 0


def test_fused_dedup_matches_groupby_min(spark, tiny_corpus):
    """dedup_and_assign_ids (one content shuffle) must equal the naive
    groupBy-min dedup + sort + id mint."""
    from yase_spark.ids import dedup_and_assign_ids

    dup = tiny_corpus.limit(50).withColumn("content", F.concat(F.lit("zzz "), "content"))
    dup2 = tiny_corpus.limit(30)  # exact duplicates
    noisy = tiny_corpus.unionByName(dup).unionByName(dup2)

    naive = (
        noisy.groupBy("repo", "path", "commit")
        .agg(F.min(F.struct("lang", "content")).alias("_r"))
        .select(
            "repo", "path", "commit",
            F.col("_r.lang").alias("lang"), F.col("_r.content").alias("content"),
        )
    )
    want = assign_doc_ids_window(naive).select(
        "repo", "path", "commit", "doc_id", F.sha2("content", 256).alias("sha")
    )
    got = dedup_and_assign_ids(noisy, sort_partitions=5).select(
        "repo", "path", "commit", "doc_id", F.sha2("content", 256).alias("sha")
    )
    assert got.count() == 1000
    joined = got.alias("g").join(want.alias("w"), ["repo", "path", "commit"])
    mism = joined.filter(
        (F.col("g.doc_id") != F.col("w.doc_id")) | (F.col("g.sha") != F.col("w.sha"))
    )
    assert mism.count() == 0


def test_salted_agg_equals_plain(spark, tiny_corpus):
    plain = {
        r["lang"]: r["cnt"]
        for r in tiny_corpus.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        r["lang"]: r["cnt"]
        for r in salted_two_phase_count(tiny_corpus, "lang", shards=8).collect()
    }
    assert plain == salted


def test_fingerprint_overlaps_tokenize_on_file_backed_corpus(spark, tiny_corpus, tmp_path):
    """Round-3 open item 1: a fresh build over a file-backed corpus must
    not pay the fingerprint scan as serial wall time (it rides a driver
    thread concurrent with the tokenize write, resolved at the manifest
    commit) — and the committed fingerprint must be IDENTICAL to the
    standalone scan's, so resume identity is unchanged."""
    from yase_spark.config import IndexConfig
    from yase_spark.index import (
        IndexBuilder,
        _estimate_content_bytes,
        corpus_fingerprint,
    )

    cdir = str(tmp_path / "corpus")
    tiny_corpus.write.parquet(cdir)
    corpus = spark.read.parquet(cdir)

    # estimator: file-backed -> positive estimate; in-memory -> None
    est = _estimate_content_bytes(corpus)
    assert est is not None and est > 0
    assert _estimate_content_bytes(tiny_corpus) is None

    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8)
    summary = IndexBuilder(spark, root, cfg).build(corpus)
    assert summary["phases"]["fingerprint"] == 0.0, summary["phases"]
    assert summary["fingerprint"] == corpus_fingerprint(corpus)

    # resume identity: same corpus -> upfront scan matches, zero rebuild
    again = IndexBuilder(spark, root, cfg).build(corpus)
    assert again["groups_built"] == 0
    assert again["fingerprint"] == summary["fingerprint"]
