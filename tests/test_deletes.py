"""Document deletes (round 3+): tombstone (logical) semantics a la
Lucene liveDocs / Iceberg positional deletes, and physical compaction.

Gates: tombstoned docs stop matching IMMEDIATELY in every lane (driver
dense, lazy fallback, boolean driver+cluster, sharded, distributed,
batch); collection stats stay encode-time until apply_deletes; after
apply_deletes the index is bitwise what a fresh build over the
remaining corpus produces, matched by natural key (doc ids are
renumbered densely and order-preservingly, the Lucene-merge rule)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder
from yase_spark.query import IndexReader
from yase_spark.synth import corpus_df


@pytest.fixture(scope="module")
def del_index(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delidx"))
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(corpus_df(spark, 1000, partitions=8))
    return root, cfg, b


def test_tombstone_masks_every_lane(spark, del_index):
    root, cfg, b = del_index
    clean = IndexReader(spark, root)
    q = "json getPage"
    before = clean.topk(q, 10, use_wand=False)
    assert before
    victims = [d for _, d, _ in before[:3]]

    got = b.delete(doc_ids=victims)
    assert got["tombstoned"] == 3
    # idempotent re-delete
    assert b.delete(doc_ids=victims)["tombstoned"] == 0

    rd = IndexReader(spark, root)
    vs = set(victims)

    # expected: clean postings minus victims, OLD stats (Lucene rule) —
    # built from the analyzer's own tokens
    from yase_spark.tokenize import analyze_query

    toks = analyze_query(q)
    gt = clean.fetch_terms(toks)
    scores = {}
    for t in toks:
        tp = gt.get(t)
        if tp is None:
            continue
        contrib = tp.idf * (tp.tfs.astype(np.float64) * (cfg.k1 + 1.0)) / (
            tp.tfs.astype(np.float64)
            + cfg.k1 * (1.0 - cfg.b + cfg.b * (tp.dls.astype(np.float64) / clean.avgdl))
        )
        for d, c in zip(tp.doc_ids.tolist(), contrib.tolist()):
            if d not in vs:
                scores[d] = scores.get(d, 0.0) + c
    exp = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    exp = [(r + 1, d, s) for r, (d, s) in enumerate(exp)]

    assert rd.topk(q, 10, use_wand=False) == exp
    assert rd.topk_lazy(q, 10) == exp            # tombstone fallback lane
    assert rd.topk_block_selected(q, 10) == exp  # tombstone fallback lane
    sh = rd.topk_sharded(q, 10, n_ranges=4)
    assert [(r, d) for r, d, _ in sh] == [(r, d) for r, d, _ in exp]
    for (_, _, a), (_, _, bscore) in zip(sh, exp):
        assert abs(a - bscore) < 1e-9
    dist = rd.topk_distributed(q, 10).collect()
    assert [int(r["doc_id"]) for r in dist] == [d for _, d, _ in exp]
    batch = rd.topk_set_distributed(
        [{"query_id": "q0", "query": q, "k": 10}]
    ).collect()
    assert sorted((int(r["rank"]), int(r["doc_id"])) for r in batch) == [
        (r, d) for r, d, _ in exp
    ]

    # boolean lanes: victims vanish from AND/OR, driver == cluster
    and_clean = set(int(x) for x in clean.bool_and(q))
    got_and = set(int(x) for x in rd.bool_and(q))
    assert got_and == and_clean - vs
    got_and_df = set(r["doc_id"] for r in rd.bool_and_df(q).collect())
    assert got_and_df == got_and


def test_apply_deletes_equals_fresh_build(spark, tmp_path):
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16)
    corpus = corpus_df(spark, 800, partitions=8)

    root_a = str(tmp_path / "a")
    ba = IndexBuilder(spark, root_a, cfg)
    ba.build(corpus)
    # delete by predicate, then physically compact
    got = ba.delete(predicate="pmod(doc_id, 5) = 2")
    assert got["tombstoned"] > 0
    applied = ba.apply_deletes()
    assert applied["applied"] == got["tombstoned"]

    ra = IndexReader(spark, root_a)
    assert ra._deleted is None  # tombstones cleared; fast lanes restored
    docs_a = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in ra.cat.read(spark, "docs").collect()
    }

    # fresh build over exactly the remaining corpus
    keep_keys = spark.createDataFrame(
        [(k[0], k[1], k[2]) for k in docs_a],
        schema="repo string, path string, commit string",
    )
    root_b = str(tmp_path / "b")
    bb = IndexBuilder(spark, root_b, cfg)
    bb.build(corpus.join(keep_keys, ["repo", "path", "commit"], "left_semi"))
    rb = IndexReader(spark, root_b)

    # identical collection stats
    assert ra.n_docs == rb.n_docs
    assert abs(ra.avgdl - rb.avgdl) < 1e-12
    docs_b = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in rb.cat.read(spark, "docs").collect()
    }
    assert set(docs_a) == set(docs_b)

    # bitwise score parity per natural key on several queries
    for q in ("json", "json getPage", "sync_list parse", "getUserName"):
        res_a = ra.topk(q, 10, use_wand=False)
        res_b = rb.topk(q, 10, use_wand=False)
        inv_a = {v: k for k, v in docs_a.items()}
        inv_b = {v: k for k, v in docs_b.items()}
        assert [(inv_a[d], s) for _, d, s in res_a] == [
            (inv_b[d], s) for _, d, s in res_b
        ], q

    # lazy/pruned lanes are live again and agree bitwise
    for q in ("json", "json getPage"):
        assert ra.topk_lazy(q, 10) == ra.topk(q, 10, use_wand=False), q


def test_delete_validation(spark, del_index):
    root, cfg, b = del_index
    with pytest.raises(ValueError):
        b.delete()
    with pytest.raises(ValueError):
        b.delete(doc_ids=[1], predicate="doc_id = 2")
    # unknown ids are ignored (left-semi against docs)
    assert b.delete(doc_ids=[10**12])["tombstoned"] == 0


def test_compact_then_append_equals_oneshot(spark, tmp_path):
    """Lifecycle composition: build -> delete+compact -> append must be
    indistinguishable (natural keys + bitwise scores) from a one-shot
    build over (remaining ∪ delta) — compaction's renumbering and stats
    rebuild must compose with the copy-on-write append."""
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, block_size=16)
    full = corpus_df(spark, 900, partitions=8)
    base = full.filter(F.pmod(F.xxhash64("path"), F.lit(3)) != 0)
    delta = full.join(base.select("repo", "path", "commit"),
                      ["repo", "path", "commit"], "left_anti")

    root_a = str(tmp_path / "a")
    ba = IndexBuilder(spark, root_a, cfg)
    ba.build(base)
    ba.delete(predicate="pmod(doc_id, 4) = 1")
    ba.apply_deletes()
    ba.append(delta)
    ra = IndexReader(spark, root_a)

    keys_a = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in ra.cat.read(spark, "docs").collect()
    }
    keep = spark.createDataFrame(
        [(k[0], k[1], k[2]) for k in keys_a],
        schema="repo string, path string, commit string",
    )
    root_b = str(tmp_path / "b")
    IndexBuilder(spark, root_b, cfg).build(
        full.join(keep, ["repo", "path", "commit"], "left_semi")
    )
    rb = IndexReader(spark, root_b)
    keys_b = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in rb.cat.read(spark, "docs").collect()
    }
    assert set(keys_a) == set(keys_b)
    assert ra.n_docs == rb.n_docs and abs(ra.avgdl - rb.avgdl) < 1e-12

    inv_a = {v: k for k, v in keys_a.items()}
    inv_b = {v: k for k, v in keys_b.items()}
    for q in ("json", "json getPage", "getUserName parse"):
        res_a = ra.topk(q, 10, use_wand=False)
        res_b = rb.topk(q, 10, use_wand=False)
        assert [(inv_a[d], s) for _, d, s in res_a] == [
            (inv_b[d], s) for _, d, s in res_b
        ], q
