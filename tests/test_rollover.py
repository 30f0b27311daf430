"""ILM-style rollover (rollover.py): generation lifecycle (append into
the open generation, seal on max_docs, next batch starts a new one),
write alias tracks the newest generation, and the stream-wide federated
search is score-identical to one merged index over the union corpus."""

import os

import pytest

from yase_spark.alias import list_aliases, resolve_alias
from yase_spark.config import IndexConfig
from yase_spark.index import build_index
from yase_spark.query import IndexReader
from yase_spark.rollover import (
    generation_roots,
    get_state,
    rollover_append,
    rollover_now,
    rollover_search,
    stream_readers,
)

SCHEMA = "repo string, path string, commit string, lang string, content string"
CFG = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)


def _batch(spark, lo, hi):
    return spark.createDataFrame(
        [
            (
                "r",
                f"{i:04d}",
                "c",
                "py",
                f"alpha{i % 7} beta gamma delta{i % 3} json getPage",
            )
            for i in range(lo, hi)
        ],
        schema=SCHEMA,
    )


def test_generation_lifecycle_and_write_alias(spark, tmp_path):
    wh = str(tmp_path / "wh")
    # max_docs=100: batch 1 (60) stays open, batch 2 (40 more) seals,
    # batch 3 starts generation 2
    s1 = rollover_append(spark, wh, "logs", _batch(spark, 0, 60), CFG,
                         max_docs=100)
    assert s1["created"] and not s1["rolled"] and s1["n_docs"] == 60
    assert s1["generation"] == "logs-000001"

    s2 = rollover_append(spark, wh, "logs", _batch(spark, 60, 100), CFG,
                         max_docs=100)
    assert not s2["created"] and s2["rolled"] and s2["n_docs"] == 100
    assert get_state(wh, "logs")["sealed"]

    s3 = rollover_append(spark, wh, "logs", _batch(spark, 100, 130), CFG,
                         max_docs=100)
    assert s3["created"] and s3["generation"] == "logs-000002"
    assert s3["n_docs"] == 30 and not s3["rolled"]

    roots = generation_roots(wh, "logs")
    assert [os.path.basename(r) for r in roots] == [
        "logs-000001", "logs-000002",
    ]
    # the write alias follows the newest generation
    assert resolve_alias(f"alias://{wh}/logs-write") == roots[-1]
    assert "logs-write" in list_aliases(wh)
    # generation sizes: sealed gen kept every doc, open gen has the rest
    ns = [IndexReader(spark, r, CFG).n_docs for r in roots]
    assert ns == [100, 30]


def test_explicit_rollover_now(spark, tmp_path):
    wh = str(tmp_path / "wh")
    rollover_append(spark, wh, "s", _batch(spark, 0, 30), CFG)
    st = rollover_now(wh, "s")
    assert st["rolled"] and get_state(wh, "s")["sealed"]
    # idempotent: second call reports already-sealed
    assert not rollover_now(wh, "s")["rolled"]
    # no max_docs: without the explicit call the generation never seals
    s = rollover_append(spark, wh, "s", _batch(spark, 30, 60), CFG)
    assert s["created"] and s["generation"] == "s-000002"


def test_stream_search_matches_merged_index(spark, tmp_path):
    wh = str(tmp_path / "wh")
    for lo, hi in [(0, 50), (50, 100), (100, 140)]:
        rollover_append(spark, wh, "code", _batch(spark, lo, hi), CFG,
                        max_docs=50)
    assert len(generation_roots(wh, "code")) == 3

    merged_root = str(tmp_path / "merged")
    build_index(spark, _batch(spark, 0, 140), merged_root, CFG)
    want = IndexReader(spark, merged_root, CFG)

    for q in ["alpha1 beta", "json getPage", "delta2 gamma alpha3"]:
        got = rollover_search(spark, wh, "code", q, k=10, cfg=CFG)
        ref = want.topk(q, 10)
        id2path = {
            r["doc_id"]: r["path"]
            for r in want.cat.read(spark, "docs")
            .select("doc_id", "path").collect()
        }
        assert [(p, round(s, 9)) for _r, _repo, p, _c, s in got] == [
            (id2path[d], round(s, 9)) for _r, d, s in ref
        ], q


def test_bad_stream_inputs(spark, tmp_path):
    wh = str(tmp_path / "wh")
    with pytest.raises(ValueError):
        rollover_append(spark, wh, "a/b", _batch(spark, 0, 5), CFG)
    with pytest.raises(ValueError):
        rollover_now(wh, "nope")
    with pytest.raises(ValueError):
        stream_readers(spark, wh, "nope", CFG)


def test_ilm_policy_delete_merge_sweep(spark, tmp_path):
    from yase_spark.catalog import Catalog
    from yase_spark.rollover import ilm_policy

    wh = str(tmp_path / "ilm")
    # max_docs=1: every append seals its generation -> 3 sealed gens
    for lo, hi in ((0, 30), (30, 60), (60, 90)):
        s = rollover_append(spark, wh, "code", _batch(spark, lo, hi), CFG,
                            max_docs=1)
        assert s["rolled"]
    assert get_state(wh, "code")["generations"] == [
        "code-000001", "code-000002", "code-000003"
    ]
    # plant an orphan generation-shaped dir (crashed build remnant).
    # Under the default 1h age gate a just-written dir is treated as an
    # in-flight build and survives; with the gate lowered it is swept.
    os.makedirs(os.path.join(wh, "code-000009"))
    safe = ilm_policy(spark, wh, "code", CFG, merge_sealed=False)
    assert safe["swept"] == []
    assert os.path.isdir(os.path.join(wh, "code-000009"))
    out = ilm_policy(spark, wh, "code", CFG, keep_generations=2,
                     orphan_min_age_s=0.0)
    assert out["deleted"] == ["code-000001"]
    assert out["swept"] == ["code-000009"]
    assert out["merged"] == ["code-000002", "code-000003"]
    assert not os.path.exists(os.path.join(wh, "code-000001"))
    assert get_state(wh, "code")["generations"] == [
        "code-000002", "code-000003"
    ]
    # retention is visible to serving: the stream ranks ONLY survivors,
    # score-identical to one merged index over the surviving corpus
    rows = rollover_search(spark, wh, "code", "json getPage", k=10, cfg=CFG)
    assert rows and all(30 <= int(p) < 90 for _r, _repo, p, _c, _s in rows)
    merged_root = str(tmp_path / "merged")
    build_index(
        spark, _batch(spark, 30, 90), merged_root, CFG
    )
    want = IndexReader(spark, merged_root, CFG).topk("json getPage", 10)
    m = {
        r["doc_id"]: r["path"]
        for r in IndexReader(spark, merged_root, CFG)
        .cat.read(spark, "docs").select("doc_id", "path").collect()
    }
    assert [(p, round(s, 12)) for _r, _repo, p, _c, s in rows] == [
        (m[d], round(s, 12)) for _rk, d, s in want
    ]
    # write alias untouched (still the newest generation)
    assert resolve_alias(f"alias://{wh}/code-write").endswith("code-000003")
    # idempotent: nothing left to delete/sweep; merges/vacuums no-op
    # (no new catalog commits on the surviving generations)
    vers = [
        Catalog(r).current_version("segments")
        for r in generation_roots(wh, "code")
    ]
    out2 = ilm_policy(spark, wh, "code", CFG, keep_generations=2)
    assert out2["deleted"] == [] and out2["swept"] == []
    assert [
        Catalog(r).current_version("segments")
        for r in generation_roots(wh, "code")
    ] == vers


def test_append_after_ilm_delete_mints_fresh_name(spark, tmp_path):
    """Regression: generation names are minted from the persisted
    monotonic counter, not len(generations) — after an ILM retention
    delete shrinks the list, the next rollover must NOT reuse a live
    generation's name (which would rebuild over it and federate the
    same docs twice)."""
    from yase_spark.rollover import ilm_policy

    wh = str(tmp_path / "ilmseq")
    for lo, hi in ((0, 20), (20, 40), (40, 60)):
        s = rollover_append(spark, wh, "code", _batch(spark, lo, hi), CFG,
                            max_docs=1)
        assert s["rolled"]
    ilm_policy(spark, wh, "code", CFG, keep_generations=2,
               merge_sealed=False)
    assert get_state(wh, "code")["generations"] == [
        "code-000002", "code-000003"
    ]
    # all sealed -> this append starts a NEW generation
    s = rollover_append(spark, wh, "code", _batch(spark, 60, 80), CFG,
                        max_docs=1)
    assert s["created"] and s["generation"] == "code-000004"
    gens = get_state(wh, "code")["generations"]
    assert gens == ["code-000002", "code-000003", "code-000004"]
    assert len(set(gens)) == len(gens)
    # the stream serves each surviving doc exactly once
    rows = rollover_search(spark, wh, "code", "json getPage", k=100,
                           cfg=CFG)
    paths = [p for _r, _repo, p, _c, _s in rows]
    assert sorted(paths) == sorted({f"{i:04d}" for i in range(20, 80)})


def test_ilm_policy_validation(spark, tmp_path):
    from yase_spark.rollover import ilm_policy

    wh = str(tmp_path / "ilmv")
    with pytest.raises(ValueError, match="no generations"):
        ilm_policy(spark, wh, "code", CFG)
    rollover_append(spark, wh, "code", _batch(spark, 0, 10), CFG)
    with pytest.raises(ValueError, match="keep_generations"):
        ilm_policy(spark, wh, "code", CFG, keep_generations=0)
    # a 1-generation unsealed stream: nothing sealed, nothing deleted
    out = ilm_policy(spark, wh, "code", CFG, keep_generations=1)
    assert out == {
        "deleted": [], "swept": [], "merged": [], "vacuumed": [],
        "kept": ["code-000001"],
    }


def test_stream_rollover_generations_and_replay(spark, tmp_path):
    """Streaming data-stream writes: file micro-batches land in
    rollover generations, max_docs seals per batch boundary, a re-run
    with the same checkpoint ingests nothing new, and the stream
    search equals one merged index over the union corpus."""
    from yase_spark.streaming import stream_rollover

    wh = str(tmp_path / "wh")
    inbox = str(tmp_path / "inbox")
    ckpt = str(tmp_path / "ckpt")
    # two waves, one file each (maxFilesPerTrigger=1 -> 2 micro-batches)
    _batch(spark, 0, 40).coalesce(1).write.mode("append").parquet(inbox)
    _batch(spark, 40, 80).coalesce(1).write.mode("append").parquet(inbox)
    q = stream_rollover(
        spark, inbox, wh, "ds", ckpt, CFG, max_docs=1,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    st = get_state(wh, "ds")
    assert st["generations"] == ["ds-000001", "ds-000002"]
    assert st["sealed"]  # the last batch met the condition too
    # replay: same checkpoint, no new files -> nothing changes
    q = stream_rollover(
        spark, inbox, wh, "ds", ckpt, CFG, max_docs=1,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert get_state(wh, "ds") == st
    # a third wave starts generation 3
    _batch(spark, 80, 100).coalesce(1).write.mode("append").parquet(inbox)
    q = stream_rollover(
        spark, inbox, wh, "ds", ckpt, CFG, max_docs=1,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert get_state(wh, "ds")["generations"][-1] == "ds-000003"
    # stream-wide search == one merged index over the union corpus
    rows = rollover_search(spark, wh, "ds", "json getPage", k=10, cfg=CFG)
    merged_root = str(tmp_path / "merged")
    build_index(spark, _batch(spark, 0, 100), merged_root, CFG)
    rb = IndexReader(spark, merged_root, CFG)
    m = {
        r["doc_id"]: r["path"]
        for r in rb.cat.read(spark, "docs").select("doc_id", "path").collect()
    }
    want = rb.topk("json getPage", 10)
    assert [(p, round(s, 9)) for _r, _repo, p, _c, s in rows] == [
        (m[d], round(s, 9)) for _rk, d, s in want
    ]
