"""Snapshot expiry (catalog.expire_snapshots / IndexBuilder.vacuum —
Iceberg expireSnapshots + remove_orphan_files): current reads are
bit-identical before/after, expired time-travel raises, resume tags
survive via carried metadata, COW-superseded bucket partition dirs are
physically reclaimed, orphan dirs from crashed commits are collected,
and the operation is idempotent."""

import os

import pytest
from pyspark.sql import functions as F

from yase_spark.catalog import Catalog
from yase_spark.config import IndexConfig
from yase_spark.index import IndexBuilder
from yase_spark.query import IndexReader

SCHEMA = "repo string, path string, commit string, lang string, content string"


def _corpus(spark, n0, n1):
    rows = [
        ("r", f"{i:04d}", "c", "python",
         f"alpha{i % 37} beta{i % 11} gamma delta{i % 5}")
        for i in range(n0, n1)
    ]
    return spark.createDataFrame(rows, schema=SCHEMA)


def test_vacuum_reclaims_without_changing_reads(spark, tmp_path):
    root = str(tmp_path / "vx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=32,
                      ngrams=False, merge_cap=50, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(_corpus(spark, 0, 300))
    b.append(_corpus(spark, 300, 400))          # bucket-COW commit
    assert b.force_merge()["noop"] is False     # partition-replace commit
    cat = Catalog(root)
    assert cat.current_version("segments") >= 3

    rd = IndexReader(spark, root, cfg)
    q = "gamma alpha3"
    want = rd.topk(q, 10, use_wand=False)
    segs_before = sorted(
        (r["term"], r["shard"], bytes(r["payload"]))
        for r in cat.read(spark, "segments")
        .select("term", "shard", "payload").collect()
    )
    tags_before = [
        t.get("unit") for t in cat.committed_tags("segments") if t.get("unit")
    ]
    v1_readable = cat.read(spark, "segments", version=1)
    assert v1_readable.count() > 0  # time-travel works pre-expiry

    # simulated crashed commit: a data dir written but never listed
    orphan = os.path.join(root, "segments", "data", "orphan-crashed")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"\x00" * 1024)

    stats = b.vacuum(keep_last=1)
    seg = stats["tables"]["segments"]
    assert seg["deleted_dirs"] >= 1          # the orphan at minimum
    assert seg["deleted_partitions"] >= 1    # COW-superseded bucket dirs
    assert stats["freed_bytes"] > 0
    assert not os.path.exists(orphan)
    assert 1 in seg["expired_versions"]
    assert seg["retained_versions"] == [cat.current_version("segments")]

    # current reads bit-identical on a FRESH reader (no shared-meta help)
    IndexReader.clear_shared_meta()
    rd2 = IndexReader(spark, root, cfg)
    assert rd2.topk(q, 10, use_wand=False) == want
    assert rd2.topk(q, 10, use_wand=True) == want
    segs_after = sorted(
        (r["term"], r["shard"], bytes(r["payload"]))
        for r in cat.read(spark, "segments")
        .select("term", "shard", "payload").collect()
    )
    assert segs_after == segs_before

    # expired time-travel raises (Iceberg semantics), history is clean
    with pytest.raises(FileNotFoundError):
        cat.read(spark, "segments", version=1)
    assert [s["version"] for s in cat.snapshots("segments")] == [
        cat.current_version("segments")
    ]

    # resume safety: every pre-expiry unit tag is still visible
    tags_after = [
        t.get("unit") for t in cat.committed_tags("segments") if t.get("unit")
    ]
    assert set(tags_before) <= set(tags_after)
    # ... functionally: re-applying the SAME delta is still recognized
    # as already-applied (its fingerprint tag survived the expiry on the
    # carried metadata) — without that, vacuum would double-index data
    s = IndexBuilder(spark, root, cfg).append(_corpus(spark, 300, 400))
    assert s.get("noop") is True

    # idempotent: a second vacuum finds nothing
    again = b.vacuum(keep_last=1)
    assert again["freed_bytes"] == 0
    assert again["deleted_dirs"] == 0 and again["deleted_partitions"] == 0

    with pytest.raises(ValueError, match="keep_last"):
        cat.expire_snapshots("segments", keep_last=0)


def test_vacuum_keep_all_is_noop(spark, tmp_path):
    root = str(tmp_path / "vk")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, ngrams=False)
    b = IndexBuilder(spark, root, cfg)
    b.build(_corpus(spark, 0, 120))
    cat = Catalog(root)
    vs = {t: cat.current_version(t) for t in cat.tables()}
    stats = b.vacuum(keep_last=10**6)
    assert stats["freed_bytes"] == 0 and stats["deleted_dirs"] == 0
    for t, v in vs.items():
        assert cat.current_version(t) == v
        assert cat.read(spark, t, version=v) is not None
