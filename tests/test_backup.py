"""Backup/restore (yase_spark.backup export_index / import_index):
an export is snapshot-consistent (current manifest's files only —
COW-superseded partition dirs and expired/orphan history never copied),
checksummed, and the restored root answers queries bit-identically,
time-travels as a single-snapshot table, and still RESUMES (carried
unit/fingerprint tags) — a rebuild over the same corpus is a noop."""

import json
import os

import pytest
from pyspark.sql import functions as F

from yase_spark.backup import export_index, import_index, verify_backup
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


@pytest.fixture(scope="module")
def cow_index(spark, tmp_path_factory):
    """Index with real copy-on-write history: build + append, so the
    current manifest lists a superseded-partition exclusion — the bytes
    an export must NOT copy."""
    root = str(tmp_path_factory.mktemp("bk") / "src")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=32,
                      ngrams=False, merge_cap=50, block_size=16)
    b = IndexBuilder(spark, root, cfg)
    b.build(_corpus(spark, 0, 300))
    b.append(_corpus(spark, 300, 400))  # bucket-COW commit with excludes
    return root, cfg


def test_export_skips_superseded_partitions(spark, cow_index, tmp_path):
    root, cfg = cow_index
    dest = str(tmp_path / "backup")
    summary = export_index(root, dest)

    cat = Catalog(root)
    m = cat._manifest("segments")
    excluded = [
        (e["path"], f"{col}={v}")
        for e in m["data_dirs"]
        if not isinstance(e, str)
        for col, vals in (e.get("exclude") or {}).items()
        for v in vals
    ]
    # exclusions name affected buckets per prior dir whether or not that
    # dir physically holds them — the export claim is about the ones
    # that DO exist on disk (superseded bytes)
    present = [
        (relp, part) for relp, part in excluded
        if os.path.isdir(os.path.join(root, "segments", relp, part))
    ]
    assert present, "fixture must produce physically superseded partitions"
    for relp, part in present:
        assert not os.path.exists(os.path.join(dest, "segments", relp, part))
    # the skipped bytes are real savings
    assert summary["total_bytes"] > 0
    assert summary["tables"]["segments"]["source_version"] >= 2

    # refuses a non-empty destination
    with pytest.raises(FileExistsError):
        export_index(root, dest)


def test_restore_reads_identically_and_resumes(spark, cow_index, tmp_path):
    root, cfg = cow_index
    dest = str(tmp_path / "bk2")
    export_index(root, dest)
    restored = str(tmp_path / "restored")
    import_index(dest, restored)

    src_rd = IndexReader(spark, root, cfg)
    dst_rd = IndexReader(spark, restored, cfg)
    for q in ("gamma alpha3", "beta7 delta2", "zzz_absent"):
        assert dst_rd.topk(q, 10, use_wand=False) == src_rd.topk(
            q, 10, use_wand=False
        ), q
    # postings payloads byte-identical
    cat_s, cat_d = Catalog(root), Catalog(restored)
    segs = lambda c: sorted(  # noqa: E731
        (r["term"], r["shard"], bytes(r["payload"]))
        for r in c.read(spark, "segments")
        .select("term", "shard", "payload").collect()
    )
    assert segs(cat_d) == segs(cat_s)
    # restored table is a single snapshot (version 1) with carried tags
    assert cat_d.current_version("segments") == 1
    src_units = {
        t.get("unit") for t in cat_s.committed_tags("segments") if t.get("unit")
    }
    dst_units = {
        t.get("unit") for t in cat_d.committed_tags("segments") if t.get("unit")
    }
    assert src_units <= dst_units

    # resume: rebuilding the ORIGINAL corpus over the restored root is a
    # noop (the carried fingerprint makes build_index recognize it)
    full = _corpus(spark, 0, 300).unionByName(_corpus(spark, 300, 400))
    summary = IndexBuilder(spark, restored, cfg).append(full)
    assert summary.get("noop") or summary.get("appended", 1) == 0


def test_backup_verification_catches_drift(spark, cow_index, tmp_path):
    root, _cfg = cow_index
    dest = str(tmp_path / "bk3")
    export_index(root, dest)
    verify_backup(dest)  # pristine passes

    with open(os.path.join(dest, "backup-manifest.json")) as f:
        files = json.load(f)["files"]
    victim = next(
        rel for rel in sorted(files) if rel.endswith(".parquet")
    )
    p = os.path.join(dest, victim)
    blob = bytearray(open(p, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(p, "wb").write(bytes(blob))  # same size, flipped bit

    with pytest.raises(RuntimeError, match="checksum drift"):
        import_index(dest, str(tmp_path / "never"))
    assert not os.path.exists(str(tmp_path / "never"))

    os.remove(p)
    with pytest.raises(RuntimeError, match="missing"):
        verify_backup(dest)
