"""Iceberg-shaped catalog semantics (SURVEY.md §0 hard part 3): snapshot
append, time travel, tag-based resume bookkeeping, commit atomicity."""

from yase_spark.catalog import Catalog


def test_snapshot_append_and_time_travel(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    df1 = spark.createDataFrame([(1, "a")], "id long, v string")
    df2 = spark.createDataFrame([(2, "b")], "id long, v string")

    v1 = cat.write("t", df1, mode="overwrite", tag={"unit": "u1"})
    v2 = cat.write("t", df2, mode="append", tag={"unit": "u2"})
    assert (v1, v2) == (1, 2)

    assert cat.read(spark, "t").count() == 2
    assert cat.read(spark, "t", version=1).count() == 1  # time travel

    tags = cat.committed_tags("t")
    assert {t["unit"] for t in tags} == {"u1", "u2"}

    # overwrite resets lineage: older snapshots no longer in current tags
    cat.write("t", df1, mode="overwrite", tag={"unit": "u3"})
    assert {t["unit"] for t in cat.committed_tags("t")} == {"u3"}
    assert cat.read(spark, "t").count() == 1


def test_orphan_data_dir_is_invisible(spark, tmp_path):
    """A crash between data write and manifest commit must not change
    reads — the manifest is the atomicity point."""
    import os

    cat = Catalog(str(tmp_path))
    cat.write("t", spark.createDataFrame([(1,)], "id long"))
    # simulate a torn write: orphan dir full of parquet, no commit
    orphan = os.path.join(str(tmp_path), "t", "data", "orphan-uuid")
    spark.createDataFrame([(99,), (98,)], "id long").write.parquet(orphan)
    assert cat.read(spark, "t").count() == 1


def test_missing_table_raises(spark, tmp_path):
    cat = Catalog(str(tmp_path))
    assert not cat.exists("nope")
    try:
        cat.read(spark, "nope")
        raise AssertionError("expected FileNotFoundError")
    except FileNotFoundError:
        pass


def test_compact_collapses_dirs_and_preserves_tags(spark, tmp_path):
    """catalog.compact (Iceberg rewrite_data_files parity): after
    build + COW append, compaction must collapse the read plan to one
    data dir, keep table contents identical, and carry the collapsed
    history's unit tags so append idempotence survives."""
    from yase_spark.catalog import Catalog
    from yase_spark.config import IndexConfig
    from yase_spark.index import IndexBuilder

    schema = "repo string, path string, commit string, lang string, content string"
    base = [("r", f"{i:03d}", "c", "py", f"alpha{i % 11} beta") for i in range(150)]
    delta = [("r", f"9{i:02d}", "c", "py", "beta gamma") for i in range(20)]
    root = str(tmp_path / "idx")
    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, term_buckets=16,
                      ngrams=False)
    b = IndexBuilder(spark, root, cfg)
    b.build(spark.createDataFrame(base, schema=schema))
    b.append(spark.createDataFrame(delta, schema=schema))

    cat = Catalog(root)
    before = {
        (r["term"], r["df"], r["cf"])
        for r in cat.read(spark, "segments").select("term", "df", "cf").collect()
    }
    tags_before = {t.get("unit") for t in cat.committed_tags("segments")}
    assert len(cat._manifest("segments")["data_dirs"]) > 1

    cat.compact(spark, "segments")
    m = cat._manifest("segments")
    assert len(m["data_dirs"]) == 1, "compaction must collapse to one dir"
    after = {
        (r["term"], r["df"], r["cf"])
        for r in cat.read(spark, "segments").select("term", "df", "cf").collect()
    }
    assert after == before, "compaction changed table contents"
    tags_after = {t.get("unit") for t in cat.committed_tags("segments")}
    assert tags_before <= tags_after, "collapsed history tags were lost"

    # idempotence survives: re-appending the same delta is still a no-op
    s = IndexBuilder(spark, root, cfg).append(
        spark.createDataFrame(delta, schema=schema)
    )
    assert s["noop"]


def test_snapshot_history_and_time_travel(spark, tmp_path):
    """Iceberg snapshots + VERSION/TIMESTAMP AS OF parity: appends and
    partition-replace commits each add a history row; reading an old
    version reproduces the table exactly as of that commit (including
    BEFORE a partition replace — the old manifest has no exclusions);
    version_as_of resolves a wall-clock timestamp to the right id."""
    import time

    from pyspark.sql import functions as F

    from yase_spark.catalog import Catalog

    cat = Catalog(str(tmp_path))
    df = spark.range(10).withColumn("b", F.pmod("id", F.lit(2)).cast("int"))
    v1 = cat.write("t", df, partition_by=["b"])
    t1 = time.time()
    v2 = cat.write("t", spark.range(10, 15).withColumn(
        "b", F.lit(0).cast("int")), mode="append", partition_by=["b"])
    v3 = cat.write("t", spark.range(100, 103).withColumn(
        "b", F.lit(1).cast("int")), mode="append", partition_by=["b"],
        replace_partitions={"b": [1]})

    hist = cat.snapshots("t")
    assert [s["version"] for s in hist] == [v1, v2, v3]
    assert [s["operation"] for s in hist] == ["overwrite", "append", "replace"]

    ids = lambda v=None: sorted(
        r["id"] for r in cat.read(spark, "t", version=v).collect())
    assert ids(v1) == list(range(10))
    assert ids(v2) == list(range(15))
    # current: b=1 partition replaced by 100..102; b=0 rows survive
    assert ids() == [0, 2, 4, 6, 8] + list(range(10, 15)) + [100, 101, 102]
    # time travel back across the replace sees the pre-replace rows
    assert ids(v2) == list(range(15))
    assert cat.version_as_of("t", t1) == v1
    assert cat.version_as_of("t", time.time()) == v3


def test_rollback_restores_snapshot_and_keeps_history(spark, tmp_path):
    """Iceberg rollback_to_snapshot: after append(s), rolling back to v1
    must serve exactly v1's rows under the CURRENT version, move history
    forward (new version, old ones still time-travelable), and a
    rollback to a never-existing version must refuse."""
    import pytest as _pytest

    from yase_spark.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    v1 = cat.write("t", df1, mode="overwrite")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    v2 = cat.write("t", df2, mode="append")
    assert {r["id"] for r in cat.read(spark, "t").collect()} == {1, 2, 3}

    v3 = cat.rollback("t", v1)
    assert v3 == v2 + 1 and cat.current_version("t") == v3
    assert {r["id"] for r in cat.read(spark, "t").collect()} == {1, 2}
    # history intact: the rolled-back-over append still time-travels
    assert {r["id"] for r in cat.read(spark, "t", version=v2).collect()} == {1, 2, 3}
    # roll FORWARD again (rollback is just another commit)
    v4 = cat.rollback("t", v2)
    assert {r["id"] for r in cat.read(spark, "t").collect()} == {1, 2, 3}
    assert v4 == v3 + 1

    with _pytest.raises(FileNotFoundError):
        cat.rollback("t", 99)


def test_index_root_is_relocatable(spark, tmp_path):
    """Manifests store table-relative data paths, so a moved (backed
    up / restored) index root reads identically at its new location —
    including time-travel and partitioned (bucket) tables."""
    import os
    import shutil

    from yase_spark.config import IndexConfig
    from yase_spark.index import IndexBuilder
    from yase_spark.query import IndexReader

    schema = "repo string, path string, commit string, lang string, content string"
    rows = [("r", f"{i:03d}", "c", "py", f"alpha{i % 7} beta gamma")
            for i in range(80)]
    corpus = spark.createDataFrame(rows, schema=schema)
    old = str(tmp_path / "a" / "ix")
    cfg = IndexConfig(build_groups=1, shuffle_partitions=4, ngrams=False)
    b = IndexBuilder(spark, old, cfg)
    b.build(corpus.filter("path < '060'"))
    b.append(corpus.filter("path >= '060'"))
    want = IndexReader(spark, old, cfg).topk("alpha3 gamma", 5)
    v1 = Catalog(old).read(spark, "segments", version=1).count()

    new = str(tmp_path / "b" / "moved")
    os.makedirs(os.path.dirname(new), exist_ok=True)
    shutil.move(old, new)

    IndexReader.clear_shared_meta()
    assert IndexReader(spark, new, cfg).topk("alpha3 gamma", 5) == want
    cat = Catalog(new)
    assert cat.read(spark, "segments", version=1).count() == v1  # time-travel
    assert cat.read(spark, "docs").count() == 80
