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
