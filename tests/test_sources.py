"""Corpus source connectors (yase_spark/sources.py): every format must
produce an IDENTICAL corpus — and therefore a bitwise-identical index
(doc ids mint from values only)."""

import pytest

from yase_spark.sources import infer_format, read_corpus, write_corpus


@pytest.fixture(scope="module")
def small_corpus(spark):
    from yase_spark.synth import corpus_df

    return corpus_df(spark, 120, partitions=4).persist()


def test_infer_format():
    assert infer_format("/x/corpus.jsonl") == "jsonl"
    assert infer_format("/x/a.ndjson") == "jsonl"
    assert infer_format("/x/b.csv") == "csv"
    assert infer_format("/x/dir") == "parquet"
    assert infer_format("/x/c.parquet") == "parquet"


@pytest.mark.parametrize("fmt", ["parquet", "jsonl", "csv"])
def test_roundtrip_exact(spark, small_corpus, tmp_path, fmt):
    """write -> read must preserve every row exactly — including
    content with newlines, quotes, and commas (the synth corpus has
    multi-line code-shaped content)."""
    p = str(tmp_path / f"c_{fmt}")
    write_corpus(small_corpus, p, fmt)
    back = read_corpus(spark, p, fmt)
    a = sorted(map(tuple, small_corpus.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_same_index_from_any_format(spark, small_corpus, tmp_path):
    """The acid test: building from the JSONL copy yields the same
    docs table and per-term dfs as building from parquet."""
    from pyspark.sql import functions as F

    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.query import IndexReader

    cfg = IndexConfig(build_groups=2, shuffle_partitions=8, hot_term_df=10**9)
    pq, js = str(tmp_path / "pq"), str(tmp_path / "js")
    write_corpus(small_corpus, pq + ".d", "parquet")
    write_corpus(small_corpus, js + ".d", "jsonl")
    build_index(spark, read_corpus(spark, pq + ".d", "parquet"), pq, cfg)
    build_index(spark, read_corpus(spark, js + ".d", "jsonl"), js, cfg)
    for t in ("docs",):
        a = sorted(map(tuple, IndexReader(spark, pq, cfg).cat.read(spark, t).collect()))
        b = sorted(map(tuple, IndexReader(spark, js, cfg).cat.read(spark, t).collect()))
        assert a == b
    dfa = sorted(map(tuple, IndexReader(spark, pq, cfg)._segments
                 .groupBy("term").agg(F.sum("df")).collect()))
    dfb = sorted(map(tuple, IndexReader(spark, js, cfg)._segments
                 .groupBy("term").agg(F.sum("df")).collect()))
    assert dfa == dfb


def test_missing_columns_raise(spark, tmp_path):
    p = str(tmp_path / "bad")
    spark.createDataFrame(
        [("r", "p")], "repo string, path string"
    ).write.parquet(p)
    with pytest.raises(ValueError, match="lacks required columns"):
        read_corpus(spark, p, "parquet")
