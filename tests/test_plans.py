"""Physical-plan gates (SURVEY.md §4.1): the plans we rely on at scale
must actually materialize — predicate pushdown to parquet, partition
pruning on the bucket layout, broadcast joins for small sides, no
row-at-a-time Python eval nodes."""

from pyspark.sql import functions as F

from yase_spark.catalog import Catalog


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_segment_fetch_pushdown_and_pruning(spark, tiny_index):
    root, cfg, _ = tiny_index
    segs = Catalog(root).read(spark, "segments")
    q = segs.filter((F.col("bucket").isin([3, 7])) & (F.col("term") == "getusername"))
    plan = _plan(q)
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:200], (
        "term predicate must reach the parquet scan:\n" + plan[:1500]
    )
    # bucket is a Hive-style partition column -> pruned at planning time
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_local_segments_group_pruning(spark, tiny_index):
    root, cfg, _ = tiny_index
    staged = Catalog(root).read(spark, "local_segments")
    q = staged.filter(F.col("grp") == 1)
    plan = _plan(q)
    assert "PartitionFilters" in plan and "grp" in plan.split("PartitionFilters")[1][:200]


def test_docs_scan_column_pruning(spark, tiny_index):
    root, cfg, _ = tiny_index
    docs = Catalog(root).read(spark, "docs").select("doc_id", "doc_len")
    plan = _plan(docs)
    seg = plan.split("ReadSchema")[1][:200]
    assert "doc_id" in seg and "doc_len" in seg
    assert "content_sha256" not in seg, "unused columns must not be read"


def test_hydrate_uses_broadcast_join(spark, tiny_index):
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    df = rd.topk_df("getusername", 5, hydrate=True)
    assert "BroadcastHashJoin" in _plan(df)


def test_tf_path_partial_agg_and_arrow(spark, tiny_corpus):
    """The TF aggregation must keep its map-side combine (partial_count)
    and the tokenizer must run as an Arrow-vectorized UDF node
    (ArrowEvalPython), never row-at-a-time (BatchEvalPython)."""
    from yase_spark.corpus import explode_terms, ingest
    from yase_spark.stats import term_frequencies

    docs, tokenized, base = ingest(tiny_corpus)
    tf = term_frequencies(explode_terms(tokenized))
    plan = _plan(tf)
    assert "partial_count" in plan, "map-side partial aggregation missing"
    assert "ArrowEvalPython" in plan, "tokenizer not Arrow-vectorized"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF in plan"
    base.unpersist()
