#!/usr/bin/env python
"""Fine-grained per-action timing of the frozen bench.py workload
(guide §1: measure first). Mirrors bench.py phase by phase but wraps
every individual action in a labelled timer, so each phase's seconds
can be attributed to a specific operator call. Prints one JSON line:
{"steps": {label: sec, ...}, "phases": {...}}.

This file is NOT the driver metric — bench.py stays frozen; numbers
cited in OPTIMIZATION_r06.md come from here for attribution and from
bench.py for the headline.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from contextlib import contextmanager

STEPS: dict[str, float] = {}
PHASES: dict[str, float] = {}
_SPARK = None


@contextmanager
def T(label: str):
    global STEPS
    if _SPARK is not None:
        _SPARK.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    yield
    STEPS[label] = STEPS.get(label, 0.0) + (time.perf_counter() - t0)
    if _SPARK is not None:
        _SPARK.sparkContext.setJobDescription(None)


def main() -> None:
    global _SPARK
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_synth = int(os.environ.get("YASE_BENCH_DOCS", "20000"))

    from pyspark.sql import functions as F

    from yase_spark.config import IndexConfig
    from yase_spark.index import build_index
    from yase_spark.query import IndexReader
    from yase_spark.session import get_spark
    from yase_spark.synth import corpus_df, reference_query_set

    spark = get_spark(cpus=cpus, app="yase-bench-extra", shuffle_partitions=2 * cpus)
    _SPARK = spark
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("path"),
        F.lit("head").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    n_docs_sf = docs.count()
    cfg = IndexConfig(build_groups=4, shuffle_partitions=2 * cpus, hot_term_df=200_000)
    root = tempfile.mkdtemp(prefix="yase_bx_")

    p0 = time.perf_counter()
    with T("build_index_docs"):
        s1 = build_index(spark, corpus, root, cfg)
    PHASES["index_build_docs"] = time.perf_counter() - p0
    print("build phases:", json.dumps(s1["phases"]), file=sys.stderr)

    # ---- phase 2 ----------------------------------------------------
    p0 = time.perf_counter()
    rd = IndexReader(spark, root, cfg)
    with T("q.segments_sample"):
        sample = [
            r["term"]
            for r in rd.cat.read(spark, "segments")
            .orderBy(F.desc("df"))
            .limit(40)
            .select("term")
            .collect()
        ]
    queries = []
    for i in range(0, len(sample) - 2, 3):
        queries.append(
            {"query_id": f"b{i}", "kind": "topk", "query": " ".join(sample[i : i + 3]), "k": 10}
        )
        queries.append(
            {"query_id": f"a{i}", "kind": "bool_and", "query": " ".join(sample[i : i + 2])}
        )
    with T("q.run_query_set"):
        rd.run_query_set(queries, reps=3)
    with T("q.cold"):
        for q in [x for x in queries if x["kind"] == "topk"][:8]:
            rd._cache.clear()
            rd._row_cache.clear()
            rd._df_cache.clear()
            rd.topk(q["query"], q.get("k", 10))
    PHASES["query_set+cold"] = time.perf_counter() - p0

    # ---- phase 3 ----------------------------------------------------
    p0 = time.perf_counter()
    synth_dir = tempfile.mkdtemp(prefix="yase_bx_corpus_") + "/corpus"
    with T("synth_stage"):
        corpus_df(spark, n_synth, partitions=2 * cpus).write.mode("overwrite").parquet(synth_dir)
    synth = spark.read.parquet(synth_dir)
    root2 = tempfile.mkdtemp(prefix="yase_bx_synth_")
    cfg2 = IndexConfig(build_groups=2, shuffle_partitions=2 * cpus)
    with T("build_index_synth"):
        build_index(spark, synth, root2, cfg2)
    rd2 = IndexReader(spark, root2, cfg2)
    qs = [q for q in reference_query_set() if q["kind"] == "topk"][:5]
    with T("synth_wand_check"):
        for q in qs:
            assert rd2.topk(q["query"], q["k"]) == rd2.topk(
                q["query"], q["k"], use_wand=False
            )
    PHASES["index_build_synth"] = time.perf_counter() - p0

    # ---- phase 4: pipeline_ops --------------------------------------
    from yase_spark.neardup import dup_groups, minhash_lsh_pairs, simhash_pairs
    from yase_spark.similarity import lsh_ann_topk
    from yase_spark.textstats import doc_fingerprints, lang_id, quality_scores

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    p0 = time.perf_counter()
    with T("p.minhash_lsh_pairs"):
        nd_pairs = minhash_lsh_pairs(docs, threshold=0.5, rows_per_band=2)
        nd_pairs.count()
    with T("p.dup_groups"):
        dup_groups(docs.select("doc_id"), nd_pairs).filter(~F.col("keep")).count()
    with T("p.simhash_pairs"):
        simhash_pairs(docs).count()
    with T("p.lsh_ann_topk"):
        lsh_ann_topk(emb).count()
    with T("p.lang_id"):
        lang_id(docs).count()
    with T("p.quality_scores"):
        quality_scores(docs).count()
    with T("p.doc_fingerprints"):
        doc_fingerprints(docs).count()
    PHASES["pipeline_ops"] = time.perf_counter() - p0

    # ---- phase 5: positions + serving -------------------------------
    from yase_spark.positions import build_positions

    p0 = time.perf_counter()
    with T("positions_build"):
        build_positions(spark, root, corpus, cfg)
    PHASES["positions_build"] = time.perf_counter() - p0

    from yase_spark.cooccur import collocations, related_terms
    from yase_spark.expand import build_term_dictionary
    from yase_spark.suggest import build_deletion_index, spell_suggest

    p0 = time.perf_counter()
    with T("s.build_term_dictionary"):
        build_term_dictionary(spark, root)
    with T("s.build_deletion_index"):
        build_deletion_index(spark, root)
    with T("s.phrase"):
        for i in range(0, 12, 2):
            rd.phrase(" ".join(sample[i : i + 2]), slop=1)
    with T("s.highlight_topk"):
        rd.highlight_topk(" ".join(sample[:3]), k=10, width=20)
    with T("s.mlt"):
        src_text = docs.select("text").limit(1).collect()[0]["text"]
        rd.more_like_this(src_text, k=10, m=5)
    with T("s.spell_suggest"):
        typos = [t[:-1] for t in sample[:6] if len(t) > 3]
        spell_suggest(spark, root, typos, k=3).count()
    with T("s.related_terms"):
        dic = rd.cat.read(spark, "dictionary")
        related_terms(docs, sample[0], dictionary=dic, k=20).count()
    with T("s.collocations"):
        collocations(docs, k=20).count()
    PHASES["serving_ops"] = time.perf_counter() - p0

    # ---- phase 5b: trigram ------------------------------------------
    from yase_spark.grep import GrepReader, build_trigrams

    p0 = time.perf_counter()
    with T("g.build_trigrams"):
        build_trigrams(spark, root, corpus, cfg)
    grd = GrepReader(spark, root, corpus, cfg)
    with T("g.grep_lit"):
        grd.grep(sample[30]).count()
    with T("g.grep_re"):
        grd.grep(f"{sample[1][:4]}[a-z]* {sample[2][:3]}", regex=True).count()
    PHASES["trigram_grep"] = time.perf_counter() - p0

    # ---- phase 6: curation ------------------------------------------
    from yase_spark.curation import (
        chunk_docs,
        decontaminate,
        pack_sequences,
        stratified_sample,
    )

    p0 = time.perf_counter()
    bench_set = docs.filter(F.col("doc_id") % 97 == 0)
    with T("c.decontaminate"):
        decontaminate(docs, bench_set, n=8).filter("contaminated").count()
    with T("c.chunk_docs"):
        chunk_docs(docs, chunk=64, stride=48).count()
    with T("c.pack_sequences"):
        pack_sequences(docs, max_tokens=512, n_groups=64).agg(
            F.countDistinct("bin_id")
        ).collect()
    with T("c.stratified_sample"):
        stratified_sample(docs, {"en": 0.5, "de": 0.25, "fr": 1.0}).count()
    PHASES["curation_ops"] = time.perf_counter() - p0

    # ---- phase 7: reindex -------------------------------------------
    from yase_spark.reindex import reindex as reindex_op

    p0 = time.perf_counter()
    with T("reindex"):
        rroot = tempfile.mkdtemp(prefix="yase_bx_reidx_") + "/idx"
        reindex_op(spark, root, rroot, block_size=64, term_buckets=8)
    PHASES["reindex"] = time.perf_counter() - p0

    # ---- phase 8: round4c -------------------------------------------
    from yase_spark.aggs import date_histogram_pipeline, rare_terms
    from yase_spark.geo import geo_distance_topk, geo_within, geotile_grid
    from yase_spark.similarity import semantic_dedup
    from yase_spark.sortindex import build_sort_index

    p0 = time.perf_counter()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    with T("r4c.date_histogram_pipeline"):
        date_histogram_pipeline(events).count()
    with T("r4c.rare_terms"):
        rare_terms(docs, "[^a-z0-9]+", max_doc_count=3, shingles=2).count()
    with T("r4c.geo_distance_topk"):
        geo_distance_topk(docs, 10.0, 20.0, k=10).count()
    with T("r4c.geo_within"):
        geo_within(docs, 10.0, 20.0, 2000.0).count()
    with T("r4c.geotile_grid"):
        geotile_grid(docs, zoom=4).count()
    with T("r4c.semantic_dedup"):
        semantic_dedup(emb, threshold=0.45, n_clusters=16).filter("NOT keep").count()
    with T("r4c.build_sort_index"):
        build_sort_index(spark, root, "doc_len", files=8)
    with T("r4c.topk_sort_field"):
        et = rd.topk_sort_field(None, "doc_len", k=10)
        assert et.count() == 10
    with T("r4c.phrase_prefix"):
        rd.phrase_prefix("table ha", max_expansions=1000)
    PHASES["round4c_ops"] = time.perf_counter() - p0

    # ---- phase 9: round4e -------------------------------------------
    from yase_spark.aggs import (
        adjacency_matrix,
        bucket_pipeline,
        multi_terms,
        percentile_ranks,
    )
    from yase_spark.curation import policy_flags
    from yase_spark.expand import build_stems
    from yase_spark.mixing import importance_weights

    p0 = time.perf_counter()
    with T("r4e.adjacency_matrix"):
        adjacency_matrix(docs, {
            "en": "lang = 'en'", "big": "n_chars > 400",
            "sparky": "text LIKE '%spark%'",
        }).count()
    with T("r4e.multi_terms"):
        multi_terms(docs, ["lang", "source"], size=10).count()
    with T("r4e.bucket_pipeline"):
        bucket_pipeline(
            docs, "source", "avg(n_chars)", having="metric >= 280",
            order_by=[("metric", False)], size=5,
        ).count()
    with T("r4e.percentile_ranks"):
        percentile_ranks(docs, "lang", "n_chars", [100.0, 500.0, 1000.0]).count()
    with T("r4e.importance_weights"):
        importance_weights(docs, "lang = 'en'").count()
    with T("r4e.policy_flags"):
        policy_flags(docs).count()
    with T("r4e.build_stems"):
        build_stems(spark, root)
    with T("r4e.stem_topk"):
        rd.stem_topk("tables queries", k=10)
    with T("r4e.topk_decay"):
        rd.topk_decay(
            "table hash merge", "cast(doc_id as double)",
            origin=0.0, scale=2000.0, kind="gauss",
        ).count()
    with T("r4e.topk_random"):
        rd.topk_random("table hash merge", seed=7, field="doc_id").count()
    with T("r4e.topk_terms_set"):
        rd.topk_terms_set("table hash merge scan", "1 + pmod(doc_id, 3)").count()
    with T("r4e.topk_boosting"):
        rd.topk_boosting("table hash merge", "slow", negative_boost=0.25).count()
    PHASES["round4e_ops"] = time.perf_counter() - p0

    # ---- phase 10: round4f ------------------------------------------
    from yase_spark.aggs import auto_date_histogram, top_metrics, weighted_avg
    from yase_spark.curation import line_dedup
    from yase_spark.neardup import dup_spans

    p0 = time.perf_counter()
    with T("r4f.dup_spans"):
        dup_spans(docs, k=20).agg(
            F.sum("n_dup_windows").alias("w"), F.sum("dup_chars").alias("c")
        ).collect()
    with T("r4f.line_dedup"):
        word_lines = docs.select(
            "doc_id", F.expr("replace(text, ' ', '\n')").alias("text")
        )
        line_dedup(word_lines, min_docs=3000).agg(F.sum("n_removed")).collect()
    with T("r4f.weighted_avg"):
        weighted_avg(docs, ["lang"], "n_chars", "doc_id % 7 + 1").count()
    with T("r4f.top_metrics"):
        top_metrics(docs, ["lang"], "n_chars", ["source", "doc_id"], size=2).count()
    with T("r4f.auto_date_histogram"):
        auto_date_histogram(events, target_buckets=20).count()
    with T("r4f.dis_max_topk"):
        rd.dis_max_topk(["table hash", "window spark"], k=10, tie_breaker=0.3).count()
    with T("r4f.pinned_topk"):
        rd.pinned_topk([3, 7], "table hash merge", k=10).count()
    with T("r4f.match_bool_prefix"):
        rd.match_bool_prefix("table ha", k=10)
    with T("r4f.topk_rank_feature"):
        rd.topk_rank_feature("table hash merge", "doc_len", k=10).count()
    with T("r4f.topk_cached"):
        rd.topk_cached("table hash merge", 10)
        rd.topk_cached("table hash merge", 10)
    PHASES["round4f_ops"] = time.perf_counter() - p0

    # ---- phase 11: round5 -------------------------------------------
    from yase_spark.aggs import (
        bucket_stats,
        cumulative_cardinality,
        dispersion_stats,
        matrix_stats,
        rate_agg,
        string_stats,
    )
    from yase_spark.fields import fields_combined_topk
    from yase_spark.geo import geo_bounds, geo_centroid
    from yase_spark.hnsw import hnsw_ann_topk

    p0 = time.perf_counter()
    froot = tempfile.mkdtemp(prefix="yase_bx_f_")
    fcorpus = docs.select(
        F.lit("docs").alias("repo"),
        F.lpad(F.col("doc_id").cast("string"), 10, "0").alias("path"),
        F.lit("head").alias("commit"),
        F.col("lang"),
        F.concat_ws(" ", "source", "lang").alias("content"),
    )
    with T("r5.build_index_fields"):
        build_index(spark, fcorpus, froot, cfg)
    rdf = IndexReader(spark, froot, cfg)
    with T("r5.fields_combined_topk"):
        fields_combined_topk([(rd, 1.0), (rdf, 2.0)], "table hash src3", k=10).count()
    with T("r5.span_multi_near"):
        rd.span_multi_near("prefix", "s", ["hash"], slop=1)
    with T("r5.span_within"):
        rd.span_within("zone", ["copy", "lock"], slop=4)
    with T("r5.span_containing"):
        rd.span_containing(["copy", "lock"], "zone", slop=4)
    with T("r5.hnsw_ann_topk"):
        hnsw_ann_topk(emb, n_queries=8, k=10, n_centroids=16).count()
    from yase_spark.similarity import maxsim_topk

    with T("r5.maxsim_topk"):
        maxsim_topk(emb, vecs_per_doc=5, n_queries=4, k=10).count()
    from yase_spark.similarity import hard_negatives
    from yase_spark.textstats import ppl_buckets

    with T("r5.hard_negatives"):
        hard_negatives(emb, n_queries=4, k=10, hi=0.35).count()
    with T("r5.ppl_buckets"):
        ppl_buckets(docs).filter(F.col("bucket") == "head").count()
    with T("r5.matrix_stats"):
        matrix_stats(docs, "a", "b", expr_a="n_chars % 97",
                     expr_b="(doc_id * 7 + n_chars) % 89").count()
    with T("r5.string_stats"):
        string_stats(docs, "text").count()
    with T("r5.dispersion_stats"):
        dispersion_stats(docs, "n_chars").count()
    with T("r5.bucket_stats"):
        bucket_stats(events, hours=1).count()
    with T("r5.rate_agg"):
        rate_agg(events, hours=1, unit_minutes=1).count()
    with T("r5.cumulative_cardinality"):
        cumulative_cardinality(events, hours=1, key="user_id").count()
    with T("r5.geo_bounds"):
        geo_bounds(docs).count()
    with T("r5.geo_centroid"):
        geo_centroid(docs).count()
    with T("r5.sorted_cursor"):
        page1 = rd.topk_sort_field(None, "doc_len", k=10).collect()
        cur = (page1[-1]["doc_len"], page1[-1]["doc_id"])
        rd.topk_sort_field(None, "doc_len", k=10, after=cur).count()
    PHASES["round5_ops"] = time.perf_counter() - p0

    # ---- round5b -----------------------------------------------------
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

    p0 = time.perf_counter()
    with T("r5b.intervals_allof"):
        rd.intervals(
            {"all_of": {"ordered": True, "max_gaps": 3, "intervals": [
                {"match": {"query": "table"}},
                {"match": {"query": "hash"}},
                {"match": {"query": "merge"}},
            ]}}
        )
    with T("r5b.intervals_anyof"):
        rd.intervals({"any_of": {"intervals": [
            {"match": {"query": "table hash", "ordered": True, "max_gaps": 0}},
            {"match": {"query": "group key", "max_gaps": 2}},
        ]}})
    with T("r5b.topk_distance_feature"):
        rd.topk_distance_feature(
            "table hash merge", "doc_len", origin=600.0, pivot=200.0, k=10
        ).count()
    with T("r5b.filters_agg"):
        filters_agg(docs, {"english": "lang = 'en'", "long": "n_chars >= 700"}).count()
    with T("r5b.missing_agg"):
        missing_agg(docs, "nullif(regexp_extract(text, 'vector[a-z]*', 0), '')").count()
    with T("r5b.categorize_text"):
        categorize_text(docs, "text").count()
    with T("r5b.boxplot_agg"):
        boxplot_agg(docs, "n_chars").count()
    with T("r5b.moving_fn"):
        moving_fn(events, hours=1, window=3, alpha=0.3).count()
    with T("r5b.bucket_script"):
        bucket_script(events, hours=1).count()
    with T("r5b.geo_distance_rings"):
        geo_distance_rings(docs, 10.0, 20.0, [3000.0, 8000.0, 15000.0]).count()
    with T("r5b.contexts_complete"):
        contexts_complete(docs, "ta", {"en": 2.0, "de": 1.5}, k=10).count()
    with T("r5b.frequent_item_sets"):
        frequent_item_sets(docs, vocab_size=12, min_support=0.05).count()
    PHASES["round5b_ops"] = time.perf_counter() - p0

    # ---- round5c -----------------------------------------------------
    from yase_spark.aggs import (
        ip_range_agg,
        percentiles_bucket,
        random_sampler_agg,
    )
    from yase_spark.neardup import dedup_substrings

    p0 = time.perf_counter()
    with T("r5c.dedup_substrings"):
        dedup_substrings(docs, k=25).agg(F.sum("removed_chars")).collect()
    with T("r5c.ip_range_agg"):
        ip_range_agg(docs, [(None, "64.0.0.0"), ("64.0.0.0", "192.0.0.0"),
                            ("128.0.0.0", None)]).count()
    with T("r5c.percentiles_bucket"):
        percentiles_bucket(events, hours=1).count()
    with T("r5c.random_sampler_agg"):
        random_sampler_agg(docs, 0.25).count()
    PHASES["round5c_ops"] = time.perf_counter() - p0

    # ---- round5d -----------------------------------------------------
    from yase_spark.aggs import moving_percentiles, sampler_agg
    from yase_spark.fields import runtime_field_topk
    from yase_spark.geo import geo_polygon
    from yase_spark.lookup import mget, terms_lookup
    from yase_spark.mixing import sliced_scroll
    from yase_spark.nested import nested_match

    p0 = time.perf_counter()
    with T("r5d.mget"):
        mget(docs, [5, 10**12 + 7, 1, 42]).count()
    with T("r5d.terms_lookup"):
        terms_lookup(docs, 7, max_terms=12, k=15).count()
    with T("r5d.nested_match"):
        nested_match(docs, min_len=6, prefix="s", k=15).count()
    with T("r5d.runtime_field_topk"):
        runtime_field_topk(
            docs,
            {
                "n_tokens": "size(filter(split(lower(text), '[^a-z0-9]+'), "
                "t -> t <> ''))",
                "cpt": "cast(n_chars as double) / "
                "cast(greatest(n_tokens, 1) as double)",
            },
            where="n_tokens >= 20",
            order_by="cpt",
            k=15,
        ).count()
    with T("r5d.sliced_scroll"):
        sliced_scroll(docs, 2, 5).count()
    with T("r5d.geo_polygon"):
        geo_polygon(
            docs,
            [(4000, 3000), (12000, 2000), (16000, 9000), (10000, 15000),
             (3000, 11000)],
            k=25,
        ).count()
    with T("r5d.moving_percentiles"):
        moving_percentiles(events, hours=1, window=4).count()
    with T("r5d.sampler_agg"):
        sampler_agg(docs, ["spark", "window", "hash", "join"]).count()
    PHASES["round5d_ops"] = time.perf_counter() - p0

    # ---- round5e -----------------------------------------------------
    from yase_spark.features import sparse_vector_topk
    from yase_spark.geo import geo_line, geohash_grid
    from yase_spark.lookup import field_caps
    from yase_spark.qparse import render_template

    p0 = time.perf_counter()
    with T("r5e.sparse_vector_topk"):
        sparse_vector_topk(
            docs, {"spark": 2.0, "stream": 1.5, "window": 1.0, "vector": 0.5}
        ).count()
    with T("r5e.geohash_grid"):
        geohash_grid(docs, precision=3, size=20).count()
    with T("r5e.geo_line"):
        geo_line(docs, group_col="source", size=10).count()
    render_template("({{a}} OR {{b}}) AND table", {"a": "window", "b": "spark"})
    with T("r5e.field_caps"):
        field_caps(docs).count()
    from yase_spark.mixing import split_counts
    from yase_spark.neardup import dup_keep_best, jaccard_pairs

    with T("r5e.split_counts"):
        split_counts(docs, {"train": 0.9, "val": 0.05, "test": 0.05}).count()
    with T("r5e.dup_keep_best"):
        kb_docs = docs.filter("doc_id < 2000")
        dup_keep_best(
            kb_docs.select("doc_id"),
            jaccard_pairs(kb_docs, k=3, threshold=0.1),
            kb_docs.selectExpr("doc_id", "cast(n_chars as long) as q"),
        ).count()
    PHASES["round5e_ops"] = time.perf_counter() - p0

    out = {
        "steps": {k: round(v, 3) for k, v in sorted(STEPS.items(), key=lambda kv: -kv[1])},
        "phases": {k: round(v, 3) for k, v in PHASES.items()},
        "total_phases": round(sum(PHASES.values()), 3),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
