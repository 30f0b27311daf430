#!/usr/bin/env python
"""spark-submit entrypoint (BASELINE.json:14: "run via spark-submit
--py-files on a multi-executor cluster").

Packaging: ``yase_spark/`` is a plain pure-Python package (numpy/pandas/
pyarrow only — already on Spark workers), so cluster deployment is::

    cd /root/repo && zip -r yase_spark.zip yase_spark
    spark-submit --py-files yase_spark.zip yase_submit.py build \
        --corpus <parquet-or-table> --index <warehouse-path> [--groups 16]
    spark-submit --py-files yase_spark.zip yase_submit.py query \
        --index <warehouse-path> --q "getUserName json" --k 10
    spark-submit --py-files yase_spark.zip yase_submit.py synth \
        --docs 50000 --out <parquet-path>

On a cluster the session comes from spark-submit's own conf (master,
executor counts); the local[-N] factory is only a sandbox fallback.
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName(f"yase-{args.cmd}")
    if args.local_cpus:
        b = b.master(f"local[{args.local_cpus}]").config(
            "spark.sql.shuffle.partitions", str(2 * args.local_cpus)
        )
    return b.config("spark.sql.adaptive.enabled", "true").config(
        "spark.sql.execution.arrow.pyspark.enabled", "true"
    ).getOrCreate()


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="yase_submit")
    p.add_argument(
        "cmd",
        choices=[
            "build", "positions", "trigrams", "dictionary", "query", "synth",
            "bench", "neardup", "ann", "stream", "compact", "delete", "grep",
            "info", "synonyms", "aggs", "suggest", "force-merge", "vacuum",
            "reindex", "alias", "export", "restore", "rank-eval", "bpe",
            "rollover", "geo", "sort-index", "stems", "replicate",
            "transform",
        ],
    )
    p.add_argument(
        "--files", type=int, default=None,
        help="sort-index: number of sorted range files (default: sized "
        "from the docs count)",
    )
    p.add_argument(
        "--point", help="geo: query point as 'lat,lon'", default="0,0"
    )
    p.add_argument(
        "--radius-km", type=float, help="geo --op within: radius in km"
    )
    p.add_argument(
        "--bbox", help="geo --op bbox: 'min_lat,max_lat,min_lon,max_lon'"
    )
    p.add_argument(
        "--zoom", type=int, default=4, help="geo --op grid: geotile zoom level"
    )
    p.add_argument(
        "--merges", type=int, default=1000,
        help="bpe: number of merge rounds to learn",
    )
    p.add_argument(
        "--encode", action="store_true",
        help="bpe: also encode the corpus and report per-doc token counts",
    )
    p.add_argument(
        "--qrels",
        help="rank-eval: parquet of graded judgments "
        "(query_id int, doc_id long, grade int)",
    )
    p.add_argument(
        "--queries-file",
        help="rank-eval: JSON object {query_id: \"query string\", ...}",
    )
    p.add_argument(
        "--groups-file",
        help="synonyms: JSON file of synonym groups [[\"a\",\"b\"],...] "
        "(Solr expand=true semantics; entries are analyzer-applied)",
    )
    p.add_argument(
        "--synonyms", action="store_true",
        help="query: expand each query term through the index's synonyms "
        "table; --kind topk ranks the expanded disjunction, --kind or "
        "returns the match set, --kind terms the expansion list",
    )
    p.add_argument(
        "--regex", action="store_true",
        help="grep: treat --q as a regex (default: literal substring)",
    )
    p.add_argument(
        "--case-sensitive", action="store_true",
        help="grep: match case-sensitively",
    )
    p.add_argument(
        "--rank-q",
        help="grep: BM25-rank the match set by this query "
        "(filter-query + scorer composition)",
    )
    p.add_argument(
        "--after",
        help="query --kind topk: deep-paging value cursor 'score,doc_id' "
        "(searchAfter) — returns the next k strictly after it",
    )
    p.add_argument(
        "--emb",
        help="query --kind hybrid: embeddings parquet path (vec_id must "
        "align with the corpus doc order)",
    )
    p.add_argument(
        "--qvec", type=int, default=0,
        help="query --kind hybrid: vec_id whose embedding is the vector query",
    )
    p.add_argument(
        "--predicate",
        help="delete: SQL predicate over docs columns, e.g. \"lang = 'java'\"",
    )
    p.add_argument(
        "--apply", action="store_true",
        help="delete: physically compact tombstones (rewrite postings, "
        "renumber doc ids, recompute stats) instead of tombstoning",
    )
    p.add_argument(
        "--method",
        choices=["exact", "lsh", "simhash", "semantic", "ivf", "pq",
                 "ivfpq", "sq", "hnsw", "maxsim", "maxsim_ivf",
                 "negatives", "substrings"],
        default="lsh",
        help="neardup/ann variant (ivf/pq/ivfpq/sq/hnsw/maxsim/"
        "maxsim_ivf/negatives are ann-only; semantic = SemDeDup over "
        "an embeddings-shaped --corpus)",
    )
    p.add_argument("--threshold", type=float, default=0.1)
    p.add_argument(
        "--hi", type=float, default=0.95,
        help="ann --method negatives: near-duplicate exclusion bound "
        "(candidates with sim_r >= hi are not negatives)",
    )
    p.add_argument(
        "--format", choices=["parquet", "jsonl", "csv"], default=None,
        help="corpus format for build/positions/trigrams/grep "
        "(default: inferred from the path extension, parquet for "
        "directories); synth writes --out in this format",
    )
    p.add_argument("--corpus", help="path of the corpus table")
    p.add_argument("--index", help="index warehouse root")
    p.add_argument("--manifest", help="optional sha256 manifest parquet")
    p.add_argument("--q", help="query string")
    p.add_argument(
        "--tree",
        help='boolean AST JSON for query: \'{"and": [{"or": ["a","b"]}, '
        '{"not": "c"}]}\' — with --kind topk, BM25-ranks the matches over '
        "the tree's positive tokens",
    )
    p.add_argument("--k", type=int, default=10)
    p.add_argument(
        "--keep", type=int, default=1,
        help="vacuum: newest snapshots to retain per table",
    )
    p.add_argument(
        "--block-size", type=int, default=None,
        help="reindex: new skip-block size (None = keep source's)",
    )
    p.add_argument(
        "--buckets", type=int, default=None,
        help="reindex: new term_buckets partitioning (None = keep source's)",
    )
    p.add_argument("--k1", type=float, default=None,
                   help="reindex: new BM25 k1 (None = keep source's)")
    p.add_argument("--b", type=float, default=None,
                   help="reindex: new BM25 b (None = keep source's)")
    p.add_argument(
        "--kind",
        choices=["topk", "and", "or", "phrase", "phrase_topk",
                 "phrase_prefix", "terms", "highlight", "mlt", "hybrid",
                 "msm", "rescore", "federated", "span_near", "span_first",
                 "span_not", "qs", "sort", "stem", "decay", "random",
                 "terms_set", "boosting", "ltr", "dis_max", "pinned",
                 "bool_prefix", "rank_feature", "span_multi", "intervals",
                 "distance_feature", "template"],
        default="topk",
    )
    p.add_argument(
        "--lookup-id", type=int, default=7,
        help="aggs --op terms_lookup: the lookup document's id",
    )
    p.add_argument(
        "--slice", dest="slice_spec", default="0/4",
        help="aggs --op slice: 'i/n' — export slice i of n",
    )
    p.add_argument(
        "--vertices",
        help="geo --op polygon: CCW convex vertices 'ilon:ilat,...' in "
        "centi-degrees on the lattice grid",
    )
    p.add_argument(
        "--precision", type=int, default=3,
        help="geo --op geohash: geohash cell precision (chars)",
    )
    p.add_argument(
        "--template",
        help="query --kind template: query-string template with "
        "{{name}} placeholders",
    )
    p.add_argument(
        "--params",
        help="query --kind template: JSON object of template params",
    )
    p.add_argument(
        "--fractions", default='{"train": 0.9, "val": 0.05, "test": 0.05}',
        help="aggs --op split: JSON object of split fractions (sum 1)",
    )
    p.add_argument(
        "--weights", default='{"spark": 2.0, "stream": 1.5}',
        help="aggs --op sparse_vector: JSON object of query term weights",
    )
    p.add_argument(
        "--ltr-weights", default="0,1,0.5,-0.2,0.3",
        help="query --kind ltr: comma-separated linear weights over "
        "(bias, bm25, matched_frac, dl_norm, recency)",
    )
    p.add_argument(
        "--depth", type=int, default=50,
        help="query --kind ltr: rescore window (BM25 top-depth candidates)",
    )
    p.add_argument(
        "--decay-shape", choices=["gauss", "exp", "linear"], default="gauss",
        help="query --kind decay: ES decay curve",
    )
    p.add_argument(
        "--decay-field", default="doc_id",
        help="query --kind decay/random: numeric docs-column SQL "
        "expression (default: the engine doc id — the recency proxy)",
    )
    p.add_argument("--origin", type=float, default=0.0,
                   help="query --kind decay: decay origin")
    p.add_argument("--scale", type=float, default=None,
                   help="query --kind decay: distance where the "
                   "multiplier equals --decay-value")
    p.add_argument("--decay-value", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=42,
                   help="query --kind random: random_score seed")
    p.add_argument(
        "--required-expr",
        help="query --kind terms_set: per-doc required matched-term "
        "count as a docs-column SQL expression "
        "(ES minimum_should_match_field)",
    )
    p.add_argument("--neg-q", help="query --kind boosting: negative query")
    p.add_argument("--neg-boost", type=float, default=0.5,
                   help="query --kind boosting: demotion factor in (0,1]")
    p.add_argument(
        "--in-order", action="store_true",
        help="query --kind span_near: clauses must appear in the given "
        "order (default unordered)",
    )
    p.add_argument(
        "--pre", type=int, default=0,
        help="query --kind span_not: exclusion window before the match",
    )
    p.add_argument(
        "--post", type=int, default=0,
        help="query --kind span_not: exclusion window after the match",
    )
    p.add_argument(
        "--end", type=int, default=1,
        help="query --kind span_first: match spans ending at or before "
        "this 0-based token boundary (pos < end)",
    )
    p.add_argument(
        "--min-match", type=int, default=1,
        help="query --kind msm: minimum number of distinct query terms "
        "a doc must match (ES minimum_should_match)",
    )
    p.add_argument(
        "--rescore-phrase",
        help="query --kind rescore: phrase whose positional match adds "
        "--rescore-bonus within the top --rescore-window candidates",
    )
    p.add_argument(
        "--rf-field", default="doc_len",
        help="query --kind rank_feature: numeric docs column",
    )
    p.add_argument(
        "--rf-function", choices=["saturation", "log", "sigmoid"],
        default="saturation",
        help="query --kind rank_feature: ES feature function",
    )
    p.add_argument(
        "--pivot", type=float, default=100.0,
        help="query --kind rank_feature: saturation/sigmoid pivot "
        "(log: the scaling term)",
    )
    p.add_argument(
        "--rf-boost", type=float, default=1.0,
        help="query --kind rank_feature: feature clause boost",
    )
    p.add_argument(
        "--cached", action="store_true",
        help="query --kind topk: serve through the version-keyed "
        "request cache (repeat queries cost zero Spark jobs)",
    )
    p.add_argument(
        "--tie", type=float, default=0.0,
        help="query --kind dis_max: ES tie_breaker (0 = pure max)",
    )
    p.add_argument(
        "--field-expr", default="nullif(regexp_extract(text, 'vector[a-z]*', 0), '')",
        help="aggs --op missing: SQL expression of the (sparse) field",
    )
    p.add_argument(
        "--weight-expr", default="1",
        help="aggs --op weighted_avg: SQL weight expression per row",
    )
    p.add_argument("--rescore-window", type=int, default=50)
    p.add_argument("--rescore-bonus", type=float, default=2.0)
    p.add_argument(
        "--op",
        choices=["composite", "cardinality", "percentiles", "ppl", "bppl",
                 "term_vectors", "complete", "phrase", "date_histogram",
                 "rare_terms", "bbox", "near", "within", "grid",
                 "adjacency", "multi_terms", "bucket_sort", "pct_ranks",
                 "dsir", "policy", "hll", "heavy_hitters", "kmv",
                 "sampled_pct", "weighted_avg", "top_metrics", "auto_hist",
                 "line_dedup", "dup_spans", "t_test", "diversified",
                 "semantic_decontam", "matrix", "string_stats", "boxplot",
                 "stats_bucket", "rate", "cum_card", "bounds", "centroid",
                 "terms_error", "normalize", "filters", "missing",
                 "categorize", "moving_fn", "bucket_script", "rings",
                 "contexts", "item_sets", "ip_range", "pct_bucket",
                 "random_sampler", "sampler", "moving_pct", "mget",
                 "terms_lookup", "nested", "slice", "split", "keep_best",
                 "field_caps", "sparse_vector", "geohash", "line",
                 "polygon", "ppl_buckets"],
        help="aggs/suggest/geo: which aggregation / suggest / geo surface",
    )
    p.add_argument(
        "--filters",
        help="aggs --op adjacency: JSON object of named SQL boolean "
        'filters, e.g. \'{"en": "lang = \\\'en\\\'"}\'',
    )
    p.add_argument(
        "--metric", default="avg(n_chars)",
        help="aggs --op bucket_sort: SQL aggregate metric expression",
    )
    p.add_argument(
        "--having",
        help="aggs --op bucket_sort: bucket_selector predicate over "
        "(key, doc_count, metric)",
    )
    p.add_argument(
        "--thresholds", default="100,500,1000",
        help="aggs --op pct_ranks: comma-separated thresholds",
    )
    p.add_argument(
        "--target-expr",
        help="aggs --op dsir: SQL boolean selecting the TARGET rows "
        "the importance weights aim the corpus at",
    )
    p.add_argument(
        "--phi", type=float, default=0.01,
        help="aggs --op heavy_hitters: frequency threshold fraction",
    )
    p.add_argument(
        "--keys", default="lang,source",
        help="aggs --op composite: comma-separated bucket key columns",
    )
    p.add_argument(
        "--group-col", default="lang",
        help="aggs: bucket column for cardinality/percentiles",
    )
    p.add_argument(
        "--value-col-b", default=None,
        help="aggs --op matrix: the second numeric SQL expression",
    )
    p.add_argument(
        "--value-col", default=None,
        help="aggs --op percentiles: numeric column (default n_chars); "
        "query --facet: switches the facet to extended_stats over it",
    )
    p.add_argument(
        "--ps", default="0.5,0.9,0.99",
        help="aggs --op percentiles: comma-separated quantiles",
    )
    p.add_argument(
        "--ids", help="aggs --op term_vectors / mget: comma-separated doc ids",
    )
    p.add_argument(
        "--edges", help="geo --op rings: comma-separated ring edges in km",
    )
    p.add_argument(
        "--suggest-mode", choices=["always", "missing", "popular"],
        default="always",
        help="suggest (spell): ES term-suggester suggest_mode",
    )
    p.add_argument(
        "--prefix", help="suggest --op complete: completion prefix",
    )
    p.add_argument(
        "--shards",
        help="comma-separated shard index roots: query --kind federated "
        "(DFS_QUERY_THEN_FETCH — global df/avgdl, exact cross-shard "
        "merge) or suggest --op complete/spell (additive-df merge)",
    )
    p.add_argument(
        "--sort-field", default="doc_len",
        help="query --kind sort: docs-dimension column to order by",
    )
    p.add_argument(
        "--asc", action="store_true",
        help="query --kind sort: ascending order (default descending)",
    )
    p.add_argument(
        "--mlt-terms", type=int, default=25,
        help="query --kind mlt: number of interesting terms to select",
    )
    p.add_argument(
        "--width", type=int, default=30,
        help="query --kind highlight: passage window width in tokens",
    )
    p.add_argument(
        "--expand", choices=["prefix", "wildcard", "regex", "fuzzy"],
        help="query: treat --q as a dictionary expansion pattern "
        "(Lucene MultiTermQuery); --kind topk ranks the disjunction, "
        "--kind or returns the match set, --kind terms the expansion list",
    )
    p.add_argument(
        "--max-edits", type=int, default=1,
        help="query --expand fuzzy: Levenshtein budget",
    )
    p.add_argument(
        "--facet",
        help="query: docs-table column to facet-count over the --tree "
        "match set (top --k values)",
    )
    p.add_argument(
        "--slop", type=int, default=0,
        help="phrase kinds: max extra token gaps in the ordered window",
    )
    p.add_argument("--docs", type=int, default=50000)
    p.add_argument("--out")
    p.add_argument("--src", help="restore: the backup directory to restore from")
    p.add_argument("--ckpt", help="stream: checkpoint dir (default <index>_ckpt)")
    p.add_argument("--groups", type=int, default=None)
    p.add_argument(
        "--cluster", action="store_true",
        help="neardup: emit (doc_id, cluster_id, keep) dup groups instead of pairs",
    )
    p.add_argument("--local-cpus", type=int, default=None)
    p.add_argument("--warehouse", help="alias/rollover: registry directory")
    p.add_argument(
        "--pit",
        help="query: JSON file of pinned table versions (from "
        "`info --open-pit`) — point-in-time search",
    )
    p.add_argument(
        "--open-pit", action="store_true",
        help="info: print the PIT id (current version of every table) "
        "for use with query --pit",
    )
    p.add_argument("--stream", help="rollover: stream name")
    p.add_argument(
        "--ilm-keep", type=int, default=None,
        help="rollover: run the ILM policy — keep the newest N "
        "generations (delete older), force-merge + vacuum the sealed "
        "survivors, sweep orphan generation dirs",
    )
    p.add_argument(
        "--predicate-b", default=None,
        help="aggs --op t_test: the second slice's SQL predicate "
        "(--predicate is the first)",
    )
    p.add_argument(
        "--per-value", type=int, default=2,
        help="aggs --op diversified: max sampled docs per --group-col value",
    )
    p.add_argument(
        "--max-docs", type=int, default=None,
        help="rollover: seal the open generation once it reaches this "
        "many docs (the ES max_docs condition)",
    )
    p.add_argument(
        "--now", action="store_true",
        help="rollover: seal the open generation unconditionally "
        "(the explicit _rollover call)",
    )
    p.add_argument("--set", dest="alias_set", metavar="NAME",
                   help="alias: create/atomically re-point NAME (needs "
                   "--target)")
    p.add_argument("--target", help="alias --set: index root to point at")
    p.add_argument("--filter", dest="alias_filter_arg",
                   help="alias --set: store a docs-dimension SQL predicate "
                   "with the alias (filtered alias; topk through the alias "
                   "ranks only the matching slice)")
    p.add_argument("--drop", dest="alias_drop", metavar="NAME",
                   help="alias: remove NAME (index untouched)")
    args = p.parse_args(argv)

    # alias indirection: any index ref may be alias://WH/NAME (plain
    # paths pass through) — the blue/green cutover surface of reindex
    from yase_spark.alias import alias_filter, resolve_alias

    args.alias_filter = None
    if args.index:
        # filtered alias: capture the stored predicate BEFORE the ref
        # is rewritten to its root — topk routes through topk_where
        args.alias_filter = alias_filter(args.index)
        args.index = resolve_alias(args.index)
    if getattr(args, "shards", None):
        args.shards = ",".join(
            resolve_alias(s) for s in args.shards.split(",")
        )

    if args.cmd == "transform":
        # continuous rollup checkpoint: fold --corpus (events-shaped)
        # past the stored watermark into the --out destination table;
        # prints the run metrics then the maintained table
        from yase_spark.config import IndexConfig as _IC  # noqa: F401
        from yase_spark.transform import read_rollup, transform_rollup

        spark = _spark(args)
        spark.sparkContext.setLogLevel("WARN")
        ev = spark.read.parquet(args.corpus)
        if not args.out:
            raise SystemExit("transform needs --out (destination root)")
        metrics = transform_rollup(spark, ev, args.out)
        print(json.dumps(metrics))
        print(json.dumps(
            [r.asDict() for r in read_rollup(spark, args.out).limit(20).collect()],
            default=str,
        ))
        return 0

    if args.cmd == "rollover":
        # ILM-style bounded write generations behind a stream name:
        # --corpus appends a batch (build/append + max_docs condition),
        # --now seals explicitly, --q serves the stream via exact
        # global-stats federation over all generations
        from yase_spark.rollover import (
            generation_roots,
            get_state,
            rollover_append,
            rollover_now,
            rollover_search,
        )

        if not args.warehouse or not args.stream:
            raise SystemExit("rollover: pass --warehouse and --stream")
        if args.now:
            print(json.dumps(rollover_now(args.warehouse, args.stream)))
            return 0
        if args.ilm_keep is not None:
            # the ILM executor: retention-delete beyond --ilm-keep,
            # force-merge + vacuum the sealed survivors, sweep orphans
            from yase_spark.config import IndexConfig as _IC
            from yase_spark.rollover import ilm_policy

            spark = _spark(args)
            spark.sparkContext.setLogLevel("WARN")
            print(json.dumps(ilm_policy(
                spark, args.warehouse, args.stream, _IC(),
                keep_generations=args.ilm_keep,
            )))
            return 0
        if args.corpus:
            from yase_spark.config import IndexConfig as _IC

            spark = _spark(args)
            spark.sparkContext.setLogLevel("WARN")
            out = rollover_append(
                spark, args.warehouse, args.stream,
                spark.read.parquet(args.corpus),
                _IC(), max_docs=args.max_docs,
            )
            print(json.dumps(out))
        elif args.q:
            spark = _spark(args)
            spark.sparkContext.setLogLevel("WARN")
            rows = rollover_search(
                spark, args.warehouse, args.stream, args.q, k=args.k
            )
            print(json.dumps([
                {"rank": r, "repo": rp, "path": pa, "commit": c, "score": s}
                for r, rp, pa, c, s in rows
            ]))
        else:
            st = get_state(args.warehouse, args.stream)
            st["roots"] = generation_roots(args.warehouse, args.stream)
            print(json.dumps(st))
        return 0

    if args.cmd == "alias":
        from yase_spark.alias import drop_alias, list_aliases, set_alias

        if not args.warehouse:
            raise SystemExit("alias: pass --warehouse")
        if args.alias_set:
            if not args.target:
                raise SystemExit("alias --set needs --target")
            print(json.dumps(set_alias(args.warehouse, args.alias_set,
                                       args.target,
                                       filter=args.alias_filter_arg)))
        elif args.alias_drop:
            print(json.dumps(
                {"dropped": drop_alias(args.warehouse, args.alias_drop)}
            ))
        else:
            print(json.dumps(list_aliases(args.warehouse)))
        return 0

    from yase_spark.config import IndexConfig

    spark = _spark(args)
    spark.sparkContext.setLogLevel("WARN")

    if args.cmd == "synth":
        from yase_spark.sources import write_corpus
        from yase_spark.synth import corpus_df

        write_corpus(corpus_df(spark, args.docs), args.out, args.format or "parquet")
        print(json.dumps({"written": args.out, "docs": args.docs,
                          "format": args.format or "parquet"}))

    elif args.cmd == "build":
        from yase_spark.index import build_index
        from yase_spark.sources import read_corpus

        corpus = read_corpus(spark, args.corpus, args.format)
        manifest = spark.read.parquet(args.manifest) if args.manifest else None
        cfg = IndexConfig(build_groups=args.groups) if args.groups else IndexConfig()
        summary = build_index(spark, corpus, args.index, cfg, manifest=manifest)
        print(json.dumps({k: v for k, v in summary.items()}, default=float))

    elif args.cmd == "positions":
        # positional sibling index (phrase / ordered-proximity queries):
        # full build after `build`, incremental after appends (only docs
        # above the covered high-water mark are tokenized)
        from yase_spark.positions import build_positions
        from yase_spark.sources import read_corpus

        corpus = read_corpus(spark, args.corpus, args.format)
        print(json.dumps(build_positions(spark, args.index, corpus), default=float))

    elif args.cmd == "trigrams":
        # trigram sibling index (substring/regex code search): full
        # build after `build`, incremental after appends
        from yase_spark.grep import build_trigrams
        from yase_spark.sources import read_corpus

        corpus = read_corpus(spark, args.corpus, args.format)
        print(json.dumps(build_trigrams(spark, args.index, corpus), default=float))

    elif args.cmd == "grep":
        # trigram-prefiltered substring/regex search: posting-list
        # intersection of the pattern's required trigrams, then the real
        # matcher over candidates only (Zoekt/Code Search shape)
        from yase_spark.grep import GrepReader
        from yase_spark.sources import read_corpus

        corpus = read_corpus(spark, args.corpus, args.format)
        rd = GrepReader(spark, args.index, corpus)
        if args.rank_q:
            from yase_spark.query import IndexReader

            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.grep_topk(
                    IndexReader(spark, args.index), args.q, args.rank_q,
                    k=args.k, regex=args.regex,
                    case_sensitive=args.case_sensitive,
                )
            ]
            print(json.dumps(out))
        else:
            rows = rd.grep(
                args.q, regex=args.regex, case_sensitive=args.case_sensitive
            ).limit(args.k).collect()
            print(json.dumps([r.asDict() for r in rows]))

    elif args.cmd == "compact":
        # maintenance: collapse a table's commit history to one data dir
        # (Iceberg rewrite_data_files parity; resume/idempotence tags
        # carry over)
        from yase_spark.catalog import Catalog

        cat = Catalog(args.index)
        out = {}
        for t in ("segments", "local_segments", "docs"):
            if cat.exists(t):
                n_before = len(cat._manifest(t)["data_dirs"])
                v = cat.compact(spark, t)
                out[t] = {"dirs_before": n_before, "version": v}
        print(json.dumps(out))

    elif args.cmd == "delete":
        # document lifecycle: tombstone by predicate (Lucene-liveDocs
        # semantics — immediate exclusion, encode-time stats), then
        # --apply physically compacts (Lucene merge / Iceberg rewrite)
        from yase_spark.index import IndexBuilder

        b = IndexBuilder(spark, args.index)
        out = {}
        if args.predicate:
            out["delete"] = b.delete(predicate=args.predicate)
        if args.apply:
            out["apply"] = b.apply_deletes()
        if not out:
            raise SystemExit("delete: pass --predicate and/or --apply")
        print(json.dumps(out))

    elif args.cmd == "sort-index":
        # Lucene index.sort: materialize the range-partitioned sorted
        # docs sibling for --sort-field; sort queries on that field then
        # early-terminate (query --kind sort dispatches automatically)
        from yase_spark.sortindex import build_sort_index

        print(json.dumps(build_sort_index(
            spark, args.index, args.sort_field, files=args.files
        )))

    elif args.cmd == "vacuum":
        # Iceberg expireSnapshots: retain --keep newest snapshots per
        # table, reclaim unreferenced data (incl. COW-superseded bucket
        # dirs); current reads identical before/after
        from yase_spark.index import IndexBuilder

        print(json.dumps(IndexBuilder(spark, args.index).vacuum(
            keep_last=args.keep
        )))

    elif args.cmd == "reindex":
        # rewrite the index's physical layout (block_size/term_buckets)
        # or scoring params (k1/b) WITHOUT re-reading the corpus: one
        # pass over segment bytes, payloads carried byte-identically
        from yase_spark.reindex import reindex

        if not args.out:
            raise SystemExit("reindex: pass --out for the destination root")
        print(json.dumps(reindex(
            spark, args.index, args.out,
            block_size=args.block_size, term_buckets=args.buckets,
            k1=args.k1, b=args.b,
        )))

    elif args.cmd == "export":
        # snapshot-consistent backup: current manifests' live bytes only
        # (COW-superseded partitions and expired history never copied),
        # per-file sha256 manifest for restore-time verification
        from yase_spark.backup import export_index

        if not args.out:
            raise SystemExit("export: pass --out for the backup directory")
        s = export_index(args.index, args.out)
        print(json.dumps({k: s[k] for k in
                          ("source_root", "tables", "n_files", "total_bytes")}))

    elif args.cmd == "restore":
        # verified restore: re-hashes every file against the backup
        # manifest (a drifted backup fails HERE, not at query time), then
        # materializes a fresh single-snapshot index root
        from yase_spark.backup import import_index

        if not args.src or not args.out:
            raise SystemExit("restore: pass --src (backup) and --out (new root)")
        s = import_index(args.src, args.out)
        print(json.dumps({"restored": args.out,
                          "source_root": s.get("source_root"),
                          "n_files": s.get("n_files")}))

    elif args.cmd == "force-merge":
        # read-optimize after heavy append traffic: coalesce shard-split
        # segment rows to one row per term (Lucene forceMerge(1); pure
        # byte concat, bucket-level COW, idempotent)
        from yase_spark.index import IndexBuilder

        print(json.dumps(IndexBuilder(spark, args.index).force_merge()))

    elif args.cmd == "stream":
        # exactly-once incremental indexing of a growing corpus
        # directory: first run bootstraps, later runs (same checkpoint)
        # append only new files; safe to re-run on a schedule
        from yase_spark.query import IndexReader
        from yase_spark.streaming import stream_index

        cfg = IndexConfig(build_groups=args.groups) if args.groups else IndexConfig()
        if args.warehouse and args.stream:
            # data-stream write path: micro-batches land in rollover
            # generations; --max-docs seals per batch boundary
            from yase_spark.rollover import get_state
            from yase_spark.streaming import stream_rollover

            ckpt = args.ckpt or args.warehouse.rstrip("/") + "_ckpt"
            q = stream_rollover(
                spark, args.corpus, args.warehouse, args.stream, ckpt,
                cfg, max_docs=args.max_docs, fmt=args.format or "parquet",
            )
            q.awaitTermination()
            print(json.dumps({
                "warehouse": args.warehouse, "checkpoint": ckpt,
                **get_state(args.warehouse, args.stream),
            }))
            return 0
        ckpt = args.ckpt or args.index.rstrip("/") + "_ckpt"
        q = stream_index(spark, args.corpus, args.index, ckpt, cfg,
                         fmt=args.format or "parquet")
        q.awaitTermination()
        rd = IndexReader(spark, args.index)
        print(json.dumps({"index": args.index, "checkpoint": ckpt,
                          "n_docs": rd.n_docs, "avgdl": rd.avgdl}))

    elif args.cmd == "info":
        # index introspection: collection stats, per-table row counts +
        # snapshot versions, sibling-index presence, pending tombstones
        from pyspark.sql import functions as F

        from yase_spark.catalog import Catalog, open_pit
        from yase_spark.query import IndexReader

        if args.open_pit:
            print(json.dumps(open_pit(args.index)))
            return 0

        rd = IndexReader(spark, args.index)
        cat = Catalog(args.index)
        segs = cat.read(spark, "segments")
        agg = segs.agg(
            F.countDistinct("term").alias("terms"),
            F.sum("n").alias("postings"),
            F.count("*").alias("segment_rows"),
            F.countDistinct("bucket").alias("buckets"),
        ).collect()[0]
        out = {
            "index": args.index,
            "n_docs": rd.n_docs,
            "avgdl": rd.avgdl,
            "total_tokens": int(round(rd.avgdl * rd.n_docs)),
            "terms": agg["terms"],
            "postings": int(agg["postings"]),
            "segment_rows": agg["segment_rows"],
            "buckets": agg["buckets"],
            "tables": {
                t: {"version": cat.current_version(t)}
                for t in ("docs", "segments", "pos_segments", "tri_segments",
                          "dictionary", "deletes")
                if cat.exists(t)
            },
            "deleted_pending": (
                int(cat.read(spark, "deletes").count())
                if cat.exists("deletes") else 0
            ),
        }
        print(json.dumps(out, default=float))

    elif args.cmd == "synonyms":
        # analyzer-applied synonym groups -> synonyms(term, variant)
        # sibling table (Solr expand=true semantics)
        from yase_spark.expand import build_synonyms

        if not args.groups_file:
            raise SystemExit("synonyms: pass --groups-file")
        with open(args.groups_file) as f:
            groups = json.load(f)
        n = build_synonyms(spark, args.index, groups)
        print(json.dumps({"index": args.index, "pairs": n}))

    elif args.cmd == "dictionary":
        # sorted (term, df) sibling table: prefix/wildcard lookups become
        # Parquet row-group range pruning (Lucene term-index analogue)
        from yase_spark.expand import build_term_dictionary

        n = build_term_dictionary(spark, args.index)
        print(json.dumps({"index": args.index, "terms": n}))

    elif args.cmd == "replicate":
        # CCR follower sync: --index is the LEADER, --out the follower;
        # re-run to tail new commits (idempotent, delta-sized)
        from yase_spark.replicate import follow

        if not args.out:
            raise SystemExit("replicate needs --out <follower-root>")
        print(json.dumps(follow(args.index, args.out)))

    elif args.cmd == "stems":
        # (stem, term, df) sibling: retrofits stemmed search onto the
        # surface-form index (query --kind stem); sorted by stem for
        # Parquet min/max lookup pruning, segments-version stamped
        from yase_spark.expand import build_stems

        n = build_stems(spark, args.index)
        print(json.dumps({"index": args.index, "terms": n}))

    elif args.cmd == "query":
        from yase_spark.query import And, IndexReader, Not, Or, Phrase, Term, TopK

        # federated mode has no single --index — shard readers only
        pit = None
        if args.pit:
            # --pit FILE: serve through a point-in-time snapshot minted
            # by `info --open-pit` — concurrent appends/deletes are
            # invisible to this query
            with open(args.pit) as f:
                pit = json.load(f)
        rd = (
            IndexReader(spark, args.index, pit=pit)
            if args.kind != "federated"
            and not (args.kind == "sort" and args.shards)
            else None
        )

        # boolean AST as JSON: "term" | {"and": [...]} | {"or": [...]}
        # | {"not": "x"} (valid only beside a positive "and" sibling)
        # | {"phrase": "get user", "slop": 0} (needs the positions index)
        # e.g. --tree '{"and": [{"phrase": "get user"}, {"not": "table"}]}'
        def parse(node):
            if isinstance(node, str):
                return Term(node)
            if isinstance(node, dict):
                if "phrase" in node and set(node) <= {"phrase", "slop"}:
                    return Phrase(node["phrase"], int(node.get("slop", 0)))
                if len(node) == 1:
                    (op, kids), = node.items()
                    if op == "and":
                        return And([parse(k) for k in kids])
                    if op == "or":
                        return Or([parse(k) for k in kids])
                    if op == "not":
                        return Not(parse(kids))
            raise SystemExit(f"bad tree node: {node!r}")

        if args.facet:
            if not args.tree:
                raise SystemExit("query --facet needs --tree")
            if args.value_col:
                # extended_stats facet: per --facet bucket stats over
                # the numeric --value-col of the match set
                rows = rd.facet_stats(
                    parse(json.loads(args.tree)), args.facet, args.value_col
                ).collect()
            else:
                rows = rd.facet_counts(
                    parse(json.loads(args.tree)), args.facet, topn=args.k
                ).collect()
            out = [r.asDict() for r in rows]
        elif args.synonyms:
            # query-time synonym rewrite over the synonyms sibling table
            if args.kind not in ("topk", "or", "terms"):
                raise SystemExit(
                    f"--synonyms supports --kind topk/or/terms, not {args.kind}"
                )
            if args.kind == "topk":
                out = [
                    {"rank": r, "doc_id": d, "score": s}
                    for r, d, s in rd.synonym_topk(args.q, args.k)
                ]
            elif args.kind == "or":
                out = rd.synonym_search(args.q).tolist()
            else:
                out = rd.synonym_expand(args.q)
        elif args.expand:
            # MultiTermQuery rewrites over the dictionary expansion
            kw = {"max_edits": args.max_edits} if args.expand == "fuzzy" else {}
            if args.kind == "topk":
                out = [
                    {"rank": r, "doc_id": d, "score": s}
                    for r, d, s in rd.multi_term_topk(
                        args.expand, args.q, args.k, **kw
                    )
                ]
            elif args.kind == "or":
                out = rd.multi_term_search(args.expand, args.q, **kw).tolist()
            else:
                out = rd.expand_terms(args.expand, args.q, **kw)
        elif args.tree:
            tree = parse(json.loads(args.tree))
            if args.kind == "topk":
                out = [
                    {"rank": r, "doc_id": d, "score": s}
                    for r, d, s in rd.search_topk(TopK(tree, args.k))
                ]
            else:
                out = [int(x) for x in rd.search(tree)]
        elif args.kind == "sort":
            # ES sort API: --q selects (query string via qparse when it
            # contains operators, else OR-of-tokens; omit for match-all
            # browse), --sort-field orders; --shards = cross-shard merge
            if args.shards:
                from yase_spark.federate import federated_sort_field

                shards = [
                    IndexReader(spark, root) for root in args.shards.split(",")
                ]
                out = [
                    {"rank": r, "repo": rp, "path": pa, "commit": c,
                     args.sort_field: v}
                    for r, rp, pa, c, v in federated_sort_field(
                        shards, args.q, args.sort_field,
                        k=args.k, ascending=args.asc,
                    )
                ]
            else:
                cursor = None
                if args.after:
                    v, i = args.after.rsplit(",", 1)
                    # type the cursor from the sort field's docs-table
                    # dtype, not by sniffing the text: a float field's
                    # '3.5' must parse as float and a numeric-LOOKING
                    # value of a string field must stay a string —
                    # either miscast makes the after-filter compare the
                    # wrong type and pages skip or repeat
                    tn = (
                        rd.cat.read(spark, "docs")
                        .schema[args.sort_field].dataType.typeName()
                    )
                    if tn in ("byte", "short", "integer", "long"):
                        av = int(v)
                    elif tn in ("float", "double") or tn.startswith(
                        "decimal"
                    ):
                        av = float(v)
                    else:
                        av = v
                    cursor = (av, int(i))
                rows = rd.topk_sort_field(
                    args.q, args.sort_field, k=args.k, ascending=args.asc,
                    after=cursor,
                ).collect()
                out = [r.asDict() for r in rows]
        elif args.kind == "qs":
            # Lucene/ES query_string: --q is parsed ('a AND (b OR c)
            # -d', quoted phrases with ~slop) and ranked like TopK
            from yase_spark.qparse import parse_topk

            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.search_topk(parse_topk(args.q, args.k))
            ]
        elif args.kind == "template":
            # ES search template: strict {{name}} render, then the
            # query_string lane
            import json as _json

            from yase_spark.qparse import parse_topk, render_template

            if not args.template:
                raise SystemExit("query --kind template needs --template")
            rendered = render_template(
                args.template, _json.loads(args.params or "{}")
            )
            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.search_topk(parse_topk(rendered, args.k))
            ]
        elif args.kind == "topk":
            if args.alias_filter:
                # filtered alias (ES multi-tenancy): rank only within
                # the alias's stored docs-dimension slice
                out = [
                    r.asDict()
                    for r in rd.topk_where(
                        args.q, args.k, predicate=args.alias_filter
                    ).collect()
                ]
            elif args.after:
                sc, did = args.after.split(",")
                rows = rd.topk_after(
                    args.q, args.k, after=(float(sc), int(did))
                )
                out = [{"rank": r, "doc_id": d, "score": s} for r, d, s in rows]
            elif args.cached:
                rows = rd.topk_cached(args.q, args.k)
                out = [{"rank": r, "doc_id": d, "score": s} for r, d, s in rows]
            else:
                rows = rd.topk(args.q, args.k)
                out = [{"rank": r, "doc_id": d, "score": s} for r, d, s in rows]
        elif args.kind == "bool_prefix":
            # ES match_bool_prefix: last token is a prefix clause
            rows = rd.match_bool_prefix(args.q, args.k)
            out = [{"rank": r, "doc_id": d, "score": s} for r, d, s in rows]
        elif args.kind == "rank_feature":
            # additive document-importance clause over a docs column
            rows = rd.topk_rank_feature(
                args.q, args.rf_field, k=args.k, function=args.rf_function,
                pivot=args.pivot, boost=args.rf_boost,
            ).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "distance_feature":
            # additive proximity clause: boost*pivot/(pivot+|field-origin|)
            rows = rd.topk_distance_feature(
                args.q, args.rf_field, origin=args.origin,
                pivot=args.pivot, boost=args.rf_boost, k=args.k,
            ).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "hybrid":
            # BM25 + vector RRF fusion: --q is the text query, --emb /
            # --qvec pick the vector query; both rankings to depth 2k
            if not args.emb:
                raise SystemExit("query --kind hybrid needs --emb")
            from yase_spark.hybrid import hybrid_topk
            from yase_spark.similarity import cosine_topk

            depth = 2 * args.k
            text = rd.topk(args.q, depth)
            emb = spark.read.parquet(args.emb)
            vec = [
                (r["rank"], r["vec_id"])
                for r in cosine_topk(emb, n_queries=args.qvec + 1, k=depth)
                .collect()
                if r["query_id"] == args.qvec
            ]
            out = [
                {"rank": r, "doc_id": d, "rrf": s}
                for r, d, s in hybrid_topk(text, vec, k=args.k)
            ]
        elif args.kind == "mlt":
            # find-similar: --q is the SOURCE TEXT (Lucene MoreLikeThis
            # re-analyzes stored content the same way)
            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.more_like_this(
                    args.q, args.k, m=args.mlt_terms
                )
            ]
        elif args.kind == "highlight":
            # top-k + best passage window; --corpus additionally
            # hydrates snippet text from the content-bearing source
            out = [
                {"rank": r, "doc_id": d, "score": s,
                 "win_start": ws, "n_hits": nh}
                for r, d, s, ws, nh in rd.highlight_topk(
                    args.q, args.k, width=args.width
                )
            ]
            if args.corpus and out:
                from yase_spark.positions import snippet_df

                wins = spark.createDataFrame(
                    [(o["doc_id"], o["win_start"]) for o in out],
                    schema="doc_id long, win_start long",
                )
                snips = {
                    r["doc_id"]: r["snippet"]
                    for r in snippet_df(
                        wins, rd.cat.read(spark, "docs"),
                        read_corpus(spark, args.corpus, args.format), width=args.width,
                    ).collect()
                }
                for o in out:
                    o["snippet"] = snips.get(o["doc_id"], "")
        elif args.kind == "federated":
            # multi-shard DFS_QUERY_THEN_FETCH across --shards roots
            from yase_spark.federate import dfs_query_then_fetch

            if not args.shards:
                raise SystemExit("query --kind federated needs --shards")
            shards = [
                IndexReader(spark, root) for root in args.shards.split(",")
            ]
            out = [
                {"rank": r, "repo": rp, "path": pa, "commit": c, "score": s2}
                for r, rp, pa, c, s2 in dfs_query_then_fetch(
                    shards, args.q, k=args.k
                )
            ]
        elif args.kind == "msm":
            # minimum_should_match ranking (ES BooleanQuery knob)
            out = [
                r.asDict()
                for r in rd.topk_msm(args.q, args.min_match, args.k).collect()
            ]
        elif args.kind == "rescore":
            # ES rescore window: BM25 top --rescore-window candidates,
            # phrase bonus from the positional sibling, re-ranked
            if not args.rescore_phrase:
                raise SystemExit("query --kind rescore needs --rescore-phrase")
            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.topk_rescore(
                    args.q, args.rescore_phrase, k=args.k,
                    window=args.rescore_window, bonus=args.rescore_bonus,
                    slop=args.slop,
                )
            ]
        elif args.kind == "stem":
            # stemmed-search retrofit: S-stem expansion over the stems
            # sibling (build with `stems` command), BM25 disjunction
            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.stem_topk(args.q, args.k)
            ]
        elif args.kind == "decay":
            # ES function_score decay (multiply): --decay-shape over
            # --decay-field around --origin at --scale
            if args.scale is None:
                raise SystemExit("query --kind decay needs --scale")
            rows = rd.topk_decay(
                args.q, args.decay_field, origin=args.origin,
                scale=args.scale, kind=args.decay_shape,
                decay=args.decay_value, k=args.k,
            ).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "random":
            # seeded random_score (multiply) — reproducible jitter
            rows = rd.topk_random(
                args.q, seed=args.seed, field=args.decay_field, k=args.k
            ).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "terms_set":
            if not args.required_expr:
                raise SystemExit("query --kind terms_set needs --required-expr")
            rows = rd.topk_terms_set(args.q, args.required_expr, args.k).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "boosting":
            if not args.neg_q:
                raise SystemExit("query --kind boosting needs --neg-q")
            rows = rd.topk_boosting(
                args.q, args.neg_q, negative_boost=args.neg_boost, k=args.k
            ).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "ltr":
            # linear LTR rescore of the BM25 top---depth window
            from yase_spark.ltr import ltr_rerank

            w = [float(x) for x in args.ltr_weights.split(",")]
            rows = ltr_rerank(rd, args.q, w, k=args.k, depth=args.depth).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "dis_max":
            # query-level dis_max: --q holds ';'-separated sub-queries
            subs = [s.strip() for s in args.q.split(";") if s.strip()]
            rows = rd.dis_max_topk(subs, k=args.k, tie_breaker=args.tie).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "pinned":
            if not args.ids:
                raise SystemExit("query --kind pinned needs --ids")
            pins = [int(x) for x in args.ids.split(",")]
            rows = rd.pinned_topk(pins, args.q, k=args.k).collect()
            out = [r.asDict() for r in rows]
        elif args.kind == "span_near":
            # a clause with |-separated terms is a span_or clause
            clauses = [
                c.split("|") if "|" in c else c for c in args.q.split()
            ]
            out = [
                int(x) for x in rd.span_near(
                    clauses, slop=args.slop, in_order=args.in_order
                )
            ]
        elif args.kind == "span_multi":
            # --q "prefix* other [other2...]": the *-suffixed first
            # token expands (span_multi rewrite); rest are span clauses
            toks = args.q.split()
            if not toks or not toks[0].endswith("*"):
                raise SystemExit(
                    "query --kind span_multi wants --q 'prefix* other...'"
                )
            out = [
                int(x) for x in rd.span_multi_near(
                    "prefix", toks[0][:-1], toks[1:], slop=args.slop
                )
            ]
        elif args.kind == "intervals":
            # ES intervals query: --q is the JSON rule tree, e.g.
            # '{"all_of": {"ordered": true, "max_gaps": 3, "intervals":
            #   [{"match": {"query": "table"}}, ...]}}'
            rule = json.loads(args.q)
            out = [int(x) for x in rd.intervals(rule)]
        elif args.kind == "span_not":
            # --q "include exclude[|exclude2...]"; window via --pre/--post
            inc, exc = args.q.split()
            out = [
                int(x) for x in rd.span_not(
                    inc, exc.split("|"), pre=args.pre, post=args.post
                )
            ]
        elif args.kind == "span_first":
            out = [int(x) for x in rd.span_first(args.q, args.end)]
        elif args.kind == "phrase":
            out = [int(x) for x in rd.phrase(args.q, slop=args.slop)]
        elif args.kind == "phrase_prefix":
            # ES match_phrase_prefix: the last token of --q is a prefix
            out = [int(x) for x in rd.phrase_prefix(args.q, slop=args.slop)]
        elif args.kind == "phrase_topk":
            out = [
                {"rank": r, "doc_id": d, "score": s}
                for r, d, s in rd.phrase_topk(args.q, args.k, slop=args.slop)
            ]
        elif args.kind == "and":
            out = rd.bool_and(args.q).tolist()
        else:
            out = rd.bool_or(args.q).tolist()
        print(json.dumps(out))

    elif args.cmd == "aggs":
        # search-engine aggregations over a documents-shaped table
        # (--corpus): composite paging, exact cardinality, exact
        # discrete percentiles, unigram-LM perplexity, term vectors
        from yase_spark.aggs import (
            composite_agg,
            distinct_counts,
            group_percentiles,
        )
        from yase_spark.textstats import (
            bigram_perplexity,
            term_vectors,
            unigram_perplexity,
        )

        docs = spark.read.parquet(args.corpus)
        if args.op == "composite":
            keys = args.keys.split(",")
            after = tuple(args.after.split(",")) if args.after else None
            out_df = composite_agg(docs, keys, size=args.k, after=after)
        elif args.op == "cardinality":
            out_df = distinct_counts(docs, args.group_col, "[^a-z0-9]+")
        elif args.op == "percentiles":
            ps = [float(x) for x in args.ps.split(",")]
            out_df = group_percentiles(
                docs, args.group_col, args.value_col or "n_chars", ps
            )
        elif args.op == "ppl":
            out_df = unigram_perplexity(docs)
        elif args.op == "bppl":
            # Stupid-Backoff bigram perplexity; --predicate selects the
            # trusted fit slice (default: fit on the whole corpus)
            fit = docs.filter(args.predicate) if args.predicate else None
            out_df = bigram_perplexity(docs, fit_docs=fit)
        elif args.op == "ppl_buckets":
            # CCNet head/middle/tail per-language perplexity terciles
            from yase_spark.textstats import ppl_buckets

            out_df = ppl_buckets(docs)
        elif args.op == "term_vectors":
            if not args.ids:
                raise SystemExit("aggs --op term_vectors needs --ids")
            out_df = term_vectors(docs, [int(x) for x in args.ids.split(",")])
        elif args.op == "date_histogram":
            # --corpus points at an events-shaped table here; --k is the
            # trailing moving-mean window in buckets
            from yase_spark.aggs import date_histogram_pipeline

            out_df = date_histogram_pipeline(docs, hours=1, window=max(args.k, 1))
        elif args.op == "rare_terms":
            # --k is max_doc_count (the df ceiling of the rare tail)
            from yase_spark.aggs import rare_terms

            out_df = rare_terms(docs, "[^a-z0-9]+", max_doc_count=max(args.k, 1))
        elif args.op == "adjacency":
            from yase_spark.aggs import adjacency_matrix

            if not args.filters:
                raise SystemExit("aggs --op adjacency needs --filters")
            out_df = adjacency_matrix(docs, json.loads(args.filters))
        elif args.op == "multi_terms":
            from yase_spark.aggs import multi_terms

            out_df = multi_terms(docs, args.keys.split(","), size=args.k)
        elif args.op == "bucket_sort":
            # terms buckets on --group-col + --metric, bucket_selector
            # via --having, metric-desc bucket_sort, --k truncation
            from yase_spark.aggs import bucket_pipeline

            out_df = bucket_pipeline(
                docs, args.group_col, args.metric, having=args.having,
                order_by=[("metric", False)], size=args.k,
            )
        elif args.op == "pct_ranks":
            from yase_spark.aggs import percentile_ranks

            out_df = percentile_ranks(
                docs, args.group_col, args.value_col or "n_chars",
                [float(x) for x in args.thresholds.split(",")],
            )
        elif args.op == "dsir":
            from yase_spark.mixing import importance_weights

            if not args.target_expr:
                raise SystemExit("aggs --op dsir needs --target-expr")
            out_df = importance_weights(docs, args.target_expr)
        elif args.op == "policy":
            from yase_spark.curation import policy_flags

            out_df = policy_flags(docs)
        elif args.op == "hll":
            # HyperLogLog distinct tokens per --group-col bucket
            from pyspark.sql import functions as _F

            from yase_spark.sketches import hll_cardinality

            toks = docs.select(
                args.group_col,
                _F.explode(
                    _F.expr("filter(split(lower(text), '[^a-z0-9]+'), "
                            "x -> x <> '')")
                ).alias("term"),
            )
            out_df = hll_cardinality(toks, args.group_col, "term")
        elif args.op == "heavy_hitters":
            # exact freq > phi*n terms via MG candidates + exact pass
            from yase_spark.sketches import heavy_hitters

            out_df = heavy_hitters(docs, "[^a-z0-9]+", phi=args.phi)
        elif args.op == "kmv":
            from yase_spark.sketches import kmv_bottomk

            out_df = kmv_bottomk(docs, "cast(doc_id as string)", k=args.k)
        elif args.op == "weighted_avg":
            from yase_spark.aggs import weighted_avg

            out_df = weighted_avg(
                docs, (args.keys or args.group_col or "lang").split(","),
                args.value_col or "n_chars",
                args.weight_expr,
            )
        elif args.op == "top_metrics":
            from yase_spark.aggs import top_metrics

            out_df = top_metrics(
                docs, (args.keys or args.group_col or "lang").split(","),
                args.value_col or "n_chars",
                (args.metric or "doc_id").split(","), size=max(args.k, 1),
            )
        elif args.op == "auto_hist":
            # --corpus points at an events-shaped table; --k is the
            # target bucket count
            from yase_spark.aggs import auto_date_histogram

            out_df = auto_date_histogram(docs, target_buckets=max(args.k, 1))
        elif args.op == "line_dedup":
            # CCNet/RefinedWeb boilerplate-line removal; --k is the
            # min distinct-docs threshold
            from yase_spark.curation import line_dedup

            out_df = line_dedup(docs, min_docs=max(args.k, 2))
        elif args.op == "dup_spans":
            # exact duplicated-substring detection (Lee et al. 2022);
            # --k is the window length
            from yase_spark.neardup import dup_spans

            out_df = dup_spans(docs, k=max(args.k, 4))
        elif args.op == "t_test":
            from yase_spark.aggs import t_test

            if not args.predicate or not args.predicate_b:
                raise SystemExit(
                    "aggs --op t_test needs --predicate and --predicate-b"
                )
            out_df = t_test(
                docs, args.predicate, args.predicate_b,
                args.value_col or "n_chars",
            )
        elif args.op == "diversified":
            from yase_spark.aggs import diversified_sampler

            out_df = diversified_sampler(
                docs, args.group_col or "lang", n=max(args.k, 1),
                max_per_value=args.per_value,
            )
        elif args.op == "matrix":
            from yase_spark.aggs import matrix_stats

            out_df = matrix_stats(
                docs, "a", "b",
                expr_a=args.value_col or "n_chars % 97",
                expr_b=args.value_col_b or "(doc_id * 7 + n_chars) % 89",
            )
        elif args.op == "string_stats":
            from yase_spark.aggs import string_stats

            out_df = string_stats(docs, "text")
        elif args.op == "boxplot":
            from yase_spark.aggs import dispersion_stats

            out_df = dispersion_stats(docs, args.value_col or "n_chars")
        elif args.op == "stats_bucket":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import bucket_stats

            out_df = bucket_stats(docs, hours=1)
        elif args.op == "rate":
            # --corpus points at an events-shaped table; --k is the
            # rate unit in minutes
            from yase_spark.aggs import rate_agg

            out_df = rate_agg(docs, hours=1, unit_minutes=max(args.k, 1))
        elif args.op == "cum_card":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import cumulative_cardinality

            out_df = cumulative_cardinality(docs, hours=1, key="user_id")
        elif args.op == "terms_error":
            # --k is the coordinator size; per-shard size = 2*k
            from yase_spark.aggs import terms_sharded

            out_df = terms_sharded(
                docs, n_shards=4, shard_size=max(2 * args.k, 2),
                size=max(args.k, 1),
            )
        elif args.op == "sampler":
            from yase_spark.aggs import sampler_agg

            out_df = sampler_agg(
                docs, (args.q or "spark window hash join").split()
            )
        elif args.op == "moving_pct":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import moving_percentiles

            out_df = moving_percentiles(docs, hours=1, window=4)
        elif args.op == "mget":
            from yase_spark.lookup import mget

            if not args.ids:
                raise SystemExit("aggs --op mget needs --ids")
            out_df = mget(docs, [int(x) for x in args.ids.split(",")])
        elif args.op == "terms_lookup":
            from yase_spark.lookup import terms_lookup

            out_df = terms_lookup(docs, args.lookup_id, k=args.k)
        elif args.op == "nested":
            from yase_spark.nested import nested_match

            out_df = nested_match(docs, k=args.k)
        elif args.op == "slice":
            from yase_spark.mixing import sliced_scroll

            i, n = (int(x) for x in args.slice_spec.split("/"))
            out_df = sliced_scroll(docs, i, n)
        elif args.op == "split":
            import json as _json

            from yase_spark.mixing import split_counts

            out_df = split_counts(docs, _json.loads(args.fractions))
        elif args.op == "keep_best":
            from yase_spark.neardup import dup_keep_best, jaccard_pairs

            out_df = dup_keep_best(
                docs.select("doc_id"),
                jaccard_pairs(docs, k=3, threshold=args.threshold),
                docs.selectExpr("doc_id", "cast(n_chars as long) as q"),
            )
        elif args.op == "field_caps":
            from yase_spark.lookup import field_caps

            out_df = field_caps(docs)
        elif args.op == "sparse_vector":
            import json as _json

            from yase_spark.features import sparse_vector_topk

            out_df = sparse_vector_topk(
                docs, _json.loads(args.weights), k=args.k
            )
        elif args.op == "random_sampler":
            from yase_spark.aggs import random_sampler_agg

            out_df = random_sampler_agg(docs, args.threshold or 0.25)
        elif args.op == "ip_range":
            from yase_spark.aggs import ip_range_agg

            ranges = [
                tuple(None if x in ("", "*") else x for x in r.split("-"))
                for r in (args.filters or "*-64.0.0.0,64.0.0.0-*").split(",")
            ]
            out_df = ip_range_agg(docs, ranges)
        elif args.op == "pct_bucket":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import percentiles_bucket

            out_df = percentiles_bucket(docs, hours=1)
        elif args.op == "item_sets":
            from yase_spark.aggs import frequent_item_sets

            out_df = frequent_item_sets(
                docs, vocab_size=12, min_support=args.threshold or 0.05
            )
        elif args.op == "contexts":
            # context-aware completion over the corpus: --filters is the
            # {context: boost} JSON, --prefix the completion prefix
            from yase_spark.expand import contexts_complete

            out_df = contexts_complete(
                docs, args.prefix, json.loads(args.filters), k=args.k
            )
        elif args.op == "filters":
            # --filters is the adjacency-style named-predicate JSON
            from yase_spark.aggs import filters_agg

            out_df = filters_agg(docs, json.loads(args.filters))
        elif args.op == "missing":
            from yase_spark.aggs import missing_agg

            out_df = missing_agg(docs, args.field_expr)
        elif args.op == "categorize":
            from yase_spark.aggs import categorize_text

            out_df = categorize_text(docs, size=args.k)
        elif args.op == "moving_fn":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import moving_fn

            out_df = moving_fn(docs, hours=1, window=3)
        elif args.op == "bucket_script":
            from yase_spark.aggs import bucket_script

            out_df = bucket_script(docs, hours=1)
        elif args.op == "normalize":
            # --corpus points at an events-shaped table
            from yase_spark.aggs import normalize_buckets

            out_df = normalize_buckets(docs, hours=1)
        elif args.op == "semantic_decontam":
            # --corpus points at an embeddings-shaped table; --predicate
            # selects the benchmark slice; --threshold is the cosine bar
            from yase_spark.similarity import semantic_decontaminate

            if not args.predicate:
                raise SystemExit(
                    "aggs --op semantic_decontam needs --predicate "
                    "(the benchmark slice)"
                )
            out_df = semantic_decontaminate(
                docs, args.predicate, threshold=args.threshold
            )
        elif args.op == "sampled_pct":
            # deterministic-sample percentiles; --ps like percentiles,
            # --k is the per-group sample size
            from yase_spark.sketches import sampled_percentiles

            out_df = sampled_percentiles(
                docs, args.group_col, args.value_col or "n_chars",
                [float(x) for x in args.ps.split(",")], k=max(args.k, 1),
            )
        else:
            raise SystemExit("aggs needs --op")
        if args.out:
            out_df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "rows": out_df.count()}))
        else:
            # default=str: date_histogram rows carry timestamp buckets
            print(json.dumps(
                [r.asDict() for r in out_df.limit(100).collect()], default=str
            ))

    elif args.cmd == "geo":
        # geo queries/aggs over a documents-shaped table (--corpus):
        # bbox filter, k-nearest (--op near, --k), radius query
        # (--op within, --radius-km), geotile grid (--op grid, --zoom)
        from yase_spark.geo import (
            geo_bounding_box,
            geo_distance_topk,
            geo_within,
            geotile_grid,
        )

        docs = spark.read.parquet(args.corpus)
        lat, lon = (float(x) for x in args.point.split(","))
        if args.op == "bbox":
            if not args.bbox:
                raise SystemExit("geo --op bbox needs --bbox")
            out_df = geo_bounding_box(
                docs, *(float(x) for x in args.bbox.split(","))
            )
        elif args.op == "near":
            out_df = geo_distance_topk(docs, lat, lon, k=args.k)
        elif args.op == "within":
            if args.radius_km is None:
                raise SystemExit("geo --op within needs --radius-km")
            out_df = geo_within(docs, lat, lon, args.radius_km)
        elif args.op == "grid":
            out_df = geotile_grid(docs, zoom=args.zoom)
        elif args.op == "rings":
            # ES geo_distance aggregation: ring buckets around --origin
            # (as "lat,lon" via --bbox reuse is confusing; fixed 10,20
            # matches the driver entry; pass --edges for custom rings)
            from yase_spark.geo import geo_distance_rings

            edges = (
                [float(x) for x in args.edges.split(",")]
                if args.edges else None
            )
            out_df = geo_distance_rings(docs, lat, lon, edges)
        elif args.op == "bounds":
            from yase_spark.geo import geo_bounds

            out_df = geo_bounds(docs)
        elif args.op == "centroid":
            from yase_spark.geo import geo_centroid

            out_df = geo_centroid(docs)
        elif args.op == "geohash":
            from yase_spark.geo import geohash_grid

            out_df = geohash_grid(docs, precision=args.precision)
        elif args.op == "line":
            from yase_spark.geo import geo_line

            out_df = geo_line(docs)
        elif args.op == "polygon":
            from yase_spark.geo import geo_polygon

            if not args.vertices:
                raise SystemExit("geo --op polygon needs --vertices")
            verts = [
                tuple(int(v) for v in pair.split(":"))
                for pair in args.vertices.split(",")
            ]
            out_df = geo_polygon(docs, verts, k=args.k)
        else:
            raise SystemExit(
                "geo needs --op bbox|near|within|grid|bounds|centroid"
            )
        if args.out:
            out_df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "rows": out_df.count()}))
        else:
            print(json.dumps([r.asDict() for r in out_df.limit(100).collect()]))

    elif args.cmd == "bpe":
        # distributed BPE tokenizer training over a documents-shaped
        # corpus; --encode additionally re-encodes the corpus with the
        # learned merges and writes per-doc token counts
        from yase_spark.bpe import bpe_encode, learn_bpe, merges_df

        if not args.corpus:
            raise SystemExit("bpe needs --corpus")
        docs = spark.read.parquet(args.corpus)
        merges = learn_bpe(docs, args.merges)
        if args.out:
            merges_df(spark, merges).write.mode("overwrite").parquet(
                args.out + "/merges"
            )
            summary = {"merges": len(merges), "written": args.out + "/merges"}
            if args.encode:
                enc = bpe_encode(docs, merges)
                enc.write.mode("overwrite").parquet(args.out + "/token_counts")
                agg = enc.agg(
                    {"n_bpe_tokens": "sum", "n_words": "sum"}
                ).collect()[0]
                summary.update(
                    n_words=agg["sum(n_words)"],
                    n_bpe_tokens=agg["sum(n_bpe_tokens)"],
                )
            print(json.dumps(summary))
        else:
            print(json.dumps([list(m) for m in merges[:100]]))

    elif args.cmd == "rank-eval":
        # ES _rank_eval: run the query batch through the serving lane
        # and score it against a graded judgment parquet — P@k,
        # recall@k, MRR, DCG, nDCG@k per query
        from yase_spark.query import IndexReader
        from yase_spark.rankeval import rank_eval

        if not (args.index and args.qrels and args.queries_file):
            raise SystemExit("rank-eval needs --index --qrels --queries-file")
        with open(args.queries_file) as fh:
            batch = json.load(fh)
        rd = IndexReader(spark, args.index)
        rows = [
            (int(qid), d, s)
            for qid, q in sorted(batch.items(), key=lambda kv: int(kv[0]))
            for _, d, s in rd.topk(q, args.k)
        ]
        results = spark.createDataFrame(
            rows or [], schema="query_id int, doc_id long, score double"
        )
        out_df = rank_eval(results, spark.read.parquet(args.qrels), k=args.k)
        if args.out:
            out_df.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "rows": out_df.count()}))
        else:
            print(json.dumps([r.asDict() for r in out_df.collect()]))

    elif args.cmd == "suggest":
        # suggest surfaces off the dictionary siblings: --op complete
        # (autocomplete) or spell (did-you-mean, default); --shards
        # a,b,c federates either op exactly (additive dfs)
        if args.shards:
            from yase_spark.federate import (
                federated_complete,
                federated_spell_suggest,
            )
            from yase_spark.query import IndexReader

            readers = [
                IndexReader(spark, r) for r in args.shards.split(",")
            ]
            if args.op == "complete":
                if not args.prefix:
                    raise SystemExit("suggest --op complete needs --prefix")
                out = [
                    {"term": t, "weight": w}
                    for t, w in federated_complete(
                        readers, args.prefix, k=args.k
                    )
                ]
            else:
                if not args.q:
                    raise SystemExit("suggest needs --q (words to correct)")
                out = [
                    {"word": w, "rank": r, "suggestion": s, "df": d}
                    for w, r, s, d in federated_spell_suggest(
                        readers, args.q.split(), k=args.k
                    )
                ]
            print(json.dumps(out))
        elif args.op == "complete":
            from yase_spark.expand import TermExpander

            if not args.prefix:
                raise SystemExit("suggest --op complete needs --prefix")
            rows = TermExpander(spark, args.index).complete(
                args.prefix, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        elif args.op == "phrase":
            # whole-query did-you-mean: per-token distance-1 candidates
            # re-ranked as phrases by a Stupid-Backoff bigram LM over
            # the corpus word stream (needs --corpus for the LM counts)
            from yase_spark.catalog import Catalog
            from yase_spark.sources import read_corpus
            from yase_spark.suggest import (
                build_deletion_index,
                deletions_are_fresh,
                phrase_suggest,
            )

            if not args.q or not args.corpus:
                raise SystemExit("suggest --op phrase needs --q and --corpus")
            if not deletions_are_fresh(Catalog(args.index)):
                build_deletion_index(spark, args.index)
            docs = read_corpus(spark, args.corpus, args.format).selectExpr(
                "monotonically_increasing_id() AS doc_id", "content AS text"
            )
            rows = phrase_suggest(
                spark, args.index, docs, args.q, k=args.k
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))
        else:
            from yase_spark.catalog import Catalog
            from yase_spark.suggest import (
                build_deletion_index,
                deletions_are_fresh,
                spell_suggest,
            )

            if not args.q:
                raise SystemExit("suggest needs --q (words to correct)")
            # rebuild the deletion index only when stale — every build
            # is a vocabulary-sized shuffle plus a catalog commit
            if not deletions_are_fresh(Catalog(args.index)):
                build_deletion_index(spark, args.index)
            rows = spell_suggest(
                spark, args.index, args.q.split(), k=args.k,
                suggest_mode=args.suggest_mode,
            ).collect()
            print(json.dumps([r.asDict() for r in rows]))

    elif args.cmd == "neardup":
        from yase_spark.neardup import (
            dup_groups,
            jaccard_pairs,
            minhash_lsh_pairs,
            simhash_pairs,
        )

        docs = spark.read.parquet(args.corpus)
        if args.method == "semantic":
            # SemDeDup: --corpus is an embeddings-shaped table; output
            # is already grouped (vec_id, cluster_id, keep)
            from yase_spark.similarity import semantic_dedup

            out = semantic_dedup(docs, threshold=args.threshold, n_clusters=args.k)
            if args.out:
                out.write.mode("overwrite").parquet(args.out)
                print(json.dumps({"written": args.out, "rows": out.count()}))
            else:
                print(json.dumps([r.asDict() for r in out.limit(100).collect()]))
            spark.stop()
            return 0
        if args.method == "substrings":
            # Lee et al. substring-dedup removal: cut duplicated
            # k-windows except their globally-first occurrence
            from yase_spark.neardup import dedup_substrings

            out = dedup_substrings(docs, k=args.k or 25)
        elif args.method == "exact":
            out = jaccard_pairs(docs, threshold=args.threshold)
        elif args.method == "lsh":
            out = minhash_lsh_pairs(docs, threshold=args.threshold)
        elif args.method == "simhash":
            out = simhash_pairs(docs)
        else:
            raise SystemExit(
                f"--method {args.method} is ann-only; neardup methods: "
                "exact | lsh | simhash | semantic | substrings"
            )
        if args.cluster:
            # pairs -> duplicate groups with the keep-lowest policy
            out = dup_groups(
                docs.select("doc_id"),
                out.select("doc_a", "doc_b"),
            )
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "pairs": out.count()}))
        else:
            print(json.dumps([r.asDict() for r in out.limit(100).collect()]))

    elif args.cmd == "ann":
        from yase_spark.hnsw import hnsw_ann_topk
        from yase_spark.pq import ivf_pq_topk, pq_ann_topk
        from yase_spark.similarity import (
            cosine_topk,
            ivf_ann_topk,
            hard_negatives,
            lsh_ann_topk,
            maxsim_ivf_topk,
            maxsim_topk,
            sq_ann_topk,
        )

        emb = spark.read.parquet(args.corpus)
        if args.predicate and args.method == "negatives":
            # filter-then-search composes with the band natively
            out = hard_negatives(
                emb, k=args.k, hi=args.hi, predicate=args.predicate
            )
        elif args.predicate and args.method in ("maxsim", "maxsim_ivf"):
            raise SystemExit(
                "--predicate is not supported for the MaxSim methods"
            )
        elif args.predicate:
            # metadata-filtered exact ANN (filter-then-search)
            from yase_spark.similarity import cosine_topk_where

            out = cosine_topk_where(emb, args.predicate, k=args.k)
        else:
            fn = {
                "lsh": lsh_ann_topk,
                "ivf": ivf_ann_topk,
                "pq": lambda e, k: pq_ann_topk(e, k=k, m=16, ks=32, refine=3 * k),
                "ivfpq": lambda e, k: ivf_pq_topk(e, k=k, m=16, ks=32, refine=3 * k),
                "sq": lambda e, k: sq_ann_topk(e, k=k, rescore=8 * k),
                # HNSW-selected probes over the IVF lists (hnsw.py):
                # nprobe/ef default to half the lists — the pruned
                # serving shape; the saturated oracle shape is the
                # driver-contract row
                "hnsw": lambda e, k: hnsw_ann_topk(
                    e, k=k, n_centroids=16, nprobe=8, ef=12
                ),
                "exact": cosine_topk,
                # ColBERT MaxSim late interaction over the contiguous
                # multi-vector layout (5 token vectors per doc)
                "maxsim": lambda e, k: maxsim_topk(e, vecs_per_doc=5, k=k),
                # PLAID-style pruned serving shape (half the lists);
                # the saturated oracle shape is the driver-contract row
                "maxsim_ivf": lambda e, k: maxsim_ivf_topk(
                    e, vecs_per_doc=5, k=k, n_centroids=16, nprobe=8
                ),
                # contrastive hard-negative mining; --hi is the
                # near-duplicate exclusion bound (its own flag, NOT
                # --threshold: the neardup default 0.1 would mine the
                # easiest negatives instead of the hardest)
                "negatives": lambda e, k: hard_negatives(e, k=k, hi=args.hi),
            }[args.method]
            out = fn(emb, k=args.k)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(json.dumps({"written": args.out, "rows": out.count()}))
        else:
            print(json.dumps([r.asDict() for r in out.limit(100).collect()]))

    elif args.cmd == "bench":
        import bench

        bench.main()

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
