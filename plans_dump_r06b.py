#!/usr/bin/env python
"""Dump .explain('formatted') for the round-6-touched non-neardup
operators into plans/r06/<name>_<suffix>.txt.

    python plans_dump_r06b.py after                   # current tree
    YASE_TREE=/tmp/r5tree python plans_dump_r06b.py before   # r5 code
"""
import os
import sys

tree = os.environ.get("YASE_TREE", os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, tree)
out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans/r06")
suffix = sys.argv[1] if len(sys.argv) > 1 else "after"

from pyspark.sql import functions as F

from yase_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(cpus=8, app=f"plans-b-{suffix}")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")


def dump(name, df):
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
        f.write(txt)
    print(name, flush=True)


from yase_spark.aggs import frequent_item_sets, rare_terms, sampler_agg
from yase_spark.cooccur import related_terms
from yase_spark.curation import decontaminate
from yase_spark.features import sparse_vector_topk
from yase_spark.lookup import terms_lookup
from yase_spark.neardup import simhash_pairs

dump("sparse_vector_topk", sparse_vector_topk(
    docs, {"spark": 2.0, "stream": 1.5, "window": 1.0, "vector": 0.5}))
dump("terms_lookup", terms_lookup(docs, 7, max_terms=12, k=15))
dump("sampler_agg", sampler_agg(docs, ["spark", "window", "hash", "join"]))
dump("rare_terms", rare_terms(docs, "[^a-z0-9]+", max_doc_count=3, shingles=2))
# note: the r6 'after' plan shows the closedness tail over the pinned
# (localCheckpoint) support frame — the single combined-explode
# aggregate ran eagerly at construction time
dump("frequent_item_sets", frequent_item_sets(docs, vocab_size=12, min_support=0.05))
dump("related_terms", related_terms(docs, "table", k=20))
dump("decontaminate", decontaminate(docs, docs.filter("doc_id % 97 = 0"), n=8))
dump("simhash_pairs", simhash_pairs(docs))
spark.stop()
