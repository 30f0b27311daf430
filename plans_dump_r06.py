#!/usr/bin/env python
"""Dump .explain('formatted') for the queries touched in round 6 into
plans/r06/<name>_<suffix>.txt. Usage:
    python plans_dump_r06.py after            # current tree
    YASE_R5_NEARDUP=/tmp/r5code/neardup_r5.py python plans_dump_r06.py before
The 'before' mode monkey-patches the round-5 neardup module source so
the same entry frames plan against the old implementation."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
suffix = sys.argv[1] if len(sys.argv) > 1 else "after"

r5_src = os.environ.get("YASE_R5_NEARDUP")
if r5_src:
    import importlib.util

    spec = importlib.util.spec_from_file_location("yase_spark.neardup", r5_src)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["yase_spark.neardup"] = mod
    import yase_spark  # ensure the package exists first

    spec.loader.exec_module(mod)
    yase_spark.neardup = mod

from pyspark.sql import functions as F

from yase_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(cpus=8, app=f"plans-{suffix}")
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

from yase_spark.neardup import dedup_substrings, dup_spans, jaccard_pairs


def dump(name, df):
    txt = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
        f.write(txt)
    print(name, "->", f"plans/r06/{name}_{suffix}.txt")


dump("dup_spans", dup_spans(docs, k=20))
dump("dedup_substrings", dedup_substrings(docs, k=25))
dump("jaccard_pairs", jaccard_pairs(docs.filter("doc_id < 2000"), k=3, threshold=0.1))
spark.stop()
