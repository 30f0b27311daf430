#!/usr/bin/env python
"""Prototype dup_spans variants: (a) md5 vs xxhash64 window hash,
(b) agg+join-back (2 explodes) vs window-count-over-h (1 explode),
plus dup_keep_best / dup_groups sub-attribution."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window, functions as F

from yase_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(cpus=cpus, app="iso-variants", shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()

from yase_spark.curation import _h60


def t(label, fn):
    t0 = time.perf_counter()
    r = fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s -> {r}", flush=True)


k = 20
base = docs.select("doc_id", F.col("text").alias("__t"), F.length("text").alias("n_chars"))


def wins(hexpr):
    return (
        base.filter(F.col("n_chars") >= k)
        .select(
            "doc_id", "__t",
            F.explode(F.expr(f"sequence(1, length(__t) - {k} + 1, 1)")).alias("pos"),
        )
        .select("doc_id", "pos", F.expr(hexpr).alias("h"))
    )


def spans_aggjoin(hexpr):
    w = wins(hexpr)
    dup_keys = w.groupBy("h").agg(F.count("*").alias("occ")).filter("occ >= 2").select("h")
    dup_wins = w.join(dup_keys, "h").select("doc_id", "pos")
    per_doc = dup_wins.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_windows"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    return per_doc.agg(F.sum("n_dup_windows")).collect()[0][0]


def spans_window(hexpr):
    w = wins(hexpr)
    ww = Window.partitionBy("h")
    dup_wins = w.withColumn("occ", F.count("*").over(ww)).filter("occ >= 2").select("doc_id", "pos")
    per_doc = dup_wins.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_windows"),
        F.sort_array(F.collect_list("pos")).alias("ps"),
    )
    return per_doc.agg(F.sum("n_dup_windows")).collect()[0][0]


md5e = _h60(f"substring(__t, pos, {k})")
xxe = f"xxhash64(substring(__t, pos, {k}))"

t("aggjoin md5", lambda: spans_aggjoin(md5e))
t("aggjoin xx", lambda: spans_aggjoin(xxe))
t("window md5", lambda: spans_window(md5e))
t("window xx", lambda: spans_window(xxe))
t("aggjoin xx 2nd", lambda: spans_aggjoin(xxe))
t("window xx 2nd", lambda: spans_window(xxe))

# ---- dup_keep_best sub-attribution ------------------------------------
from yase_spark.neardup import dup_groups, dup_keep_best, jaccard_pairs

kb_docs = docs.filter("doc_id < 2000")
t("jaccard_pairs(2k) count", lambda: jaccard_pairs(kb_docs, k=3, threshold=0.1).count())
pairs = jaccard_pairs(kb_docs, k=3, threshold=0.1)
t("dup_groups(2k pairs)", lambda: dup_groups(kb_docs.select("doc_id"), pairs).count())
t("dup_keep_best full", lambda: dup_keep_best(
    kb_docs.select("doc_id"), pairs,
    kb_docs.selectExpr("doc_id", "cast(n_chars as long) as q")).count())

spark.stop()
