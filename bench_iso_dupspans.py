#!/usr/bin/env python
"""Isolate dup_spans / dedup_substrings (guide §1.4 noop sink) and dump
plans. Sub-times the window explode+hash, the dup-key agg, and the full
operator."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from yase_spark.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(cpus=cpus, app="iso-dupspans", shuffle_partitions=2 * cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
docs.count()  # warm the scan

from yase_spark.curation import _h60
from yase_spark.neardup import dedup_substrings, dup_spans


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def t(label, fn):
    t0 = time.perf_counter()
    fn()
    print(f"{label}: {time.perf_counter() - t0:.3f}s", flush=True)


k = 20
base = docs.select("doc_id", F.col("text").alias("__t"), F.length("text").alias("n_chars"))
wins_nohash = base.filter(F.col("n_chars") >= k).select(
    "doc_id", "__t",
    F.explode(F.expr(f"sequence(1, length(__t) - {k} + 1, 1)")).alias("pos"),
).select("doc_id", "pos", F.expr(f"substring(__t, pos, {k})").alias("s"))
wins_md5 = wins_nohash.select("doc_id", "pos", F.expr(_h60("s")).alias("h"))
wins_xx = wins_nohash.select("doc_id", "pos", F.xxhash64("s").alias("h"))

t("explode+substring only (noop)", lambda: noop(wins_nohash.select("doc_id", "pos", F.length("s").alias("l"))))
t("explode+md5h60 (noop)", lambda: noop(wins_md5))
t("explode+md5h60 (noop) 2nd", lambda: noop(wins_md5))
t("explode+xxhash64 (noop)", lambda: noop(wins_xx))
t("explode+xxhash64 (noop) 2nd", lambda: noop(wins_xx))

agg_md5 = wins_md5.groupBy("h").agg(F.count("*").alias("occ")).filter("occ >= 2")
t("window agg md5 (noop)", lambda: noop(agg_md5))
agg_xx = wins_xx.groupBy("h").agg(F.count("*").alias("occ")).filter("occ >= 2")
t("window agg xx (noop)", lambda: noop(agg_xx))

t("dup_spans full", lambda: dup_spans(docs, k=20).agg(F.sum("n_dup_windows"), F.sum("dup_chars")).collect())
t("dup_spans full 2nd", lambda: dup_spans(docs, k=20).agg(F.sum("n_dup_windows"), F.sum("dup_chars")).collect())
t("dedup_substrings full", lambda: dedup_substrings(docs, k=25).agg(F.sum("removed_chars")).collect())

with open("/tmp/plan_dup_spans.txt", "w") as f:
    f.write(dup_spans(docs, k=20)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
with open("/tmp/plan_dedup_substrings.txt", "w") as f:
    f.write(dedup_substrings(docs, k=25)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
spark.stop()
