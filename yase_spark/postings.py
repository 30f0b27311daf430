"""Posting-list construction: salted shuffle, local segments, sort-merge
(SURVEY.md §2.5 C1–C7).

Spec (BASELINE.json:6): "delta-gap + varint-compressed posting lists with
skip/block-max metadata built per salted-shuffle partition and merged via
sort-merge into global segments", "handles repo/language hot-key skew via
salting + two-phase aggregation".

Design notes for 100 TB scale:

* Hot terms (df > cfg.hot_term_df) are sharded by **doc_id range**
  (``salt = floor(doc_id * S / (n_docs + 1))``), so the per-salt local
  segments are disjoint, doc-ordered runs and the sort-merge is a
  concatenation — no k-way heap needed, and no single task ever holds
  more than 1/S of a ubiquitous term's postings during the encode stage.
* Terms whose merged size would still be unbounded at extreme scale can
  stay sharded: merge emits one segment row per shard above
  ``merge_cap`` postings; the query side concatenates shard rows (they
  are doc-ordered), so a 10^12-doc "the"-like term never has to fit in
  one task or one row.
* The encode kernel is ``mapInPandas`` over hash-partitioned,
  within-partition-sorted rows — one Python/Arrow hop per batch, with
  group boundaries carried across batches, NOT one Python call per term
  (per-group ``applyInPandas`` overhead would dominate with millions of
  unique terms).
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .codec import decode_postings, encode_postings, varint_decode, varint_encode
from .config import IndexConfig

LOCAL_SCHEMA = (
    "term string, shard int, df_local long, cf_local long, payload binary"
)
SEGMENT_SCHEMA = (
    "term string, shard int, df long, cf long, n long, payload binary, "
    "block_meta array<struct<block_first:long, block_last:long, max_tf:int, "
    "max_score:double, byte_offset:long, n_docs:int>>, bucket int"
)

MERGE_CAP = 50_000_000  # postings above which a term stays shard-split


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable term -> layout bucket (C7); pure-Python so the query path
    computes it driver-side without a Spark job. crc32 is deterministic
    across platforms/processes (unlike ``hash()``)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def range_salt(tf: DataFrame, n_docs: int, cfg: IndexConfig) -> DataFrame:
    """C1 (uniform): shard EVERY term's postings by doc_id range —
    ``salt = floor(doc_id * S / (n_docs + 1))``, S scaled so no encode
    group exceeds ~5M postings even for a term present in every document.

    Uniform range-salting needs no df statistics on the critical path
    (the df-threshold variant below required an extra full aggregation
    before the encode shuffle), bounds every group unconditionally, and
    keeps shard runs doc-ordered and disjoint so the merge is a concat.
    This is the same document-partitioning argument real distributed
    indexes use."""
    s = max(cfg.salt_shards, -(-n_docs // 5_000_000))
    return tf.withColumn(
        "salt", F.floor(F.col("doc_id") * s / F.lit(n_docs + 1)).cast("int")
    )


def salt_postings(
    tf: DataFrame, n_docs: int, cfg: IndexConfig, hot: DataFrame | None = None
) -> DataFrame:
    """C1: doc_id-range salt for hot terms (df > threshold), salt 0 else.

    ``hot`` — precomputed hot-term table (one global pass at the docs
    stage); when None it is derived from ``tf`` (costs an extra shuffle —
    fine for ad-hoc use, avoided by the staged build)."""
    if hot is None:
        dfs = tf.groupBy("term").agg(F.count("*").alias("df"))
        hot = dfs.filter(F.col("df") > cfg.hot_term_df).select("term")
    else:
        hot = hot.select("term")
    s = cfg.salt_shards
    return (
        tf.join(F.broadcast(hot.withColumn("_hot", F.lit(1))), "term", "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.floor(F.col("doc_id") * s / F.lit(n_docs + 1)).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )


# ------------------------------------------------------------- encode C2/C3
def _encode_groups(pdf: pd.DataFrame) -> pd.DataFrame:
    """Vectorized local-segment encode of a sorted (term, salt, doc_id)
    frame: ONE varint pass over all groups, then per-group byte slicing."""
    if pdf.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype=t) for c, t in zip(
                ["term", "shard", "df_local", "cf_local", "payload"],
                [object, "int32", "int64", "int64", object],
            )}
        )
    terms = pdf["term"].to_numpy()
    salts = pdf["salt"].to_numpy()
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)
    tfs = pdf["tf"].to_numpy(dtype=np.int64)
    dls = pdf["dl"].to_numpy(dtype=np.int64)
    n = ids.size

    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (terms[1:] != terms[:-1]) | (salts[1:] != salts[:-1])
    starts = np.flatnonzero(change)
    ends = np.concatenate([starts[1:], [n]])

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = ids[0]
    gaps[1:] = ids[1:] - ids[:-1]
    gaps[starts] = ids[starts]  # reset delta chain at group starts

    def _section(vals: np.ndarray):
        enc = varint_encode(vals.astype(np.uint64))
        widths = np.searchsorted(
            (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))),
            vals.astype(np.uint64),
            side="right",
        ) + 1
        offs = np.concatenate(([0], np.cumsum(widths)))
        return enc.tobytes(), offs

    g_b, g_off = _section(gaps)
    t_b, t_off = _section(tfs)
    d_b, d_off = _section(dls)

    payloads = [
        g_b[g_off[s] : g_off[e]] + t_b[t_off[s] : t_off[e]] + d_b[d_off[s] : d_off[e]]
        for s, e in zip(starts, ends)
    ]
    cf = np.add.reduceat(tfs, starts)
    return pd.DataFrame(
        {
            "term": terms[starts],
            "shard": salts[starts].astype("int32"),
            "df_local": (ends - starts).astype("int64"),
            "cf_local": cf.astype("int64"),
            "payload": payloads,
        }
    )


def build_local_segments(salted: DataFrame, partitions: int) -> DataFrame:
    """C1+C2+C3: shuffle by (term, salt), sort within partition, encode.

    Batches inside one partition are stitched so a group spanning Arrow
    batch boundaries is encoded once.
    """
    shuffled = salted.repartition(partitions, "term", "salt").sortWithinPartitions(
        "term", "salt", "doc_id"
    )

    def encode(batches):
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            # hold back the trailing group — it may continue in the next
            # Arrow batch of this partition (input is sorted, so the tail
            # group's rows are contiguous at the end)
            tail_n = int(
                (
                    (pdf["term"] == pdf["term"].iloc[-1])
                    & (pdf["salt"] == pdf["salt"].iloc[-1])
                ).sum()
            )
            head, carry = pdf.iloc[: len(pdf) - tail_n], pdf.iloc[len(pdf) - tail_n :]
            if len(head):
                yield _encode_groups(head)
        if carry is not None and len(carry):
            yield _encode_groups(carry)

    return shuffled.mapInPandas(encode, schema=LOCAL_SCHEMA)


# ------------------------------------------------------------- merge C5/C6
def merge_segments(
    local: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: IndexConfig,
    merge_cap: int = MERGE_CAP,
) -> DataFrame:
    """Sort-merge local segments into global segments with finalized
    block-max metadata (true global upper bounds: idf from global df).

    Shard runs of one term are doc_id-range-disjoint and arrive sorted by
    shard, so the merge is a decode + concatenate + re-encode. Terms whose
    total postings exceed ``merge_cap`` keep one output row per shard
    (doc-ordered; the reader concatenates)."""
    k1, b, block = cfg.k1, cfg.b, cfg.block_size
    n_buckets = cfg.term_buckets

    # shuffle by the layout bucket (bucket = f(term), so all runs of a
    # term stay co-located) instead of by raw term: the downstream
    # partitionBy("bucket") write then needs NO extra shuffle and emits
    # one file per bucket instead of tasks×buckets small files.
    # Spark's crc32 (java.util.zip) equals zlib.crc32 (tested), so the
    # JVM bucket column and the query-side Python term_bucket() agree.
    if "run_seq" not in local.columns:
        # run_seq orders doc_id-disjoint run generations: 0 = base build;
        # incremental appends use 1, 2, ... (their doc_ids are strictly
        # larger, so seq order == doc order and merge stays a concat)
        local = local.withColumn("run_seq", F.lit(0))
    shuffled = (
        local.withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(n_buckets)).cast("int"),
        )
        .repartition(n_buckets, "bucket")
        .sortWithinPartitions("term", "run_seq", "shard")
    )

    def merge(batches):
        rows: list[pd.DataFrame] = []
        carry: pd.DataFrame | None = None

        def flush(group: pd.DataFrame):
            term = group["term"].iloc[0]
            df_g = int(group["df_local"].sum())
            idf = math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
            bucket = int(group["bucket"].iloc[0])
            # cf recomputed from decoded tfs (not summed from run rows) so
            # merge inputs may be prior *global* segment rows (incremental
            # append) whose stored cf is already corpus-wide.
            out = []
            if df_g > merge_cap and len(group) > 1:
                cf_g = 0
                decoded = []
                for r in group.itertuples():
                    ids, tfs, dls = decode_postings(bytes(r.payload), int(r.df_local))
                    cf_g += int(tfs.sum())
                    decoded.append((int(r.shard), ids, tfs, dls))
                # output shard = position in (run_seq, shard) order so the
                # reader's shard-ordered concat is doc-ordered even when
                # runs come from multiple append generations
                for pos, (shard, ids, tfs, dls) in enumerate(decoded):
                    payload, meta = encode_postings(
                        ids, tfs, dls, block_size=block, idf=idf,
                        k1=k1, b=b, avgdl=avgdl,
                    )
                    out.append(
                        (term, pos, df_g, cf_g, int(ids.size), payload, meta, bucket)
                    )
            else:
                parts = [
                    decode_postings(bytes(r.payload), int(r.df_local))
                    for r in group.itertuples()
                ]
                ids = np.concatenate([p[0] for p in parts])
                tfs = np.concatenate([p[1] for p in parts])
                dls = np.concatenate([p[2] for p in parts])
                cf_g = int(tfs.sum())
                payload, meta = encode_postings(
                    ids, tfs, dls, block_size=block, idf=idf, k1=k1, b=b, avgdl=avgdl
                )
                out.append((term, 0, df_g, cf_g, int(ids.size), payload, meta, bucket))
            return pd.DataFrame(
                out,
                columns=[
                    "term", "shard", "df", "cf", "n", "payload", "block_meta", "bucket",
                ],
            )

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            tail_n = int((pdf["term"] == pdf["term"].iloc[-1]).sum())
            head, carry = pdf.iloc[: len(pdf) - tail_n], pdf.iloc[len(pdf) - tail_n :]
            if len(head):
                terms = head["term"].to_numpy()
                bounds = np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1])))
                ends = np.concatenate([bounds[1:], [len(head)]])
                for s, e in zip(bounds, ends):
                    rows.append(flush(head.iloc[s:e]))
                yield pd.concat(rows, ignore_index=True)
                rows.clear()
        if carry is not None and len(carry):
            yield flush(carry)

    return shuffled.mapInPandas(merge, schema=SEGMENT_SCHEMA)
