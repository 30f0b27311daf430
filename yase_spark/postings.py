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
    "max_score:double, byte_offset:long, tf_off:long, dl_off:long, n_docs:int>>, "
    "idf double, avgdl double, bucket int"
)
# ``idf``/``avgdl`` are the encode-time global stats the block max_scores
# were computed with. After an incremental append changes n_docs/avgdl, a
# reader/executor rescales the stored bound instead of re-deriving bounds
# from a full decode: max_score is linear in idf, and the BM25 tf-factor
# ratio under an avgdl change is bounded by max(1, avgdl_now/avgdl_stored)
# (the denominator term k1*b*dl/avgdl shrinks at most proportionally, the
# rest of the denominator is avgdl-free) — so
#   bound_now <= stored * (idf_now/idf_stored) * max(1, avgdl_now/avgdl_stored)
# keeps the lazy block-skip structure VALID (never under-estimating)
# across appends (ADVICE round 2: rescaling by idf alone under-estimated
# after an avgdl-raising append and pruned true top-k docs).

MERGE_CAP = 50_000_000  # postings above which a term stays shard-split


def term_bucket(term: str, n_buckets: int) -> int:
    """Stable term -> layout bucket (C7); pure-Python so the query path
    computes it driver-side without a Spark job. crc32 is deterministic
    across platforms/processes (unlike ``hash()``)."""
    return zlib.crc32(term.encode("utf-8")) % n_buckets


# ------------------------------------------------------------- encode C2/C3
def _section(vals: np.ndarray):
    """varint-encode an int array -> (bytes, per-value byte offsets
    array of length n+1). Shared by the local-segment encoder and the
    vectorized merge re-encoder."""
    enc = varint_encode(vals.astype(np.uint64))
    widths = np.searchsorted(
        (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64))),
        vals.astype(np.uint64),
        side="right",
    ) + 1
    offs = np.concatenate(([0], np.cumsum(widths)))
    return enc.tobytes(), offs


def encode_runs_coded(
    codes: np.ndarray,
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    dictionary,
    salt: int,
):
    """Vectorized local-segment encode (ONE varint pass over all groups,
    then per-group byte slicing) for the Arrow-native
    docs stage: rows are (term-code, doc_id, tf, dl) sorted by
    (code, doc_id); term STRINGS are materialized only once per run (from
    the Arrow dictionary), never per posting. Returns a pyarrow
    RecordBatch in LOCAL_SCHEMA layout."""
    import pyarrow as pa

    n = doc_ids.size
    if n == 0:
        return pa.record_batch(
            {
                "term": pa.array([], type=pa.string()),
                "shard": pa.array([], type=pa.int32()),
                "df_local": pa.array([], type=pa.int64()),
                "cf_local": pa.array([], type=pa.int64()),
                "payload": pa.array([], type=pa.binary()),
            }
        )
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = codes[1:] != codes[:-1]
    starts = np.flatnonzero(change)
    ends = np.concatenate([starts[1:], [n]])

    gaps = np.empty(n, dtype=np.int64)
    gaps[0] = doc_ids[0]
    gaps[1:] = doc_ids[1:] - doc_ids[:-1]
    gaps[starts] = doc_ids[starts]

    g_b, g_off = _section(gaps)
    t_b, t_off = _section(tfs)
    d_b, d_off = _section(dls)
    payloads = [
        g_b[g_off[s]:g_off[e]] + t_b[t_off[s]:t_off[e]] + d_b[d_off[s]:d_off[e]]
        for s, e in zip(starts, ends)
    ]
    cf = np.add.reduceat(tfs, starts)
    return pa.record_batch(
        {
            "term": dictionary.take(pa.array(codes[starts])),
            "shard": pa.array(np.full(starts.size, salt, dtype=np.int32)),
            "df_local": pa.array((ends - starts).astype(np.int64)),
            "cf_local": pa.array(cf.astype(np.int64)),
            "payload": pa.array(payloads, type=pa.binary()),
        }
    )


def _merge_runs_fused(
    head: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float,
    b: float,
    block: int,
    shard_offsets: dict | None = None,
) -> pd.DataFrame:
    """Batch-vectorized sort-merge of encoded runs: ALL runs of ALL terms
    in ``head`` are decoded with ONE varint pass over the concatenated
    payload bytes and re-encoded with one varint pass per section.

    Round-1's per-term ``flush`` (3 numpy decode calls per run, a Python
    ``encode_postings`` call per term, a Python block loop per block) was
    the measured N→4N scaling killer (ROUND_NOTES.md: runs-per-term grows
    with input partition count, so per-call overhead × runs × terms grew
    superlinearly with corpus size). This kernel is O(payload bytes) with
    a fixed number of numpy array programs per Arrow batch.

    Requires: ``head`` sorted by (term, run_seq, shard); runs of one term
    doc_id-range-disjoint and in doc order (guaranteed by construction:
    run = doc_id-contiguous input partition, appends use higher doc_ids).
    """
    import math

    terms = head["term"].to_numpy()
    n_r = head["df_local"].to_numpy(dtype=np.int64)  # postings per run
    buckets = head["bucket"].to_numpy()
    R = len(head)
    total = int(n_r.sum())

    # ---- decode: one varint pass over every payload byte ---------------
    buf = np.frombuffer(b"".join(bytes(p) for p in head["payload"]), dtype=np.uint8)
    vals, _ = varint_decode(buf)
    if vals.size != 3 * total:
        raise ValueError(
            f"corrupt run payloads: {vals.size} varints != 3*{total} postings"
        )
    cum_n = np.concatenate(([0], np.cumsum(n_r)))
    run_base3 = np.concatenate(([0], np.cumsum(3 * n_r)))
    run_of_p = np.repeat(np.arange(R), n_r)
    off_in_run = np.arange(total, dtype=np.int64) - cum_n[run_of_p]
    gidx = run_base3[run_of_p] + off_in_run
    nr_p = n_r[run_of_p]
    gaps = vals[gidx].astype(np.int64)
    tfs = vals[gidx + nr_p].astype(np.int64)
    dls = vals[gidx + 2 * nr_p].astype(np.int64)

    # doc_ids: per-run delta chains (gap[0] of a run is absolute) —
    # global cumsum, then subtract the cumulative total before each run
    C = np.cumsum(gaps)
    run_starts = cum_n[:-1]
    base = np.zeros(R, dtype=np.int64)
    base[1:] = C[run_starts[1:] - 1]
    ids = C - base[run_of_p]
    if shard_offsets is not None:
        # fused single-pass build: runs carry LOCAL (per-shard 1-based)
        # ids; re-base to global here — rebasing compressed runs instead
        # of materialized rows is what lets the build skip the dedicated
        # id-zip pass over content entirely
        sb = np.fromiter(
            (
                shard_offsets.get((int(q), int(s)), 0)
                for q, s in zip(head["run_seq"], head["shard"])
            ),
            dtype=np.int64, count=R,
        )
        ids = ids + sb[run_of_p]

    # ---- regroup by term ------------------------------------------------
    tchange = np.concatenate(([True], terms[1:] != terms[:-1]))
    tstart_run = np.flatnonzero(tchange)
    T = tstart_run.size
    df_g = np.add.reduceat(n_r, tstart_run)
    tstart_post = cum_n[tstart_run]
    cf_g = np.add.reduceat(tfs, tstart_post)
    term_of_p = np.repeat(np.arange(T), df_g)

    # idf per term: scalar math.log to match the query-side bound exactly
    # (a vectorized log 1 ulp below would let WAND prune a tied candidate)
    idf_t = np.fromiter(
        (
            math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
            for d in df_g.tolist()
        ),
        dtype=np.float64,
        count=T,
    )
    tf_f = tfs.astype(np.float64)
    dl_f = dls.astype(np.float64)
    # same expression shape as codec.bm25_term_scores (upper-bound parity)
    scores = idf_t[term_of_p] * (tf_f * (k1 + 1.0)) / (
        tf_f + k1 * (1.0 - b + b * (dl_f / avgdl))
    )

    # ---- re-encode: delta chains reset at term starts -------------------
    g2 = np.empty(total, dtype=np.int64)
    g2[0] = ids[0]
    g2[1:] = ids[1:] - ids[:-1]
    g2[tstart_post] = ids[tstart_post]
    g_b, g_off = _section(g2)
    t_b, t_off = _section(tfs)
    d_b, d_off = _section(dls)
    tend_post = np.concatenate([tstart_post[1:], [total]])
    payloads = [
        g_b[g_off[s]:g_off[e]] + t_b[t_off[s]:t_off[e]] + d_b[d_off[s]:d_off[e]]
        for s, e in zip(tstart_post, tend_post)
    ]

    # ---- block/skip metadata, vectorized over ALL blocks ---------------
    bc = (df_g + block - 1) // block                     # blocks per term
    B = int(bc.sum())
    cum_bc = np.concatenate(([0], np.cumsum(bc)))
    term_of_b = np.repeat(np.arange(T), bc)
    b_seq = np.arange(B, dtype=np.int64) - cum_bc[term_of_b]
    b_start = tstart_post[term_of_b] + b_seq * block
    b_end = np.minimum(b_start + block, tend_post[term_of_b])
    blk_first = ids[b_start]
    blk_last = ids[b_end - 1]
    blk_max_tf = np.maximum.reduceat(tfs, b_start)       # blocks tile ids
    blk_max_sc = np.maximum.reduceat(scores, b_start)
    g_len_t = (g_off[tend_post] - g_off[tstart_post])[term_of_b]
    t_len_t = (t_off[tend_post] - t_off[tstart_post])[term_of_b]
    tb_start = tstart_post[term_of_b]
    blk_off = g_off[b_start] - g_off[tb_start]
    blk_tf_off = g_len_t + (t_off[b_start] - t_off[tb_start])
    blk_dl_off = g_len_t + t_len_t + (d_off[b_start] - d_off[tb_start])
    blk_n = b_end - b_start
    metas = [
        {
            "block_first": f, "block_last": l, "max_tf": mt,
            "max_score": ms, "byte_offset": o, "tf_off": to, "dl_off": do,
            "n_docs": nn,
        }
        for f, l, mt, ms, o, to, do, nn in zip(
            blk_first.tolist(), blk_last.tolist(), blk_max_tf.tolist(),
            blk_max_sc.tolist(), blk_off.tolist(), blk_tf_off.tolist(),
            blk_dl_off.tolist(), blk_n.tolist(),
        )
    ]
    return pd.DataFrame(
        {
            "term": terms[tstart_run],
            "shard": np.zeros(T, dtype=np.int32),
            "df": df_g.astype("int64"),
            "cf": cf_g.astype("int64"),
            "n": df_g.astype("int64"),
            "payload": payloads,
            "block_meta": [metas[cum_bc[t]:cum_bc[t + 1]] for t in range(T)],
            "idf": idf_t,
            "avgdl": np.full(T, avgdl, dtype=np.float64),
            "bucket": buckets[tstart_run],
        }
    )


def merge_segments(
    local: DataFrame,
    n_docs: int,
    avgdl: float,
    cfg: IndexConfig,
    merge_cap: int = MERGE_CAP,
    shard_offsets: dict | None = None,
) -> DataFrame:
    """Sort-merge local segments into global segments with finalized
    block-max metadata (true global upper bounds: idf from global df).

    Shard runs of one term are doc_id-range-disjoint and arrive sorted by
    shard, so the merge is a decode + concatenate + re-encode. Terms whose
    total postings exceed ``merge_cap`` keep one output row per shard
    (doc-ordered; the reader concatenates)."""
    k1, b, block = cfg.k1, cfg.b, cfg.block_size
    n_buckets = cfg.term_buckets

    # offsets may be {shard: base} (base build: every run is generation
    # 0) or {(run_seq, shard): base} (incremental append: only the delta
    # generation's runs carry LOCAL ids — prior global rows, run_seq 0,
    # must NOT be rebased). Normalize to the keyed form.
    if shard_offsets and not isinstance(next(iter(shard_offsets)), tuple):
        shard_offsets = {(0, s): v for s, v in shard_offsets.items()}

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
        # no explicit partition count: hash-by-bucket keeps every
        # bucket whole in one task at ANY count, so AQE may coalesce
        # the tiny-build case (an explicit N pinned 64 near-empty
        # Python-kernel tasks per group unit) while a 100-TB build
        # still fans out to min(term_buckets, shuffle.partitions)
        .repartition("bucket")
        .sortWithinPartitions("term", "run_seq", "shard")
    )

    def merge(batches):
        carry: pd.DataFrame | None = None

        def flush_cap(group: pd.DataFrame) -> pd.DataFrame:
            """Shard-split output for a term above ``merge_cap``: one row
            per run, re-encoded with finalized global bounds (rare path —
            a 10^12-doc "the"-like term never fits one task or row).
            cf is recomputed from decoded tfs (not summed from run rows)
            so merge inputs may be prior *global* segment rows
            (incremental append) whose stored cf is already corpus-wide."""
            term = group["term"].iloc[0]
            df_g = int(group["df_local"].sum())
            idf = math.log(1.0 + (n_docs - df_g + 0.5) / (df_g + 0.5))
            bucket = int(group["bucket"].iloc[0])
            decoded = []
            cf_g = 0
            for r in group.itertuples():
                ids, tfs, dls = decode_postings(bytes(r.payload), int(r.df_local))
                if shard_offsets is not None:
                    ids = ids + shard_offsets.get((int(r.run_seq), int(r.shard)), 0)
                cf_g += int(tfs.sum())
                decoded.append((ids, tfs, dls))
            out = []
            # output shard = position in (run_seq, shard) order so the
            # reader's shard-ordered concat is doc-ordered even when
            # runs come from multiple append generations
            for pos, (ids, tfs, dls) in enumerate(decoded):
                payload, meta = encode_postings(
                    ids, tfs, dls, block_size=block, idf=idf,
                    k1=k1, b=b, avgdl=avgdl,
                )
                out.append(
                    (term, pos, df_g, cf_g, int(ids.size), payload, meta, idf,
                     avgdl, bucket)
                )
            return pd.DataFrame(
                out,
                columns=[
                    "term", "shard", "df", "cf", "n", "payload", "block_meta",
                    "idf", "avgdl", "bucket",
                ],
            )

        def process(head: pd.DataFrame):
            terms = head["term"].to_numpy()
            n_r = head["df_local"].to_numpy(dtype=np.int64)
            tchange = np.concatenate(([True], terms[1:] != terms[:-1]))
            tstart = np.flatnonzero(tchange)
            df_g = np.add.reduceat(n_r, tstart)
            runs_per_term = np.diff(np.concatenate([tstart, [len(head)]]))
            term_of_run = np.cumsum(tchange) - 1
            cap_term = (df_g > merge_cap) & (runs_per_term > 1)
            parts = []
            if cap_term.any():
                cap_rows = head.iloc[cap_term[term_of_run]]
                ct = cap_rows["term"].to_numpy()
                bounds = np.flatnonzero(
                    np.concatenate(([True], ct[1:] != ct[:-1]))
                )
                ends = np.concatenate([bounds[1:], [len(cap_rows)]])
                for s, e in zip(bounds, ends):
                    parts.append(flush_cap(cap_rows.iloc[s:e]))
                head = head.iloc[~cap_term[term_of_run]]
            if len(head):
                parts.append(
                    _merge_runs_fused(
                        head, n_docs, avgdl, k1, b, block, shard_offsets
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            tail_n = int((pdf["term"] == pdf["term"].iloc[-1]).sum())
            head, carry = pdf.iloc[: len(pdf) - tail_n], pdf.iloc[len(pdf) - tail_n :]
            if len(head):
                yield from process(head)
        if carry is not None and len(carry):
            yield from process(carry.reset_index(drop=True))

    return shuffled.mapInPandas(merge, schema=SEGMENT_SCHEMA)
