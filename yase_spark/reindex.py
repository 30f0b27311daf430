"""Reindex: rewrite an index's PHYSICAL layout without touching content.

The ES/Lucene surface this re-expresses is ``_reindex`` + ``_split`` /
``_shrink`` + ``IndexUpgrader``: take an existing index and produce a
new one under different layout/scoring parameters. The content-free
design makes this radically cheaper here than in ES (which re-ingests
every ``_source`` document through the analyzer): a segment payload is
a flat ``gaps||tfs||dls`` varint stream whose BYTES do not depend on
``block_size``, ``term_buckets``, ``k1`` or ``b`` —

* ``block_size``   lives only in ``block_meta`` (skip offsets every B
  postings over the same stream),
* ``term_buckets`` lives only in the ``bucket`` partition column,
* ``k1``/``b``     live only in the ``max_score`` block bounds (scores
  themselves are computed at query time from the decoded tf/dl).

So reindexing = ONE distributed pass over segment rows that carries
every payload byte-identically and recomputes only block_meta + bucket,
then one shuffle into the new bucket partitioning. Cost ∝ index bytes
(~a tenth of corpus bytes), never ∝ corpus — at 100 TB the difference
between an overnight job and re-running the whole ingest. The 100-TB
plan shape: parquet scan of segments (all columns needed) → one
Arrow-batched numpy kernel (vectorized over ALL rows of a batch, no
per-posting Python) → exchange on the new ``bucket`` → partitioned
write. ``documents`` content is never read; nothing corpus-sized
reaches the driver.

Sibling tables re-layout for free: positions/trigram payloads are
self-describing (their block_meta rides in the row), so a
``term_buckets`` change is a pure bucket-column recompute; docs /
stats / deletes / dictionary / synonyms are copied as single commits
whose ``carried_tags`` preserve the full unit/fingerprint history —
``append`` on the new index still recognizes already-applied deltas
(noop) and ``build`` resume still sees the corpus fingerprint.

What CANNOT change without content: ``ngrams`` / tokenizer (different
token streams ⇒ different postings) — rejected loudly; re-run ``build``
from the corpus for those.
"""

from __future__ import annotations

import math
import time
from dataclasses import asdict, replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .codec import _THRESHOLDS, varint_decode
from .config import IndexConfig
from .postings import SEGMENT_SCHEMA

# layout/scoring knobs reindex can rewrite index-side; anything else
# (ngrams, tokenizer) changes the token stream and needs the corpus
RELAYOUT_FIELDS = ("block_size", "term_buckets", "k1", "b")


def _reblock_kernel(block: int, k1: float, b: float):
    """mapInPandas kernel: per segment row, carry the payload bytes
    unchanged and recompute block_meta for the new ``block`` size and
    ``k1``/``b`` bounds. Vectorized over ALL rows of a batch — one
    varint pass over the concatenated payloads, numpy reduceat for the
    per-block maxima (the `_merge_runs_fused` pattern with runs ≡ rows,
    minus the merge/re-encode stages)."""

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            n_r = pdf["n"].to_numpy(dtype=np.int64)
            if (n_r <= 0).any():
                raise ValueError("segment row with n<=0 postings")
            R = len(pdf)
            total = int(n_r.sum())
            pay_bytes = [bytes(p) for p in pdf["payload"]]
            buf = np.frombuffer(b"".join(pay_bytes), dtype=np.uint8)
            vals, _ = varint_decode(buf)
            if vals.size != 3 * total:
                raise ValueError(
                    f"corrupt payloads: {vals.size} varints != 3*{total}"
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

            # absolute doc ids: per-row delta chains (gap[0] absolute)
            C = np.cumsum(gaps)
            base = np.zeros(R, dtype=np.int64)
            base[1:] = C[cum_n[1:-1] - 1]
            ids = C - base[run_of_p]

            # per-value varint widths -> per-row section byte offsets
            w = (
                np.searchsorted(
                    _THRESHOLDS, vals.astype(np.uint64), side="right"
                ).astype(np.int64)
                + 1
            )
            gcum = np.concatenate(([0], np.cumsum(w[gidx])))
            tcum = np.concatenate(([0], np.cumsum(w[gidx + nr_p])))
            dcum = np.concatenate(([0], np.cumsum(w[gidx + 2 * nr_p])))
            g_len = gcum[cum_n[1:]] - gcum[cum_n[:-1]]      # per row
            t_len = tcum[cum_n[1:]] - tcum[cum_n[:-1]]
            d_len = dcum[cum_n[1:]] - dcum[cum_n[:-1]]
            plen = np.fromiter(
                (len(p) for p in pay_bytes), dtype=np.int64, count=R
            )
            if not np.array_equal(g_len + t_len + d_len, plen):
                raise ValueError("payload section lengths != payload bytes")

            # bounds under the NEW k1/b with the row's ENCODE-TIME stats
            # (readers rescale stored bounds by idf/avgdl drift — the
            # same contract the merge encoder establishes)
            idf_p = pdf["idf"].to_numpy(dtype=np.float64)[run_of_p]
            avgdl_p = pdf["avgdl"].to_numpy(dtype=np.float64)[run_of_p]
            tf_f = tfs.astype(np.float64)
            dl_f = dls.astype(np.float64)
            # same IEEE evaluation order as codec.bm25_term_scores
            scores = idf_p * (tf_f * (k1 + 1.0)) / (
                tf_f + k1 * (1.0 - b + b * (dl_f / avgdl_p))
            )

            bc = (n_r + block - 1) // block
            Bn = int(bc.sum())
            cum_bc = np.concatenate(([0], np.cumsum(bc)))
            row_of_b = np.repeat(np.arange(R), bc)
            b_seq = np.arange(Bn, dtype=np.int64) - cum_bc[row_of_b]
            b_start = cum_n[row_of_b] + b_seq * block
            b_end = np.minimum(b_start + block, cum_n[row_of_b + 1])
            blk_first = ids[b_start]
            blk_last = ids[b_end - 1]
            blk_max_tf = np.maximum.reduceat(tfs, b_start)
            blk_max_sc = np.maximum.reduceat(scores, b_start)
            rs = cum_n[row_of_b]                            # row start
            blk_off = gcum[b_start] - gcum[rs]
            blk_tf_off = g_len[row_of_b] + (tcum[b_start] - tcum[rs])
            blk_dl_off = (
                g_len[row_of_b] + t_len[row_of_b] + (dcum[b_start] - dcum[rs])
            )
            blk_n = b_end - b_start
            metas = [
                {
                    "block_first": f, "block_last": l, "max_tf": mt,
                    "max_score": ms, "byte_offset": o, "tf_off": to,
                    "dl_off": do, "n_docs": nn,
                }
                for f, l, mt, ms, o, to, do, nn in zip(
                    blk_first.tolist(), blk_last.tolist(),
                    blk_max_tf.tolist(), blk_max_sc.tolist(),
                    blk_off.tolist(), blk_tf_off.tolist(),
                    blk_dl_off.tolist(), blk_n.tolist(),
                )
            ]
            yield pd.DataFrame(
                {
                    "term": pdf["term"].to_numpy(),
                    "shard": pdf["shard"].to_numpy(dtype=np.int32),
                    "df": pdf["df"].to_numpy(dtype=np.int64),
                    "cf": pdf["cf"].to_numpy(dtype=np.int64),
                    "n": n_r,
                    "payload": pay_bytes,
                    "block_meta": [
                        metas[cum_bc[r]:cum_bc[r + 1]] for r in range(R)
                    ],
                    "idf": pdf["idf"].to_numpy(dtype=np.float64),
                    "avgdl": pdf["avgdl"].to_numpy(dtype=np.float64),
                    "bucket": pdf["bucket"].to_numpy(dtype=np.int32),
                }
            )

    return kernel


def _bucket_col(n_buckets: int):
    # JVM-side crc32 — same value as postings.term_bucket (zlib.crc32)
    return F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(n_buckets)).cast(
        "int"
    )


def _copy_table(
    spark: SparkSession,
    src: Catalog,
    dst: Catalog,
    name: str,
    df: DataFrame | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Clone a table as ONE overwrite commit whose carried_tags keep the
    source's full tag history visible (resume/noop detection intact)."""
    tags = src.committed_tags(name)
    return dst.write(
        name,
        df if df is not None else src.read(spark, name),
        mode="overwrite",
        partition_by=partition_by,
        tag=tags[0] if tags else None,
        carried_tags=tags[1:] if len(tags) > 1 else None,
    )


def reindex(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    *,
    block_size: int | None = None,
    term_buckets: int | None = None,
    k1: float | None = None,
    b: float | None = None,
) -> dict:
    """Rewrite the index at ``src_root`` into ``dst_root`` under new
    layout/scoring parameters (None = keep the source's). Query results
    on the destination are bitwise-identical to the source when only
    ``block_size``/``term_buckets`` change, and bitwise-identical to a
    fresh build at the new ``k1``/``b`` when those change."""
    t0 = time.time()
    src = Catalog(src_root)
    dst = Catalog(dst_root)
    if dst.exists("segments"):
        raise ValueError(f"destination index already exists at {dst_root}")
    props = src.get_properties() or {}
    persisted = props.get("index_config")
    if not persisted or not src.exists("segments"):
        raise ValueError(f"no index at {src_root}")
    known = {
        k: v for k, v in persisted.items()
        if k in IndexConfig.__dataclass_fields__
    }
    src_cfg = IndexConfig(**known)
    overrides = {
        f: v
        for f, v in (
            ("block_size", block_size), ("term_buckets", term_buckets),
            ("k1", k1), ("b", b),
        )
        if v is not None
    }
    dst_cfg = replace(src_cfg, **overrides)
    if dst_cfg.block_size < 1 or dst_cfg.term_buckets < 1:
        raise ValueError("block_size and term_buckets must be >= 1")

    # properties first: any partially-written destination already
    # declares its semantic config (readers refuse mismatched cfgs)
    dst_props = dict(props)
    dst_props["index_config"] = asdict(dst_cfg)
    for stale in ("dictionary_state", "positions_state", "trigrams_state",
                  "deletions_state", "bigrams_state", "sort_index_state",
                  "stems_state"):
        # sort_index_state: the sorted sibling is NOT cloned and its
        # recorded docs_version could collide with the destination's
        # fresh version 1 — dropping it forces a rebuild at dst
        dst_props.pop(stale, None)
    dst.set_properties(dst_props)

    # dimension/metadata tables: single-commit clones with tag carry
    _copy_table(spark, src, dst, "docs")
    stats_tags = src.committed_tags("stats")
    dst.write_local(
        "stats",
        [r.asDict() for r in src.read(spark, "stats").collect()],
        mode="overwrite",
        tag=stats_tags[0] if stats_tags else None,
        carried_tags=stats_tags[1:] if len(stats_tags) > 1 else None,
    )
    copied = ["docs", "stats"]
    for name in ("deletes", "dictionary", "synonyms", "deletions",
                 "unigrams", "bigrams", "stems"):
        if src.exists(name):
            _copy_table(spark, src, dst, name)
            copied.append(name)

    # segments: the one distributed re-layout pass. New bucket column
    # JVM-side, ONE exchange into the new partitioning, payload bytes
    # carried untouched through the Arrow kernel.
    segs = (
        src.read(spark, "segments")
        .withColumn("bucket", _bucket_col(dst_cfg.term_buckets))
        # AQE-coalescible: see postings.merge_segments
        .repartition("bucket")
        .mapInPandas(
            _reblock_kernel(dst_cfg.block_size, dst_cfg.k1, dst_cfg.b),
            schema=SEGMENT_SCHEMA,
        )
    )
    obs = Observation("reindex-segments")
    segs = segs.observe(
        obs, F.count("*").alias("rows"), F.sum("n").alias("postings")
    )
    seg_tags = src.committed_tags("segments")
    seg_ver = dst.write(
        "segments", segs, mode="overwrite", partition_by=["bucket"],
        tag=seg_tags[0] if seg_tags else None,
        carried_tags=seg_tags[1:] if len(seg_tags) > 1 else None,
    )
    got = obs.get

    # sibling indexes: payloads are self-describing (block_meta in-row);
    # only the bucket partition column depends on term_buckets
    if src.exists("pos_segments") and props.get("positions_state"):
        pos = (
            src.read(spark, "pos_segments")
            .withColumn("bucket", _bucket_col(dst_cfg.term_buckets))
            .repartition("bucket")
        )
        _copy_table(
            spark, src, dst, "pos_segments", df=pos, partition_by=["bucket"]
        )
        st = dict(props["positions_state"])
        st["docs_version"] = dst.current_version("docs")
        st["term_buckets"] = dst_cfg.term_buckets
        dst_props["positions_state"] = st
        copied.append("pos_segments")
    if src.exists("tri_segments") and props.get("trigrams_state"):
        tri = (
            src.read(spark, "tri_segments")
            .withColumn(
                "bucket",
                F.pmod(F.col("tri"), F.lit(dst_cfg.term_buckets)).cast("int"),
            )
            .repartition("bucket")
        )
        _copy_table(
            spark, src, dst, "tri_segments", df=tri, partition_by=["bucket"]
        )
        st = dict(props["trigrams_state"])
        st["docs_version"] = dst.current_version("docs")
        st["term_buckets"] = dst_cfg.term_buckets
        dst_props["trigrams_state"] = st
        copied.append("tri_segments")
    if "dictionary" in copied and props.get("dictionary_state"):
        dst_props["dictionary_state"] = {"segments_version": seg_ver}
    if "stems" in copied and props.get("stems_state"):
        # re-layout never changes the term set, so the carried stems
        # sibling stays semantically fresh — re-stamp to the dst version
        dst_props["stems_state"] = {"segments_version": seg_ver}
    if "deletions" in copied and props.get("deletions_state"):
        dst_props["deletions_state"] = {
            "dictionary_version": dst.current_version("dictionary")
        }
    if "bigrams" in copied and props.get("bigrams_state"):
        st = dict(props["bigrams_state"])
        st["docs_version"] = dst.current_version("docs")
        dst_props["bigrams_state"] = st
    dst.set_properties(dst_props)

    fp = ""
    for t in src.committed_tags("docs"):
        if t.get("fingerprint"):
            fp = t["fingerprint"]
            break
    from .index import IndexBuilder

    ib = IndexBuilder(spark, dst_root, dst_cfg)
    ib._ckpt(
        "reindex", fp,
        rows_in=int(got["rows"] or 0),
        postings_out=int(got["postings"] or 0),
        wall_ms=int((time.time() - t0) * 1000),
    )
    return {
        "src": src_root,
        "dst": dst_root,
        "changed": overrides,
        "config": asdict(dst_cfg),
        "tables": copied + ["segments"],
        "segment_rows": int(got["rows"] or 0),
        "postings": int(got["postings"] or 0),
        "wall_s": round(time.time() - t0, 2),
    }
