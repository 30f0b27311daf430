"""Index build orchestration: staged, resumable, instrumented.

SURVEY.md §3.1 pipeline + §2.1 S3/S4 + §2.4 A6. The build is split into
checkpointable units (BASELINE.json:6 "resumable from per-partition
checkpoints in Iceberg with lineage and metrics"):

* stage ``docs``   — ingest, doc_id mint, sha256, tokenize, TF staging
* stage ``grp-K``  — K = 0..build_groups-1: salted local-segment encode +
  sort-merge + bucketed segment publish for the term-hash groups in K

Exactly-once resume: each unit's output is committed as ONE tagged
catalog snapshot ``{unit, fingerprint}``; on restart, units whose tag is
already committed for the same input fingerprint are anti-joined out of
the work set. A crash after the data write but before the manifest commit
leaves only an unlisted orphan dir, so re-running the unit cannot
double-publish. The ``checkpoints`` table carries lineage + metrics
(docs/s, postings/s, bytes/partition, skew ratio) per unit.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .config import IndexConfig
from .corpus import CORPUS_COLS, check_sha256
from .ids import KEY
from .postings import merge_segments
from .stats import corpus_stats

CKPT_SCHEMA = (
    "run_id string, unit string, status string, rows_in long, postings_out long, "
    "bytes_out long, n_terms long, wall_ms long, skew_ratio double, "
    "input_fingerprint string, ts double"
)


def corpus_fingerprint(corpus: DataFrame, with_bytes: bool = False):
    """Order/partitioning-invariant content fingerprint of the raw corpus:
    row count + commutative mixes of per-row xxhash64 over the natural key
    and the content sha. Deliberately avoids the tokenize pipeline so a
    resumed build can decide stage reuse without re-running ingest.

    ``with_bytes=True`` additionally returns total content bytes (same
    scan, one extra agg column) — the build derives its sort partition
    count from DATA SIZE, never from core count, so a bigger cluster does
    identical work on identical input (strong-scaling invariant)."""
    row = corpus.select(
        F.xxhash64(
            "repo", "path", "commit", F.sha2(F.col("content"), 256)
        ).alias("h"),
        F.octet_length("content").alias("b"),
    ).agg(
        F.count("*").alias("c"),
        F.expr("bit_xor(h)").alias("x"),
        F.sum(F.pmod(F.col("h"), F.lit(2_147_483_647))).alias("m"),
        F.sum("b").alias("bytes"),
    ).collect()[0]
    fp = f"{row['c']}-{row['x']}-{row['m']}"
    if with_bytes:
        return fp, int(row["bytes"] or 0)
    return fp


def _estimate_content_bytes(corpus: DataFrame) -> int | None:
    """Zero-job estimate of raw content bytes for sort-partition sizing,
    from the source files' on-disk sizes (driver-side listing only).
    Deterministic for the same input regardless of cluster size, so the
    strong-scaling invariant (partitions from DATA, never cores) holds.
    Returns None when the corpus is not a locally-stat-able file scan
    (computed/in-memory sources must measure with the fingerprint scan).
    The parquet->raw ratio only shifts partition FATNESS around the
    configured target; any value is correct (the kernel streams fixed
    Arrow batches and the sort spills), so a coarse default is fine."""
    try:
        files = corpus.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for u in files:
        p = u
        if p.startswith("file:"):
            p = p[5:]
            while p.startswith("//"):
                p = p[1:]
        elif "://" in p:
            return None
        try:
            total += os.path.getsize(p)
        except OSError:
            return None
    return int(total * float(os.environ.get("YASE_PARQUET_RAW_RATIO", "2.5")))


class IndexBuilder:
    def __init__(self, spark: SparkSession, index_root: str, cfg: IndexConfig | None = None):
        self.spark = spark
        self.cfg = cfg or IndexConfig()
        self.cat = Catalog(index_root)
        self.run_id = uuid.uuid4().hex[:12]

    # ------------------------------------------------------------ lineage
    def _ckpt(self, unit: str, fp: str, **metrics) -> None:
        row = {
            "run_id": self.run_id,
            "unit": unit,
            "status": "done",
            "rows_in": int(metrics.get("rows_in", 0)),
            "postings_out": int(metrics.get("postings_out", 0)),
            "bytes_out": int(metrics.get("bytes_out", 0)),
            "n_terms": int(metrics.get("n_terms", 0)),
            "wall_ms": int(metrics.get("wall_ms", 0)),
            "skew_ratio": float(metrics.get("skew_ratio", 0.0)),
            "input_fingerprint": fp,
            "ts": time.time(),
        }
        # driver-side metadata commit (pyarrow, no Spark job — ~0.4 s of
        # fixed per-unit latency otherwise); append creates the table
        # when absent (decided under the commit lock — safe with
        # concurrent group threads)
        self.cat.write_local(
            "checkpoints", [row], mode="append", tag={"unit": unit, "fingerprint": fp}
        )

    def _commit_stats(self, stats: dict, fp_delta: str) -> None:
        self.cat.write_local(
            "stats",
            [{
                "n_docs": int(stats["n_docs"]),
                "total_tokens": int(stats["total_tokens"]),
                "avgdl": float(stats["avgdl"]),
            }],
            mode="overwrite",
            tag={"unit": f"stats-{fp_delta}", "payload": json.dumps(stats)},
        )

    def _done_units(self, table: str, fp: str) -> set[str]:
        return {
            t["unit"]
            for t in self.cat.committed_tags(table)
            if t.get("fingerprint") == fp and "unit" in t
        }

    # -------------------------------------------------------------- build
    def build(
        self,
        corpus: DataFrame,
        manifest: DataFrame | None = None,
        fail_after_units: int | None = None,
    ) -> dict:
        """``fail_after_units``: test-only crash injection — raise after N
        group units have committed, to exercise checkpoint resume."""
        cfg, cat, spark = self.cfg, self.cat, self.spark
        t0 = time.time()

        # pin the build's result-affecting parameters as catalog
        # properties (Iceberg: table properties) so readers can't
        # silently query with a mismatched term_buckets/k1/b/block_size
        from dataclasses import asdict

        prior = cat.get_properties()
        if prior and prior.get("index_config"):
            mism = {
                f: (prior["index_config"].get(f), getattr(cfg, f))
                for f in IndexConfig.SEMANTIC_FIELDS
                if prior["index_config"].get(f) != getattr(cfg, f)
            }
            if mism and cat.exists("segments"):
                raise ValueError(
                    f"index at {cat.root} was built with different semantic "
                    f"config {mism} (persisted vs requested); use a fresh "
                    "index_root or the persisted config"
                )
        cat.set_properties({"index_config": asdict(cfg)})

        if manifest is not None:
            violations = check_sha256(corpus, manifest)
            if violations:
                raise ValueError(
                    f"sha256 invariant violated on {violations} rows (must be 0)"
                )

        # ---- stage: docs + TF staging ---------------------------------
        # fingerprint needs docs; compute docs lazily but idempotently:
        # if a docs snapshot exists, validate its fingerprint tag instead
        # of re-ingesting.
        docs_tags = self.cat.committed_tags("docs")
        prior_fp = docs_tags[0].get("fingerprint") if docs_tags else None

        stage_t = time.time()
        # fat content rows -> small Arrow batches for the tokenize pass
        # (set explicitly: the postings-stage setting below persists on
        # the session across builds)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("YASE_ARROW_BATCH", "512"),
        )
        phase_t: dict[str, float] = {}

        def _mark(name: str, t_from: float) -> float:
            now = time.time()
            phase_t[name] = round(now - t_from, 2)
            return now

        # fingerprint scheduling (round-3 open item 1 — the scan was a
        # FIXED ~3 s per build that a bigger cluster cannot shrink):
        # * prior state on disk -> the resume decision needs fp BEFORE
        #   deciding whether to re-tokenize; pay the scan up front.
        # * fresh build over a file-backed corpus -> nothing reads fp
        #   until the local_segments manifest commit, so the scan runs in
        #   a driver thread CONCURRENT with the sampling/tokenize jobs
        #   (deferred commit tag) and the sort partition count comes from
        #   the source files' on-disk bytes.
        # * fresh build over a computed/in-memory corpus -> no file
        #   metadata to stat; pay the scan (status quo).
        fp = None
        fp_future = fp_ex = None
        est_bytes = _estimate_content_bytes(corpus) if prior_fp is None else None
        if est_bytes is None:
            fp, content_bytes = corpus_fingerprint(corpus, with_bytes=True)
            tcur = _mark("fingerprint", stage_t)
        else:
            from concurrent.futures import ThreadPoolExecutor

            content_bytes = est_bytes
            fp_ex = ThreadPoolExecutor(1)
            fp_future = fp_ex.submit(corpus_fingerprint, corpus, True)
            tcur = stage_t

        def _resolve_fp() -> str:
            nonlocal fp
            if fp is None:
                fp, _fp_bytes = fp_future.result()
                # overlapped with the tokenize write — no serial wall time
                phase_t["fingerprint"] = 0.0
            return fp

        if fp is not None and prior_fp == fp and cat.exists("local_segments"):
            docs = cat.read(spark, "docs")
            stats_tags = cat.committed_tags("stats")
            stats = (
                json.loads(stats_tags[0]["payload"])
                if stats_tags and "payload" in stats_tags[0]
                else corpus_stats(docs)
            )
            rebuilt_docs = False
        else:
            # SINGLE content pass after the ingest shuffle: the fused
            # kernel deduplicates, hashes, tokenizes, counts, and encodes
            # local segment runs with per-shard LOCAL doc ids (re-based
            # to global during the merge via the doclen-derived offsets);
            # doc metadata rides as DOCMETA pseudo-rows. There is no
            # content persist, no separate dedup or id-zip pass, and no
            # driver barrier between the shuffle and the kernel.
            from pyspark.sql import Observation

            from .corpus import (
                DOCLEN_TERM,
                DOCMETA_TERM,
                docs_from_meta,
                fused_local_segments,
                shard_offsets_from_doclens,
            )
            from .ids import KEY as _KEY

            # sort partition count from data size (content bytes measured
            # by the fingerprint scan), NOT core count: partitions define
            # runs-per-term in the merge, so a core-derived count makes a
            # 4N cluster do 4x the merge work (round-1 scaling inversion)
            n_part = max(16, min(4096, -(-content_bytes // cfg.sort_partition_bytes)))
            shuffled = (
                corpus.select(*CORPUS_COLS)
                .repartitionByRange(n_part, *_KEY)
                .sortWithinPartitions(*_KEY, "lang", "content")
            )
            from .analysis import chain_from_config

            local = fused_local_segments(
                shuffled, ngrams=cfg.ngrams, chain=chain_from_config(cfg)
            ).withColumn(
                "grp", F.pmod(F.xxhash64("term"), F.lit(cfg.build_groups)).cast("int")
            )
            # corpus totals ride the write action (zero extra pass): every
            # token lands in exactly one real term's cf_local, and the
            # DOCLEN dictionary rows carry deduped docs-per-shard — this
            # replaces the round-2 decode-doclens aggregation job.
            lobs = Observation("local-totals")
            local = local.observe(
                lobs,
                F.sum(
                    F.when(
                        ~F.col("term").isin(DOCLEN_TERM, DOCMETA_TERM),
                        F.col("cf_local"),
                    )
                ).alias("tok"),
                F.sum(
                    F.when(F.col("term") == DOCLEN_TERM, F.col("df_local"))
                ).alias("docs"),
            )
            cat.write(
                "local_segments", local, mode="overwrite", partition_by=["grp"],
                tag=lambda: {"unit": "local_segments", "fingerprint": _resolve_fp()},
            )
            if fp_ex is not None:
                _resolve_fp()
                fp_ex.shutdown()
            tcur = _mark("tokenize_encode_write", tcur)

            staged = cat.read(spark, "local_segments")
            # partition-prune the pseudo-term reads to their grp dirs
            # (term-only predicates don't prune the grp layout)
            g_doclen, g_docmeta = (
                spark.range(1).select(
                    F.pmod(F.xxhash64(F.lit(DOCLEN_TERM)), F.lit(cfg.build_groups))
                    .cast("int").alias("a"),
                    F.pmod(F.xxhash64(F.lit(DOCMETA_TERM)), F.lit(cfg.build_groups))
                    .cast("int").alias("b"),
                ).collect()[0]
            )
            # per-shard doc-count offsets: one tiny collect over the
            # pruned doclen dictionary rows (no payload decode)
            offsets, n_total = shard_offsets_from_doclens(
                staged.filter(
                    (F.col("grp") == g_doclen) & (F.col("term") == DOCLEN_TERM)
                ).select("shard", "df_local").collect()
            )
            got_totals = lobs.get
            if int(got_totals["docs"] or 0) != n_total:
                raise RuntimeError(
                    f"doc-count mismatch: write observed "
                    f"{got_totals['docs']} docs vs doclen dictionary {n_total}"
                )
            total_tok = int(got_totals["tok"] or 0)
            stats = {
                "n_docs": n_total,
                "total_tokens": total_tok,
                "avgdl": (float(total_tok) / n_total if n_total else 0.0),
            }
            tcur = _mark("doclen_stats", tcur)

            def docs_stage() -> None:
                # no join: doc_len rides inside the DOCMETA chunks
                dt0 = time.time()
                docs = docs_from_meta(
                    staged.filter(F.col("grp") == g_docmeta), offsets
                )
                cat.write(
                    "docs", docs, mode="overwrite",
                    tag={"unit": "docs", "fingerprint": fp},
                )
                self._ckpt(
                    "docs", fp, rows_in=stats["n_docs"], postings_out=0,
                    wall_ms=(time.time() - dt0) * 1000,
                )
                phase_t["docs_write"] = round(time.time() - dt0, 2)

            rebuilt_docs = True

        # stats is (re-)committed when docs were rebuilt OR when a prior
        # run crashed between the docs commit and the stats commit: the
        # resume branch is taken forever after (prior_fp == fp), so gating
        # this write on rebuilt_docs alone would leave the index
        # permanently unreadable (IndexReader requires the stats table).
        if rebuilt_docs or not cat.exists("stats"):
            cat.write_local(
                "stats",
                [{
                    "n_docs": int(stats["n_docs"]),
                    "total_tokens": int(stats["total_tokens"]),
                    "avgdl": float(stats["avgdl"]),
                }],
                mode="overwrite",
                tag={"unit": "stats", "fingerprint": fp, "payload": json.dumps(stats)},
            )
        # ---- stage: per-group segment build (resumable units) ---------
        done = self._done_units("segments", fp) if not rebuilt_docs else set()
        if rebuilt_docs and cat.exists("segments"):
            cat.drop("segments")  # stale segments from a different corpus

        staged_local = cat.read(spark, "local_segments")
        n_docs = stats["n_docs"]

        # per-stage Arrow batch sizing (runtime conf, read per action):
        # the tokenize pass wants small batches (fat content rows — large
        # transient arrays per batch), the merge pass wants large ones
        # (thin rows — per-batch Python call overhead would dominate)
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("YASE_ARROW_BATCH_POSTINGS", "16384"),
        )

        from .corpus import DOCLEN_TERM, DOCMETA_TERM, shard_offsets_from_doclens

        if rebuilt_docs:
            merge_offsets = offsets
        else:
            # resume: the committed local runs carry LOCAL ids; recompute
            # the per-shard bases from the doclen dictionary rows
            merge_offsets, _ = shard_offsets_from_doclens(
                staged_local.filter(F.col("term") == DOCLEN_TERM)
                .select("shard", "df_local").collect()
            )

        def build_group(g: int) -> dict:
            unit = f"grp-{g}"
            gt = time.time()
            local = staged_local.filter(
                (F.col("grp") == g)
                & (F.col("term") != DOCLEN_TERM)
                & (F.col("term") != DOCMETA_TERM)
            ).drop("grp")
            segs = merge_segments(
                local, n_docs, stats["avgdl"], cfg,
                merge_cap=cfg.merge_cap, shard_offsets=merge_offsets,
            )
            # totals ride along with the write action (Observation —
            # accumulator-backed, zero extra pass); per-bucket skew comes
            # from the committed data files' sizes (no aggregation job).
            # Round 1 persisted the segments and ran a second groupBy
            # pass per unit purely for lineage metrics — measured as pure
            # scaling-efficiency drain.
            from pyspark.sql import Observation

            obs = Observation(f"grp-{g}-metrics")
            segs = segs.observe(
                obs,
                F.sum("n").alias("p"),
                F.sum(F.octet_length("payload")).alias("b"),
                F.count("*").alias("t"),
            )
            ver = cat.write(
                "segments", segs, mode="append", partition_by=["bucket"],
                tag={"unit": unit, "fingerprint": fp},
            )
            got = obs.get
            sizes = list(cat.data_dir_sizes("segments", ver).values()) or [0]
            skew = (max(sizes) / (sum(sizes) / len(sizes))) if sum(sizes) else 0.0
            gm = dict(
                rows_in=int(got["p"] or 0),
                postings_out=int(got["p"] or 0),
                bytes_out=int(got["b"] or 0),
                n_terms=int(got["t"] or 0),
                wall_ms=(time.time() - gt) * 1000,
                skew_ratio=skew,
            )
            self._ckpt(unit, fp, **gm)
            return gm

        units = [g for g in range(cfg.build_groups) if f"grp-{g}" not in done]
        groups_t0 = time.time()
        group_metrics = []
        if fail_after_units is not None:
            # crash-injection path stays sequential so "N units committed"
            # is well-defined for the resume test
            if rebuilt_docs:
                docs_stage()
            for g in units:
                group_metrics.append(build_group(g))
                if len(group_metrics) >= fail_after_units:
                    raise RuntimeError(f"injected crash after {fail_after_units} units")
        elif units or rebuilt_docs:
            # concurrent group units (+ the docs-table write, which only
            # the doclen decode gated — stats came from the pseudo-term
            # directly): Spark interleaves their jobs' tasks, so per-job
            # fixed latency (scheduling, commit, tiny stages) no longer
            # serializes the build (scaling-efficiency lever)
            from concurrent.futures import ThreadPoolExecutor

            workers = max(1, min(cfg.parallel_units, len(units))) + int(rebuilt_docs)
            with ThreadPoolExecutor(workers) as ex:
                docs_future = ex.submit(docs_stage) if rebuilt_docs else None
                group_metrics = list(ex.map(build_group, units))
                if docs_future is not None:
                    docs_future.result()
        phase_t["groups_total"] = round(time.time() - groups_t0, 2)
        # build-completion marker (ADVICE round 2, medium): every group
        # unit for this fingerprint is now committed. Streaming ingest
        # gates its bootstrap-vs-append decision on THIS, not on
        # cat.exists("segments") — a crash after >=1 group commit leaves
        # segments existing but incomplete, and an append against it
        # would silently lose the uncommitted groups' terms forever
        # (the left-anti docs join sees nothing new to re-tokenize).
        # Idempotent: a resumed build with zero remaining units still
        # lands here and (re-)writes the marker.
        props = cat.get_properties() or {}
        props["build_complete_fp"] = fp
        cat.set_properties(props)
        wall_s = time.time() - t0
        summary = {
            "run_id": self.run_id,
            "fingerprint": fp,
            "n_docs": stats["n_docs"],
            "avgdl": stats["avgdl"],
            "total_tokens": stats["total_tokens"],
            "wall_s": wall_s,
            "docs_per_s": stats["n_docs"] / wall_s if wall_s else 0.0,
            "postings": sum(m["postings_out"] for m in group_metrics),
            "postings_per_s": (
                sum(m["postings_out"] for m in group_metrics) / wall_s if wall_s else 0.0
            ),
            "groups_built": len(group_metrics),
            "skew_ratio": max((m["skew_ratio"] for m in group_metrics), default=0.0),
            "phases": phase_t,
        }
        return summary


    # ------------------------------------------------------------ deletes
    def delete(self, doc_ids=None, predicate=None) -> dict:
        """Logical (tombstone) delete — the Iceberg positional-delete /
        Lucene liveDocs analogue. Appends doc ids to the ``deletes``
        table; queries exclude them immediately (``IndexReader`` masks
        tombstoned postings at decode), while collection statistics
        (n_docs, avgdl, df/idf) keep their encode-time values until
        :meth:`apply_deletes` — exactly Lucene's semantics, where a
        deleted doc stops matching at once but affects stats until the
        segments merge. Cost ∝ tombstones, never ∝ index.

        Exactly one of ``doc_ids`` (iterable of ints) or ``predicate``
        (SQL string over the docs table's columns, e.g.
        ``"lang = 'java'"`` or ``"repo = 'r7' and path like 'x/%'"``)."""
        spark, cat = self.spark, self.cat
        if (doc_ids is None) == (predicate is None):
            raise ValueError("pass exactly one of doc_ids / predicate")
        docs = cat.read(spark, "docs")
        ids_df = (
            docs.filter(predicate).select("doc_id")
            if predicate is not None
            else spark.createDataFrame(
                [(int(d),) for d in doc_ids], schema="doc_id long"
            ).join(docs.select("doc_id"), "doc_id", "left_semi")
        )
        if cat.exists("deletes"):
            ids_df = ids_df.join(cat.read(spark, "deletes"), "doc_id", "left_anti")
        ids_df = ids_df.distinct()
        n = ids_df.count()
        if n:
            cat.write(
                "deletes", ids_df, mode="append",
                tag={"unit": f"delete-{self.run_id}-{n}"},
            )
        return {"tombstoned": int(n)}

    def apply_deletes(self) -> dict:
        """Physical compaction of tombstones (Lucene segment merge /
        Iceberg rewrite-data-files): one dictionary-sized shuffle
        recomputes per-term surviving df, then ONE map-only pass over
        segment rows decodes, drops tombstoned postings, and re-encodes
        payload + block-max bounds under the POST-delete global stats;
        the docs table is filtered, stats recomputed, and the tombstone
        table cleared. Doc ids are RENUMBERED densely and
        order-preservingly (``new = old - #tombstones_below(old)`` — a
        broadcast searchsorted, no driver mapping), the Lucene-merge
        analogue: the engine's invariant ``max(doc_id) == n_docs`` (the
        dense accumulator and the sharded doc-range bounds rely on it)
        holds again, and because the mapping is strictly monotone the
        (score DESC, doc_id ASC) tie-break order is preserved.
        Afterwards results and scores are bitwise what a fresh build
        over the remaining corpus produces (matched by natural key;
        tests/test_deletes.py), and every pruned query lane (lazy WAND,
        block-selected, sharded WAND kernel) is re-enabled. No payload
        ever shuffles: the df fix-up moves (term, count) rows only."""
        import pandas as pd

        from .codec import decode_postings, encode_postings

        spark, cat, cfg = self.spark, self.cat, self.cfg
        if not cat.exists("deletes"):
            return {"applied": 0}
        t0 = time.time()
        dels = np.unique(
            np.asarray(
                [r["doc_id"] for r in cat.read(spark, "deletes").collect()],
                dtype=np.int64,
            )
        )
        if dels.size == 0:
            cat.drop("deletes")
            return {"applied": 0}
        docs = cat.read(spark, "docs")
        new_docs = docs.join(cat.read(spark, "deletes"), "doc_id", "left_anti")
        srow = new_docs.agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("s")
        ).collect()[0]
        n_docs2, total2 = int(srow["n"]), int(srow["s"] or 0)
        if n_docs2 == 0:
            raise ValueError(
                "apply_deletes would drop every document; rebuild instead"
            )
        avgdl2 = total2 / n_docs2
        bdel = spark.sparkContext.broadcast(dels)
        segs = cat.read(spark, "segments")

        # order-preserving dense renumbering (Lucene-merge analogue)
        def _remap_docs(batches):
            for pdf in batches:
                a = pdf["doc_id"].to_numpy(dtype=np.int64)
                yield pdf.assign(
                    doc_id=a - np.searchsorted(bdel.value, a, side="left")
                )

        new_docs = new_docs.mapInPandas(_remap_docs, schema=new_docs.schema)

        def surv(batches):
            for pdf in batches:
                out = {"term": [], "nsv": []}
                for r in pdf.itertuples():
                    ids, _tf, _dl = decode_postings(bytes(r.payload), int(r.n))
                    out["term"].append(r.term)
                    out["nsv"].append(
                        int(ids.size)
                        - int(np.isin(ids, bdel.value, assume_unique=True).sum())
                    )
                if out["term"]:
                    yield pd.DataFrame(out)

        df_new = (
            segs.select("term", "n", "payload")
            .mapInPandas(surv, schema="term string, nsv long")
            .groupBy("term")
            .agg(F.sum("nsv").alias("df_new"))
        )

        k1, b_, bs = cfg.k1, cfg.b, cfg.block_size
        meta_t = (
            "array<struct<block_first:long,block_last:long,max_tf:int,"
            "max_score:double,byte_offset:long,tf_off:long,dl_off:long,"
            "n_docs:int>>"
        )

        def rewrite(batches):
            for pdf in batches:
                out = {
                    "term": [], "shard": [], "df": [], "cf": [], "n": [],
                    "payload": [], "block_meta": [], "idf": [], "avgdl": [],
                    "bucket": [],
                }
                for r in pdf.itertuples():
                    ids, tfs, dls = decode_postings(bytes(r.payload), int(r.n))
                    keep = ~np.isin(ids, bdel.value, assume_unique=True)
                    if not keep.any():
                        continue  # the whole row's postings were deleted
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    # strictly monotone renumbering keeps ids sorted, so
                    # the delta chain stays valid
                    ids = ids - np.searchsorted(bdel.value, ids, side="left")
                    df_g = int(r.df_new)
                    idf = math.log(1.0 + (n_docs2 - df_g + 0.5) / (df_g + 0.5))
                    payload, metas = encode_postings(
                        ids, tfs, dls, block_size=bs, idf=idf, k1=k1, b=b_,
                        avgdl=avgdl2,
                    )
                    out["term"].append(r.term)
                    out["shard"].append(int(r.shard))
                    out["df"].append(df_g)
                    out["cf"].append(int(tfs.sum()))
                    out["n"].append(int(ids.size))
                    out["payload"].append(payload)
                    out["block_meta"].append(metas)
                    out["idf"].append(idf)
                    out["avgdl"].append(avgdl2)
                    out["bucket"].append(int(r.bucket))
                if out["term"]:
                    yield pd.DataFrame(out)

        new_segs = segs.join(df_new, "term").mapInPandas(
            rewrite,
            schema=(
                "term string, shard int, df long, cf long, n long, "
                f"payload binary, block_meta {meta_t}, idf double, "
                "avgdl double, bucket int"
            ),
        )
        cat.write(
            "segments", new_segs, mode="overwrite", partition_by=["bucket"],
            tag={"unit": f"compact-deletes-{self.run_id}"},
        )
        cat.write(
            "docs", new_docs, mode="overwrite",
            tag={"unit": f"docs-compact-{self.run_id}"},
        )
        if cat.exists("pos_segments"):
            # the positional sibling index (positions.py) shares doc ids;
            # rewrite it under the same tombstone set + renumbering so
            # phrase queries stay valid after compaction
            from .positions import compact_positions

            compact_positions(spark, cat, cfg, dels)
        if cat.exists("tri_segments"):
            # ditto for the trigram sibling index (grep.py)
            from .grep import compact_trigrams

            compact_trigrams(spark, cat, cfg, dels)
        self._commit_stats(
            {"n_docs": n_docs2, "total_tokens": total2, "avgdl": avgdl2},
            f"apply-deletes-{self.run_id}",
        )
        cat.drop("deletes")
        self._ckpt(
            f"apply-deletes-{self.run_id}", "-", rows_in=int(dels.size),
            wall_ms=(time.time() - t0) * 1000,
        )
        return {"applied": int(dels.size), "n_docs": n_docs2}

    # -------------------------------------------------------- force merge
    def force_merge(self) -> dict:
        """Lucene ``forceMerge(1)`` at segment-ROW granularity: coalesce
        every term's shard-split segment rows (terms above ``merge_cap``
        postings keep one row per doc-range shard — postings.py
        ``MERGE_CAP``) into ONE row per term. Pure byte concatenation
        (``codec.concat_segment_rows``): no posting is decoded, one gap
        varint is rewritten per row boundary, block bounds/idf/avgdl are
        carried unchanged (rows of one term share encode-time stats by
        construction — every path that writes multi-row terms re-encodes
        the whole term under one (idf, avgdl); asserted executor-side).

        Serving wins: the per-term metadata/payload fetch returns one
        row instead of R, the reader's shard-ordered concat disappears,
        and the dictionary shrinks — the read-optimize step a serving
        fleet runs after heavy append traffic, exactly Lucene's use.

        Bucket-level COW like ``append``: only buckets holding a
        multi-row term are rewritten (their single-row terms ride
        through verbatim); untouched buckets keep their committed
        parquet files byte-identical. Idempotent: a second call finds no
        multi-row terms and no-ops without a commit."""
        import pandas as pd

        from .codec import concat_segment_rows
        from .postings import SEGMENT_SCHEMA

        cfg, cat, spark = self.cfg, self.cat, self.spark
        t0 = time.time()
        if not cat.exists("segments"):
            raise ValueError("force_merge requires an existing index")
        segs = cat.read(spark, "segments")
        multi = (
            segs.groupBy("bucket", "term")
            .agg(F.count("*").alias("rows"))
            .filter(F.col("rows") > 1)
        )
        # dictionary-sized collect: (bucket, term) pairs of split terms
        pairs = multi.select("bucket", "term").collect()
        if not pairs:
            return {"run_id": self.run_id, "merged_terms": 0, "noop": True}
        affected_buckets = sorted({int(r["bucket"]) for r in pairs})
        mterms = spark.createDataFrame(
            [(r["term"],) for r in pairs], schema="term string"
        )
        in_aff = segs.filter(F.col("bucket").isin(affected_buckets))
        to_merge = in_aff.join(F.broadcast(mterms), "term", "left_semi")

        def merge_rows(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("shard")
            idf0 = float(pdf["idf"].iloc[0])
            av0 = float(pdf["avgdl"].iloc[0])
            if not ((pdf["idf"] == idf0).all() and (pdf["avgdl"] == av0).all()):
                raise ValueError(
                    f"term {pdf['term'].iloc[0]!r}: shard rows carry "
                    "mixed encode-time stats; refusing a bound-corrupting "
                    "merge"
                )
            parts = [
                (bytes(p), list(m))
                for p, m in zip(pdf["payload"], pdf["block_meta"])
            ]
            payload, metas = concat_segment_rows(parts)
            return pd.DataFrame(
                [
                    {
                        "term": pdf["term"].iloc[0],
                        "shard": 0,
                        "df": int(pdf["df"].iloc[0]),
                        "cf": int(pdf["cf"].iloc[0]),
                        "n": int(pdf["n"].sum()),
                        "payload": payload,
                        "block_meta": metas,
                        "idf": idf0,
                        "avgdl": av0,
                        "bucket": int(pdf["bucket"].iloc[0]),
                    }
                ]
            )

        merged = to_merge.groupBy("term").applyInPandas(
            merge_rows, schema=SEGMENT_SCHEMA
        )
        passthrough = in_aff.join(
            F.broadcast(mterms), "term", "left_anti"
        ).select(*merged.columns)
        final = merged.unionByName(passthrough)
        unit = f"forcemerge-v{cat.current_version('segments')}"
        cat.write(
            "segments", final, mode="append", partition_by=["bucket"],
            replace_partitions={"bucket": affected_buckets},
            tag={"unit": unit},
        )
        wall = time.time() - t0
        self._ckpt(unit, "-", rows_in=len(pairs), wall_ms=wall * 1000)
        return {
            "run_id": self.run_id,
            "merged_terms": len(pairs),
            "affected_buckets": len(affected_buckets),
            "wall_s": wall,
            "noop": False,
        }

    # -------------------------------------------------------------- vacuum
    def vacuum(self, keep_last: int = 1) -> dict:
        """Iceberg ``expireSnapshots`` over every table of this index
        (segments, docs, stats, positions/trigram/dictionary siblings,
        checkpoints, …): retain the newest ``keep_last`` snapshots per
        table, drop expired manifests, physically delete data no
        retained snapshot can read — including bucket partition dirs
        superseded by copy-on-write appends / force-merges, the main
        space leak of a long-lived index under write traffic. Current
        reads are bit-identical before/after; resume tags are carried
        (catalog.expire_snapshots). Returns per-table stats plus
        totals."""
        per_table = {
            t: self.cat.expire_snapshots(t, keep_last=keep_last)
            for t in self.cat.tables()
        }
        return {
            "run_id": self.run_id,
            "keep_last": keep_last,
            "tables": per_table,
            "freed_bytes": sum(s["freed_bytes"] for s in per_table.values()),
            "deleted_dirs": sum(s["deleted_dirs"] for s in per_table.values()),
            "deleted_partitions": sum(
                s["deleted_partitions"] for s in per_table.values()
            ),
        }

    # ------------------------------------------------------------- append
    def append(self, delta: DataFrame) -> dict:
        """Incremental corpus append (SURVEY.md §2.9: "incremental
        re-index = append new corpus snapshot + rebuild affected buckets").

        Only the delta is tokenized; segments are rewritten copy-on-write
        at BUCKET granularity (Iceberg: dynamic partition overwrite —
        VERDICT round 2 item 2): terms touched by the delta are re-merged
        from (old global row as run 0) + (delta local segments as run 1)
        — delta doc_ids are strictly larger, so the merge stays an
        ordered concat; untouched terms in AFFECTED buckets are carried
        through the write verbatim (no re-encode); buckets containing no
        affected term keep their previously committed parquet files
        byte-for-byte (the partition-replace commit lists the old data
        dirs with the affected buckets excluded). Stored block
        max_score/idf/avgdl of carried rows go stale under the new global
        stats, which is safe: the eager reader recomputes bounds from
        decoded postings, and the lazy paths rescale by
        (idf_now/idf_stored)·max(1, avgdl_now/avgdl_stored) (query.py).
        Cost ∝ delta + affected buckets' rows, never ∝ old corpus: at
        real scale ``term_buckets`` is sized (2^10..2^14) so a small
        delta touches a small bucket fraction.

        Idempotent: a delta whose tagged segments snapshot already
        committed is a no-op; a crash between the docs append and the
        segments commit resumes by re-reading the tagged delta commits.
        """
        cfg, cat, spark = self.cfg, self.cat, self.spark
        t0 = time.time()
        if not cat.exists("segments"):
            raise ValueError("append requires an existing index (run build first)")

        fp_delta, delta_bytes = corpus_fingerprint(delta, with_bytes=True)
        seg_units = {t.get("unit") for t in cat.committed_tags("segments")}
        if f"append-{fp_delta}" in seg_units:
            # heal a crash between the segments overwrite and the stats
            # commit: segments are the new generation but stats are stale
            stats_units = {t.get("unit") for t in cat.committed_tags("stats")}
            if f"stats-{fp_delta}" not in stats_units:
                self._commit_stats(corpus_stats(cat.read(spark, "docs")), fp_delta)
            return {"run_id": self.run_id, "appended_docs": 0, "noop": True}

        docs_old = cat.read(spark, "docs")
        docs_units = {t.get("unit") for t in cat.committed_tags("docs")}
        docs_unit = f"append-docs-{fp_delta}"

        from .corpus import (
            DOCLEN_TERM,
            DOCMETA_TERM,
            docs_from_meta,
            fused_local_segments,
            shard_offsets_from_doclens,
        )
        from .ids import KEY as _KEY

        if docs_unit in docs_units:
            # crash-resume: delta docs + local segments already committed.
            # The pre-delta id base is recoverable from the tagged docs
            # commit itself (delta ids are contiguous above it).
            docs_new = cat.read_tagged_commit(spark, "docs", docs_unit)
            staged_delta = cat.read_tagged_commit(spark, "local_segments", docs_unit)
            offsets_local, appended = shard_offsets_from_doclens(
                staged_delta.filter(F.col("term") == DOCLEN_TERM)
                .select("shard", "df_local").collect()
            )
            min_new = docs_new.agg(F.min("doc_id")).collect()[0][0]
            old_max = int(min_new) - 1 if min_new is not None else 0
        else:
            old_max = int(docs_old.agg(F.max("doc_id")).collect()[0][0] or 0)
            fresh = delta.select(*CORPUS_COLS).join(
                docs_old.select("repo", "path", "commit"), KEY, "left_anti"
            )
            # same single-content-pass kernel as build(): range shuffle ->
            # fused dedup+sha+tokenize+encode with LOCAL per-shard ids;
            # docs dimension rides as DOCMETA pseudo-rows. Delta runs are
            # rebased above old_max during the merge below.
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("YASE_ARROW_BATCH", "512"),
            )
            n_part = max(
                4, min(4096, -(-int(delta_bytes) // cfg.sort_partition_bytes))
            )
            shuffled = (
                fresh.repartitionByRange(n_part, *_KEY)
                .sortWithinPartitions(*_KEY, "lang", "content")
            )
            from .analysis import chain_from_config

            delta_local = fused_local_segments(
                shuffled, ngrams=cfg.ngrams, chain=chain_from_config(cfg)
            ).withColumn(
                "grp", F.pmod(F.xxhash64("term"), F.lit(cfg.build_groups)).cast("int")
            )
            # row count rides the write action (Observation, no extra
            # pass): a fully-duplicate delta — the exactly-once replay
            # case — produces ZERO local rows, and the early-out below
            # must fire before trying to re-read the empty commit
            from pyspark.sql import Observation

            obs = Observation(f"append-{fp_delta}-rows")
            delta_local = delta_local.observe(obs, F.count("*").alias("rows"))
            cat.write(
                "local_segments", delta_local, mode="append", partition_by=["grp"],
                tag={"unit": docs_unit},
            )
            if int(obs.get["rows"] or 0) == 0:
                return {"run_id": self.run_id, "appended_docs": 0, "noop": True}
            staged_delta = cat.read_tagged_commit(spark, "local_segments", docs_unit)
            offsets_local, appended = shard_offsets_from_doclens(
                staged_delta.filter(F.col("term") == DOCLEN_TERM)
                .select("shard", "df_local").collect()
            )
            docs_new = docs_from_meta(
                staged_delta, {s: o + old_max for s, o in offsets_local.items()}
            )
            cat.write("docs", docs_new, mode="append", tag={"unit": docs_unit})
            docs_new = cat.read_tagged_commit(spark, "docs", docs_unit)

        if not appended:
            # replayed/duplicate delta: the left-anti join found nothing
            # new — leave segments untouched (exactly-once replay path;
            # the empty tagged docs/local_segments commits above are
            # harmless and make the replay itself resumable)
            return {"run_id": self.run_id, "appended_docs": 0, "noop": True}

        # refreshed globals over the FULL corpus (committed AFTER the
        # segments replace below — a crash in between leaves old
        # segments + old stats, which is the consistent pre-append state;
        # the noop path above heals the reverse window)
        all_docs = cat.read(spark, "docs")
        stats = corpus_stats(all_docs)

        segs_old = cat.read(spark, "segments")
        delta_runs = (
            staged_delta.filter(
                (F.col("term") != DOCLEN_TERM) & (F.col("term") != DOCMETA_TERM)
            )
            .drop("grp")
            .withColumn("run_seq", F.lit(1))
        )
        affected = delta_runs.select("term").distinct()
        # buckets holding >=1 affected term (<= term_buckets values, tiny
        # collect); ONLY these partitions are rewritten
        affected_buckets = sorted(
            r["b"]
            for r in affected.select(
                F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(cfg.term_buckets))
                .cast("int").alias("b")
            ).distinct().collect()
        )

        old_runs = (
            segs_old.join(F.broadcast(affected), "term", "left_semi")
            .select(
                "term",
                F.col("shard").cast("int").alias("shard"),
                F.col("n").alias("df_local"),
                F.lit(0).cast("long").alias("cf_local"),
                "payload",
                F.lit(0).alias("run_seq"),
            )
        )
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("YASE_ARROW_BATCH_POSTINGS", "16384"),
        )
        # only generation-1 (delta) runs carry LOCAL ids; generation-0
        # rows are already global, so the keyed offsets leave them alone
        merged = merge_segments(
            delta_runs.unionByName(old_runs), stats["n_docs"], stats["avgdl"], cfg,
            merge_cap=cfg.merge_cap,
            shard_offsets={(1, s): o + old_max for s, o in offsets_local.items()},
        )
        # untouched terms co-resident in affected buckets ride through the
        # rewrite verbatim (partition-level COW rewrites whole buckets);
        # the bucket filter makes this ∝ affected buckets, and partition
        # pruning keeps unaffected buckets' files unread
        passthrough = (
            segs_old.filter(F.col("bucket").isin(affected_buckets))
            .join(F.broadcast(affected), "term", "left_anti")
            .select(*merged.columns)
        )
        final = merged.unionByName(passthrough)
        cat.write(
            "segments", final, mode="append", partition_by=["bucket"],
            replace_partitions={"bucket": affected_buckets},
            tag={"unit": f"append-{fp_delta}", "fingerprint": fp_delta},
        )
        self._commit_stats(stats, fp_delta)
        wall = time.time() - t0
        summary = {
            "run_id": self.run_id,
            "appended_docs": int(appended),
            "n_docs": stats["n_docs"],
            "wall_s": wall,
            "noop": False,
        }
        self._ckpt(f"append-{fp_delta}", fp_delta, rows_in=appended, wall_ms=wall * 1000)
        return summary


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_root: str,
    cfg: IndexConfig | None = None,
    manifest: DataFrame | None = None,
    fail_after_units: int | None = None,
) -> dict:
    return IndexBuilder(spark, index_root, cfg).build(
        corpus, manifest=manifest, fail_after_units=fail_after_units
    )
