"""Positional index + phrase / ordered-proximity queries.

The one deliberately-cut feature of the earlier rounds (SURVEY.md §7
"do-not-do: no phrase/positional queries") — added as a **sibling index**,
exactly the Lucene ``.pos``-file architecture: the main ``segments``
table (doc/freq) is untouched bit-for-bit, and an optional
``pos_segments`` table stores, per term, the token positions of every
occurrence. Phrase evaluation intersects doc lists first and consults
positions only for the survivors.

Positional token stream
-----------------------
Positions are defined over the **parts stream** of the pinned tokenizer
(tokenize.py): identifiers in document order, each identifier's
camel/snake parts in order, empties dropped; position = 0-based index in
that per-document sequence. The full-identifier and bigram synonym
tokens of the main index are NOT positional (they are Lucene-style
same-position synonyms used for ranking/recall, not adjacency), so
``getUserName`` yields ``get@0 user@1 name@2`` and the phrase
``"get user"`` matches it — the standard WordDelimiter contract.

Table layout (Iceberg-shaped, bucket-partitioned like ``segments``)
-------------------------------------------------------------------
``pos_segments(term, shard, df, n, payload, block_meta, bucket)`` where
one row covers ``df`` docs / ``n`` positions of one term's doc-ordered
range, and::

    payload = [doc-gap varints (df)] [count varints (df)] [pos varints (n)]

Doc ids are delta-gapped with the row's first id absolute (same codec as
``segments``); each doc's positions are delta-gapped with the doc's
first position absolute — so a doc's position run is SELF-CONTAINED and
concatenating two doc-ordered rows/runs never re-encodes position bytes.
``block_meta`` carries per-block (``block_size`` docs) byte extents of
all three sections, so a candidate-driven reader can slice single
blocks (same byte-surgery contract as ``codec.slice_blocks``).

Scale shape
-----------
* Build = ONE extra content pass (the fused main build stays untouched;
  a 100 TB deployment that always wants positions would fuse this kernel
  into ``fused_local_segments`` — the doc-id scheme is shared, see
  ``dedup_sorted``). Shuffle volume is the ENCODED positional bytes
  (per-batch local runs), never raw (term, doc, pos) rows.
* Hot terms chunk into multiple shard rows (``pos_row_docs`` docs per
  row) during the merge, so no task or row ever holds a ubiquitous
  term's full position list.
* Incremental: an appended corpus delta gets NEW rows under a higher
  shard generation (delta doc ids are strictly larger) — old rows are
  never rewritten; cost ∝ delta.
* Phrase serving decodes positions only for terms of the query; the
  doc-level intersection uses the position row's own doc list (no main
  index fetch needed). Tombstoned docs are masked after intersection.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import Catalog
from .codec import varint_decode
from .config import IndexConfig
from .postings import _section, term_bucket
from .tokenize import ACRONYM_RE, CAMEL_RE, NON_IDENT_RE, analyze_phrase

POS_LOCAL_SCHEMA = (
    "term string, first_doc long, m long, n long, glen int, clen int, "
    "payload binary"
)
POS_META_T = (
    "array<struct<block_first:long, block_last:long, byte_offset:long, "
    "cnt_off:long, pos_off:long, n_docs:int, n_pos:long>>"
)
POS_SEGMENT_SCHEMA = (
    "term string, shard long, df long, n long, payload binary, "
    f"block_meta {POS_META_T}, bucket int"
)

# positions are packed with doc ids into one int64 sort key; documents
# beyond 2^31 tokens are rejected at build time (a 2 GB+ single file is
# not a source-code file)
POS_SHIFT = 31


# ----------------------------------------------------------------- build
def _local_pos_batches(batches, doc_base_of):
    """Arrow kernel: sorted, deduped corpus batches -> per-batch local
    position runs (POS_LOCAL_SCHEMA RecordBatches).

    Rows arrive range-partitioned and sorted by the natural key (the
    exact order doc ids were minted in — ``ids.dedup_sorted``), so the
    doc ids of this partition are ``base + running offset`` and every
    emitted run covers a doc range disjoint from (and ordered against)
    all other runs. All heavy lifting is Arrow C++ / numpy: regex on
    flat string buffers, dictionary-encode, one stable argsort, one
    varint pass per section.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    seen = 0
    pid = None
    for rb in batches:
        nb = rb.num_rows
        if nb == 0:
            continue
        names = rb.schema.names
        if pid is None:
            pid = int(rb.column(names.index("_pid"))[0].as_py())
        base = doc_base_of(pid)
        doc_ids = np.arange(seen + 1, seen + nb + 1, dtype=np.int64) + base
        seen += nb
        contents = rb.column(names.index("content"))
        if isinstance(contents, pa.ChunkedArray):
            contents = contents.combine_chunks()
        contents = pc.fill_null(contents, "")

        idents_l = pc.split_pattern_regex(contents, NON_IDENT_RE)
        id_doc = pc.list_parent_indices(idents_l)
        idents = pc.list_flatten(idents_l)
        keep = pc.not_equal(idents, "")
        idents, id_doc = idents.filter(keep), id_doc.filter(keep)
        norm = pc.replace_substring_regex(idents, ACRONYM_RE, r"\1_\2")
        norm = pc.replace_substring_regex(norm, CAMEL_RE, r"\1_\2")
        norm = pc.utf8_lower(norm)
        parts_l = pc.split_pattern_regex(norm, "_+")
        p_ident = pc.list_parent_indices(parts_l)
        parts = pc.list_flatten(parts_l)
        keep2 = pc.not_equal(parts, "")
        parts, p_ident = parts.filter(keep2), p_ident.filter(keep2)
        p_doc = pc.take(id_doc, p_ident).to_numpy().astype(np.int64)
        n = len(parts)
        if n == 0:
            continue
        # 0-based position within each doc's parts stream (p_doc is
        # non-decreasing: flatten preserves doc-major order)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = p_doc[1:] != p_doc[:-1]
        doc_starts = np.flatnonzero(change)
        run_lens = np.diff(np.append(doc_starts, n))
        if int(run_lens.max()) >= (1 << POS_SHIFT):
            raise ValueError("document exceeds 2^31 tokens")
        within = np.arange(n, dtype=np.int64) - np.repeat(doc_starts, run_lens)

        denc = (
            parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        ).dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        dictionary = denc.dictionary
        # stable sort by (term, doc); equal keys keep ascending `within`
        order = np.argsort(codes * nb + p_doc, kind="stable")
        sc, sd, sp = codes[order], p_doc[order], within[order]

        # (term, doc) runs
        rchange = np.empty(n, dtype=bool)
        rchange[0] = True
        rchange[1:] = (sc[1:] != sc[:-1]) | (sd[1:] != sd[:-1])
        rstart = np.flatnonzero(rchange)
        rcount = np.diff(np.append(rstart, n))
        # per-run delta-gapped positions (first absolute)
        pv = sp.copy()
        pv[1:] -= sp[:-1]
        pv[rstart] = sp[rstart]
        pos_b, pos_off = _section(pv)

        # term groups over the runs
        rterm = sc[rstart]
        tchange = np.empty(rstart.size, dtype=bool)
        tchange[0] = True
        tchange[1:] = rterm[1:] != rterm[:-1]
        tstart = np.flatnonzero(tchange)          # in run index space
        tend = np.append(tstart[1:], rstart.size)
        run_doc = doc_ids[sd[rstart]]             # global doc id per run
        # per-term doc gaps (first absolute)
        gv = run_doc.copy()
        gv[1:] -= run_doc[:-1]
        gv[tstart] = run_doc[tstart]
        g_b, g_off = _section(gv)
        c_b, c_off = _section(rcount)
        # position byte extents per term (runs of one term are contiguous)
        tpos_s = pos_off[rstart[tstart]]
        tpos_e = pos_off[np.append(rstart[1:], [n])[tend - 1]]
        payloads = [
            g_b[g_off[s]:g_off[e]] + c_b[c_off[s]:c_off[e]]
            + pos_b[ps:pe]
            for s, e, ps, pe in zip(tstart, tend, tpos_s, tpos_e)
        ]
        npos_t = np.add.reduceat(rcount, tstart)
        yield pa.record_batch(
            {
                "term": dictionary.take(pa.array(rterm[tstart])),
                "first_doc": pa.array(run_doc[tstart], type=pa.int64()),
                "m": pa.array((tend - tstart).astype(np.int64), type=pa.int64()),
                "n": pa.array(npos_t.astype(np.int64), type=pa.int64()),
                "glen": pa.array(
                    (g_off[tend] - g_off[tstart]).astype(np.int32), type=pa.int32()
                ),
                "clen": pa.array(
                    (c_off[tend] - c_off[tstart]).astype(np.int32), type=pa.int32()
                ),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def _pos_value_ends(buf: np.ndarray) -> np.ndarray:
    """End byte index (exclusive) of each varint in ``buf`` — continuation
    bit scan only, no value decode."""
    return np.flatnonzero((buf & 0x80) == 0) + 1


def _encode_pos_rows(term, ids, cnts, pos_bytes, cfg, gen_base):
    """One term's merged (doc ids, per-doc counts, raw position bytes) ->
    list of pos_segments row tuples, chunked at ``cfg.pos_row_docs`` docs
    per row. Position bytes are sliced, never decoded."""
    m = ids.size
    posbuf = np.frombuffer(pos_bytes, dtype=np.uint8)
    ends = _pos_value_ends(posbuf)
    cum = np.cumsum(cnts)
    doc_end_b = np.concatenate(([0], ends[cum - 1])) if m else np.array([0])
    bucket = term_bucket(term, cfg.term_buckets)
    rows = []
    cap = cfg.pos_row_docs
    block = cfg.block_size
    for ci, lo in enumerate(range(0, m, cap)):
        hi = min(lo + cap, m)
        cids = ids[lo:hi]
        ccnt = cnts[lo:hi]
        gaps = cids.copy()
        gaps[1:] -= cids[:-1]
        g_b, g_off = _section(gaps)
        c_b, c_off = _section(ccnt)
        p_lo, p_hi = int(doc_end_b[lo]), int(doc_end_b[hi])
        p_bytes = pos_bytes[p_lo:p_hi]
        glen, clen = len(g_b), len(c_b)
        # block extents (block_size docs per block)
        meta = []
        ccum = np.concatenate(([0], np.cumsum(ccnt)))
        dend = doc_end_b[lo:hi + 1] - p_lo
        for s in range(0, hi - lo, block):
            e = min(s + block, hi - lo)
            meta.append(
                {
                    "block_first": int(cids[s]),
                    "block_last": int(cids[e - 1]),
                    "byte_offset": int(g_off[s]),
                    "cnt_off": int(glen + c_off[s]),
                    "pos_off": int(glen + clen + dend[s]),
                    "n_docs": int(e - s),
                    "n_pos": int(ccum[e] - ccum[s]),
                }
            )
        # df is ROW-LOCAL (docs in this row): readers derive totals from
        # block_meta sums, and appended generations / compactions never
        # have to fix up a term-global count across rows
        rows.append(
            (
                term,
                int(gen_base + ci),
                int(hi - lo),
                int(ccum[-1]),
                g_b + c_b + p_bytes,
                meta,
                int(bucket),
            )
        )
    return rows


def merge_pos_runs(local: DataFrame, cfg: IndexConfig, gen_base: int) -> DataFrame:
    """Sort-merge local position runs into global pos_segments rows.

    Runs of one term are doc-range-disjoint and sorted by ``first_doc``,
    so the merge is decode(doc gaps + counts) + concat + re-encode; the
    POSITION bytes (the bulk) are concatenated raw — per-doc runs are
    self-contained (module docstring)."""
    n_buckets = cfg.term_buckets
    shuffled = (
        local.withColumn(
            "bucket",
            F.pmod(F.crc32(F.col("term").cast("binary")), F.lit(n_buckets)).cast("int"),
        )
        # AQE-coalescible: see postings.merge_segments
        .repartition("bucket")
        .sortWithinPartitions("term", "first_doc")
    )
    cols = ["term", "shard", "df", "n", "payload", "block_meta", "bucket"]

    def merge(batches):
        carry: pd.DataFrame | None = None

        def flush(group: pd.DataFrame) -> list:
            term = group["term"].iloc[0]
            ids_l, cnt_l, pos_l = [], [], []
            for r in group.itertuples():
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                m_i = int(r.m)
                gaps, _ = varint_decode(buf, 0, m_i)
                cnts, _ = varint_decode(buf, int(r.glen), m_i)
                ids_l.append(np.cumsum(gaps.astype(np.int64)))
                cnt_l.append(cnts.astype(np.int64))
                pos_l.append(bytes(r.payload)[int(r.glen) + int(r.clen):])
            ids = np.concatenate(ids_l)
            cnts = np.concatenate(cnt_l)
            return _encode_pos_rows(term, ids, cnts, b"".join(pos_l), cfg, gen_base)

        def process(head: pd.DataFrame):
            out = []
            terms = head["term"].to_numpy()
            bounds = np.flatnonzero(np.concatenate(([True], terms[1:] != terms[:-1])))
            ends = np.append(bounds[1:], len(head))
            for s, e in zip(bounds, ends):
                out.extend(flush(head.iloc[s:e]))
            if out:
                yield pd.DataFrame(out, columns=cols)

        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if pdf.empty:
                continue
            last_term = pdf["term"].iloc[-1]
            cut = pdf["term"].ne(last_term)
            if cut.any():
                split = int(cut[::-1].idxmin())  # first row of last term
                head, carry = pdf.iloc[:split], pdf.iloc[split:]
            else:
                carry = pdf
                continue
            yield from process(head)
        if carry is not None and len(carry):
            yield from process(carry)

    return shuffled.mapInPandas(merge, schema=POS_SEGMENT_SCHEMA)


def build_positions(
    spark: SparkSession, index_root: str, corpus: DataFrame,
    cfg: IndexConfig | None = None,
) -> dict:
    """Build (or incrementally extend) the positional sibling index for
    an existing main index at ``index_root``.

    Full build: run after ``build_index`` with the SAME corpus — doc ids
    are re-minted by the shared deterministic scheme (dense row number
    over the natural-key order, ``ids.dedup_sorted``) and validated
    against the docs table's count. Incremental: run again after
    ``IndexBuilder.append`` with the FULL corpus — only docs above the
    covered high-water mark are tokenized and appended as new rows
    (cost ∝ delta). A compaction (``apply_deletes``) rewrites
    pos_segments itself (``compact_positions``), so readers never see a
    renumbered docs table with stale positions.
    """
    from .ids import KEY, dedup_sorted

    cfg = cfg or IndexConfig()
    cat = Catalog(index_root)
    if not cat.exists("docs"):
        raise ValueError("build the main index first (docs table missing)")
    props0 = cat.get_properties() or {}
    icfg = props0.get("index_config") or {}
    if icfg.get("stop_words") or icfg.get("stem_tokens"):
        raise ValueError(
            "positions sibling does not support analysis chains yet: the "
            "main index was built with stop_words/stem_tokens, and the "
            "positional kernel emits the UNCHAINED token stream — phrase "
            "positions would disagree with the chained postings. Build "
            "phrase-serving indexes without a chain."
        )
    t0 = time.time()
    props = cat.get_properties() or {}
    state = props.get("positions_state")
    docs = cat.read(spark, "docs")

    src = corpus.select("repo", "path", "commit", "lang", "content")
    if state is not None:
        covered = int(state["max_doc"])
        # crash-window repair: the pos_segments tag commits ATOMICALLY
        # with the data (one manifest), the props update is a separate
        # later write — a crash between them leaves state["max_doc"]
        # behind the durable high-water mark. Extending from the stale
        # mark would re-append covered docs (duplicate postings), so
        # trust the committed tags and repair the props first. This is
        # what makes per-micro-batch sibling extension (stream_index
        # ``siblings=``) idempotent under foreachBatch replay.
        cmax = max(
            (int(t.get("max_doc", 0)) for t in cat.committed_tags("pos_segments")),
            default=0,
        )
        if cmax > covered:
            covered = cmax
            state = {**state, "max_doc": cmax,
                     "docs_version": cat.current_version("docs")}
            props["positions_state"] = state
            cat.set_properties(props)
        old_keys = docs.filter(F.col("doc_id") <= covered).select(*KEY)
        src = src.join(old_keys, KEY, "left_anti")
        id_offset = covered
        gen = len(cat.committed_tags("pos_segments"))
    else:
        covered = 0
        id_offset = 0
        gen = 0

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    s1, boff, total = dedup_sorted(src, sort_partitions=n_part, id_offset=id_offset)
    expect = int(docs.count())
    if covered + total != expect:
        s1.unpersist()
        raise ValueError(
            f"corpus/docs mismatch: positions would cover {covered}+{total} "
            f"docs but the docs table has {expect} — pass the same corpus "
            "the main index was built/appended from"
        )
    if total == 0:
        s1.unpersist()
        return {"positions_docs": 0, "noop": True}

    def kernel(batches):
        yield from _local_pos_batches(batches, lambda p: boff.value.get(p, id_offset))

    local = s1.mapInArrow(kernel, schema=POS_LOCAL_SCHEMA)
    segs = merge_pos_runs(local, cfg, gen_base=gen << 20)

    from pyspark.sql import Observation

    obs = Observation(f"pos-build-{gen}")
    segs = segs.observe(obs, F.sum("n").alias("npos"), F.count("*").alias("rows"))
    cat.write(
        "pos_segments", segs,
        mode="append" if state is not None else "overwrite",
        partition_by=["bucket"],
        tag={"unit": f"positions-{gen}", "max_doc": covered + total},
    )
    s1.unpersist()
    props = cat.get_properties() or {}
    props["positions_state"] = {
        "max_doc": covered + total,
        "docs_version": cat.current_version("docs"),
        "block_size": cfg.block_size,
        "term_buckets": cfg.term_buckets,
    }
    cat.set_properties(props)
    got = obs.get
    return {
        "positions_docs": int(total),
        "position_rows": int(got["rows"] or 0),
        "positions": int(got["npos"] or 0),
        "wall_s": time.time() - t0,
        "noop": False,
    }


def compact_positions(spark, cat: Catalog, cfg: IndexConfig, dels: np.ndarray) -> int:
    """Rewrite pos_segments under a tombstone compaction: drop deleted
    docs' entries (ids AND their position bytes), renumber surviving doc
    ids densely (same strictly-monotone map as the segments rewrite), and
    re-encode. Called from ``IndexBuilder.apply_deletes`` so the
    positional index stays valid across compaction. One map-only pass;
    positions of surviving docs are byte-sliced, never decoded."""
    if not cat.exists("pos_segments"):
        return 0
    bdel = spark.sparkContext.broadcast(np.asarray(dels, dtype=np.int64))
    segs = cat.read(spark, "pos_segments")
    cols = ["term", "shard", "df", "n", "payload", "block_meta", "bucket"]

    def rewrite(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                m = int(r.df)  # row-local doc count
                gaps, used_g = varint_decode(buf, 0, m)
                ids = np.cumsum(gaps.astype(np.int64))
                cnts, used_c = varint_decode(buf, used_g, m)
                cnts = cnts.astype(np.int64)
                pos_bytes = bytes(r.payload)[used_g + used_c:]
                keep = ~np.isin(ids, bdel.value, assume_unique=True)
                if not keep.any():
                    continue
                new_ids = ids[keep]
                new_ids = new_ids - np.searchsorted(bdel.value, new_ids, "left")
                posbuf = np.frombuffer(pos_bytes, dtype=np.uint8)
                ends = _pos_value_ends(posbuf)
                cum = np.cumsum(cnts)
                doc_end = np.concatenate(([0], ends[cum - 1]))
                if keep.all():
                    new_pos = pos_bytes
                else:
                    ki = np.flatnonzero(keep)
                    new_pos = b"".join(
                        pos_bytes[doc_end[i]:doc_end[i + 1]] for i in ki
                    )
                # the row keeps its shard id: a rewrite only shrinks, so
                # the chunk count stays 1 and shard order (= doc order
                # across a term's rows) is preserved
                out.extend(
                    _encode_pos_rows(
                        r.term, new_ids, cnts[keep], new_pos, cfg,
                        gen_base=int(r.shard),
                    )
                )
            if out:
                yield pd.DataFrame(out, columns=cols)

    new_segs = segs.mapInPandas(rewrite, schema=POS_SEGMENT_SCHEMA)
    cat.write(
        "pos_segments", new_segs, mode="overwrite", partition_by=["bucket"],
        tag={"unit": "positions-compact"},
    )
    props = cat.get_properties() or {}
    st = props.get("positions_state") or {}
    darr = np.asarray(dels, dtype=np.int64)
    old_max = int(st.get("max_doc", 0))
    st["max_doc"] = old_max - int(np.searchsorted(darr, old_max, "right"))
    st["docs_version"] = cat.current_version("docs")
    props["positions_state"] = st
    cat.set_properties(props)
    return 1


# ----------------------------------------------------------------- query
class PosPostings:
    """Decoded positional postings of one term: doc-ordered ids, per-doc
    counts, flat ABSOLUTE positions, per-doc offsets into the flat."""

    __slots__ = ("doc_ids", "counts", "offsets", "pos")

    def __init__(self, doc_ids, counts, pos):
        self.doc_ids = doc_ids
        self.counts = counts
        self.offsets = np.concatenate(([0], np.cumsum(counts)))
        self.pos = pos

def match_ordered_window(key_lists: list[np.ndarray], slop: int) -> np.ndarray:
    """Doc ranks containing the query parts at strictly-increasing
    positions with span ≤ (n-1) + slop — exact phrase when ``slop == 0``.

    Greedy minimal-window chain, fully vectorized: for every occurrence
    of part 1, the smallest later occurrence of part 2, then of part 3…
    (``searchsorted`` per stage on combined (doc-rank, pos) keys —
    taking the smallest next position minimizes the final span for a
    fixed start, so greedy is exact). A chain that overruns into the
    next doc is dropped by the same-doc check."""
    start = key_lists[0]
    cur = start
    for ks in key_lists[1:]:
        if cur.size == 0:
            break
        idx = np.searchsorted(ks, cur, side="right")
        ok = idx < ks.size
        cur, start = ks[idx[ok]], start[ok]
        same = (cur >> POS_SHIFT) == (start >> POS_SHIFT)
        cur, start = cur[same], start[same]
    if cur.size == 0:
        return np.empty(0, dtype=np.int64)
    hit = (cur - start) <= (len(key_lists) - 1 + slop)
    return np.unique(start[hit] >> POS_SHIFT)


class PositionsReader:
    """Query-time view of the positional sibling index."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        cfg: IndexConfig | None = None,
        deleted: np.ndarray | None = None,
    ):
        self.spark = spark
        self.cat = Catalog(index_root)
        props = self.cat.get_properties() or {}
        persisted = props.get("index_config")
        if cfg is None and persisted is not None:
            known = {
                k: v for k, v in persisted.items()
                if k in IndexConfig.__dataclass_fields__
            }
            cfg = IndexConfig(**known)
        self.cfg = cfg or IndexConfig()
        state = props.get("positions_state")
        if state is None or not self.cat.exists("pos_segments"):
            raise ValueError(
                f"no positional index at {index_root}; run build_positions()"
            )
        # staleness: the docs table must not have changed since the last
        # positions build/compact — an append adds docs the positional
        # index does not cover (silent phrase misses), a compaction
        # renumbers ids. Both invalidate loudly, never silently.
        cur_v = self.cat.current_version("docs")
        if int(state.get("docs_version", -1)) != cur_v:
            raise ValueError(
                "positional index is stale (docs table changed since the "
                "last build_positions/compact); run build_positions() with "
                "the full corpus"
            )
        self._segments = self.cat.read(spark, "pos_segments")
        self._cache: dict[str, PosPostings | None] = {}
        self._deleted = deleted

    def fetch(self, terms: list[str]) -> dict[str, PosPostings | None]:
        missing = [t for t in dict.fromkeys(terms) if t not in self._cache]
        if missing:
            bs = sorted({term_bucket(t, self.cfg.term_buckets) for t in missing})
            tbl = (
                self._segments.filter(
                    F.col("bucket").isin(bs) & F.col("term").isin(missing)
                )
                .select("term", "shard", "payload", "block_meta")
                .toArrow()
            )
            cols = {
                name: tbl.column(name).to_pylist()
                for name in ("term", "shard", "block_meta")
            }
            payloads = tbl.column("payload")
            by_term: dict[str, list] = {}
            for i in range(tbl.num_rows):
                by_term.setdefault(cols["term"][i], []).append(
                    (cols["shard"][i], payloads[i], cols["block_meta"][i])
                )
            for t in missing:
                rs = sorted(by_term.get(t, []), key=lambda r: r[0])
                if not rs:
                    self._cache[t] = None
                    continue
                ids_l, cnt_l, pos_l = [], [], []
                for _shard, payload, meta in rs:
                    buf = np.frombuffer(payload.as_py(), dtype=np.uint8)
                    m = int(sum(b["n_docs"] for b in meta))
                    npos = int(sum(b["n_pos"] for b in meta))
                    gaps, used_g = varint_decode(buf, 0, m)
                    cnts, used_c = varint_decode(buf, used_g, m)
                    pv, _ = varint_decode(buf, used_g + used_c, npos)
                    ids = np.cumsum(gaps.astype(np.int64))
                    cnts = cnts.astype(np.int64)
                    # segmented cumsum -> absolute positions per doc
                    pv = pv.astype(np.int64)
                    starts = np.concatenate(([0], np.cumsum(cnts)[:-1]))
                    cs = np.cumsum(pv)
                    base = cs[starts] - pv[starts]
                    pos = cs - np.repeat(base, cnts)
                    ids_l.append(ids)
                    cnt_l.append(cnts)
                    pos_l.append(pos)
                ids = np.concatenate(ids_l)
                cnts = np.concatenate(cnt_l)
                pos = np.concatenate(pos_l)
                if self._deleted is not None:
                    keep = ~np.isin(ids, self._deleted, assume_unique=False)
                    if not keep.all():
                        pos = pos[np.repeat(keep, cnts)]
                        ids, cnts = ids[keep], cnts[keep]
                if ids.size == 0:
                    self._cache[t] = None
                else:
                    self._cache[t] = PosPostings(ids, cnts, pos)
        return {t: self._cache[t] for t in dict.fromkeys(terms)}

    def phrase_docs(self, query: str, slop: int = 0) -> np.ndarray:
        """Sorted doc ids whose parts stream contains the query's parts
        stream as an ordered window of span ≤ (n-1)+slop (exact phrase
        at slop=0). Single-part queries degenerate to term lookup."""
        return self._ordered_docs(analyze_phrase(query), slop)

    def phrase_prefix_docs(
        self, query: str, max_expansions: int = 50, slop: int = 0
    ) -> np.ndarray:
        """ES ``match_phrase_prefix``: the query's LAST analyzed part is
        a prefix — docs matching the phrase with the last slot filled by
        ANY dictionary term extending it ("table ha" hits "table hash").
        Expansion set: top ``max_expansions`` by (df DESC, term ASC),
        CAPPED not raised (the ES contract; search-as-you-type must
        degrade, not error). Sorted union over the variants.

        Scale shape: ONE batched fetch primes the postings cache with
        the fixed parts and every variant (one bucket-pruned scan, the
        Q15 expansion cost model), then each variant's positional verify
        runs over its own candidate intersection — never a corpus scan.
        The dictionary prefix lookup is the sorted-range-pruned
        ``TermExpander`` probe."""
        from .expand import TermExpander

        qparts = analyze_phrase(query)
        if not qparts:
            return np.empty(0, dtype=np.int64)
        head, prefix = qparts[:-1], qparts[-1]
        variants = TermExpander(self.spark, self.cat.root).prefix_capped(
            prefix, max_expansions
        )
        if not variants:
            return np.empty(0, dtype=np.int64)
        self.fetch(head + variants)  # one batched bucket-pruned fetch
        hits = [self._ordered_docs(head + [v], slop) for v in variants]
        return np.unique(np.concatenate(hits))

    def _ordered_docs(self, qparts: list[str], slop: int) -> np.ndarray:
        if not qparts:
            return np.empty(0, dtype=np.int64)
        got = self.fetch(qparts)
        if any(got[t] is None for t in qparts):
            return np.empty(0, dtype=np.int64)
        if len(qparts) == 1:
            return got[qparts[0]].doc_ids.copy()
        # doc-level intersection, rarest-first
        uniq = list(dict.fromkeys(qparts))
        uniq.sort(key=lambda t: got[t].doc_ids.size)
        cand = got[uniq[0]].doc_ids
        for t in uniq[1:]:
            cand = np.intersect1d(cand, got[t].doc_ids, assume_unique=True)
            if cand.size == 0:
                return cand
        # positional verify over candidates only. Keys pack the doc's
        # RANK among candidates (not the raw id — a 10^12-scale doc id
        # plus a position would overflow int64), so the key space is
        # bounded by the intersection size.
        key_lists = []
        for t in qparts:
            pp = got[t]
            mask = np.isin(pp.doc_ids, cand, assume_unique=True)
            ranks = np.searchsorted(cand, pp.doc_ids[mask])
            pos = pp.pos[np.repeat(mask, pp.counts)]
            key_lists.append(
                (np.repeat(ranks, pp.counts[mask]) << POS_SHIFT) | pos
            )
        hit_ranks = match_ordered_window(key_lists, slop)
        return cand[hit_ranks]

    def span_near_docs(
        self, terms: list[str], slop: int = 0, in_order: bool = False
    ) -> np.ndarray:
        """Lucene/ES ``span_near`` over single-term clauses: sorted doc
        ids where one occurrence of EACH clause fits in a window of span
        ``max(p) - min(p) <= (n-1) + slop`` — exactly Lucene's
        ``matchWidth - totalLength <= slop`` with unit-length term spans
        (``NearSpansOrdered``/``Unordered``). ``in_order=True`` is the
        ordered matcher ``phrase_docs`` uses (duplicated clauses allowed
        — the greedy chain demands strictly-increasing positions);
        ``in_order=False`` is the unordered variant: any arrangement,
        checked by a per-doc minimal-cover two-pointer over the merged
        (position, clause) stream (O(hits) per candidate doc, candidates
        = the clause posting intersection — the Lucene spans-enumeration
        cost shape).

        Clauses must analyze to ONE part each (``span_term`` contract;
        a multi-part identifier like ``getUserName`` is a phrase, not a
        span clause) and, unordered, must be distinct — Lucene demands
        n DISTINCT occurrences for duplicated unordered clauses, a
        contract this vectorized matcher does not implement; rejecting
        loudly beats silently matching one occurrence twice.

        A clause may also be a LIST of terms — a ``span_or`` clause
        (Lucene SpanOrQuery as a span_near operand): the clause's spans
        are the UNION of its alternatives' occurrences. Unordered only
        (the ordered greedy chain is per-term); alternatives must be
        distinct across the whole query."""
        clauses: list[list[str]] = []
        for t in terms:
            alts = t if isinstance(t, (list, tuple)) else [t]
            cl = []
            for a in alts:
                ps = analyze_phrase(a)
                if len(ps) != 1:
                    raise ValueError(
                        f"span clause {a!r} analyzes to {ps} — span_near "
                        "takes single-term clauses; use phrase_docs for "
                        "multi-part sequences"
                    )
                cl.append(ps[0])
            if not cl:
                raise ValueError("empty span_or clause")
            clauses.append(cl)
        if in_order:
            if any(len(cl) > 1 for cl in clauses):
                raise ValueError(
                    "span_or clauses are unordered-only (the ordered "
                    "greedy chain is per-term)"
                )
            return self._ordered_docs([cl[0] for cl in clauses], slop)
        flat = [p for cl in clauses for p in cl]
        if len(set(flat)) != len(flat):
            raise ValueError(
                "unordered span_near requires distinct clause terms "
                f"(got {flat}); duplicate-clause distinct-occurrence "
                "semantics are not implemented"
            )
        if not clauses or slop < 0:
            return np.empty(0, dtype=np.int64)
        got = self.fetch(flat)

        def clause_union_docs(cl):
            arrs = [got[a].doc_ids for a in cl if got[a] is not None]
            if not arrs:
                return np.empty(0, dtype=np.int64)
            out = arrs[0]
            for a in arrs[1:]:
                out = np.union1d(out, a)
            return out

        cdocs = [clause_union_docs(cl) for cl in clauses]
        if any(c.size == 0 for c in cdocs):
            return np.empty(0, dtype=np.int64)
        if len(clauses) == 1:
            return cdocs[0].copy()
        order_ix = sorted(range(len(clauses)), key=lambda i: cdocs[i].size)
        cand = cdocs[order_ix[0]]
        for i in order_ix[1:]:
            cand = np.intersect1d(cand, cdocs[i], assume_unique=True)
            if cand.size == 0:
                return cand
        nt = len(clauses)
        limit = nt - 1 + slop
        doc_l, pos_l, tid_l = [], [], []
        for ti, cl in enumerate(clauses):
            for a in cl:
                pp = got[a]
                if pp is None:
                    continue
                mask = np.isin(pp.doc_ids, cand, assume_unique=True)
                cnts = pp.counts[mask]
                doc_l.append(np.repeat(pp.doc_ids[mask], cnts))
                pos_l.append(pp.pos[np.repeat(mask, pp.counts)])
                tid_l.append(np.full(int(cnts.sum()), ti, dtype=np.int64))
        d = np.concatenate(doc_l)
        p = np.concatenate(pos_l)
        t = np.concatenate(tid_l)
        order = np.lexsort((p, d))
        d, p, t = d[order], p[order], t[order]
        bounds = np.append(
            np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1]))), d.size
        )
        hits = []
        counts = np.zeros(nt, dtype=np.int64)
        for si in range(bounds.size - 1):
            lo, hi = bounds[si], bounds[si + 1]
            dp, dt = p[lo:hi], t[lo:hi]
            counts[:] = 0
            have = 0
            l = 0
            ok = False
            # minimal-cover two-pointer: r extends until every clause is
            # inside [l, r]; then l shrinks while coverage holds — the
            # narrowest cover ending at r. Any window of span <= limit
            # covering all clauses contains such a cover.
            for r in range(dp.size):
                if counts[dt[r]] == 0:
                    have += 1
                counts[dt[r]] += 1
                while have == nt:
                    if dp[r] - dp[l] <= limit:
                        ok = True
                        break
                    counts[dt[l]] -= 1
                    if counts[dt[l]] == 0:
                        have -= 1
                    l += 1
                if ok:
                    break
            if ok:
                hits.append(int(d[lo]))
        return np.asarray(hits, dtype=np.int64)

    def span_within_docs(
        self, little: str, big: list[str], slop: int = 0
    ) -> np.ndarray:
        """Lucene/ES ``span_within``: sorted doc ids where an occurrence
        of ``little`` lies INSIDE a match of the enclosing span —
        ``big`` is an unordered span_near over single-term clauses with
        the given slop (the common enclosing shape; Lucene's fully
        general big-query nesting reduces to this for unit-term
        clauses). A big match is a choice of one occurrence per clause
        with ``max(p) - min(p) <= len(big) - 1 + slop``; ``little`` is
        within it when ``min(p) <= p_little <= max(p)``.

        Matching is NOT restricted to minimal covers — for each right
        anchor ``r`` the full valid left range ``[l_min, l_max]`` is
        considered (``l_max`` = narrowest cover start, coverage is
        monotone leftward; ``l_min`` = the slop bound), so a little
        inside a wider-but-still-legal enclosing tuple is found (a
        minimal-cover-only scan provably misses those). One
        ``searchsorted`` of the doc's little positions per anchor;
        cost O(clause hits + littles·log) per candidate doc, candidate
        docs = the clause∩little posting intersection — the Lucene
        spans-enumeration cost shape.

        ``span_containing(big, little)`` is the same doc-level
        predicate (it differs only in WHICH span is emitted for
        nesting, and this API returns doc ids), exposed as
        :meth:`span_containing_docs` for ES parity."""
        lp = analyze_phrase(little)
        if len(lp) != 1:
            raise ValueError(f"span_within little {little!r} analyzes to {lp}")
        clauses: list[str] = []
        for t in big:
            ps = analyze_phrase(t)
            if len(ps) != 1:
                raise ValueError(
                    f"span clause {t!r} analyzes to {ps} — big takes "
                    "single-term clauses"
                )
            clauses.append(ps[0])
        if len(set(clauses)) != len(clauses):
            raise ValueError(
                "big requires distinct clause terms (the unordered "
                "distinct-occurrence contract, as in span_near)"
            )
        if not clauses or slop < 0:
            return np.empty(0, dtype=np.int64)
        lt = lp[0]
        got = self.fetch(list(dict.fromkeys(clauses + [lt])))
        if got[lt] is None or any(got[c] is None for c in clauses):
            return np.empty(0, dtype=np.int64)
        # candidates: docs holding the little AND every big clause
        cand = got[lt].doc_ids
        for c in sorted(clauses, key=lambda t: got[t].doc_ids.size):
            cand = np.intersect1d(cand, got[c].doc_ids, assume_unique=True)
            if cand.size == 0:
                return cand
        nt = len(clauses)
        limit = nt - 1 + slop
        # merged (rank<<POS_SHIFT | pos, clause) stream over candidates
        doc_l, pos_l, tid_l = [], [], []
        for ti, c in enumerate(clauses):
            pp = got[c]
            mask = np.isin(pp.doc_ids, cand, assume_unique=True)
            cnts = pp.counts[mask]
            doc_l.append(np.repeat(pp.doc_ids[mask], cnts))
            pos_l.append(pp.pos[np.repeat(mask, pp.counts)])
            tid_l.append(np.full(int(cnts.sum()), ti, dtype=np.int64))
        d = np.concatenate(doc_l)
        p = np.concatenate(pos_l)
        t = np.concatenate(tid_l)
        order = np.lexsort((p, d))
        d, p, t = d[order], p[order], t[order]
        pl = got[lt]
        lmask = np.isin(pl.doc_ids, cand, assume_unique=True)
        ld = np.repeat(pl.doc_ids[lmask], pl.counts[lmask])
        lpos = pl.pos[np.repeat(lmask, pl.counts)]
        bounds = np.append(
            np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1]))), d.size
        )
        lbounds = np.append(
            np.flatnonzero(np.concatenate(([True], ld[1:] != ld[:-1]))),
            ld.size,
        )
        hits = []
        counts = np.zeros(nt, dtype=np.int64)
        for si in range(bounds.size - 1):
            lo, hi = bounds[si], bounds[si + 1]
            dp, dt = p[lo:hi], t[lo:hi]
            ll, lh = lbounds[si], lbounds[si + 1]
            dl = lpos[ll:lh]  # sorted: lexsort order within doc
            counts[:] = 0
            have = 0
            l = 0
            l_min = 0
            ok = False
            for r in range(dp.size):
                if counts[dt[r]] == 0:
                    have += 1
                counts[dt[r]] += 1
                while dp[r] - dp[l_min] > limit:
                    l_min += 1
                if have < nt:
                    continue
                # shrink to the narrowest cover ending at r
                while counts[dt[l]] > 1:
                    counts[dt[l]] -= 1
                    l += 1
                have_cover = l >= l_min  # narrowest cover within slop?
                if have_cover:
                    # any little inside [dp[l_min], dp[r]] is inside
                    # SOME legal tuple ending at r (coverage holds for
                    # every l' <= l, slop for every l' >= l_min)
                    a = np.searchsorted(dl, dp[l_min], side="left")
                    b = np.searchsorted(dl, dp[r], side="right")
                    if b > a:
                        ok = True
                        break
                # un-shrink bookkeeping is unnecessary: counts/l stay,
                # coverage remains true until l passes a last occurrence
            if ok:
                hits.append(int(d[lo]))
        return np.asarray(hits, dtype=np.int64)

    def span_containing_docs(
        self, big: list[str], little: str, slop: int = 0
    ) -> np.ndarray:
        """Lucene/ES ``span_containing``: matches of ``big`` (unordered
        span_near) that contain a ``little`` occurrence. At doc-id
        granularity this is exactly ``span_within`` with the arguments
        flipped (the two differ in which SPAN is emitted, not in which
        docs match) — see :meth:`span_within_docs`."""
        return self.span_within_docs(little, big, slop=slop)

    def span_first_docs(self, term: str, end: int) -> np.ndarray:
        """Lucene ``span_first``: sorted doc ids where ``term`` occurs
        with span end ≤ ``end`` — a unit-length term span at 0-based
        position p has end p+1, so the condition is ``p < end`` (ES
        ``span_first(match, end)`` counts the same way: end=1 means
        "the very first token"). Single scan of the term's positional
        postings, no candidate join."""
        ps = analyze_phrase(term)
        if len(ps) != 1:
            raise ValueError(
                f"span_first takes a single-term match, got {ps}"
            )
        pp = self.fetch(ps)[ps[0]]
        if pp is None or end <= 0:
            return np.empty(0, dtype=np.int64)
        mask = pp.pos < end
        return np.unique(np.repeat(pp.doc_ids, pp.counts)[mask])

    def span_not_docs(
        self,
        include: str,
        exclude,
        pre: int = 0,
        post: int = 0,
    ) -> np.ndarray:
        """Lucene/ES ``span_not`` with unit-length term spans: sorted
        doc ids where SOME occurrence of ``include`` has NO occurrence
        of any ``exclude`` term within ``[p - pre, p + post]`` (pre=0,
        post=0 = same-position overlap only, which unit spans at
        distinct positions never have — use post>=1 for "not
        immediately followed by"). ``exclude`` may be one term or a
        list (a span_or exclusion).

        Fully vectorized: docs carrying include but no exclude at all
        match immediately (setdiff); for the remainder, positions pack
        to ``rank << POS_SHIFT | pos`` keys and one two-sided
        ``searchsorted`` of the include keys against the merged exclude
        keys counts the excluders per occurrence — window bounds clamp
        to the rank's own key block, so windows never leak across
        documents."""
        inc = analyze_phrase(include)
        excl_terms = exclude if isinstance(exclude, (list, tuple)) else [exclude]
        exc: list[str] = []
        for e in excl_terms:
            ps = analyze_phrase(e)
            if len(ps) != 1:
                raise ValueError(f"span_not exclude {e!r} analyzes to {ps}")
            exc.append(ps[0])
        if len(inc) != 1:
            raise ValueError(f"span_not include analyzes to {inc}")
        if pre < 0 or post < 0:
            raise ValueError("pre/post must be >= 0")
        got = self.fetch(inc + exc)
        pi = got[inc[0]]
        if pi is None:
            return np.empty(0, dtype=np.int64)
        pes = [got[e] for e in exc if got[e] is not None]
        if not pes:
            return pi.doc_ids.copy()
        edocs = pes[0].doc_ids
        for pp in pes[1:]:
            edocs = np.union1d(edocs, pp.doc_ids)
        only = np.setdiff1d(pi.doc_ids, edocs, assume_unique=False)
        both = np.intersect1d(pi.doc_ids, edocs, assume_unique=False)
        if both.size == 0:
            return np.sort(only)
        mi = np.isin(pi.doc_ids, both, assume_unique=True)
        ri = np.searchsorted(both, pi.doc_ids[mi])
        ki = (
            (np.repeat(ri, pi.counts[mi]) << POS_SHIFT)
            | pi.pos[np.repeat(mi, pi.counts)]
        )
        ke_l = []
        for pp in pes:
            me = np.isin(pp.doc_ids, both, assume_unique=True)
            re_ = np.searchsorted(both, pp.doc_ids[me])
            ke_l.append(
                (np.repeat(re_, pp.counts[me]) << POS_SHIFT)
                | pp.pos[np.repeat(me, pp.counts)]
            )
        ke = np.sort(np.concatenate(ke_l))
        base = (ki >> POS_SHIFT) << POS_SHIFT
        lo = np.maximum(ki - pre, base)
        hi = np.minimum(ki + post, base + ((1 << POS_SHIFT) - 1))
        n_excl = np.searchsorted(ke, hi, side="right") - np.searchsorted(
            ke, lo, side="left"
        )
        free_ranks = np.unique((ki[n_excl == 0]) >> POS_SHIFT)
        return np.sort(np.concatenate([only, both[free_ranks]]))

    def best_windows(
        self, terms: list[str], doc_ids, width: int = 30
    ) -> dict[int, tuple[int, int]]:
        """Best fixed-width passage per document (Lucene unified-
        highlighter shape, simplified): for each doc the ``width``-token
        window containing the most DISTINCT query terms, tie-broken to
        the smallest start. Windows are anchored at hit positions — any
        optimal window can be slid right until its left edge lands on
        its leftmost hit without changing membership, so anchoring is
        lossless and makes the contract deterministic.

        Returns ``{doc_id: (win_start, n_hits)}`` (0-based token
        positions in the doc's PARTS stream). Serving-shaped: meant for
        the k hydrated results of a query (Lucene highlights top hits
        only, never the corpus) — cost is O(query-term hits in those
        docs) after one positional fetch of the query terms."""
        uniq = list(dict.fromkeys(terms))
        want = np.asarray(sorted({int(x) for x in np.asarray(doc_ids).ravel()}),
                          dtype=np.int64)
        if want.size == 0 or not uniq:
            return {}
        got = self.fetch(uniq)
        doc_l, pos_l, tid_l = [], [], []
        for ti, t in enumerate(uniq):
            pp = got[t]
            if pp is None:
                continue
            mask = np.isin(pp.doc_ids, want, assume_unique=True)
            if not mask.any():
                continue
            cnts = pp.counts[mask]
            doc_l.append(np.repeat(pp.doc_ids[mask], cnts))
            pos_l.append(pp.pos[np.repeat(mask, pp.counts)])
            tid_l.append(np.full(int(cnts.sum()), ti, dtype=np.int64))
        if not doc_l:
            return {}
        d = np.concatenate(doc_l)
        p = np.concatenate(pos_l)
        t = np.concatenate(tid_l)
        order = np.lexsort((p, d))
        d, p, t = d[order], p[order], t[order]
        bounds = np.append(
            np.flatnonzero(np.concatenate(([True], d[1:] != d[:-1]))), d.size
        )
        out: dict[int, tuple[int, int]] = {}
        counts = np.zeros(len(uniq), dtype=np.int64)
        for si in range(bounds.size - 1):
            lo, hi = bounds[si], bounds[si + 1]
            dp, dt = p[lo:hi], t[lo:hi]
            counts[:] = 0
            distinct = 0
            best_n, best_s = -1, -1
            r = 0
            # classic two-pointer: l anchors at each hit, r extends to
            # the window edge; distinct is maintained incrementally
            for l in range(dp.size):
                while r < dp.size and dp[r] < dp[l] + width:
                    if counts[dt[r]] == 0:
                        distinct += 1
                    counts[dt[r]] += 1
                    r += 1
                if distinct > best_n:
                    best_n, best_s = distinct, int(dp[l])
                counts[dt[l]] -= 1
                if counts[dt[l]] == 0:
                    distinct -= 1
            out[int(d[lo])] = (best_s, best_n)
        return out


def parts_column(content):
    """JVM column expression for a document's PARTS stream (the
    positional index's token stream): identifier split, acronym/camel
    boundaries, lowercase — the regexp_replace chain produces the same
    stream as the Arrow build kernel (`_local_pos_batches`), pytest-
    gated against the pure-Python tokenizer."""
    s = F.regexp_replace(content, NON_IDENT_RE, " ")
    s = F.regexp_replace(s, ACRONYM_RE, r"$1 $2")
    s = F.regexp_replace(s, CAMEL_RE, r"$1 $2")
    s = F.regexp_replace(s, "_+", " ")
    arr = F.split(F.lower(s), " +")
    return F.filter(arr, lambda x: x != F.lit(""))


def snippet_df(
    windows: DataFrame, docs: DataFrame, corpus: DataFrame, width: int = 30
) -> DataFrame:
    """Hydrate passage windows into snippet text: ``windows``
    (doc_id, win_start, …) are the k highlight results, ``docs`` is the
    engine docs dimension (doc_id -> natural key; content is dropped at
    index time by design), ``corpus`` is the content-bearing source
    table. Returns (doc_id, snippet).

    Scale shape: the k natural keys are collected driver-side (k rows by
    contract) and pushed into the corpus scan as an `isin` predicate —
    at 100 TB the blob-store scan prunes to the k files — then a
    broadcast join attaches win_start and one JVM slice cuts the
    window. Nothing corpus-sized shuffles."""
    keyed = windows.join(
        docs.select("doc_id", "repo", "path", "commit"), "doc_id"
    )
    rows = keyed.collect()
    if not rows:
        return windows.sparkSession.createDataFrame(
            [], schema="doc_id long, snippet string"
        )
    paths = [r["path"] for r in rows]
    keyed_small = windows.sparkSession.createDataFrame(
        [(r["doc_id"], r["repo"], r["path"], r["commit"], r["win_start"])
         for r in rows],
        schema="doc_id long, repo string, path string, commit string, "
        "win_start long",
    )
    src = corpus.filter(F.col("path").isin(paths)).select(
        "repo", "path", "commit", "content"
    )
    j = src.join(F.broadcast(keyed_small), ["repo", "path", "commit"])
    return j.select(
        "doc_id",
        F.concat_ws(
            " ",
            F.slice(
                parts_column(F.col("content")),
                (F.col("win_start") + 1).cast("int"),
                F.lit(width),
            ),
        ).alias("snippet"),
    )
