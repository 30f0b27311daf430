"""Trigram-accelerated substring / regex search (code-search "grep").

The classic code-search index structure (Google Code Search, Zoekt,
Sourcegraph): a sibling table maps every lowercased byte TRIGRAM of
document content to the doc-id posting list of documents containing it.
A grep query is answered in two stages:

1. **Prefilter** — extract the set of REQUIRED literal factors from the
   pattern (for a literal query, the literal itself; for a regex, a
   conservative required-literal analysis, :func:`literal_factors`).
   Every trigram of every required factor must appear in a matching
   document, so intersecting those trigrams' posting lists
   (rarest-first) yields a sound candidate superset.
2. **Verify** — run the real matcher (JVM ``contains`` / ``rlike``) over
   the candidate documents ONLY, joined back to the content-bearing
   corpus by natural key.

Soundness contract: stage 1 may only ever SHRINK the set stage 2 scans,
never drop a true match — the factor analysis is conservative (anything
hard returns fewer/ no factors and degrades toward a full scan), and
tests/test_grep.py property-checks prefiltered results against the
engine's own full-scan path over random patterns.

Table layout (Iceberg-shaped, like ``segments`` / ``pos_segments``)
-------------------------------------------------------------------
``tri_segments(tri, shard, df, payload, bucket)`` — one row covers
``df`` docs of one trigram's doc-ordered range; ``payload`` is
delta-gap varints (first id absolute, same codec as ``segments``);
``tri`` is the int packing ``b0<<16 | b1<<8 | b2`` of the three
lowercased UTF-8 bytes; ``bucket = tri % term_buckets`` partitions the
table so a query's trigram fetch prunes buckets at the parquet scan.
Hot trigrams chunk into multiple shard rows (``pos_row_docs`` docs per
row) so no task or row ever holds a ubiquitous trigram's full list.

Scale shape
-----------
* Build = ONE extra content pass (Arrow kernel: bytes -> packed int32
  trigrams -> per-doc unique -> per-batch local runs); shuffle volume is
  the ENCODED gap bytes of per-batch runs, never raw (tri, doc) rows.
  Incremental: appended docs get new rows under a higher generation —
  old rows are never rewritten; cost ∝ delta.
* A grep touches (a) the posting lists of the query's required trigrams
  (bucket-pruned scan), then (b) the candidate documents only — at
  10^12 docs a selective literal reads a handful of lists plus the
  matching files, never the corpus.
* With NO required factor (e.g. pattern ``.*``, or a sub-3-byte
  literal) the engine falls back to the full verify scan — correct,
  clearly the scan cost class, and the documented worst case (same
  trade Zoekt makes).

Unicode caveat: the index lowercases with Arrow ``utf8_lower`` and the
verifier with JVM ``lower`` — both full Unicode; factors restricted to
ASCII (non-ASCII factors are dropped, sound) so exotic case-folding
divergence can only cost pruning, not correctness.
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
from .postings import _section

TRI_LOCAL_SCHEMA = "tri int, first_doc long, m long, payload binary"
TRI_SEGMENT_SCHEMA = "tri int, shard long, df long, payload binary, bucket int"

# quantifiers that make the PRECEDING atom optional or repeated
_OPTIONAL_QUANT = "*?{"


def _skip_class(p: str, i: int) -> int:
    """Index just past the ``]`` closing the class opened at ``p[i]``."""
    j = i + 1
    if j < len(p) and p[j] == "^":
        j += 1
    if j < len(p) and p[j] == "]":  # literal ] as first member
        j += 1
    while j < len(p) and p[j] != "]":
        j += 2 if p[j] == "\\" else 1
    return min(j + 1, len(p))


def _skip_braces(p: str, i: int) -> int:
    j = i
    while j < len(p) and p[j] != "}":
        j += 1
    return min(j + 1, len(p))


def _match_paren(p: str, i: int) -> int:
    """Index of the ``)`` matching the ``(`` at ``p[i]`` (len(p) if
    unbalanced), escape- and class-aware."""
    depth, j = 0, i
    while j < len(p):
        c = p[j]
        if c == "\\":
            j += 2
            continue
        if c == "[":
            j = _skip_class(p, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    return len(p)


def literal_factors(pattern: str) -> list[str]:
    """Conservative REQUIRED-literal factorization of a regex.

    Returns literal strings that must each appear (as a substring) in
    any match of ``pattern``. Sound by construction: anything uncertain
    breaks the current run or contributes nothing —

    * a char followed by ``*``/``?``/``{`` is dropped (optional);
      ``+`` keeps the char but breaks adjacency after it;
    * ``.`` ``[...]`` ``^`` ``$`` and every escape break the run;
    * an alternation makes its whole level contribute nothing;
    * a group quantified with ``*``/``?``/``{`` is skipped entirely;
      an unquantified or ``+``-quantified group is recursed into
      (``(?:`` stripped; other ``(?`` extensions skipped);
    * factors never span a group boundary.
    """

    def parse(p: str) -> list[str] | None:
        """Factors of one alternation-free level; None if ``|`` seen."""
        out: list[str] = []
        cur: list[str] = []

        def flush():
            if cur:
                out.append("".join(cur))
                cur.clear()

        i, n = 0, len(p)
        while i < n:
            c = p[i]
            if c == "|":
                return None
            if c == "\\":
                flush()
                i += 2
                continue
            if c == "[":
                flush()
                i = _skip_class(p, i)
                if i < n and p[i] in _OPTIONAL_QUANT:
                    i = _skip_braces(p, i) if p[i] == "{" else i + 1
                elif i < n and p[i] == "+":
                    i += 1
                continue
            if c == "(":
                flush()
                j = _match_paren(p, i)
                inner = p[i + 1 : j]
                k = j + 1
                quant = p[k] if k < n else "\0"
                if quant in _OPTIONAL_QUANT:
                    i = _skip_braces(p, k) if quant == "{" else k + 1
                    continue
                if quant == "+":
                    k += 1
                if inner.startswith("?:"):
                    inner = inner[2:]
                elif inner.startswith("?"):
                    i = k  # lookaround / flags — contribute nothing
                    continue
                sub = parse(inner)
                if sub is not None:
                    out.extend(sub)
                i = k
                continue
            if c in ".^$":
                flush()
                i += 1
                if i < n and p[i] in _OPTIONAL_QUANT + "+":
                    i = _skip_braces(p, i) if p[i] == "{" else i + 1
                continue
            if c in _OPTIONAL_QUANT + "+)":
                # stray quantifier (prev atom already handled) or
                # unbalanced paren — break conservatively
                flush()
                i = _skip_braces(p, i) if c == "{" else i + 1
                continue
            # literal character: peek at the following quantifier
            # (the sentinel must not be "" — `"" in str` is always True)
            nxt = p[i + 1] if i + 1 < n else "\0"
            if nxt in _OPTIONAL_QUANT:
                flush()  # c itself is optional
                i = _skip_braces(p, i + 1) if nxt == "{" else i + 2
                # a lazy modifier after * / ? ({m,n}? handled by brace skip)
                if i < n and p[i] == "?":
                    i += 1
                continue
            if nxt == "+":
                cur.append(c)
                flush()  # adjacency beyond c is not guaranteed
                i += 2
                if i < n and p[i] == "?":
                    i += 1
                continue
            cur.append(c)
            i += 1
        flush()
        return out

    got = parse(pattern)
    return got or []


def factor_trigrams(factors: list[str]) -> set[int]:
    """Packed int trigrams required by ``factors`` (lowercased; ASCII
    factors only — non-ASCII dropped, sound per the module caveat)."""
    tris: set[int] = set()
    for fct in factors:
        low = fct.lower()
        if not low.isascii():
            continue
        b = low.encode()
        for i in range(len(b) - 2):
            tris.add((b[i] << 16) | (b[i + 1] << 8) | b[i + 2])
    return tris


# ----------------------------------------------------------------- build
def _local_tri_batches(batches, doc_base_of):
    """Arrow kernel: sorted, deduped corpus batches -> per-batch local
    trigram runs (TRI_LOCAL_SCHEMA). All byte work is numpy over the
    Arrow flat string buffer: pack b0<<16|b1<<8|b2 for every position,
    mask trigrams crossing document boundaries, per-doc unique via one
    (doc, tri) packed sort, then per-trigram gap-varint runs."""
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
        contents = pc.utf8_lower(pc.fill_null(contents, ""))
        if isinstance(contents, pa.ChunkedArray):
            contents = contents.combine_chunks()

        off_t = (
            np.int64 if pa.types.is_large_string(contents.type) else np.int32
        )
        offsets = np.frombuffer(contents.buffers()[1], dtype=off_t)[
            contents.offset : contents.offset + nb + 1
        ].astype(np.int64)
        data = np.frombuffer(contents.buffers()[2], dtype=np.uint8)[
            offsets[0] : offsets[-1]
        ]
        offsets = offsets - offsets[0]
        if data.size < 3:
            continue
        lens = np.diff(offsets)
        doc_of = np.repeat(np.arange(nb, dtype=np.int64), lens)
        packed = (
            (data[:-2].astype(np.int32) << 16)
            | (data[1:-1].astype(np.int32) << 8)
            | data[2:].astype(np.int32)
        )
        valid = doc_of[:-2] == doc_of[2:]
        d = doc_of[:-2][valid]
        t = packed[valid].astype(np.int64)
        if d.size == 0:
            continue
        # per-doc distinct trigrams: unique on the packed (doc, tri) key
        u = np.unique((d << 24) | t)
        dd = (u >> 24).astype(np.int64)
        tt = (u & 0xFFFFFF).astype(np.int64)
        # runs are built per trigram in doc order
        order = np.argsort(tt * nb + dd, kind="stable")
        tt, dd = tt[order], dd[order]
        gdoc = doc_ids[dd]
        rchange = np.empty(tt.size, dtype=bool)
        rchange[0] = True
        rchange[1:] = tt[1:] != tt[:-1]
        rstart = np.flatnonzero(rchange)
        rend = np.append(rstart[1:], tt.size)
        gaps = gdoc.copy()
        gaps[1:] -= gdoc[:-1]
        gaps[rstart] = gdoc[rstart]
        g_b, g_off = _section(gaps)
        payloads = [g_b[g_off[s] : g_off[e]] for s, e in zip(rstart, rend)]
        yield pa.record_batch(
            {
                "tri": pa.array(tt[rstart].astype(np.int32), type=pa.int32()),
                "first_doc": pa.array(gdoc[rstart], type=pa.int64()),
                "m": pa.array(
                    (rend - rstart).astype(np.int64), type=pa.int64()
                ),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )


def merge_tri_runs(local: DataFrame, cfg: IndexConfig, gen_base: int) -> DataFrame:
    """Sort-merge local trigram runs into global tri_segments rows.
    Runs of one trigram are doc-range-disjoint and sorted by
    ``first_doc``, so the merge is decode + concat + re-encode, chunked
    at ``cfg.pos_row_docs`` docs per row."""
    n_buckets = cfg.term_buckets
    shuffled = (
        local.withColumn(
            "bucket", F.pmod(F.col("tri"), F.lit(n_buckets)).cast("int")
        )
        # AQE-coalescible: see postings.merge_segments
        .repartition("bucket")
        .sortWithinPartitions("tri", "first_doc")
    )
    cols = ["tri", "shard", "df", "payload", "bucket"]
    cap = cfg.pos_row_docs

    def merge(batches):
        carry: pd.DataFrame | None = None

        def flush(group: pd.DataFrame) -> list:
            tri = int(group["tri"].iloc[0])
            ids_l = []
            for r in group.itertuples():
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                gaps, _ = varint_decode(buf, 0, int(r.m))
                ids_l.append(np.cumsum(gaps.astype(np.int64)))
            ids = np.concatenate(ids_l)
            rows = []
            for ci, lo in enumerate(range(0, ids.size, cap)):
                hi = min(lo + cap, ids.size)
                cids = ids[lo:hi]
                gaps = cids.copy()
                gaps[1:] -= cids[:-1]
                g_b, _ = _section(gaps)
                rows.append(
                    (
                        tri,
                        int(gen_base + ci),
                        int(hi - lo),
                        g_b,
                        int(tri % n_buckets),
                    )
                )
            return rows

        def process(head: pd.DataFrame):
            out = []
            tris = head["tri"].to_numpy()
            bounds = np.flatnonzero(
                np.concatenate(([True], tris[1:] != tris[:-1]))
            )
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
            last = pdf["tri"].iloc[-1]
            cut = pdf["tri"].ne(last)
            if cut.any():
                split = int(cut[::-1].idxmin())
                head, carry = pdf.iloc[:split], pdf.iloc[split:]
            else:
                carry = pdf
                continue
            yield from process(head)
        if carry is not None and len(carry):
            yield from process(carry)

    return shuffled.mapInPandas(merge, schema=TRI_SEGMENT_SCHEMA)


def build_trigrams(
    spark: SparkSession,
    index_root: str,
    corpus: DataFrame,
    cfg: IndexConfig | None = None,
) -> dict:
    """Build (or incrementally extend) the trigram sibling index for an
    existing main index at ``index_root`` — same lifecycle contract as
    ``build_positions``: full build after ``build_index`` with the SAME
    corpus; incremental after ``append`` with the FULL corpus (only
    docs above the high-water mark are scanned, cost ∝ delta); a
    compaction invalidates loudly via the docs-version stamp."""
    from .ids import KEY, dedup_sorted

    cfg = cfg or IndexConfig()
    cat = Catalog(index_root)
    if not cat.exists("docs"):
        raise ValueError("build the main index first (docs table missing)")
    t0 = time.time()
    props = cat.get_properties() or {}
    state = props.get("trigrams_state")
    docs = cat.read(spark, "docs")

    src = corpus.select("repo", "path", "commit", "lang", "content")
    if state is not None:
        covered = int(state["max_doc"])
        # crash-window repair (same contract as build_positions): the
        # tri_segments tag is durable with the data commit, the props
        # update is not — extend from the committed high-water mark,
        # never the possibly-stale props, so a replayed micro-batch
        # cannot re-append covered docs.
        cmax = max(
            (int(t.get("max_doc", 0)) for t in cat.committed_tags("tri_segments")),
            default=0,
        )
        if cmax > covered:
            covered = cmax
            state = {**state, "max_doc": cmax,
                     "docs_version": cat.current_version("docs")}
            props["trigrams_state"] = state
            cat.set_properties(props)
        old_keys = docs.filter(F.col("doc_id") <= covered).select(*KEY)
        src = src.join(old_keys, KEY, "left_anti")
        id_offset = covered
        gen = len(cat.committed_tags("tri_segments"))
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
            f"corpus/docs mismatch: trigrams would cover {covered}+{total} "
            f"docs but the docs table has {expect} — pass the same corpus "
            "the main index was built/appended from"
        )
    if total == 0:
        s1.unpersist()
        return {"trigram_docs": 0, "noop": True}

    def kernel(batches):
        yield from _local_tri_batches(
            batches, lambda p: boff.value.get(p, id_offset)
        )

    local = s1.mapInArrow(kernel, schema=TRI_LOCAL_SCHEMA)
    segs = merge_tri_runs(local, cfg, gen_base=gen << 20)

    from pyspark.sql import Observation

    obs = Observation(f"tri-build-{gen}")
    segs = segs.observe(
        obs, F.count("*").alias("rows"), F.sum("df").alias("postings")
    )
    cat.write(
        "tri_segments", segs,
        mode="append" if state is not None else "overwrite",
        partition_by=["bucket"],
        tag={"unit": f"trigrams-{gen}", "max_doc": covered + total},
    )
    s1.unpersist()
    props = cat.get_properties() or {}
    props["trigrams_state"] = {
        "max_doc": covered + total,
        "docs_version": cat.current_version("docs"),
        "term_buckets": cfg.term_buckets,
    }
    cat.set_properties(props)
    got = obs.get
    return {
        "trigram_docs": int(total),
        "trigram_rows": int(got["rows"] or 0),
        "trigram_postings": int(got["postings"] or 0),
        "wall_s": time.time() - t0,
        "noop": False,
    }


def compact_trigrams(spark, cat: Catalog, cfg: IndexConfig, dels: np.ndarray) -> int:
    """Rewrite tri_segments under a tombstone compaction: drop deleted
    docs and renumber survivors densely (the same strictly-monotone map
    as the segments/positions rewrites). One map-only pass; rows whose
    docs all survive re-encode in place (the gap bytes change only where
    a deletion shifts ids)."""
    if not cat.exists("tri_segments"):
        return 0
    bdel = spark.sparkContext.broadcast(np.asarray(dels, dtype=np.int64))
    segs = cat.read(spark, "tri_segments")
    cols = ["tri", "shard", "df", "payload", "bucket"]
    n_buckets = cfg.term_buckets

    def rewrite(batches):
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                buf = np.frombuffer(r.payload, dtype=np.uint8)
                m = int(r.df)
                gaps, _ = varint_decode(buf, 0, m)
                ids = np.cumsum(gaps.astype(np.int64))
                keep = ~np.isin(ids, bdel.value, assume_unique=True)
                if not keep.any():
                    continue
                new_ids = ids[keep]
                new_ids = new_ids - np.searchsorted(bdel.value, new_ids, "left")
                ngaps = new_ids.copy()
                ngaps[1:] -= new_ids[:-1]
                g_b, _ = _section(ngaps)
                out.append(
                    (int(r.tri), int(r.shard), int(new_ids.size), g_b,
                     int(r.tri % n_buckets))
                )
            if out:
                yield pd.DataFrame(out, columns=cols)

    new_segs = segs.mapInPandas(rewrite, schema=TRI_SEGMENT_SCHEMA)
    cat.write(
        "tri_segments", new_segs, mode="overwrite", partition_by=["bucket"],
        tag={"unit": "trigrams-compact"},
    )
    props = cat.get_properties() or {}
    st = props.get("trigrams_state") or {}
    darr = np.asarray(dels, dtype=np.int64)
    old_max = int(st.get("max_doc", 0))
    st["max_doc"] = old_max - int(np.searchsorted(darr, old_max, "right"))
    st["docs_version"] = cat.current_version("docs")
    props["trigrams_state"] = st
    cat.set_properties(props)
    return 1


# ----------------------------------------------------------------- query
# fetch at most this many trigram posting lists per query — any subset
# of the required trigrams is a sound prefilter, and past a handful the
# intersection stops shrinking while fetch cost keeps growing
MAX_QUERY_TRIS = 32


class GrepReader:
    """Query-time view of the trigram sibling index."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        corpus: DataFrame,
        cfg: IndexConfig | None = None,
        deleted: np.ndarray | None = None,
    ):
        self.spark = spark
        self.cat = Catalog(index_root)
        self.corpus = corpus
        props = self.cat.get_properties() or {}
        persisted = props.get("index_config")
        if cfg is None and persisted is not None:
            known = {
                k: v for k, v in persisted.items()
                if k in IndexConfig.__dataclass_fields__
            }
            cfg = IndexConfig(**known)
        self.cfg = cfg or IndexConfig()
        state = props.get("trigrams_state")
        if state is None or not self.cat.exists("tri_segments"):
            raise ValueError(
                f"no trigram index at {index_root}; run build_trigrams()"
            )
        cur_v = self.cat.current_version("docs")
        if int(state.get("docs_version", -1)) != cur_v:
            raise ValueError(
                "trigram index is stale (docs table changed since the last "
                "build_trigrams); rebuild it with the full corpus"
            )
        self._segments = self.cat.read(spark, "tri_segments")
        self._docs = self.cat.read(spark, "docs")
        self._cache: dict[int, np.ndarray] = {}
        self._deleted = deleted

    # ---------------------------------------------------------- prefilter
    def _fetch(self, tris: list[int]) -> dict[int, np.ndarray]:
        missing = [t for t in dict.fromkeys(tris) if t not in self._cache]
        if missing:
            n_buckets = self.cfg.term_buckets
            bs = sorted({t % n_buckets for t in missing})
            tbl = (
                self._segments.filter(
                    F.col("bucket").isin(bs) & F.col("tri").isin(missing)
                )
                .select("tri", "shard", "df", "payload")
                .toArrow()
            )
            by_tri: dict[int, list] = {}
            t_col = tbl.column("tri").to_pylist()
            s_col = tbl.column("shard").to_pylist()
            d_col = tbl.column("df").to_pylist()
            payloads = tbl.column("payload")
            for i in range(tbl.num_rows):
                by_tri.setdefault(t_col[i], []).append(
                    (s_col[i], d_col[i], payloads[i])
                )
            for t in missing:
                rs = sorted(by_tri.get(t, []), key=lambda r: r[0])
                parts = []
                for _shard, m, payload in rs:
                    buf = np.frombuffer(payload.as_py(), dtype=np.uint8)
                    gaps, _ = varint_decode(buf, 0, int(m))
                    parts.append(np.cumsum(gaps.astype(np.int64)))
                self._cache[t] = (
                    np.concatenate(parts) if parts
                    else np.empty(0, dtype=np.int64)
                )
        return {t: self._cache[t] for t in dict.fromkeys(tris)}

    def candidates(self, tris: set[int]) -> np.ndarray | None:
        """Sorted doc ids containing every trigram in ``tris`` (a sound
        superset of any pattern requiring them); None if ``tris`` is
        empty (no prefilter possible)."""
        if not tris:
            return None
        use = sorted(tris)
        if len(use) > MAX_QUERY_TRIS:
            # even spread keeps factors from every part of the pattern
            idx = np.linspace(0, len(use) - 1, MAX_QUERY_TRIS).astype(int)
            use = [use[i] for i in np.unique(idx)]
        got = self._fetch(use)
        lists = sorted(got.values(), key=lambda a: a.size)
        cand = lists[0]
        for arr in lists[1:]:
            if cand.size == 0:
                break
            cand = np.intersect1d(cand, arr, assume_unique=True)
        if self._deleted is not None and cand.size:
            cand = cand[~np.isin(cand, self._deleted)]
        return cand

    # ------------------------------------------------------------- serve
    def grep(
        self,
        pattern: str,
        regex: bool = False,
        case_sensitive: bool = False,
        _force_full_scan: bool = False,
    ) -> DataFrame:
        """(doc_id, repo, path) of documents matching ``pattern``,
        doc_id ascending. Literal mode = substring containment; regex
        mode = JVM ``rlike`` (match anywhere)."""
        factors = [pattern] if not regex else literal_factors(pattern)
        tris = factor_trigrams(factors)
        cand = None if _force_full_scan else self.candidates(tris)

        if regex:
            pat = pattern if case_sensitive else "(?i)" + pattern
            matcher = F.col("content").rlike(pat)
        elif case_sensitive:
            matcher = F.contains(F.col("content"), F.lit(pattern))
        else:
            matcher = F.contains(
                F.lower(F.col("content")), F.lit(pattern.lower())
            )

        keys = self._docs.select("doc_id", "repo", "path", "commit")
        if cand is not None:
            cdf = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": cand.astype("int64")}),
                schema="doc_id long",
            )
            keys = keys.join(F.broadcast(cdf), "doc_id")
        elif self._deleted is not None and self._deleted.size:
            ddf = self.spark.createDataFrame(
                pd.DataFrame({"doc_id": self._deleted.astype("int64")})
            )
            keys = keys.join(F.broadcast(ddf), "doc_id", "left_anti")
        hit = (
            self.corpus.select("repo", "path", "commit", "content")
            .join(F.broadcast(keys) if cand is not None else keys,
                  ["repo", "path", "commit"])
            .filter(matcher)
        )
        return hit.select("doc_id", "repo", "path").orderBy("doc_id")

    def grep_topk(
        self,
        reader,
        pattern: str,
        query: str,
        k: int = 10,
        regex: bool = False,
        case_sensitive: bool = False,
    ):
        """BM25-ranked grep: the trigram-prefiltered match set of
        ``pattern`` selects, ``reader`` (an IndexReader on the same
        root) ranks by the standard scorer over ``query``'s tokens with
        full-corpus statistics — the Lucene filter-query + scorer
        composition (same contract as ``phrase_topk`` / ``topk_where``).
        Returns [(rank, doc_id, score)]."""
        matched = np.array(
            sorted(
                r["doc_id"]
                for r in self.grep(
                    pattern, regex=regex, case_sensitive=case_sensitive
                ).collect()
            ),
            dtype=np.int64,
        )
        return reader.rank_doc_set(matched, query, k)
