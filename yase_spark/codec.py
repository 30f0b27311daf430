"""Delta-gap + varint (LEB128) posting-list codec, numpy-vectorized.

Spec: BASELINE.json:6 "delta-gap + varint-compressed posting lists with
skip/block-max metadata". A pure-Python byte loop would dominate build
time and violate BASELINE.json:15 ("no per-row Python"); both encode and
decode here are O(bytes) numpy array programs (SURVEY.md §4.3).

Layout of one term's posting payload (``encode_postings``):

    [varint gaps (n)] [varint tfs (n)] [varint doc_lens (n)]

where ``gaps[0] = doc_ids[0]`` and ``gaps[i] = doc_ids[i] - doc_ids[i-1]``
(doc_ids strictly increasing). Block metadata (every ``block_size``
postings) carries (block_first, block_last, max_tf, max_score,
byte_offset, n_docs); ``byte_offset`` points into the *gaps* section so a
block-max WAND executor can skip whole blocks without decoding them
(SURVEY.md §2.5 C3/C4). doc_lens ride along so BM25 per-doc length
normalization needs no join at query time.
"""

from __future__ import annotations

import numpy as np

# thresholds[i] = smallest value needing i+2 bytes; width = searchsorted+1
_THRESHOLDS = (np.uint64(1) << (np.uint64(7) * np.arange(1, 10, dtype=np.uint64)))


def varint_encode(values: np.ndarray) -> np.ndarray:
    """Encode a uint64/int64 array as concatenated LEB128 bytes (uint8)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    widths = np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1
    starts = np.concatenate(([0], np.cumsum(widths)[:-1]))
    out = np.zeros(int(widths.sum()), dtype=np.uint8)
    maxw = int(widths.max())
    for j in range(maxw):
        mask = widths > j
        chunk = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (widths[mask] - 1 > j).astype(np.uint8) << 7
        out[starts[mask] + j] = chunk | cont
    return out


def varint_decode(buf: np.ndarray | bytes, offset: int = 0, count: int | None = None):
    """Decode LEB128 bytes -> (uint64 array, bytes consumed).

    Decodes ``count`` varints starting at ``offset`` (all if None).
    Vectorized: per-byte contributions are shifted then summed per value
    with ``np.add.reduceat``.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    b = b[offset:]
    if count is not None:
        if count == 0:
            return np.empty(0, dtype=np.uint64), 0
        # bounded scan: LEB128(uint64) is <= 10 bytes/value, so the lazy
        # block decoder (count = block postings) never touches bytes past
        # its own block region — O(block), not O(payload)
        b = b[: count * 10]
    if b.size == 0:
        return np.empty(0, dtype=np.uint64), 0
    ends = np.flatnonzero((b & 0x80) == 0)
    if count is not None:
        ends = ends[:count]
    nbytes = int(ends[-1]) + 1
    if nbytes == ends.size:  # all single-byte varints (common for tfs)
        return b[:nbytes].astype(np.uint64), nbytes
    starts = np.empty(ends.size, dtype=np.int64)
    starts[0] = 0
    np.add(ends[:-1], 1, out=starts[1:])
    # width-stratified decode: level j gathers the (j+1)-th byte of every
    # value that HAS one — O(sum of widths) gathers on value-sized
    # arrays, no per-byte index/shift arrays (those dominated the old
    # profile at ~4x the cost)
    low = b & np.uint8(0x7F)
    vals = low[starts].astype(np.uint64)
    rem = ends - starts  # width-1 per value
    maxw = int(rem.max())
    idx = starts
    sel = None
    for j in range(1, maxw + 1):
        m = rem >= j
        sel = np.flatnonzero(m) if sel is None else sel[rem[sel] >= j]
        idx = starts[sel] + j
        vals[sel] |= low[idx].astype(np.uint64) << np.uint64(7 * j)
    return vals, nbytes


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    gaps = np.empty_like(ids)
    if ids.size:
        gaps[0] = ids[0]
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64))


def bm25_term_scores(
    tf: np.ndarray, dl: np.ndarray, idf: float, k1: float, b: float, avgdl: float
) -> np.ndarray:
    """Vectorized per-doc BM25 contribution of one term (float64).

    Written as a single expression so the engine (here), the naive numpy
    scorer and the WAND executor share one IEEE-754 evaluation order
    (BASELINE.json:6 bitwise score parity).
    """
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    *,
    block_size: int,
    idf: float | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    avgdl: float = 1.0,
):
    """Encode one term's postings -> (payload bytes, block_meta list).

    ``doc_ids`` must be strictly increasing. If ``idf`` is given, block
    ``max_score`` is the true BM25 upper bound over the block's (tf, dl)
    pairs (global stats), else 0.0 (local pre-merge segments, finalized in
    merge — SURVEY.md §2.5 C6).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    n = doc_ids.size
    gaps_b = varint_encode(delta_encode(doc_ids))
    tfs_b = varint_encode(tfs)
    dls_b = varint_encode(dls)
    payload = np.concatenate([gaps_b, tfs_b, dls_b]).tobytes()

    def _cum_widths(vals: np.ndarray) -> np.ndarray:
        w = np.searchsorted(
            _THRESHOLDS, vals.astype(np.uint64), side="right"
        ).astype(np.int64) + 1
        return np.concatenate(([0], np.cumsum(w)))

    # per-block byte offsets: ``byte_offset`` into the gaps section (== the
    # payload, gaps come first); ``tf_off``/``dl_off`` are ABSOLUTE payload
    # offsets so a block-max WAND executor can decode ONLY surviving
    # blocks — all three sections — without touching the rest (lazy block
    # decode, SURVEY.md §2.6 Q6).
    cum = _cum_widths(delta_encode(doc_ids))
    cum_t = _cum_widths(tfs) + gaps_b.size
    cum_d = _cum_widths(dls) + gaps_b.size + tfs_b.size
    meta = []
    if idf is not None:
        scores = bm25_term_scores(tfs, dls, idf, k1, b, avgdl)
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        meta.append(
            {
                "block_first": int(doc_ids[s]),
                "block_last": int(doc_ids[e - 1]),
                "max_tf": int(tfs[s:e].max()),
                "max_score": float(scores[s:e].max()) if idf is not None else 0.0,
                "byte_offset": int(cum[s]),
                "tf_off": int(cum_t[s]),
                "dl_off": int(cum_d[s]),
                "n_docs": int(e - s),
            }
        )
    return payload, meta


def decode_block(payload: bytes, meta: dict, prev_last: int):
    """Decode ONE block of a posting payload using its skip metadata —
    the lazy path of the block-max WAND executor: skipped blocks never
    touch these bytes.

    ``prev_last``: doc_id of the last posting of the PREVIOUS block in the
    same payload (0 for the first block) — the delta chain is continuous
    across blocks within one payload, so the stored ``block_last`` of the
    previous block re-anchors it without decoding anything earlier.
    Returns (doc_ids, tfs, dls) int64 arrays of ``meta['n_docs']`` items.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    n = int(meta["n_docs"])
    gaps, _ = varint_decode(buf, int(meta["byte_offset"]), n)
    tfs, _ = varint_decode(buf, int(meta["tf_off"]), n)
    dls, _ = varint_decode(buf, int(meta["dl_off"]), n)
    ids = np.cumsum(gaps.astype(np.int64)) + int(prev_last)
    return ids, tfs.astype(np.int64), dls.astype(np.int64)


def varint_one(v: int) -> bytes:
    """LEB128 of a single non-negative int (used only at slice
    boundaries — once per selected block run, never per posting)."""
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def slice_blocks(payload: bytes, metas: list, sel) -> tuple[bytes, list[dict]]:
    """Extract the selected blocks of one segment row into a
    SELF-CONTAINED (payload, block_meta) pair without decoding any
    posting — pure byte surgery on the stored section extents
    (SURVEY.md §2.5 C4: ``byte_offset``/``tf_off``/``dl_off`` bound each
    block's bytes in all three sections).

    The delta chain is continuous across blocks within a payload, so a
    selected block whose ORIGINAL predecessor is not the PREVIOUS
    selected block must have its first gap rewritten: the stored
    ``block_first`` (absolute) minus the new predecessor's
    ``block_last`` — one single-varint rewrite per discontinuity, which
    is what keeps the slice O(selected bytes).

    ``metas``: the row's block_meta dicts in order; ``sel``: sorted
    selected block indices. Returns (new_payload, new_metas) decodable
    by ``decode_block``/``LazyTermPostings`` exactly as a stored row.
    """
    B = len(metas)
    g_end = int(metas[0]["tf_off"])
    t_end = int(metas[0]["dl_off"])
    offs = [int(m["byte_offset"]) for m in metas] + [g_end]
    toffs = [int(m["tf_off"]) for m in metas] + [t_end]
    doffs = [int(m["dl_off"]) for m in metas] + [len(payload)]
    mv = memoryview(payload)
    gap_parts, tf_parts, dl_parts = [], [], []
    g_lens, t_lens, d_lens = [], [], []
    prev_last = 0
    for b in sel:
        b = int(b)
        gb = bytes(mv[offs[b]:offs[b + 1]])
        orig_prev = int(metas[b - 1]["block_last"]) if b > 0 else 0
        if prev_last != orig_prev:
            j = 0
            while gb[j] & 0x80:
                j += 1
            gb = varint_one(int(metas[b]["block_first"]) - prev_last) + gb[j + 1:]
        tb = mv[toffs[b]:toffs[b + 1]]
        db = mv[doffs[b]:doffs[b + 1]]
        gap_parts.append(gb)
        tf_parts.append(tb)
        dl_parts.append(db)
        g_lens.append(len(gb))
        t_lens.append(len(tb))
        d_lens.append(len(db))
        prev_last = int(metas[b]["block_last"])
    G, T = sum(g_lens), sum(t_lens)
    new_payload = b"".join(
        [bytes(x) for x in gap_parts]
        + [bytes(x) for x in tf_parts]
        + [bytes(x) for x in dl_parts]
    )
    new_metas = []
    go = to = do = 0
    for i, b in enumerate(sel):
        m = metas[int(b)]
        new_metas.append(
            {
                "block_first": int(m["block_first"]),
                "block_last": int(m["block_last"]),
                "max_tf": int(m["max_tf"]),
                "max_score": float(m["max_score"]),
                "byte_offset": go,
                "tf_off": G + to,
                "dl_off": G + T + do,
                "n_docs": int(m["n_docs"]),
            }
        )
        go += g_lens[i]
        to += t_lens[i]
        do += d_lens[i]
    return new_payload, new_metas


def concat_segment_rows(parts: list[tuple[bytes, list]]) -> tuple[bytes, list[dict]]:
    """Concatenate the doc-ordered shard rows of ONE term into a single
    self-contained (payload, block_meta) — the force-merge kernel. Pure
    byte surgery like ``slice_blocks``: each row's three sections are
    spliced into combined [gaps | tfs | dls] sections and block_meta
    offsets are rebuilt; the ONLY varint rewritten is each subsequent
    row's very first gap (stored as the row's first ``block_first`` —
    the per-row chain restarts at 0 — rewritten to
    ``block_first - previous row's block_last`` so the merged chain is
    continuous). No posting is decoded; cost is O(total payload bytes).

    Requires rows in doc order with disjoint, increasing id ranges
    (shard rows of one term are doc_id-range shards — postings.py
    module docstring); violated input raises rather than corrupting."""
    gap_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    g_lens: list[int] = []
    t_lens: list[int] = []
    d_lens: list[int] = []
    all_metas: list = []
    prev_last = 0
    for payload, metas in parts:
        if not metas:
            continue
        first = int(metas[0]["block_first"])
        if all_metas and first <= prev_last:
            raise ValueError(
                f"shard rows out of doc order: block_first {first} <= "
                f"previous row's block_last {prev_last}"
            )
        mv = memoryview(payload)
        g_end = int(metas[0]["tf_off"])
        t_end = int(metas[0]["dl_off"])
        offs = [int(m["byte_offset"]) for m in metas] + [g_end]
        toffs = [int(m["tf_off"]) for m in metas] + [t_end]
        doffs = [int(m["dl_off"]) for m in metas] + [len(payload)]
        for b in range(len(metas)):
            gb = bytes(mv[offs[b]:offs[b + 1]])
            if b == 0 and prev_last != 0:
                j = 0
                while gb[j] & 0x80:
                    j += 1
                gb = varint_one(first - prev_last) + gb[j + 1:]
            gap_parts.append(gb)
            g_lens.append(len(gb))
            tb = bytes(mv[toffs[b]:toffs[b + 1]])
            tf_parts.append(tb)
            t_lens.append(len(tb))
            db = bytes(mv[doffs[b]:doffs[b + 1]])
            dl_parts.append(db)
            d_lens.append(len(db))
            all_metas.append(metas[b])
        prev_last = int(metas[-1]["block_last"])
    G, T = sum(g_lens), sum(t_lens)
    new_payload = b"".join(gap_parts + tf_parts + dl_parts)
    new_metas = []
    go = to = do = 0
    for i, m in enumerate(all_metas):
        new_metas.append(
            {
                "block_first": int(m["block_first"]),
                "block_last": int(m["block_last"]),
                "max_tf": int(m["max_tf"]),
                "max_score": float(m["max_score"]),
                "byte_offset": go,
                "tf_off": G + to,
                "dl_off": G + T + do,
                "n_docs": int(m["n_docs"]),
            }
        )
        go += g_lens[i]
        to += t_lens[i]
        do += d_lens[i]
    return new_payload, new_metas


def decode_postings(payload: bytes, n: int):
    """Inverse of encode_postings -> (doc_ids, tfs, dls) int64 arrays."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    gaps, used1 = varint_decode(buf, 0, n)
    tfs, used2 = varint_decode(buf, used1, n)
    dls, _ = varint_decode(buf, used1 + used2, n)
    return (
        delta_decode(gaps),
        tfs.astype(np.int64),
        dls.astype(np.int64),
    )


def decode_postings_nodl(payload: bytes, n: int):
    """Decode doc_ids + tfs ONLY, never touching the dls stream's bytes
    -> (doc_ids, tfs) int64 arrays. For readers holding the resident
    per-doc length array (the Lucene-norms posture — see
    IndexReader._get_doclens): dl is per-DOC data that the payload
    duplicates per posting, and its varint stream is the most expensive
    of the three to decode (multi-byte values; measured ~60% of
    decode_postings wall), while a doclens[ids] gather is one numpy
    pass. Byte-compatible with the standard payload — this is a reader
    choice, not an encoding variant."""
    buf = np.frombuffer(payload, dtype=np.uint8)
    gaps, used1 = varint_decode(buf, 0, n)
    tfs, _ = varint_decode(buf, used1, n)
    return delta_decode(gaps), tfs.astype(np.int64)
