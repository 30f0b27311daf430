"""Property tests for the varint/delta codec (SURVEY.md §5.4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from yase_spark.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(xs):
    vals = np.array(xs, dtype=np.uint64)
    enc = varint_encode(vals)
    dec, used = varint_decode(enc)
    assert used == enc.size
    assert np.array_equal(dec, vals)


@given(
    st.lists(st.integers(min_value=1, max_value=10**12), min_size=1, max_size=400, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(ids):
    doc_ids = np.array(sorted(ids), dtype=np.int64)
    n = doc_ids.size
    tfs = (doc_ids % 37 + 1).astype(np.int64)
    dls = (doc_ids % 991 + 40).astype(np.int64)
    payload, meta = encode_postings(
        doc_ids, tfs, dls, block_size=128, idf=1.25, avgdl=300.0
    )
    d_ids, d_tfs, d_dls = decode_postings(payload, n)
    assert np.array_equal(d_ids, doc_ids)
    assert np.array_equal(d_tfs, tfs)
    assert np.array_equal(d_dls, dls)
    # block metadata invariants
    assert sum(m["n_docs"] for m in meta) == n
    assert meta[0]["block_first"] == int(doc_ids[0])
    assert meta[-1]["block_last"] == int(doc_ids[-1])
    for m in meta:
        assert m["max_score"] > 0.0


def test_varint_decode_offset_count():
    a = np.array([5, 300, 2**40], dtype=np.uint64)
    b = np.array([1, 2], dtype=np.uint64)
    buf = np.concatenate([varint_encode(a), varint_encode(b)])
    v1, used1 = varint_decode(buf, 0, 3)
    v2, used2 = varint_decode(buf, used1, 2)
    assert np.array_equal(v1, a) and np.array_equal(v2, b)
    assert used1 + used2 == buf.size


def test_delta_empty():
    assert delta_encode(np.array([], dtype=np.int64)).size == 0
    assert delta_decode(np.array([], dtype=np.int64)).size == 0


def test_slice_blocks_self_contained():
    """slice_blocks must produce a payload+meta decodable standalone for
    ANY selected subset — including discontiguous runs, where the first
    gap of each run is rewritten against the new predecessor."""
    import itertools

    import numpy as np

    from yase_spark.codec import decode_block, encode_postings, slice_blocks

    rng = np.random.default_rng(7)
    ids = np.cumsum(rng.integers(1, 900, size=70)).astype(np.int64)
    tfs = rng.integers(1, 300, size=70).astype(np.int64)
    dls = rng.integers(1, 5000, size=70).astype(np.int64)
    payload, metas = encode_postings(
        ids, tfs, dls, block_size=8, idf=1.3, k1=1.2, b=0.75, avgdl=11.0
    )

    def decode_all(pl, ms):
        out_i, out_t, out_d = [], [], []
        prev = 0
        for m in ms:
            i, t, d = decode_block(pl, m, prev)
            prev = m["block_last"]
            out_i.append(i); out_t.append(t); out_d.append(d)
        return (np.concatenate(out_i), np.concatenate(out_t),
                np.concatenate(out_d))

    B = len(metas)
    sels = [list(range(B)), [0], [B - 1], [2, 3, 4], [0, 2, 5, 8], [1, 7]]
    sels += [sorted(s) for s in itertools.combinations(range(B), 3)][::7]
    for sel in sels:
        pl2, ms2 = slice_blocks(payload, metas, sel)
        got_i, got_t, got_d = decode_all(pl2, ms2)
        idx = np.concatenate(
            [np.arange(m["n_docs"]) + 8 * b for b, m in zip(sel, ms2)]
        )
        assert np.array_equal(got_i, ids[idx]), sel
        assert np.array_equal(got_t, tfs[idx]), sel
        assert np.array_equal(got_d, dls[idx]), sel
