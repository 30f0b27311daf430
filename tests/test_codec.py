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
