"""Property tests for the varint/delta block codec (SURVEY §5.2)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deces_dataprep_spark.index.codec import (
    BLOCK_SIZE,
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    enc = varint_encode(np.array(vals, dtype=np.uint64))
    dec = varint_decode(enc)
    assert dec.tolist() == vals


def test_varint_known_bytes():
    # LEB128: 0→00, 127→7f, 128→80 01, 300→ac 02
    assert varint_encode([0]) == b"\x00"
    assert varint_encode([127]) == b"\x7f"
    assert varint_encode([128]) == b"\x80\x01"
    assert varint_encode([300]) == b"\xac\x02"
    assert varint_encode([]) == b""


@given(
    st.lists(st.integers(min_value=1, max_value=2**28), min_size=1, max_size=2000),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=50, deadline=None)
def test_postings_roundtrip(gaps, tf_seed):
    doc_ids = np.cumsum(np.array(gaps, dtype=np.uint64))
    rng = np.random.RandomState(tf_seed)
    tfs = rng.randint(1, 1000, size=doc_ids.size).astype(np.uint64)
    scores = rng.rand(doc_ids.size)
    blocks = encode_postings(doc_ids, tfs, scores)
    ids2, tfs2 = decode_postings(blocks)
    assert np.array_equal(ids2, doc_ids)
    assert np.array_equal(tfs2, tfs)
    # block invariants
    assert len(blocks) == (doc_ids.size + BLOCK_SIZE - 1) // BLOCK_SIZE
    for i, blk in enumerate(blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, doc_ids.size)
        assert blk.first_doc == int(doc_ids[lo])
        assert blk.last_doc == int(doc_ids[hi - 1])
        assert blk.n_docs == hi - lo
        assert blk.block_max_score == pytest.approx(scores[lo:hi].max())


def test_block_max_is_upper_bound():
    doc_ids = np.arange(1, 1001, dtype=np.uint64)
    tfs = np.ones(1000, dtype=np.uint64)
    scores = np.linspace(0.1, 2.0, 1000)
    blocks = encode_postings(doc_ids, tfs, scores)
    for i, blk in enumerate(blocks):
        lo, hi = i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, 1000)
        assert blk.block_max_score >= scores[lo:hi].max() - 1e-12
