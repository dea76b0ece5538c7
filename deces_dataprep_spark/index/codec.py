"""Posting-list block codec: delta-gap doc_ids + LEB128 varints.

The reference's Elasticsearch sink stores postings in Lucene FOR/PFor
blocks (an internal behavioral contract only — nothing to copy). We
build the equivalent explicitly:

* postings for a term are sorted by ``doc_id`` and split into blocks of
  ``BLOCK_SIZE`` (128) docs;
* within a block, doc_ids are delta-gap encoded (first gap is relative
  to the previous block's last doc, or the raw doc_id for block 0) and
  the gaps + term frequencies are LEB128-varint packed into ``bytes``;
* each block carries ``(n_docs, first_doc, last_doc, block_max_score)``
  — the per-block BM25 upper bound that block-max WAND uses to skip.

Everything is numpy-vectorized because encode/decode run inside
Arrow-batched pandas UDFs on executors (no per-row Python).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

BLOCK_SIZE = 128

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def varint_encode(values: np.ndarray | list[int]) -> bytes:
    """LEB128-encode an array of non-negative ints (vectorized)."""
    vals = np.ascontiguousarray(values, dtype=np.uint64)
    n = vals.size
    if n == 0:
        return b""
    # bytes needed per value: ceil(bit_length/7), min 1
    nb = np.ones(n, dtype=np.int64)
    v = vals >> _U7
    while v.any():
        nb += v > 0
        v >>= _U7
    offs = np.empty(n + 1, dtype=np.int64)
    offs[0] = 0
    np.cumsum(nb, out=offs[1:])
    buf = np.zeros(offs[-1], dtype=np.uint8)
    v = vals.copy()
    pos = offs[:-1].copy()
    remaining = nb.copy()
    active = np.arange(n)
    while active.size:
        sel_v = v[active]
        sel_pos = pos[active]
        cont = remaining[active] > 1
        buf[sel_pos] = (sel_v & _U0x7F).astype(np.uint8) | (cont.astype(np.uint8) << 7)
        v[active] = sel_v >> _U7
        pos[active] = sel_pos + 1
        remaining[active] -= 1
        active = active[remaining[active] > 0]
    return buf.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode a LEB128 byte string → uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    # value index of each byte: 0-based, increments after each end byte
    val_idx = np.empty(b.size, dtype=np.int64)
    val_idx[0] = 0
    np.cumsum(is_end[:-1], out=val_idx[1:])
    n_vals = int(is_end.sum())
    # byte position within its value
    starts = np.flatnonzero(np.concatenate(([True], is_end[:-1])))
    byte_pos = np.arange(b.size, dtype=np.uint64) - starts[val_idx].astype(np.uint64)
    contrib = (b & 0x7F).astype(np.uint64) << (_U7 * byte_pos)
    out = np.zeros(n_vals, dtype=np.uint64)
    np.add.at(out, val_idx, contrib)
    return out


class PostingBlock(NamedTuple):
    block_id: int
    n_docs: int
    first_doc: int
    last_doc: int
    doc_gaps: bytes
    tfs: bytes
    block_max_score: float


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    scores: np.ndarray | None = None,
    block_size: int = BLOCK_SIZE,
) -> list[PostingBlock]:
    """Split a sorted (doc_id, tf[, score]) posting list into encoded blocks.

    ``doc_ids`` must be sorted ascending and unique (uint64-safe range);
    ``scores`` are the exact BM25 contributions per posting, used to
    compute ``block_max_score`` (0.0 if not supplied).
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    blocks: list[PostingBlock] = []
    prev_last = np.uint64(0)
    for b0 in range(0, n, block_size):
        b1 = min(b0 + block_size, n)
        ids = doc_ids[b0:b1]
        gaps = np.empty(b1 - b0, dtype=np.uint64)
        gaps[0] = ids[0] - prev_last  # block 0: raw doc_id (prev_last=0)
        np.subtract(ids[1:], ids[:-1], out=gaps[1:])
        bmax = float(scores[b0:b1].max()) if scores is not None else 0.0
        blocks.append(
            PostingBlock(
                block_id=b0 // block_size,
                n_docs=b1 - b0,
                first_doc=int(ids[0]),
                last_doc=int(ids[-1]),
                doc_gaps=varint_encode(gaps),
                tfs=varint_encode(tfs[b0:b1]),
                block_max_score=bmax,
            )
        )
        prev_last = ids[-1]
    return blocks


def decode_block(doc_gaps: bytes, tfs: bytes, prev_last: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block → (doc_ids, tfs); ``prev_last`` is the previous
    block's last doc_id (0 for block 0)."""
    gaps = varint_decode(doc_gaps)
    ids = np.cumsum(gaps, dtype=np.uint64) + np.uint64(prev_last)
    return ids, varint_decode(tfs)


def decode_postings(blocks: list[PostingBlock]) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full (ordered) block list → (doc_ids, tfs)."""
    all_ids: list[np.ndarray] = []
    all_tfs: list[np.ndarray] = []
    prev_last = 0
    for blk in sorted(blocks, key=lambda b: b.block_id):
        ids, t = decode_block(blk.doc_gaps, blk.tfs, prev_last)
        all_ids.append(ids)
        all_tfs.append(t)
        prev_last = int(ids[-1])
    if not all_ids:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    return np.concatenate(all_ids), np.concatenate(all_tfs)
