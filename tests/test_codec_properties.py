"""Property-based tests (hypothesis): varint/block codec roundtrips on
adversarial inputs; WAND ≡ TAAT ≡ exhaustive on random posting sets."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from deces_dataprep_spark.index import bm25
from deces_dataprep_spark.index.codec import (
    decode_postings,
    encode_postings,
    varint_decode,
    varint_encode,
)
from deces_dataprep_spark.index.wand import (
    TermPostings,
    exhaustive_topk,
    taat_topk,
    wand_topk,
)

u64 = st.integers(min_value=0, max_value=2**64 - 1)


@given(st.lists(u64, max_size=300))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    got = varint_decode(varint_encode(np.array(vals, dtype=np.uint64)))
    assert got.tolist() == vals


@given(
    st.sets(st.integers(min_value=0, max_value=2**62), min_size=1, max_size=600),
    st.integers(min_value=1, max_value=7),
    st.integers(min_value=1, max_value=200),
)
@settings(max_examples=60, deadline=None)
def test_block_roundtrip(doc_set, tf_mod, block_size):
    ids = np.array(sorted(doc_set), dtype=np.uint64)
    tfs = (ids % np.uint64(tf_mod)) + np.uint64(1)
    blocks = encode_postings(ids, tfs, None, block_size)
    assert all(b.n_docs <= block_size for b in blocks)
    got_ids, got_tfs = decode_postings(blocks)
    assert got_ids.tolist() == ids.tolist()
    assert got_tfs.tolist() == tfs.tolist()


def _mk_term(term, doc_set, n_docs, avgdl, dls):
    ids = np.array(sorted(doc_set), dtype=np.uint64)
    tfs = (ids % np.uint64(3)) + np.uint64(1)
    df = ids.size
    dl = np.array([dls[int(d)] for d in ids], dtype=np.float64)
    scores = bm25.bm25_score(tfs.astype(np.float64), float(df), dl, n_docs, avgdl)
    # store the idf-free tf-norm bound exactly like the builder does
    idf = bm25.idf(df, n_docs)
    blocks = encode_postings(ids, tfs, np.asarray(scores) / idf, 64)
    return TermPostings(
        term=term, df=df,
        block_ids=[b.block_id for b in blocks],
        n_docs=[b.n_docs for b in blocks],
        first_docs=[b.first_doc for b in blocks],
        last_docs=[b.last_doc for b in blocks],
        doc_gaps=[b.doc_gaps for b in blocks],
        tfs=[b.tfs for b in blocks],
        block_max=[idf * b.block_max_score for b in blocks],
    )


@given(
    st.lists(
        st.sets(st.integers(min_value=0, max_value=500), min_size=1, max_size=200),
        min_size=1, max_size=4,
    ),
    st.integers(min_value=1, max_value=15),
)
@settings(max_examples=40, deadline=None)
def test_wand_taat_exhaustive_rank_identical(term_doc_sets, k):
    all_docs = sorted(set().union(*term_doc_sets) | {0})
    n_docs = len(all_docs)
    dls = {d: 5 + (d % 17) for d in all_docs}
    avgdl = float(np.mean(list(dls.values())))
    terms = [
        _mk_term(f"t{i}", s, n_docs, avgdl, dls)
        for i, s in enumerate(term_doc_sets)
    ]
    want = exhaustive_topk(terms, n_docs, avgdl, dls, k)
    got_w = wand_topk(terms, n_docs, avgdl, dls, k)
    norm_ids = np.array(all_docs, dtype=np.uint64)
    norm_dls = np.array([dls[d] for d in all_docs], dtype=np.float64)
    got_t = taat_topk(terms, n_docs, avgdl, norm_ids, norm_dls, k)
    assert [d for d, _ in got_w] == [d for d, _ in want]
    assert [d for d, _ in got_t] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got_w, want):
        assert abs(a - b) < 1e-9
    for (_, a), (_, b) in zip(got_t, want):
        assert abs(a - b) < 1e-9


def test_decode_blocks_concat_equals_per_block():
    """The batched decoder must reproduce decode_block_abs exactly for
    arbitrary multi-term block mixes (each block self-delimiting)."""
    import numpy as np

    from deces_dataprep_spark.index.codec import (
        decode_block_abs,
        decode_blocks_concat,
        encode_postings,
    )

    rng = np.random.default_rng(7)
    blocks = []
    for start in (0, 10_000, 2**62):  # three "terms", huge-id regime too
        ids = np.cumsum(rng.integers(1, 1000, size=300)) + start
        tfs = rng.integers(1, 50, size=300)
        blocks.extend(encode_postings(ids.astype(np.uint64),
                                      tfs.astype(np.uint64)))
    got_ids, got_tfs = decode_blocks_concat(
        [b.doc_gaps for b in blocks], [b.tfs for b in blocks],
        [b.first_doc for b in blocks], [b.n_docs for b in blocks],
    )
    exp_ids, exp_tfs = [], []
    for b in blocks:
        i, t = decode_block_abs(b.doc_gaps, b.tfs, b.first_doc)
        exp_ids.append(i)
        exp_tfs.append(t)
    assert np.array_equal(got_ids, np.concatenate(exp_ids))
    assert np.array_equal(got_tfs, np.concatenate(exp_tfs))


@settings(deadline=None, max_examples=60)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**62),   # run start
            st.integers(min_value=1, max_value=400),     # run length
        ),
        min_size=0, max_size=6,
    ),
    st.integers(min_value=1, max_value=1000),            # max gap
)
def test_decode_blocks_concat_property(runs, max_gap):
    """Batched decode == per-block decode for arbitrary encoded runs
    (mixed lengths, huge-id regime, runs from unrelated 'terms')."""
    import numpy as np

    from deces_dataprep_spark.index.codec import (
        decode_block_abs,
        decode_blocks_concat,
        encode_postings,
    )

    rng = np.random.default_rng(0)
    blocks = []
    for start, n in runs:
        ids = (np.cumsum(rng.integers(1, max_gap + 1, size=n))
               + np.uint64(start)).astype(np.uint64)
        tfs = rng.integers(1, 1000, size=n).astype(np.uint64)
        blocks.extend(encode_postings(ids, tfs))
    got_ids, got_tfs = decode_blocks_concat(
        [b.doc_gaps for b in blocks], [b.tfs for b in blocks],
        [b.first_doc for b in blocks], [b.n_docs for b in blocks],
    )
    exp_i, exp_t = [], []
    for b in blocks:
        i, t = decode_block_abs(b.doc_gaps, b.tfs, b.first_doc)
        exp_i.append(i)
        exp_t.append(t)
    if blocks:
        assert np.array_equal(got_ids, np.concatenate(exp_i))
        assert np.array_equal(got_tfs, np.concatenate(exp_t))
    else:
        assert got_ids.size == 0 and got_tfs.size == 0


@given(
    st.lists(
        # token HASHES (the round-6 kernel input: JVM xxhash64 per
        # token) — a tiny value domain forces heavy collisions/repeats,
        # and the negative values exercise int64 handling
        st.lists(st.sampled_from([-3, -1, 0, 1, 2, 7]),
                 min_size=0, max_size=30),
        min_size=0, max_size=40,
    )
)
@settings(max_examples=200, deadline=None)
def test_top_bigram_count_udf_matches_counter(rows):
    """The batched pack/sort run-length kernel == a per-row Counter over
    adjacent pairs, on arbitrary ragged batches (empty rows, empty
    batches, single-token rows, repeated tokens)."""
    from collections import Counter

    import pandas as pd

    from deces_dataprep_spark.functions.text import _top_bigram_count_udf

    # call the underlying function, not the Spark-registered UDF
    fn = _top_bigram_count_udf.func
    got = fn(pd.Series([np.array(r, dtype=np.int64) for r in rows],
                       dtype=object)).to_numpy()
    want = np.array(
        [max(Counter(zip(r, r[1:])).values()) if len(r) >= 2 else 0
         for r in rows],
        np.int64,
    ) if rows else np.empty(0, np.int64)
    assert np.array_equal(got, want), (rows, got, want)
    # force the lexsort fallback (the rows·K² ≥ 2^62 guard path) and
    # require identical counts
    from deces_dataprep_spark.functions import text as _text_mod

    limit = _text_mod._BIGRAM_PACK_LIMIT
    try:
        _text_mod._BIGRAM_PACK_LIMIT = 0
        got2 = fn(pd.Series([np.array(r, dtype=np.int64) for r in rows],
                            dtype=object)).to_numpy()
    finally:
        _text_mod._BIGRAM_PACK_LIMIT = limit
    assert np.array_equal(got2, want), (rows, got2, want)
