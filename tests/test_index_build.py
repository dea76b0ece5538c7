"""End-to-end index build on the driver `documents` table: the SPIMI
postings must reproduce the plain-DataFrame tf/df facts exactly, and
QueryEngine (WAND over compressed blocks) must be rank-identical to the
Spark-SQL BM25 oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index.builder import build_index, term_frequencies
from deces_dataprep_spark.index.codec import decode_postings
from deces_dataprep_spark.index.query import QueryEngine, bm25_topk_df
from deces_dataprep_spark.index.wand import TermPostings


@pytest.fixture(scope="module")
def tables(spark, documents):
    t = build_index(spark, documents, n_shards=4)
    t.postings = t.postings.cache()
    t.postings.count()
    return t


def _collect_term(tables, term):
    rows = (
        tables.postings.filter(F.col("term") == term)
        .orderBy("shard", "block_id")
        .collect()
    )
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    return by_shard


def test_postings_match_dataframe_tf(spark, documents, tables):
    tf = term_frequencies(documents, n_shards=4).cache()
    for term in ["the", "spark", "join"]:
        want = {
            (r["shard"], r["doc_id"]): r["tf"]
            for r in tf.filter(F.col("term") == term).collect()
        }
        got = {}
        for shard, rows in _collect_term(tables, term).items():
            from deces_dataprep_spark.index.codec import PostingBlock

            blocks = [
                PostingBlock(r["block_id"], r["n_docs"], r["first_doc"],
                             r["last_doc"], bytes(r["doc_gaps"]), bytes(r["tfs"]),
                             r["block_max_tfnorm"], r["sum_tf"])
                for r in rows
            ]
            ids, tfs = decode_postings(blocks)
            for d, t in zip(ids.tolist(), tfs.tolist()):
                got[(shard, int(d))] = int(t)
        assert got == want, term


def test_dictionary_df_matches(spark, documents, tables):
    tf = term_frequencies(documents, n_shards=4)
    want = {
        r["term"]: r["n"]
        for r in tf.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {r["term"]: r["df"] for r in tables.dictionary.collect()}
    assert got == want


def test_block_sorted_and_sized(tables):
    rows = tables.postings.filter(F.col("term") == "the").collect()
    for r in rows:
        assert r["n_docs"] <= 128
        assert r["first_doc"] <= r["last_doc"]


@pytest.mark.parametrize(
    "query", ["spark join window", "the", "fast merge sort order", "nonexistentterm"]
)
def test_wand_engine_matches_sql_oracle(spark, documents, tables, query):
    engine = QueryEngine(tables)
    got = engine.search(query, k=10)
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_df(spark, documents, query, k=10, round_digits=None).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9)


@pytest.mark.parametrize("query", ["spark join window", "the", "fast merge sort"])
def test_distributed_index_topk_rank_identical(spark, documents, tables, query):
    """bm25_topk_from_index (decode→norms-join→agg→top-k as one plan)
    must match both the driver-side engine and the raw-docs oracle."""
    from deces_dataprep_spark.index.query import bm25_topk_from_index

    got = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_from_index(spark, tables, query, 10).collect()
    ]
    engine = QueryEngine(tables)
    want = engine.search(query, k=10)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9)


def test_autocomplete_ngram_index(spark, documents):
    """Edge-ngram index (deces_index.yml:28-33): the same build/query
    machinery over the autocomplete analyzer; a typed prefix is a term."""
    from deces_dataprep_spark.index.builder import build_index
    from deces_dataprep_spark.operators.es_fields import edge_ngram_field

    tables = build_index(spark, documents, n_shards=2,
                         tokenizer=edge_ngram_field)
    tables.postings = tables.postings.cache()
    engine = QueryEngine(tables)
    for prefix in ["spar", "ta", "win"]:
        got = engine.search(prefix, k=10)
        want = [
            (r["doc_id"], r["score"])
            for r in bm25_topk_df(spark, documents, prefix, k=10,
                                  round_digits=None,
                                  tokenizer=edge_ngram_field).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], prefix
        assert got, prefix  # prefixes of real tokens must hit


@pytest.mark.parametrize("query", ["spark join window", "the"])
def test_all_four_search_routes_rank_identical(spark, documents, tables, query):
    """wand / taat / distributed / auto must agree doc-for-doc; 'auto'
    must route distributed above the corpus threshold (nothing
    corpus-sized on the driver at scale)."""
    engine = QueryEngine(tables)
    results = {m: engine.search(query, k=10, method=m)
               for m in ("wand", "taat", "distributed", "auto")}
    for m, got in results.items():
        assert [d for d, _ in got] == [d for d, _ in results["wand"]], m
        # the distributed route rounds to 6 digits (search_after cursor
        # consistency), so its scores agree to 5e-7, not 1e-9
        tol = 5e-7 if m in ("distributed",) else 1e-9
        for (_, s1), (_, s2) in zip(got, results["wand"]):
            assert s1 == pytest.approx(s2, abs=tol), m

    # a tiny threshold forces the distributed route through 'auto'
    engine2 = QueryEngine(tables)
    engine2.DISTRIBUTED_CORPUS_THRESHOLD = 1
    got = engine2.search(query, k=10, method="auto")
    assert engine2._norms_cache == {} and engine2._norms_np_cache == {}
    assert [d for d, _ in got] == [d for d, _ in results["wand"]]


def test_salted_build_rank_identical_and_block_monotonic(spark, documents):
    """The df-skew defuser (salt_ranges + df threshold): a hot term's
    postings split across contiguous doc-id ranges with offset
    block_ids. The salted index must be (a) query-identical to the
    unsalted one on dense AND selective queries, (b)
    dictionary-identical, and (c) per-(shard, term) block_id-ordered
    blocks must have strictly increasing doc ranges (what WAND relies
    on)."""
    from deces_dataprep_spark.index.builder import build_index

    plain = build_index(spark, documents, n_shards=2)
    salted = build_index(spark, documents, n_shards=2, salt_ranges=8,
                         salt_df_threshold=50, salt_sample_frac=1.0)
    salted.postings = salted.postings.cache()

    d_p = {r["term"]: (r["df"], r["cf"]) for r in plain.dictionary.collect()}
    d_s = {r["term"]: (r["df"], r["cf"]) for r in salted.dictionary.collect()}
    assert d_p == d_s

    # the hot term really is split: more blocks than the unsalted build
    hot = "the"
    n_plain = plain.postings.filter(F.col("term") == hot).count()
    n_salted = salted.postings.filter(F.col("term") == hot).count()
    assert n_salted > n_plain

    # block ranges: ordered by block_id, doc ranges strictly increase
    rows = (salted.postings.filter(F.col("term") == hot)
            .orderBy("shard", "block_id").collect())
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        for a, b in zip(rs, rs[1:]):
            assert a["block_id"] < b["block_id"]
            assert a["last_doc"] < b["first_doc"], (shard, a["block_id"])

    e_p, e_s = QueryEngine(plain), QueryEngine(salted)
    for q, m in [("the", "wand"), ("the", "taat"),
                 ("spark join window", "wand"), ("fast merge sort", "taat")]:
        got = e_s.search(q, k=10, method=m)
        want = e_p.search(q, k=10, method=m)
        assert [d for d, _ in got] == [d for d, _ in want], (q, m)
        for (_, s1), (_, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, abs=1e-9)


def test_boolean_search_routes_rank_identical(spark, documents, tables):
    """ES bool query: exhaustive df plan vs from-index distributed plan
    must agree; must/must_not semantics hold."""
    from deces_dataprep_spark.index.query import (
        boolean_topk_df,
        boolean_topk_from_index,
    )

    must, should, must_not = ["table"], ["merge sort"], ["window"]
    want = [
        (r["doc_id"], r["score"])
        for r in boolean_topk_df(spark, documents, must, should, must_not,
                                 k=10, round_digits=None).collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in boolean_topk_from_index(spark, tables, must, should,
                                         must_not, k=10).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9)
    assert want, "bool query must hit the fixture corpus"

    # semantics: every hit contains all must terms, none of the must_not
    from deces_dataprep_spark.functions.analyze import tokens_col as tc
    toks = {r["doc_id"]: set(r["t"]) for r in documents.select(
        "doc_id", tc("text").alias("t")).collect()}
    for d, _ in want:
        assert "table" in toks[d]
        assert "window" not in toks[d]


def test_salt_partition_key_exact_integer_division(spark):
    """Regression (advisor r2): the salted repartition key must use
    exact integer division. doc_id = 10**18 - 1 rounds to 10**18 in
    double, so the old float `/` + cast computed salt 8 while the
    encoder's uint64 `//` computes 7 — one (shard, term, salt) group
    split across two partitions, duplicated block_ids, blocks out of
    doc order. With `div` both sides agree and the block invariants
    hold even at extreme 64-bit id magnitudes."""
    from deces_dataprep_spark.index.builder import make_salt_spec

    big = 10**18 - 1
    ids = [0, 7, 10**17, 3 * 10**17, 5 * 10**17 + 13, big]
    docs = spark.createDataFrame(
        [(i, "the quick fox the") for i in ids], "doc_id long, text string")
    # width = (span // 8) + 1 = 1.25e17 → big/width: float says 8.0
    # exactly (double(big) == 1e18), integer div says 7.
    spec = make_salt_spec(0, big, 8, len(ids))
    assert big // spec.width != int(float(big) / float(spec.width)), \
        "fixture must sit on a double-rounding boundary"

    salted = build_index(spark, docs, n_shards=1, salt_ranges=8,
                         salt_df_threshold=2, salt_sample_frac=1.0)
    rows = (salted.postings.filter(F.col("term") == "the")
            .orderBy("block_id").collect())
    assert rows, "hot term must be present"
    assert len({r["block_id"] for r in rows}) == len(rows)
    for a, b in zip(rows, rows[1:]):
        assert a["last_doc"] < b["first_doc"], (a["block_id"], b["block_id"])
    # all six docs survive the round trip, in order
    from deces_dataprep_spark.index.codec import decode_blocks_concat
    got, _ = decode_blocks_concat(
        [bytes(r["doc_gaps"]) for r in rows],
        [bytes(r["tfs"]) for r in rows],
        [int(r["first_doc"]) for r in rows],
        [int(r["n_docs"]) for r in rows])
    assert [int(x) for x in got] == sorted(ids)


def test_broadcast_topk_tie_break_on_duplicate_docs(spark):
    """Regression (advisor r2): >= k+1 exact-duplicate docs tie at the
    k-th score inside one norms batch; the per-batch cut must keep the
    whole tie group so the global (score desc, doc_id asc) merge picks
    the k LOWEST doc_ids, rank-identical to WAND/TAAT."""
    from deces_dataprep_spark.index.query import bm25_topk_broadcast

    dup = [(i, "orange banana kiwi") for i in range(40)]
    other = [(1000 + i, f"filler text number {i}") for i in range(20)]
    docs = spark.createDataFrame(dup + other, "doc_id long, text string")
    # single partition → all 40 duplicates share one batch
    t = build_index(spark, docs.coalesce(1), n_shards=1)
    rows = bm25_topk_broadcast(spark, t, "orange banana", k=10,
                               round_digits=6).collect()
    assert [r["doc_id"] for r in rows] == list(range(10))
    eng = QueryEngine(t, spark=spark)
    want = eng.search("orange banana", k=10, method="taat")
    assert [r["doc_id"] for r in rows] == [d for d, _ in want]


def test_auto_salt_default_on_splits_hot_terms(spark, documents, monkeypatch):
    """Skew defense must be the DEFAULT (round-2 finding: opt-in
    salting protects nothing): with AUTO_SALT_MIN_DOCS lowered into
    fixture range, a plain build_index call salts the stopword-grade
    terms — more blocks for the hot term, dictionary- and
    rank-identical to the unsalted build."""
    from deces_dataprep_spark.index import builder

    monkeypatch.setattr(builder, "AUTO_SALT_MIN_DOCS", 1)
    plain = build_index(spark, documents, n_shards=2, auto_salt=False)
    auto = build_index(spark, documents, n_shards=2,
                       salt_sample_frac=1.0)  # default auto_salt=True
    auto.postings = auto.postings.cache()
    hot = "the"
    assert (auto.postings.filter(F.col("term") == hot).count()
            > plain.postings.filter(F.col("term") == hot).count())
    d_p = {r["term"]: (r["df"], r["cf"]) for r in plain.dictionary.collect()}
    d_a = {r["term"]: (r["df"], r["cf"]) for r in auto.dictionary.collect()}
    assert d_p == d_a
    e_p, e_a = QueryEngine(plain), QueryEngine(auto)
    for q in ("the", "spark join window"):
        assert e_a.search(q, k=10) == pytest.approx(e_p.search(q, k=10))


def _block_map(df):
    return {
        (r["shard"], r["term"], r["block_id"]): (
            r["n_docs"], r["first_doc"], r["last_doc"],
            bytes(r["doc_gaps"]), bytes(r["tfs"]),
            round(r["block_max_tfnorm"], 12), r["sum_tf"])
        for r in df.collect()
    }


def test_packed_layout_byte_identical_to_stream(spark, documents):
    """The packed layout (JVM-side tf fold + block bucketing, one Arrow
    row per block) must produce BYTE-identical posting blocks to the
    streaming per-posting encoder — gaps, varints, block ids, bounds,
    everything."""
    from deces_dataprep_spark.index.builder import (
        docs_with_tokens,
        postings_plan_from_tokens,
    )

    toks = docs_with_tokens(documents)
    n_docs = toks.count()
    avgdl = float(toks.agg(F.avg("dl")).collect()[0][0])
    a = _block_map(postings_plan_from_tokens(
        spark, toks, 2, n_docs, avgdl, layout="packed"))
    b = _block_map(postings_plan_from_tokens(
        spark, toks, 2, n_docs, avgdl, layout="stream"))
    assert a == b and a


def test_packed_layout_byte_identical_salted(spark, documents):
    """Same byte-identity under hot-term salting: per-salt-range gap
    chains restart at 0 and block_ids carry the salt offset in both
    layouts."""
    from deces_dataprep_spark.index.builder import (
        docs_with_tokens,
        hot_terms_by_df,
        make_salt_spec,
        postings_plan_from_tokens,
    )

    toks = docs_with_tokens(documents)
    n_docs = toks.count()
    avgdl = float(toks.agg(F.avg("dl")).collect()[0][0])
    mm = toks.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
    hot = hot_terms_by_df(toks, 50, sample_frac=1.0)
    assert hot, "fixture needs at least one hot term"
    salt = make_salt_spec(int(mm[0]), int(mm[1]), 8, n_docs, hot_terms=hot)
    a = _block_map(postings_plan_from_tokens(
        spark, toks, 2, n_docs, avgdl, salt=salt, layout="packed"))
    b = _block_map(postings_plan_from_tokens(
        spark, toks, 2, n_docs, avgdl, salt=salt, layout="stream"))
    assert a == b and a
