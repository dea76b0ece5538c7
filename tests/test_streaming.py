"""Structured-Streaming: incremental index deltas (availableNow),
TAAT-exact queries pre-compaction, compaction → rank-identical to a
from-scratch batch build; watermarked windowed aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index.query import QueryEngine, bm25_topk_df
from deces_dataprep_spark.sources.corpus import pages_from_documents
from deces_dataprep_spark.streaming.incremental import (
    compact_deltas,
    incremental_index,
    load_delta_index,
    stream_pages,
    windowed_event_counts,
)


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    """Pages landed as multiple files (arrival units for the stream)."""
    d = tmp_path_factory.mktemp("pages_in")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    pages.repartition(4).write.mode("overwrite").parquet(str(d / "files"))
    return str(d / "files")


@pytest.fixture(scope="module")
def streamed_wh(spark, pages_dir, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("stream_wh"))
    pages = stream_pages(spark, pages_dir, max_files_per_trigger=1)
    q = incremental_index(spark, pages, wh, n_shards=2, available_now=True)
    q.awaitTermination(300)
    return wh


def test_stream_ingests_multiple_batches(spark, streamed_wh):
    deltas = spark.read.option("basePath", os.path.join(streamed_wh, "postings_delta")) \
        .parquet(os.path.join(streamed_wh, "postings_delta"))
    n_batches = deltas.select("ingest_batch").distinct().count()
    assert n_batches >= 2  # maxFilesPerTrigger=1 over 4 files
    norms = spark.read.option("basePath", os.path.join(streamed_wh, "norms_delta")) \
        .parquet(os.path.join(streamed_wh, "norms_delta"))
    assert norms.count() == 500


def test_streamed_norms_dl_matches_tokenizer(spark, streamed_wh, pages_dir):
    """The norms side computes doc_len with regexp_count (array-free,
    no shared persisted projection) — it must equal size(tokens) for
    every streamed doc, including empty/whitespace-only texts."""
    from deces_dataprep_spark.index.builder import docs_with_tokens

    norms = spark.read.option(
        "basePath", os.path.join(streamed_wh, "norms_delta")) \
        .parquet(os.path.join(streamed_wh, "norms_delta")) \
        .select("doc_id", "doc_len")
    expect = docs_with_tokens(spark.read.parquet(pages_dir)) \
        .select("doc_id", F.col("dl").alias("doc_len"))
    assert norms.exceptAll(expect).count() == 0
    assert expect.exceptAll(norms).count() == 0


def test_regexp_count_dl_parity_edge_cases(spark):
    """null / empty / whitespace / accent-free parity of the two dl
    expressions the streaming path relies on being identical."""
    from deces_dataprep_spark.functions.analyze import (
        _JAVA_TOKEN_RX,
        tokens_col,
    )

    df = spark.createDataFrame(
        [(1, "a b  c"), (2, ""), (3, None), (4, "   "), (5, "x"),
         (6, "w00123-w4!"), (7, "a" * 500)],
        "doc_id long, text string")
    rows = df.select(
        F.size(tokens_col("text")).cast("long").alias("a"),
        F.regexp_count(F.col("text"), F.lit(_JAVA_TOKEN_RX))
        .cast("long").alias("b"),
    ).collect()
    for r in rows:
        assert r["a"] == r["b"]


def test_delta_index_taat_matches_oracle(spark, streamed_wh, pages_dir):
    pages = spark.read.parquet(pages_dir)
    eng = QueryEngine(load_delta_index(spark, streamed_wh))
    got = eng.search("spark merge sort table", k=10, method="taat")
    want = [
        (r["doc_id"], r["score"])
        for r in bm25_topk_df(spark, pages, "spark merge sort table", 10,
                              round_digits=None).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, s1), (_, s2) in zip(got, want):
        assert s1 == pytest.approx(s2, abs=1e-9)


def test_compaction_rank_identical_to_batch_build(spark, streamed_wh, pages_dir):
    from deces_dataprep_spark.index.builder import build_index

    pages = spark.read.parquet(pages_dir)
    compacted = compact_deltas(spark, streamed_wh, n_shards=2)
    eng_c = QueryEngine(compacted)

    batch = build_index(spark, pages, n_shards=2)
    batch.postings = batch.postings.cache()
    eng_b = QueryEngine(batch)

    for q in ["spark merge sort table", "the", "key value hash"]:
        got = eng_c.search(q, k=10)  # WAND bounds valid post-compaction
        want = eng_b.search(q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, s1), (_, s2) in zip(got, want):
            assert s1 == pytest.approx(s2, abs=1e-9)


def test_compaction_reingest_replace_semantics(spark, tmp_path):
    """A doc re-ingested in a later micro-batch REPLACES its earlier
    version: compaction must match a from-scratch build over the final
    corpus (not sum/multiply the old and new postings — the round-1 bug)."""
    from deces_dataprep_spark.index.builder import build_index
    from deces_dataprep_spark.streaming.incremental import _append_batch

    wh = str(tmp_path / "wh")
    batch0 = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma gamma") for i in range(8)],
        "doc_id long, text string",
    )
    # doc 3 re-ingested with entirely different text (and different dl)
    batch1 = spark.createDataFrame(
        [(3, "delta epsilon zeta")], "doc_id long, text string"
    )
    _append_batch(spark, batch0, 0, wh, n_shards=2)
    _append_batch(spark, batch1, 1, wh, n_shards=2)
    compacted = compact_deltas(spark, wh, n_shards=2)

    final = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma gamma") for i in range(8) if i != 3]
        + [(3, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    batch = build_index(spark, final, n_shards=2)

    # identical global stats, dictionary, and scores
    s_c = compacted.stats.collect()[0]
    s_b = batch.stats.collect()[0]
    assert int(s_c["n_docs"]) == int(s_b["n_docs"]) == 8
    assert float(s_c["avgdl"]) == pytest.approx(float(s_b["avgdl"]))
    d_c = {r["term"]: (r["df"], r["cf"]) for r in compacted.dictionary.collect()}
    d_b = {r["term"]: (r["df"], r["cf"]) for r in batch.dictionary.collect()}
    assert d_c == d_b
    assert d_c["gamma"] == (7, 14)  # doc 3's old gammas replaced, not summed
    eng_c, eng_b = QueryEngine(compacted), QueryEngine(batch)
    for q in ["gamma alpha", "delta epsilon", "doc3"]:
        assert eng_c.search(q, k=10) == eng_b.search(q, k=10), q


def test_compaction_blocks_spanning_arrow_batches(spark, tmp_path):
    """Regression (round-1 ADVICE): posting blocks of one (batch, shard,
    term) that land in different Arrow batches must decode with their
    own first_doc (abs decode) — forcing 1-row Arrow batches makes any
    prev_last chaining shift every continuation block's doc_ids."""
    from deces_dataprep_spark.index.builder import build_index
    from deces_dataprep_spark.streaming.incremental import _append_batch

    wh = str(tmp_path / "wh")
    # 300 docs sharing one term -> >128 postings per shard -> 2+ blocks
    docs = spark.createDataFrame(
        [(i, f"common uniq{i}") for i in range(300)], "doc_id long, text string"
    )
    _append_batch(spark, docs, 0, wh, n_shards=2)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        compacted = compact_deltas(spark, wh, n_shards=2)
        batch = build_index(spark, docs, n_shards=2)
        eng_c, eng_b = QueryEngine(compacted), QueryEngine(batch)
        got = eng_c.search("common uniq42", k=10)
        want = eng_b.search("common uniq42", k=10)
        assert got == want
        assert got[0][0] == 42
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_windowed_event_counts_streaming(spark, tmp_path):
    """Run the watermarked windowed agg as a real stream (availableNow
    over a file source) and compare to the equivalent batch agg."""
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev_in")
    events.repartition(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        out.writeStream.format("memory").queryName("win_counts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql("select * from win_counts")

    want = (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )
    # append mode only emits windows closed by the watermark — the last
    # open window(s) may be withheld; everything emitted must match.
    got_map = {(r["window_start"], r["event_type"]): r["n_events"]
               for r in got.collect()}
    want_map = {(r["window_start"], r["event_type"]): r["n_events"]
                for r in want.collect()}
    assert got_map
    for k, v in got_map.items():
        assert want_map[k] == v


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: run the event stream in 3
    arrival chunks (sessions may straddle chunk boundaries — the state
    carries them); every CLOSED session must equal the batch plan's
    (batch sessions minus each user's still-open last session)."""
    from pyspark.sql import Window as W

    from deces_dataprep_spark.streaming.sessions import (
        sessionize,
        sessionize_stream,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "sess_in")
    # land files in event-time order so arrival order == time order
    chunked = events.withColumn(
        "chunk", F.ntile(3).over(W.orderBy("ts", "event_id"))
    )
    for c in (1, 2, 3):
        (chunked.filter(F.col("chunk") == c).drop("chunk")
         .coalesce(1).write.mode("append").parquet(src))

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = sessionize_stream(stream, gap_minutes=30)
    q = (out.writeStream.format("memory").queryName("sess")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]):
            (r["session_end"], r["n_events"], r["sum_value"])
        for r in spark.sql("select * from sess").collect()
    }

    batch = sessionize(events, gap_minutes=30)
    w = W.partitionBy("user_id")
    closed = batch.withColumn(
        "mx", F.max("session_no").over(w)
    ).filter(F.col("session_no") < F.col("mx"))
    want = {
        (r["user_id"], r["session_start"]):
            (r["session_end"], r["n_events"], r["sum_value"])
        for r in closed.collect()
    }
    assert set(got) == set(want)
    assert len(got) > 0
    for k, (end, n, sv) in want.items():
        g_end, g_n, g_sv = got[k]
        assert (g_end, g_n) == (end, n), k
        assert g_sv == pytest.approx(sv, abs=1e-3), k


def test_compaction_auto_salts_hot_terms(spark, tmp_path, monkeypatch):
    """The streaming→compaction path must keep the batch builder's skew
    contract: a stopword-grade term's compacted postings split across
    salted doc-id ranges (offset block_ids, strictly increasing doc
    ranges) and queries stay rank-identical to an unsalted compaction."""
    from deces_dataprep_spark.index import builder
    from deces_dataprep_spark.sources.corpus import pages_from_documents

    monkeypatch.setattr(builder, "AUTO_SALT_MIN_DOCS", 1)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pages = pages_from_documents(docs)
    src = str(tmp_path / "in")
    pages.repartition(3).write.mode("overwrite").parquet(src)

    wh_a = str(tmp_path / "wh_a")
    wh_b = str(tmp_path / "wh_b")
    for wh in (wh_a, wh_b):
        q = incremental_index(
            spark, stream_pages(spark, src, max_files_per_trigger=1), wh,
            n_shards=2, available_now=True)
        q.awaitTermination(300)
    t_salted = compact_deltas(spark, wh_a, n_shards=2)
    t_plain = compact_deltas(spark, wh_b, n_shards=2, auto_salt=False)
    t_salted.postings = t_salted.postings.cache()

    hot = "the"
    n_s = t_salted.postings.filter(F.col("term") == hot).count()
    n_p = t_plain.postings.filter(F.col("term") == hot).count()
    assert n_s > n_p, "hot term must split under auto-salt"
    rows = (t_salted.postings.filter(F.col("term") == hot)
            .orderBy("shard", "block_id").collect())
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for rs in by_shard.values():
        for a, b in zip(rs, rs[1:]):
            assert a["block_id"] < b["block_id"]
            assert a["last_doc"] < b["first_doc"]
    e_s, e_p = QueryEngine(t_salted, spark=spark), \
        QueryEngine(t_plain, spark=spark)
    for q_ in ("the", "merge sort table"):
        assert e_s.search(q_, k=10) == pytest.approx(e_p.search(q_, k=10))


def test_wand_refused_on_uncompacted_delta_index(spark, streamed_wh):
    """Delta block_max bounds are batch-local → WAND skipping is unsound
    until compaction. The engine must refuse explicit WAND and keep
    'auto' on exact paths (load_delta_index sets trusted_bounds=False)."""
    tables = load_delta_index(spark, streamed_wh)
    assert tables.trusted_bounds is False
    eng = QueryEngine(tables)
    with pytest.raises(ValueError, match="compact_deltas"):
        eng.search("spark merge sort table", k=10, method="wand")
    # 'auto' silently takes the exact TAAT route instead of raising
    assert eng.search("spark merge sort table", k=10, method="auto")
