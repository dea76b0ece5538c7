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
