"""Positional index + phrase queries: scan path == index path, both
match hand-verifiable fixtures (ES match_phrase parity)."""

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index.positions import (
    phrase_match,
    phrase_match_from_index,
    positions_table,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps"),
        (2, "quick brown dog, the fox"),
        (3, "the quick, brown fox!"),       # punctuation folds away
        (4, "brown quick the fox"),         # words present, order wrong
        (5, "to be or not to be"),          # repeated terms
        (6, "be or not"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_phrase_match_scan(spark, corpus):
    got = {r["doc_id"] for r in phrase_match(corpus, "quick brown fox").collect()}
    assert got == {1, 3}
    got = {r["doc_id"] for r in phrase_match(corpus, "The Quick").collect()}
    assert got == {1, 3}
    got = {r["doc_id"] for r in phrase_match(corpus, "to be or not to be").collect()}
    assert got == {5}
    got = {r["doc_id"] for r in phrase_match(corpus, "be or not").collect()}
    assert got == {5, 6}
    assert phrase_match(corpus, "fox jumps quick").count() == 0


def test_phrase_match_index_equals_scan(spark, corpus, documents):
    pos = positions_table(documents, n_shards=2).cache()
    for phrase in ["merge sort", "the table", "spark", "sort merge table"]:
        want = {r["doc_id"] for r in phrase_match(documents, phrase).collect()}
        got = {r["doc_id"]
               for r in phrase_match_from_index(spark, pos, phrase).collect()}
        assert got == want, phrase
    # at least one multi-term phrase must actually hit the fixture
    assert phrase_match(documents, "merge sort").count() > 0


def test_positions_table_pushdown(spark, documents, tmp_path):
    """Filter on term reaches the parquet scan of the positions table."""
    pos = positions_table(documents, n_shards=2)
    path = str(tmp_path / "pos")
    pos.write.mode("overwrite").parquet(path)
    reloaded = spark.read.parquet(path)
    plan = (reloaded.filter(F.col("term") == "spark")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,spark)]" in plan


def test_positions_through_warehouse_lifecycle(spark, documents, tmp_path):
    """write_index(with_positions=True) -> snapshot -> load -> phrase
    queries from the persisted positional table match the scan path."""
    from deces_dataprep_spark.snapshots import load_index, write_index

    wh = str(tmp_path / "wh")
    write_index(spark, documents, wh, n_shards=2, resume=False,
                with_positions=True)
    t = load_index(spark, wh)
    assert t.positions is not None
    for phrase in ["merge sort", "the table"]:
        want = {r["doc_id"] for r in phrase_match(documents, phrase).collect()}
        got = {r["doc_id"] for r in
               phrase_match_from_index(spark, t.positions, phrase).collect()}
        assert got == want, phrase
    # positions are part of the committed snapshot manifest
    from deces_dataprep_spark.snapshots import SnapshotLog

    snap = SnapshotLog(wh).latest()
    assert "positions" in snap["tables"]
    assert snap["tables"]["positions"]["files"]
