"""ES nested field type + nested query: conditions must co-occur on the
SAME child object (the property object-flattening loses) — DuckDB-
oracled over a deterministically synthesized array<struct> column."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.operators import es_fields

CONDS = [("stars", "gte", 3), ("author_id", "eq", 2)]
COMMENTS_DUCK = ("[{'stars': (doc_id*7 + j) % 6, "
                 "'author_id': (doc_id + j) % 5} "
                 "for j in range(1, (doc_id % 4) + 1)]")


def _with_comments(documents):
    did = F.col("doc_id")
    n = F.pmod(did, F.lit(4)).cast("int")
    seq = F.when(n > 0, F.sequence(F.lit(1), n)) \
           .otherwise(F.array().cast("array<int>"))
    comments = F.transform(seq, lambda j: F.struct(
        F.pmod(did * 7 + j, F.lit(6)).alias("stars"),
        F.pmod(did + j, F.lit(5)).alias("author_id")))
    return documents.withColumn("comments", comments)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


def test_nested_query_matches_duckdb(spark, documents, con):
    got = es_fields.nested_query_df(
        _with_comments(documents), "comments", CONDS,
        score_field="stars", score_mode="max").toPandas()
    want = con.sql(es_fields.duckdb_nested_sql(
        "comments", CONDS, comments_expr=COMMENTS_DUCK,
        score_field="stars", score_mode="max")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


@pytest.mark.parametrize("mode", ["sum", "min", "avg"])
def test_nested_score_modes(spark, documents, con, mode):
    got = es_fields.nested_query_df(
        _with_comments(documents), "comments", [("stars", "gte", 2)],
        score_field="stars", score_mode=mode).toPandas()
    want = con.sql(es_fields.duckdb_nested_sql(
        "comments", [("stars", "gte", 2)], comments_expr=COMMENTS_DUCK,
        score_field="stars", score_mode=mode)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_nested_same_child_cooccurrence(spark, documents):
    """The defining nested-vs-flattened property: a doc whose children
    are {stars 4, author 1} and {stars 1, author 2} matches a flattened
    (stars>=4 AND author=2) but NOT the nested query."""
    rows = [(1, [(4, 1), (1, 2)]), (2, [(4, 2)])]
    df = spark.createDataFrame(
        rows, "doc_id long, comments array<struct<stars:long,"
              "author_id:long>>")
    nested = es_fields.nested_query_df(
        df, "comments", [("stars", "gte", 4), ("author_id", "eq", 2)])
    assert [r["doc_id"] for r in nested.collect()] == [2]
    # flattened-style per-field exists over the same docs matches BOTH
    flat = df.filter(
        es_fields.nested_pred("comments", [("stars", "gte", 4)])
        & es_fields.nested_pred("comments", [("author_id", "eq", 2)]))
    assert sorted(r["doc_id"] for r in flat.collect()) == [1, 2]


def test_nested_validation(spark, documents):
    d = _with_comments(documents)
    with pytest.raises(ValueError):
        es_fields.nested_query_df(d, "comments",
                                  [("stars", "like", 3)]).collect()
    with pytest.raises(ValueError):
        es_fields.nested_query_df(d, "comments", CONDS,
                                  score_field="stars",
                                  score_mode="median").collect()
    with pytest.raises(ValueError):
        es_fields.nested_query_df(d, "comments", CONDS,
                                  score_mode="sum").collect()


# ---------------------------------------------------------------------------
# span queries
# ---------------------------------------------------------------------------


def test_span_first_matches_duckdb(spark, documents, con):
    from deces_dataprep_spark.index.positions import (
        duckdb_span_first_sql,
        span_first_match,
    )

    got = sorted(r["doc_id"] for r in span_first_match(
        documents, "data", end=10).collect())
    want = sorted(d for (d,) in con.execute(
        duckdb_span_first_sql("data", end=10)).fetchall())
    assert got == want and 0 < len(got)
    # tighter boundary is a subset
    tight = {r["doc_id"] for r in span_first_match(
        documents, "data", end=3).collect()}
    assert tight <= set(got) and len(tight) < len(got)


def test_span_near_ordered_matches_duckdb(spark, documents, con):
    from deces_dataprep_spark.index.positions import (
        duckdb_span_near_sql,
        span_near_match,
    )

    got = sorted(r["doc_id"] for r in span_near_match(
        documents, ["data", "table"], slop=4).collect())
    want = sorted(d for (d,) in con.execute(
        duckdb_span_near_sql(["data", "table"], slop=4)).fetchall())
    assert got == want and len(got) > 0


def test_span_near_unordered(spark, documents, con):
    from deces_dataprep_spark.index.positions import (
        duckdb_span_near_sql,
        span_near_match,
    )

    got = sorted(r["doc_id"] for r in span_near_match(
        documents, ["data", "table"], slop=4,
        in_order=False).collect())
    want = sorted(d for (d,) in con.execute(
        duckdb_span_near_sql(["data", "table"], slop=4,
                             in_order=False)).fetchall())
    assert got == want
    # unordered ⊇ ordered, and strictly more on a corpus with both
    # orders present
    ordered = sorted(r["doc_id"] for r in span_near_match(
        documents, ["data", "table"], slop=4).collect())
    assert set(ordered) <= set(got) and len(got) > len(ordered)


def test_span_validation(spark, documents):
    from deces_dataprep_spark.index.positions import (
        span_first_match,
        span_near_match,
    )

    with pytest.raises(ValueError):
        span_first_match(documents, "two words", end=5)
    with pytest.raises(ValueError):
        span_near_match(documents, ["one"], slop=1)
    with pytest.raises(ValueError):
        span_near_match(documents, ["a", "b", "c"], slop=1,
                        in_order=False)
