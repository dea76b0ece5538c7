"""Round-5 agg extensions: weighted_avg metric, multi_terms bucket,
moving_fn (unweighted avg) and serial_diff pipeline aggs — each against
its DuckDB oracle."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index import aggs


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


@pytest.fixture(scope="module")
def docs_w(spark, documents):
    return documents.withColumn(
        "w", (F.pmod(F.col("doc_id"), F.lit(7)) + F.lit(1)).cast("double")
    ).withColumn(
        "maybe_source",
        F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0, None)
        .otherwise(F.col("source")))


W_DUCK = "(doc_id % 7 + 1)"
MAYBE_SOURCE_DUCK = "CASE WHEN doc_id % 4 = 0 THEN NULL ELSE source END"


def test_weighted_avg_metric(spark, docs_w, con):
    buckets = [aggs.terms_bucket("lang")]
    metrics = [aggs.metric("count"),
               aggs.metric("weighted_avg", "n_chars", weight_field="w",
                           weight_duck_expr=W_DUCK)]
    got = aggs.nested_agg_df(spark, docs_w, "table", buckets,
                             metrics).toPandas()
    want = con.sql(aggs.duckdb_nested_agg_sql(
        "table", buckets, metrics)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "wavg_n_chars" in got.columns


def test_weighted_avg_requires_weight():
    with pytest.raises(ValueError):
        aggs.metric("weighted_avg", "n_chars")


def test_multi_terms_bucket(spark, docs_w, con):
    """Tuple-keyed buckets; docs with a null component drop out (ES
    multi_terms semantics)."""
    buckets = [aggs.multi_terms_bucket(
        ["lang", "maybe_source"],
        duck_exprs=["lang", MAYBE_SOURCE_DUCK])]
    metrics = [aggs.metric("count"), aggs.metric("avg", "n_chars")]
    got = aggs.nested_agg_df(spark, docs_w, "table", buckets,
                             metrics).toPandas()
    want = con.sql(aggs.duckdb_nested_agg_sql(
        "table", buckets, metrics)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got.columns[0] == "lang_maybe_source"
    assert all("|" in k for k in got["lang_maybe_source"])
    # the null quarter dropped: count < full doc count matching 'table'
    full = aggs.nested_agg_df(
        spark, docs_w, "table", [aggs.terms_bucket("lang")],
        [aggs.metric("count")]).agg(F.sum("n_docs")).collect()[0][0]
    assert got["n_docs"].sum() < full


def test_multi_terms_needs_two_fields():
    with pytest.raises(ValueError):
        aggs.multi_terms_bucket(["lang"])


@pytest.fixture(scope="module")
def month_buckets(spark, documents):
    dated = documents.withColumn(
        "crawl_date",
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.col("doc_id"), F.lit(90)).cast("int")))
    return aggs.nested_agg_df(
        spark, dated, "table",
        [aggs.date_histogram_bucket("crawl_date", "month", name="bucket")],
        [aggs.metric("count")])


MONTH_SQL_TMPL = """
SELECT strftime(date_trunc('month',
         (DATE '2024-01-01' + (doc_id % 90)::INT)::TIMESTAMP),
       '%Y-%m-%d') AS bucket,
       count(*)::BIGINT AS n_docs
FROM documents
WHERE {pred}
GROUP BY bucket
"""


def _month_sql(con):
    from deces_dataprep_spark.functions.analyze import duckdb_tokens_sql

    toks = duckdb_tokens_sql("text")
    return MONTH_SQL_TMPL.format(
        pred=f"list_contains({toks}, 'table')")


def test_moving_avg_and_serial_diff(spark, month_buckets, con):
    got = aggs.pipeline_over_buckets(
        month_buckets, "bucket", "n_docs",
        cumulative=False, derivative=False,
        moving_avg=2, serial_diff=1).toPandas()
    want = con.sql(aggs.duckdb_pipeline_sql(
        _month_sql(con), "bucket", "n_docs",
        cumulative=False, derivative=False,
        moving_avg=2, serial_diff=1)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # trailing-includes-current: first bucket has a value (avg of itself)
    assert not pd.isna(got["moving_avg"].iloc[0])
    # serial_diff lag-1 is NULL on the first bucket
    assert pd.isna(got["serial_diff"].iloc[0])


def test_moving_avg_shift_zero_excludes_current(spark, month_buckets,
                                                con):
    got = aggs.pipeline_over_buckets(
        month_buckets, "bucket", "n_docs",
        cumulative=False, derivative=False,
        moving_avg=2, moving_shift=0).toPandas()
    want = con.sql(aggs.duckdb_pipeline_sql(
        _month_sql(con), "bucket", "n_docs",
        cumulative=False, derivative=False,
        moving_avg=2, moving_shift=0)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # shift=0: window is the PREVIOUS 2 buckets — first bucket NULL
    assert pd.isna(got["moving_avg"].iloc[0])
    assert got["moving_avg"].iloc[1] == got["n_docs"].iloc[0]
