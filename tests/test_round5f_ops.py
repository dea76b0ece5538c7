"""Round-5 batch f: diversified_sampler, auto_date_histogram, and the
extended-stats metric kinds (var_pop / stddev_pop) — DuckDB-oracled."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index import aggs
from deces_dataprep_spark.index.query import (
    diversified_sampler_agg_df,
    duckdb_diversified_sampler_sql,
    sampler_agg_df,
)

QUERY = "spark merge sort table"


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


def test_diversified_sampler_matches_duckdb(spark, documents, con):
    got = diversified_sampler_agg_df(
        spark, documents, QUERY, "lang", "source",
        shard_size=40, max_docs_per_value=2).toPandas()
    want = con.sql(duckdb_diversified_sampler_sql(
        QUERY, "lang", "source",
        shard_size=40, max_docs_per_value=2)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_diversified_sampler_caps_per_value(spark, documents):
    """With max_docs_per_value=1 the sample holds at most one doc per
    source — so its size is bounded by the source cardinality, and it
    diverges from the undiversified sampler on a skewed corpus."""
    n_sources = documents.select("source").distinct().count()
    div = diversified_sampler_agg_df(
        spark, documents, QUERY, "lang", "source",
        shard_size=40, max_docs_per_value=1)
    total = div.agg(F.sum("n_docs")).collect()[0][0]
    assert total <= min(40, n_sources)
    plain = sampler_agg_df(spark, documents, QUERY, "lang",
                           shard_size=40)
    assert plain.agg(F.sum("n_docs")).collect()[0][0] > total


def test_auto_date_histogram_picks_finest_fitting(spark, documents,
                                                  con):
    dated = documents.withColumn(
        "crawl_date",
        F.date_add(F.lit("2024-01-01").cast("date"),
                   F.pmod(F.col("doc_id"), F.lit(90)).cast("int")))
    expr = "DATE '2024-01-01' + (doc_id % 90)::INT"
    # 90 day-grained dates: day/week rungs overflow 10 → month (4 buckets)
    got = aggs.auto_date_histogram_df(
        spark, dated, "table", "crawl_date", target_buckets=10).toPandas()
    want = con.sql(aggs.duckdb_auto_date_histogram_sql(
        "table", expr, target_buckets=10)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["interval_unit"]) == {"month"}
    assert len(got) <= 10
    # a roomier target takes the finest rung that fits
    wide = aggs.auto_date_histogram_df(
        spark, dated, "table", "crawl_date",
        target_buckets=1000).toPandas()
    wide_want = con.sql(aggs.duckdb_auto_date_histogram_sql(
        "table", expr, target_buckets=1000)).df()
    pd.testing.assert_frame_equal(wide, wide_want, check_dtype=False)
    assert set(wide["interval_unit"]) == {"minute"}


def test_extended_stats_metrics(spark, documents, con):
    buckets = [aggs.terms_bucket("lang")]
    metrics = [aggs.metric("count"),
               aggs.metric("var_pop", "n_chars"),
               aggs.metric("stddev_pop", "n_chars")]
    got = aggs.nested_agg_df(spark, documents, "table", buckets,
                             metrics).toPandas()
    want = con.sql(aggs.duckdb_nested_agg_sql(
        "table", buckets, metrics)).df()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  atol=1e-6)
    import numpy as np

    assert np.allclose(got["stddev_pop_n_chars"] ** 2,
                       got["var_pop_n_chars"], rtol=1e-4)
