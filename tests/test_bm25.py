"""BM25 math: scalar vs numpy vs native-Column vs DuckDB fragment."""

import math

import duckdb
import numpy as np
import pytest

from deces_dataprep_spark.index.bm25 import (
    bm25_score,
    bm25_score_col,
    duckdb_bm25_sql,
    idf,
    upper_bound,
)


def test_idf_known_value():
    # N=100, df=10 → ln(1 + 90.5/10.5)
    assert idf(10, 100) == pytest.approx(math.log(1 + 90.5 / 10.5))


def test_score_monotonic_in_tf():
    s1 = bm25_score(1, 10, 50, 1000, 40.0)
    s2 = bm25_score(5, 10, 50, 1000, 40.0)
    s3 = bm25_score(50, 10, 50, 1000, 40.0)
    assert s1 < s2 < s3 < upper_bound(10, 1000)


def test_numpy_matches_scalar():
    tf = np.array([1.0, 3.0, 7.0])
    out = bm25_score(tf, 10, 50, 1000, 40.0)
    for i, t in enumerate([1, 3, 7]):
        assert out[i] == pytest.approx(bm25_score(t, 10, 50, 1000, 40.0), abs=1e-12)


def test_duckdb_fragment_matches_python():
    frag = duckdb_bm25_sql("3.0", "10.0", "50.0", "1000.0", "40.0")
    val = duckdb.sql(f"select {frag}").fetchone()[0]
    assert val == pytest.approx(bm25_score(3, 10, 50, 1000, 40.0), abs=1e-12)


def test_column_matches_python(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(3, 10, 50)], ["tf", "df", "dl"])
    val = df.select(
        bm25_score_col(F.col("tf"), F.col("df"), F.col("dl"), 1000, 40.0).alias("s")
    ).collect()[0].s
    assert val == pytest.approx(bm25_score(3, 10, 50, 1000, 40.0), abs=1e-12)
