"""Analyzer-chain parity tests: pandas path vs native path vs DuckDB."""

import duckdb
import pandas as pd
import pytest

from deces_dataprep_spark.functions.analyze import (
    duckdb_tokens_sql,
    normalize_series,
    tokenize_series,
)

CASES = [
    ("Hello, World!", ["hello", "world"]),
    ("café DÉCÈS Ångström", ["cafe", "deces", "angstrom"]),
    ("foo_bar baz-qux", ["foo", "bar", "baz", "qux"]),
    ("  a  b ", ["a", "b"]),
    ("42abc 7", ["42abc", "7"]),
    ("", []),
    ("!!!", []),
    ("L'Haÿ-les-Roses", ["l", "hay", "les", "roses"]),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_tokenize_pandas(raw, expected):
    out = tokenize_series(pd.Series([raw])).iloc[0]
    assert out == expected


def test_normalize_keyword():
    s = pd.Series(["  PARIS (9ème)  ", "DÉCÈS", None])
    out = normalize_series(s)
    assert out.iloc[0] == "paris 9eme"
    assert out.iloc[1] == "deces"
    assert pd.isna(out.iloc[2])


def test_duckdb_tokenizer_matches_pandas_on_ascii():
    texts = [
        "the fast key order sort table scan merge",
        "Hello, World! 42 foo-bar",
        "a  b   c",
    ]
    frag = duckdb_tokens_sql("t")
    for txt in texts:
        ddb = duckdb.sql(
            f"select {frag} from (select ? as t)", params=[txt]
        ).fetchone()[0]
        assert ddb == tokenize_series(pd.Series([txt])).iloc[0]


def test_native_tokens_col_matches_pandas(spark):
    from pyspark.sql import functions as F

    from deces_dataprep_spark.functions.analyze import tokenize_udf, tokens_col

    texts = [
        "the fast key order sort table scan merge",
        "Hello, World! 42 foo-bar",
        "",
        "  padded   runs  of spaces ",
        "punct!!! only??? words...",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(
        tokens_col("text").alias("native"), tokenize_udf("text").alias("pandas")
    ).collect()
    for r in rows:
        assert r.native == r.pandas


def test_edge_ngrams(spark):
    from deces_dataprep_spark.functions.analyze import edge_ngrams_col, prefixes_col

    df = spark.createDataFrame([("spark",), ("ab",), ("a",), ("19800312",)], ["t"])
    out = {r.t: r.g for r in df.select("t", edge_ngrams_col("t").alias("g")).collect()}
    assert out["spark"] == ["sp", "spa", "spar", "spark"]
    assert out["ab"] == ["ab"]
    assert out["a"] == []
    pfx = {r.t: r.g for r in df.select("t", prefixes_col("t").alias("g")).collect()}
    assert pfx["19800312"] == ["1980", "19800", "198003"]
