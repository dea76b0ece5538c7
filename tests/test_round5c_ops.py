"""Round-5c: geotile_grid aggregation (web-mercator tile math, pole +
antimeridian clamps) and the ES _explain API (per-term BM25 breakdown;
scan = oracle = engine serve; total = search score)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index import aggs
from deces_dataprep_spark.index.builder import build_index
from deces_dataprep_spark.index.query import (
    QueryEngine,
    bm25_topk_df,
    duckdb_explain_score_sql,
    explain_score_df,
    explain_score_serve,
)

LAT = "(doc_id % 160)::DOUBLE - 80.0 + 0.5"
LON = "((doc_id * 7) % 360)::DOUBLE - 180.0 + 0.25"


@pytest.fixture(scope="module")
def geo_docs(spark, documents):
    return documents.withColumn(
        "lat", (F.col("doc_id") % 160).cast("double") - 80.0 + 0.5
    ).withColumn(
        "lon", ((F.col("doc_id") * 7) % 360).cast("double") - 180.0 + 0.25)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


def test_geotile_grid_matches_duckdb(spark, geo_docs, con):
    import pandas as pd

    for z in (2, 4, 7):
        got = aggs.geotile_grid_agg_df(spark, geo_docs, "table", "lat",
                                       "lon", precision=z, k=20).toPandas()
        want = con.sql(aggs.duckdb_geotile_grid_sql(
            "table", LAT, LON, precision=z, k=20)).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        assert len(got) > 0
        assert all(k.startswith(f"{z}/") for k in got["key"])


def test_geotile_grid_pole_and_antimeridian_clamps(spark, con):
    """lat beyond the mercator domain clamps to the edge tile; lon=180
    clamps to the last column — both engines identically."""
    import pandas as pd

    edge = spark.createDataFrame(
        [(1, 89.9, 179.999), (2, -89.9, -180.0), (3, 85.06, 180.0),
         (4, 0.0, 0.0)],
        "doc_id long, lat double, lon double").withColumn(
        "text", F.lit("x"))
    got = aggs.geotile_grid_agg_df(spark, edge, "x", "lat", "lon",
                                   precision=2, k=10).toPandas()
    c = duckdb.connect()
    c.sql("CREATE VIEW edge AS SELECT * FROM (VALUES "
          "(1, 89.9, 179.999, 'x'), (2, -89.9, -180.0, 'x'), "
          "(3, 85.06, 180.0, 'x'), (4, 0.0, 0.0, 'x')) "
          "t(doc_id, lat, lon, text)")
    want = c.sql(aggs.duckdb_geotile_grid_sql(
        "x", "lat", "lon", precision=2, k=10, table="edge")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    xs = {k.split("/")[1] for k in got["key"]}
    ys = {k.split("/")[2] for k in got["key"]}
    assert "3" in xs and "0" in ys  # clamped corners landed in-range


def test_explain_matches_oracle_and_sums_to_score(spark, documents,
                                                  con):
    import pandas as pd

    q = "spark merge sort table"
    top = bm25_topk_df(spark, documents, q, 1, round_digits=6) \
        .collect()[0]
    did, score = int(top["doc_id"]), float(top["score"])
    got = explain_score_df(spark, documents, q, did).toPandas()
    want = con.sql(duckdb_explain_score_sql(q, did)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["contribution"].sum() == pytest.approx(score, abs=5e-6)


def test_explain_serve_identical(spark, documents):
    q = "spark merge sort table"
    did = int(bm25_topk_df(spark, documents, q, 1).collect()[0]["doc_id"])
    tables = build_index(spark, documents, n_shards=2)
    eng = QueryEngine(tables)
    srv = explain_score_serve(eng, q, did)
    scan = [tuple(r) for r in explain_score_df(
        spark, documents, q, did).collect()]
    assert [(t, tf, df, dl, round(i, 6), round(c, 6))
            for t, tf, df, dl, i, c in srv] == \
           [(t, tf, df, dl, round(i, 6), round(c, 6))
            for t, tf, df, dl, i, c in scan]


def test_explain_empty_and_missing_doc(spark, documents):
    assert explain_score_df(spark, documents, "", 1).count() == 0
    # a doc with no query terms (or absent) explains to zero rows
    assert explain_score_df(spark, documents, "zzzmissing", 1).count() == 0
