"""Hybrid-retrieval fusion (ES 8.x retrievers): reciprocal rank fusion
and min-max linear fusion of BM25 ⊕ kNN lists — DuckDB-oracle-checked,
and the serving-tier list fuser identical to the DataFrame route."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index import fusion
from deces_dataprep_spark.index.query import (
    bm25_topk_df,
    duckdb_bm25_topk_sql,
)
from deces_dataprep_spark.operators.similarity import brute_force_topk

QUERY = "spark merge sort table"
WINDOW = 30


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def query_vec(embeddings):
    return list(embeddings.filter(F.col("vec_id") == 0)
                .collect()[0]["embedding"])


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
              f"'{sf_dir}/embeddings.parquet'")
    return c


def _oracle_retrievers(k):
    bm = duckdb_bm25_topk_sql(QUERY, k=k)
    ann = fusion.duckdb_cosine_topk_sql(
        "(SELECT embedding FROM embeddings WHERE vec_id = 0)", k=k)
    return bm, ann


def test_rrf_matches_duckdb(spark, documents, embeddings, query_vec, con):
    got = [(r["doc_id"], r["score"]) for r in fusion.hybrid_rrf_topk_df(
        spark, documents, embeddings, QUERY, query_vec,
        k=15, window_size=WINDOW).collect()]
    bm, ann = _oracle_retrievers(WINDOW)
    want = [(int(d), float(s)) for d, s in con.execute(
        fusion.duckdb_rrf_sql([bm, ann], k=15)).fetchall()]
    assert got == [(d, pytest.approx(s, abs=1e-9)) for d, s in want]
    # both retrievers contribute: the fused head isn't either list alone
    bm_ids = [d for d, _ in con.execute(bm).fetchall()]
    assert [d for d, _ in got] != bm_ids[:15]


def test_rrf_score_bounds(spark, documents, embeddings, query_vec):
    rows = fusion.hybrid_rrf_topk_df(
        spark, documents, embeddings, QUERY, query_vec,
        k=15, window_size=WINDOW).collect()
    hi = 2.0 / (fusion.DEFAULT_RANK_CONSTANT + 1)
    lo = 1.0 / (fusion.DEFAULT_RANK_CONSTANT + WINDOW)
    for r in rows:
        assert lo - 1e-9 <= r["score"] <= hi + 1e-9


def test_rrf_serve_lists_identical(spark, documents, embeddings,
                                   query_vec):
    df_route = [(r["doc_id"], r["score"]) for r in fusion.hybrid_rrf_topk_df(
        spark, documents, embeddings, QUERY, query_vec,
        k=15, window_size=WINDOW).collect()]
    bm = [(r["doc_id"], r["score"]) for r in bm25_topk_df(
        spark, documents, QUERY, k=WINDOW).collect()]
    ann = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(
        embeddings, query_vec, k=WINDOW).collect()]
    # shuffled input order — the serve fuser must re-sort
    served = fusion.rrf_fuse_lists([bm[::-1], ann[::-1]], k=15,
                                   window_size=WINDOW)
    assert [d for d, _ in served] == [d for d, _ in df_route]
    for (_, a), (_, b) in zip(served, df_route):
        assert a == pytest.approx(b, abs=1e-9)


def test_linear_matches_duckdb(spark, documents, embeddings, query_vec,
                               con):
    got = [(r["doc_id"], r["score"]) for r in fusion.hybrid_linear_topk_df(
        spark, documents, embeddings, QUERY, query_vec,
        weights=(1.0, 2.0), k=15, window_size=WINDOW).collect()]
    bm, ann = _oracle_retrievers(WINDOW)
    want = [(int(d), float(s)) for d, s in con.execute(
        fusion.duckdb_linear_sql([(bm, 1.0), (ann, 2.0)],
                                 k=15)).fetchall()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_linear_degenerate_window_normalizes_to_one(spark):
    # all-equal scores in one retriever → every doc normalizes to 1.0
    one = spark.createDataFrame(
        [(i, 5.0) for i in range(4)], "id long, s double")
    out = {r["doc_id"]: r["score"] for r in fusion.linear_fuse_df(
        [(one, "id", "s", 1.0)], k=10, window_size=10).collect()}
    assert out == {0: 1.0, 1: 1.0, 2: 1.0, 3: 1.0}


def test_fusers_reject_empty_frame_list():
    with pytest.raises(ValueError):
        fusion.rrf_fuse_df([], k=5)
    with pytest.raises(ValueError):
        fusion.linear_fuse_df([], k=5)


# ---------------------------------------------------------------------------
# serving tier: AnnServer + full hybrid serve
# ---------------------------------------------------------------------------


def test_ann_server_identity_with_df_route(spark, embeddings, query_vec,
                                           sf_dir):
    from deces_dataprep_spark.operators.similarity import AnnServer

    srv = AnnServer(f"{sf_dir}/embeddings.parquet")
    got = srv.topk(query_vec, k=20)
    want = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(
        embeddings, query_vec, k=20).collect()]
    assert [i for i, _ in got] == [i for i, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=1e-9)


def test_ann_server_knn_filter(spark, embeddings, query_vec, sf_dir):
    """ES knn.filter semantics: the allowed set restricts candidates
    DURING search — k hits still come back, all from the filter."""
    from deces_dataprep_spark.operators.similarity import AnnServer

    srv = AnnServer(f"{sf_dir}/embeddings.parquet")
    allowed = [i for i in range(500) if i % 3 == 0]
    got = srv.topk(query_vec, k=15, filter_ids=allowed)
    assert len(got) == 15 and all(i % 3 == 0 for i, _ in got)
    want = [(r["vec_id"], r["cosine"]) for r in brute_force_topk(
        embeddings.filter(F.col("vec_id") % 3 == 0), query_vec,
        k=15).collect()]
    assert [i for i, _ in got] == [i for i, _ in want]
    ex = srv.topk(query_vec, k=5, exclude_id=0)
    assert all(i != 0 for i, _ in ex)


def test_hybrid_rrf_serve_identity(spark, documents, embeddings,
                                   query_vec, sf_dir):
    from deces_dataprep_spark.index.builder import build_index
    from deces_dataprep_spark.index.fusion import hybrid_rrf_serve
    from deces_dataprep_spark.index.query import QueryEngine
    from deces_dataprep_spark.operators.similarity import AnnServer

    tables = build_index(spark, documents, n_shards=2)
    served = hybrid_rrf_serve(
        QueryEngine(tables), AnnServer(f"{sf_dir}/embeddings.parquet"),
        QUERY, query_vec, k=15, window_size=WINDOW)
    df_route = [(r["doc_id"], r["score"]) for r in fusion.hybrid_rrf_topk_df(
        spark, documents, embeddings, QUERY, query_vec,
        k=15, window_size=WINDOW).collect()]
    assert [d for d, _ in served] == [d for d, _ in df_route]
    for (_, a), (_, b) in zip(served, df_route):
        assert a == pytest.approx(b, abs=1e-9)
