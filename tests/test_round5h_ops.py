"""Round-5 batch h: top_metrics agg leaf + exact-substring (duplicate
n-gram span) detection — DuckDB-oracled."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index import aggs
from deces_dataprep_spark.operators import dedup


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


def test_top_metric_matches_duckdb(spark, documents, con):
    """top_metrics: per lang bucket, n_chars of the doc with the
    largest doc_id (recency proxy) — one combinable struct max."""
    buckets = [aggs.terms_bucket("lang")]
    metrics = [aggs.metric("count"),
               aggs.metric("top_metric", "n_chars",
                           weight_field="doc_id")]
    got = aggs.nested_agg_df(spark, documents, "table", buckets,
                             metrics).toPandas()
    want = con.sql(aggs.duckdb_nested_agg_sql(
        "table", buckets, metrics)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert "top_n_chars" in got.columns


def test_top_metric_needs_sort_field():
    with pytest.raises(ValueError):
        aggs.metric("top_metric", "n_chars")


@pytest.fixture(scope="module")
def dup_docs(spark, documents):
    dups = documents.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000))
    return documents.unionByName(dups)


DUP_SQL = ("(SELECT * FROM documents UNION ALL "
           "SELECT doc_id + 1000000 AS doc_id, text, lang, source, "
           "n_chars FROM documents WHERE doc_id % 10 = 0)")


def test_duplicate_ngram_spans_matches_duckdb(spark, dup_docs, con):
    got = dedup.duplicate_ngram_spans(dup_docs, n=10).toPandas()
    want = con.sql(dedup.duckdb_duplicate_ngram_spans_sql(
        n=10, table=DUP_SQL)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every copied doc is fully duplicated: dup_ratio == 1.0 for both
    # the original (doc_id%10==0) and its copy
    full = got[got.doc_id % 10 == 0]
    assert len(full) > 0 and (full["dup_ratio"] == 1.0).all()


def test_duplicate_ngram_spans_finds_planted_near_dups(spark,
                                                       documents):
    """The testdata generator plants near-duplicate docs (8 and 12
    share a long span at sf0.001) — the detector finds exactly the
    planted pairs at n=50 and nothing else in the head of the corpus,
    and a singleton corpus carries no signal at all."""
    out = dedup.duplicate_ngram_spans(documents.limit(50),
                                      n=50).toPandas()
    flagged = set(out[out.n_dup_spans > 0]["doc_id"])
    assert flagged == {8, 12}
    solo = dedup.duplicate_ngram_spans(documents.limit(1), n=5)
    assert solo.agg(F.sum("n_dup_spans")).collect()[0][0] == 0


# ---------------------------------------------------------------------------
# rare_terms
# ---------------------------------------------------------------------------


def test_rare_terms_text_matches_duckdb(spark, documents, con):
    from deces_dataprep_spark.index.query import (
        duckdb_rare_terms_sql,
        rare_terms_df,
    )

    got = rare_terms_df(spark, documents, max_doc_count=30).toPandas()
    want = con.sql(duckdb_rare_terms_sql(max_doc_count=30)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) >= 1  # the corpus's one genuinely rare term


def test_rare_terms_keyword_field(spark, documents, con):
    """ES's usual shape: rare_terms on a keyword field — hosts seen
    only once."""
    from deces_dataprep_spark.index.query import (
        duckdb_rare_terms_sql,
        rare_terms_df,
    )

    d = documents.withColumn(
        "host", F.concat(F.lit("host-"),
                         F.pmod(F.col("doc_id"), F.lit(257))
                         .cast("string")))
    got = rare_terms_df(spark, d, max_doc_count=1,
                        tokens=F.array("host")).toPandas()
    want = con.sql(duckdb_rare_terms_sql(
        max_doc_count=1,
        tokens_sql="['host-' || (doc_id % 257)::VARCHAR]")).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["doc_count"] == 1).all() and len(got) > 0


def test_rare_terms_index_route_identical(spark, documents):
    from deces_dataprep_spark.index.builder import build_index
    from deces_dataprep_spark.index.query import (
        rare_terms_df,
        rare_terms_from_index,
    )

    tables = build_index(spark, documents, n_shards=2)
    scan = rare_terms_df(spark, documents, max_doc_count=30).collect()
    idx = rare_terms_from_index(tables, max_doc_count=30).collect()
    assert [(r["term"], r["doc_count"]) for r in scan] \
        == [(r["term"], r["doc_count"]) for r in idx]


# ---------------------------------------------------------------------------
# terms lookup
# ---------------------------------------------------------------------------


def test_terms_lookup_matches_duckdb(spark, documents, con):
    """ES terms-lookup: the allowed set comes from another document —
    here the array of sources collected from docs 0-2."""
    from deces_dataprep_spark.operators.es_fields import (
        terms_lookup_match)

    lookup = documents.filter(F.col("doc_id") < 3).agg(
        F.collect_set("source").alias("allowed"))
    got = sorted(r["doc_id"] for r in terms_lookup_match(
        documents, "source", lookup, "allowed",
        normalize=False).select("doc_id").collect())
    want = sorted(d for (d,) in con.execute(
        "SELECT doc_id FROM documents WHERE source IN "
        "(SELECT DISTINCT source FROM documents WHERE doc_id < 3)"
    ).fetchall())
    assert got == want and 0 < len(got) < documents.count()


def test_terms_lookup_is_broadcast_semi_join(spark, documents):
    from deces_dataprep_spark.operators.es_fields import (
        terms_lookup_match)

    lookup = documents.filter(F.col("doc_id") < 3).agg(
        F.collect_set("source").alias("allowed"))
    out = terms_lookup_match(documents, "source", lookup, "allowed",
                             normalize=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan


def test_terms_lookup_missing_column(spark, documents):
    from deces_dataprep_spark.operators.es_fields import (
        terms_lookup_match)

    with pytest.raises(ValueError):
        terms_lookup_match(documents, "source",
                           documents.select("lang"), "nope")
