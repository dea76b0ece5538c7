"""Round-3 operators: ES multi_match (per-field boosts), range queries,
and index-served more-like-this — each route rank-identical to its scan
twin and (where applicable) to the DuckDB oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.index.builder import build_index
from deces_dataprep_spark.index.query import (
    QueryEngine,
    duckdb_multi_match_sql,
    multi_match_from_index,
    multi_match_topk_df,
)


@pytest.fixture(scope="module")
def fielded_docs(spark, documents):
    # synthesize a second analyzed field (ES multi-field model:
    # deces_index.yml declares PRENOMS_NOM / NOM / PRENOM over one doc)
    return documents.select(
        "doc_id", "text", F.substring("text", 1, 80).alias("title"))


def test_multi_match_scan_matches_duckdb(spark, sf_dir, fielded_docs):
    q = "merge sort table"
    fields = {"text": 1.0, "title": 3.0}
    got = [(r["doc_id"], r["score"]) for r in multi_match_topk_df(
        spark, fielded_docs, q, fields, k=10).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    sql = duckdb_multi_match_sql(
        q, {"text": 1.0, "substr(text, 1, 80)": 3.0}, k=10)
    want = [(int(d), float(s)) for d, s in con.execute(sql).fetchall()]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, a), (_, b) in zip(got, want):
        assert a == pytest.approx(b, abs=2e-6)


def test_multi_match_index_route_rank_identical(spark, fielded_docs):
    q = "merge sort table"
    t_text = build_index(spark, fielded_docs, n_shards=2, text_col="text")
    t_title = build_index(spark, fielded_docs, n_shards=2, text_col="title")
    scan = [(r["doc_id"], r["score"]) for r in multi_match_topk_df(
        spark, fielded_docs, q, {"text": 1.0, "title": 3.0}, k=10).collect()]
    idx = [(r["doc_id"], r["score"]) for r in multi_match_from_index(
        spark, {"text": (t_text, 1.0), "title": (t_title, 3.0)},
        q, k=10).collect()]
    assert [d for d, _ in scan] == [d for d, _ in idx]
    for (_, a), (_, b) in zip(scan, idx):
        assert a == pytest.approx(b, abs=1e-9)
    # boosts are load-bearing: title-boosted ranking must differ from
    # text-only BM25 for a query hitting title prefixes
    from deces_dataprep_spark.index.query import bm25_topk_df
    plain = [r["doc_id"] for r in bm25_topk_df(
        spark, fielded_docs, q, 10).collect()]
    assert [d for d, _ in scan] != plain


def test_multi_match_empty_query_and_no_fields(spark, fielded_docs):
    assert multi_match_topk_df(spark, fielded_docs, "", {"text": 1.0}) \
        .count() == 0
    assert multi_match_topk_df(spark, fielded_docs, "merge", {}).count() == 0


def test_mlt_from_index_rank_identical(spark, documents):
    """mlt_topk_from_index (dictionary-driven term selection + postings
    ranking) must pick the same term set and ranking as the corpus-scan
    mlt_topk_df."""
    from deces_dataprep_spark.index.query import (
        mlt_topk_df,
        mlt_topk_from_index,
    )

    tables = build_index(spark, documents, n_shards=2)
    for src in (1, 42, 137):
        text = documents.filter(F.col("doc_id") == src) \
            .collect()[0]["text"]
        want = [(r["doc_id"], r["score"]) for r in
                mlt_topk_df(spark, documents, src, k=10).collect()]
        got = [(r["doc_id"], r["score"]) for r in
               mlt_topk_from_index(spark, tables, src, text, k=10).collect()]
        assert [d for d, _ in got] == [d for d, _ in want], src
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=2e-6)


def test_range_filter_and_date_range(spark, sf_dir):
    """ES range parity: bounds AND-combine; DuckDB agrees on events.ts
    and documents.n_chars windows."""
    from deces_dataprep_spark.operators.es_fields import (
        date_range,
        range_filter,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(r["doc_id"] for r in range_filter(
        docs, "n_chars", gte=500, lt=900).select("doc_id").collect())
    con = duckdb.connect()
    want = [int(x[0]) for x in con.execute(
        f"SELECT doc_id FROM '{sf_dir}/documents.parquet' "
        "WHERE n_chars >= 500 AND n_chars < 900 ORDER BY doc_id"
    ).fetchall()]
    assert got == want and got
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    lo, hi = "2024-01-02 00:00:00", "2024-01-03 00:00:00"
    got_e = range_filter(ev, "ts", gte=lo, lt=hi).count()
    want_e = con.execute(
        f"SELECT count(*) FROM '{sf_dir}/events.parquet' "
        f"WHERE ts >= TIMESTAMP '{lo}' AND ts < TIMESTAMP '{hi}'"
    ).fetchone()[0]
    assert got_e == want_e and got_e > 0
    # packed yyyyMMdd strings (reference DATE_*_NORM shape): bad rows drop
    d = spark.createDataFrame(
        [(1, "20240101"), (2, "20240315"), (3, "00000000"), (4, "20241231")],
        "id long, dt string")
    kept = sorted(r["id"] for r in date_range(
        d, "dt", gte="20240201", lte="20241231").collect())
    assert kept == [2, 4]


def test_bool_filter_context_matches_duckdb(spark, sf_dir, documents):
    """ES bool.filter (filter context): range predicate restricts the
    result set post-scoring, scores unchanged (df/avgdl corpus-wide)."""
    from deces_dataprep_spark.index.query import (
        boolean_topk_df,
        duckdb_boolean_topk_sql,
    )

    got = [(r["doc_id"], r["score"]) for r in boolean_topk_df(
        spark, documents, ["table"], ["merge sort"], k=10,
        filters=[F.col("n_chars") >= 300, F.col("n_chars") < 900],
    ).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    want = [(int(d), float(s)) for d, s in con.execute(
        duckdb_boolean_topk_sql(
            ["table"], ["merge sort"], k=10,
            filter_where="n_chars >= 300 AND n_chars < 900")
    ).fetchall()]
    assert got == [(d, pytest.approx(s, abs=2e-6)) for d, s in want]
    assert got
    # unfiltered run must score identically for surviving docs
    base = {r["doc_id"]: r["score"] for r in boolean_topk_df(
        spark, documents, ["table"], ["merge sort"], k=500).collect()}
    for d, s in got:
        assert s == pytest.approx(base[d], abs=1e-9)


def test_multi_match_serve_route_rank_identical(spark, fielded_docs,
                                                tmp_path):
    """The driver/arrow serving route (per-field QueryEngines + shared
    dense TAAT accumulator + boosted numpy sum) must be rank-identical
    to the scan plan — including through persisted warehouses and the
    arrow (no-Spark-job) readers."""
    from deces_dataprep_spark.index.query import (
        multi_match_serve,
        multi_match_topk_df,
    )
    from deces_dataprep_spark.snapshots import load_index, write_index

    wh_t = str(tmp_path / "wh_text")
    wh_i = str(tmp_path / "wh_title")
    write_index(spark, fielded_docs.select("doc_id", "text"), wh_t,
                n_shards=2)
    write_index(
        spark,
        fielded_docs.select("doc_id", F.col("title").alias("text")),
        wh_i, n_shards=2)
    engines = {
        "text": (QueryEngine(load_index(spark, wh_t), spark=spark), 1.0),
        "title": (QueryEngine(load_index(spark, wh_i), spark=spark), 3.0),
    }
    for q in ("merge sort table", "the", "nosuchterm"):
        want = [(r["doc_id"], r["score"]) for r in multi_match_topk_df(
            spark, fielded_docs, q, {"text": 1.0, "title": 3.0},
            k=10).collect()]
        got = multi_match_serve(engines, q, k=10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, abs=2e-6)
    # repeat query exercises the postings/memo cache
    assert multi_match_serve(engines, "merge sort table", k=10) == \
        pytest.approx(multi_match_serve(engines, "merge sort table", k=10))


def test_search_after_rounded_tie_pagination(spark):
    """Review regression: docs whose raw scores differ in the last ulps
    but round equal must paginate in (rounded desc, doc_id asc) order —
    no doc served twice, none skipped, across a cursor captured from
    rounded output."""
    # exact-duplicate docs tie exactly; interleave with near docs
    rows = [(i, "alpha beta gamma") for i in range(7)] + \
           [(100 + i, f"alpha beta filler{i}") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    t = build_index(spark, docs, n_shards=1)
    eng = QueryEngine(t, spark=spark)
    pages, after, seen = [], None, []
    while True:
        page = eng.search_after("alpha beta", k=3, after=after)
        if not page:
            break
        pages.append(page)
        seen.extend(d for d, _ in page)
        after = (round(page[-1][1], 6), page[-1][0])  # rounded cursor
    full = [(d, round(s, 6)) for d, s in eng.search("alpha beta", k=50)]
    ranked = [d for d, _ in sorted(full, key=lambda t: (-t[1], t[0]))]
    assert seen == ranked  # every doc exactly once, contract order


def test_date_range_rejects_malformed_bound(spark):
    from deces_dataprep_spark.operators.es_fields import date_range

    d = spark.createDataFrame([(1, "20240101")], "id long, dt string")
    with pytest.raises(ValueError, match="does not parse"):
        date_range(d, "dt", gte="2024-01-02")


def test_bool_filter_context_index_route(spark, documents):
    """Filter context through the index route must match the scan route
    exactly (both semi-join post-scoring with corpus-wide stats)."""
    from deces_dataprep_spark.index.query import (
        boolean_topk_df,
        boolean_topk_from_index,
    )

    t = build_index(spark, documents, n_shards=2)
    conds = [F.col("n_chars") >= 300, F.col("n_chars") < 900]
    want = [(r["doc_id"], round(r["score"], 6)) for r in boolean_topk_df(
        spark, documents, ["table"], ["merge sort"], k=10,
        filters=conds).collect()]
    got = [(r["doc_id"], round(r["score"], 6)) for r in
           boolean_topk_from_index(
               spark, t, ["table"], ["merge sort"], k=10, round_digits=6,
               filter_docs=documents.select("doc_id", "n_chars"),
               filters=conds).collect()]
    assert got == want and got


def test_multi_match_serve_routes_distributed_above_threshold(
        spark, fielded_docs, monkeypatch):
    """multi_match_serve's dense per-shard accumulator is O(n_docs) on
    the driver; above DISTRIBUTED_CORPUS_THRESHOLD it must fall back to
    the rank-identical multi_match_from_index Spark plan."""
    from deces_dataprep_spark.index.query import (
        QueryEngine,
        multi_match_serve,
    )

    q = "merge sort table"
    t_text = build_index(spark, fielded_docs, n_shards=2, text_col="text")
    t_title = build_index(spark, fielded_docs, n_shards=2, text_col="title")
    engines = {"text": (QueryEngine(t_text, spark=spark), 1.0),
               "title": (QueryEngine(t_title, spark=spark), 3.0)}
    small = multi_match_serve(engines, q, k=10)

    import deces_dataprep_spark.index.wand as wand_mod

    def boom(*a, **kw):
        raise AssertionError("driver-side TAAT must not run above threshold")

    monkeypatch.setattr(QueryEngine, "DISTRIBUTED_CORPUS_THRESHOLD", 10)
    monkeypatch.setattr(wand_mod, "taat_scores", boom)
    routed = multi_match_serve(engines, q, k=10)
    assert [d for d, _ in routed] == [d for d, _ in small]
    for (_, a), (_, b) in zip(routed, small):
        assert a == pytest.approx(b, abs=1e-9)
