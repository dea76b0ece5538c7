"""Hybrid-retrieval fusion — ES 8.x ``retriever`` parity.

Elasticsearch composes heterogeneous retrievers (lexical BM25, dense
kNN) with two standard fusers, both implemented here over DataFrames:

* ``rrf`` — reciprocal rank fusion (the ES ``rrf`` retriever):
  ``score(d) = Σ_r 1 / (rank_constant + rank_r(d))`` over every
  retriever r whose top-``window_size`` list contains d. Rank-based,
  so scales of the underlying scores never need calibrating — the
  reason ES made it the default hybrid combiner.
* ``linear`` — weighted sum of min-max-normalized scores (the ES
  ``linear`` retriever with ``normalizer: minmax``).

Scale shape: each retriever's list is first cut to ``window_size``
with ``orderBy(...).limit(w)`` — Catalyst lowers that to
``TakeOrderedAndProject`` (per-partition heaps, no global sort).  Rank
assignment then runs a single-partition window over the ALREADY
k-bounded frame (≤ window_size rows, never corpus-sized), and the
fused combine is one combinable ``groupBy`` over ≤ Σ window rows.
Nothing here grows with the corpus — only with ``window_size``.

The deces reference serves its person-name search through
Elasticsearch (reference recipe
``projects/deces-dataprep/datasets/deces_index.yml``), where hybrid
retrievers are the standard way to blend the lexical index with a
semantic field; this module is that surface re-expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_RANK_CONSTANT = 60  # ES rrf default
DEFAULT_WINDOW = 50


def _ranked_window(df: DataFrame, id_col: str, score_col: str,
                   window_size: int) -> DataFrame:
    """(doc_id, rank) for the retriever's top-``window_size`` rows,
    ranked (score desc, id asc).  The limit comes FIRST so the
    no-partition window only ever sees a k-bounded frame."""
    bounded = df.orderBy(F.desc(score_col), F.asc(id_col)) \
                .limit(int(window_size))
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return bounded.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.row_number().over(w).alias("rank"),
        F.col(score_col).cast("double").alias("rscore"),
    )


def rrf_fuse_df(
    frames: list[tuple[DataFrame, str, str]],
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    round_digits: int | None = 6,
) -> DataFrame:
    """Reciprocal rank fusion of ``frames`` = [(df, id_col, score_col),
    ...] → (doc_id, score) top-k.  Each frame is ranked within its own
    top-``window_size`` (score desc, id asc — scores must already be
    deterministically rounded), contributions summed per doc."""
    if not frames:
        raise ValueError("rrf needs at least one retriever frame")
    c = F.lit(float(rank_constant))
    parts = [
        _ranked_window(df, idc, sc, window_size).select(
            "doc_id",
            (F.lit(1.0) / (c + F.col("rank").cast("double"))).alias("c"))
        for df, idc, sc in frames
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = u.groupBy("doc_id").agg(F.sum("c").alias("score"))
    if round_digits is not None:
        out = out.withColumn("score", F.round("score", round_digits))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))


def linear_fuse_df(
    frames: list[tuple[DataFrame, str, str, float]],
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    round_digits: int | None = 6,
) -> DataFrame:
    """ES ``linear`` retriever (``normalizer: minmax``): each frame's
    top-``window_size`` scores are min-max normalized to [0, 1] within
    the window (a degenerate window — all scores equal — normalizes to
    1.0), then weight-summed per doc; absent docs contribute 0."""
    if not frames:
        raise ValueError("linear fusion needs at least one frame")
    full = Window.rowsBetween(Window.unboundedPreceding,
                              Window.unboundedFollowing)
    parts = []
    for df, idc, sc, weight in frames:
        r = _ranked_window(df, idc, sc, window_size)
        mn, mx = F.min("rscore").over(full), F.max("rscore").over(full)
        norm = F.when(mx == mn, F.lit(1.0)) \
                .otherwise((F.col("rscore") - mn) / (mx - mn))
        parts.append(r.select(
            "doc_id", (F.lit(float(weight)) * norm).alias("c")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    out = u.groupBy("doc_id").agg(F.sum("c").alias("score"))
    if round_digits is not None:
        out = out.withColumn("score", F.round("score", round_digits))
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(int(k))


def hybrid_rrf_topk_df(
    spark: SparkSession,
    docs: DataFrame,
    vectors: DataFrame,
    query: str,
    query_vec: list[float],
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The canonical ES hybrid query: BM25 over ``docs`` ⊕ exact
    cosine kNN over ``vectors`` (ids shared), fused with RRF."""
    from deces_dataprep_spark.index.query import bm25_topk_df
    from deces_dataprep_spark.operators.similarity import brute_force_topk

    bm = bm25_topk_df(spark, docs, query, k=window_size,
                      id_col=id_col, text_col=text_col)
    ann = brute_force_topk(vectors, query_vec, k=window_size,
                           vec_col=vec_col, id_col=vec_id_col)
    return rrf_fuse_df([(bm, "doc_id", "score"), (ann, "vec_id", "cosine")],
                       k, window_size, rank_constant)


def hybrid_linear_topk_df(
    spark: SparkSession,
    docs: DataFrame,
    vectors: DataFrame,
    query: str,
    query_vec: list[float],
    weights: tuple[float, float] = (1.0, 1.0),
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BM25 ⊕ kNN fused with the weighted min-max ``linear`` combiner."""
    from deces_dataprep_spark.index.query import bm25_topk_df
    from deces_dataprep_spark.operators.similarity import brute_force_topk

    bm = bm25_topk_df(spark, docs, query, k=window_size,
                      id_col=id_col, text_col=text_col)
    ann = brute_force_topk(vectors, query_vec, k=window_size,
                           vec_col=vec_col, id_col=vec_id_col)
    return linear_fuse_df(
        [(bm, "doc_id", "score", weights[0]),
         (ann, "vec_id", "cosine", weights[1])], k, window_size)


# ---------------------------------------------------------------------------
# serving tier — fuse already-collected (id, score) lists, zero Spark jobs
# ---------------------------------------------------------------------------


def rrf_fuse_lists(
    lists: list[list[tuple[int, float]]],
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    round_digits: int | None = 6,
) -> list[tuple[int, float]]:
    """The driver/arrow serving twin of :func:`rrf_fuse_df` — fuse the
    k-bounded result lists of ``QueryEngine.search`` / an ANN probe.
    Lists are defensively re-sorted (score desc, id asc) so callers
    can pass results in any order; identical output to the DataFrame
    route (tested)."""
    acc: dict[int, float] = {}
    for lst in lists:
        ordered = sorted(lst, key=lambda t: (-t[1], t[0]))[:window_size]
        for rank, (i, _) in enumerate(ordered, start=1):
            acc[i] = acc.get(i, 0.0) + 1.0 / (rank_constant + rank)
    if round_digits is not None:
        acc = {i: round(s, round_digits) for i, s in acc.items()}
    out = sorted(acc.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(int(i), float(s)) for i, s in out]


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def duckdb_cosine_topk_sql(
    query_vec_sql: str,
    k: int,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> str:
    """(vec_id, cosine) top-k vs a query vector; ``query_vec_sql`` is a
    SQL expression yielding DOUBLE[] (e.g. a literal list or a scalar
    subquery).  Same rounding-before-ordering contract as the engine."""
    return f"""
WITH q AS (SELECT ({query_vec_sql})::DOUBLE[] AS qv),
scored AS (
  SELECT {id_col} AS vec_id,
    round(list_dot_product({vec_col}::DOUBLE[], qv) /
          (sqrt(list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[])) *
           sqrt(list_dot_product(qv, qv))), {round_digits}) AS cosine
  FROM {table}, q
)
SELECT vec_id, cosine FROM scored
ORDER BY cosine DESC, vec_id ASC LIMIT {k}
"""


def duckdb_rrf_sql(
    retriever_sqls: list[str],
    k: int = 10,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
    round_digits: int = 6,
) -> str:
    """RRF over retriever subqueries that each yield (id, score) rows
    ALREADY cut to their window (first column = id, second = score).
    Mirrors :func:`rrf_fuse_df` exactly: rank (score desc, id asc)
    within each list, sum 1/(c+rank), round, (score desc, id asc)."""
    branches = []
    for i, sql in enumerate(retriever_sqls):
        branches.append(f"""
r{i} AS (
  SELECT c1 AS doc_id,
         row_number() OVER (ORDER BY c2 DESC, c1 ASC) AS rnk
  FROM ({sql}) t{i}(c1, c2)
)""")
    union = "\nUNION ALL\n".join(
        f"SELECT doc_id, 1.0 / ({rank_constant} + rnk) AS c FROM r{i}"
        for i in range(len(retriever_sqls)))
    ctes = ",".join(branches)
    return f"""
WITH {ctes},
u AS (
{union}
)
SELECT doc_id, round(sum(c), {round_digits}) AS score
FROM u GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def duckdb_linear_sql(
    retriever_sqls: list[tuple[str, float]],
    k: int = 10,
    round_digits: int = 6,
) -> str:
    """Oracle twin of :func:`linear_fuse_df` — ``retriever_sqls`` =
    [(sql yielding (id, score) cut to window, weight), ...]."""
    branches, unions = [], []
    for i, (sql, weight) in enumerate(retriever_sqls):
        branches.append(f"""
r{i} AS (
  SELECT c1 AS doc_id, c2 AS s,
         min(c2) OVER () AS mn, max(c2) OVER () AS mx
  FROM ({sql}) t{i}(c1, c2)
)""")
        unions.append(
            f"SELECT doc_id, {float(weight)} * (CASE WHEN mx = mn THEN 1.0 "
            f"ELSE (s - mn) / (mx - mn) END) AS c FROM r{i}")
    ctes = ",".join(branches)
    union = "\nUNION ALL\n".join(unions)
    return f"""
WITH {ctes},
u AS (
{union}
)
SELECT doc_id, round(sum(c), {round_digits}) AS score
FROM u GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


def hybrid_rrf_serve(
    engine,
    ann_server,
    query: str,
    query_vec,
    k: int = 10,
    window_size: int = DEFAULT_WINDOW,
    rank_constant: int = DEFAULT_RANK_CONSTANT,
) -> list[tuple[int, float]]:
    """The full hybrid query on the serving tier, zero Spark jobs when
    both legs serve from memory: ``QueryEngine.search`` (arrow postings
    tier) ⊕ :class:`~deces_dataprep_spark.operators.similarity.AnnServer`
    top-k, fused with :func:`rrf_fuse_lists` — rank-identical to
    :func:`hybrid_rrf_topk_df` over the same corpus (tested)."""
    bm = engine.search(query, k=window_size)
    ann = ann_server.topk(query_vec, k=window_size)
    return rrf_fuse_lists([bm, ann], k, window_size, rank_constant)
