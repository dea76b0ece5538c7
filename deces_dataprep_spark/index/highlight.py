"""Snippet highlighting (ES ``highlight`` parity).

The reference's serving side returns highlighted fragments with the hit
terms marked (standard ES search UX; the deces front-end displays them).
Re-expressed Spark-first: for each top-k document, pick the
``window``-token span that covers the MOST DISTINCT query terms (the
unified-highlighter fragment heuristic), tie → earliest span; return its
token range and text.

Plan (fully native, no Python on the data path):

    top-k (bm25_topk_df, rounded + doc_id tie-break — deterministic)
      → semi-join docs (k rows survive the scan)
      → posexplode tokens → filter to query terms   (per-doc hit lists)
      → self-join within doc on pos ∈ [start, start+W)   (tiny: k docs
        × per-doc hits² — bounded by doc length, not corpus size)
      → groupBy(doc, start): count distinct terms
      → argmax per doc via max(struct(n_hits, -start))
      → slice(tokens, start+1, W) snippet

Everything after the top-k is k-row work — the corpus-sized part is
exactly the BM25 plan, which already has its own scale story.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.analyze import tokens_col
from deces_dataprep_spark.index.query import analyze_query, bm25_topk_df


def best_windows(matches: DataFrame, window: int) -> DataFrame:
    """(doc_id, start, n_hits) — the argmax window per doc over
    (doc_id, pos, term) hit rows. Candidate starts are hit positions
    (an optimal max-coverage window can always be shifted left onto
    one); tie-break = earliest start via max(struct(n_hits, -start))."""
    m1 = matches.select("doc_id", F.col("pos").alias("start"))
    m2 = matches.select(F.col("doc_id").alias("doc_id2"),
                        F.col("pos").alias("pos2"),
                        F.col("term").alias("term2"))
    wins = (
        m1.join(
            m2,
            (F.col("doc_id") == F.col("doc_id2"))
            & (F.col("pos2") >= F.col("start"))
            & (F.col("pos2") < F.col("start") + F.lit(window)),
        )
        .groupBy("doc_id", "start")
        .agg(F.count_distinct("term2").alias("n_hits"))
    )
    best = wins.groupBy("doc_id").agg(
        F.max(F.struct(F.col("n_hits"), (-F.col("start")).alias("neg_start")))
        .alias("b")
    )
    return best.select(
        "doc_id",
        F.col("b.neg_start").cast("int").alias("neg_start"),
        F.col("b.n_hits").alias("n_hits"),
    ).select("doc_id", (-F.col("neg_start")).alias("start"), "n_hits")


def highlight_df(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start, n_hits, snippet) for the BM25 top-k of ``query``:
    ``snippet`` is the best ``window``-token fragment (most distinct
    query terms, earliest on tie), ``start`` its 0-based token offset."""
    terms = analyze_query(query)
    if not terms:
        return spark.createDataFrame(
            [], "doc_id long, start int, n_hits long, snippet string")
    top = bm25_topk_df(spark, docs, query, k, id_col=id_col,
                       text_col=text_col).select("doc_id")
    toked = (
        docs.select(F.col(id_col).alias("doc_id"),
                    tokens_col(text_col).alias("toks"))
        .join(top, "doc_id", "left_semi")
    )
    matches = toked.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    ).filter(F.col("term").isin(terms))
    best = best_windows(matches, window)
    return (
        toked.join(best, "doc_id")
        .select(
            "doc_id",
            F.col("start").cast("int").alias("start"),
            "n_hits",
            F.concat_ws(
                " ", F.slice(F.col("toks"), F.col("start") + 1, F.lit(window))
            ).alias("snippet"),
        )
    )


def duckdb_highlight_sql(query: str, k: int = 10, window: int = 8,
                         table: str = "documents",
                         text_col: str = "text") -> str:
    """The DuckDB oracle twin of :func:`highlight_df` (same top-k CTE,
    same argmax-window semantics; DuckDB list slicing is 1-based
    inclusive)."""
    from deces_dataprep_spark.functions.analyze import duckdb_tokens_sql
    from deces_dataprep_spark.index.query import duckdb_bm25_topk_sql

    terms = analyze_query(query)
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    topk = duckdb_bm25_topk_sql(query, k, table=table, text_col=text_col)
    return f"""
WITH topk AS ({topk}),
toked AS (
  SELECT doc_id, {duckdb_tokens_sql(text_col)} AS toks
  FROM {table} WHERE doc_id IN (SELECT doc_id FROM topk)
),
matches AS (
  SELECT doc_id, i - 1 AS pos, toks[i] AS term
  FROM toked, unnest(generate_series(1, len(toks))) AS u(i)
  WHERE toks[i] IN ({terms_sql})
),
wins AS (
  SELECT m1.doc_id, m1.pos AS start,
         count(DISTINCT m2.term)::BIGINT AS n_hits
  FROM matches m1
  JOIN matches m2
    ON m1.doc_id = m2.doc_id
   AND m2.pos >= m1.pos AND m2.pos < m1.pos + {window}
  GROUP BY m1.doc_id, m1.pos
),
best AS (
  SELECT doc_id, start, n_hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY n_hits DESC, start ASC) AS rn
  FROM wins
)
SELECT t.doc_id, b.start::INTEGER AS start, b.n_hits,
       array_to_string(t.toks[b.start + 1 : b.start + {window}], ' ')
         AS snippet
FROM toked t JOIN best b ON t.doc_id = b.doc_id AND b.rn = 1
"""
