"""Query side: analyzer → postings fetch → block-max WAND → top-k.

Mirrors the reference's ES search path (its index spec is the contract:
query text goes through the same ``norm`` analyzer as indexing, terms
are looked up in the inverted index, BM25-scored, top-k returned).

Two implementations, required to be rank-identical (north_rule):

* :meth:`QueryEngine.search` — block-max WAND over our compressed
  postings. Postings for the query's terms are fetched with predicate
  pushdown (``term IN (...)`` reaches the Parquet scan), WAND runs per
  shard, shard top-k merge is exact because df/N/avgdl are global.
* :func:`bm25_topk_df` — the exhaustive Spark-SQL oracle: tokenize →
  explode → join → aggregate → ``ORDER BY score DESC, doc_id LIMIT k``,
  fully Catalyst-planned (``TakeOrderedAndProject``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.analyze import tokenize_series, tokens_col
from deces_dataprep_spark.index import bm25
from deces_dataprep_spark.index.builder import IndexTables, term_frequencies
from deces_dataprep_spark.index.wand import TermPostings, wand_topk


def analyze_query(q: str) -> list[str]:
    """Query text through the same analyzer chain as indexing."""
    toks = tokenize_series(pd.Series([q])).iloc[0]
    # de-dup, keep order (conjunctive tf of repeated terms is not what ES does)
    seen: set[str] = set()
    out = []
    for t in toks:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


class QueryEngine:
    """Serve BM25 top-k from built index tables.

    At sandbox scale norms are cached driver-side per shard; at cluster
    scale the same per-shard WAND runs inside one task per shard (the
    shard's postings for the query terms + its norms partition are
    task-local) and only the per-shard top-k rows move to the driver.
    """

    def __init__(self, tables: IndexTables):
        self.tables = tables
        row = tables.stats.collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])
        self._norms_cache: dict[int, dict[int, int]] = {}

    def _shard_norms(self, shard: int) -> dict[int, int]:
        if shard not in self._norms_cache:
            rows = (
                self.tables.norms.filter(F.col("shard") == shard)
                .select("doc_id", "doc_len")
                .collect()
            )
            self._norms_cache[shard] = {int(r["doc_id"]): int(r["doc_len"]) for r in rows}
        return self._norms_cache[shard]

    def _fetch_term_postings(self, terms: list[str]) -> dict[int, list[TermPostings]]:
        """Postings for the query terms, grouped by shard.

        ``term IN (...)`` is pushed down to the Parquet scan when the
        postings table is file-backed.
        """
        rows = (
            self.tables.postings.filter(F.col("term").isin(terms))
            .orderBy("shard", "term", "block_id")
            .collect()
        )
        by_shard: dict[int, dict[str, TermPostings]] = {}
        for r in rows:
            shard = int(r["shard"])
            tp = by_shard.setdefault(shard, {}).get(r["term"])
            if tp is None:
                tp = TermPostings(
                    term=r["term"], df=int(r["df"]), block_ids=[], n_docs=[],
                    first_docs=[], last_docs=[], doc_gaps=[], tfs=[], block_max=[],
                )
                by_shard[shard][r["term"]] = tp
            tp.block_ids.append(int(r["block_id"]))
            tp.n_docs.append(int(r["n_docs"]))
            tp.first_docs.append(int(r["first_doc"]))
            tp.last_docs.append(int(r["last_doc"]))
            tp.doc_gaps.append(bytes(r["doc_gaps"]))
            tp.tfs.append(bytes(r["tfs"]))
            tp.block_max.append(float(r["block_max_score"]))
        return {s: list(d.values()) for s, d in by_shard.items()}

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score) — block-max WAND, shard-merged."""
        terms = analyze_query(query)
        if not terms:
            return []
        by_shard = self._fetch_term_postings(terms)
        merged: list[tuple[int, float]] = []
        for shard, tps in by_shard.items():
            merged.extend(
                wand_topk(tps, self.n_docs, self.avgdl, self._shard_norms(shard), k)
            )
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]


def bm25_topk_df(
    spark: SparkSession,
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int | None = 6,
) -> DataFrame:
    """Exhaustive Spark-SQL BM25 oracle — one declarative plan.

    tokenize (native) → explode → tf/df aggregation → score → top-k.
    Catalyst plans this as codegen'd aggregates + a broadcast of the
    tiny per-term df map + ``TakeOrderedAndProject`` — no Python on the
    hot path. Scores are rounded *before* ordering so ranking is stable
    across engines (oracle parity), tie-break doc_id asc.
    """
    terms = analyze_query(query)
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens_col(text_col).alias("tokens")
    ).withColumn("dl", F.size("tokens").cast("long"))

    stats = toks.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(stats["n_docs"]), float(stats["avgdl"])

    tf = (
        toks.select("doc_id", "dl", F.explode("tokens").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    df_map = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_map), "term").withColumn(
        "contrib",
        bm25.bm25_score_col(F.col("tf"), F.col("df"), F.col("dl"), n_docs, avgdl),
    )
    agg = scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    if round_digits is not None:
        agg = agg.withColumn("score", F.round(F.col("score"), round_digits))
    return agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def duckdb_bm25_topk_sql(
    query: str, k: int = 10, table: str = "documents",
    id_col: str = "doc_id", text_col: str = "text", round_digits: int = 6,
) -> str:
    """The DuckDB oracle equivalent of :func:`bm25_topk_df` (ASCII corpus)."""
    terms = analyze_query(query)
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    from deces_dataprep_spark.functions.analyze import duckdb_tokens_sql

    toks = duckdb_tokens_sql(text_col)
    score = bm25.duckdb_bm25_sql(
        "tf", "df", "dl", "(select n_docs from stats)", "(select avgdl from stats)"
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, {toks} AS tokens FROM {table}
),
docs AS (
  SELECT doc_id, tokens, len(tokens)::BIGINT AS dl FROM toks
),
stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM docs
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, any_value(dl) AS dl
  FROM (SELECT doc_id, dl, unnest(tokens) AS term FROM docs)
  WHERE term IN ({terms_sql})
  GROUP BY doc_id, term
),
dfm AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
)
SELECT doc_id, round(sum({score}), {round_digits}) AS score
FROM tf JOIN dfm USING (term)
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""
