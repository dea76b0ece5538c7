"""Positional index + phrase queries (ES ``match_phrase`` parity).

The posting blocks (builder.py) are doc-only — enough for BM25 ranking.
Phrase queries additionally need token positions. Rather than widening
the block codec, positions live in their own table (the classic
separation: frequencies hot path, positions cold path — Lucene stores
them as separate streams for the same reason):

    positions(shard, term, doc_id, positions array<int>)

built by ONE posexplode + groupBy shuffle (map-side combine on
(shard, term, doc_id)); parquet dictionary+RLE encodes the int arrays
compactly. Phrase evaluation is fully native Catalyst — no Python:

* scan path  — :func:`phrase_match`: per doc, fold the phrase terms
  with ``array_intersect(transform(prev, p → p+1), pos_i)``: after
  step i the array holds every position where the first i+1 terms end
  adjacently; non-empty at the end = match.
* index path — :func:`phrase_match_from_index`: fetch the phrase
  terms' position rows (parquet pushdown on ``term IN (...)``), join
  per doc, apply the same fold. Tested identical to the scan path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.analyze import tokens_col


def positions_from_tokens(toks: DataFrame, n_shards: int = 4) -> DataFrame:
    """positions over a pre-tokenized projection ``(doc_id, tokens, …)``
    — lets write_index reuse its single cached tokenize pass."""
    pos = toks.select(
        "doc_id",
        F.posexplode("tokens").alias("pos", "term"),
    )
    return pos.groupBy(
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        "term",
        "doc_id",
    ).agg(F.array_sort(F.collect_list("pos")).alias("positions"))


def positions_table(docs: DataFrame, n_shards: int = 4,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(shard, term, doc_id, positions) — one shuffle, sorted positions."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens_col(text_col).alias("tokens"))
    return positions_from_tokens(toks, n_shards)


def _adjacency_fold(pos_cols: list) -> "F.Column":
    """Fold position arrays: positions where term_0..term_i end
    adjacently. Returns a BOOLEAN match column."""
    cand = pos_cols[0]
    for nxt in pos_cols[1:]:
        cand = F.array_intersect(
            F.transform(cand, lambda p: p + 1), nxt
        )
    return F.size(cand) > 0


def phrase_match(docs: DataFrame, phrase: str, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """doc_ids whose analyzed token stream contains the analyzed phrase
    as consecutive tokens — native expressions over one tokenize."""
    # NOT analyze_query: that de-dups terms; a phrase needs the raw
    # ordered term list ("to be or not to be").
    import pandas as pd

    from deces_dataprep_spark.functions.analyze import tokenize_series

    terms = list(tokenize_series(pd.Series([phrase])).iloc[0])
    if not terms:
        return docs.select(F.col(id_col).alias("doc_id")).limit(0)
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        tokens_col(text_col).alias("toks"))
    pos_cols = [
        F.filter(
            F.transform(F.col("toks"),
                        lambda t, i: F.when(t == F.lit(term), i)),
            lambda x: x.isNotNull(),
        )
        for term in terms
    ]
    return toked.filter(_adjacency_fold(pos_cols)).select("doc_id")


def phrase_match_from_index(spark: SparkSession, positions: DataFrame,
                            phrase: str) -> DataFrame:
    """The same phrase over the positional index: pushdown-fetch the
    phrase terms' rows, self-join per doc, adjacency fold."""
    import pandas as pd

    from deces_dataprep_spark.functions.analyze import tokenize_series

    terms = list(tokenize_series(pd.Series([phrase])).iloc[0])
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    sides = []
    for i, term in enumerate(terms):
        sides.append(
            positions.filter(F.col("term") == term)
            .select("doc_id", F.col("positions").alias(f"p{i}"))
        )
    joined = sides[0]
    for s in sides[1:]:
        joined = joined.join(s, "doc_id")  # conjunctive: all terms present
    return joined.filter(
        _adjacency_fold([F.col(f"p{i}") for i in range(len(terms))])
    ).select("doc_id")


def match_phrase_prefix(docs: DataFrame, phrase: str,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """ES ``match_phrase_prefix`` (search-as-you-type): the analyzed
    phrase must appear as consecutive tokens, except the LAST term
    matches any token it is a prefix of ("merge so" hits "merge sort"
    and "merge sorted"). Same native position-fold plan as
    :func:`phrase_match` — the only change is the last term's position
    set uses ``startswith`` instead of equality. Reference query-side
    contract: the edge-ngram/index_prefixes fields of
    deces_index.yml:28-33,80-82 exist to serve exactly this query
    shape."""
    import pandas as pd

    from deces_dataprep_spark.functions.analyze import tokenize_series

    terms = list(tokenize_series(pd.Series([phrase])).iloc[0])
    if not terms:
        return docs.select(F.col(id_col).alias("doc_id")).limit(0)
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        tokens_col(text_col).alias("toks"))

    def pos_of(term: str, is_last: bool):
        if is_last:
            match = lambda t: t.startswith(term)  # noqa: E731
        else:
            match = lambda t: t == F.lit(term)  # noqa: E731
        return F.filter(
            F.transform(F.col("toks"),
                        lambda t, i: F.when(match(t), i)),
            lambda x: x.isNotNull(),
        )

    pos_cols = [pos_of(t, i == len(terms) - 1)
                for i, t in enumerate(terms)]
    return toked.filter(_adjacency_fold(pos_cols)).select("doc_id")


def duckdb_phrase_match_sql(phrase: str, table: str = "documents",
                            text_col: str = "text",
                            prefix_last: bool = False) -> str:
    """DuckDB oracle: exists j with tokens[j..j+n-1] == phrase terms
    (1-based list indexing). ``prefix_last`` switches the last term to
    a ``starts_with`` match — the :func:`match_phrase_prefix` oracle."""
    import pandas as pd

    from deces_dataprep_spark.functions.analyze import (
        duckdb_tokens_sql,
        tokenize_series,
    )

    terms = list(tokenize_series(pd.Series([phrase])).iloc[0])
    toks = duckdb_tokens_sql(text_col)
    conds = " AND ".join(
        (f"starts_with(toks[j + {i}], '{t}')"
         if prefix_last and i == len(terms) - 1
         else f"toks[j + {i}] = '{t}'")
        for i, t in enumerate(terms)
    )
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM {table})
SELECT doc_id FROM t
WHERE len(toks) >= {len(terms)}
  AND len(list_filter(generate_series(1, len(toks) - {len(terms) - 1}),
                      j -> {conds})) > 0
"""
