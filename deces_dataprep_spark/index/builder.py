"""SPIMI-style distributed inverted-index build (SURVEY §7.4, §2B #25).

The reference delegates index construction to Elasticsearch (bulk sink,
``datasets/deces_index.yml``); here it is explicit Spark dataflow.

Architecture — designed for 10^12-doc scale, tested on local[32]:

1. **Sharding by doc space.** The index is ``n_shards`` independent
   sub-indexes, ``shard = pmod(doc_id, n_shards)`` (exactly ES's own
   shard model). Per-term work is bounded by the shard's doc count, so
   even a stopword's posting list never has to materialize globally in
   one task; queries run WAND per shard and merge top-k (associative,
   rank-exact because scoring uses *global* df/N/avgdl).

2. **Tokenize + tf: pure JVM.** ``explode(tokens)`` →
   ``groupBy(shard, term, doc_id).count()`` — one shuffle with map-side
   partial aggregation, whole-stage codegen, no Python. ``dl`` (doc
   length) is attached *before* the explode so it rides along and no
   join against norms is needed.

3. **Global stats first.** ``dictionary(term, df, cf)`` and ``(N,
   avgdl)`` are aggregated from tf; df must be global (not per-shard)
   for BM25, so it is joined back — Catalyst broadcasts the dictionary
   when small, sort-merge joins otherwise.

4. **Skew-aware posting assembly.** Default path: Zipf head terms are
   pre-compacted per ``(shard, term, salt)`` bucket — ``salt =
   pmod(xxhash64(doc_id), n_salts)`` — into packed arrays via
   ``collect_list`` (JVM), shrinking the final shuffle from one record
   per posting to one per bucket. The final stage is
   ``repartition(shard, term) → sortWithinPartitions`` →
   ``mapInPandas`` (one Python call per Arrow batch, not per term) that
   merges buckets with numpy, computes exact BM25 per posting, and
   emits delta+varint blocks with block-max scores.

Output tables (written by :mod:`deces_dataprep_spark.snapshots`):
  postings(shard, term, block_id, n_docs, first_doc, last_doc,
           doc_gaps binary, tfs binary, block_max_score double, df long)
  dictionary(term, df, cf)
  norms(shard, doc_id, doc_len)
  stats(n_docs, avgdl)
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.analyze import tokens_col
from deces_dataprep_spark.index import bm25
from deces_dataprep_spark.index.codec import BLOCK_SIZE, encode_postings

POSTINGS_SCHEMA = (
    "shard int, term string, block_id int, n_docs int, first_doc long, "
    "last_doc long, doc_gaps binary, tfs binary, block_max_score double, df long"
)


@dataclass
class IndexTables:
    postings: DataFrame
    dictionary: DataFrame
    norms: DataFrame
    stats: DataFrame  # single row: n_docs, avgdl


def docs_with_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, tokens, dl) — native tokenizer, JVM-side."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens_col(text_col).alias("tokens"),
    ).withColumn("dl", F.size("tokens").cast("long"))


def term_frequencies(docs: DataFrame, n_shards: int, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(shard, term, doc_id, tf, dl) — one shuffle, partial-agg, codegen."""
    toks = docs_with_tokens(docs, text_col, id_col)
    exploded = toks.select(
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        "doc_id",
        "dl",
        F.explode("tokens").alias("term"),
    )
    return exploded.groupBy("shard", "term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    n_shards: int = 4,
    n_salts: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_size: int = BLOCK_SIZE,
    partitions: int | None = None,
) -> IndexTables:
    """Build the full index (postings/dictionary/norms/stats) lazily.

    All returned DataFrames are unevaluated logical plans; callers
    trigger execution by writing them (see snapshots.write_index).
    """
    tf = term_frequencies(docs, n_shards, text_col, id_col)

    toks = docs_with_tokens(docs, text_col, id_col)
    norms = toks.select(
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
        "doc_id",
        F.col("dl").alias("doc_len"),
    )
    stats = norms.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doc_len").alias("avgdl"),
    )
    # dictionary: global df/cf per term (one agg over tf; partial-agg combine).
    dictionary = tf.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("tf").alias("cf"),
    )

    # --- skew-defusing pre-compaction: one packed record per (shard,term,salt)
    salted = tf.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(n_salts)).cast("int")
    )
    compact = salted.groupBy("shard", "term", "salt").agg(
        F.collect_list(F.struct("doc_id", "tf", "dl")).alias("postings")
    )
    # global df joined in (broadcast when small — Catalyst/AQE decides).
    compact = compact.join(dictionary.select("term", "df"), "term")

    n_part = partitions or spark.sparkContext.defaultParallelism
    stream = compact.repartition(n_part, "shard", "term").sortWithinPartitions(
        "shard", "term", "salt"
    )

    # stats are tiny — compute eagerly for broadcast into the encoder.
    stats_row = stats.collect()[0]
    n_docs_g, avgdl_g = int(stats_row["n_docs"]), float(stats_row["avgdl"])

    def encode_stream(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        """Streaming merge: consecutive rows of one (shard, term) are
        contiguous within the partition; carry state across Arrow batches."""
        cur_key: tuple[int, str] | None = None
        cur_df: int = 0
        bufs: list[pd.DataFrame] = []
        out_rows: list[dict] = []

        def flush():
            nonlocal bufs, cur_key, cur_df
            if cur_key is None or not bufs:
                return
            posts = pd.concat(bufs, ignore_index=True) if len(bufs) > 1 else bufs[0]
            doc_ids = posts["doc_id"].to_numpy(np.int64)
            if doc_ids.size and doc_ids.min() < 0:
                # delta-gap codec works in uint64 doc space; ids must be
                # non-negative (hash-derived ids are masked to 63 bits).
                raise ValueError("doc_id must be non-negative for the block codec")
            order = np.argsort(doc_ids, kind="stable")
            doc_ids = doc_ids[order]
            tfs = posts["tf"].to_numpy(np.int64)[order]
            dls = posts["dl"].to_numpy(np.float64)[order]
            scores = bm25.bm25_score(tfs.astype(np.float64), float(cur_df), dls,
                                     n_docs_g, avgdl_g)
            shard, term = cur_key
            for blk in encode_postings(doc_ids.astype(np.uint64), tfs.astype(np.uint64),
                                       np.asarray(scores), block_size):
                out_rows.append(
                    dict(shard=shard, term=term, block_id=blk.block_id,
                         n_docs=blk.n_docs, first_doc=blk.first_doc,
                         last_doc=blk.last_doc, doc_gaps=blk.doc_gaps,
                         tfs=blk.tfs, block_max_score=blk.block_max_score,
                         df=cur_df)
                )
            bufs = []

        for batch in batches:
            if batch.empty:
                continue
            # each row: shard, term, salt, postings(list of dict), df
            for (shard, term), grp in batch.groupby(["shard", "term"], sort=False):
                key = (int(shard), term)
                if key != cur_key:
                    flush()
                    cur_key = key
                    cur_df = int(grp["df"].iloc[0])
                flat = [p for lst in grp["postings"] for p in lst]
                bufs.append(pd.DataFrame(flat))
            if out_rows:
                yield pd.DataFrame(out_rows)
                out_rows = []
        flush()
        if out_rows:
            yield pd.DataFrame(out_rows)

    postings = stream.mapInPandas(encode_stream, POSTINGS_SCHEMA)

    stats_df = spark.createDataFrame(
        [(n_docs_g, avgdl_g)], "n_docs long, avgdl double"
    )
    return IndexTables(postings=postings, dictionary=dictionary, norms=norms,
                       stats=stats_df)
