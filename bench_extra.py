#!/usr/bin/env python
"""Extra noop-sink micro-benchmarks (guide §1.4) for the optimization
round — NOT the driver contract (that is bench.py, frozen). Each item
isolates one piece of an expensive bench row so that before/after
numbers attribute to the right operator.

Usage: python bench_extra.py [item ...]    (default: all)
Prints one "<item>: <best_of_2>s" line per item to stdout.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("BENCH_DOCS", "400000"))
CORPUS_DIR = os.environ.get("BENCH_CORPUS_DIR",
                            f"/tmp/dds_bench_corpus_v2_{N_DOCS}")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "2"))


def fresh_spark():
    """Same config as bench.py's fresh_spark (comparable numbers)."""
    from deces_dataprep_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {
        "spark.sql.files.maxPartitionBytes": "16m",
        "spark.sql.files.openCostInBytes": "4m",
    }
    if os.path.isdir("/dev/shm"):
        d = "/dev/shm/spark-local"
        os.makedirs(d, exist_ok=True)
        extra["spark.local.dir"] = d
    return get_spark(f"bench-extra-{cpus}", master=f"local[{cpus}]",
                     shuffle_partitions=max(cpus * 2, 8), extra_conf=extra)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def best_of(fn, n=REPS):
    best = 1e18
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return best


def main():
    spark = fresh_spark()
    from pyspark.sql import functions as F

    from deces_dataprep_spark.functions import text as T
    from deces_dataprep_spark.functions.analyze import (
        norm_keyword_col,
        tokens_col,
    )
    from deces_dataprep_spark.operators import dedup

    pages = spark.read.parquet(CORPUS_DIR)
    sc = spark.sparkContext

    def tokenize_only():
        noop(pages.select("doc_id", tokens_col("text").alias("t")))

    def quality_only():
        noop(T.quality_features(pages))

    def lang_only():
        noop(T.lang_id(pages))

    def n_stop_only():
        from deces_dataprep_spark.functions.text import STOPWORDS
        norm = norm_keyword_col("text")
        stop_rx = F.lit(r"\b(?:" + "|".join(STOPWORDS) + r")\b")
        noop(pages.select(
            "doc_id",
            F.size(F.regexp_extract_all(norm, stop_rx, F.lit(0)))
            .cast("long").alias("n_stop")))

    def sum_len_only():
        noop(pages.select(
            "doc_id",
            F.length(F.regexp_replace(F.col("text"),
                                      r"[^\p{L}\p{Nd}]+", "")).alias("s")))

    def distinct_only():
        noop(pages.select(
            "doc_id",
            F.size(F.array_distinct(tokens_col("text"))).alias("d")))

    def bigram_only():
        noop(pages.select(
            "doc_id",
            T._top_bigram_count_udf(
                T._token_hashes(tokens_col("text"))).alias("b")))

    def repetition_only():
        noop(T.repetition_features(pages))

    def minhash_only():
        noop(dedup.minhash_signatures_fast(pages, n_hashes=8, shingle_n=3))

    def lsh_only():
        noop(dedup.lsh_candidate_pairs(pages, n_hashes=8, bands=4,
                                       max_bucket=200, hash_fn="fast"))

    def token_hashes_only():
        from deces_dataprep_spark.operators.decontam import token_hashes_col
        noop(pages.select(
            "doc_id", token_hashes_col(tokens_col("text")).alias("h")))

    def contam_only():
        from deces_dataprep_spark.functions.analyze import tokens_col as tc
        from deces_dataprep_spark.operators.curate import curate  # noqa: F401
        from deces_dataprep_spark.operators.decontam import (
            benchmark_shingle_hashes,
            contamination_probe_fast_udf,
            token_hashes_col,
        )
        bench_docs = pages.filter(F.col("doc_id") % 1000 == 0).select(
            F.concat_ws(
                " ",
                F.slice(tc("text"), 1,
                        F.floor(F.size(tc("text")) / 2).cast("int")),
            ).alias("text"))
        bh = benchmark_shingle_hashes(bench_docs, n=3)
        probe = contamination_probe_fast_udf(sc.broadcast(bh), 3)
        noop(pages.select(
            "doc_id",
            probe(token_hashes_col(tokens_col("text"))).alias("c")))

    def curation_only():
        from deces_dataprep_spark.functions.analyze import tokens_col as tc
        from deces_dataprep_spark.operators.curate import curate
        bench_docs = pages.filter(F.col("doc_id") % 1000 == 0).select(
            F.concat_ws(
                " ",
                F.slice(tc("text"), 1,
                        F.floor(F.size(tc("text")) / 2).cast("int")),
            ).alias("text"))
        noop(curate(pages, bench_docs))

    def exact_dedup_only():
        noop(dedup.exact_dup_groups(pages))

    def build_noop():
        from deces_dataprep_spark.index.builder import build_index
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        tables = build_index(spark, pages, n_shards=8, partitions=cpus * 4)
        noop(tables.postings)
        tables.unpersist_tokens()

    def bm25_sql():
        from deces_dataprep_spark.index.query import bm25_topk_df
        bm25_topk_df(spark, pages, "data web crawl", 10).collect()

    items = {
        "tokenize_only": tokenize_only,
        "quality_only": quality_only,
        "lang_only": lang_only,
        "n_stop_only": n_stop_only,
        "sum_len_only": sum_len_only,
        "distinct_only": distinct_only,
        "bigram_only": bigram_only,
        "repetition_only": repetition_only,
        "minhash_only": minhash_only,
        "lsh_only": lsh_only,
        "token_hashes_only": token_hashes_only,
        "contam_only": contam_only,
        "curation_only": curation_only,
        "exact_dedup_only": exact_dedup_only,
        "build_noop": build_noop,
        "bm25_sql": bm25_sql,
    }
    names = sys.argv[1:] or list(items)
    for name in names:
        sc.setJobDescription(f"bench_extra:{name}")
        secs = best_of(items[name])
        print(f"{name}: {secs:.3f}s", flush=True)
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
