"""Benchmark decontamination — n-gram overlap of a corpus against an
evaluation/benchmark set.

The standard guard in a training-data pipeline (the reference has no
analogue — its corpus is an administrative register — but any 100-TB
web-text pipeline feeding a model MUST report eval-set overlap before
training): a document is *contaminated* to the degree its word n-grams
appear anywhere in the benchmark suite.

Plan shape (100-TB-safe):

* the benchmark side is tiny by nature (eval suites are MBs, the corpus
  is TBs) → its distinct shingle set is computed once and **broadcast**;
  the corpus side never shuffles — the overlap mark is a map-side
  broadcast-hash semi-probe, then ONE groupBy(doc_id) with map-side
  partial aggregation.
* shingles reuse :func:`deces_dataprep_spark.operators.dedup.with_shingles`
  (distinct word n-grams over the analyzed token stream, Arrow-batched).

Outputs one row per input doc: total distinct shingles, how many hit the
benchmark set, and the contamination fraction — the decision column a
pipeline filters or buckets on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deces_dataprep_spark.operators.dedup import with_shingles


def benchmark_shingles(benchmark: DataFrame, n: int = 3,
                       text_col: str = "text") -> DataFrame:
    """Distinct shingle set of the benchmark suite: (shingle) rows.

    Benchmark ids are irrelevant — contamination is membership in the
    union of all benchmark n-grams (the strictest, standard definition).
    """
    sh = benchmark.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col(text_col).alias("text"),
    )
    return (
        with_shingles(sh, n=n, text_col="text", id_col="doc_id")
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )


def contamination_report(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         tokens=None) -> DataFrame:
    """(doc_id, n_shingles, n_contaminated, contamination) per doc.

    ``contamination`` = |doc shingles ∩ benchmark shingles| / |doc
    shingles| (0.0 for docs too short to have an n-gram). The benchmark
    shingle set is broadcast — the corpus-side plan is scan → shingle
    UDF → explode → broadcast semi-probe → one groupBy(doc_id); no
    corpus-sized shuffle key other than doc_id, which is unskewed by
    construction.
    """
    bench = benchmark_shingles(benchmark, n=n, text_col=bench_text_col)
    sh = with_shingles(docs, n=n, text_col=text_col, id_col=id_col,
                       tokens=tokens)
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    marked = ex.join(
        F.broadcast(bench.withColumn("__hit", F.lit(1))), "shingle", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
    )
    # docs with < n tokens produce no shingles — restore them with 0s
    all_docs = docs.select(F.col(id_col).alias("doc_id"))
    out = all_docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )
    return out.withColumn(
        "contamination",
        F.round(
            F.when(F.col("n_shingles") > 0,
                   F.col("n_contaminated").cast("double")
                   / F.col("n_shingles").cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ),
    )


def drop_contaminated(docs: DataFrame, benchmark: DataFrame,
                      max_contamination: float = 0.1, n: int = 3,
                      text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Filter the corpus to docs at or below the contamination threshold
    — the composed pipeline op (report → threshold → semi join back)."""
    keep = contamination_report(
        docs, benchmark, n=n, text_col=text_col, id_col=id_col
    ).filter(F.col("contamination") <= max_contamination).select("doc_id")
    return docs.join(
        keep.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
