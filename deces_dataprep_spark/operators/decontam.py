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

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deces_dataprep_spark.operators.dedup import (
    _MIX_P2,
    _mix64_np,
    with_shingles,
)


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


def contamination_probe_udf(bench_bc, n: int):
    """Row-local contamination probe: an Arrow-batched pandas UDF
    holding the benchmark's distinct shingle set as a Spark broadcast
    (``bench_bc``). Per row it builds the doc's distinct n-gram set (the
    identical sliding window as ``dedup._shingles_udf``) and intersects
    — value-identical to the explode → broadcast-join → groupBy shape,
    with ZERO shuffle and no join to restore shingle-less docs.

    Memory note: each *Python worker* unpickles one copy of the set
    (vs one JVM-heap copy per executor for the broadcast join). Eval
    suites are MBs by nature, so ~cores × set-size is noise; for a
    benchmark too large for that, use ``method='join'`` on
    :func:`contamination_report`."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_t = StructType([StructField("n_shingles", LongType()),
                        StructField("n_contaminated", LongType())])

    @F.pandas_udf(out_t)
    def probe(tokens):
        import numpy as np
        import pandas as pd

        bset = bench_bc.value
        ns = np.zeros(len(tokens), np.int64)
        nc = np.zeros(len(tokens), np.int64)
        for i, toks in enumerate(tokens):
            if toks is None or len(toks) < n:
                continue
            sh = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
            ns[i] = len(sh)
            nc[i] = len(sh & bset)
        return pd.DataFrame({"n_shingles": ns, "n_contaminated": nc})

    # pure, but nondeterministic-as-barrier: stops contamination
    # threshold filters being pushed through the projection with the
    # probe substituted in (which would run the probe twice per row —
    # see the same note on text._top_bigram_count_udf)
    return probe.asNondeterministic()


def _shingle_hashes_np(th, n: int) -> np.ndarray:
    """Distinct 64-bit shingle hashes of one doc's token-hash array —
    the identical rolling combine as ``dedup._fast_minhash_udf`` (the
    two MUST stay in lockstep so 'shingle' means one thing engine-wide).
    ``th`` is the JVM-side ``xxhash64(token)`` array; returns a SORTED
    unique ``uint64`` array (``np.unique`` sorts)."""
    a = np.asarray(th, dtype=np.int64).view(np.uint64)
    h = a[: len(a) - n + 1].copy()
    for k in range(1, n):
        h = (h * _MIX_P2) ^ a[k: len(a) - n + 1 + k]
    return np.unique(_mix64_np(h))


def token_hashes_col(tokens) -> F.Column:
    """``xxhash64`` of every token, JVM-side (native HOF transform —
    no Python string ever crosses for the fast contamination path)."""
    return F.transform(tokens, lambda t: F.xxhash64(t))


def benchmark_shingle_hashes(benchmark: DataFrame, n: int = 3,
                             text_col: str = "text") -> np.ndarray:
    """The benchmark suite's distinct shingle-HASH set as a sorted
    ``uint64`` numpy array (driver-sized by nature — eval suites are
    MBs). Hashing happens where the data is: tokens are xxhash64'd in
    the JVM, rolled into shingle hashes per-row in an Arrow batch, and
    only the (tiny, distinct) hash set crosses to the driver."""
    from pyspark.sql.types import ArrayType, LongType

    from deces_dataprep_spark.functions.analyze import tokens_col

    @F.pandas_udf(ArrayType(LongType()))
    def sh_hashes(token_hashes):
        import pandas as pd

        out = []
        for th in token_hashes:
            if th is None or len(th) < n:
                out.append([])
                continue
            out.append(
                _shingle_hashes_np(th, n).view(np.int64).tolist())
        return pd.Series(out)

    rows = benchmark.select(
        F.explode(sh_hashes(token_hashes_col(tokens_col(text_col))))
        .alias("h")
    ).distinct().collect()
    return np.sort(
        np.array([r["h"] for r in rows], dtype=np.int64).view(np.uint64))


def contamination_probe_fast_udf(bench_hashes_bc, n: int):
    """The numeric scale path of :func:`contamination_probe_udf`: the
    benchmark set is a broadcast SORTED ``uint64`` hash array, the doc
    side arrives as JVM-computed token hashes, and membership is a
    vectorized ``searchsorted`` — zero Python string work anywhere.
    Same 64-bit-collision tradeoff as ``minhash_signatures_fast`` (a
    false hit needs a doc shingle to collide with one of ~10^6 bench
    hashes in a 2^64 space: ~5e-14 per shingle — noise even at 100 TB);
    the string probe stays the cross-engine-oracle default."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_t = StructType([StructField("n_shingles", LongType()),
                        StructField("n_contaminated", LongType())])

    @F.pandas_udf(out_t)
    def probe(token_hashes):
        import pandas as pd

        from deces_dataprep_spark.operators.dedup import _flat_shingle_hashes

        bh = bench_hashes_bc.value
        m = len(token_hashes)
        ns = np.zeros(m, np.int64)
        nc = np.zeros(m, np.int64)
        # the rolling shingle hashes are computed in ONE vectorized pass
        # over the WHOLE Arrow batch (shared kernel); only the per-row
        # dedupe + membership stays a loop — many 200-element sorts are
        # cheaper than one global (row, hash) lexsort (measured: the
        # batch-global sort pays O(log W) vs O(log L) per element and
        # ran ~2× slower than this shape). Counts identical to the
        # per-row fold this replaces.
        h, r, _lens = _flat_shingle_hashes(token_hashes, n)
        if h is not None:
            nb = len(bh)
            starts = np.concatenate(
                ([0], np.flatnonzero(r[1:] != r[:-1]) + 1))
            ends = np.concatenate((starts[1:], [r.size]))
            for s0, e0, i in zip(starts, ends, r[starts]):
                sl = np.sort(h[s0:e0])
                keep = np.ones(sl.size, bool)
                keep[1:] = sl[1:] != sl[:-1]
                u = sl[keep]
                ns[i] = u.size
                if nb:
                    idx = np.searchsorted(bh, u)
                    idx[idx == nb] = 0
                    nc[i] = int(np.count_nonzero(bh[idx] == u))
        return pd.DataFrame({"n_shingles": ns, "n_contaminated": nc})

    # optimizer barrier, same rationale as contamination_probe_udf
    return probe.asNondeterministic()


def contamination_report(docs: DataFrame, benchmark: DataFrame, n: int = 3,
                         text_col: str = "text", id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         tokens=None, method: str = "probe") -> DataFrame:
    """(doc_id, n_shingles, n_contaminated, contamination) per doc.

    ``contamination`` = |doc shingles ∩ benchmark shingles| / |doc
    shingles| (0.0 for docs too short to have an n-gram).

    Two value-identical plans (tested equal):

    * ``method='probe'`` (default): collect the benchmark's distinct
      shingles (eval suites are MBs), broadcast the set, and mark every
      doc ROW-LOCALLY with one Arrow-batched UDF
      (:func:`contamination_probe_udf`). Zero shuffle, zero join — the
      corpus is touched exactly once, projection-shaped. This replaced
      the explode path after it dominated the composed curation
      pipeline (~130M exploded shingle rows at 400k docs for a
      per-row quantity — the same lesson as the round-3 bigram
      rewrite).
    * ``method='join'``: the former shape — shingle explode →
      broadcast semi-probe → groupBy(doc_id) → left join back. Keeps
      the benchmark set on the JVM heap only; the escape hatch for a
      benchmark set too large to give each Python worker a copy.
    * ``method='fast'``: the numeric scale path — JVM ``xxhash64``
      token hashes → numpy rolling shingle hashes → ``searchsorted``
      membership against the broadcast sorted hash array
      (:func:`contamination_probe_fast_udf`). ~4× cheaper than the
      string probe (no Python string materializes); equal counts
      modulo 64-bit hash collisions (tested equal on real corpora).
      This is what the composed curation pipeline uses.
    """
    if method == "fast":
        spark = docs.sparkSession
        bh = benchmark_shingle_hashes(benchmark, n=n,
                                      text_col=bench_text_col)
        bc = spark.sparkContext.broadcast(bh)
        from deces_dataprep_spark.functions.analyze import tokens_col

        probe = contamination_probe_fast_udf(bc, n)
        toked = docs.select(
            F.col(id_col).alias("doc_id"),
            token_hashes_col(
                tokens if tokens is not None
                else tokens_col(text_col)).alias("__in"),
        )
        out = toked.select("doc_id", probe(F.col("__in")).alias("__c")) \
            .select("doc_id", F.col("__c.n_shingles").alias("n_shingles"),
                    F.col("__c.n_contaminated").alias("n_contaminated"))
    elif method == "probe":
        spark = docs.sparkSession
        bset = frozenset(
            r["shingle"] for r in
            benchmark_shingles(benchmark, n=n,
                               text_col=bench_text_col).collect())
        bc = spark.sparkContext.broadcast(bset)
        from deces_dataprep_spark.functions.analyze import tokens_col

        probe = contamination_probe_udf(bc, n)
        toked = docs.select(
            F.col(id_col).alias("doc_id"),
            (tokens if tokens is not None
             else tokens_col(text_col)).alias("__in"),
        )
        out = toked.select("doc_id", probe(F.col("__in")).alias("__c")) \
            .select("doc_id", F.col("__c.n_shingles").alias("n_shingles"),
                    F.col("__c.n_contaminated").alias("n_contaminated"))
    else:
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
