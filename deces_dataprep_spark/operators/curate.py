"""The composed training-data curation pipeline — the operators of this
engine chained into the one plan a 100-TB pretraining prep actually
runs: quality gate → repetition gate → language gate → benchmark
decontamination → exact dedup (keep the min-doc_id copy).

Each gate reuses the exact expression definitions of an
already-oracle-checked operator (quality_cols, repetition_cols,
lang_pred_col, contamination_probe_fast_udf, exact_dup_groups); the
composition matters because four of the five gates are per-row and
collapse into ONE projection over a single tokenize — no gate joins,
no corpus-sized shuffle. Only exact dedup shuffles (content-hash
groupBy + keeper semi-join, irreducible cross-row semantics). Nothing
corpus-sized crosses the driver.

This is the engine's answer to "could a user run their whole prep on
it": the same composition the reference runs as ~40 sequential recipe
steps into ES, here as one declarative DataFrame program.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deces_dataprep_spark.operators.dedup import exact_dup_groups


@dataclass
class CurationResult:
    """``curate(persist_tokens=True)`` return value: the curated frame
    plus an explicit handle on the persisted tokenized projection, so
    the cache block cannot be orphaned by a DataFrame transformation
    (an ad-hoc attribute on the DataFrame would be silently lost the
    moment the caller applies ``.select``/``.filter``)."""

    df: DataFrame
    tokens: DataFrame

    def unpersist_tokens(self) -> None:
        self.tokens.unpersist()


def curate(
    docs: DataFrame,
    benchmark: DataFrame,
    min_quality: float = 0.3,
    max_top_bigram_frac: float = 0.5,
    allowed_langs: tuple[str, ...] = ("en", "fr"),
    max_contamination: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_tokens: bool = False,
) -> DataFrame | CurationResult:
    """(doc_id, quality, top_bigram_frac, pred_lang, contamination) for
    every doc that survives all five gates. Deterministic: every gate is
    a pure function of the doc (+ the fixed benchmark set), and the
    dedup keeper is min(doc_id) per content hash.

    Plan shape (round 4): four of the five gates are PER-ROW functions
    of (text, tokens), so they are computed in ONE projection over a
    single shared tokenize — native quality/repetition/lang expressions
    (`quality_cols` / `repetition_cols` / `lang_pred_col`) plus the
    row-local broadcast contamination probe — the numeric hash path,
    :func:`contamination_probe_fast_udf` (JVM xxhash64 tokens, numpy
    rolling shingle hashes, searchsorted membership; no Python string
    ever materializes). No joins between gates at all;
    the earlier one-DataFrame-per-gate composition paid 3 doc_id joins
    and a corpus-sized shingle explode for quantities derivable in
    place. The only remaining shuffles are exact dedup's
    groupBy(content_hash) and its keeper semi-join — irreducible
    (cross-row semantics).

    ``persist_tokens``: the dedup branch re-scans the input (its
    aggregation tree is separate from the projection); persisting the
    tokenized projection makes that second pass read the cache instead.
    Default False — at 100 TB a corpus-sized cache is a liability, and
    the dedup branch only re-reads (doc_id, text). Returns a
    :class:`CurationResult` carrying the curated frame AND the persisted
    projection — the CALLER owns ``unpersist_tokens()`` after
    materializing the result (the plan is lazy, so curate cannot do it
    here without evicting the cache before it is ever read)."""
    from pyspark import StorageLevel

    from deces_dataprep_spark.functions.analyze import tokens_col
    from deces_dataprep_spark.functions.text import (
        lang_pred_col,
        quality_cols,
        repetition_cols,
    )
    from deces_dataprep_spark.operators.decontam import (
        benchmark_shingle_hashes,
        contamination_probe_fast_udf,
        token_hashes_col,
    )

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        tokens_col(text_col).alias("__toks"),
    )
    if persist_tokens:
        toked = toked.persist(StorageLevel.MEMORY_AND_DISK)
    t = F.col("__toks")
    bh = benchmark_shingle_hashes(benchmark, n=shingle_n)
    probe = contamination_probe_fast_udf(
        docs.sparkSession.sparkContext.broadcast(bh), shingle_n)
    feat = toked.select(
        "doc_id",
        quality_cols("text", t)["quality"].alias("quality"),
        repetition_cols("text", t)["top_bigram_frac"]
        .alias("top_bigram_frac"),
        lang_pred_col(t).alias("pred_lang"),
        probe(token_hashes_col(t)).alias("__c"),
    ).select(
        "doc_id", "quality", "top_bigram_frac", "pred_lang",
        F.round(
            F.when(F.col("__c.n_shingles") > 0,
                   F.col("__c.n_contaminated").cast("double")
                   / F.col("__c.n_shingles").cast("double"))
            .otherwise(F.lit(0.0)), 6).alias("contamination"),
    )
    keepers = exact_dup_groups(toked, "text", "doc_id").select(
        F.col("keeper_doc_id").alias("doc_id"))
    # The four gates are ONE conjunct on purpose: split conjuncts on
    # the native gate columns (quality, pred_lang) would be pushed
    # through the feature projection with the full tokenize expression
    # substituted in, re-evaluating it per gate. As a single predicate
    # that also references the (nondeterministic-marked) UDF columns,
    # pushdown is refused wholesale and every feature is computed
    # exactly once per row.
    keep = (
        (F.col("quality") >= min_quality)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
        & F.col("pred_lang").isin(*allowed_langs)
        & (F.col("contamination") <= max_contamination)
    )
    out = feat.join(keepers, "doc_id", "left_semi").filter(keep)
    if persist_tokens:
        return CurationResult(df=out, tokens=toked)
    return out
