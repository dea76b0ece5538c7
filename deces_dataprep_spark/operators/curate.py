"""The composed training-data curation pipeline — the operators of this
engine chained into the one plan a 100-TB pretraining prep actually
runs: quality gate → repetition gate → language gate → benchmark
decontamination → exact dedup (keep the min-doc_id copy).

Each gate reuses the exact expression definitions of an
already-oracle-checked operator (quality_base_cols/quality_ratio_cols,
top_bigram_frac_cols, marker_score/lang_pred_from_counts,
contamination_probe_fast_udf, exact_dup_groups); the composition
matters because four of the five gates are per-row and collapse into
ONE layered projection chain over a single tokenize — no gate joins,
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

    Plan shape (round 6): four of the five gates are PER-ROW functions
    of (text, tokens), computed over a single shared tokenize as a
    LAYERED projection chain — tokenize once → the non-trivial array
    expressions once each (array_distinct, the JVM token hashes that
    feed ALL THREE Arrow kernels) → one ArrowEvalPython node evaluating
    the bigram kernel, the broadcast contamination probe AND the
    marker-count kernel together → the cheap ratio/argmax layer.
    Layering matters: the earlier single-projection shape re-evaluated
    the tokenizer and the marker counts many times per row, because
    codegen subexpression elimination cannot unify two higher-order-
    function trees (fresh lambda variable ids — see functions/text.py
    module docstring). The marker counts ride the Arrow pass over the
    token hashes (text.marker_counts_fast_udf) instead of interpreted
    membership HOFs — value-identical incl. nulls (parity-tested),
    modulo the same 64-bit hash-collision tradeoff the contamination
    probe in the same node already makes. ``n_stop`` for the quality
    gate is ``__mk.en+__mk.fr+__mk.de`` (the marker lists are pairwise
    disjoint), so the language gate's counts are reused with zero
    extra passes. No joins between gates at all; the only remaining
    shuffles are exact dedup's groupBy(content_hash) and its keeper
    semi-join — irreducible (cross-row semantics).

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
        lang_pred_from_counts,
        quality_base_cols,
        quality_ratio_cols,
    )
    from deces_dataprep_spark.operators.decontam import (
        benchmark_shingle_hashes,
        contamination_probe_fast_udf,
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

    # layer 2: every non-trivial FULL-array expression exactly once —
    # n_stop is deliberately absent (it is __en+__fr+__de, see above).
    # No stopword sub-array either (round 6, third pass): the marker
    # counts ride the Arrow kernel pass over the SAME projected token
    # hashes the bigram/contamination kernels read
    # (text.marker_counts_fast_udf — searchsorted against the JVM
    # xxhash64 of the 30 marker words), so the interpreted full-array
    # membership HOF and the three sub-array passes are gone from this
    # plan entirely. Counts are value-identical incl. null semantics
    # (parity-tested) modulo 64-bit hash collisions — the tradeoff the
    # fast contamination probe in the SAME node already makes.
    qb = quality_base_cols("text", t, n_stop=F.lit(0))
    l2 = toked.select(
        "doc_id",
        qb["n_chars"].alias("__n_chars"),
        qb["n_tokens"].alias("__n_tokens"),
        qb["n_types"].alias("__n_types"),
        qb["sum_len"].alias("__sum_len"),
        F.transform(t, lambda x: F.xxhash64(x)).alias("__th"),
    )
    # layer 3: the three Arrow kernels read the SAME projected hash
    # column and land in one ArrowEvalPython node (one Python pass)
    from deces_dataprep_spark.functions.text import (
        _top_bigram_count_udf,
        marker_counts_fast_udf,
        marker_hashes,
    )

    mk = marker_counts_fast_udf(marker_hashes(docs.sparkSession))
    l3 = l2.select(
        "doc_id", "__n_chars", "__n_tokens", "__n_types", "__sum_len",
        mk(F.col("__th")).alias("__mk"),
        _top_bigram_count_udf(F.col("__th")).alias("__top_c"),
        probe(F.col("__th")).alias("__c"),
    )
    # layer 4: cheap arithmetic over attributes only (struct-field
    # reads of the projected __mk are free — no kernel re-evaluation,
    # pinned by the nondeterministic barrier)
    n_stop = (F.col("__mk.en") + F.col("__mk.fr") + F.col("__mk.de"))
    quality = quality_ratio_cols(
        F.col("__n_chars"), F.col("__n_tokens"), n_stop,
        F.col("__n_types"), F.col("__sum_len"))["quality"]
    total_c = F.greatest(F.col("__n_tokens") - 1, F.lit(0))
    top_frac = F.when(
        total_c > 0,
        F.round(F.col("__top_c").cast("double") / total_c.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    feat = l3.select(
        "doc_id",
        quality.alias("quality"),
        top_frac.alias("top_bigram_frac"),
        lang_pred_from_counts(F.col("__mk.en"), F.col("__mk.fr"),
                              F.col("__mk.de")).alias("pred_lang"),
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
    # through the feature projections with the full gate expressions
    # substituted in, re-evaluating them per gate. As a single predicate
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
