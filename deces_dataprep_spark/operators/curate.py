"""The composed training-data curation pipeline — the operators of this
engine chained into the one plan a 100-TB pretraining prep actually
runs: quality gate → repetition gate → language gate → benchmark
decontamination → exact dedup (keep the min-doc_id copy).

Each stage is an already-oracle-checked operator (quality_features,
repetition_features, lang_id, contamination_report, exact_dup_groups);
the composition matters because Catalyst plans it as ONE job: the
per-doc feature joins are all on ``doc_id`` (co-partitioned after the
first shuffle — AQE coalesces), the benchmark set broadcasts, and the
dedup keeper set is a semi join. Nothing corpus-sized crosses the
driver.

This is the engine's answer to "could a user run their whole prep on
it": the same composition the reference runs as ~40 sequential recipe
steps into ES, here as one declarative DataFrame program.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deces_dataprep_spark.functions.text import (
    lang_id,
    quality_features,
    repetition_features,
)
from deces_dataprep_spark.operators.decontam import contamination_report
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

    All five gates read one shared tokenized projection (``tokens=``
    hooks on the component operators), so a branch that is persisted
    never re-tokenizes. Measured at bench scale (400k docs, local[32])
    persisting the projection is COST-NEUTRAL — the explode aggregations
    dominate, and the codegen'd tokenizer recompute per branch is as
    cheap as reading the cache — so ``persist_tokens`` defaults to
    False (at 100 TB a corpus-sized cache is a liability, not a win;
    flip it on clusters with memory to spare and more gates). With
    ``persist_tokens`` the return value is a :class:`CurationResult`
    carrying the curated frame AND the persisted projection — the
    CALLER owns calling ``unpersist_tokens()`` after materializing the
    result (the plan is lazy, so curate cannot do it here without
    evicting the cache before it is ever read)."""
    from pyspark import StorageLevel

    from deces_dataprep_spark.functions.analyze import tokens_col

    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        tokens_col(text_col).alias("__toks"),
    )
    if persist_tokens:
        toked = toked.persist(StorageLevel.MEMORY_AND_DISK)
    t = F.col("__toks")
    q = quality_features(toked, "text", "doc_id", tokens=t).select(
        "doc_id", "quality")
    r = repetition_features(toked, "text", "doc_id", tokens=t).select(
        "doc_id", "top_bigram_frac")
    lang = lang_id(toked, "text", "doc_id", tokens=t)
    c = contamination_report(toked, benchmark, n=shingle_n,
                             text_col="text", id_col="doc_id",
                             tokens=t).select("doc_id", "contamination")
    keepers = exact_dup_groups(toked, "text", "doc_id").select(
        F.col("keeper_doc_id").alias("doc_id"))
    out = (
        q.join(r, "doc_id").join(lang, "doc_id").join(c, "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .filter(
            (F.col("quality") >= min_quality)
            & (F.col("top_bigram_frac") <= max_top_bigram_frac)
            & F.col("pred_lang").isin(*allowed_langs)
            & (F.col("contamination") <= max_contamination)
        )
        .select("doc_id", "quality", "top_bigram_frac", "pred_lang",
                "contamination")
    )
    if persist_tokens:
        return CurationResult(df=out, tokens=toked)
    return out
