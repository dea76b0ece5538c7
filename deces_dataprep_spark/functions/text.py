"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All the oracle-checked variants are pure native expressions (portable to
DuckDB SQL verbatim); the rolling-hash fingerprint keeps a numpy pandas
UDF (order-sensitive fold — not SQL-portable, unit-tested instead).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from deces_dataprep_spark.functions.analyze import tokens_col

# marker vocabularies for the n-gram/stopword language-ID heuristic;
# deliberately tiny + fixed so the heuristic is oracle-expressible.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"],
    "fr": ["le", "la", "les", "de", "des", "et", "un", "une", "est", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "von"],
}
STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def marker_score(toks: Column, lang: str) -> Column:
    """# tokens that are markers of `lang` (cast long for oracle parity)."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).cast("long")


def lang_pred_col(toks: Column) -> Column:
    """argmax of marker counts with the fixed precedence en > fr > de on
    ties; 'und' (undetermined) when no marker hits. ``toks`` should be
    an already-projected tokens column (the callers below guarantee
    one tokenize pass per row)."""
    en, fr, de = (marker_score(toks, l) for l in ("en", "fr", "de"))
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), F.lit("en"))
        .when((fr >= de) & (fr > 0), F.lit("fr"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", tokens: Column | None = None) -> DataFrame:
    """(doc_id, pred_lang) — :func:`lang_pred_col` as a standalone
    operator. The tokenizer is projected ONCE and the three marker
    counts read the projected array (CollapseProject keeps the boundary
    because the alias is non-cheap and referenced 3×) — one
    regexp_replace+split pass per row instead of three. ``tokens``
    overrides the tokenizer with an existing tokens column (lets a
    composed pipeline share ONE tokenize pass across gates)."""
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        (tokens if tokens is not None
                         else tokens_col(text_col)).alias("__toks"))
    return toked.select("doc_id",
                        lang_pred_col(F.col("__toks")).alias("pred_lang"))


def quality_cols(text_col: str = "text",
                 tokens: Column | None = None) -> dict[str, Column]:
    """The quality signal expressions as an ordered name → Column map —
    the building block :func:`quality_features` and the composed
    curation pipeline share, so the definitions cannot drift."""
    from deces_dataprep_spark.functions.analyze import norm_keyword_col

    toks = tokens if tokens is not None else tokens_col(text_col)
    n_tokens = F.size(toks).cast("long")
    n_chars = F.length(F.col(text_col)).cast("long")
    # count stopword tokens with one regexp pass over the normalized
    # string (codegen'd) instead of an interpreted per-element
    # higher-order filter — same value, ~10× cheaper at scale.
    norm = norm_keyword_col(text_col)
    stop_rx = F.lit(r"\b(?:" + "|".join(STOPWORDS) + r")\b")
    n_stop = F.size(F.regexp_extract_all(norm, stop_rx, F.lit(0))).cast("long")
    n_types = F.size(F.array_distinct(toks)).cast("long")
    # sum of token lengths == count of alphanumeric chars in the text
    sum_len = F.length(
        F.regexp_replace(F.col(text_col), r"[^\p{L}\p{Nd}]+", "")
    ).cast("long")

    # every output is a rational of small integers; round half-up to 4
    # decimals in EXACT integer arithmetic — floating round() differs
    # between engines on decimal-boundary values (Spark's BigDecimal
    # HALF_UP vs DuckDB's float multiply+nearbyint disagreed on real
    # rows at sf0.1), while floor((20000·num + den) / (2·den)) / 1e4 is
    # bit-exact everywhere integers are exact.
    def ratio4(num, den):
        # integer floor-div via modulo: `/` on longs is FLOAT division,
        # whose epsilon could truncate one off; (a − a%b)/b divides
        # exactly (both < 2^53)
        a = F.lit(20000) * num + den
        b = F.lit(2) * den
        r = ((a - a % b) / b).cast("long")
        return F.when(den > 0, r.cast("double") / 10000.0).otherwise(F.lit(0.0))

    # quality = 0.4·min(nt,100)/100 + 0.3·types/nt + 0.3·min(5·stop, nt)/nt
    #         = (4·min(nt,100)·nt + 300·types·100/100... ) — exactly:
    #         (4·min(nt,100)·nt + 300·100·types/... ) reduce to /(1000·nt):
    q_num = (
        F.lit(4) * F.least(n_tokens, F.lit(100)) * n_tokens
        + F.lit(300) * n_types
        + F.lit(300) * F.least(F.lit(5) * n_stop, n_tokens)
    )
    q_den = F.lit(1000) * n_tokens
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": ratio4(sum_len, n_tokens),
        "stopword_ratio": ratio4(n_stop, n_tokens),
        "type_token_ratio": ratio4(n_types, n_tokens),
        "quality": ratio4(q_num, q_den),
    }


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     tokens: Column | None = None) -> DataFrame:
    """(doc_id, n_chars, n_tokens, avg_token_len, stopword_ratio,
    type_token_ratio, quality) — the classic web-text quality signals,
    all native expressions; `quality` is a fixed monotone combination
    rounded to 4 decimals. ``tokens`` overrides the tokenizer (shared
    tokenize pass in composed pipelines)."""
    cols = quality_cols(text_col, tokens)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, ws_tokens, alnum_tokens, bpe_ish_tokens) — whitespace
    split, analyzer tokens, and a BPE-ish regex count (runs of letters,
    runs of digits, single punctuation marks — the classic pre-tokenizer
    approximation)."""
    ws = F.size(F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")).cast("long")
    alnum = F.size(tokens_col(text_col)).cast("long")
    bpe = F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), F.lit(0)
        )
    ).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"), alnum.alias("alnum_tokens"), bpe.alias("bpe_ish_tokens"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fingerprint) — md5 of the sorted distinct analyzed tokens:
    an order-insensitive content fingerprint (the set-semantics cousin of
    the reference's UID) — portable to SQL verbatim."""
    toks = tokens_col(text_col)
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id",
                        tokens: Column | None = None) -> DataFrame:
    """(doc_id, n_lines, dup_line_frac, dup_line_char_frac,
    top_bigram_frac) — Gopher-style repetition signals for web-text
    filtering (Rae et al. 2021 §A1.1: repetitious documents are
    low-quality and over-weighted by dedup-free training).

    * ``dup_line_frac`` — fraction of non-empty lines that are repeats
      of an earlier line (``(n_lines − n_distinct) / n_lines``).
    * ``dup_line_char_frac`` — fraction of line characters inside those
      excess repeat occurrences.
    * ``top_bigram_frac`` — occurrences of the most frequent word
      2-gram / total 2-grams (the "stuck-record" signal).

    ALL metrics are row-local: one projection, no explode, no shuffle.
    The line metrics are native array expressions; the bigram multiset
    count is ONE Arrow-batched pandas UDF (:func:`_top_bigram_count_udf`
    — factorize the batch's tokens once, then a single lexsorted
    run-length pass over (row, a, b) pair codes; no per-row Python
    loop). ``total`` bigrams is just ``size(tokens) - 1``, kept native.

    History: round 2 shipped this as explode → groupBy(doc_id, bigram)
    → groupBy(doc_id) — unskewed keys so 100-TB-*safe*, but it shuffled
    every bigram (~90M rows at bench scale) for a per-row quantity and
    dominated the curation pipeline. A shuffle-free rewrite as
    array_sort + ``F.aggregate`` run-length fold was measured ~4×
    SLOWER still (interpreted HOF, per-element struct allocation); the
    Arrow pass is the fast path. All ratios rounded to 6.
    """
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (tokens if tokens is not None
         else tokens_col(text_col)).alias("__toks"),
        F.col(text_col).alias("__text"),
    )
    cols = repetition_cols("__text", F.col("__toks"))
    return base.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def repetition_cols(text_col: str, toks: Column) -> dict[str, Column]:
    """The repetition signal expressions as a name → Column map (shared
    by :func:`repetition_features` and the composed curation pipeline).
    ``toks`` must be an ALREADY-PROJECTED tokens column — the bigram
    UDF and the native size() both read it, and a raw tokenizer
    expression here would be evaluated twice per row."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda x: x != "",
    )
    n_lines = F.size(lines).cast("long")
    n_distinct = F.size(F.array_distinct(lines)).cast("long")
    all_chars = F.length(F.concat_ws("", lines)).cast("long")
    distinct_chars = F.length(F.concat_ws("", F.array_distinct(lines))).cast("long")
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_distinct).cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        all_chars > 0, (all_chars - distinct_chars).cast("double") / all_chars
    ).otherwise(F.lit(0.0))
    top_c = _top_bigram_count_udf(toks)
    total_c = F.greatest(F.size(toks) - 1, F.lit(0)).cast("long")
    top_frac = F.when(
        total_c > 0,
        F.round(top_c.cast("double") / total_c.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return {
        "n_lines": n_lines,
        "dup_line_frac": F.round(dup_line_frac, 6),
        "dup_line_char_frac": F.round(dup_char_frac, 6),
        "top_bigram_frac": top_frac,
    }


@F.pandas_udf(LongType())
def _top_bigram_count_udf(tokens: pd.Series) -> pd.Series:
    """Count of the modal word-bigram per row — one vectorized pass over
    the WHOLE Arrow batch, no per-row Python loop:

    factorize the batch's flattened tokens once (C hashing) → lexsort
    the (row, a, b) pair triples (no composite int key: ``(r*K+a)*K+b``
    would silently wrap int64 once rows·K² ≥ 2^63 — reachable on a
    batch of long high-entropy docs) → run lengths → segment max per
    row via ``np.maximum.at``. The same batched-numpy shape as the
    dedup fast path (`dedup.minhash_signatures_fast`)."""
    n = len(tokens)
    out = np.zeros(n, np.int64)
    if n == 0:
        return pd.Series(out)
    vals = [np.asarray(v if v is not None else [], dtype=object)
            for v in tokens]
    lens = np.fromiter((len(v) for v in vals), np.int64, n)
    if int(lens.sum()) == 0:
        return pd.Series(out)
    flat = np.concatenate(vals)
    codes, _uniq = pd.factorize(flat)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    same_row = rows[:-1] == rows[1:]
    if not same_row.any():
        return pd.Series(out)
    a = codes[:-1][same_row].astype(np.int64)
    b = codes[1:][same_row].astype(np.int64)
    r = rows[:-1][same_row]
    order = np.lexsort((b, a, r))
    a, b, r = a[order], b[order], r[order]
    change = (r[1:] != r[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    counts = np.diff(np.append(starts, r.size))
    np.maximum.at(out, r[starts], counts)
    return pd.Series(out)


# The UDF is pure, but asNondeterministic() is load-bearing as an
# OPTIMIZER BARRIER: a filter on a column derived from this UDF would
# otherwise be pushed through the projection by substituting the full
# UDF call into the predicate — Catalyst plans a SECOND ArrowEvalPython
# node and every gated row pays the kernel twice (measured 2× on the
# composed curation pipeline). Nondeterministic expressions cannot be
# substituted into pushed predicates, so the filter stays above the
# projection and the kernel runs once. Values are unchanged.
_top_bigram_count_udf = _top_bigram_count_udf.asNondeterministic()


@F.pandas_udf(LongType())
def rolling_hash_udf(tokens: pd.Series) -> pd.Series:
    """Order-sensitive polynomial rolling hash over the token stream
    (base 1000003, 63-bit) — numpy-accumulated per row; the
    order-sensitive counterpart of doc_fingerprint (unit-tested; not
    SQL-portable by design)."""
    import zlib

    MOD = (1 << 61) - 1
    BASE = 1000003
    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        h = 0
        if toks is not None:
            for t in toks:
                # crc32: deterministic across processes (python's built-in
                # str hash is salted per interpreter — never use it here)
                th = zlib.crc32(t.encode()) & 0x7FFFFFFF
                h = (h * BASE + th) % MOD
        out[i] = h
    return pd.Series(out)
