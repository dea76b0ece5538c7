"""Text-analysis functions for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All the oracle-checked variants are pure native expressions (portable to
DuckDB SQL verbatim); the rolling-hash fingerprint keeps a numpy pandas
UDF (order-sensitive fold — not SQL-portable, unit-tested instead).

Plan-shape note (round 6): every non-trivial expression (the tokenizer,
the stopword filter, ``array_distinct``, the marker counts) is projected
EXACTLY ONCE behind an alias and every later layer references the
attribute. Catalyst's whole-stage-codegen subexpression elimination
cannot unify two copies of a higher-order function (each lambda gets a
fresh variable id, so the trees never compare equal), so the earlier
single-projection shape re-evaluated the full tokenize ~15× per row
(measured 17.1 s for quality_features at 400k docs vs ~4 s for the sum
of its parts). Layered projections with non-cheap, multi-referenced
aliases are exactly the boundary CollapseProject refuses to collapse,
so each signal is computed once per row.
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
# the three marker lists are pairwise disjoint (load-bearing: it makes
# n_stop == en + fr + de, which the composed pipelines exploit to count
# stopwords with zero extra passes)
assert len(STOPWORDS) == sum(len(ws) for ws in LANG_MARKERS.values())


def marker_score(toks: Column, lang: str) -> Column:
    """# tokens that are markers of `lang` (cast long for oracle parity).
    ``toks`` should be an already-projected attribute (the expression is
    referenced once per marker count, but the count columns themselves
    must be projected before the argmax reads them — see lang_id)."""
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t))).cast("long")


def lang_pred_from_counts(en: Column, fr: Column, de: Column) -> Column:
    """argmax of ALREADY-PROJECTED marker counts with the fixed
    precedence en > fr > de on ties; 'und' when no marker hits. The
    when-chain references each count up to 3× — hand it attributes, not
    the marker_score expressions (which would re-run the interpreted
    HOF filter per reference)."""
    return (
        F.when((en >= fr) & (en >= de) & (en > 0), F.lit("en"))
        .when((fr >= de) & (fr > 0), F.lit("fr"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def lang_pred_col(toks: Column) -> Column:
    """argmax of marker counts — single-expression form, kept for
    ad-hoc use. The when-chain evaluates each marker count up to 3×;
    the hot paths (lang_id, curate) project the counts once and use
    :func:`lang_pred_from_counts` instead."""
    en, fr, de = (marker_score(toks, l) for l in ("en", "fr", "de"))
    return lang_pred_from_counts(en, fr, de)


def stop_tokens_col(toks: Column) -> Column:
    """The sub-array of marker/stopword tokens (order and multiplicity
    preserved) — ONE membership pass over the full token array. The
    per-language marker counts then run over THIS (short) array instead
    of the full one: since every marker is a stopword, ``marker_score``
    over the filtered array equals ``marker_score`` over the original
    (filter keeps duplicates), but the three per-language passes touch
    ~10-25% of the elements (web text's stopword fraction) instead of
    3× the whole array — measured ~2× fewer interpreted-lambda
    invocations on the lang_id plan."""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.filter(toks, lambda t: F.array_contains(stop_arr, t))


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id", tokens: Column | None = None) -> DataFrame:
    """(doc_id, pred_lang) — layered plan: tokenize once → project the
    stopword sub-array once (one full-array pass) → the three marker
    counts over the short sub-array → argmax over the count attributes.
    ``tokens`` overrides the tokenizer with an existing tokens column
    (lets a composed pipeline share ONE tokenize pass across gates)."""
    toked = docs.select(F.col(id_col).alias("doc_id"),
                        (tokens if tokens is not None
                         else tokens_col(text_col)).alias("__toks"))
    stopped = toked.select(
        "doc_id", stop_tokens_col(F.col("__toks")).alias("__stop"))
    counts = stopped.select(
        "doc_id",
        *[marker_score(F.col("__stop"), l).alias(f"__{l}")
          for l in ("en", "fr", "de")],
    )
    return counts.select(
        "doc_id",
        lang_pred_from_counts(
            F.col("__en"), F.col("__fr"), F.col("__de")).alias("pred_lang"),
    )


def n_stop_col(toks: Column) -> Column:
    """# stopword tokens: ONE interpreted-HOF pass over the (projected)
    token array against the 30-word marker union — the same membership
    count as the DuckDB oracle's ``list_filter(tokens, list_contains)``.
    (The previous regexp_extract_all over the normalized string computed
    the identical value but paid a full normalize regex pass plus a
    30-alternation scan of the text — measured 2.6 s vs ~0.9 s for this
    at 400k docs.)"""
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")


def quality_base_cols(text_col: str, toks: Column,
                      n_stop: Column | None = None) -> dict[str, Column]:
    """The INTEGER quality signals as an ordered name → Column map —
    one non-trivial expression each, meant to be projected in a single
    select so the ratio layer reads attributes. ``toks`` must be an
    already-projected tokens attribute. ``n_stop`` overrides the
    stopword count (the composed pipeline passes ``__en+__fr+__de`` —
    identical by marker-list disjointness — to reuse the lang gate's
    counts instead of a fourth array pass)."""
    return {
        "n_chars": F.length(F.col(text_col)).cast("long"),
        "n_tokens": F.size(toks).cast("long"),
        "n_stop": n_stop if n_stop is not None else n_stop_col(toks),
        "n_types": F.size(F.array_distinct(toks)).cast("long"),
        # sum of token lengths == count of alphanumeric chars in the
        # text; array_join over the projected tokens is a buffer concat,
        # vs the former regexp_replace strip = a second full regex pass
        "sum_len": F.length(F.array_join(toks, "")).cast("long"),
    }


def ratio4(num: Column, den: Column) -> Column:
    """Round-half-up to 4 decimals in EXACT integer arithmetic —
    floating round() differs between engines on decimal-boundary values
    (Spark's BigDecimal HALF_UP vs DuckDB's float multiply+nearbyint
    disagreed on real rows at sf0.1), while
    floor((20000·num + den) / (2·den)) / 1e4 is bit-exact everywhere
    integers are exact. Integer floor-div via modulo: `/` on longs is
    FLOAT division, whose epsilon could truncate one off; (a − a%b)/b
    divides exactly (both < 2^53). Hand this ATTRIBUTES — num/den are
    referenced up to 4×."""
    a = F.lit(20000) * num + den
    b = F.lit(2) * den
    r = ((a - a % b) / b).cast("long")
    return F.when(den > 0, r.cast("double") / 10000.0).otherwise(F.lit(0.0))


def quality_ratio_cols(n_chars: Column, n_tokens: Column, n_stop: Column,
                       n_types: Column, sum_len: Column) -> dict[str, Column]:
    """The public quality columns from PROJECTED integer attributes.
    Every output is a rational of small integers, rounded half-up to 4
    decimals in exact integer arithmetic (see :func:`ratio4`)."""
    # quality = 0.4·min(nt,100)/100 + 0.3·types/nt + 0.3·min(5·stop, nt)/nt
    #         reduced to a single rational with denominator 1000·nt:
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
    rounded to 4 decimals. Layered plan: tokenize once → integer bases
    once → ratios over attributes (see module docstring). ``tokens``
    overrides the tokenizer (shared tokenize pass in composed
    pipelines)."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("__text"),
        (tokens if tokens is not None
         else tokens_col(text_col)).alias("__toks"),
    )
    base = toked.select(
        "doc_id",
        *[c.alias(n) for n, c in
          quality_base_cols("__text", F.col("__toks")).items()],
    )
    cols = quality_ratio_cols(F.col("n_chars"), F.col("n_tokens"),
                              F.col("n_stop"), F.col("n_types"),
                              F.col("sum_len"))
    return base.select(
        "doc_id",
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

    ALL metrics are row-local: layered projections, no explode, no
    shuffle. The line metrics are native array expressions (each
    non-trivial array projected once — see module docstring); the
    bigram multiset count is ONE Arrow-batched pandas UDF over
    JVM-side ``xxhash64`` token hashes (:func:`_top_bigram_count_udf` —
    int64 Arrow transfer, no Python string ever materializes).
    ``total`` bigrams is just ``size(tokens) - 1``, kept native.

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
    return _repetition_layers(
        base, "__text",
        _top_bigram_count_udf(_token_hashes(F.col("__toks"))),
        F.greatest(F.size(F.col("__toks")) - 1, F.lit(0)).cast("long"),
        ["doc_id"],
    )


def _token_hashes(toks: Column) -> Column:
    """JVM-side ``xxhash64`` per token — the int64 feed of the bigram
    kernel (identical modal counts modulo 64-bit hash collisions,
    ~(L²/2)/2^64 per doc ≈ 10^-15 at 225 tokens — the same tradeoff the
    dedup/decontam fast paths already make)."""
    return F.transform(toks, lambda t: F.xxhash64(t))


def _repetition_layers(base: DataFrame, text_col: str, top_c: Column,
                       total_c: Column, carry: list[str]) -> DataFrame:
    """The layered line-metric plan over an already-projected base:
    lines → distinct lines → sizes/lengths → ratios. ``top_c`` /
    ``total_c`` are the bigram numerator/denominator expressions
    (computed in the first layer alongside ``__lines``); ``carry`` is
    the id column list to thread through."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), F.trim),
        lambda x: x != "",
    )
    l1 = base.select(
        *carry,
        lines.alias("__lines"),
        top_c.alias("__top_c"),
        total_c.alias("__total_c"),
    )
    l2 = l1.select(
        *carry,
        "__lines", "__top_c", "__total_c",
        F.array_distinct(F.col("__lines")).alias("__dlines"),
    )
    l3 = l2.select(
        *carry,
        "__top_c", "__total_c",
        F.size(F.col("__lines")).cast("long").alias("n_lines"),
        F.size(F.col("__dlines")).cast("long").alias("__n_distinct"),
        F.length(F.concat_ws("", F.col("__lines"))).cast("long")
        .alias("__all_chars"),
        F.length(F.concat_ws("", F.col("__dlines"))).cast("long")
        .alias("__distinct_chars"),
    )
    n_lines = F.col("n_lines")
    n_distinct = F.col("__n_distinct")
    all_chars = F.col("__all_chars")
    distinct_chars = F.col("__distinct_chars")
    dup_line_frac = F.when(
        n_lines > 0, (n_lines - n_distinct).cast("double") / n_lines
    ).otherwise(F.lit(0.0))
    dup_char_frac = F.when(
        all_chars > 0, (all_chars - distinct_chars).cast("double") / all_chars
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        F.col("__total_c") > 0,
        F.round(F.col("__top_c").cast("double")
                / F.col("__total_c").cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return l3.select(
        *carry,
        n_lines,
        F.round(dup_line_frac, 6).alias("dup_line_frac"),
        F.round(dup_char_frac, 6).alias("dup_line_char_frac"),
        top_frac.alias("top_bigram_frac"),
    )


def marker_hashes(spark) -> dict[str, np.ndarray]:
    """xxhash64 of every LANG_MARKERS word, per language, as SORTED
    int64 arrays — the numeric twin of the marker vocabularies for
    kernels that already hold JVM ``xxhash64(token)`` values. Computed
    by the JVM itself (one single-row job — the hash must be bit-equal
    to ``F.xxhash64``, so no Python reimplementation) and memoized on
    the SparkSession (constants of the session's hash function, not
    query results)."""
    mh = getattr(spark, "_dds_marker_hashes", None)
    if mh is None:
        words = [(lang, w) for lang in LANG_MARKERS
                 for w in LANG_MARKERS[lang]]
        row = spark.range(1).select(
            *[F.xxhash64(F.lit(w)).alias(f"h{i}")
              for i, (_, w) in enumerate(words)]
        ).collect()[0]
        mh = {}
        for i, (lang, _) in enumerate(words):
            mh.setdefault(lang, []).append(row[f"h{i}"])
        mh = {lang: np.sort(np.array(v, dtype=np.int64))
              for lang, v in mh.items()}
        spark._dds_marker_hashes = mh
    return mh


def marker_counts_fast_udf(mh: dict[str, np.ndarray]):
    """Per-language marker counts over JVM ``xxhash64(token)`` arrays —
    one vectorized searchsorted + bincount pass per Arrow batch. The
    numeric twin of ``marker_score(stop_tokens_col(toks), lang)`` for
    pipelines that ALREADY ship token hashes to an ArrowEvalPython node
    (curate): the counts ride the existing Python pass, replacing the
    interpreted full-array stopword-membership HOF plus three sub-array
    passes. Value-identical incl. null semantics (null tokens → null
    counts, matching ``size(filter(null))``; parity-tested) modulo
    64-bit token-hash collisions — the same accepted tradeoff as the
    fast dedup/decontam paths (~L·30/2^64 per doc ≈ 1e-15)."""
    from pyspark.sql.types import StructField, StructType

    out_t = StructType([StructField("en", LongType()),
                        StructField("fr", LongType()),
                        StructField("de", LongType())])

    @F.pandas_udf(out_t)
    def counts(token_hashes: pd.Series) -> pd.Series:
        m = len(token_hashes)
        res = {lang: np.zeros(m, np.int64) for lang in ("en", "fr", "de")}
        isnull = np.zeros(m, bool)
        vals = []
        lens = np.empty(m, np.int64)
        for i, v in enumerate(token_hashes):
            if v is None:
                isnull[i] = True
                lens[i] = 0
                continue
            a = np.asarray(v, dtype=np.int64)
            vals.append(a)
            lens[i] = len(a)
        if vals:
            flat = np.concatenate(vals)
            rows = np.repeat(np.arange(m, dtype=np.int64), lens)
            for lang in ("en", "fr", "de"):
                hset = mh[lang]
                idx = np.searchsorted(hset, flat)
                idx[idx == len(hset)] = 0
                hit = hset[idx] == flat
                if hit.any():
                    res[lang] += np.bincount(
                        rows[hit], minlength=m).astype(np.int64)
        df = pd.DataFrame({lang: pd.array(res[lang], dtype="Int64")
                           for lang in ("en", "fr", "de")})
        for lang in ("en", "fr", "de"):
            df.loc[isnull, lang] = pd.NA
        return df

    # optimizer barrier, same rationale as _top_bigram_count_udf below
    return counts.asNondeterministic()


#: packed-key sort is safe while rows·K² stays below this (int64 head
#: room); tests patch it to 0 to force the lexsort fallback.
_BIGRAM_PACK_LIMIT = 1 << 62


def top_bigram_frac_cols(toks: Column) -> tuple[Column, Column]:
    """(top_c, total_c) for the stuck-record signal over a PROJECTED
    tokens attribute — the building block the composed curation
    pipeline shares with :func:`repetition_features`; callers project
    both and compute ``round(top_c / total_c, 6)`` from the
    attributes."""
    return (
        _top_bigram_count_udf(_token_hashes(toks)),
        F.greatest(F.size(toks) - 1, F.lit(0)).cast("long"),
    )


@F.pandas_udf(LongType())
def _top_bigram_count_udf(token_hashes: pd.Series) -> pd.Series:
    """Count of the modal word-bigram per row — one vectorized pass over
    the WHOLE Arrow batch, no per-row Python loop. Input is the JVM
    ``xxhash64`` per token (int64 Arrow transfer — the earlier string
    input paid a Python-object materialization plus object-dtype
    factorize per batch, measured ~2× the whole kernel).

    factorize the batch's flattened token hashes once (C int hashing) →
    order the (row, a, b) pair triples → run lengths → segment max per
    row via ``np.maximum.at``. When ``rows·K²`` fits int64 the triple
    is packed into ONE int64 key and sorted with a single ``np.sort``
    (~3× cheaper than the general 3-key lexsort); the lexsort fallback
    guards the unbounded case (``(r*K+a)*K+b`` would silently wrap
    int64 once rows·K² ≥ 2^62 — reachable on a batch of long
    high-entropy docs)."""
    n = len(token_hashes)
    out = np.zeros(n, np.int64)
    if n == 0:
        return pd.Series(out)
    vals = [np.asarray(v if v is not None else [], dtype=np.int64)
            for v in token_hashes]
    lens = np.fromiter((len(v) for v in vals), np.int64, n)
    if int(lens.sum()) == 0:
        return pd.Series(out)
    flat = np.concatenate(vals)
    codes, uniq = pd.factorize(flat)
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    same_row = rows[:-1] == rows[1:]
    if not same_row.any():
        return pd.Series(out)
    a = codes[:-1][same_row].astype(np.int64)
    b = codes[1:][same_row].astype(np.int64)
    r = rows[:-1][same_row]
    k = np.int64(len(uniq))
    if int(n) * int(k) * int(k) < _BIGRAM_PACK_LIMIT:  # py ints: no wrap
        key = (r * k + a) * k + b
        key.sort(kind="stable")
        change = key[1:] != key[:-1]
        r_sorted = key // (k * k)
    else:
        order = np.lexsort((b, a, r))
        a, b, r_sorted = a[order], b[order], r[order]
        change = (r_sorted[1:] != r_sorted[:-1]) | (a[1:] != a[:-1]) \
            | (b[1:] != b[:-1])
    starts = np.concatenate(([0], np.flatnonzero(change) + 1))
    counts = np.diff(np.append(starts, r_sorted.size))
    np.maximum.at(out, r_sorted[starts], counts)
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
