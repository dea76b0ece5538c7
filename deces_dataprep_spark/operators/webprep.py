"""Web-corpus preparation operators for LLM training-data pipelines.

Not present in the reference (deces-dataprep stops at clean → index);
these are the steps a 100-TB Common-Crawl-style corpus needs between
the raw scrape and the tokenizer, each expressed as native Catalyst
columns (regex/hash/window — no per-row Python) so they fuse into the
same whole-stage-codegen pass as the quality/langid gates:

* PII redaction — email / IPv4 / phone masking with per-doc counts
  (the standard pre-release scrub; patterns stay in the portable
  Java∩RE2 regex subset so the DuckDB oracle runs the SAME strings);
* URL → host / registered-domain extraction (per-domain policy and
  stats need the domain as a first-class column);
* deterministic mixture sampling — per-domain keep-fractions resolved
  by a splitmix64 hash of doc_id, so the sample is reproducible
  run-to-run, executor-count-independent, and exactly oracle-checkable
  (``Spark .sample()`` is none of those);
* sequence packing — the concat-and-chunk layout GPT-style training
  uses (global token stream cut every ``max_tokens``), as a window
  cumsum; plus a no-split greedy first-fit packer per bucket for the
  every-doc-intact variant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# (name, pattern, replacement) — applied IN ORDER on the progressively
# redacted text (emails first: an address would otherwise be half-eaten
# by the phone pattern; IPv4 before phone for the same reason). Every
# pattern is in the Java∩RE2 portable subset — the oracle runs the
# identical strings under DuckDB's RE2.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-. ]{6,}[0-9]", "<PHONE>"),
]


def pii_redact(docs: DataFrame, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Mask emails, IPv4 addresses, and phone-shaped digit runs —
    ``(doc_id, text_redacted, n_email, n_ip, n_phone)``. Counts are
    taken on the SAME intermediate string each replace sees, so
    ``n_x`` is exactly the number of substitutions made (an email's
    digits can no longer double-count as a phone). Three chained
    ``regexp_replace``/``regexp_count`` pairs — one codegen'd
    projection, no shuffle, no UDF."""
    cur = F.col(text_col)
    out = docs.select(F.col(id_col).alias("doc_id"), cur.alias("_t0"))
    counts = []
    for i, (name, pat, rep) in enumerate(PII_PATTERNS):
        out = out.withColumn(f"n_{name}",
                             F.regexp_count(F.col(f"_t{i}"), F.lit(pat))
                             .cast("long"))
        out = out.withColumn(f"_t{i + 1}",
                             F.regexp_replace(F.col(f"_t{i}"), pat, rep))
        counts.append(f"n_{name}")
    last = f"_t{len(PII_PATTERNS)}"
    return out.select("doc_id", F.col(last).alias("text_redacted"), *counts)


def duckdb_pii_redact_sql(table: str = "documents",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB oracle for :func:`pii_redact` — identical pattern strings,
    global-flag replaces, counts via ``regexp_extract_all`` length."""
    cur = text_col
    cols = []
    for name, pat, rep in PII_PATTERNS:
        esc = pat.replace("'", "''")
        cols.append(
            f"len(regexp_extract_all({cur}, '{esc}'))::BIGINT AS n_{name}")
        cur = f"regexp_replace({cur}, '{esc}', '{rep}', 'g')"
    return f"""
SELECT {id_col} AS doc_id, {cur} AS text_redacted, {", ".join(cols)}
FROM {table}
"""


# ---------------------------------------------------------------------------
# URL → host / registered domain
# ---------------------------------------------------------------------------

_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]+)"


def host_col(url) -> "F.Column":
    """Lowercased host from an absolute URL (scheme required, userinfo
    and port stripped) — empty string if the value doesn't parse. One
    ``regexp_extract``; the identical pattern drives the oracle."""
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(u, _HOST_RE, 1))


def registered_domain_col(host) -> "F.Column":
    """Last two DNS labels of a host ("news.bbc.co.uk" → "co.uk" —
    a deliberate approximation: the real public-suffix list is a data
    file, not logic; swap it in by broadcast-joining a suffix table).
    Hosts without a dot pass through unchanged."""
    h = F.col(host) if isinstance(host, str) else host
    two = F.regexp_extract(h, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", h).otherwise(two)


def with_domain(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``host`` and ``domain`` columns — the per-domain policy keys
    every downstream gate (mixture weights, blocklists, stats) joins
    on."""
    return docs.withColumn("host", host_col(url_col)) \
        .withColumn("domain", registered_domain_col(F.col("host")))


def duckdb_domain_sql(url_expr: str) -> tuple[str, str]:
    """(host_sql, domain_sql) oracle twins of :func:`host_col` /
    :func:`registered_domain_col` over a SQL url expression."""
    host = f"lower(regexp_extract({url_expr}, '{_HOST_RE}', 1))"
    two = f"regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)"
    domain = f"(CASE WHEN {two} = '' THEN {host} ELSE {two} END)"
    return host, domain


# ---------------------------------------------------------------------------
# deterministic mixture sampling
# ---------------------------------------------------------------------------

_SAMPLE_MOD = 1_000_000


def _mix64_np(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public constants) — the same stream the
    multimodal synth uses; uint64 wrap-around is the point."""
    z = x.astype(np.uint64)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def sample_hash_col(id_col, seed: int = 0) -> "F.Column":
    """``splitmix64(doc_id + seed) mod 1e6`` as a column — an
    Arrow-batched pandas UDF (one numpy pass per batch; Spark has no
    native 64-bit-exact mix we can reproduce in the oracle, so the UDF
    buys exact cross-engine determinism for the price of one Arrow
    hop)."""
    @F.pandas_udf(LongType())
    def mix(ids: pd.Series) -> pd.Series:
        # view, not astype: negative int64 ids must WRAP into uint64
        # space (two's complement), matching the oracle's sign fold
        u = ids.to_numpy(np.int64).view(np.uint64)
        h = _mix64_np(u + np.uint64(seed))
        return pd.Series((h % np.uint64(_SAMPLE_MOD)).astype(np.int64))

    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return mix(c)


def mixture_sample(docs: DataFrame, weights: dict[str, float],
                   domain_col: str = "domain", id_col: str = "doc_id",
                   seed: int = 0,
                   default_weight: float = 0.0) -> DataFrame:
    """Deterministic per-domain downsampling to a target mixture: keep
    a row iff ``splitmix64(doc_id+seed) mod 1e6 < weight(domain)·1e6``.
    The keep-decision depends only on (doc_id, seed) — independent of
    partitioning, executor count, and row order, unlike ``.sample()``
    — so the mixture is reproducible across cluster sizes AND the
    oracle can recompute it exactly. ``weights`` is a small literal
    map compiled to one CASE expression (no join); at thousands of
    domains switch to a broadcast join on a weights table."""
    thresholds = {d: int(round(float(w) * _SAMPLE_MOD))
                  for d, w in weights.items()}
    thr = F.lit(int(round(float(default_weight) * _SAMPLE_MOD)))
    for d, t in sorted(thresholds.items()):
        thr = F.when(F.col(domain_col) == d, F.lit(t)).otherwise(thr)
    return docs.withColumn("_h", sample_hash_col(id_col, seed)) \
        .filter(F.col("_h") < thr).drop("_h")


def duckdb_mix64_sql(x: str) -> str:
    """splitmix64 in exact-integer DuckDB SQL — 64-bit multiplies via
    32-bit split so every intermediate stays under 2^96 (HUGEINT-safe).
    Mirrors :func:`_mix64_np` bit-for-bit (tested)."""
    M64 = "18446744073709551616"  # 2^64
    B32 = "4294967296"            # 2^32

    def mul(a: str, b: str) -> str:
        return (
            f"((((({a}) % {B32}) * (({b}) % {B32}))"
            f" + ((((({a}) % {B32}) * (({b}) // {B32})"
            f" + (({a}) // {B32}) * (({b}) % {B32})) % {B32}) * {B32})) % {M64})"
        )

    s1 = f"((({x}) + 11400714819323198485) % {M64})"
    s2 = mul(s1, "13787848793156543929")
    s3 = f"(xor(({s2})::HUGEINT, ({s2})::HUGEINT // 134217728) % {M64})"   # ^= >>27
    s4 = mul(s3, "10723151780598845931")
    s5 = f"(xor(({s4})::HUGEINT, ({s4})::HUGEINT // 2147483648) % {M64})"  # ^= >>31
    return s5


def duckdb_mixture_sample_sql(weights: dict[str, float],
                              domain_expr: str,
                              table: str = "documents",
                              id_col: str = "doc_id",
                              seed: int = 0,
                              default_weight: float = 0.0) -> str:
    """DuckDB oracle for :func:`mixture_sample` — the same splitmix64
    stream in exact-integer SQL (doc_id sign-folded to uint64 space)."""
    uid = (f"(CASE WHEN {id_col} < 0 THEN {id_col}::HUGEINT "
           f"+ 18446744073709551616 ELSE {id_col}::HUGEINT END)")
    h = duckdb_mix64_sql(f"({uid} + {seed}) % 18446744073709551616")
    cases = " ".join(
        f"WHEN {domain_expr} = '{d}' THEN {int(round(float(w) * _SAMPLE_MOD))}"
        for d, w in sorted(weights.items()))
    thr = (f"(CASE {cases} ELSE "
           f"{int(round(float(default_weight) * _SAMPLE_MOD))} END)")
    return f"""
SELECT * FROM {table}
WHERE ({h}) % {_SAMPLE_MOD} < {thr}
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def pack_concat_chunks(docs: DataFrame, max_tokens: int,
                       n_tokens_col: str = "n_tokens",
                       id_col: str = "doc_id",
                       n_buckets: int = 32) -> DataFrame:
    """GPT-style concat-and-chunk packing layout: within each bucket,
    docs are laid end-to-end in doc_id order and the token stream is
    cut every ``max_tokens`` — rows ``(bucket, doc_id, n_tokens,
    offset, seq_id)`` where ``offset`` is the doc's start position in
    the bucket stream and ``seq_id = offset // max_tokens`` the
    training sequence its first token lands in (docs MAY straddle a
    boundary — that is the semantics of this layout; use
    :func:`pack_sequences_greedy` for every-doc-intact packing).

    Buckets shard the global sort: one window cumsum PER BUCKET, so no
    single task ever sees the whole corpus — the 100-TB shape. The
    bucket key is ``pmod(doc_id, n_buckets)`` — deterministic and
    partitioning-independent."""
    from pyspark.sql import Window

    b = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int")
    w = Window.partitionBy("bucket").orderBy(id_col)
    return (
        docs.select(F.col(id_col).alias(id_col),
                    F.col(n_tokens_col).cast("long").alias("n_tokens"))
        .withColumn("bucket", b)
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)).cast("long"))
        .withColumn("seq_id",
                    (F.col("offset") / F.lit(int(max_tokens)))
                    .cast("long"))
        .select("bucket", F.col(id_col).alias("doc_id"), "n_tokens",
                "offset", "seq_id")
    )


def duckdb_pack_concat_sql(max_tokens: int, n_tokens_expr: str,
                           table: str = "documents",
                           id_col: str = "doc_id",
                           n_buckets: int = 32) -> str:
    """DuckDB oracle for :func:`pack_concat_chunks` (same window
    cumsum; ``pmod`` = ((x % n) + n) % n for negative ids)."""
    b = f"(((({id_col}) % {n_buckets}) + {n_buckets}) % {n_buckets})"
    return f"""
WITH d AS (
  SELECT {b}::INT AS bucket, {id_col} AS doc_id,
         ({n_tokens_expr})::BIGINT AS n_tokens
  FROM {table}
)
SELECT bucket, doc_id, n_tokens,
       coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0)::BIGINT AS offset,
       (coalesce(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) // {int(max_tokens)})::BIGINT AS seq_id
FROM d
"""


def pack_sequences_greedy(docs: DataFrame, max_tokens: int,
                          n_tokens_col: str = "n_tokens",
                          id_col: str = "doc_id",
                          n_buckets: int = 32) -> DataFrame:
    """No-split packing: greedy first-fit-decreasing WITHIN each
    deterministic bucket — every doc lands whole in exactly one
    sequence; docs longer than ``max_tokens`` get a singleton sequence
    (the caller truncates). Returns ``(bucket, seq_id, doc_id,
    n_tokens)``; ``(bucket, seq_id)`` is globally unique.

    Per-bucket state is inherently sequential, so this is the one
    packing variant that runs as ``applyInPandas`` per bucket — the
    bucket count bounds task size exactly like
    :func:`pack_concat_chunks`, and FFD inside a bucket is a numpy
    loop over that bucket's docs only. Deterministic: FFD order is
    (n_tokens desc, doc_id asc), bin choice is lowest-index-that-fits."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    schema = StructType([
        StructField("bucket", IntegerType()),
        StructField("seq_id", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
    ])
    cap = int(max_tokens)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "doc_id"],
                              ascending=[False, True])
        sizes = pdf["n_tokens"].to_numpy(np.int64)
        bins: list[int] = []   # remaining capacity per bin
        assign = np.empty(len(sizes), np.int64)
        for i, s in enumerate(sizes):
            placed = -1
            for j, rem in enumerate(bins):
                if rem >= s:
                    placed = j
                    break
            if placed < 0:
                bins.append(cap)
                placed = len(bins) - 1
            bins[placed] -= min(s, cap)
            assign[i] = placed
        return pd.DataFrame({
            "bucket": pdf["bucket"].to_numpy(),
            "seq_id": assign,
            "doc_id": pdf["doc_id"].to_numpy(),
            "n_tokens": sizes,
        })

    b = F.pmod(F.col(id_col), F.lit(n_buckets)).cast("int")
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(n_tokens_col).cast("long").alias("n_tokens")) \
        .withColumn("bucket", b)
    return base.groupBy("bucket").applyInPandas(pack, schema)
