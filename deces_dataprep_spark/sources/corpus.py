"""Deterministic Common-Crawl-style corpus synthesis (input_hint shape).

Generates the exact input-table schema from BASELINE.json ``input_hint``:

    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

fully distributed: ``spark.range(n)`` → native column expressions +
one Arrow-batched pandas UDF for text/html rendering. Deterministic by
construction — content is a pure function of the row id and seed (no
wall-clock, no RNG state shared across partitions), so any two runs (or
two cluster sizes) produce byte-identical tables. ``html`` is rendered
from ``text`` with a fixed template, making html→text extraction
verifiable byte-identically (SURVEY §5.2 invariant).

Token distribution is Zipfian over a fixed vocabulary with injected
accented forms — the Zipf head is the skew fixture for the salted
posting shuffle (SURVEY §7.3).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 10_000
ZIPF_S = 1.07
LANGS = ["fr", "en", "de"]
ACCENTED = ["café", "décès", "ångström", "naïve", "señor", "über", "éclair"]
_EPOCH = 1_500_000_000  # fixed base timestamp (no now())

HTML_TEMPLATE = (
    "<html><head><title>{title}</title></head>"
    "<body><p>{body}</p></body></html>"
)


def _vocab() -> list[str]:
    base = [f"w{i:05d}" for i in range(VOCAB_SIZE)]
    # seed the head with real-looking tokens incl. accents
    head = [
        "the", "and", "of", "data", "page", "web", "crawl", "index", "search",
        "text", "spark", "join", "merge", "sort", "scan", "query", "table",
    ] + ACCENTED
    base[: len(head)] = head
    return base


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — counter-based uniform hashing (vectorized).
    Content is a pure function of (seed, doc id, position): deterministic
    and partition-independent, so any cluster layout generates byte-
    identical pages."""
    z = x.astype(np.uint64)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z *= np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None,
                min_tokens: int = 30, max_tokens: int = 120) -> DataFrame:
    """The pages table, generated distributed + deterministic.

    Token sampling is fully numpy-vectorized per Arrow batch: a
    counter-based hash of (seed, doc_id, position) gives the uniforms
    for the Zipf inverse-CDF lookup — no per-doc RNG state."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts)

    vocab = np.array(_vocab(), dtype=object)
    cdf = _zipf_cdf(VOCAB_SIZE, ZIPF_S)
    span = max_tokens - min_tokens

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(np.int64).astype(np.uint64)
            n = ids.size
            if n == 0:
                continue
            base_h = _mix64(ids * np.uint64(2654435761) + np.uint64(seed))
            n_toks = (min_tokens + (base_h % np.uint64(span)).astype(np.int64)
                      if span > 0 else np.full(n, min_tokens, np.int64))
            total = int(n_toks.sum())
            # row index + position counter for every token, flattened
            row_of = np.repeat(np.arange(n, dtype=np.uint64), n_toks)
            pos = np.arange(total, dtype=np.uint64) - np.repeat(
                np.concatenate(([0], np.cumsum(n_toks)[:-1])).astype(np.uint64), n_toks
            )
            u = _mix64(base_h[row_of] ^ _mix64(pos + np.uint64(0xABCDEF))).astype(
                np.float64
            ) / float(2**64)
            picks = np.searchsorted(cdf, u)
            words = vocab[picks]
            # join per row without a Python loop over tokens
            texts = pd.Series(words).groupby(row_of, sort=True).agg(" ".join)
            out = pd.DataFrame({"id": ids.astype(np.int64), "text": texts.to_numpy()})
            yield out

    rendered = base.mapInPandas(render, "id long, text string")

    url = F.concat(
        F.lit("https://site"), (F.col("id") % 1000).cast("string"),
        F.lit(".example/p/"), F.col("id").cast("string"),
    )
    # doc_id: stable content-free key = 63-bit masked xxhash64 of url
    doc_id = F.xxhash64(url).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
    warc_ts = F.timestamp_seconds(F.lit(_EPOCH) + F.col("id") * F.lit(17))
    title = F.concat(F.lit("Page "), F.col("id").cast("string"))
    html = F.encode(
        F.format_string(
            "<html><head><title>%s</title></head><body><p>%s</p></body></html>",
            title, F.col("text"),
        ),
        "utf-8",
    )
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]),
                        (F.col("id") % len(LANGS) + 1).cast("int"))
    return rendered.select(
        doc_id.alias("doc_id"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        lang.alias("lang"),
    )


def pages_from_documents(docs: DataFrame, repeat: int = 1) -> DataFrame:
    """Deterministically scale the driver `documents` table into the
    input_hint pages shape: each source row is replicated ``repeat``
    times with distinct urls/doc_ids (bench uses this to get meaningful
    work at local scale without external data)."""
    rep = docs.select(
        "doc_id", "text", "lang",
        F.explode(F.sequence(F.lit(0), F.lit(repeat - 1))).alias("copy"),
    )
    url = F.concat(
        F.lit("https://docs.example/"), F.col("doc_id").cast("string"),
        F.lit("/"), F.col("copy").cast("string"),
    )
    new_id = F.xxhash64(url).bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
    warc_ts = F.timestamp_seconds(
        F.lit(_EPOCH) + F.col("doc_id") * F.lit(31) + F.col("copy")
    )
    html = F.encode(
        F.format_string(
            "<html><head><title>%s</title></head><body><p>%s</p></body></html>",
            F.concat(F.lit("Doc "), F.col("doc_id").cast("string")), F.col("text"),
        ),
        "utf-8",
    )
    return rep.select(
        new_id.alias("doc_id"), url.alias("url"), warc_ts.alias("warc_ts"),
        html.alias("html"), F.col("text"), F.col("lang"),
    )
