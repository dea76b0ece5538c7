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


def synth_pages(spark: SparkSession, n_docs: int, seed: int = 42,
                partitions: int | None = None) -> DataFrame:
    """The pages table, generated distributed + deterministic."""
    parts = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, parts)

    vocab = _vocab()
    cdf = _zipf_cdf(VOCAB_SIZE, ZIPF_S)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy(np.int64)
            texts = []
            for i in ids:
                rng = np.random.RandomState((seed * 1_000_003 + int(i)) % (2**31 - 1))
                n_tok = 30 + int(rng.randint(0, 90))
                picks = np.searchsorted(cdf, rng.rand(n_tok))
                texts.append(" ".join(vocab[p] for p in picks))
            out = pd.DataFrame({"id": ids, "text": texts})
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
