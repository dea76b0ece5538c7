"""BM25 scoring math — ES/Lucene defaults (k1=1.2, b=0.75).

The reference relies on Elasticsearch 8.6.1 default similarity (no
override in its index spec ``deces_index.yml:5-38``; ES version pinned
at ``Makefile:18``): Lucene BM25,

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = idf(t) * tf / (tf + k1 * (1 - b + b * dl / avgdl))

(Lucene ≥8 drops the classic ``(k1+1)`` numerator factor — it does not
change ranking, and we match Lucene.)

Implemented twice on purpose:
* ``bm25_score`` — scalar/numpy, used by the WAND executor and codec
  block-max computation;
* ``bm25_score_col`` — native Spark Column expression, used by the
  Spark-SQL oracle path (whole-stage codegen; no Python in the plan).
Both must agree to 1e-12 (tested).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def idf(df: int | np.ndarray, n_docs: int) -> float | np.ndarray:
    """Lucene BM25 idf. Vectorized over ``df`` arrays."""
    if isinstance(df, np.ndarray):
        return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_score(
    tf: float | np.ndarray,
    df: float | np.ndarray,
    dl: float | np.ndarray,
    n_docs: int,
    avgdl: float,
    k1: float = K1,
    b: float = B,
):
    """Exact per-(term, doc) BM25 contribution (scalar or numpy)."""
    tf = np.asarray(tf, dtype=np.float64) if isinstance(tf, np.ndarray) else float(tf)
    norm = k1 * (1.0 - b + b * (dl / avgdl))
    return idf(df, n_docs) * (tf / (tf + norm))


def upper_bound(df: int, n_docs: int, k1: float = K1, b: float = B) -> float:
    """Term score upper bound (tf→inf, dl→0): idf * 1.0 — used as the
    coarse WAND bound when block-max metadata is absent."""
    return float(idf(df, n_docs))


def bm25_score_col(
    tf: Column, df: Column, dl: Column, n_docs: Column | int, avgdl: Column | float,
    k1: float = K1, b: float = B,
) -> Column:
    """The same formula as a native Spark Column (JVM, codegen)."""
    n = F.lit(n_docs) if isinstance(n_docs, int) else n_docs
    a = F.lit(avgdl) if isinstance(avgdl, float) else avgdl
    idf_c = F.log(F.lit(1.0) + (n.cast("double") - df + F.lit(0.5)) / (df + F.lit(0.5)))
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl.cast("double") / a)
    return idf_c * (tf.cast("double") / (tf.cast("double") + norm))


def duckdb_bm25_sql(tf: str, df: str, dl: str, n_docs: str, avgdl: str,
                    k1: float = K1, b: float = B) -> str:
    """The same formula as a DuckDB SQL fragment (oracle side)."""
    return (
        f"ln(1.0 + (({n_docs}) - ({df}) + 0.5) / (({df}) + 0.5)) * "
        f"(({tf}) / (({tf}) + {k1} * ({1.0 - b} + {b} * ({dl}) / ({avgdl}))))"
    )
