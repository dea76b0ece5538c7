"""HTML → text extraction kernel (byte-stable, vectorized).

The input contract (BASELINE ``input_hint``) is a Common-Crawl-style
pages table ``(url, warc_ts, html binary, text string, lang)`` with a
per-row invariant: *byte-identical extracted text per url*. The kernel
is therefore deterministic pure-Python string processing, exposed as an
Arrow-batched pandas UDF (never per-row Python inside Spark).

Scope: the corpus generator renders html from text with a fixed
template, so extraction is exactly invertible on our corpus; on foreign
HTML the kernel is a best-effort tag-stripper (script/style dropped,
entities unescaped, whitespace collapsed) — same behavioral class as
the reference's normalization steps, not a browser.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_SCRIPT_STYLE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"[ \t\r\f\v]+")
_NL = re.compile(r"\n{2,}")


def extract_text(html: bytes | str) -> str:
    """Deterministic tag-strip extraction. bytes are decoded utf-8
    (errors replaced) — byte-stable for valid utf-8 input."""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _SCRIPT_STYLE.sub(" ", html)
    s = _COMMENT.sub(" ", s)
    # block-level tags become newlines so words don't fuse across tags
    s = re.sub(r"</?(p|div|br|h[1-6]|li|tr|td|table|head|body|title)[^>]*>", "\n", s,
               flags=re.IGNORECASE)
    s = _TAG.sub(" ", s)
    s = _htmllib.unescape(s)
    s = _WS.sub(" ", s)
    s = "\n".join(line.strip() for line in s.split("\n"))
    s = _NL.sub("\n", s)
    return s.strip()


def extract_text_series(html: pd.Series) -> pd.Series:
    return html.map(lambda h: extract_text(h) if h is not None else None)


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Arrow-batched extraction UDF — the Spark-facing entry point."""
    return extract_text_series(html)
