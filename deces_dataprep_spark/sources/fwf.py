"""Fixed-width-file source — the reference's primary ingest format.

The reference declares it in ``projects/deces-dataprep/datasets/
deces_src.yml:8-22``: gzip-compressed, latin1-encoded, fixed widths
``[80, 1, 8, 5, 30, 30, 8, 5, 10]`` with 9 named columns, files
selected by a regex over the S3 listing (``Makefile:42``). Everything
ingests as string.

Spark-first lowering: ``spark.read.text`` (splittable for plain text;
gzip streams whole-file per task, exactly like the reference's chunked
single-file reader) → one ``substring`` per declared width — all
whole-stage-codegen, no Python. Column values keep the reference's
observable semantics: fixed slice, trailing whitespace stripped
(pandas ``read_fwf`` behavior the reference relies on).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the deces_src.yml:11-22 layout
DECES_WIDTHS = [80, 1, 8, 5, 30, 30, 8, 5, 10]
DECES_NAMES = [
    "NOM_PRENOMS", "SEXE", "DATE_NAISSANCE", "CODE_INSEE_NAISSANCE",
    "COMMUNE_NAISSANCE", "PAYS_NAISSANCE", "DATE_DECES",
    "CODE_INSEE_DECES", "NUM_DECES",
]


def select_files(root: str, pattern: str) -> list[str]:
    """Regex file selection over a directory listing — the reference's
    ``FILES_TO_PROCESS`` regex against its S3 catalog (Makefile:42)."""
    names = sorted(os.listdir(root))
    rx = re.compile(pattern)
    return [os.path.join(root, n) for n in names if rx.match(n)]


def read_fwf(
    spark: SparkSession,
    paths: list[str] | str,
    widths: list[int] = DECES_WIDTHS,
    names: list[str] = DECES_NAMES,
    encoding: str = "latin1",
    with_lineage: bool = True,
) -> DataFrame:
    """Fixed-width scan → one string column per declared field.

    gzip + non-utf8 encodings: ``spark.read.text`` assumes utf-8, so
    for latin1 the bytes are read via ``binaryFile``-free text read —
    latin1 high bytes survive only if the file is ascii; for full
    latin1 fidelity pass the file through ``option('encoding', ...)``
    which Spark's text source honors per line. Lineage columns mirror
    the reference's ``SOURCE``/``SOURCE_LINE`` (deces_dataprep.yml:16-17).
    """
    reader = spark.read.option("encoding", encoding)
    df = reader.text(paths)
    cols = []
    start = 1  # substring is 1-based
    for width, name in zip(widths, names):
        cols.append(F.rtrim(F.substring("value", start, width)).alias(name))
        start += width
    out = df.select(*cols, F.input_file_name().alias("__file"))
    if with_lineage:
        from pyspark.sql import Window as W

        out = out.withColumn("__mid", F.monotonically_increasing_id())
        w = W.partitionBy("__file").orderBy("__mid")
        out = (
            out.withColumn("SOURCE", F.regexp_extract("__file", r"([^/]+)$", 1))
            .withColumn("SOURCE_LINE", F.row_number().over(w))
            .drop("__mid")
        )
    return out.drop("__file")
