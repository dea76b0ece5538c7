"""The matchID dataprep operator family, re-expressed Spark-first.

Each function mirrors one recipe operator of the reference
(``projects/deces-dataprep/recipes/deces_dataprep.yml`` — file:line
cited per operator) with the same observable semantics, but lowered to
native Catalyst expressions wherever provably identical, and to
Arrow-batched pandas UDFs only where Python/Java dialects differ
(``str.title`` vs ``initcap``, NFKD folding).

The reference's engine applies these per 10k-row pandas chunk in a
thread pool; here each is a declarative transformation on an unbounded
DataFrame — Catalyst fuses the whole chain into one codegen'd stage, so
a 40-step recipe is still a single pass over the data.
"""

from __future__ import annotations

import re as _re
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from deces_dataprep_spark.functions.analyze import normalize_series

# ---------------------------------------------------------------------------
# column selection helper (the recipe's `select: regex` idiom)
# ---------------------------------------------------------------------------


def select_cols(df: DataFrame, pattern: str) -> list[str]:
    """Column selection by regex, anchored at the start (``re.match``).

    The anchoring is observable reference behavior: its recipe applies
    ``select: NOM$`` (deces_dataprep.yml:54) *between* creating PRENOM
    from the same source and extracting it — under search semantics the
    NOM rule would also fire on PRENOM and destroy it, so the engine
    must match from the start of the column name."""
    rx = _re.compile(pattern)
    return [c for c in df.columns if rx.match(c)]


# ---------------------------------------------------------------------------
# 1. normalize — matchID text normalization (deces_dataprep.yml:10-11)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def _normalize_upper_udf(s: pd.Series) -> pd.Series:
    # reference semantics: NFKD → ascii-ignore → UPPER, collapse non-alnum
    # (the NFKD idiom is inline in the recipe at deces_dataprep.yml:187,199)
    return normalize_series(s).str.upper()


def normalize(df: DataFrame, select: str) -> DataFrame:
    """``normalize: {select: regex}`` — uppercase + accent-fold + collapse
    non-alphanumerics on every column matching the regex."""
    out = df
    for c in select_cols(df, select):
        out = out.withColumn(c, _normalize_upper_udf(F.col(c)))
    return out


# ---------------------------------------------------------------------------
# 2. replace — ordered regex rewrites (13 uses, e.g. deces_dataprep.yml:18-27)
# ---------------------------------------------------------------------------


def replace(df: DataFrame, select: str, rules: Sequence[tuple[str, str]]) -> DataFrame:
    """``replace: {select, regex: [{pat: repl}, ...]}`` — ordered
    ``regexp_replace`` chain on matching columns. Replacement backrefs use
    Java's ``$1`` (callers translating reference recipes rewrite ``\\1``)."""
    cols = select_cols(df, select)
    out = df
    for c in cols:
        expr = F.col(c)
        for pat, repl in rules:
            expr = F.regexp_replace(expr, pat, repl)
        out = out.withColumn(c, expr)
    return out


# ---------------------------------------------------------------------------
# 3. map — column copy/alias fan-out (deces_dataprep.yml:32-35 etc.)
# ---------------------------------------------------------------------------


def map_cols(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """``map: {NEW: OLD}`` — create copies; one source may fan out."""
    out = df
    for new, old in mapping.items():
        out = out.withColumn(new, F.col(old))
    return out


# ---------------------------------------------------------------------------
# 4. join — in-memory lookup ≙ broadcast left join w/ "" fill
#    (deces_dataprep.yml:37-45, 135-142, 167-178, 275-282, 297-308)
# ---------------------------------------------------------------------------


def join_lookup(
    df: DataFrame,
    lookup: DataFrame,
    strict: dict[str, str],
    select: dict[str, str],
) -> DataFrame:
    """``join: {dataset, type: in_memory, strict: {L: R}, select: {NEW: RCOL}}``

    Left-outer broadcast hash join on the (possibly composite) key map;
    projected right columns renamed; **miss → ''** (observable contract:
    the recipe filters ``!=''`` downstream, deces_dataprep.yml:50).
    """
    right = lookup.select(
        *[F.col(r).alias(f"__k_{l}") for l, r in strict.items()],
        *[F.col(rcol).alias(f"__v_{new}") for new, rcol in select.items()],
    )
    # de-dup right side on the key (in_memory lookup keeps one match)
    right = right.dropDuplicates([f"__k_{l}" for l in strict])
    cond = None
    for l in strict:
        c = df[l].eqNullSafe(right[f"__k_{l}"])
        cond = c if cond is None else (cond & c)
    out = df.join(F.broadcast(right), cond, "left")
    for new in select:
        out = out.withColumn(new, F.coalesce(F.col(f"__v_{new}"), F.lit("")))
    drop = [f"__k_{l}" for l in strict] + [f"__v_{n}" for n in select]
    return out.drop(*drop)


# ---------------------------------------------------------------------------
# 5. delete — drop columns by regex (deces_dataprep.yml:66-67 etc.)
# ---------------------------------------------------------------------------


def delete(df: DataFrame, select: str) -> DataFrame:
    return df.drop(*select_cols(df, select))


# ---------------------------------------------------------------------------
# 6. parsedate (deces_dataprep.yml:95-97)
# ---------------------------------------------------------------------------


def parsedate(df: DataFrame, select: str, fmt: str = "yyyyMMdd") -> DataFrame:
    """``parsedate`` — string → date, unparseable → NULL (same observable
    as pandas NaT with errors='coerce'). ``try_to_date``, NOT
    ``to_date``: under ANSI mode the latter THROWS on bad input —
    the reference tolerates dirty dates by design."""
    out = df
    for c in select_cols(df, select):
        out = out.withColumn(c, F.try_to_date(F.col(c), fmt))
    return out


# ---------------------------------------------------------------------------
# 7. row filter / anti-join (deces_dataprep.yml:49-50)
# ---------------------------------------------------------------------------


def filter_rows(df: DataFrame, predicate: Column) -> DataFrame:
    return df.filter(predicate)


def anti_join(df: DataFrame, other: DataFrame, on: dict[str, str]) -> DataFrame:
    """The RGPD-opposition drop, fused: instead of join→fill→filter!='',
    a direct broadcast left-anti join (same observable, one fewer pass)."""
    right = other.select(*[F.col(r).alias(f"__k_{l}") for l, r in on.items()])
    cond = None
    for l in on:
        c = df[l].eqNullSafe(right[f"__k_{l}"])
        cond = c if cond is None else (cond & c)
    return df.join(F.broadcast(right), cond, "left_anti")


# ---------------------------------------------------------------------------
# 8. deterministic UID (deces_dataprep.yml:14-15)
# ---------------------------------------------------------------------------


def uid_backend(requested: str = "auto") -> str:
    """Resolve the UID hash backend: 'blake3' when the library is
    importable (digest parity with the reference), else 'md5' (mechanism
    parity). 'auto' picks blake3 if available."""
    if requested == "md5":
        return "md5"
    try:
        import blake3  # noqa: F401
        return "blake3"
    except ImportError:
        if requested == "blake3":
            raise
        return "md5"


def with_uid(df: DataFrame, cols: Sequence[str], out_col: str = "UID",
             length: int = 12, backend: str = "auto") -> DataFrame:
    """Content-addressed row id — the reference's idempotency key
    (``_id = urlsafe_b64(blake3(row))[:12]``, deces_dataprep.yml:14-15).

    ``backend='auto'``: use blake3 (urlsafe-b64 digest prefix — the
    reference's exact digest) when the library is importable, else fall
    back to the portable md5 hex prefix (same shape/length/determinism;
    mechanism parity only). Force with 'blake3' / 'md5'."""
    concat = F.concat_ws("|", *[F.coalesce(F.col(c).cast("string"), F.lit(""))
                                for c in cols])
    if uid_backend(backend) == "blake3":
        @F.pandas_udf(StringType())
        def _blake3_uid(s: pd.Series) -> pd.Series:
            import base64

            import blake3

            return s.map(
                lambda v: base64.urlsafe_b64encode(
                    blake3.blake3(v.encode("utf-8")).digest()
                ).decode("ascii")[:length]
            )

        return df.withColumn(out_col, _blake3_uid(concat))
    return df.withColumn(out_col, F.substring(F.md5(concat), 1, length))


# ---------------------------------------------------------------------------
# 9. lineage columns (deces_dataprep.yml:16-17)
# ---------------------------------------------------------------------------


def per_file_line_numbers(df: DataFrame, file_col: str,
                          line_col: str = "SOURCE_LINE") -> DataFrame:
    """Shuffle-free per-file row numbers (zipWithIndex-style).

    Pass 1 (tiny agg): per (scan partition, file) chunk, count rows and
    take the minimum ``monotonically_increasing_id``; the driver orders
    each file's chunks by that id and prefix-sums the offsets. Pass 2:
    broadcast-join the chunk offsets back and compute
    ``offset + (mid − chunk_min_mid) + 1`` map-side — the big table is
    never shuffled and no file serializes into a single task (the
    round-1 ``row_number() over (partitionBy(file))`` did both).

    Ordering contract: within a scan partition mids are contiguous and
    increasing, so in-file order is exact there; across partitions of
    one splittable file, chunks are ordered by their mid — the same
    scan-order surrogate the window version used. Requires the scan to
    be deterministic between the two passes (file-backed reads are).
    """
    from pyspark.sql.types import LongType, StructField, StructType, StringType

    spark = df.sparkSession
    tagged = df.withColumn("__pid", F.spark_partition_id()) \
               .withColumn("__mid", F.monotonically_increasing_id())
    chunks = (
        tagged.groupBy("__pid", file_col)
        .agg(F.count(F.lit(1)).alias("n"), F.min("__mid").alias("m0"))
        .collect()
    )
    by_file: dict[str, list] = {}
    for r in chunks:
        by_file.setdefault(r[file_col], []).append(r)
    rows = []
    for fname, rs in by_file.items():
        rs.sort(key=lambda r: r["m0"])
        off = 0
        for r in rs:
            rows.append((int(r["__pid"]), fname, int(r["m0"]), off))
            off += int(r["n"])
    schema = StructType([
        StructField("__pid", LongType()), StructField(file_col, StringType()),
        StructField("__m0", LongType()), StructField("__off", LongType()),
    ])
    chunk_df = spark.createDataFrame(
        rows or [], schema
    ).withColumn("__pid", F.col("__pid").cast("int"))
    out = tagged.join(F.broadcast(chunk_df), ["__pid", file_col], "left")
    # fail FAST on a chunk-map miss instead of silently emitting NULL /
    # misnumbered lineage: the two passes assume the scan is
    # deterministic (same (pid, mid) layout both times); a
    # non-deterministic or post-shuffle input breaks that silently
    # otherwise. raise_error costs nothing on the matched path.
    out = out.withColumn(
        line_col,
        F.when(
            F.col("__off").isNull(),
            F.raise_error(F.concat(
                F.lit("per_file_line_numbers: row of "), F.col(file_col),
                F.lit(" missed the chunk offset map — input scan is not "
                      "deterministic between passes (shuffled/generated "
                      "input?); lineage would be silently wrong"),
            )).cast("long"),
        ).otherwise(F.col("__off") + F.col("__mid") - F.col("__m0") + 1),
    )
    return out.drop("__pid", "__mid", "__m0", "__off")


def with_lineage(df: DataFrame, source_col: str = "SOURCE",
                 line_col: str = "SOURCE_LINE") -> DataFrame:
    """``SOURCE`` = input file name, ``SOURCE_LINE`` = stable per-file row
    number (deces_dataprep.yml:16-17) — shuffle-free, see
    :func:`per_file_line_numbers`."""
    out = df.withColumn(source_col, F.input_file_name())
    return per_file_line_numbers(out, file_col=source_col, line_col=line_col)


# ---------------------------------------------------------------------------
# 10. the 13-regex date sanitation state machine (deces_dataprep.yml:80-94)
# ---------------------------------------------------------------------------

# Ordered rules re-expressed from the reference's rule chain
# (deces_dataprep.yml:80-94, which operates on a yyyy/mm/dd slashed
# intermediate; these are the anchored slash-free equivalents):
#   strip non-digits; all-zero → ''; day>31 → 31; month 13-19 → 12;
#   month 21-99 w/ nonzero units → 0<units> (`/[2-9]([1-9])/ → /0\1/`);
#   month 20,30..90 → 01 (`/[2-9]0/ → /01/`); Feb 30/31 → Mar 1;
#   non-leap Feb 29 → Feb 28; 31st of 30-day months (04 06 09 11 — the
#   reference's class) → 30; day 00 → 01; month 00 → 01.
DATE_SANITIZE_RULES: list[tuple[str, str]] = [
    (r"[^0-9]", ""),                                   # keep digits only
    (r"^0{8}$", ""),                                   # 00000000 → empty
    (r"^(\d{4})(\d{2})(3[2-9]|[4-9]\d)$", "$1$2" + "31"),  # day > 31 → 31
    (r"^(\d{4})(1[3-9])(\d{2})$", "$1" + "12" + "$3"),  # month 13-19 → 12
    # NB "$10..." parses as group 1 + literal '0' (Java takes the longest
    # VALID group number; these patterns have < 10 groups)
    (r"^(\d{4})[2-9]([1-9])(\d{2})$", "$10$2$3"),      # month 21-99 → 0<units>
    (r"^(\d{4})[2-9]0(\d{2})$", "$101$2"),             # month 20,30..90 → 01
    (r"^(\d{4})02(3[01])$", "$1" + "0301"),            # Feb 30/31 → Mar 1
    # non-leap Feb 29 → Feb 28. Non-leap ⇔ last two year digits not
    # divisible by 4, OR a '00 century whose century digits aren't
    # divisible by 4 (Gregorian 400-year rule: 1900 non-leap, 2000 leap).
    (r"^(\d{2}(?:[02468][1235679]|[13579][01345789])"
     r"|(?:[02468][1235679]|[13579][01345789])00)0229$", "$1" + "0228"),
    (r"^(\d{4})(0[469]|11)31$", "$1$2" + "30"),        # 31st of 30-day month
    (r"^(\d{4})(\d{2})00$", "$1$2" + "01"),            # day 00 → 01
    (r"^(\d{4})00(\d{2})$", "$1" + "01" + "$2"),       # month 00 → 01
]


def sanitize_dates(df: DataFrame, select: str) -> DataFrame:
    """Apply the date sanitation state machine (pure ordered regex chain —
    dialect-safe: digit classes only, no lookaround)."""
    return replace(df, select, DATE_SANITIZE_RULES)


# ---------------------------------------------------------------------------
# 11. misc string kernels w/ pandas parity (deces_dataprep.yml:69-75,…)
# ---------------------------------------------------------------------------


@F.pandas_udf(StringType())
def title_case_udf(s: pd.Series) -> pd.Series:
    """pandas ``.str.title()`` parity — differs from Spark ``initcap`` on
    apostrophes/hyphens ("d'arc" → "D'Arc" vs "D'arc"), so stays a UDF."""
    return s.astype("string").str.title()


#: numpy's Y unit: 1 Y == 31556952 s == 365.2425 days exactly (verified:
#: ``np.array([365],'m8[D]').astype('m8[Y]') == 0``; 366 days == 1).
NUMPY_DAYS_PER_YEAR = 365.2425


def age_years_col(birth: Column, death: Column) -> Column:
    """``AGE_DECES`` ≙ numpy ``<m8[Y]`` truncation (deces_dataprep.yml:98-103):
    ``np.where(death > birth, (death - birth).astype('<m8[Y]'), None)``.

    numpy's Y unit is a fixed 365.2425 days (NOT calendar years — 365
    elapsed days truncate to age 0 even across a birthday), so the
    faithful lowering is ``floor(datediff / 365.2425)``; the reference's
    strict ``>`` guard makes death == birth NULL."""
    yrs = F.floor(
        F.datediff(death, birth) / F.lit(NUMPY_DAYS_PER_YEAR)
    ).cast("int")
    return F.when(death > birth, yrs)
