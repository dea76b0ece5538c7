"""ES field families (multi-field, dates, prefixes, geo, exact/prefix
match) and the error-budget operator."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.operators import es_fields as E
from deces_dataprep_spark.operators.errors import (
    ErrorBudgetExceeded,
    check_budget,
    tolerant_map_in_pandas,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [
            ("DUPONT Jean-Pierre", "19800312", "48.85", "2.35"),
            ("Ångström Émile", "19211110", None, "13.0"),
            ("del campo maría", "00000000", "40.4", "-3.7"),
        ],
        "nom string, date_n string, lat string, lon string",
    )


def test_multi_field(people):
    out = E.multi_field(people, "nom")
    rows = {r["nom"]: r for r in out.collect()}
    r = rows["DUPONT Jean-Pierre"]
    assert r["nom_tokens"] == ["dupont", "jean", "pierre"]
    assert r["nom_raw"] == "dupont jean pierre"


def test_date_field_and_prefixes(people):
    out = people.select(
        E.date_field("date_n").alias("d"),
        E.date_prefix_terms("date_n").alias("pfx"),
    ).collect()
    assert str(out[0]["d"]) == "1980-03-12"
    assert out[0]["pfx"] == ["1980", "19800", "198003"]
    assert out[2]["d"] is None  # 00000000 unparseable


def test_geo_point(people):
    out = people.select(E.geo_point("lat", "lon").alias("g")).collect()
    assert out[0]["g"]["lat"] == pytest.approx(48.85)
    assert out[1]["g"] is None  # missing lat


def test_edge_ngram_field(people):
    grams = people.filter(F.col("nom") == "del campo maría").select(
        E.edge_ngram_field("nom").alias("g")
    ).collect()[0]["g"]
    assert "de" in grams and "cam" in grams and "campo" in grams
    assert all(2 <= len(g) <= 10 for g in grams)


def test_exact_and_prefix_match(people):
    # exact-match normalizes both sides (accents, case, punctuation)
    assert E.exact_match(people, "nom", "DUPONT jean pierre!").count() == 1
    assert E.exact_match(people, "nom", "dupont").count() == 0
    assert E.prefix_match(people, "nom", "Jea").count() == 1
    assert E.prefix_match(people, "nom", "mar").count() == 1
    assert E.prefix_match(people, "nom", "zzz").count() == 0


def test_error_budget(spark):
    df = spark.range(0, 1000, 1, 10).selectExpr("id")

    def flaky(b: pd.DataFrame) -> pd.DataFrame:
        if (b["id"] % 500 == 37).any():  # two poison batches out of ten
            raise ValueError("poison")
        return pd.DataFrame({"id": b["id"], "twice": b["id"] * 2})

    out, acc = tolerant_map_in_pandas(spark, df, flaky, "id long, twice long")
    rows = out.collect()
    assert 0 < len(rows) < 1000  # failed batches dropped, rest survive
    n_err = check_budget(acc, max_errors=20)
    assert n_err > 0
    with pytest.raises(ErrorBudgetExceeded):
        check_budget(acc, max_errors=0)


def test_error_budget_exact(spark):
    """run_budgeted: exact marker-row counting — repeat actions on the
    result must NOT change the error count (the accumulator variant
    re-adds on every action; this one is retry-/re-run-safe)."""
    from deces_dataprep_spark.operators.errors import run_budgeted

    df = spark.range(0, 1000, 1, 10).selectExpr("id")

    def flaky(b: pd.DataFrame) -> pd.DataFrame:
        if (b["id"] % 500 == 37).any():
            raise ValueError("poison")
        return pd.DataFrame({"id": b["id"], "twice": b["id"] * 2})

    good, n_err = run_budgeted(df, flaky, "id long, twice long", max_errors=20)
    assert n_err == 2
    n1 = good.count()
    n2 = good.count()  # second action: same persisted rows, no re-count
    assert n1 == n2 == 800
    assert good.filter((F.col("twice") != F.col("id") * 2)).count() == 0
    good.unpersist()

    with pytest.raises(ErrorBudgetExceeded):
        run_budgeted(df, flaky, "id long, twice long", max_errors=1)
