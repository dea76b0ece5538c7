"""End-to-end reference-pipeline parity on a hand-built fixture with
known expected outputs (the deces_index document shape)."""

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.plans.deces_pipeline import deces_pipeline


@pytest.fixture(scope="module")
def lookups(spark):
    countries = spark.createDataFrame(
        [
            ("99352", "DZA", "ALGERIE"),
            ("99336", "MRT", "MAURITANIE"),
            ("XXXXX", "FRA", "FRANCE"),
        ],
        "COG string, CODEISO3 string, LIBCOG string",
    )
    citycodes = spark.createDataFrame(
        [
            # insee, history, cp, name, newest_name, dep, geopoint
            ("75101", '"75101,75056"', "75001", "Paris 1er Arrondissement",
             "Paris", "75", "48.86,2.34"),
            ("69123", "69123", "69001", "Lyon", "Lyon", "69", "45.76,4.83"),
            ("97409", "97409", '"97400,97490"', "Saint-Denis", "Saint-Denis",
             "974", "-20.9,55.45"),
        ],
        'insee_code string, insee_code_history string, `Code postal` string, '
        "name string, newest_name string, dep_code string, geopoint_2d string",
    )
    oppositions = spark.createDataFrame(
        [("69123", "20200105", "77")],
        '`Code du lieu de décès` string, `Date de décès` string, '
        '`Numéro d\'acte de décès` string',
    )
    return countries, citycodes, oppositions


@pytest.fixture(scope="module")
def src(spark):
    cols = ("NOM_PRENOMS string, SEXE string, DATE_NAISSANCE string, "
            "CODE_INSEE_NAISSANCE string, COMMUNE_NAISSANCE string, "
            "PAYS_NAISSANCE string, DATE_DECES string, CODE_INSEE_DECES string, "
            "NUM_DECES string, SOURCE string, SOURCE_LINE int")
    rows = [
        # metropolitan birth in Paris arrondissement, death in Lyon
        ("DUPONT*JEAN PIERRE/", "1", "19210110", "75101", "PARIS", "",
         "20200101", "69123", "12", "s3://x/deces-2020-m01.txt.gz", 1),
        # Algerian birth code (9X352 → 99352), female
        ("BENALI*FATIMA/", "2", "19450715", "91352", "ALGER", "ALGERIE",
         "20200102", "75101", "34", "s3://x/deces-2020-m01.txt.gz", 2),
        # RGPD-opposed record → must disappear
        ("SECRET*ANNE/", "2", "19600101", "69123", "LYON", "",
         "20200105", "69123", "77", "s3://x/deces-2020-m01.txt.gz", 3),
        # Réunion (ex 98405 → citycode 97409), dirty dates
        ("PAYET*ÉMILE/", "1", "19330231", "98405", "SAINT-DENIS", "",
         "20201399", "98405", "56", "s3://x/deces-2020-m01.txt.gz", 4),
    ]
    return spark.createDataFrame(rows, cols)


@pytest.fixture(scope="module")
def out(spark, src, lookups):
    countries, citycodes, oppositions = lookups
    df = deces_pipeline(spark, src, countries, citycodes, oppositions)
    return {r["NUM_DECES"]: r for r in df.collect()}


def test_rgpd_dropped(out):
    assert set(out) == {"12", "34", "56"}


def test_names(out):
    r = out["12"]
    assert r["NOM"] == "Dupont"
    assert r["PRENOMS"] == "Jean Pierre"
    assert r["PRENOM"] == "Jean"
    assert r["PRENOMS_NOM"] == "jean pierre dupont"
    assert r["PRENOM_NOM"] == "jean dupont"
    assert out["56"]["NOM"] == "Payet"  # accent folded by normalize


def test_sexe_and_uid_and_source(out):
    assert out["12"]["SEXE"] == "M"
    assert out["34"]["SEXE"] == "F"
    assert len(out["12"]["UID"]) == 12
    assert out["12"]["_id"] == out["12"]["UID"]
    assert out["12"]["SOURCE"] == "2020-m01"
    assert out["12"]["SOURCE_LINE"] == 1


def test_dates_and_age(out):
    r = out["12"]
    assert r["DATE_NAISSANCE_NORM"] == "19210110"
    assert r["DATE_DECES_NORM"] == "20200101"
    assert r["AGE_DECES"] == 98
    d = out["56"]
    assert d["DATE_NAISSANCE_NORM"] == "19330301"  # Feb 31 → Mar 1
    assert d["DATE_DECES_NORM"] == "20201231"      # day 99→31, month 13→12


def test_pays(out):
    # Algerian code 91352 → 99352 → countries join
    r = out["34"]
    assert r["PAYS_NAISSANCE_CODEISO3"] == "DZA"
    assert r["PAYS_NAISSANCE"] == "Algerie"  # equal to LIBCOG → title only
    # metropolitan birth → XXXXX → FRANCE, empty PAYS filled from LIBCOG
    assert out["12"]["PAYS_NAISSANCE"] == "France"
    assert out["12"]["PAYS_NAISSANCE_CODEISO3"] == "FRA"


def test_commune_naissance(out):
    r = out["12"]
    # arrondissement promotion: "Paris/Paris 1er Arrondissement"
    assert r["COMMUNE_NAISSANCE"] == ["Paris", "Paris 1er Arrondissement"]
    assert r["DEPARTEMENT_NAISSANCE"] == "75"
    assert r["CODE_POSTAL_NAISSANCE"] == ["75001"]
    assert r["CODE_INSEE_NAISSANCE_HISTORIQUE"] == ["75101", "75056"]
    assert r["GEOPOINT_NAISSANCE"]["lat"] == pytest.approx(48.86)
    # Réunion: 98405 → citycode 97409 (quoted CP list split)
    d = out["56"]
    assert d["CODE_POSTAL_NAISSANCE"] == ["97400", "97490"]
    assert d["COMMUNE_NAISSANCE"] == ["Saint-Denis"]


def test_commune_deces_and_foreign(out):
    r = out["12"]  # died in Lyon
    assert r["COMMUNE_DECES"] == ["Lyon"]
    assert r["DEPARTEMENT_DECES"] == "69"
    # died-in-Paris record: arrondissement logic on the décès side runs
    # AFTER the name/alter merge (deces_dataprep.yml:309-321), so the
    # reference itself emits the duplicate 'Paris' — kept faithfully
    assert out["34"]["COMMUNE_DECES"] == [
        "Paris", "Paris 1er Arrondissement", "Paris"
    ]
    # foreign birth: citycodes miss → '' → empty arrays, no geopoint
    assert out["34"]["COMMUNE_NAISSANCE"] == ["Alger"]
    assert out["34"]["GEOPOINT_NAISSANCE"] is None


def test_historique_fallback_for_foreign(out):
    # miss on citycodes → historique = [PAYS_CODE, CODE_INSEE] split
    assert out["34"]["CODE_INSEE_NAISSANCE_HISTORIQUE"] == ["99352", "91352"]


def test_no_temp_columns(out):
    cols = set(next(iter(out.values())).asDict())
    assert not any(c.endswith("_NORM_D") for c in cols)
    assert not any(c.endswith("_ALTER") or c.endswith("_ALL") or
                   c.endswith("_REF") for c in cols)
    assert "PAYS_NAISSANCE_CODE" not in cols and "PAYS_DECES_CODE" not in cols


def test_title_case_golden(spark):
    """Golden-file check for the pandas .str.title parity kernel — the
    cases where Spark initcap would differ (apostrophes, hyphens,
    accents, digit boundaries)."""
    from deces_dataprep_spark.operators.dataprep import title_case_udf
    from pyspark.sql import functions as F

    cases = [
        ("jean d'arc", "Jean D'Arc"),
        ("JEAN-PIERRE DUPONT", "Jean-Pierre Dupont"),
        ("émile zola", "Émile Zola"),
        ("o'neill mcdonald", "O'Neill Mcdonald"),
        ("déjà vu 2x", "Déjà Vu 2X"),
    ]
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(cases)],
                               "i int, s string")
    got = {r["i"]: r["t"] for r in
           df.select("i", title_case_udf(F.col("s")).alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want


def test_uid_backend_flag(spark):
    """blake3-flagged hash backend (deces_dataprep.yml:14-15): blake3
    digest parity when importable, md5 mechanism parity otherwise."""
    import pytest as _pytest

    from deces_dataprep_spark.operators.dataprep import uid_backend, with_uid

    assert uid_backend("md5") == "md5"
    try:
        import blake3  # noqa: F401
        have = True
    except ImportError:
        have = False
    assert uid_backend("auto") == ("blake3" if have else "md5")
    if not have:
        with _pytest.raises(ImportError):
            uid_backend("blake3")
    df = spark.createDataFrame([("a",), ("b",)], "x string")
    uids = [r["UID"] for r in with_uid(df, ["x"], backend="auto").collect()]
    assert len(uids) == 2 and len(uids[0]) == 12 and uids[0] != uids[1]
