"""fwf source + the recipe runner over a reference-shaped fixture
(deces_src.yml widths; recipe steps mirroring deces_dataprep.yml)."""

import gzip

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.plans.recipe import run_recipe
from deces_dataprep_spark.sources.fwf import (
    DECES_NAMES,
    DECES_WIDTHS,
    read_fwf,
    select_files,
)

ROWS = [
    # NOM_PRENOMS(80) SEXE(1) DN(8) INSEE_N(5) COMMUNE(30) PAYS(30) DD(8) INSEE_D(5) NUM(10)
    ("DUPONT*JEAN PIERRE/", "1", "19210110", "75101", "PARIS", "FRANCE",
     "19990101", "75102", "1234"),
    ("MARTIN*MARIE/", "2", "19330229", "69123", "LYON", "FRANCE",
     "20100231", "69123", "5678"),  # invalid dates exercised downstream
    ("DÉCÈS*ÉMILE/", "1", "00000000", "99999", "BERLIN", "ALLEMAGNE",
     "20201399", "99999", "9"),
]


def _fwf_line(row):
    return "".join(v.ljust(w)[:w] for v, w in zip(row, DECES_WIDTHS))


@pytest.fixture(scope="module")
def fwf_dir(tmp_path_factory):
    """Fixture written as **latin1 bytes** (the reference's declared
    encoding, deces_src.yml:10) — É/È/Ç are single high bytes on disk;
    a reader that assumes UTF-8 produces U+FFFD mojibake here."""
    d = tmp_path_factory.mktemp("fwf")
    for year, rows in (("2020-m01", ROWS[:2]), ("2021-m01", ROWS[2:])):
        with gzip.open(d / f"deces-{year}.txt.gz", "wb") as f:
            for r in rows:
                f.write((_fwf_line(r) + "\n").encode("latin1"))
    (d / "ignore.csv").write_text("x\n")
    return str(d)


def test_select_files_regex(fwf_dir):
    files = select_files(fwf_dir, r"deces-.*\.txt\.gz")
    assert len(files) == 2
    assert all(f.endswith(".txt.gz") for f in files)


def test_read_fwf_columns_and_lineage(spark, fwf_dir):
    files = select_files(fwf_dir, r"deces-.*\.txt\.gz")
    df = read_fwf(spark, files, encoding="latin1")
    rows = {r["NUM_DECES"]: r for r in df.collect()}
    assert set(df.columns) == set(DECES_NAMES) | {"SOURCE", "SOURCE_LINE"}
    assert rows["1234"]["NOM_PRENOMS"] == "DUPONT*JEAN PIERRE/"
    assert rows["1234"]["SEXE"] == "1"
    assert rows["1234"]["DATE_NAISSANCE"] == "19210110"
    assert rows["9"]["PAYS_NAISSANCE"] == "ALLEMAGNE"
    # latin1 high bytes round-trip exactly (the round-1 text-source path
    # silently produced U+FFFD here)
    assert rows["9"]["NOM_PRENOMS"] == "DÉCÈS*ÉMILE/"
    assert "�" not in rows["9"]["NOM_PRENOMS"]
    assert rows["1234"]["SOURCE"] == "deces-2020-m01.txt.gz"
    assert rows["1234"]["SOURCE_LINE"] == 1
    assert rows["5678"]["SOURCE_LINE"] == 2


def test_read_fwf_lineage_plan_has_no_shuffle(spark, fwf_dir):
    """Lineage is zipWithIndex-style (two-pass + broadcast-join chunk
    offsets) — the big-table side must show NO Exchange in the plan
    (the round-1 window version shuffled every row)."""
    files = select_files(fwf_dir, r"deces-.*\.txt\.gz")
    df = read_fwf(spark, files, encoding="latin1")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan


def test_recipe_end_to_end(spark, fwf_dir):
    """A compressed version of the reference recipe: normalize →
    name split → date sanitation → parse → sex decode → RGPD anti-join
    → UID. Exercises every recipe operator once."""
    files = select_files(fwf_dir, r"deces-.*\.txt\.gz")
    df = read_fwf(spark, files, encoding="latin1")

    oppositions = spark.createDataFrame(
        [("5678",)], "num string"  # MARTIN opposes (RGPD) → dropped
    )

    steps = [
        # NOM*PRENOMS/ → split (deces_dataprep.yml:18-27 shape)
        {"replace": {"select": r"^NOM_PRENOMS$",
                     "rules": [[r"^([^*]*)\*", "$1|"], [r"/\s*$", ""]]}},
        {"exec": {"fn": lambda d: d
                  .withColumn("NOM", F.get(F.split("NOM_PRENOMS", r"\|"), 0))
                  .withColumn("PRENOMS", F.get(F.split("NOM_PRENOMS", r"\|"), 1))}},
        {"normalize": {"select": r"^(NOM|PRENOMS|COMMUNE_NAISSANCE|PAYS_NAISSANCE)$"}},
        {"map": {"DATE_NAISSANCE_NORM": "DATE_NAISSANCE",
                 "DATE_DECES_NORM": "DATE_DECES"}},
        {"sanitize_dates": {"select": r"DATE_.*_NORM$"}},
        {"exec": {"fn": lambda d: d
                  .withColumn("DATE_NAISSANCE_NORM",
                              F.try_to_date(F.col("DATE_NAISSANCE_NORM"), "yyyyMMdd"))
                  .withColumn("DATE_DECES_NORM",
                              F.try_to_date(F.col("DATE_DECES_NORM"), "yyyyMMdd"))}},
        {"exec": {"fn": lambda d: d.withColumn(
            "SEXE", F.when(F.col("SEXE") == "1", "M").otherwise("F"))}},
        {"anti_join": {"lookup": oppositions, "on": {"NUM_DECES": "num"}}},
        {"uid": {"cols": ["NOM", "PRENOMS", "DATE_NAISSANCE", "NUM_DECES"]}},
        {"delete": {"select": r"^NOM_PRENOMS$"}},
    ]
    out = run_recipe(df, steps)
    rows = {r["NUM_DECES"]: r for r in out.collect()}
    # RGPD-opposed record dropped (the deces_dataprep.yml:49-50 contract)
    assert set(rows) == {"1234", "9"}
    r = rows["1234"]
    assert r["NOM"] == "DUPONT"
    assert r["PRENOMS"] == "JEAN PIERRE"
    assert r["SEXE"] == "M"
    assert str(r["DATE_NAISSANCE_NORM"]) == "1921-01-10"
    # accent folding + uppercase from normalize
    assert rows["9"]["NOM"] == "DECES"
    # 20201399: day 99 → 31, month 13 → 12 (the state machine cascade)
    assert str(rows["9"]["DATE_DECES_NORM"]) == "2020-12-31"
    # 00000000 birth date → '' → NULL after parse
    assert rows["9"]["DATE_NAISSANCE_NORM"] is None
    assert len(r["UID"]) == 12
    assert "NOM_PRENOMS" not in out.columns


def test_date_state_machine_rules(spark):
    """The 13-regex sanitizer (deces_dataprep.yml:80-94 semantics)."""
    cases = [
        ("1981-02-31", "19810301"),  # strip seps; Feb 31 → Mar 1
        ("00000000", ""),
        ("19810545", "19810531"),    # day>31 → 31
        ("19810245", "19810301"),    # day 45 → 31, then Feb 31 → Mar 1 (cascade)
        ("19811501", "19811201"),    # month 13-19 → 12
        ("19000229", "19000228"),    # non-leap Feb 29 → 28 (00-year approx)
        ("19840229", "19840229"),    # leap year kept
        ("19810431", "19810430"),    # 31st of 30-day month
        ("19810831", "19810831"),    # August 31 is VALID (round-1 bug: →30)
        ("19812201", "19810201"),    # month 21-99 → 0<units> (ref /[2-9]([1-9])/)
        ("19819931", "19810930"),    # month 99 → 09, then Sep 31 → 30 (cascade)
        ("19812000", "19810101"),    # month 20 → 01 (ref /[2-9]0/), day 00 → 01
        ("19842229", "19840229"),    # month 22 → 02, leap Feb 29 kept
        ("19810100", "19810101"),    # day 00 → 01
        ("19810001", "19810101"),    # month 00 → 01
    ]
    from deces_dataprep_spark.operators.dataprep import sanitize_dates

    df = spark.createDataFrame([(c,) for c, _ in cases], "d string")
    got = [r["d"] for r in sanitize_dates(df, "^d$").collect()]
    want = [w for _, w in cases]
    assert got == want
