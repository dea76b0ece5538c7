"""YAML recipe loader: reference-shaped recipes (deces_dataprep.yml
format, !ENV tags, python backrefs, strptime formats, join-by-dataset-
name) run against the Spark engine unchanged for declarative steps;
exec blocks demand explicit handlers."""

import os

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.plans.yaml_recipe import (
    UnsupportedExecStep,
    parse_recipe_yaml,
    run_recipe_yaml,
    translate_steps,
)

RECIPE = r"""
recipes:
  mini:
    threads: !ENV ${RECIPE_THREADS}
    input: src
    steps:
      - normalize:
          select: (NOM|PAYS)$
      - replace:
          select: NUM$
          regex:
            - '(.{4}).*': '\1'
            - '\s*$': ''
      - map:
          PAYS_CODE: PAYS
      - join:
          dataset: pays_lookup
          type: in_memory
          strict:
            PAYS_CODE: name
          select:
            PAYS_ISO: iso
      - parsedate:
          select: DN$
          format: "%Y%m%d"
      - delete:
          select: PAYS_CODE$
"""


def test_yaml_recipe_end_to_end(spark):
    df = spark.createDataFrame(
        [("Émile Dupé", "france", "1234567  ", "19800312"),
         ("Ángela", "espagne", "42", "00000000")],
        "NOM string, PAYS string, NUM string, DN string",
    )
    lookup = spark.createDataFrame(
        [("FRANCE", "FR"), ("ESPAGNE", "ES")], "name string, iso string"
    )
    out = run_recipe_yaml(df, RECIPE, datasets={"pays_lookup": lookup})
    rows = {r["NOM"]: r for r in out.collect()}
    r = rows["EMILE DUPE"]                      # normalize: fold+upper
    assert r["PAYS"] == "FRANCE"
    assert r["NUM"] == "1234"                   # backref rule \1 -> $1
    assert r["PAYS_ISO"] == "FR"                # join by dataset name
    assert str(r["DN"]) == "1980-03-12"         # strptime -> yyyyMMdd
    assert "PAYS_CODE" not in out.columns
    assert rows["ANGELA"]["DN"] is None         # 00000000 unparseable


def test_exec_without_handler_raises():
    recipe = parse_recipe_yaml(
        "recipes:\n mini:\n  steps:\n   - exec:\n      - df['X'] = 1\n")
    with pytest.raises(UnsupportedExecStep) as e:
        translate_steps(recipe["steps"])
    assert "df['X'] = 1" in str(e.value)


def test_exec_handler_is_used(spark):
    recipe = "recipes:\n mini:\n  steps:\n   - exec:\n      - df['X'] = 1\n"
    df = spark.createDataFrame([(1,)], "a int")
    out = run_recipe_yaml(df, recipe,
                          exec_handlers={0: lambda d: d.withColumn("X", F.lit(1))})
    assert out.collect()[0]["X"] == 1


REF_RECIPE = "/root/reference/projects/deces-dataprep/recipes/deces_dataprep.yml"


@pytest.mark.skipif(not os.path.exists(REF_RECIPE),
                    reason="reference recipe not present")
def test_reference_recipe_parses_and_translates(spark):
    """The ACTUAL reference recipe file parses (incl. !ENV tags); every
    declarative step translates; the exec steps are precisely the ones
    flagged for handlers."""
    with open(REF_RECIPE) as f:
        text = f.read()
    recipe = parse_recipe_yaml(text, "deces_dataprep")
    steps = recipe["steps"]
    assert len(steps) > 30
    exec_idx = [i for i, s in enumerate(steps) if "exec" in s]
    join_ds = {s["join"]["dataset"] for s in steps if "join" in s}
    # dummy empty lookups so joins resolve; handlers = identity
    empty = {
        ds: spark.createDataFrame(
            [], ", ".join(f"`{c}` string" for c in
                          set(list(s["join"]["strict"].values())
                              + list(s["join"]["select"].values())))
        )
        for s in steps if "join" in s for ds in [s["join"]["dataset"]]
    }
    translated = translate_steps(
        steps, datasets=empty,
        exec_handlers={i: (lambda d: d) for i in exec_idx},
    )
    assert len(translated) == len(steps)
    assert join_ds  # the reference recipe does join lookups
