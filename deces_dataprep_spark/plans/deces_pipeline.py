"""The complete reference dataflow, re-expressed as one Spark plan.

Mirrors ``projects/deces-dataprep/recipes/deces_dataprep.yml`` step by
step (file:line citations inline) with the same observable semantics,
lowered to native Catalyst expressions plus the two parity-critical
pandas kernels (NFKD fold, pandas ``str.title``). The whole ~40-step
recipe fuses into a handful of codegen'd stages — no chunk loop.

Deviations (documented, ES-observable-equivalent):
* multivalued outputs (COMMUNE_*, CODE_POSTAL_*, *_HISTORIQUE) are
  always ``array<string>`` — the reference emits str-or-list and lets
  Elasticsearch treat both as multivalued; Spark needs one type.
* ``UID`` uses md5 (blake3 unavailable offline) — same shape/length,
  digest differs (deces_dataprep.yml:14 uses blake3).
* ``GEOPOINT_*`` is parsed into ``struct<lat double, lon double>``
  (ES accepts the reference's raw "lat,lon" string form directly).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from deces_dataprep_spark.operators import dataprep as ops
from deces_dataprep_spark.operators.dataprep import title_case_udf

# ---------------------------------------------------------------------------
# data constants from the recipe (public INSEE COG facts)
# ---------------------------------------------------------------------------

# ex-colonies / DOM / foreign-code rewrites (deces_dataprep.yml:107-134,
# 248-274 — identical table on both the naissance and décès side)
COLONY_COG_RULES: list[tuple[str, str]] = [
    ("^98201", "99336"), ("^98202", "99341"), ("^98203", "99330"),
    ("^98204", "99326"), ("^98205", "99327"), ("^98206", "99335"),
    ("^98207", "99337"), ("^98208", "99345"), ("^98209", "99331"),
    ("^98301", "99328"), ("^98302", "99324"), ("^98303", "99323"),
    ("^98304", "99344"), ("^98305", "99322"), ("^98401", "99333"),
    ("^98402", "99397"), ("^98405", "XXXXX"), ("^98406", "99399"),
    ("^99143", "99254"),
    (r"^9(1|2|3|4)352$", "99352"),
    (r"^98(4|5|6|7|8)(..)$", "XXXXX"),
    (r"^9[0-5](...)$", "XXXXX"),
    (r"^97[1-6](..)$", "XXXXX"),
    (r"^[0-8]....$", "XXXXX"),
]
# the naissance side additionally maps Vietnam births (deces_dataprep.yml:128)
COLONY_COG_RULES_NAISSANCE = COLONY_COG_RULES[:18] + [
    ("^98506", "99243")
] + COLONY_COG_RULES[18:]

# INSEE normalization before the citycodes join (deces_dataprep.yml:231-238,
# 289-296)
INSEE_NORM_RULES: list[tuple[str, str]] = [
    (r"^9.352$", ""),
    (r"^985(..)$", "976$1"),
    (r"^98405", "97409"),
    (r"^98(2|3|4).*$", ""),
    (r"^99.*$", ""),
]


@F.pandas_udf(StringType())
def _fold_upper_udf(s: pd.Series) -> pd.Series:
    """matchID `normalize` as used at deces_dataprep.yml:10-11: NFKD →
    ascii → UPPER, punctuation preserved (the recipe's own regexes
    still match `*`, `/`, ` ?` afterwards, so it cannot collapse)."""
    return (
        s.astype("string").str.normalize("NFKD")
        .str.encode("ascii", "ignore").str.decode("ascii").str.upper()
    )


def _fold_upper(col):
    return _fold_upper_udf(col)


def _as_array(col):
    """str-or-'/'-joined → array<string> (the multivalued unification)."""
    return F.split(col, "/")


def _quoted_list(col):
    """The recipe's quoted-CSV cell handling (deces_dataprep.yml:214-218):
    strip everything but [AB0-9,] then split on ','."""
    cleaned = F.regexp_replace(col, "[^AB0-9,]", "")
    return F.when(col.contains('"'), F.split(cleaned, ",")).otherwise(
        F.when(col == "", F.array().cast("array<string>")).otherwise(F.array(col))
    )


def _join_lookup(df, lookup, strict, select):
    return ops.join_lookup(df, lookup, strict, select)


def _pays_side(df: DataFrame, side: str, countries: DataFrame) -> DataFrame:
    """PAYS_{side} enrichment (naissance: deces_dataprep.yml:105-155;
    décès: :246-284)."""
    code = f"PAYS_{side}_CODE"
    rules = COLONY_COG_RULES_NAISSANCE if side == "NAISSANCE" else COLONY_COG_RULES
    df = ops.map_cols(df, {code: f"CODE_INSEE_{side}"})
    df = ops.replace(df, f"^{code}$", rules)
    if side == "NAISSANCE":
        df = _join_lookup(df, countries, {code: "COG"},
                          {"PAYS_NAISSANCE_CODEISO3": "CODEISO3",
                           "PAYS_NAISSANCE_LIBCOG": "LIBCOG"})
        lib = title_case_udf(F.col("PAYS_NAISSANCE_LIBCOG"))
        pays = title_case_udf(F.col("PAYS_NAISSANCE"))
        # 3-way merge (deces_dataprep.yml:143-152)
        df = df.withColumn(
            "PAYS_NAISSANCE",
            F.when(F.col("PAYS_NAISSANCE") == "", lib)
            .when(F.col("PAYS_NAISSANCE") != F.col("PAYS_NAISSANCE_LIBCOG"),
                  F.concat(lib, F.lit(", "), pays))
            .otherwise(pays),
        ).drop("PAYS_NAISSANCE_LIBCOG")
    else:
        df = _join_lookup(df, countries, {code: "COG"},
                          {"PAYS_DECES_CODEISO3": "CODEISO3",
                           "PAYS_DECES": "LIBCOG"})
        df = df.withColumn("PAYS_DECES", title_case_udf(F.col("PAYS_DECES")))
    return df


def _commune_side(df: DataFrame, side: str, citycodes: DataFrame) -> DataFrame:
    """Commune/INSEE enrichment. naissance: deces_dataprep.yml:157-244
    (with the REF/ALTER disambiguation); décès: :286-347 (simpler)."""
    norm = f"CODE_INSEE_{side}_NORM"
    df = ops.map_cols(df, {norm: f"CODE_INSEE_{side}"})
    df = ops.replace(df, f"^{norm}$", INSEE_NORM_RULES)

    if side == "NAISSANCE":
        sel = {
            "CODE_INSEE_NAISSANCE_HISTORIQUE": "insee_code_history",
            "CODE_POSTAL_NAISSANCE": "Code postal",
            "COMMUNE_NAISSANCE_REF": "name",
            "COMMUNE_NAISSANCE_ALTER": "newest_name",
            "DEPARTEMENT_NAISSANCE": "dep_code",
            "GEOPOINT_NAISSANCE": "geopoint_2d",
        }
    else:
        sel = {
            "CODE_INSEE_DECES_HISTORIQUE": "insee_code_history",
            "CODE_POSTAL_DECES": "Code postal",
            "COMMUNE_DECES": "name",
            "COMMUNE_DECES_ALTER": "newest_name",
            "DEPARTEMENT_DECES": "dep_code",
            "GEOPOINT_DECES": "geopoint_2d",
        }
    df = _join_lookup(df, citycodes, {norm: "insee_code"}, sel)

    com = f"COMMUNE_{side}"
    alter = F.col(f"{com}_ALTER")
    if side == "NAISSANCE":
        # title + "(X)" suffix promotion (deces_dataprep.yml:179-184)
        df = df.withColumn(com, title_case_udf(F.col(com)))
        df = ops.replace(df, f"^{com}$", [(r"^(.*)\s*\((\w+)\)$", "$2 $1")])
        ref = F.col(f"{com}_REF")
        folded_ref = title_case_udf(_fold_upper(ref))
        folded_alter = title_case_udf(_fold_upper(alter))
        all1 = F.when(F.col(com) == folded_ref, ref).otherwise(
            F.when(ref == "", F.col(com)).otherwise(
                F.concat(F.col(com), F.lit("/"), ref)
            )
        )
        df = df.withColumn(f"{com}_ALL", all1)
        all2 = F.when(ref == alter, F.col(f"{com}_ALL")).otherwise(
            F.when(F.col(com) == folded_alter, F.col(f"{com}_ALL")).otherwise(
                F.concat(F.col(f"{com}_ALL"), F.lit("/"), alter)
            )
        )
        df = df.withColumn(f"{com}_ALL", all2)
        arr_prefix = F.concat(
            F.regexp_replace(ref, r"^(\w+)\s.*$", "$1"), F.lit("/"), ref
        )
        df = df.withColumn(
            com,
            F.when(ref.contains("Arrondissement"), arr_prefix)
            .otherwise(F.col(f"{com}_ALL")),
        )
    else:
        # décès variant (deces_dataprep.yml:309-327)
        merged = F.when(F.col(com) == alter, F.col(com)).otherwise(
            F.when(alter == "", F.col(com)).otherwise(
                F.concat(F.col(com), F.lit("/"), alter)
            )
        )
        df = df.withColumn(com, merged)
        arr_prefix = F.concat(
            F.regexp_replace(F.col(com), r"^(\w+)\s.*$", "$1"),
            F.lit("/"), F.col(com),
        )
        df = df.withColumn(
            com,
            F.when(F.col(com).contains("Arrondissement"), arr_prefix)
            .otherwise(F.col(com)),
        )

    df = df.withColumn(com, _as_array(F.col(com)))
    cp = f"CODE_POSTAL_{side}"
    df = df.withColumn(cp, _quoted_list(F.col(cp)))

    # department fallback from the raw INSEE code (naissance only,
    # deces_dataprep.yml:219-228)
    if side == "NAISSANCE":
        dep = F.col("DEPARTEMENT_NAISSANCE")
        fallback = F.when(
            F.col("PAYS_NAISSANCE_CODE").rlike("^XXXXX"),
            F.regexp_replace(F.col("CODE_INSEE_NAISSANCE"), "...$", ""),
        ).otherwise(dep)
        df = df.withColumn(
            "DEPARTEMENT_NAISSANCE", F.when(dep == "", fallback).otherwise(dep)
        )

    # historique array (deces_dataprep.yml:231-244, 334-347)
    hist = F.col(f"CODE_INSEE_{side}_HISTORIQUE")
    cleaned_list = F.split(F.regexp_replace(hist, "[^AB0-9,]", ""), ",")
    cleaned_one = F.array(F.regexp_replace(hist, "[^AB0-9]", ""))
    pays_code = F.col(f"PAYS_{side}_CODE")
    insee = F.col(f"CODE_INSEE_{side}")
    df = df.withColumn(
        f"CODE_INSEE_{side}_HISTORIQUE",
        F.when(hist.contains('"'),
               F.when(hist.contains(","), cleaned_list).otherwise(cleaned_one))
        .otherwise(
            F.when(insee == pays_code, F.array(insee))
            .otherwise(F.split(F.concat(pays_code, F.lit(","), insee), ","))
        ),
    )

    # geo_point struct from the "lat,lon" cell
    geo = f"GEOPOINT_{side}"
    parts = F.split(F.col(geo), ",")
    df = df.withColumn(
        geo,
        F.when(
            F.col(geo) != "",
            F.struct(
                F.get(parts, 0).cast("double").alias("lat"),
                F.get(parts, 1).cast("double").alias("lon"),
            ),
        ),
    )
    drop = [norm] + ([f"{com}_REF", f"{com}_ALL"] if side == "NAISSANCE" else [])
    return df.drop(*drop, f"{com}_ALTER")


def deces_pipeline(
    spark: SparkSession,
    src: DataFrame,
    countries: DataFrame,
    citycodes: DataFrame,
    oppositions: DataFrame,
) -> DataFrame:
    """src (fwf columns + SOURCE/SOURCE_LINE) → the deces_index document
    shape. All lookups are broadcast left joins with '' fill; RGPD
    oppositions are dropped (left-anti)."""
    df = src

    # normalize (deces_dataprep.yml:10-11) — fold+upper, punct preserved
    for c in ("NOM_PRENOMS", "COMMUNE_NAISSANCE", "PAYS_NAISSANCE", "NUM_DECES"):
        df = df.withColumn(c, _fold_upper(F.col(c)))

    # UID over the source tuple (deces_dataprep.yml:14-15; md5 offline)
    df = ops.with_uid(
        df, [c for c in df.columns if c not in ("SOURCE", "SOURCE_LINE")], "UID"
    ).withColumn("_id", F.col("UID"))

    # NUM_DECES / SOURCE trims (deces_dataprep.yml:18-27)
    df = ops.replace(df, "^NUM_DECES$", [("(.{9}).*", "$1"), (r"\s*$", "")])
    df = ops.replace(df, "^SOURCE$", [(".*/deces-", ""), (".txt.gz", "")])
    # '\s?' → X (deces_dataprep.yml:28-31; the PAYS_NAISSACE typo is the
    # reference's own — PAYS_NAISSANCE is genuinely not rewritten)
    df = ops.replace(df, "(NOM_PRENOMS|COMMUNE_NAISSANCE|PAYS_NAISSACE)$",
                     [(r"\s\?", "X")])

    df = ops.map_cols(df, {"NOM": "NOM_PRENOMS", "PRENOMS": "NOM_PRENOMS",
                           "PRENOM": "NOM_PRENOMS"})

    # RGPD oppositions: tag→filter in the reference (deces_dataprep.yml:
    # 37-50); fused to one broadcast left-anti join (same observable)
    df = ops.anti_join(
        df, oppositions,
        {"CODE_INSEE_DECES": "Code du lieu de décès",
         "DATE_DECES": "Date de décès",
         "NUM_DECES": "Numéro d'acte de décès"},
    )
    df = df.withColumn(
        "SEXE", F.when(F.col("SEXE") == "2", "F").otherwise("M")
    )

    # name splits (deces_dataprep.yml:53-75)
    df = ops.replace(df, "NOM$", [(r"^(.*)\*.*/$", "$1")])
    df = ops.replace(df, "PRENOMS?$", [(r"^.*\*(.*)/$", "$1")])
    df = ops.replace(df, "PRENOM$", [(r"^(\S*)\s*.*$", "$1")])
    df = ops.delete(df, "^NOM_PRENOMS$")
    for c in ("NOM", "PRENOMS", "PRENOM"):
        df = df.withColumn(c, title_case_udf(F.col(c)))
    df = df.withColumn(
        "PRENOMS_NOM", F.lower(F.concat_ws(" ", "PRENOMS", "NOM"))
    ).withColumn("PRENOM_NOM", F.lower(F.concat_ws(" ", "PRENOM", "NOM")))

    # dates (deces_dataprep.yml:77-103)
    df = ops.map_cols(df, {"DATE_NAISSANCE_NORM": "DATE_NAISSANCE",
                           "DATE_DECES_NORM": "DATE_DECES"})
    df = ops.sanitize_dates(df, r"DATE_(DECES|NAISSANCE)_NORM")
    for c in ("DATE_NAISSANCE_NORM", "DATE_DECES_NORM"):
        df = df.withColumn(f"{c}_D", F.try_to_date(F.col(c), "yyyyMMdd"))
    df = df.withColumn(
        "AGE_DECES",
        F.when(
            F.col("DATE_DECES") > F.col("DATE_NAISSANCE"),  # string compare
            ops.age_years_col(F.col("DATE_NAISSANCE_NORM_D"),
                              F.col("DATE_DECES_NORM_D")),
        ),
    )
    # *_NORM back to yyyyMMdd strings (NaT → NULL), as the reference does
    for c in ("DATE_NAISSANCE_NORM", "DATE_DECES_NORM"):
        df = df.withColumn(c, F.date_format(F.col(f"{c}_D"), "yyyyMMdd")).drop(
            f"{c}_D"
        )

    df = _pays_side(df, "NAISSANCE", countries)
    df = _commune_side(df, "NAISSANCE", citycodes)
    df = _pays_side(df, "DECES", countries)
    df = _commune_side(df, "DECES", citycodes)

    # final column hygiene (deces_dataprep.yml:348-351)
    df = ops.delete(df, r"PAYS_(NAISSANCE|DECES)_CODE$")
    return df
