"""CLI smoke: build -> query -> time-travel query, in-process (the same
argv surface spark-submit drives)."""

import json

from deces_dataprep_spark.cli import main


def test_cli_build_and_query(spark, tmp_path, capsys):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(inp)
    wh = str(tmp_path / "wh")

    assert main(["build", "--input", inp, "--warehouse", wh,
                 "--shards", "2"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["shards_built"] == [0, 1]

    assert main(["query", "--warehouse", wh,
                 "--q", "spark merge sort table", "-k", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 5
    assert out["hits"][0]["score"] >= out["hits"][-1]["score"]

    # resume: rebuild is a no-op (memoized by input tag + version)
    assert main(["build", "--input", inp, "--warehouse", wh,
                 "--shards", "2"]) == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["shards_built"] == []
    assert again["snapshot_id"] == built["snapshot_id"]

    # the search-box grammar through the serving tier
    assert main(["query-string", "--warehouse", wh,
                 "--q", "spark +(merge | sort) -zzzz tab*",
                 "-k", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 5
    assert out["hits"][0]["score"] >= out["hits"][-1]["score"]


def test_cli_recipe_over_fwf(spark, tmp_path, capsys):
    """recipe subcommand: latin1 fwf files + a reference-format YAML
    recipe -> cleaned parquet."""
    import gzip

    from deces_dataprep_spark.sources.fwf import DECES_WIDTHS

    d = tmp_path / "fwf"
    d.mkdir()
    rows = [["DUPONT*ÉMILE/", "1", "19210110", "75101", "PARIS",
             "FRANCE", "19990101", "75102", "1"]]
    with gzip.open(d / "deces-2020.txt.gz", "wb") as f:
        for row in rows:
            line = "".join(v.ljust(w)[:w] for v, w in zip(row, DECES_WIDTHS))
            f.write((line + "\n").encode("latin1"))
    recipe = tmp_path / "r.yml"
    recipe.write_text(
        "recipes:\n mini:\n  steps:\n"
        "   - normalize:\n      select: NOM_PRENOMS$\n"
        "   - replace:\n      select: NOM_PRENOMS$\n      regex:\n"
        "       - '([^ ]*) .*': '\\1'\n"
        "   - delete:\n      select: (COMMUNE|PAYS|CODE)\n"
    )
    out = str(tmp_path / "out")
    assert main(["recipe", "--input-fwf", str(d), "--pattern",
                 r"deces-.*\.txt\.gz", "--recipe", str(recipe),
                 "--output", out]) == 0
    row = spark.read.parquet(out).collect()[0]
    assert row["NOM_PRENOMS"] == "DUPONT"   # normalize folded É, split kept NOM
    assert row["SOURCE_LINE"] == 1
    assert "COMMUNE_NAISSANCE" not in spark.read.parquet(out).columns


def test_cli_backup_restore_curate(spark, tmp_path, capsys):
    """backup -> restore into a fresh warehouse -> query it; then the
    curate job end-to-end (no benchmark: decontamination gate open)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    inp = str(tmp_path / "docs")
    docs.write.mode("overwrite").parquet(inp)
    wh, repo, wh2 = (str(tmp_path / d) for d in ("wh", "repo", "wh2"))

    assert main(["build", "--input", inp, "--warehouse", wh,
                 "--shards", "2"]) == 0
    capsys.readouterr()
    assert main(["backup", "--warehouse", wh, "--repository", repo]) == 0
    exported = json.loads(capsys.readouterr().out.strip())["exported_to"]
    assert main(["restore", "--export-dir", exported,
                 "--warehouse", wh2]) == 0
    capsys.readouterr()
    assert main(["query", "--warehouse", wh2,
                 "--q", "spark merge sort table", "-k", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 5

    curated = str(tmp_path / "curated")
    assert main(["curate", "--input", inp, "--output", curated,
                 "--langs", "en,fr,de,und"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < res["rows_kept"] <= res["rows_in"]


def test_cli_recipe_csv_export(spark, tmp_path, capsys):
    """CSV export sink (the reference's deces_csv.yml dataset: ';' sep,
    header): round-trips with accented content intact."""
    import gzip

    from deces_dataprep_spark.sources.fwf import DECES_WIDTHS

    d = tmp_path / "fwf"
    d.mkdir()
    with gzip.open(d / "deces-2021.txt.gz", "wb") as f:
        row = ["MARTIN*ZOÉ/", "2", "19400215", "75101", "PARIS",
               "FRANCE", "20200101", "75102", "2"]
        line = "".join(v.ljust(w)[:w] for v, w in zip(row, DECES_WIDTHS))
        f.write((line + "\n").encode("latin1"))
    recipe = tmp_path / "r.yml"
    recipe.write_text("recipes:\n mini:\n  steps:\n"
                      "   - delete:\n      select: (CODE|COMMUNE)\n")
    out = str(tmp_path / "out_csv")
    assert main(["recipe", "--input-fwf", str(d), "--pattern",
                 r"deces-.*\.txt\.gz", "--recipe", str(recipe),
                 "--output", out, "--output-format", "csv"]) == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["rows"] == 1
    got = spark.read.option("sep", ";").option("header", True).csv(out)
    row = got.collect()[0]
    assert "ZOÉ" in row["NOM_PRENOMS"]


def test_cli_alias_swap_and_query(spark, tmp_path, capsys):
    """alias set → query --alias serves the aliased snapshot; the swap
    is one CLI call."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "pages")
    docs.write.parquet(src)
    wh = str(tmp_path / "wh")
    assert main(["build", "--input", src, "--warehouse", wh,
                 "--shards", "2"]) == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    sid = built["snapshot_id"]
    assert main(["alias", "set", "--warehouse", wh, "--name", "serving",
                 "--snapshot", str(sid)]) == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec == {"alias": "serving", "snapshot_id": sid,
                   "updated_at_unix": rec["updated_at_unix"]}
    assert main(["query", "--warehouse", wh, "--alias", "serving",
                 "--q", "merge sort", "-k", "3"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hits"]) == 3
    assert main(["alias", "list", "--warehouse", wh]) == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) \
        == {"serving": sid}
