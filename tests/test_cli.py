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
