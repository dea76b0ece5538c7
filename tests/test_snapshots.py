"""Snapshot log, shard-level resume, lineage and metrics (SURVEY §7.2;
north_rule: 'resumable from checkpoint with per-partition lineage +
metrics'). Mirrors the reference's content-addressed skip
(Makefile:95-125,177-181) at shard granularity."""

import json
import os

import pytest
from pyspark.sql import functions as F

from deces_dataprep_spark.snapshots import (
    SnapshotLog,
    load_index,
    pipeline_version,
    write_index,
)


@pytest.fixture()
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _index_content_hash(spark, warehouse: str) -> str:
    """Order-insensitive content hash of the full postings table."""
    t = load_index(spark, warehouse)
    row = (
        t.postings.select(
            F.md5(
                F.concat_ws(
                    "|", "shard", "term", "block_id", "n_docs", "first_doc",
                    "last_doc", F.hex("doc_gaps"), F.hex("tfs"),
                    F.round("block_max_tfnorm", 9), "sum_tf",
                )
            ).alias("h")
        )
        .agg(F.md5(F.concat_ws("", F.array_join(F.array_sort(F.collect_list("h")), ""))).alias("all"))
        .collect()[0]
    )
    return row["all"]


def test_write_load_roundtrip(spark, docs, tmp_path):
    wh = str(tmp_path / "wh")
    res = write_index(spark, docs, wh, n_shards=4, resume=False)
    assert sorted(res.shards_built) == [0, 1, 2, 3]
    assert res.shards_skipped == []
    t = load_index(spark, wh)
    assert t.stats.collect()[0]["n_docs"] == docs.count()
    # lineage markers exist with counts
    for s in range(4):
        with open(os.path.join(wh, "postings", f"shard={s}", "_DONE.json")) as f:
            lin = json.load(f)
        assert lin["shard"] == s
        assert lin["postings"] > 0
        assert lin["pipeline_version"] == pipeline_version()
    # metrics table written (one norms row + one per shard)
    m = spark.read.parquet(os.path.join(wh, "metrics"))
    assert m.filter(F.col("stage") == "postings").count() == 4
    assert m.filter(F.col("stage") == "norms").count() == 1


def test_resume_skips_done_shards_and_is_identical(spark, docs, tmp_path):
    wh_full = str(tmp_path / "full")
    write_index(spark, docs, wh_full, n_shards=4, resume=False, shard_batch=1)
    want = _index_content_hash(spark, wh_full)

    # simulate a killed run: build everything, then delete two shards'
    # data + markers (as if the job died before writing them)
    wh = str(tmp_path / "killed")
    write_index(spark, docs, wh, n_shards=4, resume=False, shard_batch=1)
    import shutil

    for s in (2, 3):
        shutil.rmtree(os.path.join(wh, "postings", f"shard={s}"))
    # resume: shards 0,1 must be skipped, 2,3 rebuilt; index identical
    res = write_index(spark, docs, wh, n_shards=4, resume=True, shard_batch=1)
    assert sorted(res.shards_skipped) == [0, 1]
    assert sorted(res.shards_built) == [2, 3]
    assert _index_content_hash(spark, wh) == want


def test_memoized_skip_by_version_and_tag(spark, docs, tmp_path):
    wh = str(tmp_path / "memo")
    paths = ["/root/testdata/sf0.001/documents.parquet"]
    r1 = write_index(spark, docs, wh, n_shards=2, resume=True, input_paths=paths)
    assert r1.shards_built == [0, 1]
    # identical (pipeline_version, input_tag) → whole run skipped
    r2 = write_index(spark, docs, wh, n_shards=2, resume=True, input_paths=paths)
    assert r2.shards_built == []
    assert r2.shards_skipped == [0, 1]
    assert r2.snapshot["snapshot_id"] == r1.snapshot["snapshot_id"]


def test_snapshot_log_atomic_commit(tmp_path):
    log = SnapshotLog(str(tmp_path))
    assert log.latest() is None
    s1 = log.commit({}, "v1", "tagA", "run1")
    s2 = log.commit({}, "v1", "tagB", "run2")
    assert log.latest()["snapshot_id"] == s2["snapshot_id"]
    assert s2["parent_id"] == s1["snapshot_id"]
    assert log.find("v1", "tagA")["run_id"] == "run1"
    assert log.find("v2", "tagA") is None
    # half-written manifests (tmp files) are invisible
    with open(os.path.join(str(tmp_path), "_snapshots", ".3.json.tmp-x"), "w") as f:
        f.write("{}")
    assert log.latest()["snapshot_id"] == s2["snapshot_id"]
