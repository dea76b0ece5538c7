"""Serving-tier index reader: pyarrow, no Spark job per query.

Spark is the build/refresh tier; at serve time a query needs a handful
of posting blocks, and launching a Spark job (scheduler + task launch +
whole-stage codegen) per lookup costs seconds where the actual IO is
milliseconds. A serving node instead reads the committed snapshot's
parquet files directly — exactly how an ES data node reads its local
segments — with the same pruning the Spark path gets:

* ``term IN (...)`` is evaluated against parquet row-group statistics
  (the build sorts postings by term within each file, so each term
  touches ~1 row group per file);
* the hive ``shard=`` path component is parsed into a column for free.

The reader is handed the snapshot manifest's FILE LIST (not the live
directory), so serving stays pinned to a snapshot while later commits
append — the same time-travel guarantee the Spark reader has.
"""

from __future__ import annotations

import numpy as np


class ArrowIndexReader:
    """Driver/serving-node reader over a committed snapshot's files."""

    def __init__(self, files: dict[str, list[str]]):
        import pyarrow.dataset as ds

        self._ds = ds
        self._post = ds.dataset(files["postings"], format="parquet",
                                partitioning="hive")
        self._dict = ds.dataset(files["dictionary"], format="parquet")
        self._norms = ds.dataset(files["norms"], format="parquet")
        self._stats = ds.dataset(files["stats"], format="parquet")

    @classmethod
    def maybe(cls, files: dict[str, list[str]] | None):
        """An ArrowIndexReader when the manifest file lists are known
        (local paths), else None (fall back to the Spark reader)."""
        if not files:
            return None
        needed = {"postings", "dictionary", "norms", "stats"}
        if not needed.issubset(files):
            return None
        return cls({k: files[k] for k in needed})

    def stats(self) -> tuple[int, float]:
        t = self._stats.to_table()
        return int(t["n_docs"][0].as_py()), float(t["avgdl"][0].as_py())

    def term_dfs(self, terms: list[str]) -> dict[str, int]:
        t = self._dict.to_table(
            columns=["term", "df"],
            filter=self._ds.field("term").isin(terms),
        )
        return dict(zip(t["term"].to_pylist(), t["df"].to_pylist()))

    def postings(self, terms: list[str]):
        """Block rows for the terms, sorted (shard, term, block_id);
        returned as a dict of numpy/py lists keyed by column."""
        t = self._post.to_table(filter=self._ds.field("term").isin(terms))
        t = t.sort_by([("shard", "ascending"), ("term", "ascending"),
                       ("block_id", "ascending")])
        return {
            "shard": t["shard"].to_numpy(zero_copy_only=False),
            "term": t["term"].to_pylist(),
            "block_id": t["block_id"].to_numpy(zero_copy_only=False),
            "n_docs": t["n_docs"].to_numpy(zero_copy_only=False),
            "first_doc": t["first_doc"].to_numpy(zero_copy_only=False),
            "last_doc": t["last_doc"].to_numpy(zero_copy_only=False),
            "doc_gaps": t["doc_gaps"].to_pylist(),
            "tfs": t["tfs"].to_pylist(),
            "block_max_tfnorm": t["block_max_tfnorm"].to_numpy(
                zero_copy_only=False),
        }

    def shard_norms(self, shard: int) -> tuple[np.ndarray, np.ndarray]:
        """(sorted doc_id uint64, aligned doc_len float64) for a shard."""
        t = self._norms.to_table(
            columns=["doc_id", "doc_len"],
            filter=self._ds.field("shard") == shard,
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype("uint64")
        dls = t["doc_len"].to_numpy(zero_copy_only=False).astype("float64")
        order = np.argsort(ids)
        return ids[order], dls[order]
