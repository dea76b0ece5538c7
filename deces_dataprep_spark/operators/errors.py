"""Error-budgeted execution — the reference's ERR_MAX contract.

The reference tolerates up to ``ERR_MAX=20`` failed chunks per run
("Ooops" lines scraped from the log, ``Makefile:19,199``) and aborts
past the budget. Two Spark-native lowerings:

* :func:`run_budgeted` — the **exact, retry-safe** path: failed batches
  emit a marker row instead of touching driver state, the output is
  persisted once, and markers are counted from the materialized result
  — task retries / speculative re-runs / repeated actions recompute the
  same rows, never double-count.
* :func:`tolerant_map_in_pandas` + :func:`check_budget` — the cheap
  accumulator variant. Spark only guarantees exactly-once accumulator
  updates inside *actions*; updates from transformations (this case)
  re-fire on task retries and speculative duplicates, so the count is
  an **upper bound** — fine for a lenient budget, use
  :func:`run_budgeted` when the budget is tight or speculation is on.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ErrorBudgetExceeded(RuntimeError):
    def __init__(self, errors: int, budget: int):
        super().__init__(f"{errors} failed batches > error budget {budget}")
        self.errors = errors
        self.budget = budget


def _schema_col_names(schema: str) -> list[str]:
    """First identifier of each comma-separated ``name type`` pair.
    Only flat DDL schemas are supported (no nested struct commas)."""
    return [part.strip().split()[0] for part in schema.split(",") if part.strip()]


def budgeted_map_in_pandas(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
) -> DataFrame:
    """Apply ``fn`` per Arrow batch; a failed batch yields ONE all-null
    marker row with ``__err = 1`` instead of its output rows. The marker
    travels with the data, so counting failures is an ordinary
    (retry-safe) aggregation over the result."""
    names = _schema_col_names(schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            try:
                out = fn(b)
                out = out.copy()
                out["__err"] = None
                yield out
            except Exception:  # noqa: BLE001 — the budget IS the policy
                marker = pd.DataFrame({c: [None] for c in names})
                marker["__err"] = [1]
                yield marker

    return df.mapInPandas(run, schema + ", __err int")


def run_budgeted(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    max_errors: int = 20,
) -> tuple[DataFrame, int]:
    """Exact error-budgeted execution: returns ``(good_rows, n_errors)``
    or raises :class:`ErrorBudgetExceeded`.

    The marked output is persisted and the marker count read from the
    materialized result, so a task retry (which re-emits the same
    marker row, replacing — not adding to — the lost attempt's output)
    cannot inflate the count, and downstream actions on ``good_rows``
    reuse the persisted data instead of re-running ``fn``. Callers own
    ``good_rows.unpersist()`` when done.
    """
    marked = budgeted_map_in_pandas(df, fn, schema).persist()
    n_err = marked.filter(F.col("__err") == 1).count()
    if n_err > max_errors:
        marked.unpersist()
        raise ErrorBudgetExceeded(n_err, max_errors)
    return marked.filter(F.col("__err").isNull()).drop("__err"), n_err


def tolerant_map_in_pandas(
    spark: SparkSession,
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
):
    """Apply ``fn`` per Arrow batch, swallowing per-batch failures.

    Returns ``(out_df, err_acc)`` — the transformed DataFrame and an
    accumulator counting failed batches. The count is an UPPER BOUND
    (transformation-side accumulator: task retries, speculative
    duplicates, and re-running an action all re-add) — disable
    speculation for budgeted jobs or use :func:`run_budgeted` for the
    exact contract. Rows of a failed batch are dropped (the reference
    drops the failed chunk the same way).
    """
    acc = spark.sparkContext.accumulator(0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            try:
                yield fn(b)
            except Exception:  # noqa: BLE001 — the budget IS the policy
                acc.add(1)

    return df.mapInPandas(run, schema), acc


def check_budget(err_acc, max_errors: int = 20) -> int:
    """Raise when the accumulated failures exceed the budget; returns
    the error count otherwise (0 is the healthy case)."""
    n = int(err_acc.value)
    if n > max_errors:
        raise ErrorBudgetExceeded(n, max_errors)
    return n
