"""Error-budgeted execution — the reference's ERR_MAX contract.

The reference tolerates up to ``ERR_MAX=20`` failed chunks per run
("Ooops" lines scraped from the log, ``Makefile:19,199``) and aborts
past the budget. Spark-native equivalent: a ``mapInPandas`` wrapper
that catches per-batch exceptions, counts them in a ``LongAccumulator``
(visible to the driver mid-job), emits nothing for failed batches, and
a post-job check that fails the run when the budget is exceeded.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


class ErrorBudgetExceeded(RuntimeError):
    def __init__(self, errors: int, budget: int):
        super().__init__(f"{errors} failed batches > error budget {budget}")
        self.errors = errors
        self.budget = budget


def tolerant_map_in_pandas(
    spark: SparkSession,
    df: DataFrame,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
):
    """Apply ``fn`` per Arrow batch, swallowing per-batch failures.

    Returns ``(out_df, err_acc)`` — the transformed DataFrame and the
    accumulator counting failed batches. Callers run an action, then
    ``check_budget(err_acc, max_errors)``. Rows of a failed batch are
    dropped (the reference drops the failed chunk the same way).
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
