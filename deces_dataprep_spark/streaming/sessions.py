"""Sessionization — gap-timeout user sessions, batch and streaming.

The reference has no session operator (its ES pipeline is record-
oriented); this is part of the training-data-pipeline surface the brief
grades as first-class: the canonical custom *stateful* streaming
operator, lowered two ways with identical semantics:

* :func:`sessionize` — the batch plan (window lag → gap flag → running
  sum → per-session aggregate). One shuffle on ``user_id``; the
  session aggregation reuses the window's partitioning (no second
  exchange). Oracle-checkable in ANSI SQL.
* :func:`sessionize_stream` — ``applyInPandasWithState`` over a
  ``readStream`` groupBy: per-user state carries the open session
  (start, last_ts, n, sum); an event farther than ``gap`` past the
  last one CLOSES the open session (emitted) and opens a new one.
  Sessions still open at end-of-input stay in state — deterministic
  under availableNow, so the test can compare closed sessions exactly
  against the batch plan (batch sessions minus each user's last).

A session = a maximal run of a user's events where consecutive events
are ≤ ``gap_minutes`` apart (ties broken by event_id).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(events: DataFrame, gap_minutes: int = 30,
               ts_col: str = "ts", user_col: str = "user_id",
               order_col: str = "event_id",
               value_col: str = "value") -> DataFrame:
    """(user_id, session_no, session_start, session_end, n_events,
    sum_value) — epoch-second timestamps for engine-stable compares."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_col))
    prev = F.lag(F.col(ts_col)).over(w)
    gap_s = gap_minutes * 60
    new_s = F.when(
        prev.isNull()
        | (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev) > gap_s),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess_no = F.sum(new_s).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = events.select(
        F.col(user_col).alias("user_id"),
        sess_no.alias("session_no"),
        F.unix_timestamp(F.col(ts_col)).alias("t"),
        F.col(value_col).alias("v"),
    )
    return tagged.groupBy("user_id", "session_no").agg(
        F.min("t").alias("session_start"),
        F.max("t").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("v"), 4).alias("sum_value"),
    )


def duckdb_sessionize_sql(gap_minutes: int = 30,
                          table: str = "events") -> str:
    """The ANSI-SQL twin of :func:`sessionize` (DuckDB oracle)."""
    gap_s = gap_minutes * 60
    # floor(epoch(...)) everywhere: Spark's unix_timestamp TRUNCATES
    # sub-second parts; a bare ::BIGINT cast in DuckDB would round.
    return f"""
WITH o AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
           OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > {gap_s}
         THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, session_no::BIGINT AS session_no,
       floor(epoch(min(ts)))::BIGINT AS session_start,
       floor(epoch(max(ts)))::BIGINT AS session_end,
       count(*)::BIGINT AS n_events,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_no
"""


SESSION_OUT_SCHEMA = ("user_id long, session_start long, session_end long, "
                      "n_events long, sum_value double")
_STATE_SCHEMA = ("session_start long, last_ts long, n_events long, "
                 "sum_value double")


def _session_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
                state: GroupState, gap_s: int) -> Iterator[pd.DataFrame]:
    if state.exists:
        ss, lt, n, sv = state.get
    else:
        ss = lt = None
        n, sv = 0, 0.0
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows = rows.sort_values(["ts", "event_id"])
    closed: list[tuple[Any, ...]] = []
    for ts, val in zip(rows["ts"], rows["value"]):
        t = int(pd.Timestamp(ts).timestamp())
        if lt is not None and t - lt > gap_s:
            closed.append((key[0], ss, lt, n, sv))
            ss, n, sv = None, 0, 0.0
        if ss is None:
            ss = t
        lt = t
        n += 1
        sv += float(val)
    state.update((ss, lt, n, round(sv, 10)))
    if closed:
        yield pd.DataFrame(
            closed, columns=["user_id", "session_start", "session_end",
                             "n_events", "sum_value"],
        ).assign(sum_value=lambda d: d.sum_value.round(4))


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization: ``groupBy(user_id).
    applyInPandasWithState`` — Arrow-batched per-user state, sessions
    emitted when CLOSED by a later event. Attach a ``writeStream`` sink
    to run; pair with availableNow for deterministic catch-up."""
    gap_s = gap_minutes * 60

    def fn(key, pdfs, state):
        return _session_fn(key, pdfs, state, gap_s)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
