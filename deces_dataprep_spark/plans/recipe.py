"""The recipe language: an ordered list of declarative operator steps.

The reference's entire dataflow program is one YAML recipe
(``projects/deces-dataprep/recipes/deces_dataprep.yml`` — ``steps:`` at
line 9, ~40 steps), interpreted literally per pandas chunk by its
backend. Here a recipe is the same ordered step list, but each step
lowers to a declarative DataFrame transformation, so Catalyst fuses the
whole chain into a handful of codegen'd stages over an unbounded table
— there is no chunk loop and no step-by-step materialization.

Step forms (mirroring the reference's operator names):

    {"normalize":  {"select": "<col regex>"}}
    {"replace":    {"select": "<col regex>", "rules": [[pat, repl], ...]}}
    {"map":        {"NEW": "OLD", ...}}
    {"join":       {"lookup": <DataFrame>, "strict": {L: R}, "select": {NEW: RCOL}}}
    {"anti_join":  {"lookup": <DataFrame>, "on": {L: R}}}
    {"delete":     {"select": "<col regex>"}}
    {"parsedate":  {"select": "<col regex>", "format": "yyyyMMdd"}}
    {"sanitize_dates": {"select": "<col regex>"}}
    {"filter":     {"expr": "<SQL boolean expr>"}}
    {"uid":        {"cols": [...], "out": "UID"}}
    {"exec":       {"fn": callable(df) -> df}}      # escape hatch (the
                                                    # reference's `exec`)

``run_recipe(df, steps)`` applies them in order and returns the final
DataFrame (still a logical plan — nothing runs until an action).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

from deces_dataprep_spark.operators import dataprep as ops


def run_recipe(df: DataFrame, steps: Sequence[dict]) -> DataFrame:
    for step in steps:
        if len(step) != 1:
            raise ValueError(f"each step must have exactly one operator: {step}")
        (op, arg), = step.items()
        df = _apply(df, op, arg)
    return df


def _apply(df: DataFrame, op: str, arg) -> DataFrame:
    if op == "normalize":
        return ops.normalize(df, arg["select"])
    if op == "replace":
        return ops.replace(df, arg["select"], [tuple(r) for r in arg["rules"]])
    if op == "map":
        return ops.map_cols(df, arg)
    if op == "join":
        return ops.join_lookup(df, arg["lookup"], arg["strict"], arg["select"])
    if op == "anti_join":
        return ops.anti_join(df, arg["lookup"], arg["on"])
    if op == "delete":
        return ops.delete(df, arg["select"])
    if op == "parsedate":
        return ops.parsedate(df, arg["select"], arg.get("format", "yyyyMMdd"))
    if op == "sanitize_dates":
        return ops.sanitize_dates(df, arg["select"])
    if op == "filter":
        return df.filter(arg["expr"])
    if op == "uid":
        return ops.with_uid(df, arg["cols"], arg.get("out", "UID"),
                            arg.get("length", 12))
    if op == "exec":
        fn: Callable[[DataFrame], DataFrame] = arg["fn"]
        return fn(df)
    raise ValueError(f"unknown recipe operator: {op}")
