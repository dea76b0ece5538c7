"""Load reference-shaped YAML recipes into the Spark recipe runner.

The reference's users express their whole pipeline as YAML
(``projects/deces-dataprep/recipes/deces_dataprep.yml``: a ``recipes:
<name>:`` mapping with ``steps:`` — the format this loader accepts, so
an existing recipe file runs against this engine unchanged for every
*declarative* step):

* ``normalize/replace/map/join/parsedate/delete`` translate
  mechanically — including python→Java regex backrefs (``\\1`` → ``$1``)
  and strptime→Java datetime patterns (``%Y%m%d`` → ``yyyyMMdd``);
  ``join`` resolves its ``dataset:`` name through the ``datasets``
  mapping (name → DataFrame) the caller provides (the reference
  resolves the same names through its dataset catalog).
* ``!ENV ${VAR}`` tags resolve from the environment (the reference's
  convention), defaulting to "".
* ``exec`` steps are arbitrary pandas programs — not translatable
  mechanically. The caller supplies ``exec_handlers`` (step-index →
  ``fn(df) -> df``); a missing handler raises
  :class:`UnsupportedExecStep` carrying the raw source lines so the
  user can port that step (this engine's own port of the full deces
  recipe lives in ``plans/deces_pipeline.py``).
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable, Mapping

import yaml
from pyspark.sql import DataFrame

from deces_dataprep_spark.plans.recipe import run_recipe


class UnsupportedExecStep(ValueError):
    def __init__(self, index: int, lines: list[str]):
        super().__init__(
            f"recipe step {index} is an `exec` block (arbitrary pandas "
            f"code) with no handler supplied; pass exec_handlers[{index}] "
            f"= fn(df) -> df. Raw lines: {lines}"
        )
        self.index = index
        self.lines = lines


def _env_constructor(loader, node):
    raw = loader.construct_scalar(node)
    return re.sub(r"\$\{([^}]+)\}",
                  lambda m: os.environ.get(m.group(1), ""), raw)


def _yaml_loader():
    class _L(yaml.SafeLoader):
        pass

    _L.add_constructor("!ENV", _env_constructor)
    return _L


def parse_recipe_yaml(text: str, name: str | None = None) -> dict:
    """→ the recipe dict (input/output/steps) for ``name`` (or the only
    recipe in the file)."""
    doc = yaml.load(text, Loader=_yaml_loader())
    recipes = doc.get("recipes", doc)
    if name is None:
        if len(recipes) != 1:
            raise ValueError(f"file has {len(recipes)} recipes; pass name=")
        name = next(iter(recipes))
    return recipes[name]


def _java_backrefs(repl: str) -> str:
    # python/pandas `\1` → Java `$1`; literal `$` must be escaped
    return re.sub(r"\\(\d)", r"$\1", repl.replace("$", "\\$"))


_STRPTIME_TO_JAVA = [("%Y", "yyyy"), ("%m", "MM"), ("%d", "dd"),
                     ("%H", "HH"), ("%M", "mm"), ("%S", "ss")]


def _java_datetime(fmt: str) -> str:
    for a, b in _STRPTIME_TO_JAVA:
        fmt = fmt.replace(a, b)
    return fmt


def translate_steps(
    raw_steps: list[dict],
    datasets: Mapping[str, DataFrame] | None = None,
    exec_handlers: Mapping[int, Callable[[DataFrame], DataFrame]] | None = None,
) -> list[dict]:
    """Reference-YAML steps → `plans.recipe` step dicts."""
    datasets = datasets or {}
    exec_handlers = exec_handlers or {}
    out: list[dict] = []
    for i, step in enumerate(raw_steps):
        (op, arg), = step.items()
        if op == "normalize":
            out.append({"normalize": {"select": arg["select"]}})
        elif op == "replace":
            rules = []
            for rule in arg["regex"]:
                (pat, repl), = rule.items()
                rules.append([pat, _java_backrefs(str(repl))])
            out.append({"replace": {"select": arg["select"], "rules": rules}})
        elif op == "map":
            out.append({"map": dict(arg)})
        elif op == "join":
            ds = arg["dataset"]
            if ds not in datasets:
                raise ValueError(
                    f"step {i}: join dataset '{ds}' not in the provided "
                    f"datasets mapping ({sorted(datasets)})"
                )
            out.append({"join": {"lookup": datasets[ds],
                                 "strict": dict(arg["strict"]),
                                 "select": dict(arg["select"])}})
        elif op == "parsedate":
            out.append({"parsedate": {
                "select": arg["select"],
                "format": _java_datetime(arg.get("format", "%Y%m%d")),
            }})
        elif op == "delete":
            out.append({"delete": {"select": arg["select"]}})
        elif op == "keep":
            # keep = delete everything NOT matching (observable inverse)
            out.append({"exec": {"fn": _keep_fn(arg["select"])}})
        elif op == "exec":
            if i in exec_handlers:
                out.append({"exec": {"fn": exec_handlers[i]}})
            else:
                lines = arg if isinstance(arg, list) else [str(arg)]
                raise UnsupportedExecStep(i, [str(x) for x in lines])
        else:
            raise ValueError(f"step {i}: unknown recipe operator '{op}'")
    return out


def _keep_fn(pattern: str):
    rx = re.compile(pattern)

    def keep(df: DataFrame) -> DataFrame:
        return df.select(*[c for c in df.columns if rx.match(c)])

    return keep


def run_recipe_yaml(
    df: DataFrame,
    text: str,
    name: str | None = None,
    datasets: Mapping[str, DataFrame] | None = None,
    exec_handlers: Mapping[int, Callable[[DataFrame], DataFrame]] | None = None,
) -> DataFrame:
    """Parse + translate + run a reference-shaped YAML recipe."""
    recipe = parse_recipe_yaml(text, name)
    steps = translate_steps(recipe["steps"], datasets, exec_handlers)
    return run_recipe(df, steps)
