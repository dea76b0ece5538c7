"""Command-line entry points — the spark-submit jobs a reference user
runs instead of the reference's Makefile targets.

    spark-submit --py-files dds.zip -m ...   # or locally:
    python -m deces_dataprep_spark build  --input pages/ --warehouse wh/
    python -m deces_dataprep_spark query  --warehouse wh/ --q "text" -k 10
    python -m deces_dataprep_spark recipe --input-fwf data/ --pattern 'deces-.*' \
        --recipe recipe.yml --output out/

`build` = the reference's dataprep+index stage (resumable, snapshot-
committed); `query` = the ES search it previously delegated; `recipe`
= a reference-format YAML recipe over the fwf source.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(app: str, master: str | None):
    """(session, owned): reuse an active session (e.g. invoked
    programmatically inside a host app/test — never stop that one);
    otherwise create and own one."""
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active, False
    from deces_dataprep_spark.session import get_spark

    kwargs = {}
    if master:
        kwargs["master"] = master
    return get_spark(app, **kwargs), True


def _maybe_stop(spark, owned: bool) -> None:
    if owned:
        spark.stop()


def cmd_build(args) -> int:
    from deces_dataprep_spark.snapshots import write_index

    spark, owned = _spark("dds-build", args.master)
    docs = spark.read.parquet(args.input)
    res = write_index(
        spark, docs, args.warehouse, n_shards=args.shards,
        resume=not args.no_resume,
        input_paths=[args.input] if os.path.exists(args.input) else None,
        salt_ranges=args.salt_ranges,
        salt_df_threshold=args.salt_df_threshold,
        auto_salt=not args.no_auto_salt,
    )
    print(json.dumps({
        "snapshot_id": res.snapshot["snapshot_id"],
        "run_id": res.run_id,
        "shards_built": res.shards_built,
        "shards_skipped": res.shards_skipped,
    }))
    _maybe_stop(spark, owned)
    return 0


def cmd_query(args) -> int:
    from deces_dataprep_spark.index.query import QueryEngine
    from deces_dataprep_spark.snapshots import load_index

    spark, owned = _spark("dds-query", args.master)
    tables = load_index(spark, args.warehouse, snapshot_id=args.snapshot,
                        alias=args.alias)
    eng = QueryEngine(tables, cache_postings=True)
    for q in args.q:
        hits = eng.search(q, k=args.k, method=args.method)
        print(json.dumps({"query": q,
                          "hits": [{"doc_id": d, "score": round(s, 6)}
                                   for d, s in hits]}))
    _maybe_stop(spark, owned)
    return 0


def cmd_query_string(args) -> int:
    """ES simple_query_string over a built index — the search-box
    grammar (+ | - "…"~N prefix* term~N parens) through the serving
    tier (arrow reader when the snapshot manifest is local)."""
    from deces_dataprep_spark.index.query import QueryEngine
    from deces_dataprep_spark.snapshots import load_index

    spark, owned = _spark("dds-query-string", args.master)
    tables = load_index(spark, args.warehouse, snapshot_id=args.snapshot,
                        alias=args.alias)
    eng = QueryEngine(tables, spark=spark)
    for q in args.q:
        hits = eng.query_string(
            q, k=args.k, default_operator=args.default_operator,
            minimum_should_match=args.min_should_match)
        print(json.dumps({"query": q,
                          "hits": [{"doc_id": d, "score": round(s, 6)}
                                   for d, s in hits]}))
    _maybe_stop(spark, owned)
    return 0


def cmd_alias(args) -> int:
    """ES index-alias parity: point/list/delete serving aliases over a
    warehouse's snapshot log (set IS the atomic blue/green swap)."""
    from deces_dataprep_spark.snapshots import SnapshotLog

    log = SnapshotLog(args.warehouse)
    if args.action == "set":
        rec = log.set_alias(args.name, args.snapshot)
        print(json.dumps(rec))
    elif args.action == "delete":
        log.delete_alias(args.name)
        print(json.dumps({"deleted": args.name}))
    else:
        print(json.dumps(log.aliases()))
    return 0


def cmd_recipe(args) -> int:
    from deces_dataprep_spark.plans.yaml_recipe import run_recipe_yaml
    from deces_dataprep_spark.sources.fwf import read_fwf, select_files

    spark, owned = _spark("dds-recipe", args.master)
    if args.input_fwf:
        files = select_files(args.input_fwf, args.pattern)
        df = read_fwf(spark, files, encoding=args.encoding)
    else:
        df = spark.read.parquet(args.input)
    with open(args.recipe) as f:
        text = f.read()
    out = run_recipe_yaml(df, text, name=args.name)
    if args.output_format == "csv":
        # the reference's export dataset (deces_csv.yml: type csv,
        # sep ';', utf8 + header)
        (out.write.mode("overwrite")
            .option("sep", args.output_sep).option("header", True)
            .csv(args.output))
        # multiLine: quoted fields may contain newlines — without it the
        # count-back would split such records and over-report
        n = spark.read.option("sep", args.output_sep) \
            .option("header", True).option("multiLine", True) \
            .csv(args.output).count()
    else:
        out.write.mode("overwrite").parquet(args.output)
        n = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": n, "output": args.output}))
    _maybe_stop(spark, owned)
    return 0


def cmd_backup(args) -> int:
    """Export a committed snapshot to a backup repository directory —
    the reference's ``make backup-push`` (Makefile:237-254), content-
    addressed as ``esdata_{version}_{tag}``. No Spark needed."""
    from deces_dataprep_spark.snapshots import export_snapshot

    out = export_snapshot(args.warehouse, args.repository,
                          snapshot_id=args.snapshot)
    print(json.dumps({"exported_to": out}))
    return 0


def cmd_restore(args) -> int:
    """Restore an exported snapshot into a warehouse and commit it —
    the reference's ``make restore`` (Makefile:255-264)."""
    from deces_dataprep_spark.snapshots import restore_snapshot

    snap = restore_snapshot(args.export_dir, args.warehouse)
    print(json.dumps({"snapshot_id": snap["snapshot_id"],
                      "warehouse": args.warehouse}))
    return 0


def cmd_curate(args) -> int:
    """Run the composed curation pipeline (quality ∧ repetition ∧
    language ∧ decontamination ∧ exact dedup) over a pages table."""
    from deces_dataprep_spark.operators.curate import curate

    spark, owned = _spark("dds-curate", args.master)
    docs = spark.read.parquet(args.input)
    bench = (spark.read.parquet(args.benchmark)
             if args.benchmark else docs.limit(0))
    kept = curate(
        docs, bench,
        min_quality=args.min_quality,
        max_top_bigram_frac=args.max_top_bigram_frac,
        allowed_langs=tuple(args.langs.split(",")),
        max_contamination=args.max_contamination,
    )
    out = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({
        "rows_in": docs.count(),
        "rows_kept": spark.read.parquet(args.output).count(),
        "output": args.output,
    }))
    _maybe_stop(spark, owned)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="deces_dataprep_spark")
    p.add_argument("--master", default=None,
                   help="Spark master (default: session factory default)")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build + persist the inverted index")
    b.add_argument("--input", required=True, help="pages parquet path")
    b.add_argument("--warehouse", required=True)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--salt-ranges", type=int, default=None)
    b.add_argument("--salt-df-threshold", type=int, default=None)
    b.add_argument("--no-auto-salt", action="store_true",
                   help="disable the default df-sampled hot-term salting")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="BM25 top-k over a built index")
    q.add_argument("--warehouse", required=True)
    q.add_argument("--alias", default=None,
                   help="resolve the snapshot through this alias")
    q.add_argument("--snapshot", type=int, default=None,
                   help="time-travel to a snapshot id")
    q.add_argument("--q", action="append", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--method", default="auto",
                   choices=["auto", "wand", "taat", "distributed"])
    q.set_defaults(fn=cmd_query)

    qs = sub.add_parser("query-string",
                        help="simple_query_string grammar over an index")
    qs.add_argument("--warehouse", required=True)
    qs.add_argument("--snapshot", type=int, default=None)
    qs.add_argument("--alias", default=None)
    qs.add_argument("--q", action="append", required=True)
    qs.add_argument("-k", type=int, default=10)
    qs.add_argument("--default-operator", default="or",
                    choices=["or", "and"])
    qs.add_argument("--min-should-match", type=int, default=1)
    qs.set_defaults(fn=cmd_query_string)

    al = sub.add_parser("alias", help="set/list/delete serving aliases")
    al.add_argument("action", choices=["set", "list", "delete"])
    al.add_argument("--warehouse", required=True)
    al.add_argument("--name", default=None)
    al.add_argument("--snapshot", type=int, default=None)
    al.set_defaults(fn=cmd_alias)

    r = sub.add_parser("recipe", help="run a reference-format YAML recipe")
    r.add_argument("--input", help="parquet input")
    r.add_argument("--input-fwf", help="directory of fwf .gz files")
    r.add_argument("--pattern", default=r".*\.txt\.gz")
    r.add_argument("--encoding", default="latin1")
    r.add_argument("--recipe", required=True)
    r.add_argument("--name", default=None)
    r.add_argument("--output", required=True)
    r.add_argument("--output-format", default="parquet",
                   choices=["parquet", "csv"])
    r.add_argument("--output-sep", default=";",
                   help="csv separator (reference deces_csv.yml uses ';')")
    r.set_defaults(fn=cmd_recipe)

    bk = sub.add_parser("backup", help="export a snapshot to a repository")
    bk.add_argument("--warehouse", required=True)
    bk.add_argument("--repository", required=True)
    bk.add_argument("--snapshot", type=int, default=None)
    bk.set_defaults(fn=cmd_backup)

    rs = sub.add_parser("restore", help="restore an exported snapshot")
    rs.add_argument("--export-dir", required=True)
    rs.add_argument("--warehouse", required=True)
    rs.set_defaults(fn=cmd_restore)

    cu = sub.add_parser("curate", help="composed training-data curation")
    cu.add_argument("--input", required=True, help="pages parquet path")
    cu.add_argument("--benchmark", default=None,
                    help="benchmark texts parquet (column: text)")
    cu.add_argument("--output", required=True)
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--max-top-bigram-frac", type=float, default=0.5)
    cu.add_argument("--langs", default="en,fr")
    cu.add_argument("--max-contamination", type=float, default=0.5)
    cu.set_defaults(fn=cmd_curate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
