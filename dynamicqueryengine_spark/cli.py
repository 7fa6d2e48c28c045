"""Command-line interface.

    python -m dynamicqueryengine_spark evaluate --table customer \\
        --rule rule.json [--params params.json] [--sf-dir DIR] [--out DIR]
    python -m dynamicqueryengine_spark sql "SELECT ... FROM customer ..."
    python -m dynamicqueryengine_spark workload list
    python -m dynamicqueryengine_spark workload run dedup_minhash_lsh [--out DIR]
    python -m dynamicqueryengine_spark serve --port 8080

``evaluate`` runs a rule document against a registry table (rows to stdout
as JSON lines, or Parquet with ``--out``); ``sql`` opens the full Spark SQL
surface over the registered tables; ``workload`` lists/runs any named
pipeline query from the contract surface (dedup, similarity, sampling,
text analysis, …); ``serve`` starts the HTTP facade.
"""

from __future__ import annotations

import argparse
import json
import sys

from .operators.executor import apply_rule
from .plans.model import RuleDefinition
from .session import get_spark
from .sources.registry import TableRegistry
from .sources.writers import write_parquet

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _print_rows(df, limit: int) -> None:
    for row in df.limit(limit).collect():
        print(json.dumps(row.asDict(recursive=True), default=str))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="dynamicqueryengine_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    ev = sub.add_parser("evaluate", help="run a rule document against a table")
    ev.add_argument("--table", required=True)
    ev.add_argument("--rule", required=True, help="path to rule JSON")
    ev.add_argument("--params", help="path to external-params JSON")
    ev.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    ev.add_argument("--out", help="write result as parquet to this dir")
    ev.add_argument("--limit", type=int, default=100)

    sq = sub.add_parser("sql", help="run Spark SQL over the registered tables")
    sq.add_argument("query")
    sq.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    sq.add_argument("--limit", type=int, default=100)

    wl = sub.add_parser("workload", help="list or run named pipeline queries")
    wl.add_argument("action", choices=["list", "run"])
    wl.add_argument("name", nargs="?", help="workload name (for run)")
    wl.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    wl.add_argument("--out", help="write result as parquet to this dir")
    wl.add_argument("--limit", type=int, default=100)

    sv = sub.add_parser("serve", help="start the HTTP rule-evaluation facade")
    sv.add_argument("--port", type=int, default=8080)
    sv.add_argument("--host", default="127.0.0.1")

    vt = sub.add_parser(
        "vt", help="versioned-table admin (DESCRIBE/HISTORY/DDL/VACUUM)"
    )
    vt.add_argument(
        "action",
        choices=[
            "describe", "history", "rename-column", "drop-column",
            "add-column", "widen-column", "vacuum", "restore",
            "generate-manifest", "delete", "compact", "reorg",
        ],
    )
    vt.add_argument("path", help="table directory")
    vt.add_argument("args", nargs="*", help="action operands")
    vt.add_argument("--version", type=int)
    vt.add_argument("--timestamp")
    vt.add_argument("--keep-last", type=int, default=2)
    vt.add_argument("--retain-seconds", type=float)
    vt.add_argument("--dry-run", action="store_true")
    vt.add_argument(
        "--mode",
        choices=["rewrite", "dv", "auto"],
        default="rewrite",
        help="delete strategy (rewrite = whole-file/DROP-PARTITION "
        "fast paths; dv = merge-on-read; auto = size-based)",
    )

    args = parser.parse_args(argv)
    spark = get_spark("dqe-cli")

    if args.cmd == "evaluate":
        reg = TableRegistry(spark, args.sf_dir)
        with open(args.rule) as fh:
            rule = RuleDefinition.from_json(fh.read())
        params = None
        if args.params:
            with open(args.params) as fh:
                params = json.load(fh)
        result = apply_rule(reg[args.table], rule, external_params=params)
        if args.out:
            write_parquet(result, args.out)
            print(f"wrote {args.out}", file=sys.stderr)
        else:
            _print_rows(result, args.limit)
        return 0

    if args.cmd == "sql":
        reg = TableRegistry(spark, args.sf_dir)
        reg.register_views()
        _print_rows(spark.sql(args.query), args.limit)
        return 0

    if args.cmd == "workload":
        from .workloads import ALL_QUERIES as workloads
        if args.action == "list":
            for name in workloads:
                print(name)
            return 0
        if not args.name or args.name not in workloads:
            print(
                f"unknown workload {args.name!r}; see 'workload list'",
                file=sys.stderr,
            )
            return 2
        result = workloads[args.name].spark_fn()(spark, args.sf_dir)
        if args.out:
            write_parquet(result, args.out)
            print(f"wrote {args.out}", file=sys.stderr)
        else:
            _print_rows(result, args.limit)
        return 0

    if args.cmd == "vt":
        from .sources import versioned as V

        def need(n: int, usage: str) -> list[str]:
            if len(args.args) != n:
                raise SystemExit(f"usage: vt {args.action} PATH {usage}")
            return args.args

        if args.action == "describe":
            print(
                json.dumps(
                    V.vt_describe(args.path, version=args.version),
                    indent=2,
                    default=str,
                )
            )
        elif args.action == "history":
            try:
                for entry in V.vt_history(args.path):
                    print(json.dumps(entry, default=str))
            except BrokenPipeError:  # piped into head — normal exit
                import os as _os

                _os.dup2(_os.open(_os.devnull, _os.O_WRONLY), 1)
        elif args.action == "rename-column":
            old_name, new_name = need(2, "OLD NEW")
            v = V.vt_rename_column(args.path, old_name, new_name)
            print(f"renamed {old_name} -> {new_name} at version {v}")
        elif args.action == "drop-column":
            (col,) = need(1, "COL")
            v = V.vt_drop_column(args.path, col)
            print(f"dropped {col} at version {v}")
        elif args.action == "add-column":
            col, dtype = need(2, "COL TYPE")
            v = V.vt_add_column(args.path, col, dtype)
            print(f"added {col} {dtype} at version {v}")
        elif args.action == "widen-column":
            col, dtype = need(2, "COL TYPE")
            v = V.vt_widen_column(args.path, col, dtype)
            print(f"widened {col} to {dtype} at version {v}")
        elif args.action == "vacuum":
            removed = V.vt_vacuum(
                spark,
                args.path,
                keep_last=args.keep_last,
                retain_seconds=args.retain_seconds,
                dry_run=args.dry_run,
            )
            verb = "would remove" if args.dry_run else "removed"
            print(f"{verb} {len(removed)} object(s)")
            for r in removed:
                print(f"  {r}")
        elif args.action == "restore":
            v = V.vt_restore(
                spark,
                args.path,
                version=args.version,
                timestamp=args.timestamp,
            )
            print(f"restored as version {v}")
        elif args.action == "generate-manifest":
            dest = V.vt_generate_manifest(
                args.path, version=args.version
            )
            print(dest)
        elif args.action == "delete":
            # predicate = the skip-grammar conjunction as JSON, e.g.
            #   vt delete TABLE '[["day", "<", "2020-01-03"]]'
            # — a partition-proven conjunction drops whole directories
            # metadata-only (DROP PARTITION); the audit blob is echoed
            (pred_raw,) = need(1, "PREDICATE_JSON")
            pred = json.loads(pred_raw)
            if pred and not isinstance(pred[0], list):
                pred = [pred]
            conj = [tuple(c) for c in pred]
            v = V.vt_delete(spark, args.path, conj, mode=args.mode)
            blob = dict(V.vt_history(args.path)[0].get("delete") or {})
            blob.pop("predicate", None)  # the caller typed it
            print(json.dumps({"version": v, **blob}, default=str))
        elif args.action == "compact":
            v = V.vt_compact(spark, args.path)
            blob = V.vt_history(args.path)[0].get("compact") or {}
            print(json.dumps({"version": v, **blob}, default=str))
        elif args.action == "reorg":
            v = V.vt_reorg(spark, args.path)
            blob = V.vt_history(args.path)[0].get("reorg") or {}
            print(json.dumps({"version": v, **blob}, default=str))
        return 0

    if args.cmd == "serve":
        from .api import serve

        server = serve(spark, host=args.host, port=args.port)
        print(f"listening on {args.host}:{server.server_address[1]}", file=sys.stderr)
        try:
            import threading

            threading.Event().wait()
        except KeyboardInterrupt:
            server.shutdown()
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
