"""Operational CLI — the engine's spark-submit job surface.

The reference's entry points are Airflow-triggered ``spark-submit`` jobs
(ingestion, SURVEY.md §3.1) and SQL over the lakehouse (dbt → Thrift,
§3.2). This CLI is the engine-side equivalent of both, runnable locally
or via ``spark-submit`` on a cluster unchanged:

    python -m data_lakehouse_spark pipeline --input events.parquet \
        --warehouse /tmp/wh          # bronze → silver → gold, JSON stats
    python -m data_lakehouse_spark sql --warehouse /tmp/wh \
        -e "SELECT COUNT(*) FROM gold_daily_sales_summary"
    python -m data_lakehouse_spark query --name tpch_q3_shipping_priority \
        --sf-dir /root/testdata/sf0.01 --limit 5 [--explain]
    python -m data_lakehouse_spark tables --warehouse /tmp/wh
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from data_lakehouse_spark.session import get_spark

    return get_spark(app)


def _read_input(spark, path: str):
    from data_lakehouse_spark.sources.readers import read_csv, read_json

    if path.endswith(".csv"):
        return read_csv(spark, path)
    if path.endswith((".json", ".ndjson", ".jsonl")):
        return read_json(spark, path)
    return spark.read.parquet(path)


def cmd_pipeline(args: argparse.Namespace) -> int:
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.pipeline import MedallionPipeline

    spark = _spark("pipeline")
    cat = Catalog(spark, args.warehouse)
    pipe = MedallionPipeline(
        spark, cat, cart_type=args.cart_type, as_of_date=args.as_of_date
    )
    raw = _read_input(spark, args.input)
    if args.dag:
        # Airflow-semantics run: bronze → freshness → silver → tests
        # gate the parallel gold fan-out, with retries + SLO timeouts
        # (orchestrate.medallion_dag); exit 1 if any task failed
        from data_lakehouse_spark.orchestrate import medallion_dag

        report = medallion_dag(
            pipe, raw, args.source_file or args.input
        ).run(spark)
        print(json.dumps(report, default=str))
        return 0 if report["state"] == "success" else 1
    stats = pipe.run(raw, args.source_file or args.input)
    print(json.dumps(stats, default=str))
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Full statement surface via the dialect router: SELECT (with
    time travel), INSERT/UPDATE/DELETE/MERGE, CREATE TABLE AS /
    VIEW / ALTER / DROP, OPTIMIZE / VACUUM / CALL — every statement a
    dbt-over-Thrift user would send the reference."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.sql import execute_sql_script, result_to_json

    spark = _spark("sql")
    cat = Catalog(spark, args.warehouse)
    for result in execute_sql_script(cat, args.execute):
        if args.explain and hasattr(result, "explain"):
            result.explain("formatted")
        for line in result_to_json(result, limit=args.limit):
            print(line)
    return 0


def cmd_models(args: argparse.Namespace) -> int:
    """The ``dbt run`` analog: load a models directory and materialize
    in dependency order (SURVEY.md §3.2 — the reference's transform
    layer is 8 dbt models on a Thrift endpoint)."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.models import ModelRunner

    spark = _spark("models")
    runner = ModelRunner(Catalog(spark, args.warehouse))
    out: dict = {}
    if args.seed_dir:
        out["seeds"] = runner.seed(
            args.seed_dir, full_refresh=args.full_refresh
        )
    runner.add_models_dir(args.models_dir)
    if args.threads > 1 and not args.atomic:
        out["models"] = runner.run_parallel(
            args.select,
            threads=args.threads,
            full_refresh=args.full_refresh,
        )
    else:
        out["models"] = runner.run(
            args.select, full_refresh=args.full_refresh, atomic=args.atomic
        )
    print(json.dumps(out, default=str))
    return 0


def cmd_export(args: argparse.Namespace) -> int:
    """Export a catalog table as an open-format table (Iceberg v2 or
    Delta Lake) readable by external engines."""
    from data_lakehouse_spark import interop
    from data_lakehouse_spark.catalog import Catalog

    spark = _spark("export")
    cat = Catalog(spark, args.warehouse)
    if args.format == "iceberg" and args.history:
        out = interop.export_iceberg_history(cat, args.table, args.dest)
    elif args.format == "iceberg":
        out = interop.export_iceberg(
            cat, args.table, args.dest, materialize=args.materialize
        )
    elif args.history:
        out = interop.export_delta_history(cat, args.table, args.dest)
    else:
        out = interop.export_delta(
            cat, args.table, args.dest, materialize=args.materialize
        )
    print(json.dumps(out, default=str))
    return 0


def cmd_import(args: argparse.Namespace) -> int:
    """Import an external Iceberg/Delta table into the catalog (one
    materializing read — the inbound half of the migration story)."""
    from data_lakehouse_spark import interop
    from data_lakehouse_spark.catalog import Catalog

    spark = _spark("import")
    cat = Catalog(spark, args.warehouse)
    df = (
        interop.read_iceberg(spark, args.source)
        if args.format == "iceberg"
        else interop.read_delta(spark, args.source)
    )
    cat.create_table(
        args.table,
        df,
        properties={"imported-from": f"{args.format}:{args.source}"},
    )
    print(
        json.dumps(
            {"table": args.table, "rows": cat.row_count(args.table),
             "source": args.source}
        )
    )
    return 0


def cmd_serve(args: argparse.Namespace) -> int:
    """Long-lived SQL endpoint (Thrift-server analog; see server.py)."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.server import SqlEndpoint

    spark = _spark("serve")
    # FAIR scheduling: concurrent endpoint clients share the cluster
    # instead of queueing FIFO behind a long query
    spark.conf.set("spark.scheduler.mode", "FAIR")
    ep = SqlEndpoint(
        Catalog(spark, args.warehouse), host=args.host, port=args.port
    )
    print(json.dumps({"serving": f"http://{args.host}:{ep.port}"}))
    ep.serve_forever()
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod

    spark = _spark("query")
    qs = entrymod.queries()
    if args.name not in qs:
        print(f"unknown query {args.name!r}; available: {sorted(qs)}",
              file=sys.stderr)
        return 2
    df = qs[args.name](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    for line in df.limit(args.limit).toJSON().collect():
        print(line)
    return 0


def cmd_tables(args: argparse.Namespace) -> int:
    from data_lakehouse_spark.catalog import Catalog

    spark = _spark("tables")
    cat = Catalog(spark, args.warehouse)
    for name in cat.tables():
        snaps = cat.snapshots(name).count()
        props = cat.table_properties(name)
        print(json.dumps({"table": name, "snapshots": snaps,
                          "properties": props}))
    return 0


def cmd_serving_ddl(args: argparse.Namespace) -> int:
    """Print the generated ClickHouse MergeTree DDL script for every
    materialized gold mart (serving_ddl.py — the clickhouse/
    create_tables.sql analog, derived from LIVE schemas)."""
    from data_lakehouse_spark.catalog import Catalog
    from data_lakehouse_spark.serving_ddl import gold_serving_ddl

    spark = _spark("serving-ddl")
    cat = Catalog(spark, args.warehouse)
    ddl = gold_serving_ddl(cat, database=args.database)
    if not ddl:
        print("-- no gold marts materialized in this warehouse")
        return 1
    if args.database:
        print(f"CREATE DATABASE IF NOT EXISTS {args.database};\n")
    for stmt in ddl.values():
        print(stmt + "\n")
    return 0


def cmd_dashboards(args: argparse.Namespace) -> int:
    """Validate the declarative BI bundle and export the Superset
    import bundle (serving.py — the dags/06_superset_dashboard.py
    analog). With ``--warehouse`` the marts come from the catalog; with
    ``--sf-dir`` they are computed from the events fixture."""
    from data_lakehouse_spark import serving

    spark = _spark("dashboards")
    assets = serving.reference_assets()
    views = {}
    mart_names = [
        "gold_daily_sales_summary",
        "gold_conversion_funnel_daily",
        "gold_product_performance",
        "gold_user_rfm_segments",
        "gold_hourly_traffic",
        "gold_category_performance",
    ]
    if args.warehouse:
        from data_lakehouse_spark.catalog import Catalog

        cat = Catalog(spark, args.warehouse)
        views = {n: cat.read(n) for n in mart_names if cat.table_exists(n)}
    elif args.sf_dir:
        from data_lakehouse_spark.operators import gold
        from data_lakehouse_spark.operators.silver import silver_events

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        silver = silver_events(
            spark.read.parquet(f"{args.sf_dir}/events.parquet")
        )
        views = {
            "gold_daily_sales_summary": gold.daily_sales_summary(
                silver, cart_type="click"
            ),
            "gold_conversion_funnel_daily": gold.conversion_funnel_daily(
                silver, cart_type="click"
            ),
            "gold_product_performance": gold.product_performance(
                silver, cart_type="click", as_of_date="2024-02-01",
                product_col="prop_k",
            ),
            "gold_user_rfm_segments": gold.user_rfm_segments(
                silver, as_of_date="2024-02-01"
            ),
            "gold_hourly_traffic": gold.hourly_traffic(
                silver, cart_type="click"
            ),
            "gold_category_performance": gold.category_performance(silver),
        }
    report = serving.validate_assets(
        spark, assets, views=views, run=bool(views)
    )
    out: dict = {"errors": report["errors"], "charts": report["charts"]}
    if args.out:
        out["written"] = serving.export_superset_bundle(assets, args.out)
    print(json.dumps(out, default=str))
    return 1 if report["errors"] else 0


def cmd_changes(args: argparse.Namespace) -> int:
    """Change data feed between snapshots (catalog.table_changes)."""
    from data_lakehouse_spark.catalog import Catalog

    spark = _spark("changes")
    cat = Catalog(spark, args.warehouse)
    df = cat.table_changes(args.table, args.from_version, args.to_version)
    for row in df.limit(args.limit).collect():
        print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_maintain(args: argparse.Namespace) -> int:
    """Table maintenance: compact / expire / rollback / publish /
    rewrite-deletes / row-count / tag / branch / fast-forward."""
    from data_lakehouse_spark.catalog import Catalog

    spark = _spark("maintain")
    cat = Catalog(spark, args.warehouse)
    op = args.op
    if op != "recover-transactions" and not args.table:
        raise SystemExit(f"{op} requires --table")
    if op == "recover-transactions":
        from data_lakehouse_spark.transactions import recover_transactions

        out = {"recovered_txn_ids": recover_transactions(cat)}
    elif op == "compact":
        out = cat.compact(args.table, where=args.where)
    elif op == "expire":
        out = cat.expire_snapshots(
            args.table,
            keep_last=args.keep_last if args.keep_last is not None else 1,
            older_than=args.older_than,
        )
    elif op == "rollback":
        if args.version is None:
            raise SystemExit("rollback requires --version")
        cat.rollback(args.table, args.version)
        out = {"table": args.table, "rolled_back_to": args.version}
    elif op == "publish":
        cat.publish(args.table)
        out = {"table": args.table, "published": True}
    elif op == "sweep":
        # an explicitly-passed --keep-last enables the expire step by
        # itself (None default = the flag wasn't given, no retention)
        out = cat.maintain(
            args.table,
            expire_keep_last=args.keep_last,
            expire_older_than=args.older_than,
            orphan_older_than_hours=(
                args.older_than_hours if args.sweep_orphans else None
            ),
            ann_rebuild_after_drifted_adds=args.ann_rebuild_after,
            dry_run=args.dry_run,
        )
    elif op == "rewrite-deletes":
        out = cat.rewrite_position_deletes(args.table)
    elif op == "remove-orphans":
        out = cat.remove_orphan_files(
            args.table, older_than_hours=args.older_than_hours,
            dry_run=args.dry_run,
        )
    elif op == "row-count":
        out = {"table": args.table, "rows": cat.row_count(args.table)}
    elif op == "analyze":
        st = cat.analyze_table(args.table)
        out = {"table": args.table, "version": st["version"],
               "row_count": st["row_count"],
               "n_columns": len(st["columns"])}
    elif op == "tag":
        if not args.ref:
            raise SystemExit("tag requires --ref")
        cat.create_tag(args.table, args.ref, version=args.version)
        out = {"table": args.table, "tag": args.ref}
    elif op == "branch":
        if not args.ref:
            raise SystemExit("branch requires --ref")
        cat.create_branch(args.table, args.ref, version=args.version)
        out = {"table": args.table, "branch": args.ref}
    elif op == "fast-forward":
        if not args.ref:
            raise SystemExit("fast-forward requires --ref")
        cat.fast_forward(args.table, args.ref)
        out = {"table": args.table, "fast_forwarded_from": args.ref}
    elif op == "clone":
        if not args.ref:
            raise SystemExit("clone requires --ref (the target table name)")
        cat.clone_table(args.table, args.ref, version=args.version)
        out = {"table": args.table, "cloned_to": args.ref}
    else:  # pragma: no cover — argparse choices guard this
        raise SystemExit(f"unknown op {op}")
    print(json.dumps(out, default=str))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="data_lakehouse_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="run bronze→silver→gold")
    p.add_argument("--input", required=True)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--source-file", default=None)
    p.add_argument("--cart-type", default="cart")
    p.add_argument("--as-of-date", default=None)
    p.add_argument(
        "--dag",
        action="store_true",
        help="run as a task graph (parallel gold fan-out, retries, "
        "SLO timeouts) and print the per-task run report",
    )
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("sql", help="SQL over the lakehouse (views registered)")
    p.add_argument("--warehouse", required=True)
    p.add_argument("-e", "--execute", required=True)
    p.add_argument("--limit", type=int, default=100)
    p.add_argument("--explain", action="store_true")
    p.set_defaults(fn=cmd_sql)

    p = sub.add_parser(
        "export", help="export a table as Iceberg v2 / Delta Lake"
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--dest", required=True)
    p.add_argument("--format", choices=["iceberg", "delta"],
                   default="iceberg")
    p.add_argument("--history", action="store_true",
                   help="export every published snapshot (time travel "
                   "in the external format)")
    p.add_argument("--materialize", action="store_true", default=None)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "import", help="import an external Iceberg/Delta table"
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--source", required=True)
    p.add_argument("--format", choices=["iceberg", "delta"],
                   default="iceberg")
    p.set_defaults(fn=cmd_import)

    p = sub.add_parser(
        "serve", help="long-lived multi-client SQL endpoint (HTTP/JSON)"
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8099)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "models",
        help="dbt-style model run: materialize a directory of .sql "
        "models (config/ref/source/is_incremental) into the catalog",
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--dir", required=True, dest="models_dir")
    p.add_argument("--select", nargs="*", default=None,
                   help="models to build (ancestors are pulled in)")
    p.add_argument("--seed-dir", default=None,
                   help="load *.csv seeds before running models")
    p.add_argument("--full-refresh", action="store_true")
    p.add_argument("--atomic", action="store_true",
                   help="publish every selected model in ONE multi-"
                   "table transaction (all-or-nothing layer refresh)")
    p.add_argument("--threads", type=int, default=1,
                   help="dbt threads: independent models materialize "
                   "concurrently (ignored with --atomic, which must "
                   "stage serially)")
    p.set_defaults(fn=cmd_models)

    p = sub.add_parser("query", help="run a __spark_entry__ query by name")
    p.add_argument("--name", required=True)
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p.add_argument("--limit", type=int, default=20)
    p.add_argument("--explain", action="store_true")
    p.set_defaults(fn=cmd_query)

    p = sub.add_parser("tables", help="list catalog tables")
    p.add_argument("--warehouse", required=True)
    p.set_defaults(fn=cmd_tables)

    p = sub.add_parser(
        "serving-ddl",
        help="print generated ClickHouse MergeTree DDL for the gold "
        "marts (derived from live schemas)",
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--database", default="lakehouse")
    p.set_defaults(fn=cmd_serving_ddl)

    p = sub.add_parser(
        "dashboards",
        help="validate + export the declarative BI asset bundle",
    )
    p.add_argument("--warehouse", default=None)
    p.add_argument("--sf-dir", default=None)
    p.add_argument("--out", default=None,
                   help="directory for the Superset import bundle")
    p.set_defaults(fn=cmd_dashboards)

    p = sub.add_parser(
        "changes", help="row-level change feed between table versions"
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", required=True)
    p.add_argument("--from-version", type=int, required=True)
    p.add_argument("--to-version", type=int, default=None)
    p.add_argument("--limit", type=int, default=100)
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser("maintain", help="table maintenance operations")
    p.add_argument(
        "op",
        choices=["sweep", "compact", "expire", "rollback", "publish",
                 "rewrite-deletes", "remove-orphans", "row-count", "analyze",
                 "tag", "branch", "fast-forward", "clone",
                 "recover-transactions"],
    )
    p.add_argument("--warehouse", required=True)
    p.add_argument("--table", default=None,
                   help="target table (not needed for the warehouse-level "
                        "recover-transactions)")
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--keep-last", type=int, default=None,
                   help="expire/sweep: retain this many main-lineage "
                        "versions (expire defaults to 1 when omitted; "
                        "sweep runs no expire step unless --keep-last "
                        "or --older-than is given)")
    p.add_argument("--older-than-hours", type=float, default=24.0)
    p.add_argument("--older-than", default=None,
                   help="expire: retain versions committed at/after this "
                        "UTC instant (YYYY-mm-dd HH:MM:SS)")
    p.add_argument("--where", default=None,
                   help="compact: scope the rewrite to dirs with matching "
                        "rows (OPTIMIZE ... WHERE)")
    p.add_argument("--dry-run", action="store_true")
    p.add_argument("--ref", default=None,
                   help="tag/branch name for tag|branch|fast-forward")
    p.add_argument("--ann-rebuild-after", type=int, default=None,
                   help="sweep: rebuild an IVF-PQ index after this many "
                        "consecutive drifted adds (index.drift_consecutive; "
                        "source from the index's recorded "
                        "index.source_table)")
    p.add_argument("--sweep-orphans", action="store_true",
                   help="sweep: include the orphan-file step "
                        "(uses --older-than-hours)")
    p.set_defaults(fn=cmd_maintain)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
