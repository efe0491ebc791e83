"""Command-line interface — the operational surface of the engine.

Reference parity: main.go:37-47 (subcommand registration) and
cmd/core.go:31-43 (run modes full / snapshot-only / incremental-only).
Differences by design: there is one generic `replicate` command instead of
per-warehouse subcommands (snowflake/redshift/bigquery/databricks —
cmd/*.go) because the warehouse here is always the Spark-managed table; and
export-side commands (s3/gcs: dumping TiDB + creating changefeeds) are out
of scope — this engine *consumes* the staging layout those produce.

Layout contract (core.go:132-148): ``--storage-dir`` holds ``snapshot/``
(CSV dumps ``<db>.<table>.<n>.csv``) and ``increment/``
(``<db>/<table>/<version>/…/CDC{N}.csv`` + ``meta/schema_*.json``).
Table definitions bootstrap from the lowest schema version present; later
versions apply as DDL barriers during consumption.
"""

from __future__ import annotations

import argparse
import json
import sys
import threading
from pathlib import Path

from .metrics import MetricsRegistry, serve
from .replicate import TableReplicator, replicate_all
from .schema.table_def import TableDefinition, load_schema_file, parse_schema_file_name


def discover_table_defs(increment_root: str | Path) -> dict[str, TableDefinition]:
    """fqn → bootstrap TableDefinition (lowest schema version per table),
    from ``<root>/<schema>/<table>/<version>/meta/schema_*.json``."""
    root = Path(increment_root)
    defs: dict[str, TableDefinition] = {}
    if not root.is_dir():
        return defs
    for meta in sorted(root.glob("*/*/*/meta/schema_*.json")):
        if parse_schema_file_name(meta.name) is None:
            continue
        td = load_schema_file(meta)
        fqn = f"{td.schema}.{td.table}"
        if fqn not in defs or td.version < defs[fqn].version:
            defs[fqn] = td
    return defs


def _select_tables(
    defs: dict[str, TableDefinition], tables_arg: str | None
) -> dict[str, TableDefinition]:
    if not tables_arg:
        return defs
    wanted = [t.strip() for t in tables_arg.split(",") if t.strip()]
    missing = [t for t in wanted if t not in defs]
    if missing:
        raise SystemExit(
            f"unknown table(s) {missing}; discovered: {sorted(defs)} "
            "(tables come from increment/<schema>/<table>/*/meta/schema_*.json)"
        )
    return {t: defs[t] for t in wanted}


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tidb2dw-spark",
        description="PySpark-native snapshot + CDC-merge replication engine",
    )
    sub = p.add_subparsers(dest="command", required=True)

    rep = sub.add_parser(
        "replicate", help="snapshot-load then merge the CDC changelog"
    )
    rep.add_argument("--storage-dir", required=True, help="root with snapshot/ and increment/")
    rep.add_argument("--warehouse-dir", required=True, help="managed-table output root")
    rep.add_argument("--tables", help="comma-separated schema.table filter (default: all discovered)")
    rep.add_argument(
        "--mode",
        choices=["full", "snapshot-only", "incremental-only"],
        default="full",
        help="full = snapshot + increments (cmd/core.go:31-43 run modes)",
    )
    rep.add_argument("--pk-buckets", type=int, default=0, help="hash buckets for the managed table (0 = unbucketed)")
    rep.add_argument(
        "--merge-mode",
        choices=["cow", "mor"],
        default="cow",
        help="mor = merge-on-read (bucketed only): CDC batches commit as "
        "per-bucket delta files, reads resolve last-writer-wins, "
        "`optimize` folds deltas (high-frequency CDC against big tables)",
    )
    rep.add_argument(
        "--cdf",
        action="store_true",
        help="enable the change data feed: every merge commit also writes "
        "its row-level change set, readable via ManagedTable.changes() "
        "for O(changes) downstream consumers",
    )
    rep.add_argument(
        "--compact-every",
        type=int,
        default=None,
        help="auto-compact decayed buckets after every N merge commits "
        "(long-running streams; default: off, use `optimize` out-of-band)",
    )
    rep.add_argument(
        "--jdbc-url",
        help="source-attached mode (reference's direct dump): read each "
        "table's snapshot live over JDBC instead of snapshot/ CSVs; "
        "increment/ still supplies schemas and CDC files",
    )
    rep.add_argument("--jdbc-driver", default="com.mysql.cj.jdbc.Driver")
    rep.add_argument("--jdbc-user", default="root")
    rep.add_argument("--jdbc-password", default="")
    rep.add_argument(
        "--jdbc-num-partitions",
        type=int,
        default=8,
        help="parallel snapshot splits over the integer PK (bounds are "
        "auto-derived with a min/max probe)",
    )
    rep.add_argument(
        "--snapshot-tso",
        type=int,
        default=None,
        help="pin `tidb_snapshot` on every connection for a consistent dump",
    )
    rep.add_argument("--loop", action="store_true", help="keep polling for new CDC files")
    rep.add_argument("--poll-interval", type=float, default=12.0, help="seconds between polls (flush-interval/5 default)")
    rep.add_argument("--max-polls", type=int, default=None, help="stop --loop after N polls (default: forever)")
    rep.add_argument("--status-port", type=int, default=None, help="serve /info + /metrics on this port while running")

    tab = sub.add_parser("tables", help="list tables discovered in the staging layout")
    tab.add_argument("--storage-dir", required=True)

    opt = sub.add_parser(
        "optimize",
        help="compact small files and vacuum unreferenced versions of managed tables",
    )
    opt.add_argument("--warehouse-dir", required=True, help="managed-table root")
    opt.add_argument("--tables", help="comma-separated table dir names (default: all found)")
    opt.add_argument("--max-files-per-bucket", type=int, default=4)
    opt.add_argument("--target-bytes", type=int, default=128 << 20)
    opt.add_argument("--vacuum-keep-last", type=int, default=1)
    opt.add_argument(
        "--cluster-by",
        help="comma-separated columns: range-cluster plain tables before "
        "compacting (OPTIMIZE ... CLUSTER BY parity) and collect zone maps",
    )
    opt.add_argument(
        "--zorder",
        action="store_true",
        help="with --cluster-by: Morton-interleave the columns "
        "(OPTIMIZE ... ZORDER BY) so zone maps prune on every clustered "
        "column, not just the leading one",
    )
    opt.add_argument(
        "--rebucket",
        type=int,
        default=None,
        help="rewrite each table under this PK bucket count before "
        "compacting (the bucket-resize maintenance op)",
    )
    opt.add_argument(
        "--bloom-cols",
        help="comma-separated string/integer columns: collect per-file "
        "bloom filters for equality-probe file skipping (read_eq)",
    )

    exp = sub.add_parser(
        "export",
        help="re-emit a warehouse table as a staging layout (cascade "
        "replication: snapshot CSVs + CDC changelog from the change feed)",
    )
    exp.add_argument("--warehouse-dir", required=True, help="managed-table root")
    exp.add_argument("--table", required=True, help="table dir name under the warehouse")
    exp.add_argument("--out-dir", required=True, help="staging layout output root")
    exp.add_argument("--schema-name", default="export", help="schema name in the emitted layout")
    exp.add_argument(
        "--since",
        type=int,
        default=None,
        help="export changelog commits AFTER this change seq (default: "
        "also export the snapshot and start the changelog at its seq)",
    )

    return p


def _cmd_tables(args: argparse.Namespace) -> int:
    defs = discover_table_defs(Path(args.storage_dir) / "increment")
    out = [
        {
            "table": fqn,
            "bootstrap_version": td.version,
            "pk": td.pk_columns,
            "n_columns": len(td.columns),
        }
        for fqn, td in sorted(defs.items())
    ]
    print(json.dumps(out, indent=2))
    return 0


def _cmd_optimize(args: argparse.Namespace) -> int:
    """Table maintenance pass — the OPTIMIZE/VACUUM a warehouse would run
    out-of-band of the merge loop (compaction commits are the same atomic
    manifest swap as merges, so the consumer can keep running)."""
    from .session import get_spark
    from .table.managed import ManagedTable

    root = Path(args.warehouse_dir)
    names = (
        [t.strip() for t in args.tables.split(",") if t.strip()]
        if args.tables
        else sorted(
            p.parent.parent.name
            for p in root.glob("*/_meta/manifest.json")
        )
    )
    if not names:
        print("no managed tables under", root, file=sys.stderr)
        return 1
    spark = get_spark("tidb2dw_spark-cli")
    report = []
    for name in names:
        t = ManagedTable(root / name)
        if not t.exists():
            print(f"{name}: not a managed table", file=sys.stderr)
            return 1
        rebucketed = None
        if args.rebucket and t.manifest().get("pk_buckets", 0) != args.rebucket:
            rebucketed = t.rebucket(spark, args.rebucket)
        compacted_to = t.compact(
            spark,
            max_files_per_bucket=args.max_files_per_bucket,
            target_bytes=args.target_bytes,
        )
        clustered = None
        if args.cluster_by and t.manifest().get("pk_buckets", 0) == 0:
            cols = [c.strip() for c in args.cluster_by.split(",") if c.strip()]
            clustered = t.cluster_by(
                spark, cols, target_bytes=args.target_bytes, zorder=args.zorder
            )
            t.analyze(spark, cols)
        if args.bloom_cols and t.manifest().get("pk_buckets", 0) == 0:
            bcols = [c.strip() for c in args.bloom_cols.split(",") if c.strip()]
            t.analyze_bloom(spark, bcols)
        removed = t.vacuum(keep_last=args.vacuum_keep_last)
        entry = {
            "table": name,
            "compacted_to_version": compacted_to,
            "vacuumed_versions": removed,
            "version": t.version(),
        }
        if clustered is not None:
            entry["clustered_to_version"] = clustered
        if rebucketed is not None:
            entry["rebucketed_to_version"] = rebucketed
        report.append(entry)
    print(json.dumps(report, indent=2))
    return 0


_INT_TYPES = {"int", "integer", "bigint", "tinyint", "smallint", "mediumint"}


def _jdbc_snapshot_reader(args: argparse.Namespace, td: TableDefinition):
    """Source-attached snapshot reader for one table: a TSO-pinnable
    partitioned JDBC read, with split bounds derived by a min/max probe
    over the first integer PK column (Dumpling's chunking decision,
    dump.go:40-41, made from the same statistic)."""
    from .sources.jdbc import TidbSource, snapshot_read

    src = TidbSource(
        host="", port=0, database="",
        user=args.jdbc_user, password=args.jdbc_password,
    )
    by_name = {c.name: c for c in td.columns}
    part_col = next(
        (
            name
            for name in td.pk_columns
            if by_name[name].tp.lower() in _INT_TYPES
        ),
        None,
    )

    def reader(spark):
        kwargs: dict = dict(
            source=src,
            table=td.table,
            driver=args.jdbc_driver,
            url=args.jdbc_url,
            snapshot_tso=args.snapshot_tso,
        )
        if part_col is not None:
            bounds = (
                spark.read.format("jdbc")
                .options(
                    url=args.jdbc_url,
                    driver=args.jdbc_driver,
                    user=args.jdbc_user,
                    password=args.jdbc_password,
                    dbtable=f"(SELECT MIN({part_col}) AS lo, "
                    f"MAX({part_col}) AS hi FROM {td.table}) b",
                )
                .load()
                .first()
            )
            # positional: catalogs differ in identifier casing (Derby
            # upper-cases the probe aliases, MySQL preserves them)
            lo, hi = (None, None) if bounds is None else (bounds[0], bounds[1])
            if lo is not None and hi > lo:
                kwargs.update(
                    partition_column=part_col,
                    lower_bound=int(lo),
                    upper_bound=int(hi),
                    num_partitions=args.jdbc_num_partitions,
                )
        return snapshot_read(spark, **kwargs)

    return reader


def _cmd_replicate(args: argparse.Namespace) -> int:
    from .session import get_spark

    storage = Path(args.storage_dir)
    defs = _select_tables(
        discover_table_defs(storage / "increment"), args.tables
    )
    if not defs:
        print("no tables discovered under", storage / "increment", file=sys.stderr)
        return 1

    source_attached = getattr(args, "jdbc_url", None) is not None
    spark = get_spark("tidb2dw_spark-cli")
    registry = MetricsRegistry()
    reps = [
        TableReplicator(
            spark,
            None if source_attached else storage / "snapshot",
            storage / "increment",
            args.warehouse_dir,
            td,
            registry=registry,
            pk_buckets=args.pk_buckets,
            merge_mode=args.merge_mode,
            cdf=args.cdf,
            compact_after_merges=args.compact_every,
            snapshot_reader=(
                _jdbc_snapshot_reader(args, td) if source_attached else None
            ),
        )
        for _, td in sorted(defs.items())
    ]

    server = None
    if args.status_port is not None:
        server = serve(registry, port=args.status_port)
    try:
        if args.mode == "snapshot-only":
            errors = {}
            for r in reps:
                try:
                    r.load_snapshot()
                    errors[r.fqn] = None
                except Exception as exc:  # per-table isolation (core.go:258-261)
                    errors[r.fqn] = str(exc)
        elif args.loop:
            # per-table poll loops on threads (core.go:263-293 fan-out)
            stop = threading.Event()
            errors = {}
            lock = threading.Lock()

            def work(rep: TableReplicator) -> None:
                try:
                    if args.mode == "incremental-only":
                        rep.consume_increments()  # no snapshot probe
                        polls = 1
                        while not stop.is_set() and (
                            args.max_polls is None or polls < args.max_polls
                        ):
                            stop.wait(args.poll_interval)
                            if not stop.is_set():
                                rep.consume_increments()
                                polls += 1
                    else:
                        rep.run_loop(
                            poll_interval_s=args.poll_interval,
                            stop_event=stop,
                            max_polls=args.max_polls,
                        )
                    err = None
                except Exception as exc:
                    err = str(exc)
                with lock:
                    errors[rep.fqn] = err

            threads = [threading.Thread(target=work, args=(r,)) for r in reps]
            for t in threads:
                t.start()
            try:
                for t in threads:
                    t.join()
            except KeyboardInterrupt:
                stop.set()
                for t in threads:
                    t.join()
        else:
            if args.mode == "incremental-only":
                errors = {}
                for r in reps:
                    try:
                        r.consume_increments()
                        errors[r.fqn] = None
                    except Exception as exc:
                        errors[r.fqn] = str(exc)
            else:
                errors = replicate_all(reps)
    finally:
        if server is not None:
            server.shutdown()

    print(registry.to_json())
    failed = {t: e for t, e in errors.items() if e}
    if failed:
        print("failed:", json.dumps(failed), file=sys.stderr)
        return 1
    return 0


def _cmd_export(args: argparse.Namespace) -> int:
    from .session import get_spark
    from .sources.export import export_changelog, export_snapshot
    from .table.managed import ManagedTable

    spark = get_spark("tidb2dw_spark-export")
    table = ManagedTable(Path(args.warehouse_dir) / args.table)
    if not table.exists():
        print("no managed table at", table.root, file=sys.stderr)
        return 1
    since = args.since
    if since is None:
        since = export_snapshot(
            spark, table, args.out_dir, args.schema_name, args.table
        )
    last = export_changelog(
        spark, table, args.out_dir, args.schema_name, args.table, since=since
    )
    print(json.dumps({"snapshot_seq": since, "last_exported_seq": last}))
    return 0


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.command == "tables":
        return _cmd_tables(args)
    if args.command == "optimize":
        return _cmd_optimize(args)
    if args.command == "export":
        return _cmd_export(args)
    return _cmd_replicate(args)


if __name__ == "__main__":
    raise SystemExit(main())
