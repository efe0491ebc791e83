"""Full-replication orchestrator: snapshot load + incremental consume per
table, with per-table fan-out and stage tracking.

Reference parity: cmd/core.go:230-295 (goroutine per table, stage markers,
per-table error isolation) and replicate/snapshot.go:170-191 (copy schema →
load snapshot → write `.loadinfo`).  Spark-side differences: file-level
load parallelism is the task scheduler's job (no 16-way semaphore), and the
per-table fan-out uses threads — Spark sessions are thread-safe and
concurrent jobs interleave on the shared scheduler.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .metrics import DEFAULT_REGISTRY, ERROR_COUNT, MetricsRegistry, TableStage
from .schema.table_def import TableDefinition
from .schema.types import table_def_to_struct
from .sources.snapshot import read_snapshot_csv, snapshot_glob
from .streaming.consumer import IncrementConsumer
from .table.managed import ManagedTable

LOADINFO_SUFFIX = ".loadinfo"


class SliceSharingTable:
    """Proxy over a :class:`ManagedTable` that memoizes ``changes()`` per
    (since, until) range and PERSISTS the slice — so N derived objects
    hanging off one table fold from ONE feed scan per poll instead of N.

    In steady state every view's ``applied_seq`` equals the table's
    previous ``cdf_seq``, so all N refreshes request the identical range
    and the scan amortizes N×.  Views that lag (crash between merge and
    refresh) request a different range and simply read it themselves —
    correctness never depends on the cache.  The trade is columnar: the
    persisted slice is full-width while each view would have pruned to
    its own columns; a change slice is O(changes) rows, so at 100 TB one
    wide O(changes) scan is far cheaper than N narrow ones (and the
    cache is MEMORY_AND_DISK — a giant catch-up slice spills instead of
    OOMing).  Call :meth:`release` after the refresh loop; the proxy is
    single-poll scoped by design (a new commit changes the range anyway).

    Every other attribute forwards to the underlying table, so the
    derived protocol (``manifest()`` / ``_read_state`` / recount paths)
    is untouched."""

    def __init__(self, table: ManagedTable):
        self._table = table
        self._slices: dict[tuple, DataFrame] = {}
        self.slice_scans = 0  # distinct ranges actually read
        self.slice_hits = 0  # refreshes served from the shared slice

    def __getattr__(self, name):
        return getattr(self._table, name)

    def changes(
        self, spark: SparkSession, since: int = 0, until: int | None = None
    ) -> DataFrame:
        key = (since, until)
        hit = key in self._slices
        if not hit:
            from pyspark.storagelevel import StorageLevel

            self._slices[key] = self._table.changes(
                spark, since=since, until=until
            ).persist(StorageLevel.MEMORY_AND_DISK)
            self.slice_scans += 1
        else:
            self.slice_hits += 1
        return self._slices[key]

    def release(self) -> None:
        for df in self._slices.values():
            df.unpersist()
        self._slices.clear()


class TableReplicator:
    """One table's snapshot → incremental lifecycle."""

    def __init__(
        self,
        spark: SparkSession,
        snapshot_dir: str | Path | None,
        increment_root: str | Path,
        warehouse_dir: str | Path,
        table_def: TableDefinition,
        registry: MetricsRegistry = DEFAULT_REGISTRY,
        pk_buckets: int = 0,
        compact_after_merges: int | None = None,
        snapshot_reader: Callable[[SparkSession], DataFrame] | None = None,
        merge_mode: str = "cow",
        cdf: bool = False,
        derived: list | None = None,
    ):
        """*snapshot_reader* switches the snapshot phase to source-attached
        mode (the reference's direct dump, dump.go:84-147): the callable
        returns the live-source DataFrame — e.g. a TSO-pinned partitioned
        ``sources.jdbc.snapshot_read`` — and no staged CSVs are consulted.
        The frame is conformed to *table_def* by case-insensitive name
        (JDBC catalogs may upper-case identifiers) and cast per column.
        *snapshot_dir* may be None in this mode; idempotent resume then
        keys off the managed table's existence instead of `.loadinfo`.

        *derived* attaches DERIVED STATE to the poll loop: any objects
        with a ``refresh(spark, table)`` method —
        :class:`~.operators.secondary_index.SecondaryIndex`,
        :class:`~.operators.matview.MaintainedAggregate`,
        :class:`~.operators.distinct_matview.MaintainedDistinctAggregate`,
        a bound join/star view
        (:meth:`~.operators.join_matview.MaintainedStarAggregate.bind`),
        or an ANN index — are refreshed
        from the change feed after every poll that lands data, so
        indexes and rollups ride the SAME cadence as the replica itself.
        Each object checkpoints its own ``applied_seq``, so a crash
        between merge and refresh is repaired by the next poll
        (exactly-once via idempotent slice folding), and a refresh
        failure is isolated per table like any other consumer error.
        Requires ``cdf=True`` (the feed is what the refreshes fold)."""
        if snapshot_dir is None and snapshot_reader is None:
            raise ValueError("need snapshot_dir (staged mode) or snapshot_reader")
        if derived and not cdf:
            raise ValueError("derived state needs the change feed: pass cdf=True")
        self.spark = spark
        self.snapshot_dir = None if snapshot_dir is None else Path(snapshot_dir)
        self.snapshot_reader = snapshot_reader
        self.increment_root = Path(increment_root)
        self.table_def = table_def
        self.registry = registry
        self.pk_buckets = pk_buckets
        self.merge_mode = merge_mode
        self.cdf = cdf
        self.compact_after_merges = compact_after_merges
        self.derived = list(derived or [])
        self.table = ManagedTable(Path(warehouse_dir) / table_def.table)
        self.consumer: IncrementConsumer | None = None

    @property
    def fqn(self) -> str:
        return f"{self.table_def.schema}.{self.table_def.table}"

    def _loadinfo_path(self) -> Path:
        return self.snapshot_dir / f"{self.fqn}{LOADINFO_SUFFIX}"

    def _conform_source(self, df: DataFrame) -> DataFrame:
        """Align a live-source frame to the table definition: match columns
        case-insensitively (Derby/Oracle-style catalogs upper-case names)
        and cast each to the declared type."""
        struct = table_def_to_struct(self.table_def)
        by_lower = {c.lower(): c for c in df.columns}
        cols = []
        for field in struct.fields:
            src = by_lower.get(field.name.lower())
            if src is None:
                raise ValueError(
                    f"{self.fqn}: source snapshot missing column {field.name!r}"
                )
            cols.append(F.col(src).cast(field.dataType).alias(field.name))
        return df.select(*cols)

    def load_snapshot(self) -> bool:
        """Idempotent snapshot load; skipped when `.loadinfo` exists
        (snapshot.go:160-166 + cmd/core.go:268 resume probe).  In
        source-attached mode the table's own existence is the marker."""
        done = self.table.exists() and (
            self.snapshot_dir is None or self._loadinfo_path().exists()
        )
        if done:
            self.registry.set_stage(self.fqn, TableStage.SNAPSHOT_LOADED)
            return False
        if self.snapshot_reader is not None:
            df = self._conform_source(self.snapshot_reader(self.spark))
        else:
            glob = snapshot_glob(
                str(self.snapshot_dir), self.table_def.schema, self.table_def.table
            )
            df = read_snapshot_csv(self.spark, glob, table_def_to_struct(self.table_def))
        self.table.create(
            df,
            self.table_def.pk_columns,
            pk_buckets=self.pk_buckets,
            extra_meta={"source_schema_version": self.table_def.version},
            merge_mode=self.merge_mode,
            cdf=self.cdf,
        )
        if self.snapshot_dir is not None:
            self._loadinfo_path().touch()
        self.registry.set_stage(self.fqn, TableStage.SNAPSHOT_LOADED)
        return True

    def consume_increments(self) -> None:
        if self.consumer is None:
            self.consumer = IncrementConsumer(
                self.spark,
                self.increment_root,
                self.table,
                schema_name=self.table_def.schema,
                table_name=self.table_def.table,
                compact_after_merges=self.compact_after_merges,
            )
        report = self.consumer.poll_once()
        self.registry.set_stage(self.fqn, TableStage.INCREMENTAL)
        self.registry.add(self.fqn, "files_processed", report.files_processed)
        self.registry.add(self.fqn, "ddl_applied", report.ddl_applied)
        # ≥2 derived objects share one persisted feed slice per poll —
        # the scan amortizes across views instead of repeating per view
        shared = (
            SliceSharingTable(self.table)
            if len(self.derived) > 1
            else self.table
        )
        for d in self.derived:
            # first poll seeds (SecondaryIndex needs an explicit build;
            # MaintainedAggregate seeds inside refresh); after that each
            # object folds exactly (its applied_seq, cdf_seq] — a
            # zero-file poll is a cheap no-op and a crash between merge
            # and refresh self-repairs next poll
            t0 = time.monotonic()
            if not d.exists() and hasattr(d, "build"):
                d.build(self.spark, shared)
            else:
                d.refresh(self.spark, shared)
            # per-object upkeep cost rides the registry (metrics.go Add
            # parity): cumulative seconds + a last-refresh gauge, keyed
            # by the object's class so /info and the prometheus text
            # separate index upkeep from view upkeep
            kind = type(d).__name__.lower()
            dt = time.monotonic() - t0
            self.registry.add(self.fqn, f"derived_{kind}_seconds", dt)
            self.registry.set_gauge(
                self.fqn, f"derived_{kind}_last_seconds", round(dt, 6)
            )
            # health gauges (e.g. the ANN index's drift monitor —
            # skew/sim-drop/churn + needs_rebuild): surfaced per poll so
            # an operator alerting on the registry sees staleness build
            # up without ever scanning the index
            gauges = getattr(d, "health_gauges", None)
            if callable(gauges):
                for gname, gval in (gauges() or {}).items():
                    self.registry.set_gauge(
                        self.fqn, f"derived_{kind}_{gname}", round(gval, 6)
                    )
            # opt-in self-repair: an index that declares auto_rebuild
            # re-trains when its OWN drift monitor trips.  Bounded by
            # construction — build() resets the baseline that tripped —
            # and it rides the poll loop so maintenance stays exact
            # between trips (refresh is rebuild-equivalent; the rebuild
            # guards RECALL, not correctness)
            if (
                getattr(d, "auto_rebuild", False)
                and callable(getattr(d, "needs_rebuild", None))
                and hasattr(d, "build")
                and d.needs_rebuild()
            ):
                t1 = time.monotonic()
                d.build(self.spark, shared)
                self.registry.add(self.fqn, f"derived_{kind}_rebuilds", 1)
                self.registry.set_gauge(
                    self.fqn,
                    f"derived_{kind}_last_rebuild_seconds",
                    round(time.monotonic() - t1, 6),
                )
        if self.derived:
            self.registry.add(self.fqn, "derived_refreshed", len(self.derived))
        if isinstance(shared, SliceSharingTable):
            # surfaced per poll: scans == distinct ranges read, hits ==
            # refreshes that folded from an already-persisted slice
            self.registry.add(self.fqn, "derived_slice_scans", shared.slice_scans)
            self.registry.add(self.fqn, "derived_slice_hits", shared.slice_hits)
            shared.release()

    def run_once(self) -> None:
        try:
            self.load_snapshot()
            self.consume_increments()
        except Exception as exc:  # per-table error isolation (core.go:258-261)
            self.registry.add(self.fqn, ERROR_COUNT, 1)
            self.registry.set_stage(self.fqn, TableStage.ERROR, error=str(exc))
            raise


    def run_loop(
        self,
        poll_interval_s: float = 12.0,
        stop_event: threading.Event | None = None,
        max_polls: int | None = None,
    ) -> int:
        """Continuous consumption: snapshot once, then poll the increment
        layout every *poll_interval_s* — the reference's ticker loop
        (increment.go:373-390; default = cdc flush interval / 5 = 12 s,
        cmd/core.go:284).  Stops on *stop_event* or after *max_polls*
        (None = forever).  Returns the number of polls executed."""
        stop = stop_event or threading.Event()
        self.load_snapshot()
        polls = 0
        while not stop.is_set():
            self.consume_increments()
            polls += 1
            if max_polls is not None and polls >= max_polls:
                break
            stop.wait(poll_interval_s)
        return polls


def replicate_all(replicators: list[TableReplicator]) -> dict[str, str | None]:
    """Per-table fan-out (core.go:263-293): each table on its own thread;
    one table's failure never stops the others.  Returns fqn → error."""
    errors: dict[str, str | None] = {}
    lock = threading.Lock()

    def work(rep: TableReplicator) -> None:
        try:
            rep.run_once()
            err = None
        except Exception as exc:
            err = str(exc)
        with lock:
            errors[rep.fqn] = err

    threads = [threading.Thread(target=work, args=(r,)) for r in replicators]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    return errors


def consistent_snapshot_all(
    replicators: list[TableReplicator],
    source_ts: int | None = None,
    views=None,
):
    """A :class:`~..table.consistent.ConsistentSnapshot` over a fleet's
    replicas — the read-side completion of the reference's shared-TSO
    model (cmd/core.go:183-220: Run fetches one startTSO via
    tidbsql.GetCurrentTSO and every table's dump + changefeed share it;
    core.go:263-293 fans the tables out, and the warehouse is
    expected to supply cross-table snapshot isolation — this supplies
    it for the managed-table layer).

    *source_ts=None* pins the HIGHEST fence every replica has fully
    applied (min over the fleet's ``source_ts_high``) — the freshest
    transactionally-consistent moment; a table that lags simply drags
    the fence back, it never tears the join.  Resolution is
    metadata-only (one commit-log scan per table).

    *views* (same mapping :class:`ConsistentSnapshot` takes: name →
    ``(view, source_fqn)`` or ``(view, [fact_fqn, dim_fqn, …])``)
    extends the pin to DERIVED state fleet-wide.  With an explicit
    *source_ts* the construction is strict — a view that cannot serve
    exactly that fence refuses (serving a neighbor would be the torn
    read the fence exists to prevent).  With *source_ts=None* the
    resolver WALKS BACK through the fleet's recorded fences (newest
    first) to the freshest one EVERY member — tables and views — holds
    a retained version for: a lagging or thin-retention view drags the
    fence back exactly like a lagging table, instead of failing the
    snapshot.  Raises (with the freshest fence's refusal) when no
    common fence exists — raise ``keep_versions`` on the views to
    widen the window.  Each attempt is metadata-only; the walk is
    bounded by the commit logs' recorded fence count."""
    from .table.consistent import ConsistentSnapshot

    tables = {r.fqn: r.table for r in replicators}
    if not tables:
        raise ValueError("no replicators given")
    if source_ts is not None:
        return ConsistentSnapshot(tables, source_ts, views=views)
    top = min(t.source_ts_high() for t in tables.values())
    if not views:
        return ConsistentSnapshot(tables, top)
    # candidate fences: every fence any table recorded, ≤ the fleet
    # minimum, tried newest-first.  Distinct fences are ≤ total commit
    # count — a metadata-sized walk.
    fences = sorted(
        {
            int(e.get("source_ts_high", 0) or 0)
            for t in tables.values()
            for e in t.history()
            if int(e.get("source_ts_high", 0) or 0) <= top
        },
        reverse=True,
    )
    first_err = None
    for ts in fences:
        try:
            return ConsistentSnapshot(tables, ts, views=views)
        except ValueError as exc:
            if first_err is None:
                first_err = (ts, exc)
    ts0, exc0 = first_err if first_err else (top, None)
    raise ValueError(
        "no fence every fleet member (tables AND views) can serve — "
        f"freshest candidate {ts0} refused with: {exc0}; raise "
        "keep_versions on the views (and refresh them once per source "
        "commit) to cover a pin window"
    )
