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
from pathlib import Path

from pyspark.sql import SparkSession

from .metrics import DEFAULT_REGISTRY, ERROR_COUNT, MetricsRegistry, TableStage
from .schema.table_def import TableDefinition
from .schema.types import table_def_to_struct
from .sources.snapshot import read_snapshot_csv, snapshot_glob
from .streaming.consumer import IncrementConsumer
from .table.managed import ManagedTable

LOADINFO_SUFFIX = ".loadinfo"


class TableReplicator:
    """One table's snapshot → incremental lifecycle."""

    def __init__(
        self,
        spark: SparkSession,
        snapshot_dir: str | Path,
        increment_root: str | Path,
        warehouse_dir: str | Path,
        table_def: TableDefinition,
        registry: MetricsRegistry = DEFAULT_REGISTRY,
        pk_buckets: int = 0,
        compact_after_merges: int | None = None,
    ):
        self.spark = spark
        self.snapshot_dir = Path(snapshot_dir)
        self.increment_root = Path(increment_root)
        self.table_def = table_def
        self.registry = registry
        self.pk_buckets = pk_buckets
        self.compact_after_merges = compact_after_merges
        self.table = ManagedTable(Path(warehouse_dir) / table_def.table)
        self.consumer: IncrementConsumer | None = None

    @property
    def fqn(self) -> str:
        return f"{self.table_def.schema}.{self.table_def.table}"

    def _loadinfo_path(self) -> Path:
        return self.snapshot_dir / f"{self.fqn}{LOADINFO_SUFFIX}"

    def load_snapshot(self) -> bool:
        """Idempotent snapshot load; skipped when `.loadinfo` exists
        (snapshot.go:160-166 + cmd/core.go:268 resume probe)."""
        if self._loadinfo_path().exists() and self.table.exists():
            self.registry.set_stage(self.fqn, TableStage.SNAPSHOT_LOADED)
            return False
        glob = snapshot_glob(str(self.snapshot_dir), self.table_def.schema, self.table_def.table)
        df = read_snapshot_csv(self.spark, glob, table_def_to_struct(self.table_def))
        self.table.create(
            df,
            self.table_def.pk_columns,
            pk_buckets=self.pk_buckets,
            extra_meta={"source_schema_version": self.table_def.version},
        )
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
