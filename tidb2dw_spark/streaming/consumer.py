"""Ordered incremental consumer loop (SURVEY §3.1 step 4, §2.10).

Reproduces the reference's replicate/increment.go pipeline Spark-first:

    poll: list files → classify schema/DML → diff vs seen indices
        → sort pending keys (DDL barriers first within a version)
        → per schema key: execute DDL (column-diff → evolve managed table)
        → per DML key:   for idx in start..end ascending:
              skip if .checkpoint marker → read CSV batch (envelope schema)
              → W1 dedup → merge into managed table → write marker

Why not a Structured Streaming file source: Spark's file stream detects new
files but delivers them in nondeterministic order, and DDL barriers require
a strict (version, partition, date, index) total order per table
(SURVEY §4.3.1).  The loop below is the reference's own design — driver-side
metadata orchestration (cheap: file listing only) around fully distributed
per-batch Spark jobs.  Exactly-once = at-least-once file processing +
idempotent merge + per-file checkpoint marker (increment.go:256-275 parity),
with the managed table's atomic manifest swap as the commit point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession

from ..operators.merge import apply_changelog
from ..schema.diff import diff_columns
from ..schema.evolve import apply_column_diffs
from ..schema.table_def import TableDefinition, load_schema_file
from ..schema.types import table_def_to_struct
from ..sources.changelog import (
    DmlPathKey,
    diff_dml_maps,
    discover_increment_files,
    sorted_pending_keys,
)
from ..sources.envelope import envelope_schema
from ..sources.snapshot import read_snapshot_csv
from ..table.managed import ManagedTable

CHECKPOINT_SUFFIX = ".checkpoint"


@dataclass
class ConsumerReport:
    files_processed: int = 0
    files_skipped: int = 0
    ddl_applied: int = 0
    rows_merged: int = 0
    errors: list[str] = field(default_factory=list)


class IncrementConsumer:
    """Consumes one table's changelog directory into a ManagedTable."""

    def __init__(
        self,
        spark: SparkSession,
        increment_root: str | Path,
        table: ManagedTable,
        write_markers: bool = True,
        schema_name: str | None = None,
        table_name: str | None = None,
    ):
        self.spark = spark
        self.root = Path(increment_root)
        self.table = table
        self.write_markers = write_markers
        # multi-table layouts share one increment root; each consumer owns
        # exactly one (schema, table) and must ignore its neighbors'
        # files (reference: one changefeed consumer per table)
        self.schema_name = schema_name
        self.table_name = table_name
        # consumer state — rebuilt each poll from listing + markers, so a
        # restarted consumer resumes safely (increment.go:43-47 parity)
        self.seen_indices: dict[DmlPathKey, int] = {}
        self.table_defs: dict[int, TableDefinition] = {}
        # applied source-schema version survives restarts in the table
        # manifest (reference persists this via schema-file GC + rewrite,
        # increment.go:283-329; the manifest swap is our atomic commit)
        self.current_version: int | None = (
            table.manifest().get("source_schema_version") if table.exists() else None
        )

    # -- one poll tick ----------------------------------------------------
    def _owns(self, key: DmlPathKey) -> bool:
        if self.schema_name is not None and key.schema != self.schema_name:
            return False
        if self.table_name is not None and key.table != self.table_name:
            return False
        return True

    def poll_once(self) -> ConsumerReport:
        report = ConsumerReport()
        dml_map, schema_files, file_paths = discover_increment_files(self.root)
        dml_map = {k: v for k, v in dml_map.items() if self._owns(k)}
        schema_files = {k: v for k, v in schema_files.items() if self._owns(k)}
        pending = diff_dml_maps(dml_map, self.seen_indices)

        # register every visible schema file first (S5)
        for barrier_key, path in schema_files.items():
            if barrier_key.version not in self.table_defs:
                self.table_defs[barrier_key.version] = load_schema_file(path)

        keys = set(pending) | {
            k for k in schema_files if k.version not in (self._applied_versions())
        }
        for key in sorted_pending_keys(keys):
            if key.is_ddl_barrier:
                self._exec_ddl(key, report)
                continue
            start, end = pending.get(key, (0, -1))
            for idx in range(start, end + 1):
                path = file_paths.get(key, {}).get(idx)
                if path is None:
                    continue
                if Path(path + CHECKPOINT_SUFFIX).exists():
                    report.files_skipped += 1
                    self.seen_indices[key] = idx
                    continue
                self._exec_dml_file(key, path, report)
                self.seen_indices[key] = idx
        return report

    def _applied_versions(self) -> set[int]:
        return set() if self.current_version is None else {
            v for v in self.table_defs if v <= self.current_version
        }

    # -- DDL barrier ------------------------------------------------------
    def _exec_ddl(self, key: DmlPathKey, report: ConsumerReport) -> None:
        """D6/D7 — first schema file bootstraps (InitSchema); later ones
        drive the column-diff → ALTER pipeline (increment.go:283-329)."""
        new_def = self.table_defs[key.version]
        if self.current_version is None:
            # InitSchema (D7): cache + persist the bootstrap version
            self.current_version = key.version
            if self.table.exists():
                self.table.update_meta(source_schema_version=key.version)
            return
        if key.version <= self.current_version:
            return
        prev_def = self.table_defs.get(self.current_version)
        if prev_def is not None and self.table.exists():
            diffs = diff_columns(prev_def.columns, new_def.columns)
            apply_column_diffs(
                self.spark, self.table, diffs,
                extra_meta={"source_schema_version": key.version},
            )
            report.ddl_applied += 1
        self.current_version = key.version

    # -- DML micro-batch --------------------------------------------------
    def _exec_dml_file(self, key: DmlPathKey, path: str, report: ConsumerReport) -> None:
        table_def = self.table_defs.get(key.version)
        if table_def is None:
            raise RuntimeError(f"no schema registered for version {key.version} ({path})")
        payload = table_def_to_struct(table_def)
        batch = read_snapshot_csv(self.spark, path, envelope_schema(payload))
        target = self.table.read(self.spark)
        merged = apply_changelog(target, batch, self.table.pk_cols())
        self.table.overwrite(merged)
        report.files_processed += 1
        if self.write_markers:
            Path(path + CHECKPOINT_SUFFIX).touch()
