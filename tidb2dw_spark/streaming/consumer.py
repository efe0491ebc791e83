"""Ordered incremental consumer loop (SURVEY §3.1 step 4, §2.10).

Reproduces the reference's replicate/increment.go pipeline Spark-first:

    poll: list files → classify schema/DML → diff vs seen indices
        → sort pending keys (DDL barriers first within a version)
        → per schema key: execute DDL (column-diff → evolve managed table)
              then GC outdated schema files (increment.go:283-329)
        → per table version: union all pending DML files (skipping ones
              with a .checkpoint marker) tagged with their application
              order → ONE W1 dedup → ONE bucket-pruned merge commit
              → write all markers

Grouping every pending file of a version into a single merge (instead of
one merge per file) is both the correctness and the scale move:
correctness, because last-writer-wins is then decided by commit_ts across
partitions/files in one window (a stale commit_ts in a higher-numbered
partition directory can no longer overwrite a newer row — blind per-file
replacement is order-dependent); scale, because a poll that finds a
backlog of N 64 MiB CDC files issues one shuffle + one bucket-pruned
rewrite of the managed table, not N full passes.  Markers are written
after the combined atomic commit; a crash in between replays the files
into an idempotent merge (same end state).

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

from pyspark.sql import functions as F

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
from ..sources.envelope import FILE_SEQ_COL, envelope_schema
from ..sources.snapshot import read_changelog_json, read_snapshot_csv
from ..table.managed import ManagedTable

CHECKPOINT_SUFFIX = ".checkpoint"


@dataclass
class ConsumerReport:
    files_processed: int = 0
    files_skipped: int = 0
    ddl_applied: int = 0
    merge_commits: int = 0
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
        gc_schema_files: bool = True,
        compact_after_merges: int | None = None,
        compact_max_files: int = 4,
        broadcast_batch_max_bytes: int = 256 << 20,
    ):
        self.spark = spark
        self.root = Path(increment_root)
        self.table = table
        self.write_markers = write_markers
        # reference parity (increment.go:283-329): after a DDL is applied,
        # schema files of older versions are deleted and the current one is
        # rewritten with its Query cleared (it has been executed)
        self.gc_schema_files = gc_schema_files
        self._schema_file_paths: dict[DmlPathKey, str] = {}
        # every merge writes one file per shuffle task into each touched
        # bucket, so a long-running stream decays the table into thousands
        # of tiny files; opt-in auto-compaction (Delta auto-OPTIMIZE
        # parity) bin-packs after every N merge commits
        self.compact_after_merges = compact_after_merges
        self.compact_max_files = compact_max_files
        self._merges_since_compact = 0
        # adaptive merge-join strategy: a normal poll's group is a few
        # 64 MiB CDC files and its PK key set broadcasts cheaply, but the
        # grouped consumer makes ONE batch as large as the whole backlog —
        # past this many staged bytes the broadcast hint is dropped and
        # AQE picks the join (shuffle when the key set is big)
        self.broadcast_batch_max_bytes = broadcast_batch_max_bytes
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
        # applied table DEFINITIONS survive restarts in the manifest too:
        # schema-file GC deletes older-version files after a barrier, but a
        # LATE pre-DDL DML file still needs its version's read schema —
        # without this a restarted consumer could no longer conform it
        if table.exists():
            for v, d in table.manifest().get("applied_table_defs", {}).items():
                self.table_defs[int(v)] = TableDefinition.from_json_dict(d)

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
        self._schema_file_paths = dict(schema_files)
        for barrier_key, path in schema_files.items():
            if barrier_key.version not in self.table_defs:
                self.table_defs[barrier_key.version] = load_schema_file(path)

        keys = set(pending) | {
            k for k in schema_files if k.version not in (self._applied_versions())
        }
        # pending DML files accumulated for one combined merge; flushed at
        # every DDL barrier / version boundary so schema changes stay
        # strictly ordered relative to the data they apply to
        group: list[tuple[DmlPathKey, int, str]] = []
        for key in sorted_pending_keys(keys):
            if key.is_ddl_barrier:
                self._flush_dml_group(group, report)
                group = []
                self._exec_ddl(key, report)
                continue
            if group and group[0][0].version != key.version:
                self._flush_dml_group(group, report)
                group = []
            start, end = pending.get(key, (0, -1))
            for idx in range(start, end + 1):
                path = file_paths.get(key, {}).get(idx)
                if path is None:
                    continue
                if Path(path + CHECKPOINT_SUFFIX).exists():
                    report.files_skipped += 1
                    self.seen_indices[key] = idx
                    continue
                group.append((key, idx, path))
        self._flush_dml_group(group, report)
        return report

    def _applied_versions(self) -> set[int]:
        return set() if self.current_version is None else {
            v for v in self.table_defs if v <= self.current_version
        }

    def _defs_for_manifest(self, *versions: int) -> dict[str, dict]:
        """Manifest-persisted table definitions: existing entries plus the
        given versions from the in-memory cache."""
        defs = (
            dict(self.table.manifest().get("applied_table_defs", {}))
            if self.table.exists()
            else {}
        )
        for v in versions:
            td = self.table_defs.get(v)
            if td is not None:
                defs[str(v)] = td.to_json_dict()
        return defs

    # -- DDL barrier ------------------------------------------------------
    def _exec_ddl(self, key: DmlPathKey, report: ConsumerReport) -> None:
        """D6/D7 — first schema file bootstraps (InitSchema); later ones
        drive the column-diff → ALTER pipeline (increment.go:283-329)."""
        new_def = self.table_defs[key.version]
        if self.current_version is None:
            # InitSchema (D7): cache + persist the bootstrap version
            self.current_version = key.version
            if self.table.exists():
                self.table.update_meta(
                    source_schema_version=key.version,
                    applied_table_defs=self._defs_for_manifest(key.version),
                )
            return
        if key.version <= self.current_version:
            return
        prev_def = self.table_defs.get(self.current_version)
        if prev_def is not None and self.table.exists():
            diffs = diff_columns(prev_def.columns, new_def.columns)
            apply_column_diffs(
                self.spark, self.table, diffs,
                extra_meta={
                    "source_schema_version": key.version,
                    # committed atomically with the evolution, so a late
                    # pre-DDL file can be read after restart + schema GC
                    "applied_table_defs": self._defs_for_manifest(
                        self.current_version, key.version
                    ),
                },
            )
            report.ddl_applied += 1
        self.current_version = key.version
        if self.gc_schema_files:
            self._gc_schema_files(key)

    def _gc_schema_files(self, applied_key: DmlPathKey) -> None:
        """Schema-file GC + rewrite (increment.go:283-329 parity): once a
        DDL barrier has been applied, delete schema files of OLDER versions
        for this table (their DML files are guaranteed already merged —
        barriers are processed in version order), and rewrite the just-
        applied version's file with its ``Query`` cleared so a restarted
        consumer treats it as already-executed bootstrap state."""
        for barrier_key, path in list(self._schema_file_paths.items()):
            if (barrier_key.schema, barrier_key.table) != (
                applied_key.schema, applied_key.table
            ):
                continue
            p = Path(path)
            if barrier_key.version < applied_key.version:
                p.unlink(missing_ok=True)
                del self._schema_file_paths[barrier_key]
            elif barrier_key.version == applied_key.version:
                td = self.table_defs[barrier_key.version]
                if td.query:
                    td.query = ""
                    new_path = td.dump(p.parent)
                    if new_path != p:
                        p.unlink(missing_ok=True)
                    self._schema_file_paths[barrier_key] = str(new_path)

    # -- DML micro-batch --------------------------------------------------
    def _conform_batch(self, batch):
        """Late-arriving files of an OLDER table version (their barrier
        already applied) lack columns added since; fill exactly the
        columns the manifest records as ADDed (with their rendered
        default — what the reference's warehouse INSERT of the old column
        list would produce).  Any other schema mismatch (e.g. a late file
        predating a RENAME) still fails loudly rather than silently
        misfiling data."""
        import json

        from pyspark.sql.types import StructType

        m = self.table.manifest()
        defaults = m.get("column_defaults", {})
        missing = [
            c for c in m.get("columns", []) if c not in batch.columns and c in defaults
        ]
        if not missing:
            return batch
        by_name = {
            f.name: f
            for f in StructType.fromJson(json.loads(m["schema_json"])).fields
        }
        for c in missing:
            d = defaults.get(c)
            col = F.lit(d) if d is not None else F.lit(None)
            batch = batch.withColumn(c, col.cast(by_name[c].dataType))
        return batch

    def _read_dml_group(self, group: list[tuple[DmlPathKey, int, str]], schema):
        """One multi-path scan per format, tagged with each file's
        application order via an input_file_name → seq lookup (broadcast
        map-side join, no shuffle).  A catch-up backlog of N files costs
        one scan job with constant-depth lineage, not an N-deep union
        chain whose analysis cost grows with the backlog.  Dispatch on
        extension: TiCDC emits CSV or canal-json
        (sources/changelog._DML_RE admits both)."""
        by_ext: dict[str, list[tuple[str, int]]] = {}
        for seq, (_key, _idx, path) in enumerate(group):
            ext = "json" if path.endswith(".json") else "csv"
            by_ext.setdefault(ext, []).append((path, seq))
        import os
        from urllib.parse import quote

        parts = []
        for ext, pairs in by_ext.items():
            paths = [p for p, _ in pairs]
            df = (
                read_changelog_json(self.spark, paths, schema)
                if ext == "json"
                else read_snapshot_csv(self.spark, paths, schema)
            )
            # input_file_name() returns a percent-ENCODED file URI and does
            # NOT resolve symlinks, so the lookup keys carry every plausible
            # rendering of each staged path: plain abspath (no symlinks /
            # no special chars — the common case), symlink-resolved, and
            # percent-encoded (spaces etc.).  All variants of one path map
            # to the same seq, so extra variants can never mis-tag a row —
            # and an UNMATCHED file fails loudly below instead of silently
            # dropping the serial-application tiebreaker.
            rows = []
            for p, s in pairs:
                ap = os.path.abspath(p)
                for v in {ap, str(Path(p).resolve()), quote(ap, safe="/")}:
                    rows.append((v, s))
            seq_map = self.spark.createDataFrame(
                rows, f"__file string, {FILE_SEQ_COL} int"
            )
            unmatched = F.raise_error(
                F.concat(
                    F.lit("__file_seq: scanned file missing from staged group: "),
                    F.col("__file"),
                )
            )
            tagged = (
                df.withColumn(
                    "__file",
                    F.regexp_replace(F.input_file_name(), "^file:(//)?", ""),
                )
                .join(F.broadcast(seq_map), on="__file", how="left")
                .withColumn(
                    FILE_SEQ_COL,
                    F.coalesce(F.col(FILE_SEQ_COL), unmatched.cast("int")),
                )
                .drop("__file")
            )
            parts.append(tagged)
        batch = parts[0]
        for p in parts[1:]:
            batch = batch.unionByName(p)
        return batch

    def _flush_dml_group(
        self, group: list[tuple[DmlPathKey, int, str]], report: ConsumerReport
    ) -> None:
        """Union all pending files of one table version (tagged with their
        application order), then commit them as ONE bucket-pruned merge
        (ManagedTable.merge: W1 dedup inside, rewrites only the bucket
        partitions the batch's PKs hash to — O(touched data) per poll,
        reference semantics increment.go:249-281)."""
        if not group:
            return
        version = group[0][0].version
        table_def = self.table_defs.get(version)
        if table_def is None:
            raise RuntimeError(
                f"no schema registered for version {version} ({group[0][2]})"
            )
        schema = envelope_schema(table_def_to_struct(table_def))
        batch = self._conform_batch(self._read_dml_group(group, schema))
        extra_meta = (
            {"source_schema_version": self.current_version}
            if self.current_version is not None
            else None
        )
        group_bytes = 0
        for _key, _idx, path in group:
            try:
                group_bytes += Path(path).stat().st_size
            except OSError:
                group_bytes = self.broadcast_batch_max_bytes + 1  # unknown → safe
                break
        self.table.merge(
            self.spark,
            batch,
            extra_meta=extra_meta,
            broadcast_batch=group_bytes <= self.broadcast_batch_max_bytes,
        )
        report.merge_commits += 1
        report.files_processed += len(group)
        for key, idx, path in group:
            if self.write_markers:
                Path(path + CHECKPOINT_SUFFIX).touch()
            self.seen_indices[key] = max(self.seen_indices.get(key, -1), idx)
        if self.compact_after_merges is not None:
            self._merges_since_compact += 1
            if self._merges_since_compact >= self.compact_after_merges:
                self.table.compact(
                    self.spark, max_files_per_bucket=self.compact_max_files
                )
                self._merges_since_compact = 0
