"""Incremental changelog file discovery and ordering (S4/S5/O1/O3 parity).

Path grammar (reference replicate/increment.go:143-151):

    {root}/{schema}/{table}/{tableVersion}/{date}/CDC{NNNNNN}.csv
    {root}/{schema}/{table}/{tableVersion}/{partition}/{date}/CDC{NNNNNN}.csv
    {root}/{schema}/{table}/{tableVersion}/meta/schema_{ver}_{crc}.json

Spark's file-stream source detects new files but NOT in the required order;
ordering here is structural (SURVEY §4.3.1): batches must be applied by
``(tableVersion, partitionNum, date)`` with schema files acting as a DDL
barrier — modeled, as in the reference (increment.go:29,141-167), by a fake
``partition_num=-1`` key that sorts before every DML key of its version —
and file indices strictly ascending within a key (increment.go:362-367).

Discovery is driver-side listing + dict diff (increment.go:172-229 parity):
cheap (metadata-only), restart-safe (rebuilt each poll from the listing and
checkpoint markers), and independent of data volume — at 100 TB the listing
cost scales with file count, not bytes.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from pathlib import Path

DEFAULT_FILE_INDEX_WIDTH = 6

_DML_RE = re.compile(
    r"^(?P<schema>[^/]+)/(?P<table>[^/]+)/(?P<version>\d+)"
    r"(?:/(?P<partition>\d+))?"
    r"/(?P<date>\d{4}-\d{2}-\d{2})"
    r"/CDC(?P<idx>\d+)\.(?P<ext>csv|json)$"
)
_SCHEMA_RE = re.compile(
    r"^(?P<schema>[^/]+)/(?P<table>[^/]+)/(?P<version>\d+)"
    r"/meta/schema_(?P<ver>\d+)_(?P<crc>\d+)\.json$"
)


@dataclass(frozen=True, order=True)
class DmlPathKey:
    """Sortable batch key; DDL barrier = partition_num -1 sorts first."""

    schema: str
    table: str
    version: int
    partition_num: int  # -1 marks the schema (DDL) pseudo-key
    date: str

    @property
    def is_ddl_barrier(self) -> bool:
        return self.partition_num == -1


@dataclass(frozen=True)
class CdcFile:
    key: DmlPathKey
    index: int
    path: str


def parse_dml_file_path(rel_path: str) -> CdcFile | None:
    """Parse one relative CDC file path (increment.go:82-95 parity)."""
    m = _DML_RE.match(rel_path.replace(os.sep, "/"))
    if not m:
        return None
    key = DmlPathKey(
        schema=m.group("schema"),
        table=m.group("table"),
        version=int(m.group("version")),
        partition_num=int(m.group("partition")) if m.group("partition") else 0,
        date=m.group("date"),
    )
    return CdcFile(key=key, index=int(m.group("idx")), path=rel_path)


def parse_schema_file_path(rel_path: str) -> tuple[DmlPathKey, int, int] | None:
    """Parse a schema-file path → (barrier key, version, crc)."""
    m = _SCHEMA_RE.match(rel_path.replace(os.sep, "/"))
    if not m:
        return None
    key = DmlPathKey(
        schema=m.group("schema"),
        table=m.group("table"),
        version=int(m.group("version")),
        partition_num=-1,
        date="",
    )
    return key, int(m.group("ver")), int(m.group("crc"))


def generate_dml_file_path(
    key: DmlPathKey, file_idx: int, ext: str = "csv", width: int = DEFAULT_FILE_INDEX_WIDTH
) -> str:
    """Inverse of parse (increment.go:254 parity) — used by fixtures/tests."""
    parts = [key.schema, key.table, str(key.version)]
    if key.partition_num > 0:
        parts.append(str(key.partition_num))
    parts.append(key.date)
    parts.append(f"CDC{file_idx:0{width}d}.{ext}")
    return "/".join(parts)


def discover_increment_files(
    root: str | Path,
) -> tuple[dict[DmlPathKey, tuple[int, int]], dict[DmlPathKey, str], dict[DmlPathKey, dict[int, str]]]:
    """Walk the increment root; classify schema vs DML files.

    Returns ``(dml_index_map, schema_files, file_paths)`` where
    ``dml_index_map[key] = (min_idx, max_idx)`` over files present,
    ``schema_files[barrier_key] = abs path`` and
    ``file_paths[key][idx] = abs path``.  Files with a sibling
    ``.checkpoint`` marker are still listed; the consumer skips them
    (increment.go:240-247 parity lives in streaming.consumer).
    """
    root = Path(root)
    dml_map: dict[DmlPathKey, tuple[int, int]] = {}
    schema_files: dict[DmlPathKey, str] = {}
    file_paths: dict[DmlPathKey, dict[int, str]] = {}
    if not root.exists():
        return dml_map, schema_files, file_paths
    for p in sorted(root.rglob("*")):
        if not p.is_file():
            continue
        rel = p.relative_to(root).as_posix()
        sch = parse_schema_file_path(rel)
        if sch is not None:
            schema_files[sch[0]] = str(p)
            continue
        dml = parse_dml_file_path(rel)
        if dml is None:
            continue
        lo, hi = dml_map.get(dml.key, (dml.index, dml.index))
        dml_map[dml.key] = (min(lo, dml.index), max(hi, dml.index))
        file_paths.setdefault(dml.key, {})[dml.index] = str(p)
    return dml_map, schema_files, file_paths


def diff_dml_maps(
    current: dict[DmlPathKey, tuple[int, int]],
    seen: dict[DmlPathKey, int],
) -> dict[DmlPathKey, tuple[int, int]]:
    """New (start, end] index ranges vs the last-seen max per key
    (increment.go:172-190 parity)."""
    out: dict[DmlPathKey, tuple[int, int]] = {}
    for key, (lo, hi) in current.items():
        last = seen.get(key)
        start = lo if last is None else last + 1
        if start <= hi:
            out[key] = (start, hi)
    return out


def sorted_pending_keys(keys) -> list[DmlPathKey]:
    """Stable processing order: (schema, table, version, partition, date)
    with DDL barriers (partition_num=-1) first within their version
    (increment.go:340-348 parity)."""
    return sorted(keys)
