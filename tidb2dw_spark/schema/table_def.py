"""Table definitions and versioned schema files.

Mirrors the reference's JSON schema-file contract (SURVEY §1.1, §1.3):
each DDL in the source produces ``meta/schema_{tableVersion}_{checksum}.json``
carrying the full column list, the DDL query text and an action type
(reference replicate/increment.go:97-169; TableCol fields per
pkg/tidbsql/ddl.go:36-41).  The checksum is CRC32 over the canonical JSON
of the ``TableDefinition`` minus the checksum itself
(increment.go:123-135 parity).
"""

from __future__ import annotations

import json
import re
import zlib
from dataclasses import dataclass, field, asdict
from pathlib import Path


@dataclass
class TableCol:
    """One column of a versioned table definition.

    Field set per reference pkg/tidbsql/ddl.go:36-41 — string-typed
    ``nullable``/``is_pk`` ("true"/"false") kept for JSON-contract parity.
    """

    id: str
    name: str
    tp: str
    default: str | None = None
    precision: str = ""
    scale: str = ""
    nullable: str = "true"
    is_pk: str = "false"

    def to_json_dict(self) -> dict:
        d = {
            "ColumnId": self.id,
            "ColumnName": self.name,
            "ColumnType": self.tp,
            "ColumnPrecision": self.precision,
            "ColumnScale": self.scale,
            "ColumnNullable": self.nullable,
            "ColumnIsPk": self.is_pk,
        }
        if self.default is not None:
            d["ColumnDefault"] = self.default
        return d

    @classmethod
    def from_json_dict(cls, d: dict) -> "TableCol":
        return cls(
            id=str(d.get("ColumnId", "")),
            name=d.get("ColumnName", ""),
            tp=d.get("ColumnType", ""),
            default=d.get("ColumnDefault"),
            precision=str(d.get("ColumnPrecision", "") or ""),
            scale=str(d.get("ColumnScale", "") or ""),
            nullable=str(d.get("ColumnNullable", "true")),
            is_pk=str(d.get("ColumnIsPk", "false")),
        )


@dataclass
class TableDefinition:
    """A full table schema at one table version (one per DDL event)."""

    schema: str
    table: str
    version: int
    columns: list[TableCol] = field(default_factory=list)
    query: str = ""  # the DDL statement text; empty for the bootstrap file
    type: int = 0  # DDL action type code (reference timodel.ActionType)

    @property
    def pk_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_pk == "true"]

    def to_json_dict(self) -> dict:
        return {
            "Table": self.table,
            "Schema": self.schema,
            "Version": self.version,
            "TableColumns": [c.to_json_dict() for c in self.columns],
            "Query": self.query,
            "Type": self.type,
        }

    def checksum(self) -> int:
        payload = json.dumps(self.to_json_dict(), sort_keys=True, separators=(",", ":"))
        return zlib.crc32(payload.encode("utf-8")) & 0xFFFFFFFF

    def dump(self, path: str | Path) -> Path:
        """Write as ``schema_{version}_{checksum}.json`` under *path* (a dir)."""
        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        out = path / f"schema_{self.version}_{self.checksum()}.json"
        out.write_text(json.dumps(self.to_json_dict(), indent=2))
        return out

    @classmethod
    def from_json_dict(cls, d: dict) -> "TableDefinition":
        return cls(
            schema=d.get("Schema", ""),
            table=d.get("Table", ""),
            version=int(d.get("Version", 0)),
            columns=[TableCol.from_json_dict(c) for c in d.get("TableColumns", [])],
            query=d.get("Query", ""),
            type=int(d.get("Type", 0)),
        )


def pk_columns_from_index_rows(rows: list[dict]) -> list[str]:
    """O2 — ordered PRIMARY-key columns from SHOW INDEX-shaped rows
    (dicts with Key_name / Seq_in_index / Column_name), sorted by
    (key_name, seq_in_index) exactly like tidbsql/ddl.go:205-222."""
    primary = [r for r in rows if r.get("Key_name") == "PRIMARY"]
    primary.sort(key=lambda r: (r.get("Key_name", ""), int(r.get("Seq_in_index", 0))))
    return [r["Column_name"] for r in primary]


_SCHEMA_FILE_RE = re.compile(r"schema_(\d+)_(\d+)\.json$")


def parse_schema_file_name(name: str) -> tuple[int, int] | None:
    """Return (table_version, checksum) from a schema file name, or None."""
    m = _SCHEMA_FILE_RE.search(name)
    if not m:
        return None
    return int(m.group(1)), int(m.group(2))


def load_schema_file(path: str | Path, verify: bool = True) -> TableDefinition:
    """Load + CRC-verify a schema file (increment.go:114-135 parity)."""
    path = Path(path)
    parsed = parse_schema_file_name(path.name)
    d = json.loads(path.read_text())
    td = TableDefinition.from_json_dict(d)
    if verify and parsed is not None:
        expect_version, expect_crc = parsed
        if td.version != expect_version:
            raise ValueError(
                f"schema file {path.name}: version {td.version} != filename {expect_version}"
            )
        actual = td.checksum()
        if actual != expect_crc:
            raise ValueError(
                f"schema file {path.name}: checksum {actual} != filename {expect_crc}"
            )
    return td
