"""Column-diff engine (D4) — the most algorithmic piece of the reference.

Computes per-column ADD / DROP / MODIFY / RENAME / UNCHANGE actions between
two table versions, reproducing the semantics of reference
pkg/tidbsql/ddl.go:15-113 (re-derived from its test fixture
pkg/tidbsql/ddl_test.go:11-88, not translated):

- same name, identical attributes            → UNCHANGE
- same name, changed type/precision/scale    → MODIFY
  (covers TiDB's type-change trick of rewriting the column under a NEW
  column ID, ddl.go:66-78 — name match wins over ID match)
- different name, same column ID, same attrs → RENAME
- present only in current version            → ADD
- present only in previous version           → DROP
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from .table_def import TableCol


class DiffAction(str, Enum):
    ADD = "ADD"
    DROP = "DROP"
    MODIFY = "MODIFY"
    RENAME = "RENAME"
    UNCHANGE = "UNCHANGE"


@dataclass
class ColumnDiff:
    action: DiffAction
    prev: TableCol | None
    curr: TableCol | None

    def __repr__(self) -> str:  # compact, test-friendly
        p = self.prev.name if self.prev else "-"
        c = self.curr.name if self.curr else "-"
        return f"ColumnDiff({self.action.value}, {p} -> {c})"


def _same_attrs(a: TableCol, b: TableCol) -> bool:
    return (
        a.tp == b.tp
        and a.precision == b.precision
        and a.scale == b.scale
        and a.nullable == b.nullable
    )


def diff_columns(prev: list[TableCol], curr: list[TableCol]) -> list[ColumnDiff]:
    """Diff two column lists; output order follows *curr*, drops last."""
    prev_by_name = {c.name: c for c in prev}
    prev_by_id = {c.id: c for c in prev}
    matched_prev: set[str] = set()  # prev column names consumed
    out: list[ColumnDiff] = []

    for col in curr:
        by_name = prev_by_name.get(col.name)
        if by_name is not None:
            matched_prev.add(by_name.name)
            if _same_attrs(by_name, col):
                out.append(ColumnDiff(DiffAction.UNCHANGE, by_name, col))
            else:
                out.append(ColumnDiff(DiffAction.MODIFY, by_name, col))
            continue
        by_id = prev_by_id.get(col.id)
        if by_id is not None and by_id.name not in matched_prev and _same_attrs(by_id, col):
            matched_prev.add(by_id.name)
            out.append(ColumnDiff(DiffAction.RENAME, by_id, col))
            continue
        out.append(ColumnDiff(DiffAction.ADD, None, col))

    for col in prev:
        if col.name not in matched_prev:
            out.append(ColumnDiff(DiffAction.DROP, col, None))
    return out
