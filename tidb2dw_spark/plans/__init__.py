"""Physical-plan inspection & scale-audit helpers.

The reference delegates physical execution to warehouse engines (SURVEY §4);
in this engine Catalyst owns it, so "is the plan right at 100 TB" is a
testable property of every operator.  This module turns ``explain`` output
into assertable facts:

- which filters reached the parquet scan (predicate pushdown)
- which columns the scan reads (pruning)
- how many exchanges the plan contains, and on which keys (shuffle audit)
- which join strategies were picked (broadcast vs sort-merge)
- how much of the plan runs inside WholeStageCodegen

``audit(df)`` packages these into a dict for dashboards/tests;
``assert_*`` helpers give sharp failure messages in pytest.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = [
    "formatted_plan",
    "PlanAudit",
    "audit",
    "assert_no_shuffle",
    "assert_single_shuffle",
    "assert_broadcast_join",
    "assert_pushed_filter",
    "assert_read_columns_only",
]


def formatted_plan(df: DataFrame) -> str:
    """``df.explain('formatted')`` captured as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@dataclass
class PlanAudit:
    plan: str
    exchanges: list[str] = field(default_factory=list)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    joins: list[str] = field(default_factory=list)
    codegen_ops: int = 0
    total_ops: int = 0

    @property
    def num_shuffles(self) -> int:
        return len(self.exchanges)

    @property
    def hash_shuffles(self) -> list[str]:
        """Exchanges that repartition by key (joins/aggs/windows) — the ones
        whose cost scales with data volume at a fixed key distribution.
        Round-robin spreads (compute load-balancing) are excluded."""
        return [e for e in self.exchanges if "hashpartitioning" in e]

    @property
    def codegen_fraction(self) -> float:
        return self.codegen_ops / self.total_ops if self.total_ops else 0.0


def audit(df: DataFrame) -> PlanAudit:
    """Parse the formatted plan into a :class:`PlanAudit`."""
    p = formatted_plan(df)
    a = PlanAudit(plan=p)
    # operator detail sections: headers like "(3) Exchange" / "(4) * Project"
    # at column 0, each followed by e.g. an "Arguments:" line
    lines = p.splitlines()
    for i, line in enumerate(lines):
        m = re.match(r"^\((\d+)\) (\* )?(\w[\w ]*\w)", line)
        if not m:
            continue
        a.total_ops += 1
        if m.group(2):
            a.codegen_ops += 1
        op = m.group(3)
        if op == "Exchange":
            args = next(
                (
                    ln.split(":", 1)[1].strip()
                    for ln in lines[i + 1 : i + 6]
                    if ln.startswith("Arguments:")
                ),
                "",
            )
            a.exchanges.append(f"Exchange {args}".strip())
        if "Join" in op:
            a.joins.append(op)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", p):
        if m.group(1).strip():
            a.pushed_filters.extend(s.strip() for s in m.group(1).split(","))
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        a.read_schemas.append(m.group(1))
    return a


def _fail(msg: str, plan: str) -> None:
    raise AssertionError(f"{msg}\n--- plan ---\n{plan}")


def assert_no_shuffle(df: DataFrame) -> PlanAudit:
    a = audit(df)
    if a.num_shuffles:
        _fail(f"expected shuffle-free plan, found {a.num_shuffles} Exchange(s)", a.plan)
    return a


def assert_single_shuffle(df: DataFrame, key_substring: str | None = None) -> PlanAudit:
    a = audit(df)
    if a.num_shuffles != 1:
        _fail(f"expected exactly 1 Exchange, found {a.num_shuffles}", a.plan)
    if key_substring and f"hashpartitioning({key_substring}" not in a.plan:
        _fail(f"expected shuffle on key {key_substring!r}", a.plan)
    return a


def assert_broadcast_join(df: DataFrame, forbid_sort_merge: bool = True) -> PlanAudit:
    a = audit(df)
    if not any(j.startswith("Broadcast") for j in a.joins):
        _fail(f"expected a broadcast join, joins = {a.joins}", a.plan)
    if forbid_sort_merge and any(j == "SortMergeJoin" for j in a.joins):
        _fail("SortMergeJoin present where broadcast was expected", a.plan)
    return a


def assert_pushed_filter(df: DataFrame, filter_substring: str) -> PlanAudit:
    a = audit(df)
    if not any(filter_substring in f for f in a.pushed_filters):
        _fail(
            f"filter {filter_substring!r} not pushed to scan "
            f"(pushed: {a.pushed_filters})",
            a.plan,
        )
    return a


def assert_read_columns_only(
    df: DataFrame, required: list[str], forbidden: list[str]
) -> PlanAudit:
    """Column pruning: scans read *required* columns and none of *forbidden*."""
    a = audit(df)
    schemas = " ".join(a.read_schemas)
    for c in required:
        if c not in schemas:
            _fail(f"column {c!r} missing from ReadSchema", a.plan)
    for c in forbidden:
        if c in schemas:
            _fail(f"column {c!r} read but not needed (pruning failed)", a.plan)
    return a
