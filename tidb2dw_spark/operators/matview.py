"""Incremental aggregate maintenance (materialized-view style) over the
managed table's change data feed.

The reference replicates a TiDB table into a warehouse so downstream BI
can aggregate it; the natural next step at 100 TB is keeping those
aggregates FRESH without re-scanning the replica on every CDC batch.
``SUM`` / ``COUNT`` (and anything derived from them, e.g. AVG) are
self-maintainable from row-level changes alone:

    insert            →  +value, +1
    delete            →  -value, -1
    update_preimage   →  -old_value, -1
    update_postimage  →  +new_value, +1

so one pass over the O(changes) feed produces per-group deltas, and one
group-keyed combine folds them into the existing aggregate.  An update
that MOVES a row between groups needs no special casing: its preimage
subtracts from the old group, its postimage adds to the new one.

Scale shape: the fold is expressed as ``union → groupBy`` (not a join),
so NULL group keys collapse correctly without null-safe join predicates,
partial aggregation combines map-side, and the only shuffle is on the
group key — O(changes + groups), never O(table).  Groups whose
maintained count reaches zero are dropped (they no longer exist in the
base table).

Exactness: maintain integer measures (counts, cent-quantized sums).
Float sums would drift from a recompute by accumulation-order effects;
integers make incremental == full recompute bit-for-bit, which is what
the driver row (entry_pipeline.pipeline_incremental_agg) proves against
a DuckDB full-recompute oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table.managed import CHANGE_TYPE_COL

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def init_agg(
    df: DataFrame, group_cols: Sequence[str], sum_cols: dict[str, str]
) -> DataFrame:
    """Seed the maintained aggregate from a base-table snapshot:
    (group_cols…, n_rows, <out>=SUM(<src>)…).  *sum_cols* maps output
    column name → source column (pre-quantize floats to integers in *df*
    before calling — see module docstring).  Sums are NULL-as-zero
    (``COALESCE(SUM(x), 0)``): a sum maintained by ±deltas has no way to
    express "every remaining value is NULL", so the seed pins the same
    convention and incremental stays bit-equal to a recompute."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.col(src)), F.lit(0)).alias(out)
        for out, src in sum_cols.items()
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def apply_changes_to_agg(
    agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Fold a change-feed slice into a maintained aggregate, returning the
    updated aggregate (same schema as :func:`init_agg`).

    *changes* is :meth:`ManagedTable.changes` output (any contiguous
    slice, each commit applied at most once — the caller checkpoints the
    last applied ``_commit_seq`` exactly like the file consumer
    checkpoints markers).  The union-then-groupBy shape keeps the plan to
    one shuffle on the group key and handles NULL groups natively."""
    group_cols = list(group_cols)
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    deltas = changes.select(
        *group_cols,
        sign.alias("n_rows"),
        *[
            (sign * F.coalesce(F.col(src), F.lit(0))).alias(out)
            for out, src in sum_cols.items()
        ],
    )
    combined = (
        agg.select(*group_cols, "n_rows", *sum_cols)
        .unionByName(deltas)
        .groupBy(*group_cols)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(out).alias(out) for out in sum_cols],
        )
    )
    return combined.filter(F.col("n_rows") > 0)
