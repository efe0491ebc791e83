"""Z-order (Morton) multi-column clustering for zone-map file skipping.

``ManagedTable.cluster_by`` sorts on a column list, which makes zone maps
selective on the FIRST column only: files cover narrow ranges of the sort
leader, but each file still spans the whole domain of every other column.
Z-ordering interleaves the bits of per-column quantile cells so that files
cover small HYPER-RECTANGLES of the value space — min/max pruning then
skips files for a range predicate on ANY of the clustered columns (the
Delta OPTIMIZE ZORDER BY design).

Mechanics (all JVM-side expressions — no UDFs on the data path):

1. Per column, ``approxQuantile`` collects ``2^bits - 1`` boundary values
   (driver-side, metadata-sized — the same trust level as AQE's runtime
   statistics).  Quantile cells, not linear min/max scaling, so skewed
   columns still spread across all cells.
2. Each row's cell per column = #boundaries < value, computed as one
   ``F.aggregate`` fold over the boundary-array literal.
3. The z-value interleaves the cell bits round-robin
   (col0 owns the most-significant bit of each group), via shift/AND/OR
   expressions.
4. The caller range-partitions + sorts on the z-value, so each output file
   covers one contiguous z-range = one small hyper-rectangle.

Non-numeric columns are supported through numeric proxies: timestamps and
dates quantize on their epoch value.  Strings are rejected — their
lexicographic order is not what approxQuantile computes, and a wrong proxy
would silently produce useless (though never incorrect) clustering.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _numeric_proxy(df: DataFrame, col: str) -> Column:
    dtype = dict(df.dtypes)[col]
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(col).cast("timestamp")).cast("double")
    if dtype == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if dtype in ("string", "binary", "boolean"):
        raise ValueError(
            f"z-order column {col!r} has non-rangeable type {dtype}; "
            "cluster on numeric/timestamp/date columns"
        )
    return F.col(col).cast("double")


def quantile_boundaries(
    df: DataFrame, cols: Sequence[str], bits: int = 8, rel_err: float = 0.001
) -> dict[str, list[float]]:
    """``2^bits - 1`` approximate quantile boundaries per column — ONE
    distributed pass (Greenwald-Khanna sketches merge tree-wise), one
    metadata-sized driver collect."""
    n_cells = 1 << bits
    probs = [i / n_cells for i in range(1, n_cells)]
    proxies = df.select(
        *[_numeric_proxy(df, c).alias(f"__zq_{i}") for i, c in enumerate(cols)]
    )
    qs = proxies.stat.approxQuantile(
        [f"__zq_{i}" for i in range(len(cols))], probs, rel_err
    )
    return {c: qs[i] for i, c in enumerate(cols)}


def _cell(proxy: Column, boundaries: list[float]) -> Column:
    """Cell index = #boundaries ≤ value (a value equal to a boundary lands
    in the upper cell; NULL → cell 0): one fold over the boundary-array
    literal, JVM-side."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    v = F.coalesce(proxy, F.lit(float("-inf")))
    return F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
    )


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    boundaries: dict[str, list[float]],
    bits: int = 8,
) -> Column:
    """The Morton interleave of the columns' quantile cells as one BIGINT
    expression.  Bit layout (most significant first): cell bit ``bits-1``
    of col0, of col1, …, then bit ``bits-2`` of col0, … — so a prefix of
    the z-value constrains every column roughly equally."""
    cells = [_cell(_numeric_proxy(df, c), boundaries[c]) for c in cols]
    n = len(cols)
    terms: list[Column] = []
    for i in range(bits):  # i = source bit index
        for j, cell in enumerate(cells):
            out_pos = (bits - 1 - i) * n + (n - 1 - j)
            bit = F.shiftright(cell, bits - 1 - i).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, out_pos))
    return reduce(lambda a, b: a + b, terms).alias("__zvalue")
