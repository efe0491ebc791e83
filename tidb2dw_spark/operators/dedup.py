"""W1 — per-PK last-writer-wins dedup, the load-bearing query of the system.

Collapses a changelog micro-batch to the final row image per key before
merging, exactly as every reference dialect does with
``row_number() OVER (PARTITION BY pk ORDER BY commit_ts DESC) = 1``
(pkg/snowsql/sql.go:151-158 QUALIFY; redshiftsql/sql.go:171-189;
bigquerysql/sql.go:38-48; databrickssql/sql.go:41-51).

Scale notes: this is one hash-partition shuffle on the PK — unavoidable and
cheap relative to the merge join that follows, and Spark reuses the same
hash partitioning for the subsequent join on the same keys (Exchange reuse),
so dedup + merge costs a single shuffle of the (small) batch side.
``row_number`` (not ``rank``) guarantees exactly one survivor per key; ties
on ``commit_ts`` are broken by the flag ordering D < I < U so a delete never
spuriously survives a same-ts upsert.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.envelope import COMMIT_TS_COL, FILE_SEQ_COL, FLAG_COL


def last_writer_wins(
    batch: DataFrame,
    pk_cols: Sequence[str],
    ts_col: str = COMMIT_TS_COL,
    flag_col: str = FLAG_COL,
) -> DataFrame:
    """Keep only the newest event per primary key."""
    order = [F.desc(ts_col)]
    if FILE_SEQ_COL in batch.columns:
        # multi-file batch: on a commit_ts tie the later file wins, matching
        # the reference's serial file-application order
        order.append(F.desc(FILE_SEQ_COL))
    order.append(F.desc(flag_col))
    w = Window.partitionBy(*pk_cols).orderBy(*order)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
