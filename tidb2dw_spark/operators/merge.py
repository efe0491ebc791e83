"""Changelog merge (J1/J2/J3 + P5/P6) — apply an I/U/D batch to a target.

The reference compiles this to warehouse MERGE statements
(pkg/snowsql/sql.go:115-177, bigquerysql/sql.go:10-56,
databrickssql/sql.go:14-58) or, where MERGE is unavailable, a two-phase
delete-then-insert (redshiftsql/sql.go:130-196).  Without Delta in this
environment the Spark-native equivalent is the Redshift shape, expressed
as one declarative plan (SURVEY §2.7):

    result = target ANTI-JOIN batch_keys  UNION ALL  batch survivors (flag != 'D')

which Catalyst executes as a single shuffle-or-broadcast join: the batch
side is first collapsed to one row per PK (W1), so for a typical micro-batch
(≤64 MiB CDC files) it broadcasts and the 100 TB target is never shuffled —
each target partition is scanned once, filtered against the broadcast key
set, and the (tiny) upsert side is unioned on.  At cluster scale the managed
table keeps the target bucketed by PK so repeated merges also skip the
target-side exchange when the batch is too large to broadcast.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.envelope import ENVELOPE_COLUMNS, FLAG_COL
from .dedup import last_writer_wins


def merge_changelog(
    target: DataFrame,
    batch: DataFrame,
    pk_cols: Sequence[str],
    broadcast_batch: bool = True,
) -> DataFrame:
    """Merge an already-deduped envelope batch into *target*.

    *batch* must have ≤1 row per PK (use :func:`apply_changelog` for raw
    batches).  Delete rows (flag='D') remove the key; I/U rows replace or
    insert the full row image — last-writer-wins semantics identical to the
    reference's MERGE arms (WHEN MATCHED AND flag='D' DELETE /
    WHEN MATCHED UPDATE ALL / WHEN NOT MATCHED AND flag!='D' INSERT).

    *broadcast_batch* gates the key-set broadcast hint.  A typical
    micro-batch (≤64 MiB of CDC files) broadcasts so the target is never
    shuffled; but the grouped consumer can make ONE batch as large as the
    whole backlog, and force-broadcasting an unbounded key set is an OOM
    at 100 TB catch-up.  Callers that know the batch size (the consumer
    sums its group's file bytes) pass False past the threshold, leaving
    the join strategy to Catalyst/AQE, which degrades to a shuffle join
    when the key set is genuinely large.
    """
    pk_cols = list(pk_cols)
    keys = batch.select(*pk_cols)  # P6: delete phase needs only PK columns
    if broadcast_batch:
        keys = F.broadcast(keys)
    survivors = target.join(keys, on=pk_cols, how="left_anti")  # J2
    upserts = batch.filter(F.col(FLAG_COL) != "D").drop(*ENVELOPE_COLUMNS)  # P5
    return survivors.unionByName(upserts.select(*target.columns))


def apply_changelog(
    target: DataFrame,
    changelog: DataFrame,
    pk_cols: Sequence[str],
    broadcast_batch: bool = True,
) -> DataFrame:
    """W1 dedup + merge: the full per-micro-batch query of the reference.

    See :func:`merge_changelog` for the *broadcast_batch* contract."""
    final = last_writer_wins(changelog, pk_cols)
    return merge_changelog(target, final, pk_cols, broadcast_batch=broadcast_batch)
