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

from ..table.managed import CHANGE_TYPE_COL, ManagedTable

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


class MaintainedAggregate:
    """A persisted, restartable materialized aggregate over a CDF-enabled
    :class:`ManagedTable` — the "keep the BI rollup fresh" loop as a
    first-class object.

    Layout mirrors the managed table's crash contract in miniature::

        <root>/_meta.json   {"applied_seq": S, "version": N}  (os.replace)
        <root>/v=N/…        the aggregate as of change seq S

    ``refresh()`` seeds from the base table on first call (recording the
    source's current ``cdf_seq`` so already-folded changes are never
    double-applied), then folds exactly the feed slice
    ``(applied_seq, cdf_seq]`` and commits the new version atomically
    with the advanced checkpoint — a crash between data write and meta
    swap leaves an orphan version directory that the deterministic
    version numbering overwrites on retry.  Exactly-once across restarts
    falls out: state lives in ``_meta.json``, not the object.

    Scale: every refresh is O(new changes + groups); the base table is
    scanned once, ever (the seed).  The aggregate itself is groups-sized
    — rewriting it per refresh is the cheap side of the trade."""

    def __init__(self, root, group_cols: Sequence[str], sum_cols: dict[str, str]):
        from pathlib import Path

        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)

    def _meta_path(self):
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        import json

        return json.loads(self._meta_path().read_text())

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(str(self.root / f"v={self.meta()['version']}"))

    def _commit(
        self, agg: DataFrame, version: int, applied_seq: int,
        field_ids: dict | None = None,
    ) -> None:
        import json
        import os
        import tempfile

        agg.write.mode("overwrite").parquet(str(self.root / f"v={version}"))
        self.root.mkdir(parents=True, exist_ok=True)
        meta = {"applied_seq": applied_seq, "version": version}
        if field_ids:
            meta["field_ids"] = field_ids
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def _source_cols(self) -> list[str]:
        """Base-table columns this aggregate consumes, deduped in order."""
        return list(dict.fromkeys(self.group_cols + list(self.sum_cols.values())))

    def _feed_projection(self, ch: DataFrame, m: dict, src_m: dict) -> DataFrame:
        """Project a change slice to exactly the columns the fold reads,
        translated by FIELD ID from the source's current names back to
        the names this aggregate was seeded with — so a base-table RENAME
        barrier mid-feed neither breaks the fold nor mutates the
        aggregate's own output schema (pinned at seed time)."""
        stored = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        cols = [F.col(CHANGE_TYPE_COL)]
        for n in self._source_cols():
            cur = inv.get(stored.get(n), n) if stored else n
            cols.append(F.col(cur).alias(n) if cur != n else F.col(n))
        return ch.select(*cols)

    def refresh(self, spark, source: ManagedTable) -> int:
        """Fold any new change commits into the aggregate; returns the
        applied change seq (the checkpoint).  No-op when the feed has
        nothing new."""
        import shutil

        # ONE manifest read pins both the seed's data and its cdf_seq: a
        # merge landing between "read seq" and "read table" would bake its
        # effects into the seed yet replay through the feed on the next
        # refresh — and ± delta folding, unlike the table's merge, is not
        # idempotent under double-application
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        if not self.exists():
            seed = init_agg(
                source._read_state(spark, src_m), self.group_cols, self.sum_cols
            )
            # pin the consumed columns' field ids: a later base RENAME is
            # then translated back at refresh instead of breaking the fold
            src_ids = src_m.get("field_ids", {})
            self._commit(
                seed, 1, src_seq,
                field_ids={
                    n: src_ids[n] for n in self._source_cols() if n in src_ids
                },
            )
            return src_seq
        m = self.meta()
        since = m["applied_seq"]
        if src_seq <= since:
            return since
        # (src_seq from the same pinned manifest bounds the slice, so a
        # concurrent merge is simply picked up by the NEXT refresh)
        updated = apply_changes_to_agg(
            self.read(spark),
            self._feed_projection(
                source.changes(spark, since=since, until=src_seq), m, src_m
            ),
            self.group_cols,
            self.sum_cols,
        )
        new_version = m["version"] + 1
        self._commit(updated, new_version, src_seq, field_ids=m.get("field_ids"))
        for p in self.root.glob("v=*"):  # committed: old versions removable
            if int(p.name.split("=", 1)[1]) < new_version:
                shutil.rmtree(p, ignore_errors=True)
        return src_seq
