"""TSO-consistent CROSS-TABLE snapshots.

The reference's core consistency construct is a single TSO shared by
the snapshot dump and the changefeed of every replicated table
(cmd/core.go:183-220: ``Run`` fetches one startTSO via
``tidbsql.GetCurrentTSO`` and hands the SAME value to the changefeed
create and the Dumpling dump).  Downstream, that
guarantee is what makes a multi-table warehouse query transactionally
meaningful: joining `orders` against `lineitem` is only correct if both
sides reflect the SAME source moment — otherwise an order committed at
ts 100 can appear without its lines (a torn read).

The reference itself stops at per-table replication and leaves
cross-table reads to the warehouse's own snapshot isolation.  This
module supplies that isolation for the managed-table layer:

- every :meth:`ManagedTable.merge` advances a ``source_ts_high`` fence
  (max commit_ts of the applied batch — computed inside the merge's
  existing batch-stats job, not a second scan) and snapshots it into
  the commit log;
- :class:`ConsistentSnapshot` pins, per table, the last commit whose
  fence is ≤ the requested TSO, and serves every read through the
  time-travel path (:meth:`ManagedTable.read_at`) — a METADATA-ONLY
  resolution (one commit-log scan per table, no data movement), after
  which reads keep all the scale machinery (bucket pruning, MoR delta
  resolution, schema conformance as of that commit).

Correctness model: the producer emits fence-aligned batches per table
on a COMMON TSO clock (the TiCDC guarantee — a changefeed's files for
ts ≤ F are complete before the checkpoint advances past F), and the
consumer applies them in order (O1-O3).  Then for any requested ts, each
table resolves to "all source changes ≤ its last complete fence ≤ ts" —
and because the clock is shared, a fence the producer completed on
EVERY table yields a transactionally consistent cross-table view.

At 100 TB: the snapshot is a dict of commit ordinals.  Pinning costs a
JSON scan per table; reading costs exactly what a current-state read
costs (the commit's bucket_versions map prunes identically).  Retention
is the only operational knob — vacuum(keep_last) bounds how far back a
fence can reach, and read_at fails loudly on vacuumed state.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from .managed import ManagedTable


class ConsistentSnapshot:
    """A multi-table read pinned to one source TSO fence.

    Resolution is EAGER: the constructor maps each table to its commit
    ordinal (raising if any table's initial load is already past the
    fence), so a snapshot object is an immutable, serializable pin —
    later merges on the live tables cannot move it.

    *views* extends the pin to DERIVED state: each entry maps a name to
    ``(view, source_table_name)`` — or, for a MULTI-SOURCE join/star
    view, ``(view, [fact_name, dim_name, …])`` — where *view*
    implements the derived seq protocol (``version_for_seq`` for one
    source, ``version_for_seqs`` for a (fact, dims…) vector; the
    maintained aggregates and sketches do with ``keep_versions > 1``).
    Each pinned table commit's recorded ``cdf_seq`` selects the view
    version whose fold covers EXACTLY the same source changes, so a
    table ⋈ view join inside the snapshot cannot tear (view ahead of
    or behind the pinned table commit — the gap a per-table fence
    alone leaves open).  Resolution raises when the view never
    materialized that checkpoint or retention has dropped it."""

    def __init__(
        self,
        tables: Mapping[str, ManagedTable],
        source_ts: int,
        views: Mapping[str, tuple[object, object]] | None = None,
    ):
        if source_ts < 0:
            raise ValueError(f"source_ts {source_ts} is negative")
        self.source_ts = int(source_ts)
        self.tables = dict(tables)
        self._commits = {
            name: t.commit_for_source_ts(self.source_ts)
            for name, t in self.tables.items()
        }
        self.views = dict(views or {})
        overlap = set(self.views) & set(self.tables)
        if overlap:
            raise ValueError(
                f"names {sorted(overlap)} are both tables and views"
            )
        self._view_paths: dict[str, object] = {}
        for name, (view, src) in self.views.items():
            src_names = [src] if isinstance(src, str) else list(src)
            seqs = []
            for src_name in src_names:
                if src_name not in self.tables:
                    raise KeyError(
                        f"view {name!r} declares source {src_name!r}, "
                        f"which is not in this snapshot (tables: "
                        f"{sorted(self.tables)})"
                    )
                entry = self.tables[src_name].history()[
                    self._commits[src_name]
                ]
                seq = entry.get("cdf_seq")
                if seq is None:
                    raise ValueError(
                        f"pinned commit of {src_name!r} records no "
                        "cdf_seq (no change feed, or history predating "
                        "the derived fence) — the snapshot cannot place "
                        f"derived state for view {name!r}"
                    )
                seqs.append(int(seq))
            if isinstance(src, str):
                ver = view.version_for_seq(seqs[0])
            else:
                ver = view.version_for_seqs(seqs[0], seqs[1:])
            self._view_paths[name] = view.root / f"v={ver}"

    def commits(self) -> dict[str, int]:
        """The per-table commit ordinals this snapshot pinned."""
        return dict(self._commits)

    def fences(self) -> dict[str, int]:
        """The per-table applied fence (source_ts_high at the pinned
        commit) — ≤ source_ts by construction; useful for observability
        (how far behind the requested TSO each table's last complete
        batch was)."""
        out = {}
        for name, t in self.tables.items():
            e = t.history()[self._commits[name]]
            out[name] = int(e.get("source_ts_high", 0) or 0)
        return out

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        """*name*'s state as of the pinned fence — a table (time-travel
        read) or a pinned derived view (retained-version read; fails
        loudly if retention dropped the pinned version AFTER
        construction — raise ``keep_versions`` to cover the window a
        pin must stay readable)."""
        if name in self._view_paths:
            p = self._view_paths[name]
            if not p.exists():
                raise ValueError(
                    f"view {name!r}'s pinned state ({p}) was GC'd after "
                    "the pin — raise keep_versions on the view to cover "
                    "the snapshot's lifetime"
                )
            return spark.read.parquet(str(p))
        if name not in self.tables:
            raise KeyError(
                f"{name!r} is not part of this snapshot "
                f"(tables: {sorted(self.tables)}, views: "
                f"{sorted(self.views)})"
            )
        return self.tables[name].read_at(spark, self._commits[name])

    def register_views(
        self, spark: SparkSession, prefix: str = "snap_"
    ) -> list[str]:
        """Register every table AND pinned derived view as a temp view
        ``{prefix}{name}`` so a whole SQL statement runs against the
        one fence; returns the view names."""
        out = []
        for name in (*self.tables, *self._view_paths):
            view = f"{prefix}{name}"
            self.read(spark, name).createOrReplaceTempView(view)
            out.append(view)
        return out
