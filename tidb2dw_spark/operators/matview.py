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

import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..table.managed import CHANGE_TYPE_COL, ManagedTable

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


def init_agg(
    df: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Seed the maintained aggregate from a base-table snapshot:
    (group_cols…, n_rows, <out>=SUM(<src>)…[, <out>=MIN/MAX(<src>)…]).
    *sum_cols* maps output column name → source column (pre-quantize
    floats to integers in *df* before calling — see module docstring).
    Sums are NULL-as-zero (``COALESCE(SUM(x), 0)``): a sum maintained by
    ±deltas has no way to express "every remaining value is NULL", so the
    seed pins the same convention and incremental stays bit-equal to a
    recompute.  MIN/MAX stay NULL-able (SQL semantics: NULL iff every
    value in the group is NULL) — they are exact order selections, so any
    orderable type works without quantization."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.expr(src)), F.lit(0)).alias(out)
        for out, src in sum_cols.items()
    ]
    for out, src in (min_cols or {}).items():
        aggs.append(F.min(F.expr(src)).alias(out))
    for out, src in (max_cols or {}).items():
        aggs.append(F.max(F.expr(src)).alias(out))
    return df.groupBy(*group_cols).agg(*aggs)


# past this many dirty/changed group keys, literal predicates are replaced
# by a broadcast semi-join (shared by the single-table and join-view
# maintainers so the trade-off can't drift between them)
DIRTY_LITERAL_CAP = 5000


def typed_in_lits(values, dtype: str | None = None) -> list:
    """Collected values as ``isin`` arguments, DST-safe for temporals.

    Classic PySpark's collect converts TIMESTAMP via the OS-LOCAL
    ``datetime.fromtimestamp`` and ``F.lit(datetime)`` converts back via
    ``time.mktime`` — a round-trip that is LOSSY in DST fold/gap hours on
    any non-UTC driver, so a literal rebuilt from a collected timestamp
    can silently miss the stored row.  The fix is the same contract
    SecondaryIndex._member_lit pins: normalize the collected local wall
    time to UTC wall time, then route the literal through an ISO-STRING
    cast, which parses in the SESSION zone (pinned UTC).  Non-temporal
    values pass through unchanged; the cast literals are constant-folded,
    so the IN predicate still reaches the parquet scan.  *dtype* is the
    column's Spark type name when the caller knows it (``timestamp_ntz``
    collects zone-free and must NOT be shifted).

    Deduplication happens HERE, after normalization: Python datetime
    equality ignores PEP-495 ``fold``, so a pre-normalization ``set()``
    would collapse the fold hour's two distinct UTC instants into one
    and silently drop a literal."""
    import datetime as _dt

    out, seen = [], set()
    for v in values:
        if isinstance(v, _dt.datetime):
            if dtype != "timestamp_ntz":
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            key = ("__ts", v.isoformat(sep=" "))
            lit = F.lit(key[1]).cast(dtype or "timestamp")
        elif isinstance(v, _dt.date):
            key = ("__dt", v.isoformat())
            lit = F.lit(key[1]).cast(dtype or "date")
        else:
            key, lit = v, v
        if key not in seen:
            seen.add(key)
            out.append(lit)
    return out


def literal_group_box(rows, cols: Sequence[str], dtypes: dict | None = None):
    """Per-column literal IN predicate over collected group-key *rows* —
    NULL-aware, a SUPERSET box of the exact tuple set (safe wherever the
    consumer recomputes whole groups).  Literals reach the parquet scan,
    so row-group pruning engages where a runtime broadcast build side
    cannot.  None when *cols* is empty.  *dtypes* (column → Spark type
    name) lets temporal members take the DST-safe ISO-cast path of
    :func:`typed_in_lits`."""
    if not cols:
        return None
    pred = None
    for c in cols:
        # NO set() here: typed_in_lits dedups AFTER normalization (a raw
        # set would merge DST-fold twins, whose datetime __eq__ ignores
        # fold, and drop one group's literal)
        vals = [r[c] for r in rows]
        has_null = any(v is None for v in vals)
        non_null = typed_in_lits(
            [v for v in vals if v is not None],
            (dtypes or {}).get(c),
        )
        p = F.col(c).isin(non_null) if non_null else F.lit(False)
        if has_null:
            p = p | F.col(c).isNull()
        pred = p if pred is None else (pred & p)
    return pred


def nullsafe_group_eq(left: str, right: str, cols: Sequence[str]):
    """Null-safe equality of *cols* between two aliased frames."""
    cond = None
    for c in cols:
        eq = F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
        cond = eq if cond is None else (cond & eq)
    return cond


def apply_changes_to_agg(
    agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
    base: DataFrame | None = None,
) -> DataFrame:
    """Fold a change-feed slice into a maintained aggregate, returning the
    updated aggregate (same schema as :func:`init_agg`).

    *changes* is :meth:`ManagedTable.changes` output (any contiguous
    slice, each commit applied at most once — the caller checkpoints the
    last applied ``_commit_seq`` exactly like the file consumer
    checkpoints markers).  The union-then-groupBy shape keeps the plan to
    one shuffle on the group key and handles NULL groups natively.

    MIN/MAX are not self-maintainable: an insert only tightens them
    (``least``/``greatest`` with the add-side extremum, folded in the
    same single shuffle), but a delete/preimage that removes a group's
    CURRENT extremum leaves the new extremum unknown.  Those groups are
    marked DIRTY in the fold (a removed value ≤ stored min / ≥ stored
    max) and re-derived from *base* — required iff min/max are maintained
    — restricted to the dirty groups by LITERAL per-column IN predicates
    (the dirty key set is collected driver-side, batch-bounded), so the
    predicate genuinely reaches the parquet scan and row-group min/max /
    cluster pruning engages on tables laid out by the group column; past
    a cap the fallback is a broadcast semi-join (full scan, filtered to
    dirty groups), and an empty dirty set skips base IO entirely.
    At 100 TB the dirty set of a CDC batch is batch-bounded, and the
    common case (no extremum removed) stays the pure O(changes+groups)
    single-shuffle fold with an empty rescan."""
    group_cols = list(group_cols)
    min_cols = dict(min_cols or {})
    max_cols = dict(max_cols or {})
    mm_outs = list(min_cols) + list(max_cols)
    if mm_outs and base is None:
        raise ValueError("min/max maintenance requires the base table DataFrame")
    sign = (
        F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
        .when(F.col(CHANGE_TYPE_COL).isin(*_SUB), F.lit(-1))
        .otherwise(F.lit(0))
    )
    is_add = F.col(CHANGE_TYPE_COL).isin(*_ADD)
    deltas = changes.select(
        *group_cols,
        sign.alias("n_rows"),
        *[
            (sign * F.coalesce(F.expr(src), F.lit(0))).alias(out)
            for out, src in sum_cols.items()
        ],
        # add-side extrema ride the same union rows: NULL on remove rows,
        # so min/max aggregation ignores them
        *[
            F.when(is_add, F.expr(src)).alias(f"__add_{out}")
            for out, src in {**min_cols, **max_cols}.items()
        ],
    )
    stored = agg.select(
        *group_cols,
        "n_rows",
        *sum_cols,
        *[F.col(out).alias(f"__cur_{out}") for out in mm_outs],
        *[F.lit(None).cast(deltas.schema[f"__add_{out}"].dataType).alias(f"__add_{out}") for out in mm_outs],
    )
    deltas = deltas.select(
        *group_cols,
        "n_rows",
        *sum_cols,
        *[F.lit(None).cast(deltas.schema[f"__add_{out}"].dataType).alias(f"__cur_{out}") for out in mm_outs],
        *[F.col(f"__add_{out}") for out in mm_outs],
    )
    folded = (
        stored.unionByName(deltas)
        .groupBy(*group_cols)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            *[F.sum(out).alias(out) for out in sum_cols],
            *[F.min(f"__cur_{out}").alias(f"__cur_{out}") for out in mm_outs],
            *[
                (F.min if out in min_cols else F.max)(f"__add_{out}").alias(
                    f"__add_{out}"
                )
                for out in mm_outs
            ],
        )
        .filter(F.col("n_rows") > 0)
    )
    if not mm_outs:
        return folded

    def _nullsafe_eq(left_alias: str, right_alias: str):
        return nullsafe_group_eq(left_alias, right_alias, group_cols)

    # DIRTY groups derive from stored-state + remove-side extrema alone —
    # never from the fold — so the (expensive) folded union aggregate is
    # referenced exactly once in the final plan.  A group is dirty when a
    # removal touched its current extremum, OR when it has removals but
    # no pre-slice state at all (a group born inside the slice: the
    # removed value can only have hit an intra-slice add, and the add-side
    # extremum alone cannot tell which one survived).
    rem_agg = (
        changes.filter(~is_add)
        .groupBy(*group_cols)
        .agg(
            *[
                (F.min if out in min_cols else F.max)(F.expr(src)).alias(
                    f"__rem_{out}"
                )
                for out, src in {**min_cols, **max_cols}.items()
            ]
        )
    )
    stored_mm = agg.select(
        *group_cols, *[F.col(out).alias(f"__cur_{out}") for out in mm_outs]
    )
    rj = rem_agg.alias("__rm").join(
        stored_mm.alias("__st"), _nullsafe_eq("__rm", "__st"), "left"
    )

    def dirty(out: str) -> F.Column:
        cur, rem = F.col(f"__st.__cur_{out}"), F.col(f"__rm.__rem_{out}")
        cmp = rem <= cur if out in min_cols else rem >= cur
        return rem.isNotNull() & (cur.isNull() | cmp)

    any_dirty = None
    for out in mm_outs:
        any_dirty = dirty(out) if any_dirty is None else (any_dirty | dirty(out))
    dirty_keys = rj.filter(any_dirty).select(
        *[F.col(f"__rm.{c}").alias(c) for c in group_cols]
    )
    # Materialize the dirty keys driver-side (batch-bounded: at most the
    # groups touched by removals in this slice) and inject them as LITERAL
    # per-column IN predicates on the base scan — a runtime broadcast
    # semi-join build side never reaches the parquet reader, so the old
    # join-only shape scanned the FULL base table and filtered post-scan.
    # With literals, row-group min/max pruning engages on tables laid out
    # by the group column, and the empty-dirty-set case (the common one:
    # no extremum removed) skips base IO entirely without relying on AQE
    # empty-relation propagation.  The per-column IN box may rescan a few
    # extra groups under composite keys; *base* is the CURRENT table
    # state, so a base-recomputed extremum is exact for any group and the
    # override stays correct.  Past the cap, fall back to the broadcast
    # semi-join (full scan, filtered to dirty groups).
    # Over the cap, the limit-collect's work is re-done by the semi-join
    # branch — accepted: LocalLimit stops the collect early, both jobs
    # are bounded by the CHANGES batch (rem_agg ⋈ groups), and the
    # over-cap case (>5000 dirty groups in one slice) is the rare one.
    dirty_rows = dirty_keys.limit(DIRTY_LITERAL_CAP + 1).collect()
    if not dirty_rows:
        out_cols = [F.col(c) for c in group_cols]
        out_cols.append(F.col("n_rows"))
        out_cols += [F.col(out) for out in sum_cols]
        for out in mm_outs:
            tighten = F.least if out in min_cols else F.greatest
            out_cols.append(
                tighten(F.col(f"__cur_{out}"), F.col(f"__add_{out}")).alias(out)
            )
        return folded.select(*out_cols)
    if len(dirty_rows) <= DIRTY_LITERAL_CAP:
        pred = literal_group_box(dirty_rows, group_cols, dict(base.dtypes))
        scan = base.filter(pred) if pred is not None else base
    else:
        scan = base.alias("__b").join(
            F.broadcast(dirty_keys.alias("__d")),
            _nullsafe_eq("__b", "__d"),
            "left_semi",
        )
    rescan = (
        scan.groupBy(*group_cols)
        .agg(
            *[F.min(F.expr(src)).alias(f"__rs_{out}") for out, src in min_cols.items()],
            *[F.max(F.expr(src)).alias(f"__rs_{out}") for out, src in max_cols.items()],
        )
        .withColumn("__dirty", F.lit(True))
    )
    joined = folded.alias("__f").join(
        rescan.alias("__r"), _nullsafe_eq("__f", "__r"), "left"
    )
    out_cols = [F.col(f"__f.{c}").alias(c) for c in group_cols]
    out_cols.append(F.col("__f.n_rows").alias("n_rows"))
    out_cols += [F.col(f"__f.{out}").alias(out) for out in sum_cols]
    for out in mm_outs:
        tighten = F.least if out in min_cols else F.greatest
        candidate = tighten(F.col(f"__f.__cur_{out}"), F.col(f"__f.__add_{out}"))
        out_cols.append(
            F.when(F.col("__r.__dirty").isNotNull(), F.col(f"__r.__rs_{out}"))
            .otherwise(candidate)
            .alias(out)
        )
    return joined.select(*out_cols)


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

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        sum_cols: dict[str, str],
        min_cols: dict[str, str] | None = None,
        max_cols: dict[str, str] | None = None,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        measure_cols: Sequence[str] | None = None,
        derived_cols: dict[str, tuple[str, Sequence[str]]] | None = None,
        keep_versions: int = 1,
    ):
        from pathlib import Path

        # >1 retains that many recent state versions (plus the meta's
        # seq_versions map from applied_seq → version), so
        # ConsistentSnapshot can serve THIS view at a pinned source
        # commit via read_at_seq; 1 (default) keeps today's
        # newest-only GC
        self.keep_versions = max(1, int(keep_versions))
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.sum_cols = dict(sum_cols)
        self.min_cols = dict(min_cols or {})
        self.max_cols = dict(max_cols or {})
        # measure sources may be row-local SQL EXPRESSIONS over the base
        # row (sum of squares, conditional counts, …) — same contract as
        # the join view's round-8 algebra: a row-local expression
        # commutes with ± folding exactly as a raw column does.  Bare
        # names keep resolving as columns; expression dependencies not
        # already consumed ride *measure_cols*.  *derived_cols* maps
        # name → (expr, [deps]): synthesized at every base
        # materialization (seed, feed slices, dirty-group rescans), so a
        # derived name is usable as a GROUP key (date_trunc month grain —
        # the windowed-rollup shape) or measure source, and the rollup
        # never stores the dependency columns.
        self.measure_cols = list(measure_cols or [])
        self.derived = {
            n: (expr, list(deps))
            for n, (expr, deps) in (derived_cols or {}).items()
        }
        # *where* is a row-local SQL predicate over base columns: the view
        # is the aggregate of σ_where(base).  Row-locality makes σ commute
        # with Δ — a change row (pre- or post-image) contributes iff it
        # satisfies the predicate, so update rows crossing the boundary
        # fold as a one-sided remove or add with no special casing.
        # *where_cols* names any predicate inputs not already consumed by
        # group/measure columns (they must ride the feed projection).
        self.where = where
        self.where_cols = list(where_cols or [])
        if self.where_cols and not where:
            raise ValueError("where_cols given without a where predicate")

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
        field_ids: dict | None = None, where: str | None = None,
        mm_outs: list[str] | None = None, derived: dict | None = None,
        extra: dict | None = None,
    ) -> None:
        import json
        import os
        import tempfile

        agg.write.mode("overwrite").parquet(str(self.root / f"v={version}"))
        self.root.mkdir(parents=True, exist_ok=True)
        # custom keys owners piggyback on this meta (e.g. the quantile
        # histogram's adaptive bin width) survive every fold commit
        known = {"applied_seq", "version", "field_ids", "where",
                 "mm_outs", "derived"}
        meta = (
            {k: v for k, v in self.meta().items() if k not in known}
            if self.exists()
            else {}
        )
        meta.update({"applied_seq": applied_seq, "version": version})
        # applied_seq → version map for the RETAINED versions: the hook
        # ConsistentSnapshot uses to read this view as of a pinned
        # source commit.  A re-commit at the same seq (e.g. the
        # histogram's rebin) points the seq at its newest version.
        sv = {
            str(k): int(v) for k, v in (meta.get("seq_versions") or {}).items()
        }
        sv[str(int(applied_seq))] = int(version)
        keep = sorted(set(sv.values()), reverse=True)[: self.keep_versions]
        meta["seq_versions"] = {
            s: v for s, v in sv.items() if v in set(keep)
        }
        if field_ids:
            meta["field_ids"] = field_ids
        if where is not None:
            meta["where"] = where
        if mm_outs is not None:
            meta["mm_outs"] = mm_outs
        if derived is not None:
            meta["derived"] = derived
        if extra:
            meta.update(extra)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())
        # retained-aware GC at EVERY commit site (refresh, the quantile
        # histogram's multi-step widening, …) — without it a commit path
        # that bypasses refresh() leaves superseded v=N dirs on disk
        # until the next refresh happens to run
        retained = {int(v) for v in meta["seq_versions"].values()}
        for p in self.root.glob("v=*"):
            v = int(p.name.split("=", 1)[1])
            if v < version and v not in retained:
                shutil.rmtree(p, ignore_errors=True)

    def _rewrite_meta(self, m: dict) -> None:
        """Atomically rewrite ``_meta.json`` WITHOUT a data commit — used
        for metadata-only upgrades (e.g. backfilling ``mm_outs`` on a
        legacy meta) that must land even when the feed is idle."""
        import json
        import os
        import tempfile

        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._meta_path())

    def _source_cols(self) -> list[str]:
        """PHYSICAL base-table columns this aggregate consumes, deduped
        in order: derived names are excluded (synthesized after the
        projection), expression measure sources contribute their
        declared *measure_cols* instead of themselves."""
        import re as _re

        ident = _re.compile(r"[A-Za-z_][A-Za-z0-9_]*\Z")
        meas = [
            s
            for s in (
                list(self.sum_cols.values())
                + list(self.min_cols.values())
                + list(self.max_cols.values())
            )
            if ident.match(s)
        ]
        return [
            c
            for c in dict.fromkeys(
                self.group_cols
                + meas
                + self.measure_cols
                + [d for _, deps in self.derived.values() for d in deps]
                + self.where_cols
            )
            if c not in self.derived
        ]

    def _with_derived(self, df: DataFrame) -> DataFrame:
        """Synthesize the derived columns (definition order — later ones
        may reference earlier ones)."""
        for n, (expr, _) in self.derived.items():
            df = df.withColumn(n, F.expr(expr))
        return df

    def _translated_cols(self, m: dict, src_m: dict) -> list:
        """Consumed columns as expressions translating the source's
        CURRENT names back (by field id) to the names this aggregate was
        seeded with — so a base-table RENAME barrier mid-feed neither
        breaks the fold nor mutates the aggregate's own output schema
        (pinned at seed time)."""
        stored = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        cols = []
        for n in self._source_cols():
            cur = inv.get(stored.get(n), n) if stored else n
            cols.append(F.col(cur).alias(n) if cur != n else F.col(n))
        return cols

    def _feed_projection(self, ch: DataFrame, m: dict, src_m: dict) -> DataFrame:
        """Change slice under seed names (+ the change-type column),
        derived columns synthesized."""
        return self._with_derived(
            ch.select(F.col(CHANGE_TYPE_COL), *self._translated_cols(m, src_m))
        )

    def _feed_base_projection(self, df: DataFrame, m: dict, src_m: dict) -> DataFrame:
        """Base-table twin of :meth:`_feed_projection` (no change-type
        column): the dirty-group min/max rescan reads the base under the
        aggregate's seed names (derived columns synthesized)."""
        return self._with_derived(df.select(*self._translated_cols(m, src_m)))

    def refresh(self, spark, source: ManagedTable) -> int:
        """Fold any new change commits into the aggregate; returns the
        applied change seq (the checkpoint).  No-op when the feed has
        nothing new."""
        # ONE manifest read pins both the seed's data and its cdf_seq: a
        # merge landing between "read seq" and "read table" would bake its
        # effects into the seed yet replay through the feed on the next
        # refresh — and ± delta folding, unlike the table's merge, is not
        # idempotent under double-application
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        if not self.exists():
            src = source._read_state(spark, src_m)
            shadow = [n for n in self.derived if n in src.columns]
            if shadow:
                raise ValueError(
                    f"derived_cols {shadow!r} shadow physical base "
                    "columns — rename the derived columns"
                )
            src = self._with_derived(src)
            if self.where:
                src = src.filter(F.expr(self.where))
            seed = init_agg(
                src,
                self.group_cols,
                self.sum_cols,
                self.min_cols,
                self.max_cols,
            )
            # pin the consumed columns' field ids: a later base RENAME is
            # then translated back at refresh instead of breaking the fold
            src_ids = src_m.get("field_ids", {})
            self._commit(
                seed, 1, src_seq,
                field_ids={
                    n: src_ids[n] for n in self._source_cols() if n in src_ids
                },
                where=self.where,
                mm_outs=list(self.min_cols) + list(self.max_cols),
                derived={
                    n: [e, d] for n, (e, d) in self.derived.items()
                },
            )
            return src_seq
        m = self.meta()
        meta_derived = {
            n: (v[0], list(v[1]))
            for n, v in (m.get("derived") or {}).items()
        }
        if meta_derived != self.derived:
            raise ValueError(
                f"aggregate at {self.root} was seeded with derived columns "
                f"{meta_derived!r}; constructed with {self.derived!r} — "
                "rebuild instead of mixing definitions"
            )
        if m.get("where") != self.where:
            raise ValueError(
                f"aggregate at {self.root} was seeded with where="
                f"{m.get('where')!r}; constructed with {self.where!r} — "
                "rebuild instead of silently mixing filtered states"
            )
        mm_outs = list(self.min_cols) + list(self.max_cols)
        if "mm_outs" in m:
            if m["mm_outs"] != mm_outs:
                raise ValueError(
                    f"aggregate at {self.root} was seeded with min/max "
                    f"outputs {m['mm_outs']}; constructed with {mm_outs} — "
                    "a mismatched refresh would silently drop or corrupt "
                    "the maintained extrema; rebuild instead"
                )
        else:
            # legacy-unknown meta (pre-round-6 seed): the stored rollup is
            # still valid — verify the constructed extrema columns against
            # the persisted schema instead of hard-failing.  The check is
            # two-sided: constructed extrema must exist in the store, AND
            # a store carrying extrema this constructor does NOT know about
            # must refuse (a refresh projects only group+n_rows+sum+mm
            # columns, so unknown persisted extrema would be silently
            # destroyed on the next commit).
            stored_cols = list(self.read(spark).columns)
            missing = [o for o in mm_outs if o not in stored_cols]
            if missing:
                raise ValueError(
                    f"aggregate at {self.root} (legacy meta, no mm_outs) "
                    f"lacks extrema column(s) {missing}; rebuild to add them"
                )
            core = set(self.group_cols) | {"n_rows"} | set(self.sum_cols)
            extra = [
                c for c in stored_cols if c not in core and c not in mm_outs
            ]
            if extra:
                raise ValueError(
                    f"aggregate at {self.root} (legacy meta, no mm_outs) "
                    f"carries persisted column(s) {extra} this constructor "
                    "does not maintain — a refresh would silently drop "
                    "them; construct with matching min/max outputs or "
                    "rebuild"
                )
            # persist the backfilled key NOW (not only on the next data
            # commit): a legacy meta on an idle table otherwise never
            # upgrades to the strict mismatch check above
            m["mm_outs"] = mm_outs
            self._rewrite_meta(m)
        since = m["applied_seq"]
        if src_seq <= since:
            return since
        # (src_seq from the same pinned manifest bounds the slice, so a
        # concurrent merge is simply picked up by the NEXT refresh)
        base = None
        if self.min_cols or self.max_cols:
            # pinned to the SAME manifest as src_seq: dirty-group rescans
            # must see exactly the state the fold converges to (translate
            # a renamed base back to seed names, like the feed)
            base = self._feed_base_projection(
                source._read_state(spark, src_m), m, src_m
            )
            if self.where:
                base = base.filter(F.expr(self.where))
        feed = self._feed_projection(
            source.changes(spark, since=since, until=src_seq), m, src_m
        )
        if self.where:
            feed = feed.filter(F.expr(self.where))
        updated = apply_changes_to_agg(
            self.read(spark),
            feed,
            self.group_cols,
            self.sum_cols,
            self.min_cols,
            self.max_cols,
            base=base,
        )
        new_version = m["version"] + 1
        self._commit(
            updated, new_version, src_seq,
            field_ids=m.get("field_ids"), where=m.get("where"),
            mm_outs=m.get("mm_outs"), derived=m.get("derived"),
        )
        return src_seq

    def version_for_seq(self, seq: int) -> int:
        """The RETAINED state version whose fold covers the source feed
        exactly through *seq* — the derived half of a consistent pin.
        Raises when the view never materialized that seq (a batched
        refresh folded past it) or retention (``keep_versions``) has
        GC'd it: serving the nearest other version would be precisely
        the torn read the fence exists to prevent."""
        sv = self.meta().get("seq_versions") or {}
        v = sv.get(str(int(seq)))
        if v is None:
            raise ValueError(
                f"view at {self.root} holds no state at source seq "
                f"{seq} (retained seqs: {sorted(int(s) for s in sv)}); "
                "refresh once per source commit and/or raise "
                "keep_versions to cover the pin window"
            )
        return int(v)

    def read_at_seq(self, spark, seq: int) -> DataFrame:
        """This view's state as of source feed seq *seq* (exact match —
        see :meth:`version_for_seq`)."""
        return spark.read.parquet(
            str(self.root / f"v={self.version_for_seq(seq)}")
        )
