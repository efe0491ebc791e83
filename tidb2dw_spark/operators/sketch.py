"""Maintained sketches — the APPROXIMATE tier of three aggregate
families, kept fresh from a change data feed: HyperLogLog registers for
COUNT(DISTINCT) (:class:`MaintainedHLLSketch`), a deterministic binned
histogram for quantiles (:class:`MaintainedQuantileHistogram`), and
Count-Min counters for frequencies / heavy hitters
(:class:`MaintainedCountMinSketch`).  Each has an exact sibling whose
state is O(distinct values) (distinct_matview's support stores); the
sketches trade bounded error for fixed-size state.  The HLL docstring
below details the shared engineering contract (cross-engine-exact md5
hashing, integer-only algebra, oracle-hashable estimates).

:mod:`.distinct_matview` maintains EXACT distinct counts with a
bucket-partitioned support multiset — O(distinct values) state.  At
100 TB a per-group support store over a high-cardinality column (user
ids, document fingerprints) is itself big data; the classic answer is
a fixed-size register sketch per group (Flajolet et al., HyperLogLog,
AofA'07 — the estimator every warehouse's APPROX_COUNT_DISTINCT
implements).  This module maintains per-group HLL registers from the
feed:

- ``m = 2^p`` registers per group (default p=12 → 4096, ~1.6% rel.
  error), stored as (group…, bucket, rho) rows — only NON-ZERO
  registers are materialized, so tiny groups cost rows, not 4096.
- The hash is the repo's engine-portable md5 idiom (md5 hex → 60-bit
  int — the same construction functions/dedup.py:55 and
  entry_suites pin across Spark and DuckDB), so the sketch itself is
  CROSS-ENGINE EXACT: a DuckDB oracle rebuilds identical registers.
- ``rho`` (first-one position in the remaining W = 60−p tail bits) is
  computed with integer-exact ``(W+1) - bit_length(r)`` via
  ``length(bin(r))`` — no floating log anywhere.
- The ESTIMATE divides two exactly-computed numbers once:
  ``E = alpha_m·m²·2^(W+1) / Σ_j 2^(W+1−M_j)`` where the harmonic sum
  is an exact BIGINT (every term is an integral power of two ≤ 2^W and
  the total is ≤ m·2^(W+1) = 2^61) and the numerator is a single
  Python-computed double literal — one IEEE divide, bit-identical in
  any engine.

Maintenance semantics (the honest part): HLL registers are MONOTONE —
``max`` folds inserts exactly, but a delete cannot lower a register.
A refresh whose slice is insert-only folds in O(changes + registers).
A slice carrying deletes (or update preimages) triggers a REGISTER
RECOUNT from the current base state (one σ-filtered scan) so the
maintained sketch equals the sketch of the LIVE rows — never a silent
overestimate.  The recount count is surfaced in the meta; a workload
that deletes often should use the exact distinct view instead (its
support store subtracts natively).

Reference parity: the reference replicates rows and defers
APPROX_COUNT_DISTINCT to the warehouse (Snowflake HLL / BigQuery
HLL_COUNT recompute per query); this keeps the registers fresh
incrementally.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import md5_long
from ..table.managed import CHANGE_TYPE_COL, ManagedTable
from .matview import DIRTY_LITERAL_CAP, literal_group_box, nullsafe_group_eq

_WALK_VIEW_SEQ = 0  # unique temp-view names for concurrent rank walks
_SUB = ("delete", "update_preimage")
_ADD = ("insert", "update_postimage")

# Serving-side state localization cap: when a sketch's pinned version is
# under this many bytes ON DISK, serving reads collect the counter state
# once into an Arrow-backed LocalRelation, so every probe join in the
# read builds its broadcast from driver memory — no per-hop parquet scan
# or broadcast-build JOB (the dyadic descent paid up to 22 of them per
# call).  The counter relation was ALREADY broadcast-joined by these
# reads, so "driver-sized" is not a new constraint — the cap only makes
# it explicit and scale-adaptive: a state past the cap keeps the
# distributed shapes unchanged.  Parameterised for production tuning.
_SERVE_LOCAL_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SKETCH_LOCAL_MAX_BYTES", str(64 << 20))
)


class SeqVersionedState:
    """Mixin for ``root/_meta.json`` + ``v=N`` derived objects: retain
    the last ``keep_versions`` state versions plus a seq→version map in
    the meta, so :class:`~..table.consistent.ConsistentSnapshot` can
    pin this object at a source commit — the same
    ``version_for_seq`` / ``read_at_seq`` protocol
    :class:`~.matview.MaintainedAggregate` implements.  Default
    ``keep_versions = 1`` keeps the existing newest-only GC."""

    keep_versions: int = 1

    def _record_seq_version(self, meta: dict) -> None:
        sv = {
            str(k): int(v)
            for k, v in (meta.get("seq_versions") or {}).items()
        }
        sv[str(int(meta["applied_seq"]))] = int(meta["version"])
        keep = sorted(set(sv.values()), reverse=True)[
            : max(1, int(self.keep_versions))
        ]
        meta["seq_versions"] = {
            s: v for s, v in sv.items() if v in set(keep)
        }

    def _retained_versions(self, meta: dict) -> set:
        return {int(v) for v in (meta.get("seq_versions") or {}).values()}

    def version_for_seq(self, seq: int) -> int:
        """The RETAINED state version whose fold covers the source feed
        exactly through *seq*; raises when that seq was never
        materialized (batched refresh) or retention dropped it —
        serving a neighboring version would be a torn read."""
        sv = self.meta().get("seq_versions") or {}
        v = sv.get(str(int(seq)))
        if v is None:
            raise ValueError(
                f"state at {self.root} holds no version at source seq "
                f"{seq} (retained seqs: {sorted(int(s) for s in sv)}); "
                "refresh once per source commit and/or raise "
                "keep_versions to cover the pin window"
            )
        return int(v)

    def read_at_seq(self, spark: SparkSession, seq: int) -> DataFrame:
        """This state as of source feed seq *seq* (exact match)."""
        return spark.read.parquet(
            str(self.root / f"v={self.version_for_seq(seq)}")
        )


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_numerator(p: int) -> float:
    """``alpha_m · m² · 2^(W+1)`` (W = 60 − p tail bits) as ONE double —
    embed ``repr()`` of this value in both engines' expressions so the
    estimate is a single identical IEEE divide."""
    m = 1 << p
    return _alpha(m) * m * m * float(1 << (61 - p))


def hll_register_cols(value_col: str, p: int) -> tuple[F.Column, F.Column]:
    """(bucket, rho) Spark columns for one value — the md5-hex→int
    idiom splits into a p-bit bucket and a (60−p)-bit tail whose
    first-one position is ``(61−p) − bit_length`` (integer-exact via
    bin())."""
    # THE one copy of the first-15-md5-hex-digits→long idiom (bloom and
    # secondary-index hashing pin the same function — bit-identical).
    return hll_tail_cols(md5_long(F.col(value_col).cast("string")), p)


def hll_tail_cols(h: F.Column, p: int) -> tuple[F.Column, F.Column]:
    """(bucket, rho) from a non-negative ≤60-bit hash column — exposed
    so the boundary algebra is unit-testable on synthetic hashes.

    m = 2^p, so the bucket/tail split is pure bit surgery: the low p
    bits and an arithmetic right shift.  Spark's ``/`` is DOUBLE
    division and a 60-bit h exceeds the 53-bit mantissa — ``h/m`` can
    round across an integer (and at r = 2^k−1, a power-of-two) boundary
    and flip rho vs the DuckDB oracle's exact ``//``.  ``shiftright``
    is integer-exact."""
    wp1 = 61 - p  # tail width (60 − p bits) + 1 = rho's max value
    bucket = (h.bitwiseAND(F.lit((1 << p) - 1))).cast("int")
    r = F.shiftright(h, p)
    rho = (
        F.when(r > 0, F.lit(wp1) - F.length(F.bin(r)))
        .otherwise(F.lit(wp1))
        .cast("int")
    )
    return bucket, rho


def hll_register_sql(value_col: str, p: int) -> tuple[str, str]:
    """DuckDB twin of :func:`hll_register_cols` (same algebra, same
    idiom) — for oracle construction."""
    m = 1 << p
    wp1 = 61 - p
    h = f"('0x'||substr(md5(CAST({value_col} AS VARCHAR)),1,15))::BIGINT"
    bucket = f"CAST({h} % {m} AS INT)"
    r = f"({h} // {m})"
    rho = (
        f"CAST(CASE WHEN {r} > 0 THEN {wp1} - length(bin({r})) "
        f"ELSE {wp1} END AS INT)"
    )
    return bucket, rho


def floor_div_sql(value: str, width: int) -> str:
    """Engine-portable FLOOR division for the bin split.  Spark's
    ``DIV`` truncates toward zero while DuckDB's ``//`` floors, so
    negative values would bin differently; subtracting the non-negative
    mod first makes the numerator exactly divisible — truncation and
    floor coincide, bit-identical in both engines.  (Spark ``pmod`` ==
    DuckDB ``((x %% W) + W) %% W``.)"""
    m = f"((({value}) % {width} + {width}) % {width})"
    return f"(((({value}) - {m})) DIV {width})"


class MaintainedQuantileHistogram:
    """Approximate QUANTILES as maintained state — the sketch tier of
    the quantile family, completing the symmetry the distinct family
    already has (exact support store ↔ HLL registers):

    - :mod:`.distinct_matview` keeps EXACT quantiles with an
      O(distinct values) support store;
    - this keeps a fixed-width integer HISTOGRAM per group —
      O(value range / bin_width) state — and answers any quantile to
      ±bin_width with a cumulative walk.

    Unlike the mergeable sketches warehouses reach for (KLL, t-digest,
    REQ), a deterministic binned histogram has two properties that
    matter here: it is CROSS-ENGINE EXACT (the bin of a value is pure
    integer algebra — a DuckDB oracle rebuilds the identical state,
    so the driver can hash-verify it), and it is SUBTRACTABLE — bin
    counts fold ± from the change feed like any signed aggregate, so
    deletes and update preimages maintain in O(changes + touched bins)
    with NO recount path at all (the HLL sibling's one weakness).
    Merge = add counts; rollup across groups = the same fold.

    Implementation: a thin composition over
    :class:`~.matview.MaintainedAggregate` with the bin as a
    ``derived_cols`` group key (floor-division via :func:`floor_div_sql`
    so negative values bin identically in both engines); quantile reads
    are one window cumsum over the groups×bins state — never the base.

    State is O(value range / bin_width) — unbounded on a heavy-tailed
    domain.  Pass ``max_bins`` to cap it: whenever a refresh leaves
    more than *max_bins* state rows, the bin width DOUBLES (repeatedly,
    power-of-two) and the state REBINS from itself — exact count
    folding (``floor_div(v, 2W) == floor_div(floor_div(v, W), 2)``, so
    the widened state is bit-identical to a direct build at the wider
    width; no base rescan, still cross-engine reproducible).  Error
    stays ≤ the CURRENT bin width, which the meta records
    (``hist_bin_width``) and later instances adopt on attach.

    Reference parity: the reference defers percentile queries to the
    warehouse (full recompute per query); this serves them from
    maintained state."""

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        bin_width: int,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        max_bins: int | None = None,
        keep_versions: int = 1,
    ):
        from .matview import MaintainedAggregate

        if bin_width <= 0:
            raise ValueError(f"bin_width must be positive, got {bin_width}")
        if max_bins is not None and max_bins < 1:
            raise ValueError(f"max_bins must be ≥ 1, got {max_bins}")
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.bin_width = int(bin_width)
        self.max_bins = int(max_bins) if max_bins is not None else None
        self._agg = MaintainedAggregate(
            root,
            [*self.group_cols, "__bin"],
            sum_cols={},
            where=(
                f"({value_col} IS NOT NULL)"
                + (f" AND ({where})" if where else "")
            ),
            where_cols=list(
                dict.fromkeys([value_col, *(where_cols or [])])
            ),
            derived_cols=self._bin_derived(self.bin_width),
            keep_versions=keep_versions,
        )
        # protocol compatibility: ConsistentSnapshot reads pinned state
        # through <root>/v=N
        self.root = self._agg.root

    def version_for_seq(self, seq: int) -> int:
        """Consistent-pin protocol, delegated to the backing aggregate
        (construct with keep_versions > 1 to retain pinnable state)."""
        return self._agg.version_for_seq(seq)

    def bin_width_for_version(self, version: int) -> int:
        """The bin width version *version* was committed at — widening
        re-commits at a wider width, so RETAINED pre-widen versions
        carry ``__bin`` values a reader must decode with THEIR width,
        not the live one.  Resolved from ``hist_width_history`` in the
        meta ([[version, width], …], appended at every widening): the
        width of the latest entry at or before *version*.  Versions
        predating the earliest entry (a legacy store seeded before
        history existed) fall back to that entry's width."""
        hist = self.meta().get("hist_width_history") or [
            [1, self.bin_width]
        ]
        w = int(hist[0][1])
        for v, hw in hist:
            if int(v) <= int(version):
                w = int(hw)
        return w

    def bin_width_for_seq(self, seq: int) -> int:
        """The bin width decoding :meth:`read_at_seq`'s ``__bin``."""
        return self.bin_width_for_version(self.version_for_seq(seq))

    def read_at_seq(
        self, spark: SparkSession, seq: int, bin_width: int | None = None
    ) -> DataFrame:
        """Pinned state at source seq *seq*.  A pinned version committed
        BEFORE a widening is binned at a narrower width than the live
        one; decoding it with the live width would be a silently-torn
        interpretation, so when the widths differ the caller must pass
        the pinned width explicitly (``bin_width_for_seq``) to prove it
        will decode correctly."""
        self._sync_width()
        w = self.bin_width_for_seq(seq)
        if bin_width is None and w != self.bin_width:
            raise ValueError(
                f"histogram state pinned at seq {seq} was binned at "
                f"width {w}, but the live width is {self.bin_width} "
                "(a later refresh widened the bins) — pass "
                "bin_width=bin_width_for_seq(seq) to acknowledge the "
                "pinned width"
            )
        if bin_width is not None and int(bin_width) != w:
            raise ValueError(
                f"histogram state pinned at seq {seq} was binned at "
                f"width {w}, not {bin_width}"
            )
        return self._agg.read_at_seq(spark, seq).select(
            *self.group_cols, "__bin", "n_rows"
        )

    def _bin_derived(self, width: int) -> dict:
        return {
            "__bin": (
                f"CAST({floor_div_sql(self.value_col, width)} AS BIGINT)",
                [self.value_col],
            )
        }

    def _set_width(self, width: int) -> None:
        self.bin_width = int(width)
        self._agg.derived = {
            n: (expr, list(deps))
            for n, (expr, deps) in self._bin_derived(width).items()
        }

    def _sync_width(self) -> None:
        """Adopt a WIDER stored bin width (a past widening) before any
        read or fold — the constructed width is the initial/minimum.
        A stored width the constructed one doesn't divide is a
        different histogram and is refused (the underlying aggregate's
        derived-definition guard would refuse it anyway, less
        legibly)."""
        if not self._agg.exists():
            return
        w = int(self._agg.meta().get("hist_bin_width", 0) or 0)
        if not w or w == self.bin_width:
            return
        ratio = w // self.bin_width if w % self.bin_width == 0 else 0
        if w < self.bin_width or ratio <= 0 or (ratio & (ratio - 1)) != 0:
            # divisibility alone would accept e.g. stored 12 over
            # constructed 4 (ratio 3) — a width no doubling sequence
            # could produce, i.e. a genuinely different histogram
            raise ValueError(
                f"histogram at {self._agg.root} has bin_width {w}, not a "
                f"power-of-two widening of the constructed "
                f"{self.bin_width} — rebuild instead"
            )
        self._set_width(w)

    def _maybe_widen(self, spark: SparkSession) -> None:
        """Double the bin width (rebinning the state from itself —
        exact) until ≤ max_bins state rows remain.  Each step is one
        state-sized job; widening is rare (each halves the bins), so
        the amortized upkeep stays O(changes)."""
        while True:
            m = self._agg.meta()
            state = self._agg.read(spark).select(
                *self.group_cols, "__bin", "n_rows"
            )
            if state.count() <= self.max_bins:
                return
            new_w = self.bin_width * 2
            rebinned = (
                state
                # arithmetic shift = floor division by 2, negatives too
                .groupBy(
                    *self.group_cols,
                    F.shiftright(F.col("__bin"), 1).alias("__bin"),
                )
                .agg(F.sum("n_rows").cast("long").alias("n_rows"))
            )
            self._set_width(new_w)
            hist = [
                [int(v), int(hw)]
                for v, hw in (
                    m.get("hist_width_history")
                    or [[1, m.get("hist_bin_width") or new_w // 2]]
                )
            ]
            self._agg._commit(
                rebinned,
                version=m["version"] + 1,
                applied_seq=m["applied_seq"],
                field_ids=m.get("field_ids"),
                where=m.get("where"),
                mm_outs=m.get("mm_outs"),
                derived={
                    n: [e, d]
                    for n, (e, d) in self._agg.derived.items()
                },
                extra={
                    "hist_bin_width": new_w,
                    # version → width provenance so retained pre-widen
                    # versions stay decodable (bin_width_for_version)
                    "hist_width_history": hist
                    + [[int(m["version"]) + 1, int(new_w)]],
                },
            )

    # -- derived protocol (rides TableReplicator / stream refresh) --------
    def exists(self) -> bool:
        return self._agg.exists()

    def meta(self) -> dict:
        return self._agg.meta()

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Pure ± count fold — O(changes + touched bins) on EVERY slice
        shape, deletes included; widens afterwards if a cap is set."""
        self._sync_width()
        seq = self._agg.refresh(spark, source)
        m = self._agg.meta()
        if "hist_width_history" not in m:
            # seed width provenance at the width every version so far
            # was binned at (no widening has happened yet — _sync_width
            # would have adopted one); metadata-only rewrite, preserved
            # by later commits
            m["hist_width_history"] = [[1, int(self.bin_width)]]
            m["hist_bin_width"] = int(self.bin_width)
            self._agg._rewrite_meta(m)
        if self.max_bins is not None:
            self._maybe_widen(spark)
        return seq

    def read(self, spark: SparkSession) -> DataFrame:
        """The histogram: (group…, __bin, n_rows); bin b covers
        ``[b·W, (b+1)·W)`` at the CURRENT width (see ``bin_width``
        after :meth:`refresh`/:meth:`_sync_width`)."""
        self._sync_width()
        return self._agg.read(spark).select(
            *self.group_cols, "__bin", "n_rows"
        )

    def rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        """The histogram merged to a coarser grain — counts ADD (finer
        groups partition the σ-base), so a region-level histogram falls
        out of nation-level state with no base scan; ``[]`` gives the
        global histogram.  Exact, not approximate-on-approximate: the
        merged bins equal a direct coarse-grain build bit-for-bit."""
        subset = list(group_subset)
        missing = [g for g in subset if g not in self.group_cols]
        if missing:
            raise ValueError(
                f"rollup cols {missing!r} are not histogram group cols "
                f"{self.group_cols}"
            )
        return (
            self.read(spark)
            .groupBy(*subset, "__bin")
            .agg(F.sum("n_rows").cast("long").alias("n_rows"))
        )

    def union_rollup(
        self,
        spark: SparkSession,
        other: "MaintainedQuantileHistogram",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """Bins ADDED across two maintained histograms — quantiles over
        the UNION (bag semantics) of two tables from their states alone,
        completing the cross-table algebra symmetry with the HLL/CM/KMV
        tiers.  Exact by linearity: the summed bins equal a direct
        build over ``A ⊎ B`` bit-for-bit.  Requires identical bin_width
        (bin alignment) and the same value semantics; *group_subset*
        must be common to both (``[]`` → one global histogram)."""
        self._sync_width()
        other._sync_width()
        if other.bin_width != self.bin_width:
            raise ValueError(
                f"cannot union histograms with different bin widths: "
                f"{self.bin_width} vs {other.bin_width} — the bins would "
                "misalign"
            )
        a = self.rollup(spark, group_subset)
        b = other.rollup(spark, group_subset)
        subset = list(group_subset)
        return (
            a.unionByName(b)
            .groupBy(*subset, "__bin")
            .agg(F.sum("n_rows").cast("long").alias("n_rows"))
        )

    def quantiles_union(
        self,
        spark: SparkSession,
        other: "MaintainedQuantileHistogram",
        qs_milli: Sequence[int],
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`quantiles` over :meth:`union_rollup` bins."""
        return self._quantiles_over(
            spark,
            self.union_rollup(spark, other, group_subset),
            list(group_subset),
            qs_milli,
        )

    def quantiles(
        self, spark: SparkSession, qs_milli: Sequence[int]
    ) -> DataFrame:
        """Per group and per q (in thousandths): the rank-⌈q·n/1000⌉
        value's bin — (group…, q_milli, rank, total, bin_lo, bin_hi),
        all BIGINT (bin_hi exclusive).  Pure integer algebra over the
        groups×bins state: one window cumsum, no base read, no floats —
        the whole answer is oracle-hashable."""
        return self._quantiles_over(
            spark, self.read(spark), self.group_cols, qs_milli
        )

    def quantiles_rollup(
        self,
        spark: SparkSession,
        qs_milli: Sequence[int],
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`quantiles` over :meth:`rollup` bins."""
        return self._quantiles_over(
            spark,
            self.rollup(spark, group_subset),
            list(group_subset),
            qs_milli,
        )

    def estimate_range(
        self,
        spark: SparkSession,
        ranges: Sequence[tuple[int, int]],
        group_subset: Sequence[str] | None = None,
    ) -> DataFrame:
        """(group…, lo, hi, est_lo, est_hi) — per group, the COUNT of
        rows with ``lo ≤ value ≤ hi`` BRACKETED from the binned state:
        ``est_lo`` sums bins fully inside the range, ``est_hi`` adds
        the partially-overlapping edge bins the histogram cannot see
        into, so ``est_lo ≤ true ≤ est_hi`` always and the bracket
        width is ≤ 2·bin_width rows' worth of mass — the binned tier's
        answer to the BETWEEN-selectivity read the dyadic tier serves
        via :meth:`MaintainedCMHeavyHitters.estimate_range` (which
        never underestimates but can only overestimate; this one
        brackets both sides).  Explicit zero rows for every (group,
        range) with no overlapping bins.  Pure integer algebra over the
        groups×bins state — oracle-hashable, never a base scan."""
        if not ranges:
            raise ValueError("ranges must be non-empty")
        for lo, hi in ranges:
            if int(hi) < int(lo):
                raise ValueError(f"invalid range [{lo}, {hi}]")
        self._sync_width()
        w = self.bin_width
        if group_subset is None:
            subset = list(self.group_cols)
            hist = self.read(spark)
        else:
            subset = list(group_subset)
            hist = self.rollup(spark, group_subset)
        rngdf = spark.createDataFrame(
            [(int(lo), int(hi)) for lo, hi in ranges], "lo long, hi long"
        )
        base = (
            hist.select(*subset).distinct().crossJoin(F.broadcast(rngdf))
            if subset
            else rngdf
        )
        j = base.join(hist, subset, "left") if subset else base.crossJoin(
            hist
        )
        bin_lo = F.col("__bin") * F.lit(w)
        bin_hi = (F.col("__bin") + 1) * F.lit(w) - 1  # inclusive
        overlap = (bin_lo <= F.col("hi")) & (bin_hi >= F.col("lo"))
        full = (bin_lo >= F.col("lo")) & (bin_hi <= F.col("hi"))
        return j.groupBy(*subset, "lo", "hi").agg(
            F.coalesce(
                F.sum(F.when(overlap & full, F.col("n_rows"))), F.lit(0)
            )
            .cast("long")
            .alias("est_lo"),
            F.coalesce(
                F.sum(F.when(overlap, F.col("n_rows"))), F.lit(0)
            )
            .cast("long")
            .alias("est_hi"),
        )

    def _quantiles_over(
        self,
        spark: SparkSession,
        hist: DataFrame,
        group_cols: list[str],
        qs_milli: Sequence[int],
    ) -> DataFrame:
        from pyspark.sql import Window

        qs = [int(q) for q in qs_milli]
        if not qs or any(not (0 < q <= 1000) for q in qs):
            raise ValueError(f"qs_milli must be in (0, 1000], got {qs_milli}")
        w = (
            Window.partitionBy(*group_cols)
            .orderBy("__bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = hist.withColumn(
            "__cum", F.sum("n_rows").over(w).cast("long")
        ).withColumn(
            "__total",
            F.sum("n_rows")
            .over(Window.partitionBy(*group_cols))
            .cast("long"),
        )
        qdf = spark.createDataFrame([(q,) for q in qs], "q_milli long")
        j = cum.crossJoin(F.broadcast(qdf)).withColumn(
            "rank",
            F.greatest(
                F.lit(1).cast("long"),
                F.expr("(q_milli * __total + 999) DIV 1000").cast("long"),
            ),
        )
        pick = (
            Window.partitionBy(*group_cols, "q_milli")
            .orderBy("__bin")
        )
        return (
            j.filter(F.col("__cum") >= F.col("rank"))
            .withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select(
                *group_cols,
                "q_milli",
                "rank",
                F.col("__total").alias("total"),
                (F.col("__bin") * self.bin_width)
                .cast("long")
                .alias("bin_lo"),
                ((F.col("__bin") + 1) * self.bin_width)
                .cast("long")
                .alias("bin_hi"),
            )
        )


class MaintainedHLLSketch(SeqVersionedState):
    """Per-group HLL registers maintained from a ManagedTable's feed
    under the single-table derived protocol (``exists()`` /
    ``refresh(spark, table)``) that :class:`~...replicate.
    TableReplicator` and ``stream_derived_refresh`` drive."""

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        p: int = 12,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        keep_versions: int = 1,
    ):
        if not (4 <= p <= 16):
            raise ValueError(f"p={p} out of range [4, 16]")
        self.keep_versions = max(1, int(keep_versions))
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.p = int(p)
        self.m = 1 << self.p
        self.where = where
        self.where_cols = list(where_cols or [])
        if self.where_cols and not where:
            raise ValueError("where_cols given without a where predicate")

    # -- meta (same crash contract as MaintainedAggregate) ----------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def read(self, spark: SparkSession) -> DataFrame:
        """The register table: (group…, bucket, rho)."""
        return spark.read.parquet(str(self.root / f"v={self.meta()['version']}"))

    def _commit(self, regs: DataFrame, meta: dict) -> None:
        regs.write.mode("overwrite").parquet(
            str(self.root / f"v={meta['version']}")
        )
        self.root.mkdir(parents=True, exist_ok=True)
        self._record_seq_version(meta)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())
        retained = self._retained_versions(meta)
        for pth in self.root.glob("v=*"):
            v = int(pth.name.split("=", 1)[1])
            if v < meta["version"] and v not in retained:
                shutil.rmtree(pth, ignore_errors=True)

    def _source_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                self.group_cols + [self.value_col] + self.where_cols
            )
        )

    def _registers(self, rows: DataFrame) -> DataFrame:
        bucket, rho = hll_register_cols(self.value_col, self.p)
        return (
            rows.filter(F.col(self.value_col).isNotNull())
            .select(
                *self.group_cols,
                bucket.alias("bucket"),
                rho.alias("rho"),
            )
            .groupBy(*self.group_cols, "bucket")
            .agg(F.max("rho").alias("rho"))
        )

    def _sigma(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.where)) if self.where else df

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Fold new commits into the registers; returns the applied
        seq.  Insert-only slices fold by max (O(changes + registers));
        a slice carrying deletes triggers a register recount from the
        current state (HLL cannot subtract — see module docstring)."""
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        if not src_m.get("cdf"):
            raise ValueError(
                f"table {source.root} has no change data feed (create(cdf=True))"
            )
        if not self.exists():
            regs = self._registers(
                self._sigma(
                    source._read_state(spark, src_m).select(
                        *self._source_cols()
                    )
                )
            )
            self._commit(
                regs,
                {
                    "version": 1,
                    "applied_seq": src_seq,
                    "p": self.p,
                    "where": self.where,
                    "group_cols": self.group_cols,
                    "value_col": self.value_col,
                    "recounts": 0,
                },
            )
            return src_seq
        meta = self.meta()
        if int(meta.get("p", -1)) != self.p:
            raise ValueError(
                f"sketch at {self.root} was seeded with p={meta.get('p')}; "
                f"constructed with {self.p} — the register layout would "
                "split; rebuild instead"
            )
        if meta.get("where") != self.where:
            raise ValueError(
                f"sketch at {self.root} was seeded with where="
                f"{meta.get('where')!r}; constructed with {self.where!r} — "
                "rebuild instead of mixing filtered states"
            )
        if (
            meta.get("group_cols") != self.group_cols
            or meta.get("value_col") != self.value_col
        ):
            raise ValueError(
                f"sketch at {self.root} was seeded over "
                f"({meta.get('group_cols')}, {meta.get('value_col')}); "
                f"constructed over ({self.group_cols}, {self.value_col}) — "
                "rebuild instead"
            )
        applied = meta["applied_seq"]
        if src_seq <= applied:
            return applied
        sl = self._sigma(
            source.changes(spark, since=applied, until=src_seq).select(
                *self._source_cols(), CHANGE_TYPE_COL
            )
        )
        # monotonicity gate: one changes-sized job decides the fold path
        has_sub = bool(
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_SUB)).limit(1).take(1)
        )
        meta = dict(meta)
        meta["version"] += 1
        meta["applied_seq"] = src_seq
        if has_sub:
            meta["recounts"] = int(meta.get("recounts", 0)) + 1
            regs = self._recount(spark, source, src_m, sl)
        else:
            adds = self._registers(
                sl.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD)).drop(
                    CHANGE_TYPE_COL
                )
            )
            regs = (
                self.read(spark)
                .unionByName(adds)
                .groupBy(*self.group_cols, "bucket")
                .agg(F.max("rho").alias("rho"))
            )
        self._commit(regs, meta)
        return src_seq

    def _recount(
        self,
        spark: SparkSession,
        source: ManagedTable,
        src_m: dict,
        sl: DataFrame,
    ) -> DataFrame:
        """GROUP-SCOPED register recount for a delete-bearing slice: the
        slice names exactly which groups carry ``_SUB`` rows, so only
        THOSE groups' registers are rebuilt from the σ-base — the base
        scan is pruned to the dirty groups by literal IN predicates
        (parquet row-group pruning engages), with a broadcast semi-join
        fallback past :data:`~.matview.DIRTY_LITERAL_CAP` keys — and
        every untouched group's registers pass through unchanged.  The
        slice's ADD rows for non-dirty groups still fold by max (exact:
        registers are monotone under inserts).  A delete-light workload
        at 100 TB pays an O(dirty groups' rows) scan, not a full σ-scan.
        A GLOBAL sketch (no group cols) degenerates to the full recount
        — one delete anywhere invalidates the single register set."""
        base = self._sigma(
            source._read_state(spark, src_m).select(*self._source_cols())
        )
        if not self.group_cols:
            return self._registers(base)
        sub_keys = (
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_SUB))
            .select(*self.group_cols)
            .distinct()
        )
        adds = self._registers(
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD)).drop(
                CHANGE_TYPE_COL
            )
        )
        cur = self.read(spark)
        rows = sub_keys.limit(DIRTY_LITERAL_CAP + 1).collect()
        if len(rows) <= DIRTY_LITERAL_CAP:
            # literal box is a SUPERSET of the dirty tuple set (per-column
            # INs) — safe because both sides split on the SAME predicate:
            # boxed groups are recounted whole from base, non-boxed
            # registers pass through.  NULL-group registers: the box is
            # NULL on them unless a dirty key carries NULL, so the kept
            # side coalesces to keep them.
            box = literal_group_box(rows, self.group_cols, dict(base.dtypes))
            kept = cur.filter(~F.coalesce(box, F.lit(False)))
            recount = self._registers(base.filter(box))
            add_kept = adds.filter(~F.coalesce(box, F.lit(False)))
        else:
            kept = cur.alias("__c").join(
                F.broadcast(sub_keys.alias("__k")),
                nullsafe_group_eq("__c", "__k", self.group_cols),
                "left_anti",
            )
            recount = self._registers(
                base.alias("__b").join(
                    F.broadcast(sub_keys.alias("__k")),
                    nullsafe_group_eq("__b", "__k", self.group_cols),
                    "left_semi",
                )
            )
            add_kept = adds.alias("__a").join(
                F.broadcast(sub_keys.alias("__k")),
                nullsafe_group_eq("__a", "__k", self.group_cols),
                "left_anti",
            )
        # recounted groups read their ADDs from the base (src_m is the
        # post-slice state); non-dirty groups fold the slice's ADDs by max
        return (
            kept.unionByName(add_kept)
            .groupBy(*self.group_cols, "bucket")
            .agg(F.max("rho").alias("rho"))
            .unionByName(recount)
        )

    def rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        """Registers MAX-MERGED to a coarser grain — answer
        region-level distinct from nation-level sketches with NO base
        scan.  Exact: a register is the max over its group's rows, and
        finer groups partition the σ-base, so the elementwise max of
        finer registers IS the register a direct coarse-grain build
        would produce (bit-identical, oracle-checkable).  *group_subset*
        may be empty → one global register set."""
        subset = list(group_subset)
        missing = [g for g in subset if g not in self.group_cols]
        if missing:
            raise ValueError(
                f"rollup cols {missing!r} are not sketch group cols "
                f"{self.group_cols}"
            )
        return (
            self.read(spark)
            .groupBy(*subset, "bucket")
            .agg(F.max("rho").alias("rho"))
        )

    def estimate_rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        """:meth:`estimate` over :meth:`rollup` registers."""
        return self._estimate_over(
            self.rollup(spark, group_subset), list(group_subset)
        )

    def union_rollup(
        self,
        spark: SparkSession,
        other: "MaintainedHLLSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """Registers max-merged ACROSS two maintained sketches — the
        distinct cardinality of the UNION of two tables answered from
        their sketches alone, no scan of either base.  Exact: HLL
        registers are max-mergeable across ANY partition of the rows,
        so max(regs_A, regs_B) IS the register set a direct build over
        ``A ∪ B`` would produce (bit-identical, oracle-checkable) —
        the sketch-algebra twin of a cross-table DISTINCT.  Requires
        identical ``p`` (register layout) and value semantics (the two
        value columns must describe the same key space — e.g. custkeys
        seen in orders ∪ registered customers); *group_subset* must be
        common to both sketches (``[]`` → one global union set)."""
        if other.p != self.p:
            raise ValueError(
                f"cannot union sketches with different p: "
                f"{self.p} vs {other.p} — the register layouts differ"
            )
        a = self.rollup(spark, group_subset)
        b = other.rollup(spark, group_subset)
        subset = list(group_subset)
        return (
            a.unionByName(b)
            .groupBy(*subset, "bucket")
            .agg(F.max("rho").alias("rho"))
        )

    def estimate_union(
        self,
        spark: SparkSession,
        other: "MaintainedHLLSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`estimate` over :meth:`union_rollup` registers."""
        return self._estimate_over(
            self.union_rollup(spark, other, group_subset),
            list(group_subset),
        )

    def estimate(self, spark: SparkSession) -> DataFrame:
        """(group…, used_buckets, hsum_scaled, est_raw, est) per group.

        ``hsum_scaled = Σ 2^(W+1−rho) + (m − used)·2^(W+1)`` is an exact
        BIGINT and ``est_raw`` the single IEEE divide of the module
        docstring — both CROSS-ENGINE EXACT (oracle-checkable).
        ``est`` applies the standard small-range correction (linear
        counting ``m·ln(m/V)`` when est_raw ≤ 2.5m and empty buckets
        exist, Flajolet §4) — the estimator a caller should read; its
        ``ln`` is engine-local, so exactness contracts pin est_raw and
        the registers instead."""
        return self._estimate_over(self.read(spark), self.group_cols)

    def _estimate_over(
        self, regs: DataFrame, group_cols: list[str]
    ) -> DataFrame:
        a = hll_numerator(self.p)
        m = self.m
        base = (
            regs.groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias("used_buckets"),
                F.sum(
                    F.expr(f"shiftleft(CAST(1 AS BIGINT), {61 - self.p} - rho)")
                )
                .cast("long")
                .alias("__present"),
            )
            .select(
                *group_cols,
                "used_buckets",
                (
                    F.col("__present")
                    + (F.lit(m) - F.col("used_buckets"))
                    * F.lit(1 << (61 - self.p)).cast("long")
                )
                .cast("long")
                .alias("hsum_scaled"),
            )
            .withColumn("est_raw", F.lit(a) / F.col("hsum_scaled"))
        )
        v = F.lit(m) - F.col("used_buckets")
        return base.withColumn(
            "est",
            F.when(
                (F.col("est_raw") <= F.lit(2.5 * m)) & (v > 0),
                F.lit(float(m)) * F.log(F.lit(float(m)) / v),
            ).otherwise(F.col("est_raw")),
        )


def cms_bucket_col(
    value_col: str | F.Column, depth: int, width: int
) -> F.Column:
    """Count-Min bucket for one hash row: the md5 idiom over the value
    salted with the depth index (``value || '#d'``), reduced mod the
    width.  The hash is non-negative (≤60 bits) so ``%`` agrees between
    engines with no pmod dance.  *value_col* may be a column name or an
    arbitrary expression (the dyadic heavy-hitter tier hashes prefix
    expressions)."""
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    h = md5_long(F.concat(c.cast("string"), F.lit(f"#{depth}")))
    return (h % F.lit(width)).cast("int")


def cms_bucket_sql(value_col: str, depth_expr: str, width: int) -> str:
    """DuckDB twin of :func:`cms_bucket_col` — *depth_expr* may be a
    literal or a column from a ``range(d)`` lateral, enabling one SQL
    expression to cover every hash row."""
    h = (
        f"('0x'||substr(md5(CAST({value_col} AS VARCHAR) || '#' || "
        f"CAST({depth_expr} AS VARCHAR)),1,15))::BIGINT"
    )
    return f"CAST({h} % {width} AS INT)"


class MaintainedCountMinSketch(SeqVersionedState):
    """Per-group Count-Min counters maintained from a ManagedTable's
    feed — the APPROXIMATE tier of the FREQUENCY family, completing the
    sketch-tier symmetry:

    ======== ============================== =============================
    family   exact tier                     sketch tier
    ======== ============================== =============================
    distinct support store (distinct_       :class:`MaintainedHLLSketch`
             matview)                       (registers, max-mergeable)
    quantile support store                  :class:`MaintainedQuantile
                                            Histogram` (±, add-mergeable)
    frequency heavy-hitter support store    **this** (±, add-mergeable)
    ======== ============================== =============================

    Count-Min (Cormode & Muthukrishnan, J. Algorithms 2005) keeps
    ``depth`` hash rows of ``width`` counters per group; a value's
    frequency estimate is the MIN over its ``depth`` counters — an
    overestimate by at most ``εN`` w.p. ``1−δ`` (``w=⌈e/ε⌉``,
    ``d=⌈ln 1/δ⌉``), and NEVER an underestimate, so threshold reads
    retain every true heavy hitter.

    The property that earns it a place next to HLL: CM is a LINEAR
    sketch.  Counters fold **±** from the change feed exactly like a
    maintained SUM — inserts +1, deletes/update-preimages −1 — so EVERY
    slice shape maintains in O(changes·depth + touched counters) with
    NO recount path at all (the HLL sibling's one weakness; this is the
    strict-turnstile model, which the feed's preimage discipline
    guarantees).  Each refresh asserts no counter went negative — a
    negative counter means a delete arrived for a row the sketch never
    counted, i.e. upstream feed corruption, and is refused loudly.

    Cross-engine exact: the per-row hash is the repo's pinned md5-hex→
    int idiom salted with the hash-row index, and estimates are integer
    MINs — a DuckDB oracle rebuilds bit-identical counters and
    estimates, so the driver hash-verifies the whole tier.

    Only NON-ZERO counters are materialized: state is
    ``O(min(distinct values, depth·width))`` rows per group.  Rollups
    to a coarser grain ADD counters (linearity again) and equal a
    direct coarse-grain build bit-for-bit.

    Reference parity: the reference replicates rows and defers frequency
    queries to the warehouse (full ``GROUP BY value`` recompute per
    query); this serves them from maintained fixed-size state."""

    # the non-group columns that key a counter row; the dyadic
    # heavy-hitter subclass prepends "level"
    _COUNTER_KEYS: tuple[str, ...] = ("depth", "bucket")

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        depth: int = 3,
        width: int = 2048,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        keep_versions: int = 1,
    ):
        if not (1 <= depth <= 8):
            raise ValueError(f"depth={depth} out of range [1, 8]")
        if width < 2:
            raise ValueError(f"width={width} must be ≥ 2")
        self.keep_versions = max(1, int(keep_versions))
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.depth = int(depth)
        self.width = int(width)
        self.where = where
        self.where_cols = list(where_cols or [])
        if self.where_cols and not where:
            raise ValueError("where_cols given without a where predicate")

    # -- meta (same crash contract as MaintainedHLLSketch) ----------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def read(self, spark: SparkSession) -> DataFrame:
        """The counter table: (group…, depth, bucket, cnt) — only
        non-zero counters exist."""
        return spark.read.parquet(
            str(self.root / f"v={self.meta()['version']}")
        )

    def _state_bytes(self) -> int:
        """On-disk footprint of the pinned version — a driver-side
        stat() sum, no Spark job.  Upper-bounds any rollup of it (a
        rollup only merges counter rows)."""
        vdir = self.root / f"v={self.meta()['version']}"
        return sum(
            f.stat().st_size for f in vdir.rglob("*") if f.is_file()
        )

    def _serve_pdf(self, subset: list | None):
        """Driver-side snapshot of the pinned counter state for a
        serving read, or None.  Under ``_SERVE_LOCAL_MAX_BYTES`` (an
        on-disk stat, no job) the version dir — it is by construction
        metadata-sized then — is read DIRECTLY with pandas, so state
        access costs zero Spark jobs; *subset* (when it differs from
        the stored grain) applies the linear rollup as an exact
        integer groupby-sum, mirroring :meth:`rollup`.  None above the
        cap or on any read failure: callers keep the distributed
        shapes, so production-sized states are untouched."""
        try:
            if self._state_bytes() > _SERVE_LOCAL_MAX_BYTES:
                return None
            import pandas as pd

            vdir = self.root / f"v={self.meta()['version']}"
            files = sorted(vdir.glob("*.parquet"))
            if not files:
                return None
            pdf = pd.concat(
                [pd.read_parquet(f) for f in files], ignore_index=True
            )
            if subset is not None and set(subset) != set(self.group_cols):
                keys = [*subset, *self._COUNTER_KEYS]
                pdf = pdf.groupby(
                    keys, dropna=False, sort=False, as_index=False
                )["cnt"].sum()
            return pdf
        except Exception:
            return None

    def _commit(self, counters: DataFrame, meta: dict, validate=None) -> None:
        """Write → validate → swap → GC, in that order.  *validate*
        (if given) runs against the freshly written version directory
        BEFORE the meta swap: if it raises, the tainted directory is
        removed, the meta still points at the previous version, and
        older versions were never GC'd — the sketch keeps serving the
        last good state and the caller sees the error.  (Validating
        after the swap — the original shape — destroyed the only good
        version before discovering the new one was corrupt.)"""
        vdir = self.root / f"v={meta['version']}"
        counters.write.mode("overwrite").parquet(str(vdir))
        if validate is not None:
            try:
                validate(vdir)
            except Exception:
                shutil.rmtree(vdir, ignore_errors=True)
                raise
        self.root.mkdir(parents=True, exist_ok=True)
        self._record_seq_version(meta)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())
        retained = self._retained_versions(meta)
        for pth in self.root.glob("v=*"):
            v = int(pth.name.split("=", 1)[1])
            if v < meta["version"] and v not in retained:
                shutil.rmtree(pth, ignore_errors=True)

    def _extra_meta(self) -> dict:
        """Layout keys beyond depth×width that the subclass seeds (e.g.
        the dyadic level count) — checked on every later refresh."""
        return {}

    def _check_extra_meta(self, meta: dict) -> None:
        """Refuse to fold into a state whose extra layout keys differ
        from this instance's (base CMS has none)."""
        for k, v in self._extra_meta().items():
            if meta.get(k) != v:
                raise ValueError(
                    f"sketch at {self.root} was seeded with {k}="
                    f"{meta.get(k)!r}; constructed with {v!r} — the "
                    "counter layout would split; rebuild instead"
                )

    def _source_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                self.group_cols + [self.value_col] + self.where_cols
            )
        )

    def _sigma(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.where)) if self.where else df

    def _depth_buckets(self) -> F.Column:
        """Array of (depth, bucket) structs — all hash rows for one
        value computed in ONE projection pass (depth is tiny, so this
        is a handful of md5s per row, all inside whole-stage codegen)."""
        return F.array(*[
            F.struct(
                F.lit(d).cast("int").alias("depth"),
                cms_bucket_col(self.value_col, d, self.width).alias(
                    "bucket"
                ),
            )
            for d in range(self.depth)
        ])

    def _fold_structs(self) -> F.Column:
        """The (counter-key…) structs one row folds into — the subclass
        hook that turns this sketch dyadic."""
        return self._depth_buckets()

    def _value_grain(self, counters: DataFrame) -> DataFrame:
        """The VALUE-grain slice of a counter frame — identity here;
        the dyadic subclass narrows to its level-0 rows so every
        point-frequency read (estimate / heavy_hitters / join-size)
        stays a plain CM over the raw values."""
        return counters

    def _counters(self, rows: DataFrame, sign: F.Column) -> DataFrame:
        """Signed counter deltas for a row set: explode the key
        structs, sum signs per (group…, counter key).  union→groupBy
        shape — partial aggregation map-side, one shuffle on the
        counter key, O(changes·depth + touched counters)."""
        return (
            rows.filter(F.col(self.value_col).isNotNull())
            .select(
                *self.group_cols,
                F.explode(self._fold_structs()).alias("__db"),
                sign.alias("__s"),
            )
            .select(
                *self.group_cols,
                *[f"__db.{k}" for k in self._COUNTER_KEYS],
                "__s",
            )
            .groupBy(*self.group_cols, *self._COUNTER_KEYS)
            .agg(F.sum("__s").cast("long").alias("cnt"))
        )

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Fold new commits into the counters; returns the applied seq.
        ONE code path for every slice shape — inserts, deletes, and
        update pre/postimages are all signed counter deltas (CM is
        linear; contrast MaintainedHLLSketch.refresh's recount arm)."""
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        if not src_m.get("cdf"):
            raise ValueError(
                f"table {source.root} has no change data feed "
                "(create(cdf=True))"
            )
        if not self.exists():
            counters = self._counters(
                self._sigma(
                    source._read_state(spark, src_m).select(
                        *self._source_cols()
                    )
                ),
                F.lit(1),
            ).filter(F.col("cnt") != 0)
            self._commit(
                counters,
                {
                    "version": 1,
                    "applied_seq": src_seq,
                    "depth": self.depth,
                    "width": self.width,
                    "where": self.where,
                    "group_cols": self.group_cols,
                    "value_col": self.value_col,
                    "folds": 0,
                    **self._extra_meta(),
                },
            )
            return src_seq
        meta = self.meta()
        self._check_extra_meta(meta)
        if (
            int(meta.get("depth", -1)) != self.depth
            or int(meta.get("width", -1)) != self.width
        ):
            raise ValueError(
                f"sketch at {self.root} was seeded with depth×width = "
                f"{meta.get('depth')}×{meta.get('width')}; constructed "
                f"with {self.depth}×{self.width} — the counter layout "
                "would split; rebuild instead"
            )
        if meta.get("where") != self.where:
            raise ValueError(
                f"sketch at {self.root} was seeded with where="
                f"{meta.get('where')!r}; constructed with {self.where!r}"
                " — rebuild instead of mixing filtered states"
            )
        if (
            meta.get("group_cols") != self.group_cols
            or meta.get("value_col") != self.value_col
        ):
            raise ValueError(
                f"sketch at {self.root} was seeded over "
                f"({meta.get('group_cols')}, {meta.get('value_col')}); "
                f"constructed over ({self.group_cols}, {self.value_col})"
                " — rebuild instead"
            )
        applied = meta["applied_seq"]
        if src_seq <= applied:
            return applied
        sl = self._sigma(
            source.changes(spark, since=applied, until=src_seq).select(
                *self._source_cols(), CHANGE_TYPE_COL
            )
        )
        sign = (
            F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
            .when(F.col(CHANGE_TYPE_COL).isin(*_SUB), F.lit(-1))
            .otherwise(F.lit(0))
        )
        deltas = self._counters(sl, sign)
        new = (
            self.read(spark)
            .unionByName(deltas)
            .groupBy(*self.group_cols, *self._COUNTER_KEYS)
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .filter(F.col("cnt") != 0)
        )
        meta = dict(meta)
        meta["version"] += 1
        meta["applied_seq"] = src_seq
        meta["folds"] = int(meta.get("folds", 0)) + 1

        # turnstile guard BETWEEN the parquet write and the meta swap:
        # a negative counter means a delete/preimage the sketch never
        # counted — upstream feed corruption, never a valid state.  One
        # state-sized scan of what was just written, same cost as the
        # old post-commit scan, but the tainted version is discarded
        # and the last GOOD version keeps serving (applied_seq does not
        # advance), so a caller that isolates the error — the
        # replicator poll loop does by design — never reads garbage.
        def _turnstile_guard(vdir) -> None:
            neg = (
                spark.read.parquet(str(vdir))
                .filter(F.col("cnt") < 0)
                .limit(1)
                .take(1)
            )
            if neg:
                raise ValueError(
                    f"sketch at {self.root} folded to a NEGATIVE "
                    f"counter (e.g. {neg[0].asDict()}) — the feed "
                    "deleted a row the sketch never counted (preimage "
                    "discipline violated upstream); the fold was "
                    "DISCARDED and the sketch still serves version "
                    f"{meta['version'] - 1}"
                )

        self._commit(new, meta, validate=_turnstile_guard)
        return src_seq

    def estimate(self, spark: SparkSession, probes: DataFrame) -> DataFrame:
        """Frequency estimates for probe rows: *probes* carries
        (group…, value_col) — one estimate per probe, computed as the
        MIN over the ``depth`` counters (absent counter ⇒ 0).  Pure
        integer algebra over the state — never reads the base table,
        and the whole answer is oracle-hashable.  Probe group keys must
        be non-NULL (the join is plain equality)."""
        return self._estimate_over(
            spark,
            self._value_grain(self.read(spark)),
            probes,
            self.group_cols,
        )

    def rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        """Counters ADDED to a coarser grain — linearity means the
        merged counters equal a direct coarse-grain build bit-for-bit
        (finer groups partition the σ-base and the hash ignores the
        group).  ``[]`` gives one global sketch."""
        subset = list(group_subset)
        missing = [g for g in subset if g not in self.group_cols]
        if missing:
            raise ValueError(
                f"rollup cols {missing!r} are not sketch group cols "
                f"{self.group_cols}"
            )
        return (
            self.read(spark)
            .groupBy(*subset, *self._COUNTER_KEYS)
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def estimate_rollup(
        self,
        spark: SparkSession,
        probes: DataFrame,
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`estimate` against :meth:`rollup` counters — *probes*
        carries (group_subset…, value_col)."""
        return self._estimate_over(
            spark,
            self._value_grain(self.rollup(spark, group_subset)),
            probes,
            list(group_subset),
        )

    def union_rollup(
        self,
        spark: SparkSession,
        other: "MaintainedCountMinSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """Counters ADDED across two maintained sketches — frequency
        estimates over the UNION (bag semantics) of two tables from
        their sketches alone.  Linearity across tables is the same
        argument as across groups: the summed counters equal a direct
        build over ``A ⊎ B`` bit-for-bit.  Requires identical
        depth×width (and the same hashing, which the shared md5 idiom
        guarantees); *group_subset* must be common to both."""
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError(
                f"cannot union sketches with different layouts: "
                f"{self.depth}×{self.width} vs {other.depth}×{other.width}"
            )
        a = self.rollup(spark, group_subset)
        b = other.rollup(spark, group_subset)
        subset = list(group_subset)
        return (
            a.unionByName(b)
            .groupBy(*subset, *self._COUNTER_KEYS)
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )

    def estimate_union(
        self,
        spark: SparkSession,
        other: "MaintainedCountMinSketch",
        probes: DataFrame,
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`estimate` against :meth:`union_rollup` counters."""
        return self._estimate_over(
            spark,
            self._value_grain(self.union_rollup(spark, other, group_subset)),
            probes,
            list(group_subset),
        )

    def heavy_hitters(
        self,
        spark: SparkSession,
        probes: DataFrame,
        min_count: int,
    ) -> DataFrame:
        """Probes whose estimate ≥ *min_count*.  CM never
        underestimates, so every TRUE heavy hitter among the probes
        survives (no false negatives); εN-rare false positives are the
        documented trade.

        This answers "is this value heavy?" — it cannot NAME the heavy
        values.  Candidate sources, by need: to enumerate WITHOUT any
        candidate set, maintain :class:`MaintainedCMHeavyHitters`
        (dyadic descent, non-negative BIGINT values); for arbitrary
        value types, the exact frequency tier's support store already
        names them (``distinct_matview`` ``top_values`` — O(distinct)
        state) and its output is a valid *probes* frame here."""
        return self.estimate(spark, probes).filter(
            F.col("est") >= F.lit(int(min_count))
        )

    def estimate_join_size(
        self,
        spark: SparkSession,
        other: "MaintainedCountMinSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """(group…, est_join_size) — the EQUI-JOIN CARDINALITY of the
        two sketched populations on the sketched key, from the counter
        states alone: ``min over depth of Σ_bucket cntA·cntB`` (the CM
        inner-product estimator, Cormode & Muthukrishnan §4.2).  True
        size Σ_v fA(v)·fB(v) ≤ estimate ≤ true + εNA·NB — never an
        underestimate, so a broadcast/shuffle planning decision made on
        it is safe in the expensive direction.  INTEGER-exact (products
        and sums of exact counters; the min is a BIGINT) — fully
        oracle-verifiable, unlike sampled join statistics.

        ``other`` may be ``self``: the SELF-join size Σ_v f(v)² is the
        second frequency moment F2 — the skew statistic that tells a
        planner whether the key needs salting before it pays for a
        shuffle (F2 ≫ N²/distinct ⇒ heavy keys dominate).

        Both sketches must share depth×width (bucket alignment comes
        from the shared md5+salt idiom).  Groups with no common
        non-zero bucket in some depth estimate 0 — correct, since a
        shared value would land both counters in its bucket — and a
        group present in only ONE sketch emits an explicit
        ``est_join_size = 0`` row (its join contributes nothing), so
        the output covers the UNION of both sketches' group keys.

        The inner product runs in ``decimal(38,0)`` (a product of two
        BIGINT counters can reach ~8.5×10³⁷, just inside 38 digits) and
        the result is guarded back into BIGINT with a runtime
        ``assert_true`` — an extreme-count sketch FAILS LOUDLY instead
        of wrapping into a small/negative estimate, preserving the
        never-an-underestimate planner-safety property."""
        if (other.depth, other.width) != (self.depth, self.width):
            raise ValueError(
                f"cannot combine sketches with different layouts: "
                f"{self.depth}×{self.width} vs {other.depth}×{other.width}"
            )
        subset = list(group_subset)
        a = self._value_grain(
            self.rollup(spark, subset)
        ).withColumnRenamed("cnt", "__ca")
        b = other._value_grain(
            other.rollup(spark, subset)
        ).withColumnRenamed("cnt", "__cb")
        per_depth = (
            a.join(b, [*subset, "depth", "bucket"])
            .groupBy(*subset, "depth")
            .agg(
                F.sum(
                    F.col("__ca").cast("decimal(38,0)") * F.col("__cb")
                ).alias("__s")
            )
        )
        # a depth with NO common non-zero bucket contributes sum 0 but
        # no row — the min must still see it (fewer than `depth` rows
        # present ⇒ some depth summed to zero ⇒ the estimate is 0).
        # __ovf: a per-depth decimal sum that overflowed 38 digits is
        # NULL (min would silently skip it) — asserted against below.
        per_group = per_depth.groupBy(*subset).agg(
            F.min("__s").alias("__m"),
            F.count(F.lit(1)).alias("__nd"),
            # coalesce: the GLOBAL aggregation of an empty per_depth
            # still emits its row (max of nothing = NULL, not overflow)
            F.coalesce(
                F.max(F.col("__s").isNull().cast("int")), F.lit(0)
            ).alias("__ovf"),
        )
        zero = F.lit(0).cast("long")
        # assert_true returns NULL on success and raises on violation;
        # referencing it inside the output expression keeps Catalyst
        # from pruning the check away
        chk = F.assert_true(
            (F.col("__ovf") == 0)
            & (
                (F.col("__nd") < self.depth)
                | (F.col("__m") <= F.lit((1 << 63) - 1).cast("decimal(38,0)"))
            ),
            F.lit(
                "CM join-size inner product exceeds BIGINT — the "
                "estimate would wrap; use wider/deeper sketches or "
                "estimate at a finer grain"
            ),
        )
        est = per_group.select(
            *subset,
            F.when(chk.isNull() & (F.col("__nd") < self.depth), zero)
            .otherwise(F.col("__m").cast("long"))
            .alias("est_join_size"),
        )
        if not subset:
            # the global aggregation always yields its one row (0 when
            # no bucket is shared)
            return est
        keys = (
            a.select(*subset).unionByName(b.select(*subset)).distinct()
        )
        return keys.join(est, subset, "left").select(
            *subset,
            F.coalesce(F.col("est_join_size"), zero).alias("est_join_size"),
        )

    def _estimate_over(
        self,
        spark: SparkSession,
        counters: DataFrame,
        probes: DataFrame,
        group_cols: list[str],
    ) -> DataFrame:
        probe_rows = probes.select(
            *group_cols,
            self.value_col,
            F.explode(self._depth_buckets()).alias("__db"),
        ).select(
            *group_cols, self.value_col, "__db.depth", "__db.bucket"
        )
        return (
            probe_rows.join(
                counters, [*group_cols, "depth", "bucket"], "left"
            )
            .groupBy(*group_cols, self.value_col)
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long")
                .alias("est")
            )
        )


def dyadic_cover(
    lo: int, hi: int, bits: int = 8, levels: int = 8
) -> list[tuple[int, int]]:
    """The canonical base-``2^bits`` dyadic cover of ``[lo, hi]``
    (inclusive, non-negative): the minimal list of (level, prefix)
    nodes — node (l, p) spans ``[p·2^(bits·l), (p+1)·2^(bits·l) − 1]``
    — whose DISJOINT union is exactly the range.  ≤ 2·(2^bits − 1)
    nodes per level: driver-sized for any range.  Pure integer
    algebra, reproduced verbatim by the SQL-oracle builder so both
    engines probe the identical node set."""
    if lo < 0 or hi < lo:
        raise ValueError(f"invalid range [{lo}, {hi}]")
    out: list[tuple[int, int]] = []
    lvl = 0
    while lo <= hi and lvl < levels - 1:
        sz = 1 << (bits * lvl)
        step = sz << bits
        while lo % step != 0 and lo + sz - 1 <= hi:
            out.append((lvl, lo >> (bits * lvl)))
            lo += sz
        while (hi + 1) % step != 0 and hi - sz + 1 >= lo:
            out.append((lvl, hi >> (bits * lvl)))
            hi -= sz
        if lo > hi:
            return out
        lvl += 1
    sz = 1 << (bits * lvl)
    p = lo
    while p <= hi:
        out.append((lvl, p >> (bits * lvl)))
        p += sz
    return out


class MaintainedCMHeavyHitters(MaintainedCountMinSketch):
    """Turnstile heavy-hitter ENUMERATION from maintained state — the
    capability the plain :class:`MaintainedCountMinSketch` is missing:
    its ``heavy_hitters(probes, T)`` answers "is this value heavy?" but
    cannot NAME the heavy values without a caller-supplied candidate
    set.  This subclass maintains the textbook turnstile answer — the
    DYADIC (hierarchical) Count-Min structure of Cormode &
    Muthukrishnan ("What's hot and what's not: tracking most frequent
    items dynamically", TODS 2005): one CM sketch per PREFIX LEVEL of
    the value, here the base-256 digit prefixes of a NON-NEGATIVE
    BIGINT value (8 levels × 8 bits cover the domain [0, 2^63); level
    L counts ``value >> 8L``).

    Everything the parent guarantees carries over unchanged, because a
    level is just one more counter-key column: folds stay LINEAR ±
    signed deltas (deletes and update preimages maintain exactly, no
    recount path), the crash-safe turnstile guard validates before the
    meta swap, rollups/unions add, and level 0 IS a plain CM over the
    raw values — ``estimate`` / ``heavy_hitters`` /
    ``estimate_join_size`` serve from it via ``_value_grain``.  State
    and fold cost are the parent's × LEVELS (8).

    :meth:`enumerate_heavy` then NAMES every value with frequency ≥ T
    by descending the prefix tree: probe the 128 top-level prefixes,
    expand each heavy prefix into its 256 children, repeat to level 0.
    CM never underestimates, and a value's count never exceeds its
    prefix's, so NO true heavy hitter can be pruned (no false
    negatives); εN-rare collision-driven false positives are the
    documented CM trade.  Candidate frames live in DataFrames end to
    end (no driver-side collect of candidates), per-level work is
    bounded by 256 · (prefixes with est ≥ T) ≤ 256 · N/T per group,
    and every probe reads only the k-counter STATE, never a base
    table.  The counter STATE itself — which every probe join already
    broadcast — is localized once per read under
    ``_SERVE_LOCAL_MAX_BYTES`` (see :meth:`_serve_counters`) so the
    descent plans as one exchange-free broadcast-join chain; past the
    cap the fully distributed shuffle shape serves unchanged.

    Cross-engine exact like its parent: prefixes are integer shifts
    (``//`` on a non-negative domain), buckets the shared md5+salt
    idiom — a DuckDB oracle rebuilds the whole dyadic structure and the
    descent bit-for-bit (eight chained CTEs; see
    entry_pipeline's ``pipeline_cms_heavy_hitters`` oracle).

    Reference parity: the reference defers "top values" questions to
    the warehouse (full GROUP BY per query); this answers them from
    O(levels·depth·width) maintained state per group."""

    _COUNTER_KEYS = ("level", "depth", "bucket")
    BRANCH_BITS = 8
    LEVELS = 8  # 8 × 8 bits = the full non-negative BIGINT domain
    _FANOUT = 1 << BRANCH_BITS

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        depth: int = 3,
        width: int = 2048,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        keep_versions: int = 1,
        levels: int | None = None,
        max_value: int | None = None,
    ):
        """*levels* (or a *max_value* domain bound it is derived from)
        trims the dyadic tree to the value domain: a column known to
        stay below ``2^(8·levels)`` pays ``levels`` counter rows and
        hash evaluations per change instead of the full 8 — at 100 TB
        ingest the per-merge fold cost scales LINEARLY with levels, so
        a quantity-like column (< 2^16) folds 4× cheaper at levels=2.
        The bound is persisted in the meta and layout-guarded like
        depth×width (mixing trees of different height would mis-shift
        every prefix); values past the bound are refused at fold time
        by the same assert that guards negatives."""
        super().__init__(
            root, group_cols, value_col, depth=depth, width=width,
            where=where, where_cols=where_cols,
            keep_versions=keep_versions,
        )
        if levels is not None and max_value is not None:
            raise ValueError("pass levels or max_value, not both")
        if max_value is not None:
            if int(max_value) < 0:
                raise ValueError(f"max_value must be ≥ 0, got {max_value}")
            levels = max(
                1,
                -(-int(max_value).bit_length() // self.BRANCH_BITS),
            )
        if levels is None:
            levels = type(self).LEVELS
        if not (1 <= int(levels) <= 8):
            raise ValueError(f"levels={levels} out of range [1, 8]")
        self.LEVELS = int(levels)  # instance bound shadows the class cap

    def _domain_bits(self) -> int:
        """Bits the dyadic tree covers: 8·levels, capped at 63 (the
        sign bit is excluded — the domain is non-negative)."""
        return min(63, self.BRANCH_BITS * self.LEVELS)

    def _top_bits(self) -> int:
        """The top level's prefix width: domain bits minus the bits the
        lower levels consume (7 for the full 8-level tree, 8 for any
        bounded tree)."""
        return self._domain_bits() - self.BRANCH_BITS * (self.LEVELS - 1)

    def _extra_meta(self) -> dict:
        return {"levels": self.LEVELS, "branch_bits": self.BRANCH_BITS}

    def _checked_value(self) -> F.Column:
        """The value as a guarded non-negative BIGINT inside the
        constructed domain bound [0, 2^(8·levels)): a negative or
        over-bound value raises at fold time (assert_true — referenced
        inside the projection so Catalyst keeps it) instead of silently
        shifting into a wrong prefix."""
        v = F.col(self.value_col).cast("long")
        hi = (1 << self._domain_bits()) - 1
        return F.when(
            F.assert_true(
                (v >= 0) & (v <= F.lit(hi)),
                F.lit(
                    f"{self.value_col} must be a non-negative BIGINT "
                    f"≤ {hi} (levels={self.LEVELS}) for dyadic "
                    "heavy-hitter enumeration"
                ),
            ).isNull(),
            v,
        )

    def _fold_structs(self) -> F.Column:
        v = self._checked_value()
        structs = []
        for lv in range(self.LEVELS):
            pfx = F.shiftright(v, self.BRANCH_BITS * lv) if lv else v
            for d in range(self.depth):
                structs.append(
                    F.struct(
                        F.lit(lv).cast("int").alias("level"),
                        F.lit(d).cast("int").alias("depth"),
                        cms_bucket_col(pfx, d, self.width).alias("bucket"),
                    )
                )
        return F.array(*structs)

    def _value_grain(self, counters: DataFrame) -> DataFrame:
        return counters.filter(F.col("level") == 0).drop("level")

    def _probe_prefixes(
        self, lvl_counters: DataFrame, cand: DataFrame, subset: list[str]
    ) -> DataFrame:
        """(group…, __pfx, est) — CM min-over-depth estimate of each
        candidate prefix against ONE level's counters."""
        db = F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("depth"),
                    cms_bucket_col(F.col("__pfx"), d, self.width).alias(
                        "bucket"
                    ),
                )
                for d in range(self.depth)
            ]
        )
        rows = cand.select(
            *subset, "__pfx", F.explode(db).alias("__db")
        ).select(*subset, "__pfx", "__db.depth", "__db.bucket")
        return (
            rows.join(lvl_counters, [*subset, "depth", "bucket"], "left")
            .groupBy(*subset, "__pfx")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long")
                .alias("est")
            )
        )

    def _descent_sql(
        self, texts: dict, groups_sql: str | None, subset: list,
        min_count: int,
    ) -> str:
        """The whole :meth:`enumerate_heavy` descent as ONE SQL
        statement over a localized state: per level, est is the
        constant-folded map-lookup LEAST (see _map_least_sql) computed
        while expanding the surviving prefixes — no join, no groupBy,
        no state scan, no per-level py4j plan assembly.  The statement
        is a narrow LocalRelation-seeded codegen chain: one parse, one
        job.  Semantics are the loop's, bit for bit: est = min over
        depth of COALESCE(cnt, 0); survive iff est ≥ min_count; expand
        each survivor into its fanout children."""
        g = lambda a: "".join(f"{a}.`{c}`, " for c in subset)  # noqa: E731
        gp = "".join(f"`{c}`, " for c in subset)
        lv0 = self.LEVELS - 1
        seed_from = (
            f"{groups_sql}, range({1 << self._top_bits()}) p, m"
            if subset
            else f"range({1 << self._top_bits()}) p, m"
        )
        ctes = [self._map_cte_sql(texts)]
        ctes.append(
            f"""s{lv0} AS (
  SELECT * FROM (
    SELECT {g('gr') if subset else ''}p.id AS pfx,
           {self._map_least_sql(lv0, 'p.id', 'gr' if subset else '', subset)} AS est
    FROM {seed_from}
  ) WHERE est >= {int(min_count)}
)"""
        )
        for lv in range(lv0 - 1, -1, -1):
            up = f"s{lv + 1}"
            child = f"{up}.pfx * {self._FANOUT} + o.id"
            ctes.append(
                f"""s{lv} AS (
  SELECT * FROM (
    SELECT {g(up)}{child} AS pfx,
           {self._map_least_sql(lv, f'({child})', up, subset)} AS est
    FROM {up}, range({self._FANOUT}) o, m
  ) WHERE est >= {int(min_count)}
)"""
            )
        return (
            "WITH "
            + ", ".join(ctes)
            + f"""
SELECT {gp}CAST(pfx AS BIGINT) AS `{self.value_col}`,
       CAST(est AS BIGINT) AS est
FROM s0
"""
        )

    def estimate_range(
        self,
        spark: SparkSession,
        ranges: Sequence[tuple[int, int]],
        group_subset: Sequence[str] | None = None,
    ) -> DataFrame:
        """(group…, lo, hi, est) — approximate COUNT of rows with
        ``lo ≤ value ≤ hi`` per group, from the dyadic state alone: the
        range decomposes into its canonical cover (:func:`dyadic_cover`,
        ≤ 2·255 nodes per level) and the answer is the SUM of each
        node's CM min-estimate at its level.  Never an underestimate
        (a sum of per-node overestimates), so a range-selectivity
        planning decision fails safe — the classic turnstile
        range-count read (Cormode & Muthukrishnan, TODS 2005 §4).
        *ranges* is driver-supplied (planner predicates); the node set
        is integer-exact, so a SQL oracle probing the same nodes
        hash-matches."""
        if not ranges:
            raise ValueError("ranges must be non-empty")
        subset = (
            list(self.group_cols)
            if group_subset is None
            else list(group_subset)
        )
        counters = (
            self.read(spark)
            if group_subset is None
            else self.rollup(spark, subset)
        )
        local_pdf = self._serve_pdf(
            None if group_subset is None else subset
        )
        rows = []
        bound = (1 << self._domain_bits()) - 1
        for lo, hi in ranges:
            lo_i, hi_i = int(lo), int(hi)
            if lo_i > bound:
                raise ValueError(
                    f"range [{lo_i}, {hi_i}] lies entirely past the "
                    f"domain bound {bound} (levels={self.LEVELS}) — "
                    "no value can exist there"
                )
            # mass past the bound is structurally zero (the fold guard
            # refuses such values), so the cover CLAMPS to the bound —
            # without it a bounded tree would enumerate a huge top level
            for lvl, pfx in dyadic_cover(
                lo_i, min(hi_i, bound), self.BRANCH_BITS, self.LEVELS
            ):
                rows.append((lo_i, hi_i, lvl, pfx))
        # a repeated (lo, hi) range replays its identical cover; the
        # grouped-min shape collapsed such duplicates, the flat SUM
        # below must not see them twice — dedupe once for both shapes
        rows = list(dict.fromkeys(rows))
        if local_pdf is not None:
            # localized state (see _serve_pdf): ONE SQL statement —
            # (groups × cover nodes) as VALUES, est per node as the
            # constant-folded map-lookup LEAST (see _map_least_sql),
            # one exchange for the final per-range sum — instead of a
            # distinct+crossJoin+explode+double-groupBy over repeated
            # state scans.  Identical algebra: min over depth of
            # COALESCE(cnt, 0), summed over the cover nodes.
            texts = self._counters_map_text(counters, local_pdf, subset)
            groups_sql = self._group_values_sql(
                counters, local_pdf, subset
            )
            if texts is not None and (not subset or groups_sql):
                g = lambda a: "".join(  # noqa: E731
                    f"{a}.`{c}`, " for c in subset
                )
                gp = "".join(f"`{c}`, " for c in subset)
                ndvals = ", ".join(
                    f"(CAST({lo} AS BIGINT), CAST({hi} AS BIGINT), "
                    f"CAST({lvl} AS INT), CAST({pfx} AS BIGINT))"
                    for lo, hi, lvl, pfx in rows
                )
                frm = (
                    f"{groups_sql}, (VALUES {ndvals})"
                    " AS nd(lo, hi, level, pfx), m"
                    if subset
                    else f"(VALUES {ndvals}) AS nd(lo, hi, level, pfx), m"
                )
                e = self._map_least_sql(
                    "nd.level", "nd.pfx", "gr" if subset else "", subset
                )
                return spark.sql(f"""
WITH {self._map_cte_sql(texts)}
SELECT {gp}lo, hi, CAST(SUM(e) AS BIGINT) AS est
FROM (
  SELECT {g('gr') if subset else ''}nd.lo, nd.hi, {e} AS e
  FROM {frm}
) GROUP BY {gp}lo, hi
""")
        nodes = spark.createDataFrame(
            rows, "lo long, hi long, level int, __pfx long"
        )
        cand = (
            counters.select(*subset).distinct().crossJoin(
                F.broadcast(nodes)
            )
            if subset
            else nodes
        )
        db = F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("depth"),
                    cms_bucket_col(F.col("__pfx"), d, self.width).alias(
                        "bucket"
                    ),
                )
                for d in range(self.depth)
            ]
        )
        probe = cand.select(
            *subset, "lo", "hi", "level", "__pfx",
            F.explode(db).alias("__db"),
        ).select(
            *subset, "lo", "hi", "level", "__pfx",
            "__db.depth", "__db.bucket",
        )
        node_est = (
            probe.join(
                counters, [*subset, "level", "depth", "bucket"], "left"
            )
            .groupBy(*subset, "lo", "hi", "level", "__pfx")
            .agg(
                F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                .cast("long")
                .alias("__node_est")
            )
        )
        return node_est.groupBy(*subset, "lo", "hi").agg(
            F.sum("__node_est").cast("long").alias("est")
        )

    def quantile_values(
        self,
        spark: SparkSession,
        qs_milli: Sequence[int],
        group_subset: Sequence[str] | None = None,
        hop_levels: int = 1,
    ) -> DataFrame:
        """(group…, q_milli, rank, total, value, est) — approximate
        per-group quantiles from the dyadic state, with NO bin-width
        choice and state independent of the value range (the complement
        of :class:`MaintainedQuantileHistogram`'s capped bins): the
        rank-R value is found by WALKING the prefix tree — each hop, a
        prefix-ordered cumulative sum over the children picks the child
        containing the remaining rank.  ``total`` is the top probe
        level's estimate sum, ``rank = max(1, ⌈q·total/1000⌉)``.
        Collision-free counters give the EXACT rank-R value; collisions
        shift mass by the usual εN.  Deterministic clamp rules (rank
        clamps into each hop's child total; an empty subtree descends
        leftmost) are mirrored by the SQL oracle, so the whole walk is
        hash-verifiable.

        Execution: the whole walk is emitted as ONE Spark-SQL statement
        over a temp view of the counter state.  The round-10 DataFrame
        loop paid ~2× the walk's execution time in per-call plan
        CONSTRUCTION alone (eager analysis of each of ~50 operators on
        a growing 8-hop tree); a single statement is parsed and
        analyzed once, and the executed plan is the same
        join+window-per-hop shape (probe frames stay distributed and
        state-sized — ≤ fanout·qs·groups rows per hop — and the top
        probe doubles as the totals read).  ``hop_levels=2`` descends
        16 bits per hop — fewer hops but 2^16-child expansions; the
        measured trade at sf0.1 was 3× worse, so 1 is the default.
        Never a base scan — every hop joins counter STATE only."""
        qs = [int(q) for q in qs_milli]
        if not qs or any(not (0 < q <= 1000) for q in qs):
            raise ValueError(
                f"qs_milli must be in (0, 1000], got {qs_milli}"
            )
        s = int(hop_levels)
        if not (1 <= s <= 2):
            raise ValueError(
                f"hop_levels must be 1 or 2, got {hop_levels} — a "
                "3-byte hop expands 2^24 children per pick"
            )
        if group_subset is None:
            subset = list(self.group_cols)
            counters = self.read(spark)
        else:
            subset = list(group_subset)
            counters = self.rollup(spark, subset)
        # localized state (see _serve_pdf): the walk's 22 counter-view
        # references collapse into ONE map literal + a VALUES group
        # seed — no scan, no join, no broadcast of state anywhere
        local_pdf = self._serve_pdf(
            None if group_subset is None else subset
        )
        local_map = (
            self._counters_map_text(counters, local_pdf, subset)
            if local_pdf is not None
            else None
        )
        groups_sql = (
            self._group_values_sql(counters, local_pdf, subset)
            if local_map is not None
            else None
        )
        if subset and local_map is not None and groups_sql is None:
            # a group tuple without a literal form (or an empty state)
            # would force a state-scan seed under a map-lookup walk —
            # mixed shape, keep the relational one instead
            local_map = None
        global _WALK_VIEW_SEQ
        _WALK_VIEW_SEQ += 1
        cv = f"cmhh_walk_counters_{_WALK_VIEW_SEQ}"
        counters.createOrReplaceTempView(cv)
        # the analyzer's fixed-point Resolution batch needs a few
        # passes PER chained-window CTE; the default 100 caps out
        # around 6 hops — one statement-sized bump, cheap and local
        spark.conf.set("spark.sql.analyzer.maxIterations", "1000")
        return spark.sql(
            self._walk_sql(
                cv, subset, qs, s,
                local_map=local_map, groups_sql=groups_sql,
            )
        )

    def _bucket_sql(self, value_expr: str, depth_expr: str) -> str:
        """Spark-SQL twin of :func:`cms_bucket_col` — the pinned
        md5-hex→long idiom (functions/dedup.py:65), salted with the
        hash-row index, mod width."""
        h = (
            f"CAST(conv(substring(md5(CAST({value_expr} AS STRING) || "
            f"'#' || CAST({depth_expr} AS STRING)), 1, 15), 16, 10) "
            f"AS BIGINT)"
        )
        return f"CAST({h} % {self.width} AS INT)"

    def _counters_map_text(
        self, counters: DataFrame, local_pdf, subset: list
    ):
        """The localized counter state rendered for ``str_to_map`` SQL
        literals: a dict keyed (level, depth) of
        ``bucket|hex(group)…:cnt`` pairs joined by ','.  One SMALL map
        per (level, depth) matters: Catalyst map literals answer
        ``element_at`` by LINEAR scan, so one flat map pays
        O(total counters) string compares per probe while the split
        pays O(counters at that level×depth) — 24× less for the full
        dyadic tree.  Group values are hex-of-UTF-8 so the text is
        pure ``[0-9A-F|,:]`` — no escaping, no delimiter collisions —
        and the probe side rebuilds the identical key with
        ``hex(CAST(CAST(g AS STRING) AS BINARY))``.  Returns None when
        a group column's type has no bit-stable Python↔Spark string
        form (only STRING and integer types are embedded — e.g. a
        boolean renders 'True' in Python but 'true' in Spark); the
        caller then keeps the relational shape.  NULL group values are
        omitted: an equality join never matched them, and the probe
        key is null-propagating, so both shapes agree."""
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType, StringType,
        )

        int_types = (ByteType, IntegerType, LongType, ShortType)
        kinds = {}
        for f in counters.schema.fields:
            if f.name not in subset:
                continue
            if isinstance(f.dataType, int_types):
                kinds[f.name] = "int"
            elif isinstance(f.dataType, StringType):
                kinds[f.name] = "str"
            else:
                return None
        parts: dict[tuple[int, int], list[str]] = {}
        for rd in local_pdf.to_dict("records"):
            gs = []
            skip = False
            for c in subset:
                v = rd[c]
                if v is None or (isinstance(v, float) and v != v):
                    skip = True
                    break
                s = str(int(v)) if kinds[c] == "int" else str(v)
                gs.append(s.encode("utf-8").hex().upper())
            if skip:
                continue
            key = str(int(rd["bucket"]))
            for h in gs:
                key += "|" + h
            parts.setdefault(
                (int(rd["level"]), int(rd["depth"])), []
            ).append(f"{key}:{int(rd['cnt'])}")
        return {k: ",".join(v) for k, v in parts.items()}

    def _group_values_sql(
        self, counters: DataFrame, local_pdf, subset: list
    ) -> str | None:
        """The distinct group tuples of a localized state rendered as
        an inline VALUES table (``(VALUES …) gr(cols…)``) so the walk's
        seed needs no state scan.  String values ride as
        ``CAST(unhex('…') AS STRING)`` — exact bytes, no escaping;
        integer types as plain literals.  None when empty, when a
        group carries NULL, or when a type has no literal form — the
        caller then seeds from the counter view as before."""
        from pyspark.sql.types import (
            ByteType, IntegerType, LongType, ShortType, StringType,
        )

        if not subset or local_pdf is None or len(local_pdf) == 0:
            return None
        sql_t = {
            ByteType: "TINYINT", ShortType: "SMALLINT",
            IntegerType: "INT", LongType: "BIGINT",
        }
        kinds = {}
        for f in counters.schema.fields:
            if f.name not in subset:
                continue
            if isinstance(f.dataType, StringType):
                kinds[f.name] = "str"
            elif type(f.dataType) in sql_t:
                kinds[f.name] = sql_t[type(f.dataType)]
            else:
                return None
        rows = []
        for t in (
            local_pdf[subset].drop_duplicates().itertuples(index=False)
        ):
            vals = []
            for c, v in zip(subset, t):
                if v is None or (isinstance(v, float) and v != v):
                    return None
                if kinds[c] == "str":
                    vals.append(
                        "CAST(unhex('"
                        + str(v).encode("utf-8").hex().upper()
                        + "') AS STRING)"
                    )
                else:
                    vals.append(f"CAST({int(v)} AS {kinds[c]})")
            rows.append("(" + ", ".join(vals) + ")")
        cols = ", ".join(f"`{c}`" for c in subset)
        return f"(VALUES {', '.join(rows)}) AS gr({cols})"

    def _map_cte_sql(self, texts: dict) -> str:
        """The counter maps as one one-row CTE ``m`` with a
        ``mp_<level>_<depth>`` column per (level, depth) slice — each
        a small ``str_to_map`` literal (see _counters_map_text for why
        the split matters)."""
        cols = []
        for lv in range(self.LEVELS):
            for d in range(self.depth):
                t = texts.get((lv, d))
                lit = (
                    f"str_to_map('{t}', ',', ':')"
                    if t
                    else "map('', '')"
                )
                cols.append(f"{lit} AS mp_{lv}_{d}")
        return f"m AS (SELECT {', '.join(cols)})"

    def _map_key_sql(self, d: int, pfx_expr: str, qual: str,
                     subset: list) -> str:
        """The lookup key one probe row builds against a (level, depth)
        counter map slice (see _counters_map_text — same field order
        and encoding): bucket|hex(group)… .  ``||`` is
        null-propagating concat, so a NULL group key yields a NULL key
        → NULL lookup → COALESCE 0, exactly the join-on-null miss the
        relational shape produced."""
        q = f"{qual}." if qual else ""
        key = f"CAST({self._bucket_sql(pfx_expr, str(d))} AS STRING)"
        for c in subset:
            key += (
                f" || '|' || hex(CAST(CAST({q}`{c}` AS STRING)"
                " AS BINARY))"
            )
        return key

    def _map_least_sql(self, lv_sql, pfx_expr: str, qual: str,
                       subset: list) -> str:
        """est = min over depth of COALESCE(cnt, 0), as a pure
        expression over the counter map slices — no join, no window.
        *lv_sql*: an int picks the slice statically (the descent knows
        its hop's level); a string is a per-row level column and
        dispatches over the ≤8 slices with a CASE."""
        parts = []
        for d in range(self.depth):
            if isinstance(lv_sql, int):
                mp = f"m.mp_{lv_sql}_{d}"
            else:
                arms = "".join(
                    f"WHEN {lv} THEN m.mp_{lv}_{d} "
                    for lv in range(self.LEVELS)
                )
                mp = f"CASE {lv_sql} {arms}END"
            parts.append(
                "COALESCE(CAST(element_at("
                f"{mp}, {self._map_key_sql(d, pfx_expr, qual, subset)}"
                ") AS BIGINT), 0)"
            )
        return f"LEAST({', '.join(parts)})" if self.depth > 1 else parts[0]

    def _walk_sql(
        self,
        cv: str,
        subset: list,
        qs: list,
        s: int,
        local_map: dict | None = None,
        groups_sql: str | None = None,
    ) -> str:
        """The rank-walk as one SQL statement (see quantile_values).

        *local_map* (set when the state passed the localization cap —
        see _serve_counters) is the counter state rendered as a
        ``str_to_map`` literal: every hop's min-over-depth estimate
        becomes a constant-folded MAP LOOKUP expression instead of a
        LEFT JOIN + min-window against the counter view — the
        statement loses all 22 state references, every broadcast
        exchange, and a third of its window operators, which is where
        the walk's wall-time actually went (driver-side planning and
        broadcast orchestration of a ~60-exchange plan; the executed
        work was milliseconds).  None keeps the relational shape: a
        distributed state wants per-level pushed scans."""
        top = ((self.LEVELS - 1) // s) * s
        top_n = 1 << (self._domain_bits() - self.BRANCH_BITS * top)
        fanout = 1 << (self.BRANCH_BITS * s)
        g = lambda a: "".join(f"{a}.`{c}`, " for c in subset)  # noqa: E731
        gp = "".join(f"`{c}`, " for c in subset)
        gjoin = "".join(f" AND c.`{c}` = b.`{c}`" for c in subset)
        part = (gp + "q_milli").rstrip()
        pick = (
            "CASE WHEN tc > 0 AND cum >= LEAST(R, tc) THEN 0 ELSE 1 END"
        )
        if local_map is not None:
            # the map literals live in ONE one-row CTE (a column per
            # (level, depth) slice); every hop cross-joins it (a
            # jobless 1-row broadcast) and looks its slice up by name
            mcte = f"{self._map_cte_sql(local_map)}, "
            seed = (
                f"SELECT {g('gr')}p.id AS pfx\n"
                f"        FROM {groups_sql}, range({top_n}) p"
                if subset
                else f"SELECT p.id AS pfx FROM range({top_n}) p"
            )
            tops = f"""{mcte}tops AS (
  SELECT {g('b')}b.pfx,
         {self._map_least_sql(top, 'b.pfx', 'b', subset)} AS e
  FROM ({seed}) b, m
)"""
        else:
            seed = (
                f"SELECT {g('gr')}p.id AS pfx, t.id AS depth,\n"
                f"               {self._bucket_sql('p.id', 't.id')} AS bucket\n"
                f"        FROM (SELECT DISTINCT"
                f" {gp.rstrip(', ') or '1 AS one'}"
                f" FROM {cv}) gr, range({top_n}) p, range({self.depth}) t"
                if subset
                else
                f"SELECT p.id AS pfx, t.id AS depth,\n"
                f"               {self._bucket_sql('p.id', 't.id')} AS bucket\n"
                f"        FROM range({top_n}) p, range({self.depth}) t"
            )
            tops = f"""tops AS (
  SELECT {g('b')}b.pfx, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS e
  FROM ({seed}) b
  LEFT JOIN {cv} c ON c.level = {top} AND c.depth = b.depth
       AND c.bucket = b.bucket{gjoin}
  GROUP BY {g('b')}b.pfx
)"""
        hops = []
        for lv in range(top - s, -1, -s):
            child = f"w{lv + s}.pfx * {fanout} + o.id"
            if local_map is not None:
                e_blk = f"""e{lv} AS (
  SELECT {g('b')}b.q_milli, b.rank, b.total, b.R, b.pfx,
         {self._map_least_sql(lv, 'b.pfx', 'b', subset)} AS e
  FROM (SELECT {g(f'w{lv + s}')}w{lv + s}.q_milli, w{lv + s}.rank,
               w{lv + s}.total, w{lv + s}.R,
               {child} AS pfx
        FROM w{lv + s}, range({fanout}) o) b, m
)"""
            else:
                # min-over-depth as a WINDOW over (part, pfx) instead
                # of a GROUP BY: (part) hash-partitioning from the
                # previous hop's pick window SATISFIES it (superset
                # keys), so with the counter slice broadcast every hop
                # below the first is partition-local sorts — no
                # per-hop exchange
                e_blk = f"""e{lv} AS (
  SELECT {gp}q_milli, rank, total, R, pfx, e
  FROM (
    SELECT {g('b')}b.q_milli, b.rank, b.total, b.R, b.pfx, b.depth,
           MIN(CAST(COALESCE(c.cnt, 0) AS BIGINT)) OVER (
             PARTITION BY {g('b')}b.q_milli, b.pfx) AS e
    FROM (SELECT {g(f'w{lv + s}')}w{lv + s}.q_milli, w{lv + s}.rank,
                 w{lv + s}.total, w{lv + s}.R,
                 {child} AS pfx, t.id AS depth,
                 {self._bucket_sql(f'({child})', 't.id')} AS bucket
          FROM w{lv + s}, range({fanout}) o, range({self.depth}) t) b
    LEFT JOIN {cv} c ON c.level = {lv} AND c.depth = b.depth
         AND c.bucket = b.bucket{gjoin}
  ) WHERE depth = 0
)"""
            hops.append(f"""{e_blk}, w{lv} AS (
  SELECT {gp}q_milli, rank, total, pfx, e,
         CASE WHEN tc > 0 THEN CAST(LEAST(R, tc) - cum + e AS BIGINT)
              ELSE CAST(1 AS BIGINT) END AS R
  FROM (
    SELECT *, row_number() OVER (PARTITION BY {part}
        ORDER BY {pick}, pfx) AS rn
    FROM (
      SELECT *,
             SUM(e) OVER (PARTITION BY {part} ORDER BY pfx) AS cum,
             SUM(e) OVER (PARTITION BY {part}) AS tc
      FROM e{lv}
    )
  ) WHERE rn = 1
)""")
        return f"""
WITH {tops}, totals AS (
  SELECT {gp}CAST(SUM(e) AS BIGINT) AS total FROM tops
  {('GROUP BY ' + gp.rstrip(', ')) if subset else ''}
), qsv (q_milli) AS (
  VALUES {", ".join(f"(CAST({q} AS BIGINT))" for q in qs)}
), st AS (
  SELECT {g('t')}q.q_milli, t.total,
         GREATEST(CAST(1 AS BIGINT),
                  CAST((q.q_milli * t.total + 999) DIV 1000 AS BIGINT))
           AS rank
  FROM totals t, qsv q
), w{top} AS (
  SELECT {gp}q_milli, rank, total, pfx, e,
         CASE WHEN tc > 0 THEN CAST(LEAST(R, tc) - cum + e AS BIGINT)
              ELSE CAST(1 AS BIGINT) END AS R
  FROM (
    SELECT *, row_number() OVER (PARTITION BY {part}
        ORDER BY {pick}, pfx) AS rn
    FROM (
      SELECT /*+ BROADCAST(s) */
             {g('s')}s.q_milli, s.rank, s.total, s.rank AS R,
             n.pfx, n.e,
             SUM(n.e) OVER (PARTITION BY {g('s')}s.q_milli
                            ORDER BY n.pfx) AS cum,
             SUM(n.e) OVER (PARTITION BY {g('s')}s.q_milli) AS tc
      FROM st s JOIN tops n
        ON {" AND ".join(f"n.`{c}` = s.`{c}`" for c in subset) or "true"}
    )
  ) WHERE rn = 1
){(", " + ", ".join(hops)) if hops else ""}
SELECT {gp}q_milli, rank, total, CAST(pfx AS BIGINT) AS value,
       CAST(e AS BIGINT) AS est
FROM w0
"""

    def enumerate_heavy_union(
        self,
        spark: SparkSession,
        other: "MaintainedCMHeavyHitters",
        min_count: int,
        group_subset: Sequence[str],
    ) -> DataFrame:
        """:meth:`enumerate_heavy` over the BAG UNION of two maintained
        populations, from their states alone — linearity again: the
        summed dyadic counters equal a direct build over ``A ⊎ B``, so
        the descent names every value heavy ACROSS the two tables even
        when it is heavy in neither alone."""
        return self.enumerate_heavy(
            spark,
            min_count,
            group_subset,
            _counters=self.union_rollup(spark, other, group_subset),
        )

    def enumerate_heavy(
        self,
        spark: SparkSession,
        min_count: int,
        group_subset: Sequence[str] | None = None,
        _counters: DataFrame | None = None,
        max_candidates: int | None = None,
    ) -> DataFrame:
        """(group…, value, est) — every value whose CM estimate ≥
        *min_count*, named by top-down dyadic descent.  Pass
        *group_subset* to enumerate against rolled-up counters
        (``[]`` = one global population).  Superset guarantee: every
        value with TRUE frequency ≥ min_count appears; est is its CM
        (never-under) estimate at level 0.

        A tiny *min_count* legitimately expands the frontier toward
        ``fanout · N/min_count`` candidates per level; *max_candidates*
        (opt-in) bounds that: each level's surviving-prefix count is
        checked before expansion and a frontier that would exceed the
        cap refuses loudly with the measured count, so a bad threshold
        fails fast instead of exploding a stage.  The check is one
        state-sized count action per level — default None keeps the
        descent a single lazy plan."""
        if int(min_count) < 1:
            raise ValueError(
                f"min_count must be ≥ 1, got {min_count} — every value "
                "would enumerate"
            )
        if max_candidates is not None and int(max_candidates) < self._FANOUT:
            raise ValueError(
                f"max_candidates must be ≥ fanout ({self._FANOUT}), "
                f"got {max_candidates}"
            )
        local_pdf = None
        if _counters is not None:
            subset = list(group_subset or [])
            counters = _counters
        elif group_subset is None:
            subset = list(self.group_cols)
            counters = self.read(spark)
            local_pdf = self._serve_pdf(None)
        else:
            subset = list(group_subset)
            counters = self.rollup(spark, subset)
            local_pdf = self._serve_pdf(subset)
        # localized state + no candidate cap: the whole descent is ONE
        # SQL statement over map literals + a VALUES seed (_descent_sql)
        if local_pdf is not None and max_candidates is None:
            texts = self._counters_map_text(counters, local_pdf, subset)
            groups_sql = self._group_values_sql(
                counters, local_pdf, subset
            )
            if texts is not None and (not subset or groups_sql):
                return spark.sql(
                    self._descent_sql(
                        texts, groups_sql, subset, int(min_count)
                    )
                )
        # distributed shape: per-level state-sized join+agg hops
        # seed: every (group, top-level prefix).  The top level's
        # prefix domain is 7 bits (128 candidates) for the full 8-level
        # tree, 8 bits (256) for a domain-bounded one.
        prefixes = spark.range(1 << self._top_bits()).select(
            F.col("id").cast("long").alias("__pfx")
        )
        cand = (
            counters.select(*subset).distinct().crossJoin(
                F.broadcast(prefixes)
            )
            if subset
            else prefixes
        )
        for lv in range(self.LEVELS - 1, -1, -1):
            est = self._probe_prefixes(
                counters.filter(F.col("level") == lv).drop("level"),
                cand,
                subset,
            )
            surv = est.filter(F.col("est") >= F.lit(int(min_count)))
            if lv == 0:
                return surv.select(
                    *subset,
                    F.col("__pfx").alias(self.value_col),
                    "est",
                )
            if max_candidates is not None:
                n_surv = surv.count()
                if n_surv * self._FANOUT > int(max_candidates):
                    raise ValueError(
                        f"enumerate_heavy(min_count={min_count}) at "
                        f"level {lv}: {n_surv} surviving prefixes would "
                        f"expand to {n_surv * self._FANOUT} candidates "
                        f"> max_candidates={max_candidates} — raise "
                        "min_count (or the cap)"
                    )
            # expand each heavy prefix into its 256 children — the
            # whole descent stays ONE lazy plan (8 state-sized
            # join+agg hops, never a base scan); levels are few and
            # bounded, so no checkpointing is needed to keep it flat
            cand = surv.select(
                *subset,
                F.explode(
                    F.sequence(
                        F.col("__pfx") * F.lit(self._FANOUT).cast("long"),
                        F.col("__pfx") * F.lit(self._FANOUT).cast("long")
                        + F.lit(self._FANOUT - 1).cast("long"),
                    )
                ).alias("__pfx"),
            )
        raise AssertionError("unreachable: LEVELS ≥ 1")


class MaintainedStringHeavyHitters(MaintainedCMHeavyHitters):
    """Heavy-hitter ENUMERATION over a STRING column — tokens, URLs,
    n-grams, document fingerprints: the asks an LLM-data pipeline
    actually has, which the BIGINT-only dyadic tree cannot serve.
    The missing piece is an ORDER-preserving numeric embedding of the
    value domain; this class maintains one as derived state — a
    value ↔ dense-id DICTIONARY folded from the same change feed —
    and runs the parent's dyadic Count-Min over the dense id.

    Dictionary contract (the part that keeps everything exact and
    oracle-reproducible):

    - APPEND-ONLY: a value's id never changes and is never reused, so
      counters folded against any dict version stay valid forever and
      a NEWER dictionary decodes any OLDER pinned sketch version.
    - DETERMINISTIC: each refresh assigns the slice's first-seen values
      ``max_id + rank-by-value`` (binary string order, the collation
      Spark and DuckDB share) — a SQL oracle replaying the slices
      rebuilds the identical mapping, so the whole read is
      hash-verifiable like the parent's.
    - DISTRIBUTED assignment: rank-by-value is computed as
      range-partition → per-partition row_number + driver-side prefix
      offsets (the offsets collect is ≤ shuffle-partitions rows,
      metadata-sized) — no single-partition global window, so a
      100 TB initial fold assigns billions of ids without a hot task.
    - Dict state is O(distinct values ever seen) (value, id) pairs —
      the honest cost of NAMING strings; the counters stay fixed-size.
      Default ``levels=4`` bounds ids to 2^32 and pays 4 fold levels
      (see the parent's levels knob); the dict commit refuses to cross
      the bound loudly.

    Crash ordering: the dictionary commits BEFORE the sketch fold.  A
    crash in between leaves orphan dict entries, which are harmless
    (append-only; the replayed slice re-finds them via anti-join and
    assigns nothing new), so the pair needs no cross-commit atomicity.

    Reference parity: the reference defers "top values" questions to
    the warehouse (full GROUP BY per query, cmd/core.go:183-220 only
    replicates rows); this answers them from maintained state."""

    _DICT_VALUE = "__dict_value"
    _ID = "__vid"

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        depth: int = 3,
        width: int = 2048,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        keep_versions: int = 1,
        levels: int = 4,
    ):
        super().__init__(
            root, group_cols, self._ID, depth=depth, width=width,
            where=where, where_cols=where_cols,
            keep_versions=keep_versions, levels=levels,
        )
        self.string_col = value_col
        self.dict_root = Path(root) / "dict"

    def _extra_meta(self) -> dict:
        return {**super()._extra_meta(), "string_col": self.string_col}

    def _source_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                self.group_cols + [self.string_col] + self.where_cols
            )
        )

    # -- the maintained dictionary ----------------------------------------
    def _dict_meta_path(self) -> Path:
        return self.dict_root / "_meta.json"

    def dict_meta(self) -> dict:
        return json.loads(self._dict_meta_path().read_text())

    def read_dict(self, spark: SparkSession) -> DataFrame:
        """(value, id) — the current dictionary (decodes EVERY sketch
        version, past and pinned: ids are append-only)."""
        return spark.read.parquet(
            str(self.dict_root / f"v={self.dict_meta()['version']}")
        )

    def _fold_dict(self, spark: SparkSession, rows: DataFrame) -> None:
        """Assign dense ids to the slice's first-seen values and commit
        dict v+1; no-op (no commit) when the slice brings nothing new.
        O(changes) work + one metadata-sized offsets collect."""
        from pyspark.sql import Window

        vals = (
            rows.filter(F.col(self.string_col).isNotNull())
            .select(F.col(self.string_col).alias(self._DICT_VALUE))
            .distinct()
        )
        if self._dict_meta_path().exists():
            dm = self.dict_meta()
            cur = self.read_dict(spark)
            vals = vals.join(cur, [self._DICT_VALUE], "left_anti")
        else:
            dm = {"version": 0, "max_id": 0}
            cur = None
        # distributed rank-by-value: range partitions are value-ordered,
        # so global rank = per-partition row_number + the preceding
        # partitions' counts (a ≤ n_partitions driver collect)
        n_part = max(2, spark.sparkContext.defaultParallelism)
        part = vals.repartitionByRange(n_part, self._DICT_VALUE).withColumn(
            "__pid", F.spark_partition_id()
        )
        counts = {
            r["__pid"]: r["n"]
            for r in part.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_new = sum(counts.values())
        if not n_new:
            return
        offs, acc = [], 0
        for pid in sorted(counts):
            offs.append((pid, acc))
            acc += counts[pid]
        max_id = int(dm["max_id"])
        if max_id + n_new > (1 << self._domain_bits()) - 1:
            raise ValueError(
                f"dictionary at {self.dict_root} would grow past the "
                f"dyadic domain bound 2^{self._domain_bits()} "
                f"({max_id} + {n_new} new values) — rebuild with more "
                "levels"
            )
        offdf = spark.createDataFrame(offs, "__pid int, __off long")
        w = Window.partitionBy("__pid").orderBy(self._DICT_VALUE)
        fresh = (
            part.withColumn("__rn", F.row_number().over(w).cast("long"))
            .join(F.broadcast(offdf), ["__pid"])
            .select(
                self._DICT_VALUE,
                (F.lit(max_id) + F.col("__off") + F.col("__rn")).alias(
                    self._ID
                ),
            )
        )
        new_dict = cur.unionByName(fresh) if cur is not None else fresh
        version = int(dm["version"]) + 1
        new_dict.write.mode("overwrite").parquet(
            str(self.dict_root / f"v={version}")
        )
        fd, tmp = tempfile.mkstemp(dir=self.dict_root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"version": version, "max_id": max_id + n_new}, f)
        os.replace(tmp, self._dict_meta_path())
        for pth in self.dict_root.glob("v=*"):
            if int(pth.name.split("=", 1)[1]) < version:
                shutil.rmtree(pth, ignore_errors=True)

    def _counters(self, rows: DataFrame, sign: F.Column) -> DataFrame:
        """Dict fold first (append-only, crash-safe ordering), then the
        parent's signed dyadic fold over the mapped dense ids."""
        spark = rows.sparkSession
        self._fold_dict(spark, rows)
        mapped = rows.filter(F.col(self.string_col).isNotNull()).join(
            self.read_dict(spark),
            rows[self.string_col] == F.col(self._DICT_VALUE),
        ).drop(self._DICT_VALUE)
        return super()._counters(mapped, sign)

    # -- reads --------------------------------------------------------------
    def enumerate_heavy_values(
        self,
        spark: SparkSession,
        min_count: int,
        group_subset: Sequence[str] | None = None,
        max_candidates: int | None = None,
    ) -> DataFrame:
        """(group…, <value_col>, est) — every STRING value whose CM
        estimate ≥ *min_count*, named by the parent's dyadic descent
        over dense ids and decoded through the dictionary (a state ⋈
        state join; never a base scan).  Same superset guarantee as the
        parent; a collision-born phantom id that names no dictionary
        entry drops out of the decode join — the dictionary tightens
        the false-positive story for free."""
        subset = (
            list(self.group_cols)
            if group_subset is None
            else list(group_subset)
        )
        ids = self.enumerate_heavy(
            spark, min_count, group_subset, max_candidates=max_candidates
        )
        return ids.join(self.read_dict(spark), [self._ID]).select(
            *subset,
            F.col(self._DICT_VALUE).alias(self.string_col),
            "est",
        )

    def estimate_values(
        self, spark: SparkSession, probes: DataFrame
    ) -> DataFrame:
        """Frequency estimates for STRING probe rows (group…,
        <value_col>) — probes outside the dictionary were never counted
        and estimate 0 exactly."""
        mapped = probes.join(
            self.read_dict(spark),
            probes[self.string_col] == F.col(self._DICT_VALUE),
            "left",
        ).drop(self._DICT_VALUE)
        present = mapped.filter(F.col(self._ID).isNotNull())
        absent = mapped.filter(F.col(self._ID).isNull())
        est = self.estimate(
            spark, present.drop(self.string_col)
        ).join(
            self.read_dict(spark), [self._ID]
        ).select(
            *self.group_cols,
            F.col(self._DICT_VALUE).alias(self.string_col),
            "est",
        )
        return est.unionByName(
            absent.select(
                *self.group_cols,
                self.string_col,
                F.lit(0).cast("long").alias("est"),
            )
        )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch — the SET-ALGEBRA member of the
# approximate-distinct family.  HLL registers merge by max, which is a
# UNION — they cannot answer "how many values do A and B share".  A KMV
# sketch keeps the k smallest distinct hash values per group; because
# the k-min of a union is the k-min of the union of k-mins, two
# sketches combine into the union sketch exactly, and the classic
# theta-sketch argument (Beyer et al., SIGMOD'07; Dasgupta et al.,
# Theta Sketch Framework, 2016) turns the overlap below the union's
# k-th value into an INTERSECTION estimate — a capability neither the
# exact support store (which would need both bases co-scanned) nor HLL
# has.  Same engineering contract as the HLL tier: the state is the
# md5-hex→60-bit-int idiom (functions/dedup.py:55), so the stored
# hashes — and therefore n_hashes and theta — are CROSS-ENGINE EXACT,
# and the estimators divide exactly-computed integers with literal
# double numerators embedded identically in both engines.
#
# Estimator (hash domain [0, 2^60)): with K stored hashes and
# theta = the K-th smallest,
#   K < k  → the sketch holds EVERY distinct hash; estimate = K, exact.
#   K = k  → est_raw = (k−1)·2^60 / theta   (unbiased, Beyer et al. §3)
# Intersection of sketches A, B (per group): U = k-min of (A ∪ B),
# theta_u = max(U); rho = |{h : h ∈ A ∩ B, h ≤ theta_u}|;
#   |U| < k → both sketches are complete sets → rho IS the exact count;
#   else    → est = (rho/k) · est_union = rho·(k−1)·2^60 / theta_u / k.
#
# Maintenance mirrors HLL: the k-min set is MONOTONE under inserts
# (fold = union ∪ current, keep k smallest — O(changes + k·groups));
# a delete may evict a stored hash whose successor was discarded, so a
# delete-bearing slice triggers the GROUP-SCOPED recount (only groups
# whose slice carries _SUB rows rescan the σ-base; untouched groups'
# hash sets pass through).
#
# Reference parity: the reference defers distinct-set overlap questions
# to the warehouse entirely (a full double scan per query); this
# answers them from two maintained k-row states.
# ---------------------------------------------------------------------------
_KMV_DOMAIN = 1 << 60  # md5_long(col, 15) is uniform on [0, 2^60)


def kmv_numerator(k: int) -> float:
    """``(k−1)·2^60`` as ONE double — embed ``repr()`` of this value in
    both engines' expressions so est_raw is the same IEEE arithmetic."""
    return float((k - 1) * _KMV_DOMAIN)


def kmv_hash_sql(value_col: str) -> str:
    """DuckDB twin of the Spark-side ``md5_long(col.cast("string"))``
    hash — the shared first-15-md5-hex-digits→BIGINT idiom."""
    return f"('0x'||substr(md5(CAST({value_col} AS VARCHAR)),1,15))::BIGINT"


class MaintainedKMVSketch(SeqVersionedState):
    """Per-group k-minimum-values sketch maintained from a
    ManagedTable's feed under the single-table derived protocol
    (``exists()`` / ``refresh(spark, table)``).  State: (group…, h) —
    the k smallest distinct 60-bit hashes of *value_col* per group
    (ALL distinct hashes while a group has fewer than k)."""

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        value_col: str,
        k: int = 256,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
        keep_versions: int = 1,
    ):
        if k < 2:
            raise ValueError(f"k={k} out of range (need k >= 2)")
        self.keep_versions = max(1, int(keep_versions))
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.k = int(k)
        self.where = where
        self.where_cols = list(where_cols or [])
        if self.where_cols and not where:
            raise ValueError("where_cols given without a where predicate")

    # -- meta (same crash contract as MaintainedAggregate) ----------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def read(self, spark: SparkSession) -> DataFrame:
        """The hash table: (group…, h) — ≤ k rows per group."""
        return spark.read.parquet(str(self.root / f"v={self.meta()['version']}"))

    def _commit(self, hashes: DataFrame, meta: dict) -> None:
        hashes.write.mode("overwrite").parquet(
            str(self.root / f"v={meta['version']}")
        )
        self.root.mkdir(parents=True, exist_ok=True)
        self._record_seq_version(meta)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())
        retained = self._retained_versions(meta)
        for pth in self.root.glob("v=*"):
            v = int(pth.name.split("=", 1)[1])
            if v < meta["version"] and v not in retained:
                shutil.rmtree(pth, ignore_errors=True)

    def _source_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                self.group_cols + [self.value_col] + self.where_cols
            )
        )

    def _kmin(self, hashed: DataFrame, group_cols: list[str]) -> DataFrame:
        """The k smallest DISTINCT h per group.  Grouped: one
        group-keyed exchange — the distinct collapses map-side
        (partial aggregate), then a group-partitioned sort ranks (the
        same shuffle shape an exact COUNT(DISTINCT) pays, k rows/group
        out).  GLOBAL (no group cols): sort+limit compiles to
        TakeOrderedAndProject — each task keeps its local k smallest
        and the driver merges k-sized heaps, so a 100 TB build never
        funnels the full distinct set through one task."""
        if not group_cols:
            return hashed.select("h").distinct().orderBy("h").limit(self.k)
        from pyspark.sql import Window

        w = Window.partitionBy(*group_cols).orderBy("h")
        return (
            hashed.select(*group_cols, "h")
            .distinct()
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= self.k)
            .drop("__rn")
        )

    def _hashes(self, rows: DataFrame) -> DataFrame:
        return self._kmin(
            rows.filter(F.col(self.value_col).isNotNull()).select(
                *self.group_cols,
                md5_long(F.col(self.value_col).cast("string")).alias("h"),
            ),
            self.group_cols,
        )

    def _sigma(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.where)) if self.where else df

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Fold new commits into the k-min sets; returns the applied
        seq.  Insert-only slices fold by k-min-merge (O(changes +
        k·groups)); a slice carrying deletes triggers the group-scoped
        recount (a stored hash may be evicted and its successor was
        never kept)."""
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        if not src_m.get("cdf"):
            raise ValueError(
                f"table {source.root} has no change data feed (create(cdf=True))"
            )
        if not self.exists():
            hashes = self._hashes(
                self._sigma(
                    source._read_state(spark, src_m).select(
                        *self._source_cols()
                    )
                )
            )
            self._commit(
                hashes,
                {
                    "version": 1,
                    "applied_seq": src_seq,
                    "k": self.k,
                    "where": self.where,
                    "group_cols": self.group_cols,
                    "value_col": self.value_col,
                    "recounts": 0,
                },
            )
            return src_seq
        meta = self.meta()
        if int(meta.get("k", -1)) != self.k:
            raise ValueError(
                f"sketch at {self.root} was seeded with k={meta.get('k')}; "
                f"constructed with {self.k} — the retained-hash contract "
                "would split; rebuild instead"
            )
        if meta.get("where") != self.where:
            raise ValueError(
                f"sketch at {self.root} was seeded with where="
                f"{meta.get('where')!r}; constructed with {self.where!r} — "
                "rebuild instead of mixing filtered states"
            )
        if (
            meta.get("group_cols") != self.group_cols
            or meta.get("value_col") != self.value_col
        ):
            raise ValueError(
                f"sketch at {self.root} was seeded over "
                f"({meta.get('group_cols')}, {meta.get('value_col')}); "
                f"constructed over ({self.group_cols}, {self.value_col}) — "
                "rebuild instead"
            )
        applied = meta["applied_seq"]
        if src_seq <= applied:
            return applied
        sl = self._sigma(
            source.changes(spark, since=applied, until=src_seq).select(
                *self._source_cols(), CHANGE_TYPE_COL
            )
        )
        has_sub = bool(
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_SUB)).limit(1).take(1)
        )
        meta = dict(meta)
        meta["version"] += 1
        meta["applied_seq"] = src_seq
        if has_sub:
            meta["recounts"] = int(meta.get("recounts", 0)) + 1
            hashes = self._recount(spark, source, src_m, sl)
        else:
            adds = self._hashes(
                sl.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD)).drop(
                    CHANGE_TYPE_COL
                )
            )
            hashes = self._kmin(
                self.read(spark).unionByName(adds), self.group_cols
            )
        self._commit(hashes, meta)
        return src_seq

    def _recount(
        self,
        spark: SparkSession,
        source: ManagedTable,
        src_m: dict,
        sl: DataFrame,
    ) -> DataFrame:
        """GROUP-SCOPED k-min recount for a delete-bearing slice — the
        same discipline as MaintainedHLLSketch._recount: only groups
        whose slice carries ``_SUB`` rows rebuild from the σ-base
        (literal-IN pruned, broadcast-semi past DIRTY_LITERAL_CAP);
        untouched groups' hash sets pass through, with the slice's ADD
        rows for those groups folded by k-min-merge (exact: the set is
        monotone under inserts)."""
        base = self._sigma(
            source._read_state(spark, src_m).select(*self._source_cols())
        )
        if not self.group_cols:
            return self._hashes(base)
        sub_keys = (
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_SUB))
            .select(*self.group_cols)
            .distinct()
        )
        adds = self._hashes(
            sl.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD)).drop(
                CHANGE_TYPE_COL
            )
        )
        cur = self.read(spark)
        rows = sub_keys.limit(DIRTY_LITERAL_CAP + 1).collect()
        if len(rows) <= DIRTY_LITERAL_CAP:
            box = literal_group_box(rows, self.group_cols, dict(base.dtypes))
            kept = cur.filter(~F.coalesce(box, F.lit(False)))
            recount = self._hashes(base.filter(box))
            add_kept = adds.filter(~F.coalesce(box, F.lit(False)))
        else:
            kept = cur.alias("__c").join(
                F.broadcast(sub_keys.alias("__k")),
                nullsafe_group_eq("__c", "__k", self.group_cols),
                "left_anti",
            )
            recount = self._hashes(
                base.alias("__b").join(
                    F.broadcast(sub_keys.alias("__k")),
                    nullsafe_group_eq("__b", "__k", self.group_cols),
                    "left_semi",
                )
            )
            add_kept = adds.alias("__a").join(
                F.broadcast(sub_keys.alias("__k")),
                nullsafe_group_eq("__a", "__k", self.group_cols),
                "left_anti",
            )
        return self._kmin(
            kept.unionByName(add_kept), self.group_cols
        ).unionByName(recount)

    # -- reads -------------------------------------------------------------
    def rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        """Hash sets k-min-MERGED to a coarser grain — no base scan.
        Exact: finer groups partition the σ-base, every hash among the
        coarse k-min survives in its fine group's k-min (anything it
        beats coarsely it also beats within one group), so the k-min of
        the unioned fine sets IS the set a direct coarse build would
        produce (bit-identical, oracle-checkable)."""
        subset = list(group_subset)
        missing = [g for g in subset if g not in self.group_cols]
        if missing:
            raise ValueError(
                f"rollup cols {missing!r} are not sketch group cols "
                f"{self.group_cols}"
            )
        return self._kmin(self.read(spark), subset)

    def union_rollup(
        self,
        spark: SparkSession,
        other: "MaintainedKMVSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """The UNION sketch of two maintained sketches — k-min of the
        merged hash sets, bit-identical to a direct build over A ∪ B
        (same argument as :meth:`rollup`; requires identical k and the
        same value-key space)."""
        if other.k != self.k:
            raise ValueError(
                f"cannot combine sketches with different k: "
                f"{self.k} vs {other.k} — the retained-hash contracts differ"
            )
        subset = list(group_subset)
        return self._kmin(
            self.rollup(spark, subset).unionByName(
                other.rollup(spark, subset)
            ),
            subset,
        )

    def _estimate_over(
        self, hashes: DataFrame, group_cols: list[str]
    ) -> DataFrame:
        """(group…, n_hashes, theta, est_raw): n_hashes and theta are
        exact BIGINTs; est_raw is the literal-numerator IEEE divide
        (or the exact count when the sketch is complete)."""
        num = kmv_numerator(self.k)
        return (
            hashes.groupBy(*group_cols)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_hashes"),
                F.max("h").cast("long").alias("theta"),
            )
            .withColumn(
                "est_raw",
                F.when(
                    F.col("n_hashes") < self.k,
                    F.col("n_hashes").cast("double"),
                ).otherwise(F.lit(num) / F.col("theta")),
            )
        )

    def estimate(self, spark: SparkSession) -> DataFrame:
        return self._estimate_over(self.read(spark), self.group_cols)

    def estimate_rollup(
        self, spark: SparkSession, group_subset: Sequence[str]
    ) -> DataFrame:
        return self._estimate_over(
            self.rollup(spark, group_subset), list(group_subset)
        )

    def estimate_union(
        self,
        spark: SparkSession,
        other: "MaintainedKMVSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        return self._estimate_over(
            self.union_rollup(spark, other, group_subset),
            list(group_subset),
        )

    def estimate_intersection(
        self,
        spark: SparkSession,
        other: "MaintainedKMVSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """(group…, n_union, theta, rho, est_raw) — the distinct
        cardinality of A ∩ B per group, answered from the two k-row
        states alone (the capability HLL's max-merge cannot express).
        ``rho`` counts hashes present in BOTH sketches at or below the
        union's theta; when the union sketch is complete (n_union < k)
        both sketches hold every hash, so rho IS the exact count and
        est_raw = rho; otherwise est_raw = rho·(k−1)·2^60 / theta / k
        (left-assoc — the identical expression shape in the DuckDB
        twin makes the doubles bit-equal).  Groups present in only one
        sketch report rho = 0."""
        if other.k != self.k:
            raise ValueError(
                f"cannot combine sketches with different k: "
                f"{self.k} vs {other.k} — the retained-hash contracts differ"
            )
        subset = list(group_subset)
        a = self.rollup(spark, subset)
        b = other.rollup(spark, subset)
        u = self._estimate_over(
            self._kmin(a.unionByName(b), subset), subset
        ).select(*subset, F.col("n_hashes").alias("n_union"), "theta")
        join_cols = [*subset, "h"]
        common = a.join(b, join_cols, "inner").select(*subset, "h")
        num = kmv_numerator(self.k)
        if subset:
            rho = (
                common.join(u.select(*subset, "theta"), subset)
                .filter(F.col("h") <= F.col("theta"))
                .groupBy(*subset)
                .agg(F.count(F.lit(1)).cast("long").alias("rho"))
            )
            stats = u.join(rho, subset, "left")
        else:
            rho = (
                common.crossJoin(F.broadcast(u.select("theta")))
                .filter(F.col("h") <= F.col("theta"))
                .agg(F.count(F.lit(1)).cast("long").alias("rho"))
            )
            stats = u.crossJoin(F.broadcast(rho))
        return stats.select(
            *subset,
            "n_union",
            "theta",
            F.coalesce(F.col("rho"), F.lit(0)).cast("long").alias("rho"),
            F.when(
                F.col("n_union") < self.k,
                F.coalesce(F.col("rho"), F.lit(0)).cast("double"),
            )
            .otherwise(
                F.coalesce(F.col("rho"), F.lit(0))
                * F.lit(num)
                / F.col("theta")
                / F.lit(float(self.k))
            )
            .alias("est_raw"),
        )

    def estimate_difference(
        self,
        spark: SparkSession,
        other: "MaintainedKMVSketch",
        group_subset: Sequence[str],
    ) -> DataFrame:
        """(group…, n_union, theta, rho, est_raw) — the distinct
        cardinality of A \\ B (values in THIS sketch's population but
        not *other*'s), the third leg of the theta-sketch set algebra.
        ``rho`` counts hashes retained by A, absent from B, at or below
        the union theta; complete union (< k) → exact, else the same
        rho/k scaling as :meth:`estimate_intersection`.  Estimates
        compose: est_inter + est_diff(A\\B) + est_diff(B\\A) = est_union
        exactly (the three rhos partition the union's retained set)."""
        if other.k != self.k:
            raise ValueError(
                f"cannot combine sketches with different k: "
                f"{self.k} vs {other.k} — the retained-hash contracts differ"
            )
        subset = list(group_subset)
        a = self.rollup(spark, subset)
        b = other.rollup(spark, subset)
        u = self._estimate_over(
            self._kmin(a.unionByName(b), subset), subset
        ).select(*subset, F.col("n_hashes").alias("n_union"), "theta")
        join_cols = [*subset, "h"]
        only_a = a.join(b, join_cols, "left_anti").select(*subset, "h")
        num = kmv_numerator(self.k)
        if subset:
            rho = (
                only_a.join(u.select(*subset, "theta"), subset)
                .filter(F.col("h") <= F.col("theta"))
                .groupBy(*subset)
                .agg(F.count(F.lit(1)).cast("long").alias("rho"))
            )
            stats = u.join(rho, subset, "left")
        else:
            rho = (
                only_a.crossJoin(F.broadcast(u.select("theta")))
                .filter(F.col("h") <= F.col("theta"))
                .agg(F.count(F.lit(1)).cast("long").alias("rho"))
            )
            stats = u.crossJoin(F.broadcast(rho))
        return stats.select(
            *subset,
            "n_union",
            "theta",
            F.coalesce(F.col("rho"), F.lit(0)).cast("long").alias("rho"),
            F.when(
                F.col("n_union") < self.k,
                F.coalesce(F.col("rho"), F.lit(0)).cast("double"),
            )
            .otherwise(
                F.coalesce(F.col("rho"), F.lit(0))
                * F.lit(num)
                / F.col("theta")
                / F.lit(float(self.k))
            )
            .alias("est_raw"),
        )
