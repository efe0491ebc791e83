"""Exact COUNT(DISTINCT) maintenance over the change data feed.

SUM/COUNT fold from row-level changes alone (:mod:`.matview`); MIN/MAX
need an occasional dirty-group rescan.  ``COUNT(DISTINCT v)`` is harder
still — it is not self-maintainable from signed deltas (removing one
occurrence of a value says nothing about whether OTHER rows still carry
it), which is why most warehouses either forbid it in incremental
materialized views or degrade to approximation.  The textbook exact
answer is an auxiliary SUPPORT multiset: for each group, how many base
rows carry each distinct value::

    H(g, v) = COUNT(*) of base rows in group g with value v   (v NOT NULL)
    COUNT(DISTINCT v) over g  ==  |{v : H(g, v) > 0}|

``H`` IS self-maintainable from signed changes (+1 insert/postimage,
−1 delete/preimage on the (g, v) pair), so the maintenance loop is:

    1. fold the O(changes) slice into per-(g, v) support deltas;
    2. rewrite ONLY the support buckets (hash(g) % B) those deltas
       touch — old bucket ∪ deltas → groupBy(g, v) → cnt > 0;
    3. re-count distinct per TOUCHED group from the new buckets and
       override those groups in the rollup; untouched groups keep their
       stored counts, n_rows folds by ± like any matview.

Scale shape: a refresh costs O(changes) + O(touched support buckets) +
a groups-sized rollup rewrite — never O(table) and never O(all support).
The support store is distinct-pairs-sized (≤ table), hash-partitioned by
group into ``n_buckets`` so a CDC batch touching few groups reads/writes
few buckets; per-bucket version pointers give the same crash contract as
the managed table (data written first, ``_meta.json`` swapped last by
``os.replace``, superseded bucket dirs GC'd after the swap).

Exactness: the counts are integers, so maintained == full recompute
bit-for-bit; the driver row ``pipeline_incremental_distinct`` proves it
against a DuckDB ``COUNT(DISTINCT)`` recompute after adversarial churn
(re-inserting a removed value, removing the LAST occurrence, NULL
transitions, group moves).  NULL values never count (SQL semantics);
NULL GROUP KEYS are first-class (hash/bucket/nullsafe joins throughout).

Fits the single-table derived protocol (``exists()`` /
``refresh(spark, table)``), so it rides ``TableReplicator(derived=[…])``
and ``stream_derived_refresh`` like any index or matview.
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

from ..table.managed import CHANGE_TYPE_COL, ManagedTable

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")


class SupportStore:
    """The bucket-partitioned ``(group…, __v, __cnt)`` multiset store
    behind exact COUNT(DISTINCT) maintenance — one store per distinct
    output, hash-partitioned by group key into ``n_buckets`` so a
    refresh touching few groups reads/writes few buckets.

    Shared by :class:`MaintainedDistinctAggregate` (single table) and
    :class:`~.join_matview.MaintainedDistinctStarAggregate` (distinct
    through a join): both feed it net per-(group, value) support deltas
    — the single-table view derives them from the change slice, the
    join view from its signed join-delta terms — and the layout, fold,
    recount, and crash contract are identical.  The OWNER commits the
    bucket pointers inside its own ``_meta.json`` swap: this class only
    writes data dirs (``support/<out>/r=R/__b=K``) and reports which
    pointers to advance/drop, so a crash between the write and the
    owner's swap leaves unreferenced orphans the next refresh's
    deterministic paths overwrite at worst."""

    def __init__(self, root, group_cols: Sequence[str], n_buckets: int):
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.n_buckets = int(n_buckets)

    def bucket_path(self, out: str, refresh_ver: int, bucket: int) -> Path:
        return self.root / "support" / out / f"r={refresh_ver}" / f"__b={bucket}"

    def bucket_expr(self) -> F.Column:
        return F.pmod(
            F.hash(*[F.col(c) for c in self.group_cols]), F.lit(self.n_buckets)
        )

    def nullsafe_eq(self, left: str, right: str):
        cond = None
        for c in self.group_cols:
            eq = F.col(f"{left}.{c}").eqNullSafe(F.col(f"{right}.{c}"))
            cond = eq if cond is None else (cond & eq)
        return cond

    def read_buckets(
        self, spark: SparkSession, out: str, bv: dict, buckets: list[int]
    ) -> DataFrame | None:
        """Live support rows for *buckets* under pointer map *bv* (None
        when none was ever written) — each bucket reads exactly its
        pointed refresh dir."""
        paths = [
            str(self.bucket_path(out, bv[str(b)], b))
            for b in buckets
            if str(b) in bv
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def live_paths(self, out: str, bv: dict) -> list[str]:
        return [
            str(self.bucket_path(out, ver, int(b))) for b, ver in bv.items()
        ]

    def seed_out(
        self, spark: SparkSession, out: str, base: DataFrame, src: str
    ) -> dict[str, int]:
        """Write the full support store for *out* from seed state *base*
        (r=1); returns the bucket→version pointer map the owner commits.
        """
        support = (
            base.filter(F.col(src).isNotNull())
            .groupBy(*self.group_cols, F.col(src).alias("__v"))
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .withColumn("__b", self.bucket_expr())
        )
        support.write.mode("overwrite").partitionBy("__b").parquet(
            str(self.root / "support" / out / "r=1")
        )
        written = [
            int(p.name.split("=", 1)[1])
            for p in (self.root / "support" / out / "r=1").glob("__b=*")
        ]
        return {str(b): 1 for b in written}

    def fold_out(
        self,
        spark: SparkSession,
        out: str,
        pairs: DataFrame,
        bv: dict,
        version: int,
    ) -> tuple[list[Path], DataFrame | None, DataFrame | None]:
        """Fold net per-(group, value) support deltas *pairs* (``__cnt``
        ≠ 0) into *out*'s store: rewrite ONLY the touched buckets at
        ``r=version``, advance/drop their pointers in *bv* (mutated in
        place — the owner persists it), and re-count distinct per
        TOUCHED group from the freshly written buckets.

        Returns ``(superseded_paths, recount, touched)`` where *recount*
        is (group…, __rc_<out>, __dirty_<out>) for every touched group
        (``None`` when the slice touched nothing) and *touched* its bare
        group keys.  Superseded dirs are the CALLER's to GC after its
        meta swap."""
        touched_buckets = sorted(
            r["__b"]
            for r in pairs.select(self.bucket_expr().alias("__b"))
            .distinct()
            .collect()
        )
        if not touched_buckets:
            return [], None, None
        old = self.read_buckets(spark, out, bv, touched_buckets)
        folded = pairs if old is None else old.unionByName(pairs)
        folded = (
            folded.groupBy(*self.group_cols, "__v")
            .agg(F.sum("__cnt").alias("__cnt"))
            .filter(F.col("__cnt") > 0)
            .withColumn("__b", self.bucket_expr())
        )
        # ONE write job for all touched buckets of this refresh
        folded.write.mode("overwrite").partitionBy("__b").parquet(
            str(self.root / "support" / out / f"r={version}")
        )
        # a touched bucket folding to ZERO surviving pairs writes no
        # __b dir — its pointer must be DROPPED (the bucket is empty
        # now), not advanced to a path that doesn't exist
        materialized = {
            int(p.name.split("=", 1)[1])
            for p in (self.root / "support" / out / f"r={version}").glob(
                "__b=*"
            )
        }
        superseded: list[Path] = []
        for b in touched_buckets:
            if str(b) in bv:
                superseded.append(self.bucket_path(out, bv[str(b)], b))
            if b in materialized:
                bv[str(b)] = version
            else:
                bv.pop(str(b), None)
        # touched groups re-counted from the freshly WRITTEN buckets
        # (read-back: exact, and avoids recomputing the fold twice)
        touched = pairs.select(*self.group_cols).distinct()
        new_paths = [
            str(self.bucket_path(out, version, b))
            for b in touched_buckets
            if b in materialized
        ]
        if new_paths:
            counted = (
                spark.read.parquet(*new_paths)
                .alias("__s")
                .join(
                    F.broadcast(touched.alias("__t")),
                    self.nullsafe_eq("__s", "__t"),
                    "left_semi",
                )
                .groupBy(*self.group_cols)
                .agg(F.count(F.lit(1)).cast("long").alias(f"__rc_{out}"))
            )
            recount = (
                touched.alias("__t")
                .join(
                    counted.alias("__c"),
                    self.nullsafe_eq("__t", "__c"),
                    "left",
                )
                .select(
                    *[F.col(f"__t.{c}").alias(c) for c in self.group_cols],
                    F.coalesce(
                        F.col(f"__rc_{out}"), F.lit(0).cast("long")
                    ).alias(f"__rc_{out}"),
                    F.lit(True).alias(f"__dirty_{out}"),
                )
            )
        else:
            recount = touched.select(
                *self.group_cols,
                F.lit(0).cast("long").alias(f"__rc_{out}"),
                F.lit(True).alias(f"__dirty_{out}"),
            )
        return superseded, recount, touched

    def gc_out(self, out: str, bv: dict, version: int) -> None:
        """Remove refresh dirs no live pointer references (run AFTER the
        owner's meta swap)."""
        live = set(bv.values())
        sdir = self.root / "support" / out
        if sdir.exists():
            for rd in sdir.glob("r=*"):
                ver = int(rd.name.split("=", 1)[1])
                if ver not in live and ver != version:
                    shutil.rmtree(rd, ignore_errors=True)

    # -- probes (shared: every owner's store answers these for free) ------
    def top_values(
        self, spark: SparkSession, out: str, bv: dict, k: int
    ) -> DataFrame | None:
        """Heavy hitters per group from the live buckets under pointer
        map *bv*: top-*k* values by occurrence count (ties by value),
        as (group…, __v, __cnt, rank) — ``None`` when the store is
        empty (the owner shapes its own typed empty frame).  Reads the
        distinct-pairs-sized store, never a base table; the per-group
        window bounds task work at any corpus size."""
        from pyspark.sql import Window

        paths = self.live_paths(out, bv)
        if not paths:
            return None
        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col("__cnt").desc(), F.col("__v").asc()
        )
        return (
            spark.read.parquet(*paths)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*self.group_cols, "__v", "__cnt", "rank")
        )

    def quantile_values(
        self,
        spark: SparkSession,
        out: str,
        bv: dict,
        quantiles: dict[str, tuple[int, int]],
    ) -> DataFrame | None:
        """EXACT per-group quantiles from the live buckets: H(g, v) is
        the row multiset projected onto v, so its cnt-weighted lower
        quantile IS the per-group quantile of the source column.
        Integer ceil-division thresholds; (group…, q_label, __v);
        ``None`` when the store is empty."""
        from pyspark.sql import Window

        qdf = spark.createDataFrame(
            [(lbl, int(n), int(d)) for lbl, (n, d) in quantiles.items()],
            "q_label string, __qn long, __qd long",
        )
        paths = self.live_paths(out, bv)
        if not paths:
            return None
        wq = (
            Window.partitionBy(*self.group_cols)
            .orderBy(F.col("__v").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy(*self.group_cols)
        cum = (
            spark.read.parquet(*paths)
            .withColumn("__cum", F.sum("__cnt").over(wq))
            .withColumn("__tot", F.sum("__cnt").over(wt))
        )
        th = F.expr("(__tot * __qn + __qd - 1) div __qd")
        return (
            cum.crossJoin(F.broadcast(qdf))
            .filter(
                (F.col("__cum") >= th)
                & (F.col("__cum") - F.col("__cnt") < th)
            )
            .select(*self.group_cols, "q_label", "__v")
        )


def init_distinct_agg(
    df: DataFrame, group_cols: Sequence[str], distinct_cols: dict[str, str]
) -> DataFrame:
    """Seed rollup: (group_cols…, n_rows, <out>=COUNT(DISTINCT <src>)…)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.count_distinct(F.col(src)).alias(out)
            for out, src in distinct_cols.items()
        ],
    )


class MaintainedDistinctAggregate:
    """A persisted, restartable exact-distinct rollup over a CDF-enabled
    :class:`ManagedTable`.

    Layout::

        <root>/_meta.json               applied_seq, version,
                                        bucket_versions[out][bucket] = r
        <root>/v=N/…                    the rollup
        <root>/support/<out>/r=R/__b=K/ support pairs (group…, __v, __cnt)
                                        for bucket K as written by
                                        refresh R (each bucket's LIVE
                                        version is its pointer in meta)

    ``distinct_cols`` maps output column → source column; each output
    gets its own support store (values keep their native type — no
    lossy cross-column encoding).
    """

    def __init__(
        self,
        root,
        group_cols: Sequence[str],
        distinct_cols: dict[str, str],
        n_buckets: int = 32,
        where: str | None = None,
        where_cols: Sequence[str] | None = None,
    ):
        self.root = Path(root)
        self.group_cols = list(group_cols)
        self.distinct_cols = dict(distinct_cols)
        self.n_buckets = int(n_buckets)
        if not self.distinct_cols:
            raise ValueError("distinct_cols must name at least one output")
        # row-local σ over base columns — commutes with the ± support
        # fold exactly as in MaintainedAggregate: a change row (pre- or
        # post-image) contributes iff it satisfies the predicate, so a
        # boundary-crossing update folds as a one-sided ± support delta
        self.where = where
        self.where_cols = list(where_cols or [])
        if self.where_cols and not where:
            raise ValueError("where_cols given without a where predicate")
        self._store = SupportStore(self.root, self.group_cols, self.n_buckets)

    # -- meta / io --------------------------------------------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(str(self.root / f"v={self.meta()['version']}"))

    def _swap_meta(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def _bucket_path(self, out: str, refresh_ver: int, bucket: int) -> Path:
        return self._store.bucket_path(out, refresh_ver, bucket)

    def _bucket_expr(self) -> F.Column:
        return self._store.bucket_expr()

    # -- field-id translation (same contract as MaintainedAggregate) -----
    def _source_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                self.group_cols
                + list(self.distinct_cols.values())
                + self.where_cols
            )
        )

    def _translated(self, m: dict, src_m: dict) -> list:
        stored = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        cols = []
        for n in self._source_cols():
            cur = inv.get(stored.get(n), n) if stored else n
            cols.append(F.col(cur).alias(n) if cur != n else F.col(n))
        return cols

    def _nullsafe_eq(self, left: str, right: str):
        return self._store.nullsafe_eq(left, right)

    # -- support-store access --------------------------------------------
    def _read_buckets(
        self, spark: SparkSession, out: str, meta: dict, buckets: list[int]
    ) -> DataFrame | None:
        """Live support rows for *buckets* (None when none was ever
        written).  Each bucket reads exactly its pointed refresh dir."""
        return self._store.read_buckets(
            spark, out, (meta.get("bucket_versions") or {}).get(out, {}),
            buckets,
        )

    # -- probes -----------------------------------------------------------
    def top_values(self, spark: SparkSession, out: str, k: int) -> DataFrame:
        """Heavy hitters per group, FREE from the support store the
        distinct counts already maintain: the top-*k* values of
        ``distinct_cols[out]``'s source column by occurrence count
        (ties broken by value — deterministic), as
        (group…, __v, __cnt, rank).

        The probe reads the live support buckets (distinct-pairs-sized,
        ≪ table) and windows per group — the partition-by-group window
        bounds per-task work at any corpus size, and no base-table scan
        happens at all.  This is the classic curation question ("top
        domains per language", "top customers per priority") answered
        from already-maintained state."""
        from pyspark.sql import Window

        if out not in self.distinct_cols:
            raise KeyError(f"{out!r} is not a maintained distinct column")
        meta = self.meta()
        bv = (meta.get("bucket_versions") or {}).get(out, {})
        paths = [
            str(self._bucket_path(out, ver, int(b))) for b, ver in bv.items()
        ]
        if not paths:
            return (
                spark.read.parquet(str(self.root / f"v={meta['version']}"))
                .select(*self.group_cols)
                .limit(0)
                .select(
                    *self.group_cols,
                    F.lit(None).alias("__v"),
                    F.lit(0).cast("long").alias("__cnt"),
                    F.lit(0).alias("rank"),
                )
            )
        w = Window.partitionBy(*self.group_cols).orderBy(
            F.col("__cnt").desc(), F.col("__v").asc()
        )
        return (
            spark.read.parquet(*paths)
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(*self.group_cols, "__v", "__cnt", "rank")
        )

    def quantile_values(
        self,
        spark: SparkSession,
        out: str,
        quantiles: dict[str, tuple[int, int]],
    ) -> DataFrame:
        """EXACT per-group quantiles, also free from the support store:
        because H(g, v) is the row multiset projected onto v, the
        cnt-weighted lower quantile over the store's values IS the plain
        per-group quantile of the source column — maintained
        incrementally without touching the base table.

        *quantiles* maps a label to the fraction (num, den) — e.g.
        ``{"p50": (1, 2), "p90": (9, 10)}``.  The picked value for p is
        the smallest v whose cumulative count reaches
        ``ceil(p · total)``, computed in INTEGER arithmetic
        (``(tot·num + den − 1) div den``) so engines can't disagree on a
        threshold.  NULLs are absent by construction.  One window over
        the group-partitioned store; per-task work bounded by group
        size, never a global sort."""
        from pyspark.sql import Window

        if out not in self.distinct_cols:
            raise KeyError(f"{out!r} is not a maintained distinct column")
        meta = self.meta()
        bv = (meta.get("bucket_versions") or {}).get(out, {})
        paths = [
            str(self._bucket_path(out, ver, int(b))) for b, ver in bv.items()
        ]
        qdf = spark.createDataFrame(
            [(lbl, int(n), int(d)) for lbl, (n, d) in quantiles.items()],
            "q_label string, __qn long, __qd long",
        )
        if not paths:
            return (
                spark.read.parquet(str(self.root / f"v={meta['version']}"))
                .select(*self.group_cols)
                .limit(0)
                .crossJoin(qdf.select("q_label"))
                .select(*self.group_cols, "q_label", F.lit(None).alias("__v"))
            )
        wq = (
            Window.partitionBy(*self.group_cols)
            .orderBy(F.col("__v").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wt = Window.partitionBy(*self.group_cols)
        cum = (
            spark.read.parquet(*paths)
            .withColumn("__cum", F.sum("__cnt").over(wq))
            .withColumn("__tot", F.sum("__cnt").over(wt))
        )
        th = F.expr("(__tot * __qn + __qd - 1) div __qd")
        return (
            cum.crossJoin(F.broadcast(qdf))
            .filter(
                (F.col("__cum") >= th) & (F.col("__cum") - F.col("__cnt") < th)
            )
            .select(*self.group_cols, "q_label", "__v")
        )

    # -- refresh ----------------------------------------------------------
    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Seed on first call, then fold exactly ``(applied_seq, cdf_seq]``;
        returns the applied checkpoint.  One manifest read pins the seed
        data + seq (the non-idempotent-fold double-count hazard)."""
        src_m = source.manifest()
        if not src_m.get("cdf"):
            raise ValueError("distinct maintenance needs the change feed (cdf=True)")
        src_seq = src_m.get("cdf_seq", 0)

        if not self.exists():
            base = source._read_state(spark, src_m).select(*self._source_cols())
            if self.where:
                base = base.filter(F.expr(self.where))
            rollup = init_distinct_agg(base, self.group_cols, self.distinct_cols)
            rollup.write.mode("overwrite").parquet(str(self.root / "v=1"))
            bucket_versions = {
                out: self._store.seed_out(spark, out, base, src)
                for out, src in self.distinct_cols.items()
            }
            src_ids = src_m.get("field_ids", {})
            self._swap_meta(
                {
                    "applied_seq": src_seq,
                    "version": 1,
                    "n_buckets": self.n_buckets,
                    "where": self.where,
                    "bucket_versions": bucket_versions,
                    "field_ids": {
                        n: src_ids[n] for n in self._source_cols() if n in src_ids
                    },
                }
            )
            return src_seq

        meta = self.meta()
        if meta.get("where") != self.where:
            raise ValueError(
                f"distinct view at {self.root} was seeded with where="
                f"{meta.get('where')!r}; constructed with {self.where!r} — "
                "rebuild instead of mixing filtered states"
            )
        since = meta["applied_seq"]
        if src_seq <= since:
            return since

        slice_df = source.changes(spark, since=since, until=src_seq).select(
            F.col(CHANGE_TYPE_COL), *self._translated(meta, src_m)
        )
        if self.where:
            slice_df = slice_df.filter(F.expr(self.where))
        sign = (
            F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
            .when(F.col(CHANGE_TYPE_COL).isin(*_SUB), F.lit(-1))
            .otherwise(F.lit(0))
        )
        signed = slice_df.select(
            *self.group_cols,
            *[F.col(src).alias(f"__v_{out}") for out, src in self.distinct_cols.items()],
            sign.alias("__sign"),
        )

        version = meta["version"] + 1
        bucket_versions = {
            out: dict(bv) for out, bv in (meta.get("bucket_versions") or {}).items()
        }
        superseded: list[Path] = []
        recounts: dict[str, DataFrame] = {}
        all_touched: DataFrame | None = None
        for out in self.distinct_cols:
            # net per-(group, value) support delta — pairs that cancel
            # inside the slice vanish here and touch nothing
            pairs = (
                signed.filter(F.col(f"__v_{out}").isNotNull())
                .groupBy(*self.group_cols, F.col(f"__v_{out}").alias("__v"))
                .agg(F.sum("__sign").alias("__cnt"))
                .filter(F.col("__cnt") != 0)
            )
            sup, recount, touched = self._store.fold_out(
                spark, out, pairs, bucket_versions.setdefault(out, {}),
                version,
            )
            superseded.extend(sup)
            if recount is None:
                continue
            recounts[out] = recount
            all_touched = (
                touched
                if all_touched is None
                else all_touched.unionByName(touched).distinct()
            )

        # ---- rollup: n_rows folds by ±; distinct cols override per
        # touched group, untouched groups keep stored counts, groups born
        # with only-NULL values coalesce to 0 (COUNT(DISTINCT) is never
        # NULL)
        stored = self.read(spark)
        n_deltas = signed.select(
            *self.group_cols,
            F.col("__sign").cast("long").alias("n_rows"),
            *[F.lit(None).cast("long").alias(out) for out in self.distinct_cols],
        )
        folded_rollup = (
            stored.select(*self.group_cols, "n_rows", *self.distinct_cols)
            .unionByName(n_deltas)
            .groupBy(*self.group_cols)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                # the stored row is the only non-NULL contributor
                *[F.min(out).alias(out) for out in self.distinct_cols],
            )
            .filter(F.col("n_rows") > 0)
        )
        result = folded_rollup.alias("__f")
        sel = [F.col(f"__f.{c}").alias(c) for c in self.group_cols] + [
            F.col("__f.n_rows").alias("n_rows")
        ]
        for out, rc in recounts.items():
            result = result.join(
                rc.alias(f"__r_{out}"), self._nullsafe_eq("__f", f"__r_{out}"), "left"
            )
        for out in self.distinct_cols:
            if out in recounts:
                sel.append(
                    F.coalesce(
                        F.when(
                            F.col(f"__r_{out}.__dirty_{out}").isNotNull(),
                            F.col(f"__r_{out}.__rc_{out}"),
                        ).otherwise(F.col(f"__f.{out}")),
                        F.lit(0).cast("long"),
                    ).alias(out)
                )
            else:
                sel.append(
                    F.coalesce(F.col(f"__f.{out}"), F.lit(0).cast("long")).alias(out)
                )
        result = result.select(*sel)

        result.write.mode("overwrite").parquet(str(self.root / f"v={version}"))
        meta.update(
            {
                "applied_seq": src_seq,
                "version": version,
                "bucket_versions": bucket_versions,
            }
        )
        self._swap_meta(meta)
        # GC AFTER the swap: superseded bucket dirs + old rollup versions.
        # A crash here leaves orphans that the next successful refresh's
        # deterministic paths simply never read (and overwrite at worst).
        for p in superseded:
            shutil.rmtree(p, ignore_errors=True)
        for out in self.distinct_cols:
            self._store.gc_out(out, bucket_versions.get(out) or {}, version)
        for p in self.root.glob("v=*"):
            if int(p.name.split("=", 1)[1]) < version:
                shutil.rmtree(p, ignore_errors=True)
        return src_seq
