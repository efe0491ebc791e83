"""Incremental maintenance of a JOIN rollup from TWO change feeds.

:mod:`.matview` keeps single-table aggregates fresh in O(changes); the
next thing every warehouse deployment builds on a replicated pair is a
JOINED rollup — revenue by customer segment, events by device class —
and re-running the join per CDC batch re-scans both tables.  This module
maintains ``SELECT g…, COUNT(*), SUM(m)… FROM fact JOIN dim ON fact.fk =
dim.pk GROUP BY g…`` incrementally from the two tables' change data
feeds, the classic delta algebra for materialized join views (Blakeley
et al., SIGMOD'86; the same shape Snowflake/BigQuery incremental MVs
implement):

    Δ(F ⋈ D)  =  ΔF ⋈ D_old   ∪   F_new ⋈ ΔD

with SIGNED change rows (+1 insert/update_postimage, −1
delete/update_preimage).  The identity is exact for multiset semantics:
F_new = F_old + ΔF, so ΔF⊗D_old + F_new⊗ΔD expands to exactly
F_new⊗D_new − F_old⊗D_old — updates that move a fact row between dim
keys, dim attribute changes that move whole groups, same-slice
insert+insert pairs, and danglings from a dim delete all fall out of the
two terms with no special cases.

Scale shape (the whole point — never O(table) per refresh):

- ``ΔF ⋈ D_old``: the dim side is reconstructed ONLY for the fk keys the
  fact slice touches — ``read_for_keys`` probes the dim's PK buckets
  (O(touched buckets), pinned to the refresh's own manifest), and the
  slice's own dim changes are REVERSE-APPLIED on those keys (the
  pre-slice image of a changed key is the earliest slice event's
  preimage; a key whose earliest event is an insert had no pre-slice
  row).  The feeds carry pre-images precisely so that old states never
  need a second table scan.
- ``F_new ⋈ ΔD``: the fact side is read pinned and filtered to the
  changed dim keys with a LITERAL ``fk IN (…)`` predicate (batch-bounded
  collect, same cap-and-fallback contract as the matview dirty-group
  rescan) so parquet row-group pruning engages — on a fact table
  clustered or z-ordered by fk this reads a handful of files.  Past the
  cap, a broadcast semi-join fallback (full scan, filtered).
- The fold is one union → groupBy on the group key, identical to the
  single-table matview: partial aggregation map-side, NULL groups
  native, groups whose joined count reaches zero dropped.

Exactness: integer measures make incremental == full recompute
bit-for-bit; the driver row ``pipeline_incremental_join_agg`` proves the
maintained rollup equal to a DuckDB full join+group recompute after
adversarial churn on BOTH tables.  Restrictions (asserted at seed): the
dim side is keyed by its single-column PK (the N:1 warehouse-dimension
shape; the reference's replicated tables always carry a PK —
tidbsql/ddl.go PK discovery), the join is INNER with plain equality
(NULL fk never matches), and measures are fact-side columns.

Crash contract: state is versioned parquet + ``_meta.json`` committed by
``os.replace`` carrying BOTH applied seqs; a crash between data write
and meta swap is repaired by the deterministic overwrite on retry, and a
crash between one table's merge and this refresh self-heals next poll
(each refresh folds exactly ``(applied, current]`` of each feed).
"""

from __future__ import annotations

import json
import os
import tempfile
import threading
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..table.managed import CHANGE_TYPE_COL, COMMIT_SEQ_COL, ManagedTable

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")
# past this many changed dim keys, the literal fk IN (...) predicate is
# replaced by a broadcast semi-join (same trade as matview's dirty cap)
_FK_LITERAL_CAP = 5000


def init_join_agg(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    dim_pk: str,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Seed: the full inner-join rollup
    (group_cols…, n_rows, <out>=SUM(<fact src>)…), NULL-as-zero sums —
    the same convention :func:`..matview.init_agg` pins, for the same
    reason (± folding cannot express an all-NULL revival)."""
    joined = fact.join(dim, fact[fk_col] == dim[dim_pk], "inner")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.col(src)), F.lit(0)).alias(out)
        for out, src in sum_cols.items()
    ]
    return joined.groupBy(*[F.col(g) for g in group_cols]).agg(*aggs)


class BoundJoinAggregate:
    """A :class:`MaintainedJoinAggregate` closed over its two tables so it
    fits the SINGLE-table derived protocol (``exists()`` /
    ``refresh(spark, table)``) that :class:`~...replicate.TableReplicator`
    and :func:`~...streaming.stream.stream_derived_refresh` drive.

    ``refresh`` folds BOTH feeds regardless of which table's poll (or
    commit-log wake-up) triggered it — each refresh applies exactly
    ``(applied, current]`` of each feed — so attaching to ONE
    replicator keeps the view fresh on that cadence, and attaching to
    BOTH (fact's and dim's loops; ``replicate_all`` runs them in
    threads) is serialized by an in-process lock: the second thread's
    refresh sees both seqs already applied and no-ops.  *table*, when
    given, must be one of the pair — a mis-wired attachment fails loudly
    instead of silently maintaining a view over the wrong tables."""

    def __init__(
        self,
        view: "MaintainedJoinAggregate",
        fact: ManagedTable,
        dim: ManagedTable,
    ):
        self.view, self.fact, self.dim = view, fact, dim
        self._lock = threading.Lock()

    def exists(self) -> bool:
        return self.view.exists()

    def read(self, spark) -> DataFrame:
        return self.view.read(spark)

    def refresh(self, spark: SparkSession, table: ManagedTable | None = None):
        if table is not None and str(Path(table.root).resolve()) not in {
            str(Path(self.fact.root).resolve()),
            str(Path(self.dim.root).resolve()),
        }:
            raise ValueError(
                f"BoundJoinAggregate is bound to {self.fact.root} / "
                f"{self.dim.root}; refresh was driven by {table.root}"
            )
        with self._lock:
            return self.view.refresh(spark, self.fact, self.dim)


class MaintainedJoinAggregate:
    """A JOIN rollup maintained from two CDF-enabled ManagedTables.

    ``group_cols`` name output group keys; ``fact_group_cols`` /
    ``dim_group_cols`` say which side supplies each (disjoint; together
    they equal ``group_cols``).  ``sum_cols`` maps output name → FACT
    column.  ``fk_col`` is the fact-side join column; the dim side joins
    on its own (single-column) primary key."""

    def __init__(
        self,
        root,
        fk_col: str,
        fact_group_cols: Sequence[str],
        dim_group_cols: Sequence[str],
        sum_cols: dict[str, str],
    ):
        self.root = Path(root)
        self.fk_col = fk_col
        self.fact_group_cols = list(fact_group_cols)
        self.dim_group_cols = list(dim_group_cols)
        self.group_cols = self.fact_group_cols + self.dim_group_cols
        self.sum_cols = dict(sum_cols)

    def bind(self, fact: ManagedTable, dim: ManagedTable) -> BoundJoinAggregate:
        """Close over the two tables → an object the single-table derived
        hooks (``TableReplicator(derived=[…])``, ``stream_derived_refresh``)
        can drive."""
        return BoundJoinAggregate(self, fact, dim)

    # -- meta (same crash contract as MaintainedAggregate) ----------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(str(self.root / f"v={self.meta()['version']}"))

    def _commit(self, agg: DataFrame, meta: dict) -> None:
        agg.write.mode("overwrite").parquet(
            str(self.root / f"v={meta['version']}")
        )
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    # -- column sets ------------------------------------------------------
    def _fact_cols(self) -> list[str]:
        return list(
            dict.fromkeys(
                [self.fk_col]
                + self.fact_group_cols
                + list(self.sum_cols.values())
            )
        )

    def _dim_cols(self, dim_pk: str) -> list[str]:
        return list(dict.fromkeys([dim_pk] + self.dim_group_cols))

    @staticmethod
    def _translated(
        names: list[str], stored_ids: dict, src_m: dict
    ) -> list:
        """Source's CURRENT names (by field id) aliased back to the names
        this view was seeded with — a base RENAME on either table neither
        breaks the fold nor mutates the view's output schema (the same
        translation MaintainedAggregate/SecondaryIndex perform)."""
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        return [
            F.col(inv.get(stored_ids.get(n), n)).alias(n)
            if stored_ids and inv.get(stored_ids.get(n), n) != n
            else F.col(n)
            for n in names
        ]

    # -- signed delta projections ----------------------------------------
    def _signed(self, ch: DataFrame, cols: list) -> DataFrame:
        return ch.select(
            *cols,
            F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
            .otherwise(F.lit(-1))
            .alias("__sign"),
            F.col(COMMIT_SEQ_COL).alias("__seq"),
            F.col(CHANGE_TYPE_COL).alias("__ct"),
        )

    def _delta_rows(self, joined: DataFrame, sign: F.Column) -> DataFrame:
        """(group…, ±measures, ±1) contribution rows from a joined signed
        delta frame."""
        return joined.select(
            *[F.col(g) for g in self.group_cols],
            *[
                (sign * F.coalesce(F.col(src), F.lit(0))).alias(out)
                for out, src in self.sum_cols.items()
            ],
            sign.alias("n_rows"),
        )

    # -- refresh ----------------------------------------------------------
    def refresh(
        self, spark: SparkSession, fact: ManagedTable, dim: ManagedTable
    ) -> tuple[int, int]:
        """Fold both feeds' new commits into the rollup; returns the
        applied (fact_seq, dim_seq) checkpoint.  Both manifests are read
        ONCE at entry and pin every state read below — the concurrency
        contract the single-table matview established."""
        mF, mD = fact.manifest(), dim.manifest()
        for name, m in (("fact", mF), ("dim", mD)):
            if not m.get("cdf"):
                raise ValueError(
                    f"{name} table has no change data feed (create(cdf=True))"
                )
        dim_pk_cols = mD["pk"]
        if len(dim_pk_cols) != 1:
            raise ValueError(
                "MaintainedJoinAggregate joins on the dim's single-column "
                f"PK; {dim.root} has PK {dim_pk_cols}"
            )
        sF, sD = mF.get("cdf_seq", 0), mD.get("cdf_seq", 0)

        if not self.exists():
            dim_pk = dim_pk_cols[0]
            overlap = set(self._fact_cols()) & set(self._dim_cols(dim_pk))
            if overlap:
                raise ValueError(
                    f"fact and dim consumed columns overlap on {sorted(overlap)}; "
                    "the two sides' names must be disjoint so unqualified "
                    "group/measure references stay unambiguous"
                )
            seed = init_join_agg(
                fact._read_state(spark, mF).select(*self._fact_cols()),
                dim._read_state(spark, mD).select(*self._dim_cols(dim_pk)),
                self.fk_col,
                dim_pk,
                self.group_cols,
                self.sum_cols,
            )
            f_ids, d_ids = mF.get("field_ids", {}), mD.get("field_ids", {})
            self._commit(
                seed,
                {
                    "version": 1,
                    "applied_fact": sF,
                    "applied_dim": sD,
                    "dim_pk": dim_pk,
                    "fact_field_ids": {
                        n: f_ids[n] for n in self._fact_cols() if n in f_ids
                    },
                    "dim_field_ids": {
                        n: d_ids[n]
                        for n in self._dim_cols(dim_pk)
                        if n in d_ids
                    },
                },
            )
            return sF, sD

        meta = self.meta()
        aF, aD = meta["applied_fact"], meta["applied_dim"]
        dim_pk = meta["dim_pk"]
        if sF <= aF and sD <= aD:
            return aF, aD

        meta_keep = [CHANGE_TYPE_COL, COMMIT_SEQ_COL]
        dF = self._signed(
            fact.changes(spark, since=aF, until=sF).select(
                *self._translated(
                    self._fact_cols(), meta.get("fact_field_ids", {}), mF
                ),
                *meta_keep,
            ),
            [F.col(c) for c in self._fact_cols()],
        )
        dD = self._signed(
            dim.changes(spark, since=aD, until=sD).select(
                *self._translated(
                    self._dim_cols(dim_pk), meta.get("dim_field_ids", {}), mD
                ),
                *meta_keep,
            ),
            [F.col(c) for c in self._dim_cols(dim_pk)],
        )

        # ---- term 1: ΔF ⋈ D_old, dim state reconstructed per touched key
        # the probe frame carries the dim's CURRENT pk name (read_for_keys
        # semi-joins on the live manifest's pk); results translate back to
        # seed names below
        cur_dim_pk = dim_pk_cols[0]
        fkeys = (
            dF.filter(F.col(self.fk_col).isNotNull())
            .select(F.col(self.fk_col).alias(cur_dim_pk))
            .distinct()
        )
        # current dim rows for those keys — bucket-pruned probe PINNED to
        # this refresh's manifest; dim names translated to seed names
        d_cur = dim.read_for_keys(spark, fkeys, manifest=mD).select(
            *self._translated(
                self._dim_cols(dim_pk), meta.get("dim_field_ids", {}), mD
            )
        )
        # reverse-apply this slice's dim changes on those keys: the
        # pre-slice image of a changed key is the EARLIEST slice event's
        # preimage (update_preimage/delete carry it); a key whose earliest
        # event is an insert had no pre-slice row.  Keys untouched by the
        # slice keep their current row.
        w = Window.partitionBy(dim_pk).orderBy(
            F.asc("__seq"), F.asc(F.col("__ct").isin(*_ADD).cast("int"))
        )
        first_ev = (
            dD.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        changed_keys = dD.select(dim_pk).distinct()
        d_old = (
            d_cur.join(F.broadcast(changed_keys), on=dim_pk, how="left_anti")
            .unionByName(
                first_ev.filter(F.col("__ct").isin(*_SUB)).select(
                    *self._dim_cols(dim_pk)
                )
            )
        )
        t1 = self._delta_rows(
            dF.alias("f").join(
                d_old.alias("d"),
                F.col(f"f.{self.fk_col}") == F.col(f"d.{dim_pk}"),
                "inner",
            ),
            F.col("f.__sign"),
        )

        # ---- term 2: F_new ⋈ ΔD, fact state filtered to changed dim keys
        dkey_rows = changed_keys.limit(_FK_LITERAL_CAP + 1).collect()
        if not dkey_rows:
            t2 = t1.limit(0)
        else:
            f_state = fact._read_state(spark, mF).select(
                *self._translated(
                    self._fact_cols(), meta.get("fact_field_ids", {}), mF
                )
            )
            if len(dkey_rows) <= _FK_LITERAL_CAP:
                # literal IN reaches the parquet scan (row-group pruning
                # on fk-clustered layouts); NULL fk can never match
                f_new = f_state.filter(
                    F.col(self.fk_col).isin([r[dim_pk] for r in dkey_rows])
                )
            else:
                f_new = f_state.join(
                    F.broadcast(changed_keys.withColumnRenamed(dim_pk, self.fk_col)),
                    on=self.fk_col,
                    how="left_semi",
                )
            t2 = self._delta_rows(
                f_new.alias("f").join(
                    dD.alias("d"),
                    F.col(f"f.{self.fk_col}") == F.col(f"d.{dim_pk}"),
                    "inner",
                ),
                F.col("d.__sign"),
            )

        # ---- fold: one union → groupBy on the group key, zero-count
        # groups dropped (they no longer exist in the joined view)
        stored = self.read(spark)
        out_cols = ["n_rows", *self.sum_cols]
        folded = (
            stored.select(*self.group_cols, *out_cols)
            .unionByName(t1.select(*self.group_cols, *out_cols))
            .unionByName(t2.select(*self.group_cols, *out_cols))
            .groupBy(*self.group_cols)
            .agg(
                *[
                    F.sum(c).cast("long").alias(c)
                    for c in out_cols
                ]
            )
            .filter(F.col("n_rows") > 0)
        )
        meta["version"] += 1
        meta["applied_fact"], meta["applied_dim"] = sF, sD
        self._commit(folded, meta)
        # GC superseded versions (state is tiny, but unbounded dirs decay
        # listing like any other versioned store)
        import shutil

        for p in self.root.glob("v=*"):
            if int(p.name.split("=", 1)[1]) < meta["version"]:
                shutil.rmtree(p, ignore_errors=True)
        return sF, sD
