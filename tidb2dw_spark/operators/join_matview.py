"""Incremental maintenance of JOIN rollups from multiple change feeds.

:mod:`.matview` keeps single-table aggregates fresh in O(changes); the
next thing every warehouse deployment builds on a replicated set is a
JOINED rollup — revenue by customer segment, quantity by part brand and
supplier nation — and re-running the join per CDC batch re-scans every
table.  This module maintains ``SELECT g…, COUNT(*), SUM(m)… FROM fact
JOIN dim1 ON fact.fk1 = dim1.pk [JOIN dim2 …] GROUP BY g…``
incrementally from all the tables' change data feeds, the classic delta
algebra for materialized join views (Blakeley et al., SIGMOD'86; the
same shape Snowflake/BigQuery incremental MVs implement), telescoped
over the star:

    Δ(F ⋈ D1 ⋈ … ⋈ Dn) =  ΔF ⋈ D1_old ⋈ … ⋈ Dn_old
                        ∪  F_new ⋈ ΔD1 ⋈ D2_old ⋈ … ⋈ Dn_old
                        ∪  F_new ⋈ D1_new ⋈ ΔD2 ⋈ D3_old ⋈ …
                        ∪  …
                        ∪  F_new ⋈ D1_new ⋈ … ⋈ D(n-1)_new ⋈ ΔDn

with SIGNED change rows (+1 insert/update_postimage, −1
delete/update_preimage); each term carries exactly ONE delta factor and
that factor supplies the sign.  The identity is exact for multiset
semantics — replace one factor at a time left to right and the sum
telescopes to F_new⊗D*_new − F_old⊗D*_old — so fk moves, dim attribute
moves, danglings from dim deletes, re-attachments from dim inserts, and
same-slice cross-table churn all fall out with no special cases.

Scale shape (the whole point — never O(table) per refresh):

- Old dim states are reconstructed ONLY for the fk keys a term's fact
  rows touch — ``read_for_keys`` probes the dim's PK buckets (O(touched
  buckets), pinned to the refresh's own manifests), and the slice's own
  dim changes are REVERSE-APPLIED on those keys (the pre-slice image of
  a changed key is the earliest slice event's preimage; a key whose
  earliest event is an insert had no pre-slice row).  The feeds carry
  pre-images precisely so that old states never need a second scan.
- ``F_new ⋈ ΔDi``: the fact side is read pinned and filtered to the
  changed dim keys with a LITERAL ``fk IN (…)`` predicate (batch-bounded
  collect, capped with a broadcast-semi fallback) so parquet row-group
  pruning engages — on a fact table clustered or z-ordered by fk this
  reads a handful of files.  Within such a term, the OTHER dims' probes
  are bounded by the fanout of the changed keys, not the table.
- The fold is one union → groupBy on the group key, identical to the
  single-table matview: partial aggregation map-side, NULL groups
  native, groups whose joined count reaches zero dropped.

Exactness: integer measures make incremental == full recompute
bit-for-bit; the driver rows ``pipeline_incremental_join_agg`` (one
dim) and ``pipeline_star_join_agg`` (two dims) prove the maintained
rollup equal to a DuckDB full join+group recompute after adversarial
churn on EVERY table in one refresh window.  Restrictions (asserted at
seed): each dim is keyed by its single-column PK (the N:1
warehouse-dimension shape; the reference's replicated tables always
carry a PK — tidbsql/ddl.go PK discovery), joins are INNER with plain
equality (NULL fk never matches), measures are fact-side columns, and
all consumed column names are pairwise disjoint across the tables.

Crash contract: state is versioned parquet + ``_meta.json`` committed by
``os.replace`` carrying ALL applied seqs; a crash between data write and
meta swap is repaired by the deterministic overwrite on retry, and a
crash between one table's merge and this refresh self-heals next poll
(each refresh folds exactly ``(applied, current]`` of each feed).
"""

from __future__ import annotations

import json
import os
import shutil
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
    return init_star_agg(
        fact, [(dim, fk_col, dim_pk)], group_cols, sum_cols
    )


def init_star_agg(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str]],
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
) -> DataFrame:
    """Seed the star rollup: chained inner joins (*dims* is a list of
    (dim_df, fact_fk_col, dim_pk_col)), then one groupBy."""
    joined = fact
    for dim_df, fk, pk in dims:
        joined = joined.join(dim_df, joined[fk] == dim_df[pk], "inner")
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.col(src)), F.lit(0)).alias(out)
        for out, src in sum_cols.items()
    ]
    return joined.groupBy(*[F.col(g) for g in group_cols]).agg(*aggs)


class BoundJoinAggregate:
    """A join/star view closed over its tables so it fits the
    SINGLE-table derived protocol (``exists()`` / ``refresh(spark,
    table)``) that :class:`~...replicate.TableReplicator` and
    :func:`~...streaming.stream.stream_derived_refresh` drive.

    ``refresh`` folds ALL feeds regardless of which table's poll (or
    commit-log wake-up) triggered it — each refresh applies exactly
    ``(applied, current]`` of each feed — so attaching to ONE
    replicator keeps the view fresh on that cadence, and attaching to
    several (``replicate_all`` runs them in threads) is serialized by
    an in-process lock: a second thread's refresh sees every seq
    already applied and no-ops.  *table*, when given, must be one of
    the bound set — a mis-wired attachment fails loudly instead of
    silently maintaining a view over the wrong tables."""

    def __init__(
        self,
        view,
        fact: ManagedTable,
        dims: Sequence[ManagedTable],
    ):
        self.view, self.fact, self.dims = view, fact, list(dims)
        self._lock = threading.Lock()

    def exists(self) -> bool:
        return self.view.exists()

    def read(self, spark) -> DataFrame:
        return self.view.read(spark)

    def refresh(self, spark: SparkSession, table: ManagedTable | None = None):
        if table is not None and str(Path(table.root).resolve()) not in {
            str(Path(t.root).resolve()) for t in [self.fact, *self.dims]
        }:
            raise ValueError(
                f"BoundJoinAggregate is bound to {self.fact.root} / "
                f"{[str(d.root) for d in self.dims]}; refresh was driven "
                f"by {table.root}"
            )
        with self._lock:
            return self.view.refresh_star(spark, self.fact, self.dims)


class MaintainedStarAggregate:
    """A JOIN rollup over fact ⋈ dim1 [⋈ dim2 …] maintained from every
    table's change feed.

    *dims* is an ordered list of ``(fk_col, dim_group_cols)`` — the
    fact-side join column and which output group keys that dim supplies
    (may be empty).  ``fact_group_cols`` name the fact-supplied group
    keys; together (in order: fact, then each dim) they form the output
    group key.  ``sum_cols`` maps output name → FACT column.  Each dim
    joins on its own single-column primary key."""

    def __init__(
        self,
        root,
        dims: Sequence[tuple[str, Sequence[str]]],
        fact_group_cols: Sequence[str],
        sum_cols: dict[str, str],
    ):
        self.root = Path(root)
        self.dims = [(fk, list(gc)) for fk, gc in dims]
        if not self.dims:
            raise ValueError("need at least one dim (fk_col, group_cols)")
        self.fact_group_cols = list(fact_group_cols)
        self.group_cols = self.fact_group_cols + [
            g for _, gc in self.dims for g in gc
        ]
        self.sum_cols = dict(sum_cols)

    def bind(
        self, fact: ManagedTable, dims: ManagedTable | Sequence[ManagedTable]
    ) -> BoundJoinAggregate:
        """Close over the tables → an object the single-table derived
        hooks (``TableReplicator(derived=[…])``, ``stream_derived_refresh``)
        can drive."""
        dl = [dims] if isinstance(dims, ManagedTable) else list(dims)
        return BoundJoinAggregate(self, fact, dl)

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
    def _resolve(
        self,
        spark: SparkSession,
        fact: ManagedTable,
        dim_tables: list[ManagedTable],
        mF: dict,
        mDs: list[dict],
    ) -> tuple[list[str], list[int], list[str], list[list[str]]]:
        """Resolve the join topology: each dim's join column lives on the
        FACT (a star arm, owner −1) or on an EARLIER dim (a snowflake
        chain hop, owner j) — resolved by schema membership, latest
        earlier owner wins.  Returns (dim_pks, owners, fact_cols,
        dim_cols) where the consumed column lists include the chain
        columns their owner must carry through the join."""
        dim_pks = [m["pk"][0] for m in mDs]
        fact_schema = set(fact._read_state(spark, mF).columns)
        dim_schemas = [
            set(dim_tables[i]._read_state(spark, mDs[i]).columns)
            for i in range(len(mDs))
        ]
        owners: list[int] = []
        for i, (jc, _) in enumerate(self.dims):
            if jc in fact_schema:
                owners.append(-1)
            else:
                cand = [j for j in range(i) if jc in dim_schemas[j]]
                if not cand:
                    raise ValueError(
                        f"join column {jc!r} of dim {i} is on neither the "
                        "fact nor any earlier dim"
                    )
                owners.append(cand[-1])
        fact_cols = list(
            dict.fromkeys(
                [
                    self.dims[i][0]
                    for i in range(len(self.dims))
                    if owners[i] == -1
                ]
                + self.fact_group_cols
                + list(self.sum_cols.values())
            )
        )
        dim_cols = [
            list(
                dict.fromkeys(
                    [dim_pks[j]]
                    + self.dims[j][1]
                    + [
                        self.dims[i][0]
                        for i in range(len(self.dims))
                        if owners[i] == j
                    ]
                )
            )
            for j in range(len(self.dims))
        ]
        return dim_pks, owners, fact_cols, dim_cols

    @staticmethod
    def _translated(
        names: list[str], stored_ids: dict, src_m: dict
    ) -> list:
        """Source's CURRENT names (by field id) aliased back to the names
        this view was seeded with — a base RENAME on any table neither
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
    @staticmethod
    def _signed(ch: DataFrame, cols: list) -> DataFrame:
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
    def refresh_star(
        self,
        spark: SparkSession,
        fact: ManagedTable,
        dim_tables: Sequence[ManagedTable],
    ) -> tuple:
        """Fold every feed's new commits into the rollup; returns the
        applied (fact_seq, dim_seq…) checkpoint.  All manifests are read
        ONCE at entry and pin every state read below — the concurrency
        contract the single-table matview established."""
        dim_tables = list(dim_tables)
        if len(dim_tables) != len(self.dims):
            raise ValueError(
                f"view has {len(self.dims)} dims, got {len(dim_tables)} tables"
            )
        mF = fact.manifest()
        mDs = [d.manifest() for d in dim_tables]
        for name, m, t in [
            ("fact", mF, fact),
            *[(f"dim{i}", mDs[i], dim_tables[i]) for i in range(len(mDs))],
        ]:
            if not m.get("cdf"):
                raise ValueError(
                    f"{name} table {t.root} has no change data feed "
                    "(create(cdf=True))"
                )
        for i, m in enumerate(mDs):
            if len(m["pk"]) != 1:
                raise ValueError(
                    "star dims join on their single-column PK; "
                    f"{dim_tables[i].root} has PK {m['pk']}"
                )
        sF = mF.get("cdf_seq", 0)
        sDs = [m.get("cdf_seq", 0) for m in mDs]

        if not self.exists():
            dim_pks, owners, fact_cols, dim_cols = self._resolve(
                spark, fact, dim_tables, mF, mDs
            )
            seen: set[str] = set()
            for cols in [fact_cols, *dim_cols]:
                overlap = seen & set(cols)
                if overlap:
                    raise ValueError(
                        f"consumed columns overlap on {sorted(overlap)}; "
                        "the tables' names must be pairwise disjoint so "
                        "unqualified group/measure references stay unambiguous"
                    )
                seen |= set(cols)
            seed = init_star_agg(
                fact._read_state(spark, mF).select(*fact_cols),
                [
                    (
                        dim_tables[i]
                        ._read_state(spark, mDs[i])
                        .select(*dim_cols[i]),
                        self.dims[i][0],
                        dim_pks[i],
                    )
                    for i in range(len(self.dims))
                ],
                self.group_cols,
                self.sum_cols,
            )
            f_ids = mF.get("field_ids", {})
            self._commit(
                seed,
                {
                    "version": 1,
                    "applied_fact": sF,
                    "applied_dims": sDs,
                    "dim_pks": dim_pks,
                    "owners": owners,
                    "fact_cols": fact_cols,
                    "dim_cols": dim_cols,
                    "fact_field_ids": {
                        n: f_ids[n] for n in fact_cols if n in f_ids
                    },
                    "dim_field_ids": [
                        {
                            n: mDs[i].get("field_ids", {})[n]
                            for n in dim_cols[i]
                            if n in mDs[i].get("field_ids", {})
                        }
                        for i in range(len(self.dims))
                    ],
                },
            )
            return (sF, *sDs)

        meta = self.meta()
        aF, aDs = meta["applied_fact"], meta["applied_dims"]
        dim_pks = meta["dim_pks"]
        owners = meta["owners"]
        fact_cols, dim_cols = meta["fact_cols"], meta["dim_cols"]
        if sF <= aF and all(s <= a for s, a in zip(sDs, aDs)):
            return (aF, *aDs)

        meta_keep = [CHANGE_TYPE_COL, COMMIT_SEQ_COL]
        dF = self._signed(
            fact.changes(spark, since=aF, until=sF).select(
                *self._translated(
                    fact_cols, meta.get("fact_field_ids", {}), mF
                ),
                *meta_keep,
            ),
            [F.col(c) for c in fact_cols],
        )
        d_ids = meta.get("dim_field_ids") or [{}] * len(self.dims)
        dDs = [
            self._signed(
                dim_tables[i]
                .changes(spark, since=aDs[i], until=sDs[i])
                .select(
                    *self._translated(dim_cols[i], d_ids[i], mDs[i]),
                    *meta_keep,
                ),
                [F.col(c) for c in dim_cols[i]],
            )
            for i in range(len(self.dims))
        ]

        def keys_of(frame: DataFrame, jc: str, cur_pk: str) -> DataFrame:
            """Distinct non-NULL join-column values of *frame*, under the
            dim's CURRENT pk name (read_for_keys semi-joins on the live
            manifest's pk)."""
            return (
                frame.filter(F.col(jc).isNotNull())
                .select(F.col(jc).alias(cur_pk))
                .distinct()
            )

        def dim_state(i: int, keys: DataFrame) -> DataFrame:
            """CURRENT (slice-end) dim rows for *keys* — bucket-pruned
            probe PINNED to this refresh's manifest, translated to seed
            names."""
            return dim_tables[i].read_for_keys(
                spark, keys, manifest=mDs[i]
            ).select(*self._translated(dim_cols[i], d_ids[i], mDs[i]))

        def dim_full_state(i: int) -> DataFrame:
            """Full CURRENT dim state (dim-sized scan) — used only to
            resolve a chain hop's key set; dims are the small side of a
            star/snowflake by construction."""
            return dim_tables[i]._read_state(spark, mDs[i]).select(
                *self._translated(dim_cols[i], d_ids[i], mDs[i])
            )

        def dim_old(i: int, keys: DataFrame) -> DataFrame:
            """PRE-SLICE dim rows for *keys*: current rows for keys the
            slice didn't touch, ∪ the earliest slice event's preimage for
            keys it did (a key whose earliest event is an insert had no
            pre-slice row)."""
            pk = dim_pks[i]
            d_cur = dim_state(i, keys)
            w = Window.partitionBy(pk).orderBy(
                F.asc("__seq"), F.asc(F.col("__ct").isin(*_ADD).cast("int"))
            )
            first_ev = (
                dDs[i]
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            changed = dDs[i].select(pk).distinct()
            return d_cur.join(
                F.broadcast(changed), on=pk, how="left_anti"
            ).unionByName(
                first_ev.filter(F.col("__ct").isin(*_SUB)).select(
                    *dim_cols[i]
                )
            )

        n = len(self.dims)
        cur_pks = [m["pk"][0] for m in mDs]
        terms: list[DataFrame] = []

        # ---- term 0: ΔF ⋈ (every dim OLD), dim states reconstructed per
        # join key the ACCUMULATED frame reaches — for a chain hop the
        # key column arrives with the owning dim's join, so keys project
        # from the partial join, not the fact slice alone
        t0 = dF.alias("f")
        for i in range(n):
            jc = self.dims[i][0]
            t0 = t0.join(
                dim_old(i, keys_of(t0, jc, cur_pks[i])),
                F.col(jc) == F.col(dim_pks[i]),
                "inner",
            )
        terms.append(self._delta_rows(t0, F.col("f.__sign")))

        # ---- term i (1-indexed): F_new(reaching ΔDi) ⋈ D_j<i NEW ⋈
        # ΔDi ⋈ D_j>i OLD — one term per dim with slice activity.  The
        # fact restriction walks the ownership chain back to the fact:
        # star arm → literal fk IN; chain hop → filter the owning dim's
        # (dim-sized) state by the changed attribute values, then recurse
        # on ITS pks — every level batch-bounded and capped.
        def fact_filter_for(i: int, values: list) -> F.Column | None:
            """A fact-scan predicate selecting rows whose join chain can
            reach dim *i* keys in *values*; None = give up (over cap) and
            let the inner joins restrict."""
            jc = self.dims[i][0]
            if owners[i] == -1:
                return F.col(jc).isin(values)
            j = owners[i]
            hop = (
                dim_full_state(j)
                .filter(F.col(jc).isin(values))
                .select(dim_pks[j])
                .limit(_FK_LITERAL_CAP + 1)
                .collect()
            )
            if len(hop) > _FK_LITERAL_CAP:
                return None
            return fact_filter_for(j, [r[dim_pks[j]] for r in hop])

        f_state = None
        for i in range(n):
            changed_i = dDs[i].select(dim_pks[i]).distinct()
            key_rows = changed_i.limit(_FK_LITERAL_CAP + 1).collect()
            if not key_rows:
                continue
            if f_state is None:
                f_state = fact._read_state(spark, mF).select(
                    *self._translated(
                        fact_cols, meta.get("fact_field_ids", {}), mF
                    )
                )
            pred = (
                fact_filter_for(i, [r[dim_pks[i]] for r in key_rows])
                if len(key_rows) <= _FK_LITERAL_CAP
                else None
            )
            if pred is not None:
                f_new = f_state.filter(pred)
            elif owners[i] == -1:
                # over-cap star arm: broadcast semi-join (full scan,
                # filtered) — same trade as matview's dirty cap
                f_new = f_state.join(
                    F.broadcast(
                        changed_i.withColumnRenamed(
                            dim_pks[i], self.dims[i][0]
                        )
                    ),
                    on=self.dims[i][0],
                    how="left_semi",
                )
            else:
                # over-cap chain hop: the inner joins restrict
                f_new = f_state
            ti = f_new.alias("f")
            for j in range(n):
                jc_j = self.dims[j][0]
                if j == i:
                    ti = ti.join(
                        dDs[i].alias("d"),
                        F.col(jc_j) == F.col(f"d.{dim_pks[i]}"),
                        "inner",
                    )
                else:
                    keys_j = keys_of(ti, jc_j, cur_pks[j])
                    side = (
                        dim_state(j, keys_j)
                        if j < i
                        else dim_old(j, keys_j)
                    )
                    ti = ti.join(
                        side,
                        F.col(jc_j) == F.col(dim_pks[j]),
                        "inner",
                    )
            terms.append(self._delta_rows(ti, F.col("d.__sign")))

        # ---- fold: one union → groupBy on the group key, zero-count
        # groups dropped (they no longer exist in the joined view)
        stored = self.read(spark)
        out_cols = ["n_rows", *self.sum_cols]
        folded = stored.select(*self.group_cols, *out_cols)
        for t in terms:
            folded = folded.unionByName(t.select(*self.group_cols, *out_cols))
        folded = (
            folded.groupBy(*self.group_cols)
            .agg(*[F.sum(c).cast("long").alias(c) for c in out_cols])
            .filter(F.col("n_rows") > 0)
        )
        meta["version"] += 1
        meta["applied_fact"], meta["applied_dims"] = sF, sDs
        self._commit(folded, meta)
        # GC superseded versions (state is tiny, but unbounded dirs decay
        # listing like any other versioned store)
        for p in self.root.glob("v=*"):
            if int(p.name.split("=", 1)[1]) < meta["version"]:
                shutil.rmtree(p, ignore_errors=True)
        return (sF, *sDs)


class MaintainedJoinAggregate(MaintainedStarAggregate):
    """The one-dim star — kept as its own name because the fact ⋈ dim
    rollup is the overwhelmingly common case and reads better at call
    sites.  ``refresh(spark, fact, dim)`` is the two-table surface the
    driver row ``pipeline_incremental_join_agg`` exercises."""

    def __init__(
        self,
        root,
        fk_col: str,
        fact_group_cols: Sequence[str],
        dim_group_cols: Sequence[str],
        sum_cols: dict[str, str],
    ):
        super().__init__(
            root, [(fk_col, dim_group_cols)], fact_group_cols, sum_cols
        )
        self.fk_col = fk_col
        self.dim_group_cols = list(dim_group_cols)

    def refresh(
        self, spark: SparkSession, fact: ManagedTable, dim: ManagedTable
    ) -> tuple[int, int]:
        sF, sD = self.refresh_star(spark, fact, [dim])
        return sF, sD
