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
- MIN/MAX measures (fact-side) follow matview.py's algebra through the
  join: add rows tighten inside the same fold; removals touching a
  stored extremum mark the group DIRTY, and dirty groups are re-derived
  from the CURRENT join restricted by literal group-key boxes pushed to
  the fact and dim scans — plus each attr-supplying dim's box-matching
  pks walked back through the ownership chain to a literal fact
  predicate — so the rescan is O(dirty groups' rows), capped with a
  broadcast-semi fallback (``_rescan_override``).

Exactness: integer measures make incremental == full recompute
bit-for-bit; the driver rows ``pipeline_incremental_join_agg`` (one
dim) and ``pipeline_star_join_agg`` (two dims) prove the maintained
rollup equal to a DuckDB full join+group recompute after adversarial
churn on EVERY table in one refresh window.  Restrictions (asserted at
seed): each dim is keyed by its PK — single-column or COMPOSITE, the fk
tuple's arity matching (the N:1 warehouse-dimension shape incl.
partsupp-style two-part keys; the reference's replicated tables always
carry a PK — tidbsql/ddl.go PK discovery), joins are INNER with plain
equality (a NULL in any fk member never matches), measures are
fact-side columns, and all consumed column names are pairwise disjoint
across the tables.

Crash contract: state is versioned parquet + ``_meta.json`` committed by
``os.replace`` carrying ALL applied seqs; a crash between data write and
meta swap is repaired by the deterministic overwrite on retry, and a
crash between one table's merge and this refresh self-heals next poll
(each refresh folds exactly ``(applied, current]`` of each feed).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import tempfile
import threading
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..table.managed import CHANGE_TYPE_COL, COMMIT_SEQ_COL, ManagedTable
from .matview import (
    DIRTY_LITERAL_CAP,
    literal_group_box,
    nullsafe_group_eq,
    typed_in_lits,
)

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")
# past this many changed dim keys, the literal fk IN (...) predicate is
# replaced by a broadcast semi-join — the SAME cap as matview's dirty
# rescan so the literal-vs-broadcast trade can't drift between the two
_FK_LITERAL_CAP = DIRTY_LITERAL_CAP

# a measure source that is a bare identifier resolves as a column by
# schema membership; anything else is a row-local SQL expression whose
# dependencies must be declared (measure_cols / fact_derived_cols deps)
_IDENT = re.compile(r"[A-Za-z_][A-Za-z0-9_]*")


def _join_eq(
    left_cols: Sequence[str], right_cols: Sequence[str],
    right_alias: str | None = None,
):
    """Conjunctive equi-join condition over zipped column lists (the
    composite-key generalization of ``F.col(fk) == F.col(pk)``);
    unqualified names stay unambiguous because consumed columns are
    pairwise disjoint across the view's tables (asserted at seed)."""
    cond = None
    for lc, rc in zip(left_cols, right_cols):
        r = F.col(f"{right_alias}.{rc}") if right_alias else F.col(rc)
        eq = F.col(lc) == r
        cond = eq if cond is None else (cond & eq)
    return cond


def _in_box(cols: Sequence[str], key_tuples: list, dtypes: dict | None):
    """Per-column literal IN over PK *key_tuples* — EXACT for a single
    column, a SUPERSET box for composites.  Every call site is
    pruning-only (an inner equi-join downstream enforces exactness), so
    the superset is safe; literals reach the parquet scan for row-group
    pruning.  PK values are non-NULL by contract; temporal members take
    :func:`..matview.typed_in_lits`'s DST-safe ISO-cast path."""
    pred = None
    for ci, c in enumerate(cols):
        lits = typed_in_lits(
            [t[ci] for t in key_tuples], (dtypes or {}).get(c)
        )
        p = F.col(c).isin(lits) if lits else F.lit(False)
        pred = p if pred is None else (pred & p)
    return pred


def init_join_agg(
    fact: DataFrame,
    dim: DataFrame,
    fk_col: str,
    dim_pk: str,
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Seed: the full inner-join rollup
    (group_cols…, n_rows, <out>=SUM(<fact src>)…), NULL-as-zero sums —
    the same convention :func:`..matview.init_agg` pins, for the same
    reason (± folding cannot express an all-NULL revival)."""
    return init_star_agg(
        fact, [(dim, fk_col, dim_pk)], group_cols, sum_cols,
        min_cols, max_cols,
    )


def _seed_join(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, str, str]]
) -> DataFrame:
    """The full seed join: chained inner joins (*dims* is a list of
    (dim_df, fact_fk_col(s), dim_pk_col(s)))."""
    joined = fact
    for dim_df, fk, pk in dims:
        fks = [fk] if isinstance(fk, str) else list(fk)
        pks = [pk] if isinstance(pk, str) else list(pk)
        cond = None
        for fc, pc in zip(fks, pks):
            eq = joined[fc] == dim_df[pc]
            cond = eq if cond is None else (cond & eq)
        joined = joined.join(dim_df, cond, "inner")
    return joined


def init_star_agg(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, str, str]],
    group_cols: Sequence[str],
    sum_cols: dict[str, str],
    min_cols: dict[str, str] | None = None,
    max_cols: dict[str, str] | None = None,
    join_where: str | None = None,
) -> DataFrame:
    """Seed the star rollup: chained inner joins (*dims* is a list of
    (dim_df, fact_fk_col, dim_pk_col)), an optional row-local predicate
    over the JOINED row (*join_where* — cross-table columns allowed),
    then one groupBy."""
    joined = _seed_join(fact, dims)
    if join_where:
        joined = joined.filter(F.expr(join_where))
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.coalesce(F.sum(F.expr(src)), F.lit(0)).alias(out)
        for out, src in sum_cols.items()
    ]
    aggs += [F.min(F.expr(src)).alias(out) for out, src in (min_cols or {}).items()]
    aggs += [F.max(F.expr(src)).alias(out) for out, src in (max_cols or {}).items()]
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

    *dims* is an ordered list of ``(fk_cols, dim_group_cols)`` — the
    join column(s) (a name, or a sequence of names for a COMPOSITE key;
    all must live on the same owner) and which output group keys that
    dim supplies (may be empty).  ``fact_group_cols`` name the
    fact-supplied group keys; together (in order: fact, then each dim)
    they form the output group key.  ``sum_cols`` maps output name →
    a ROW-LOCAL SQL expression over the JOINED row (a bare column name
    is the common case; ``CASE WHEN o_orderpriority IN (…) THEN 1 ELSE
    0 END`` maintains a conditional count through the join — TPC-H
    Q12's shape).  Row-locality is what keeps the delta algebra exact:
    SUM/MIN/MAX of a per-row expression commute with the signed
    multiset delta exactly as a raw column does.  Columns an
    EXPRESSION consumes must be declared in ``measure_cols`` (plain
    names, auto-resolved to the fact or the single dim that owns
    them); bare-name measures resolve themselves the same way.

    ``fact_derived_cols`` maps name → ``(row-local SQL expr over FACT
    columns, [dependency columns])``; derived names behave as ordinary
    fact columns downstream — usable as ``fact_group_cols`` members
    (e.g. ``year(l_shipdate)`` keeps a maintained rollup at year grain
    instead of date grain — the cardinality lever that matters at
    100 TB) and as measure sources.  They are computed at every fact
    materialization point (seed, change slices, pinned state reads),
    so the persisted view never stores the dependency columns.

    Each dim joins on its (possibly composite) primary key — arity
    must match its fk tuple (the partsupp-style dim the reference
    replicates via multi-column PK discovery, tidbsql/ddl.go).

    Consistent pins: set ``keep_versions`` (attribute, default 1) to
    retain that many recent state versions plus a seq-VECTOR → version
    map in the meta, so :class:`~..table.consistent.ConsistentSnapshot`
    can pin this multi-source view at the exact
    (fact_seq, dim_seq…) checkpoint its pinned tables resolve to
    (:meth:`version_for_seqs` / :meth:`read_at_seqs` — the join-view
    analogue of the single-table ``version_for_seq`` protocol)."""

    keep_versions: int = 1

    @staticmethod
    def _cols(x) -> list[str]:
        return [x] if isinstance(x, str) else list(x)

    def __init__(
        self,
        root,
        dims: Sequence[tuple[str, Sequence[str]]],
        fact_group_cols: Sequence[str],
        sum_cols: dict[str, str],
        min_cols: dict[str, str] | None = None,
        max_cols: dict[str, str] | None = None,
        fact_where: str | None = None,
        fact_where_cols: Sequence[str] | None = None,
        dim_wheres: Sequence[str | None] | None = None,
        dim_where_cols: Sequence[Sequence[str]] | None = None,
        join_where: str | None = None,
        measure_cols: Sequence[str] | None = None,
        fact_derived_cols: dict[str, tuple[str, Sequence[str]]] | None = None,
        dim_renames: Sequence[dict[str, str] | None] | None = None,
    ):
        self.root = Path(root)
        self.dims = [(self._cols(fk), list(gc)) for fk, gc in dims]
        if not self.dims:
            raise ValueError("need at least one dim (fk_col, group_cols)")
        # row-local SQL predicate over FACT columns: the view aggregates
        # σ_where(F) ⋈ dims.  Row-locality on the fact makes σ commute
        # with Δ — applying it to the fact's change slice and to every
        # pinned fact-state read is the whole implementation.
        self.fact_where = fact_where
        self.fact_where_cols = list(fact_where_cols or [])
        # row-local predicate over the JOINED row — the cross-dim
        # equality a deep snowflake needs (TPC-H Q5's
        # c_nationkey = s_nationkey).  It commutes with the delta
        # decomposition because the terms enumerate exactly the joined
        # view's multiset delta rows and σ_J judges each joined row
        # independently: σ_J(Δ(J)) = Δ(σ_J(J)).  Columns it references
        # must be consumed — group/measure/where columns are; extra
        # dim-side columns ride that dim's dim_where_cols (legal without
        # a dim_where), extra fact columns ride fact_where_cols.
        self.join_where = join_where
        if self.fact_where_cols and not (fact_where or join_where):
            raise ValueError("fact_where_cols given without fact_where")
        # per-dim row-local predicates: the view aggregates
        # σF(F) ⋈ σ1(D1) ⋈ … — each σi is applied to dim i's seed state,
        # its change slice (pre- AND post-images, so an attribute move
        # across the predicate boundary folds as a one-sided dim
        # remove/add), and every reconstructed state (current, old, full).
        # The pre-slice reconstruction stays exact under filtering: a key
        # whose earliest FILTERED event is a preimage was in σ(D_old) with
        # exactly that row; a key whose earliest filtered event is a
        # postimage was not; a key with no filtered events reconstructs
        # from its (filtered) current row.
        self.dim_wheres = list(dim_wheres) if dim_wheres else [None] * len(self.dims)
        if len(self.dim_wheres) != len(self.dims):
            raise ValueError(
                f"dim_wheres has {len(self.dim_wheres)} entries for "
                f"{len(self.dims)} dims"
            )
        self.dim_where_cols = [
            list(c) for c in (dim_where_cols or [[]] * len(self.dims))
        ]
        if len(self.dim_where_cols) != len(self.dims):
            raise ValueError(
                f"dim_where_cols has {len(self.dim_where_cols)} entries "
                f"for {len(self.dims)} dims"
            )
        self.fact_group_cols = list(fact_group_cols)
        self.group_cols = self.fact_group_cols + [
            g for _, gc in self.dims for g in gc
        ]
        self.sum_cols = dict(sum_cols)
        self.min_cols = dict(min_cols or {})
        self.max_cols = dict(max_cols or {})
        self.mm_outs = list(self.min_cols) + list(self.max_cols)
        outs = ["n_rows", *self.group_cols, *self.sum_cols]
        clash = set(self.mm_outs) & set(outs)
        if clash or len(set(self.mm_outs)) != len(self.mm_outs):
            raise ValueError(
                f"min/max output names collide: {sorted(clash) or self.mm_outs}"
            )
        # ROLE-PLAYING dims: per-dim PHYSICAL→VIEW rename applied to
        # every column the view consumes from that dim (its pk included
        # when listed), so the SAME dim table can join under two roles
        # (nation as supp_nation and cust_nation — the classic date-dim
        # pattern) with disjoint output names.  The telescoped delta
        # identity replaces one join slot at a time, so it holds
        # slot-wise even when two slots are backed by one relation and
        # one feed; both roles' slices read the same (applied, current]
        # window, keeping old/new states consistent.  Group cols,
        # dim_wheres, dim_where_cols, measure references and chain join
        # cols are all written in VIEW names.
        self.dim_renames = [dict(r or {}) for r in (
            dim_renames or [{}] * len(self.dims)
        )]
        if len(self.dim_renames) != len(self.dims):
            raise ValueError(
                f"dim_renames has {len(self.dim_renames)} entries for "
                f"{len(self.dims)} dims"
            )
        for i, ren in enumerate(self.dim_renames):
            if len(set(ren.values())) != len(ren):
                raise ValueError(
                    f"dim_renames[{i}] maps two columns to one name: {ren}"
                )
        self.measure_cols = list(measure_cols or [])
        bad = [c for c in self.measure_cols if not _IDENT.fullmatch(c)]
        if bad:
            raise ValueError(
                f"measure_cols must be plain column names, got {bad!r} — "
                "put expressions in sum_cols/min_cols/max_cols values"
            )
        self.fact_derived = {
            n: (expr, list(deps))
            for n, (expr, deps) in (fact_derived_cols or {}).items()
        }
        dclash = set(self.fact_derived) & (
            set(self.mm_outs) | {"n_rows", *self.sum_cols}
        )
        if dclash:
            raise ValueError(
                f"fact_derived_cols names collide with outputs: {sorted(dclash)}"
            )

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

    @staticmethod
    def _seqvec_key(fact_seq: int, dim_seqs: Sequence[int]) -> str:
        return "|".join(str(int(s)) for s in [fact_seq, *dim_seqs])

    def _commit(self, agg: DataFrame, meta: dict) -> None:
        agg.write.mode("overwrite").parquet(
            str(self.root / f"v={meta['version']}")
        )
        self.root.mkdir(parents=True, exist_ok=True)
        # seq-vector → version map for the retained versions (the
        # consistent-pin hook); keep_versions=1 keeps newest-only
        sv = {
            str(k): int(v)
            for k, v in (meta.get("seqvec_versions") or {}).items()
        }
        sv[self._seqvec_key(meta["applied_fact"], meta["applied_dims"])] = (
            int(meta["version"])
        )
        keep = sorted(set(sv.values()), reverse=True)[
            : max(1, int(self.keep_versions))
        ]
        meta["seqvec_versions"] = {
            k: v for k, v in sv.items() if v in set(keep)
        }
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def version_for_seqs(
        self, fact_seq: int, dim_seqs: Sequence[int]
    ) -> int:
        """The RETAINED version whose fold covers EXACTLY
        (fact_seq, dim_seq…) — the multi-source half of a consistent
        pin.  Raises when the view never materialized that checkpoint
        (feeds refreshed in a different interleaving) or retention has
        dropped it: any other version is a torn read by definition."""
        sv = self.meta().get("seqvec_versions") or {}
        key = self._seqvec_key(fact_seq, dim_seqs)
        v = sv.get(key)
        if v is None:
            raise ValueError(
                f"view at {self.root} holds no state at feed checkpoint "
                f"({key}) (retained: {sorted(sv)}); refresh once per "
                "source commit round and/or raise keep_versions to "
                "cover the pin window"
            )
        return int(v)

    def read_at_seqs(
        self, spark: SparkSession, fact_seq: int, dim_seqs: Sequence[int]
    ) -> DataFrame:
        """This view's state as of the (fact, dims…) feed checkpoint."""
        return spark.read.parquet(
            str(self.root / f"v={self.version_for_seqs(fact_seq, dim_seqs)}")
        )

    def _seed_commit(
        self,
        spark: SparkSession,
        f_seed: DataFrame,
        d_seeds: list[DataFrame],
        dim_pks: list[list[str]],
        meta: dict,
    ) -> None:
        """Aggregate the seed join and commit version 1 (subclass hook:
        the distinct view also writes its support store here)."""
        seed = init_star_agg(
            f_seed,
            [
                (d_seeds[i], self.dims[i][0], dim_pks[i])
                for i in range(len(self.dims))
            ],
            self.group_cols,
            self.sum_cols,
            self.min_cols,
            self.max_cols,
            join_where=self.join_where,
        )
        self._commit(seed, meta)

    def _extra_cols(self) -> list[str]:
        """Additional FACT columns a subclass consumes (e.g. a distinct
        view's source columns) — rides ``_resolve``'s fact set so the
        feed projection, field-id pinning, and rename translation all
        cover them."""
        return []

    # -- column sets ------------------------------------------------------
    def _resolve(
        self,
        spark: SparkSession,
        fact: ManagedTable,
        dim_tables: list[ManagedTable],
        mF: dict,
        mDs: list[dict],
    ) -> tuple[list[str], list[int], list[str], list[list[str]]]:
        """Resolve the join topology: each dim's join column(s) live on
        the FACT (a star arm, owner −1) or on an EARLIER dim (a snowflake
        chain hop, owner j) — resolved by schema membership (a composite
        key's columns must ALL live on the same owner), latest earlier
        owner wins.  Returns (dim_pks, owners, fact_cols, dim_cols)
        where the consumed column lists include the chain columns their
        owner must carry through the join."""
        fact_schema = set(fact._read_state(spark, mF).columns)
        phys_schemas = [
            set(dim_tables[i]._read_state(spark, mDs[i]).columns)
            for i in range(len(mDs))
        ]
        for i, ren in enumerate(self.dim_renames):
            missing = [c for c in ren if c not in phys_schemas[i]]
            if missing:
                raise ValueError(
                    f"dim_renames[{i}] renames {missing!r} which are not "
                    f"columns of {dim_tables[i].root}"
                )
            # a rename TARGET colliding with a physical column that is
            # NOT itself renamed away would collapse silently in the
            # dim_schemas set and _phys_map would invert the view name
            # to the wrong physical column — misread data, so fail loud
            collide = sorted(
                v
                for v in ren.values()
                if v in phys_schemas[i] and v not in ren
            )
            if collide:
                raise ValueError(
                    f"dim_renames[{i}] rename target(s) {collide!r} "
                    f"collide with physical columns of "
                    f"{dim_tables[i].root} that are not themselves "
                    "renamed away — two columns would share one view name"
                )
        # everything below operates in VIEW names: the pk and schema of
        # each dim pass through its role rename
        dim_pks = [
            [self.dim_renames[i].get(p, p) for p in mDs[i]["pk"]]
            for i in range(len(mDs))
        ]
        dim_schemas = [
            {self.dim_renames[i].get(c, c) for c in phys_schemas[i]}
            for i in range(len(mDs))
        ]
        owners: list[int] = []
        for i, (jcs, _) in enumerate(self.dims):
            cand = [
                j
                for j in range(i)
                if all(c in dim_schemas[j] for c in jcs)
            ]
            if all(c in fact_schema for c in jcs):
                if cand:
                    raise ValueError(
                        f"join column(s) {jcs!r} of dim {i} are ambiguous: "
                        f"they exist on the fact AND on earlier dim(s) "
                        f"{cand} — rename one side so the topology is "
                        "explicit"
                    )
                owners.append(-1)
            else:
                if not cand:
                    raise ValueError(
                        f"join column(s) {jcs!r} of dim {i} live on "
                        "neither the fact nor any single earlier dim "
                        "(a composite key cannot straddle tables)"
                    )
                if len(cand) > 1:
                    raise ValueError(
                        f"join column(s) {jcs!r} of dim {i} are ambiguous: "
                        f"they exist on earlier dims {cand} — rename so "
                        "the topology is explicit"
                    )
                owners.append(cand[-1])
        # measures: bare-name sources resolve by schema membership (fact
        # first, else the single dim that owns them); expression sources
        # contribute nothing here — their dependencies arrive via
        # measure_cols (resolved the same way) or fact_derived deps.
        # Derived names are synthesized post-projection, never read.
        derived_names = set(self.fact_derived)
        measure_srcs = [
            s
            for s in (
                list(self.sum_cols.values())
                + list(self.min_cols.values())
                + list(self.max_cols.values())
            )
            if _IDENT.fullmatch(s)
        ]
        fact_measures: list[str] = []
        dim_measures: list[list[str]] = [[] for _ in self.dims]
        for s in dict.fromkeys(measure_srcs + self.measure_cols):
            if s in derived_names:
                continue
            owner_dims = [j for j, sch in enumerate(dim_schemas) if s in sch]
            if s in fact_schema:
                if owner_dims:
                    raise ValueError(
                        f"measure column {s!r} is ambiguous: it exists on "
                        f"the fact AND on dim(s) {owner_dims} — rename one "
                        "side"
                    )
                fact_measures.append(s)
            elif len(owner_dims) == 1:
                dim_measures[owner_dims[0]].append(s)
            elif owner_dims:
                raise ValueError(
                    f"measure column {s!r} is ambiguous across dims "
                    f"{owner_dims} — rename so the owner is explicit"
                )
            else:
                raise ValueError(
                    f"measure column {s!r} exists on neither the fact nor "
                    "any dim (expressions must declare their columns via "
                    "measure_cols, or compute them via fact_derived_cols)"
                )
        for n, (expr, deps) in self.fact_derived.items():
            missing = [c for c in deps if c not in fact_schema]
            if missing:
                raise ValueError(
                    f"fact_derived_cols[{n!r}] depends on {missing!r} "
                    "which are not fact columns (derived columns are "
                    "fact-side by contract — dim-attribute expressions "
                    "belong in the measure expressions themselves)"
                )
            if n in fact_schema:
                raise ValueError(
                    f"fact_derived_cols name {n!r} shadows a physical "
                    "fact column — rename the derived column"
                )
        fact_cols = list(
            dict.fromkeys(
                [
                    c
                    for i in range(len(self.dims))
                    if owners[i] == -1
                    for c in self.dims[i][0]
                ]
                + [g for g in self.fact_group_cols if g not in derived_names]
                + fact_measures
                + [
                    c
                    for _, deps in self.fact_derived.values()
                    for c in deps
                ]
                + self.fact_where_cols
                + self._extra_cols()
            )
        )
        bad_group = [
            g
            for g in self.fact_group_cols
            if g not in derived_names and g not in fact_schema
        ]
        if bad_group:
            raise ValueError(
                f"fact_group_cols {bad_group!r} are neither fact columns "
                "nor fact_derived_cols names"
            )
        dim_cols = [
            list(
                dict.fromkeys(
                    dim_pks[j]
                    + self.dims[j][1]
                    + self.dim_where_cols[j]
                    + dim_measures[j]
                    + [
                        c
                        for i in range(len(self.dims))
                        if owners[i] == j
                        for c in self.dims[i][0]
                    ]
                )
            )
            for j in range(len(self.dims))
        ]
        return dim_pks, owners, fact_cols, dim_cols

    @staticmethod
    def _translated(
        names: list[str], stored_ids: dict, src_m: dict,
        phys: dict | None = None,
    ) -> list:
        """Source's CURRENT names (by field id) aliased back to the names
        this view was seeded with — a base RENAME on any table neither
        breaks the fold nor mutates the view's output schema (the same
        translation MaintainedAggregate/SecondaryIndex perform).
        *phys* maps a role-renamed VIEW name to its seed-time PHYSICAL
        column (identity when absent): field ids are stored per VIEW
        name, so the role rename composes with base-RENAME survival."""
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        cols = []
        for n in names:
            base = (phys or {}).get(n, n)
            cur = inv.get(stored_ids.get(n), base) if stored_ids else base
            cols.append(F.col(cur).alias(n) if cur != n else F.col(n))
        return cols

    def _phys_map(self, i: int) -> dict[str, str]:
        """VIEW name → seed-time PHYSICAL column for dim *i* (inverse of
        its role rename; identity entries omitted)."""
        return {v: k for k, v in self.dim_renames[i].items()}

    def _with_derived(self, df: DataFrame) -> DataFrame:
        """Synthesize the fact-derived columns onto a fact-side frame —
        applied at EVERY fact materialization (seed, change slice,
        pinned state reads) so downstream machinery sees them as
        ordinary columns.  Definition order allows later derived
        columns to reference earlier ones."""
        for n, (expr, _) in self.fact_derived.items():
            df = df.withColumn(n, F.expr(expr))
        return df

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
        """(group…, ±measures, ±1[, add/remove-side extrema]) contribution
        rows from a joined signed delta frame.  The add-side extremum is
        NULL on remove rows and vice versa, so min/max aggregation in the
        fold sees each side separately."""
        return joined.select(
            *[F.col(g) for g in self.group_cols],
            *[
                (sign * F.coalesce(F.expr(src), F.lit(0))).alias(out)
                for out, src in self.sum_cols.items()
            ],
            sign.alias("n_rows"),
            *[
                F.when(sign > 0, F.expr(src)).alias(f"__add_{out}")
                for out, src in {**self.min_cols, **self.max_cols}.items()
            ],
            *[
                F.when(sign < 0, F.expr(src)).alias(f"__rem_{out}")
                for out, src in {**self.min_cols, **self.max_cols}.items()
            ],
        )

    def _rescan_override(
        self,
        spark: SparkSession,
        folded: DataFrame,
        dirty_keys: DataFrame,
        dirty_rows: list,
        tightened: list,
        out_cols: list[str],
        fact: ManagedTable,
        mF: dict,
        mDs: list[dict],
        meta: dict,
        f_state: DataFrame | None,
        dim_full_state,
        fact_filter_for,
        dim_pks: list[list[str]],
    ) -> DataFrame:
        """Re-derive the dirty groups' extrema from the CURRENT join and
        override them in *folded*.

        Under the cap the restriction is LITERAL: a per-column IN box on
        the fact's own group columns, a per-column IN box on each dim's
        group attributes (pushed to the dim scans), and — because the
        group key lives mostly dim-side — each attr-supplying dim's
        box-matching pks walked back through the ownership chain to a
        literal fact predicate (capped per hop), so the fact scan prunes
        too instead of relying on the inner joins alone.  The box is a
        SUPERSET filter on group columns only, so any group it admits is
        recomputed completely and overriding a matched non-dirty group
        stays exact.  Past the cap: full join, broadcast-semi filtered to
        the dirty keys."""
        under_cap = len(dirty_rows) <= _FK_LITERAL_CAP

        def box(cols: list[str], frame: DataFrame) -> F.Column | None:
            # the frame supplies column dtypes so temporal members take
            # the DST-safe ISO-cast literal path (ADVICE: the collected
            # local-datetime → mktime round-trip is lossy on non-UTC
            # drivers in fold/gap hours)
            return literal_group_box(dirty_rows, cols, dict(frame.dtypes))

        def _nullsafe(left: str, right: str) -> F.Column:
            return nullsafe_group_eq(left, right, self.group_cols)

        if f_state is None:
            f_state = self._with_derived(
                fact._read_state(spark, mF).select(
                    *self._translated(
                        meta["fact_cols"], meta.get("fact_field_ids", {}), mF
                    )
                )
            )
            if self.fact_where:
                f_state = f_state.filter(F.expr(self.fact_where))
        joined = f_state
        if under_cap:
            fp = box(self.fact_group_cols, f_state)
            if fp is not None:
                joined = joined.filter(fp)
            for i in range(len(self.dims)):
                if not self.dims[i][1]:
                    continue
                d_state = dim_full_state(i)
                rows = (
                    d_state
                    .filter(box(self.dims[i][1], d_state))
                    .select(*dim_pks[i])
                    .limit(_FK_LITERAL_CAP + 1)
                    .collect()
                )
                if not rows or len(rows) > _FK_LITERAL_CAP:
                    continue
                pred = fact_filter_for(
                    i, [tuple(r[p] for p in dim_pks[i]) for r in rows]
                )
                if pred is not None:
                    joined = joined.filter(pred)
        for i in range(len(self.dims)):
            side = dim_full_state(i)
            bp = box(self.dims[i][1], side) if under_cap else None
            if bp is not None:
                side = side.filter(bp)
            joined = joined.join(
                side, _join_eq(self.dims[i][0], dim_pks[i]), "inner"
            )
        if self.join_where:
            joined = joined.filter(F.expr(self.join_where))
        if not under_cap:
            joined = joined.alias("__j").join(
                F.broadcast(dirty_keys.alias("__d")),
                _nullsafe("__j", "__d"),
                "left_semi",
            )
        rescan = (
            joined.groupBy(*self.group_cols)
            .agg(
                *[
                    F.min(F.expr(src)).alias(f"__rs_{o}")
                    for o, src in self.min_cols.items()
                ],
                *[
                    F.max(F.expr(src)).alias(f"__rs_{o}")
                    for o, src in self.max_cols.items()
                ],
            )
            .withColumn("__dirty", F.lit(True))
        )
        j2 = folded.alias("__f").join(
            rescan.alias("__r"), _nullsafe("__f", "__r"), "left"
        )
        sel = [F.col(f"__f.{c}").alias(c) for c in self.group_cols]
        sel += [F.col(f"__f.{c}").alias(c) for c in out_cols]
        for o, t_ in zip(self.mm_outs, tightened):
            sel.append(
                F.when(
                    F.col("__r.__dirty").isNotNull(), F.col(f"__r.__rs_{o}")
                )
                .otherwise(t_)
                .alias(o)
            )
        return j2.select(*sel)

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
            if len(m["pk"]) != len(self.dims[i][0]):
                raise ValueError(
                    f"dim {i} joins on {len(self.dims[i][0])} column(s) "
                    f"{self.dims[i][0]} but {dim_tables[i].root} has PK "
                    f"{m['pk']} — fk arity must match the dim's PK"
                )
        sF = mF.get("cdf_seq", 0)
        sDs = [m.get("cdf_seq", 0) for m in mDs]

        if not self.exists():
            dim_pks, owners, fact_cols, dim_cols = self._resolve(
                spark, fact, dim_tables, mF, mDs
            )
            # derived names join the disjointness domain: they become
            # real columns on the fact frame before any dim joins
            seen: set[str] = set(self.fact_derived)
            for cols in [fact_cols, *dim_cols]:
                overlap = seen & set(cols)
                if overlap:
                    raise ValueError(
                        f"consumed columns overlap on {sorted(overlap)}; "
                        "the tables' names must be pairwise disjoint so "
                        "unqualified group/measure references stay unambiguous"
                    )
                seen |= set(cols)
            f_seed = self._with_derived(
                fact._read_state(spark, mF).select(*fact_cols)
            )
            if self.fact_where:
                f_seed = f_seed.filter(F.expr(self.fact_where))

            def _d_seed(i: int) -> DataFrame:
                d = dim_tables[i]._read_state(spark, mDs[i]).select(
                    *self._translated(
                        dim_cols[i], {}, mDs[i], self._phys_map(i)
                    )
                )
                if self.dim_wheres[i]:
                    d = d.filter(F.expr(self.dim_wheres[i]))
                return d

            f_ids = mF.get("field_ids", {})
            meta = {
                "version": 1,
                "applied_fact": sF,
                "applied_dims": sDs,
                "fact_where": self.fact_where,
                "dim_wheres": self.dim_wheres,
                "join_where": self.join_where,
                "derived": {
                    n: [expr, deps]
                    for n, (expr, deps) in self.fact_derived.items()
                },
                "mm_outs": self.mm_outs,
                "dim_pks": dim_pks,
                "owners": owners,
                "fact_cols": fact_cols,
                "dim_cols": dim_cols,
                "fact_field_ids": {
                    n: f_ids[n] for n in fact_cols if n in f_ids
                },
                "dim_renames": self.dim_renames,
                # field ids keyed by VIEW name (role rename composed):
                # a later base RENAME translates through them as usual
                "dim_field_ids": [
                    {
                        n: mDs[i].get("field_ids", {})[
                            self._phys_map(i).get(n, n)
                        ]
                        for n in dim_cols[i]
                        if self._phys_map(i).get(n, n)
                        in mDs[i].get("field_ids", {})
                    }
                    for i in range(len(self.dims))
                ],
            }
            self._seed_commit(
                spark, f_seed,
                [_d_seed(i) for i in range(len(self.dims))],
                dim_pks, meta,
            )
            return (sF, *sDs)

        meta = self.meta()
        aF, aDs = meta["applied_fact"], meta["applied_dims"]
        # pre-composite metas stored dim_pks as bare strings
        dim_pks = [
            [p] if isinstance(p, str) else list(p) for p in meta["dim_pks"]
        ]
        missing_meta = [
            k for k in ("owners", "fact_cols", "dim_cols") if k not in meta
        ]
        if missing_meta:
            raise ValueError(
                f"view at {self.root} was seeded by an older engine version "
                f"(meta lacks {missing_meta}); delete and reseed it"
            )
        owners = meta["owners"]
        fact_cols, dim_cols = meta["fact_cols"], meta["dim_cols"]
        if meta.get("mm_outs", []) != self.mm_outs:
            raise ValueError(
                f"view at {self.root} was seeded with min/max outputs "
                f"{meta.get('mm_outs', [])}; constructed with "
                f"{self.mm_outs} — a mismatched refresh would silently "
                "drop or corrupt the maintained extrema; rebuild instead"
            )
        # bare-name min/max sources must be consumed somewhere (fact,
        # derived, or a dim); expression sources fail loudly at plan
        # time if a dependency is missing, so no static check here
        consumed = (
            set(fact_cols)
            | set(self.fact_derived)
            | {c for cols in dim_cols for c in cols}
        )
        missing_srcs = sorted(
            {
                s
                for s in {**self.min_cols, **self.max_cols}.values()
                if _IDENT.fullmatch(s) and s not in consumed
            }
        )
        if missing_srcs:
            raise ValueError(
                f"view at {self.root} was seeded without min/max source "
                f"columns {missing_srcs}; rebuild it to add them"
            )
        meta_derived = {
            n: (v[0], list(v[1]))
            for n, v in (meta.get("derived") or {}).items()
        }
        if meta_derived != self.fact_derived:
            raise ValueError(
                f"view at {self.root} was seeded with derived columns "
                f"{meta_derived!r}; constructed with "
                f"{self.fact_derived!r} — rebuild instead of mixing "
                "definitions"
            )
        if meta.get("fact_where") != self.fact_where:
            raise ValueError(
                f"view at {self.root} was seeded with fact_where="
                f"{meta.get('fact_where')!r}; constructed with "
                f"{self.fact_where!r} — rebuild instead of mixing filters"
            )
        if meta.get("dim_wheres", [None] * len(self.dims)) != self.dim_wheres:
            raise ValueError(
                f"view at {self.root} was seeded with dim_wheres="
                f"{meta.get('dim_wheres')!r}; constructed with "
                f"{self.dim_wheres!r} — rebuild instead of mixing filters"
            )
        if meta.get("join_where") != self.join_where:
            raise ValueError(
                f"view at {self.root} was seeded with join_where="
                f"{meta.get('join_where')!r}; constructed with "
                f"{self.join_where!r} — rebuild instead of mixing filters"
            )
        meta_renames = [
            dict(r) for r in meta.get("dim_renames", [{}] * len(self.dims))
        ]
        if meta_renames != self.dim_renames:
            raise ValueError(
                f"view at {self.root} was seeded with dim_renames="
                f"{meta_renames!r}; constructed with {self.dim_renames!r} "
                "— rebuild instead of mixing role layouts"
            )
        if sF <= aF and all(s <= a for s, a in zip(sDs, aDs)):
            return (aF, *aDs)

        meta_keep = [CHANGE_TYPE_COL, COMMIT_SEQ_COL]
        f_slice = self._with_derived(
            fact.changes(spark, since=aF, until=sF).select(
                *self._translated(
                    fact_cols, meta.get("fact_field_ids", {}), mF
                ),
                *meta_keep,
            )
        )
        if self.fact_where:
            # σ commutes with Δ for a row-local fact predicate: a change
            # row (pre- or post-image) contributes iff it satisfies it
            f_slice = f_slice.filter(F.expr(self.fact_where))
        dF = self._signed(
            f_slice,
            [F.col(c) for c in fact_cols + list(self.fact_derived)],
        )
        d_ids = meta.get("dim_field_ids") or [{}] * len(self.dims)

        def _d_slice(i: int) -> DataFrame:
            sl = dim_tables[i].changes(spark, since=aDs[i], until=sDs[i]).select(
                *self._translated(
                    dim_cols[i], d_ids[i], mDs[i], self._phys_map(i)
                ),
                *meta_keep,
            )
            if self.dim_wheres[i]:
                # σ commutes with Δ row-locally: pre-/post-images
                # contribute iff they satisfy the dim's predicate
                sl = sl.filter(F.expr(self.dim_wheres[i]))
            return sl

        dDs = [
            self._signed(_d_slice(i), [F.col(c) for c in dim_cols[i]])
            for i in range(len(self.dims))
        ]

        def keys_of(
            frame: DataFrame, jcs: list[str], cur_pk: list[str]
        ) -> DataFrame:
            """Distinct join-key tuples of *frame* with every member
            non-NULL (a NULL member can never match the inner equi-join),
            under the dim's CURRENT pk names (read_for_keys semi-joins on
            the live manifest's pk)."""
            f = frame
            for c in jcs:
                f = f.filter(F.col(c).isNotNull())
            return f.select(
                *[F.col(c).alias(p) for c, p in zip(jcs, cur_pk)]
            ).distinct()

        def dim_state(i: int, keys: DataFrame) -> DataFrame:
            """CURRENT (slice-end) dim rows for *keys* — bucket-pruned
            probe PINNED to this refresh's manifest, translated to seed
            names, filtered to the dim's σ (also covers dim_old's
            current-row side, keeping the pre-slice reconstruction in
            σ-space end to end)."""
            d = dim_tables[i].read_for_keys(
                spark, keys, manifest=mDs[i]
            ).select(
                *self._translated(
                    dim_cols[i], d_ids[i], mDs[i], self._phys_map(i)
                )
            )
            if self.dim_wheres[i]:
                d = d.filter(F.expr(self.dim_wheres[i]))
            return d

        def dim_full_state(i: int) -> DataFrame:
            """Full CURRENT dim state (dim-sized scan) — used only to
            resolve a chain hop's key set; dims are the small side of a
            star/snowflake by construction."""
            d = dim_tables[i]._read_state(spark, mDs[i]).select(
                *self._translated(
                    dim_cols[i], d_ids[i], mDs[i], self._phys_map(i)
                )
            )
            if self.dim_wheres[i]:
                d = d.filter(F.expr(self.dim_wheres[i]))
            return d

        def dim_old(i: int, keys: DataFrame) -> DataFrame:
            """PRE-SLICE dim rows for *keys*: current rows for keys the
            slice didn't touch, ∪ the earliest slice event's preimage for
            keys it did (a key whose earliest event is an insert had no
            pre-slice row)."""
            pk = dim_pks[i]
            d_cur = dim_state(i, keys)
            w = Window.partitionBy(*pk).orderBy(
                F.asc("__seq"), F.asc(F.col("__ct").isin(*_ADD).cast("int"))
            )
            first_ev = (
                dDs[i]
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
            changed = dDs[i].select(*pk).distinct()
            return d_cur.join(
                F.broadcast(changed), on=pk, how="left_anti"
            ).unionByName(
                first_ev.filter(F.col("__ct").isin(*_SUB)).select(
                    *dim_cols[i]
                )
            )

        n = len(self.dims)
        cur_pks = [list(m["pk"]) for m in mDs]
        terms: list[DataFrame] = []

        # ---- term 0: ΔF ⋈ (every dim OLD), dim states reconstructed per
        # join key the ACCUMULATED frame reaches — for a chain hop the
        # key column arrives with the owning dim's join, so keys project
        # from the partial join, not the fact slice alone
        t0 = dF.alias("f")
        for i in range(n):
            jcs = self.dims[i][0]
            t0 = t0.join(
                dim_old(i, keys_of(t0, jcs, cur_pks[i])),
                _join_eq(jcs, dim_pks[i]),
                "inner",
            )
        if self.join_where:
            # σ_J judges each joined delta row independently, so it
            # commutes with the term decomposition (see __init__)
            t0 = t0.filter(F.expr(self.join_where))
        terms.append(self._delta_rows(t0, F.col("f.__sign")))

        # ---- term i (1-indexed): F_new(reaching ΔDi) ⋈ D_j<i NEW ⋈
        # ΔDi ⋈ D_j>i OLD — one term per dim with slice activity.  The
        # fact restriction walks the ownership chain back to the fact:
        # star arm → literal fk IN; chain hop → filter the owning dim's
        # (dim-sized) state by the changed attribute values, then recurse
        # on ITS pks — every level batch-bounded and capped.
        _dt_cache: dict[int, dict] = {}

        def col_dtypes(j: int) -> dict:
            """column → Spark type name for a table's translated state
            (-1 = fact), cached per refresh.  Schema-only (parquet footer)
            — no job runs.  Threads dtypes into :func:`typed_in_lits` so a
            temporal join key takes the DST-safe ISO-cast path and a
            ``timestamp_ntz`` key is neither shifted nor cast to
            ``timestamp`` (the helper's contract)."""
            if j not in _dt_cache:
                if j == -1:
                    fr = fact._read_state(spark, mF).select(
                        *self._translated(
                            fact_cols, meta.get("fact_field_ids", {}), mF
                        )
                    )
                else:
                    fr = dim_full_state(j)
                _dt_cache[j] = dict(fr.dtypes)
            return _dt_cache[j]

        # ---- chain-hop reverse indexes: (attribute → pk) on each OWNING
        # dim, maintained under the view root and PINNED to this refresh's
        # manifests, so resolving a hop probes O(touched value buckets)
        # instead of scanning the owning dim (at sf100 a chained customer
        # dim is 15M rows — the round-7 O(dim) finding).  Built lazily on
        # the first refresh that hits the hop; maintenance thereafter is
        # O(dim changes + touched buckets).  Unsupported attribute types
        # (hash layout admits string/int) fall back to the dim scan.
        _hop_idx_cache: dict[int, object] = {}

        def hop_index(i: int, j: int):
            """Reverse SecondaryIndex over dim *j*'s (current-named)
            columns that dim *i* joins on, refreshed to this refresh's
            pin; None = unsupported → scan fallback.  The view is the
            index's single writer (BoundJoinAggregate serializes
            refreshes), so its applied_seq only advances to pinned
            seqs — the superset contract fact_filter_for needs."""
            if i in _hop_idx_cache:
                return _hop_idx_cache[i]
            from .secondary_index import SecondaryIndex

            inv = {
                v: k for k, v in (mDs[j].get("field_ids") or {}).items()
            }
            pj = self._phys_map(j)
            cur = [
                inv.get(d_ids[j].get(c), pj.get(c, c))
                for c in self.dims[i][0]
            ]
            idx = SecondaryIndex(
                self.root / f"_hopidx{i}", col=cur, pk_cols=cur_pks[j]
            )
            try:
                if idx.exists():
                    idx.refresh(spark, dim_tables[j], manifest=mDs[j])
                else:
                    idx.build(spark, dim_tables[j], manifest=mDs[j])
            except ValueError:
                idx = None  # e.g. non-portable attribute dtype
            _hop_idx_cache[i] = idx
            return idx

        def fact_filter_for(i: int, key_tuples: list) -> F.Column | None:
            """A fact-scan predicate selecting rows whose join chain can
            reach dim *i* key tuples in *key_tuples*; None = give up
            (over cap) and let the inner joins restrict.  Literals route
            through typed_in_lits (DST-safe ISO casts for temporals);
            composite keys use the per-column superset box of
            :func:`_in_box` — safe here because every consumer's inner
            join enforces exactness.  A chain hop resolves via the
            reverse index (O(probed value buckets)); the index ignores
            the dim's σ, a further superset, equally safe."""
            jcs = self.dims[i][0]
            if owners[i] == -1:
                return _in_box(jcs, key_tuples, col_dtypes(-1))
            j = owners[i]
            idx = hop_index(i, j)
            if idx is not None:
                hop_rows = (
                    idx.lookup_pks_in(spark, key_tuples)
                    .limit(_FK_LITERAL_CAP + 1)
                    .collect()
                )
                hop = [tuple(r[p] for p in idx.pk_cols) for r in hop_rows]
            else:
                rows = (
                    dim_full_state(j)
                    .filter(_in_box(jcs, key_tuples, col_dtypes(j)))
                    .select(*dim_pks[j])
                    .limit(_FK_LITERAL_CAP + 1)
                    .collect()
                )
                hop = [tuple(r[p] for p in dim_pks[j]) for r in rows]
            if len(hop) > _FK_LITERAL_CAP:
                return None
            return fact_filter_for(j, hop)

        f_state = None
        for i in range(n):
            changed_i = dDs[i].select(*dim_pks[i]).distinct()
            key_rows = changed_i.limit(_FK_LITERAL_CAP + 1).collect()
            if not key_rows:
                continue
            if f_state is None:
                f_state = self._with_derived(
                    fact._read_state(spark, mF).select(
                        *self._translated(
                            fact_cols, meta.get("fact_field_ids", {}), mF
                        )
                    )
                )
                if self.fact_where:
                    f_state = f_state.filter(F.expr(self.fact_where))
            pred = (
                fact_filter_for(
                    i, [tuple(r[p] for p in dim_pks[i]) for r in key_rows]
                )
                if len(key_rows) <= _FK_LITERAL_CAP
                else None
            )
            if pred is not None:
                f_new = f_state.filter(pred)
            elif owners[i] == -1:
                # over-cap star arm: broadcast semi-join (full scan,
                # filtered) — same trade as matview's dirty cap
                ren = changed_i
                for pc, fc in zip(dim_pks[i], self.dims[i][0]):
                    ren = ren.withColumnRenamed(pc, fc)
                f_new = f_state.join(
                    F.broadcast(ren),
                    on=list(self.dims[i][0]),
                    how="left_semi",
                )
            else:
                # over-cap chain hop: the inner joins restrict
                f_new = f_state
            ti = f_new.alias("f")
            for j in range(n):
                jcs_j = self.dims[j][0]
                if j == i:
                    ti = ti.join(
                        dDs[i].alias("d"),
                        _join_eq(jcs_j, dim_pks[i], right_alias="d"),
                        "inner",
                    )
                else:
                    keys_j = keys_of(ti, jcs_j, cur_pks[j])
                    side = (
                        dim_state(j, keys_j)
                        if j < i
                        else dim_old(j, keys_j)
                    )
                    ti = ti.join(
                        side,
                        _join_eq(jcs_j, dim_pks[j]),
                        "inner",
                    )
            if self.join_where:
                ti = ti.filter(F.expr(self.join_where))
            terms.append(self._delta_rows(ti, F.col("d.__sign")))

        self._fold_and_commit(
            spark, terms, meta, sF, sDs,
            {
                "fact": fact, "mF": mF, "mDs": mDs, "f_state": f_state,
                "dim_full_state": dim_full_state,
                "fact_filter_for": fact_filter_for, "dim_pks": dim_pks,
            },
        )
        # GC superseded versions (state is tiny, but unbounded dirs decay
        # listing like any other versioned store); keep_versions retains
        # recent ones for consistent pins
        retained = {
            int(v)
            for v in (self.meta().get("seqvec_versions") or {}).values()
        }
        for p in self.root.glob("v=*"):
            v = int(p.name.split("=", 1)[1])
            if v < meta["version"] and v not in retained:
                shutil.rmtree(p, ignore_errors=True)
        return (sF, *sDs)

    def _fold_and_commit(
        self,
        spark: SparkSession,
        terms: list[DataFrame],
        meta: dict,
        sF: int,
        sDs: list[int],
        ctx: dict,
    ) -> None:
        """Fold the signed delta *terms* (each one ``_delta_rows``
        output) into the stored rollup and commit the advanced version —
        the subclass hook where the distinct view folds its support
        store instead.  *ctx* carries the refresh's pinned closures for
        the min/max dirty rescan."""
        # ---- fold: one union → groupBy on the group key, zero-count
        # groups dropped (they no longer exist in the joined view)
        stored = self.read(spark)
        out_cols = ["n_rows", *self.sum_cols]
        mm = self.mm_outs
        if not mm:
            folded = stored.select(*self.group_cols, *out_cols)
            for t in terms:
                folded = folded.unionByName(
                    t.select(*self.group_cols, *out_cols)
                )
            folded = (
                folded.groupBy(*self.group_cols)
                .agg(*[F.sum(c).cast("long").alias(c) for c in out_cols])
                .filter(F.col("n_rows") > 0)
            )
        else:
            # MIN/MAX over the join (same algebra matview.py pins for one
            # table): adds TIGHTEN in the fold; a removal touching a
            # group's stored extremum (or hitting a group born inside the
            # slice) marks it DIRTY, and dirty groups are re-derived from
            # the CURRENT join restricted to the dirty group keys.  The
            # union rows carry __cur (stored side) and __add/__rem (term
            # side) so ONE groupBy yields state, tighten candidates, and
            # dirty evidence together; the result is group-count-sized
            # and localCheckpointed so neither the dirty-key collect nor
            # the final assembly re-executes the join-heavy term plans.
            mtype = {out: stored.schema[out].dataType for out in mm}

            def _nulls(pfx: str) -> list:
                return [
                    F.lit(None).cast(mtype[o]).alias(f"{pfx}{o}") for o in mm
                ]

            folded = stored.select(
                *self.group_cols,
                *out_cols,
                *[F.col(o).alias(f"__cur_{o}") for o in mm],
                *_nulls("__add_"),
                *_nulls("__rem_"),
            )
            for t in terms:
                folded = folded.unionByName(
                    t.select(
                        *self.group_cols,
                        *out_cols,
                        *_nulls("__cur_"),
                        *[F.col(f"__add_{o}") for o in mm],
                        *[F.col(f"__rem_{o}") for o in mm],
                    )
                )
            folded = (
                folded.groupBy(*self.group_cols)
                .agg(
                    *[F.sum(c).cast("long").alias(c) for c in out_cols],
                    *[F.min(f"__cur_{o}").alias(f"__cur_{o}") for o in mm],
                    *[
                        (F.min if o in self.min_cols else F.max)(
                            f"__add_{o}"
                        ).alias(f"__add_{o}")
                        for o in mm
                    ],
                    *[
                        (F.min if o in self.min_cols else F.max)(
                            f"__rem_{o}"
                        ).alias(f"__rem_{o}")
                        for o in mm
                    ],
                )
                .filter(F.col("n_rows") > 0)
                .localCheckpoint()
            )

            def _dirty(o: str) -> F.Column:
                cur, rem = F.col(f"__cur_{o}"), F.col(f"__rem_{o}")
                cmp = rem <= cur if o in self.min_cols else rem >= cur
                return rem.isNotNull() & (cur.isNull() | cmp)

            any_dirty = None
            for o in mm:
                any_dirty = (
                    _dirty(o) if any_dirty is None else (any_dirty | _dirty(o))
                )
            dirty_keys = folded.filter(any_dirty).select(*self.group_cols)
            dirty_rows = dirty_keys.limit(_FK_LITERAL_CAP + 1).collect()

            tightened = [
                (F.least if o in self.min_cols else F.greatest)(
                    F.col(f"__cur_{o}"), F.col(f"__add_{o}")
                ).alias(o)
                for o in mm
            ]
            if not dirty_rows:
                folded = folded.select(*self.group_cols, *out_cols, *tightened)
            else:
                folded = self._rescan_override(
                    spark, folded, dirty_keys, dirty_rows, tightened,
                    out_cols, ctx["fact"], ctx["mF"], ctx["mDs"], meta,
                    ctx["f_state"], ctx["dim_full_state"],
                    ctx["fact_filter_for"], ctx["dim_pks"],
                )
        meta["version"] += 1
        meta["applied_fact"], meta["applied_dims"] = sF, sDs
        self._commit(folded, meta)


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
        min_cols: dict[str, str] | None = None,
        max_cols: dict[str, str] | None = None,
        fact_where: str | None = None,
        fact_where_cols: Sequence[str] | None = None,
        dim_where: str | None = None,
        dim_where_cols: Sequence[str] | None = None,
    ):
        super().__init__(
            root, [(fk_col, dim_group_cols)], fact_group_cols, sum_cols,
            min_cols, max_cols, fact_where, fact_where_cols,
            [dim_where], [list(dim_where_cols or [])],
        )
        self.fk_col = fk_col
        self.dim_group_cols = list(dim_group_cols)

    def refresh(
        self, spark: SparkSession, fact: ManagedTable, dim: ManagedTable
    ) -> tuple[int, int]:
        sF, sD = self.refresh_star(spark, fact, [dim])
        return sF, sD


class MaintainedDistinctStarAggregate(MaintainedStarAggregate):
    """Exact ``COUNT(DISTINCT fact_col)`` maintained THROUGH the join —
    the composition the TPC-H Q16 shape needs (distinct suppliers per
    part attribute group, where the group key lives on a DIM).

    The algebra is the two pieces this engine already maintains, glued
    at their shared contract: the star view's signed delta terms are an
    EXACT multiset delta of the joined view's rows (that is what makes
    SUM/COUNT foldable), and a multiset delta keyed by (group, value)
    is precisely the ± stream the distinct view's SUPPORT store
    (:class:`~.distinct_matview.SupportStore`) folds — so each term row
    contributes ``sign`` to ``H(group, value)`` and
    ``COUNT(DISTINCT) = |{v : H(g, v) > 0}|`` stays exact under churn
    on ANY feed (fact row removed, dim attribute moved across groups,
    dim row leaving its σ): a dim-side change rewrites the joined rows
    it touches as remove+add pairs, which the support fold nets out.

    Refresh cost: the star terms (O(changes) with bucket-pruned dim
    probes) + O(touched support buckets) + a groups-sized rollup
    rewrite — never O(table), never O(all support).  Distinct sources
    must be FACT columns (they ride :meth:`_extra_cols` through the
    feed projection / field-id pinning / rename translation); MIN/MAX
    outputs are not supported here (compose a plain
    :class:`MaintainedStarAggregate` next to it instead — mixing the
    extrema dirty-rescan with support recounts in one fold buys nothing
    but coupling).

    Reference parity: the reference replicates base rows and leaves
    COUNT(DISTINCT) queries to the warehouse engine (Snowflake/BQ
    recompute per query, e.g. the merge pipelines in
    pkg/snowsql/sql.go); this keeps the answer fresh at O(changes)
    instead."""

    def __init__(
        self,
        root,
        dims: Sequence[tuple[str, Sequence[str]]],
        fact_group_cols: Sequence[str],
        sum_cols: dict[str, str],
        distinct_cols: dict[str, str],
        fact_where: str | None = None,
        fact_where_cols: Sequence[str] | None = None,
        dim_wheres: Sequence[str | None] | None = None,
        dim_where_cols: Sequence[Sequence[str]] | None = None,
        join_where: str | None = None,
        n_buckets: int = 32,
        measure_cols: Sequence[str] | None = None,
        fact_derived_cols: dict[str, tuple[str, Sequence[str]]] | None = None,
        dim_renames: Sequence[dict[str, str] | None] | None = None,
    ):
        super().__init__(
            root, dims, fact_group_cols, sum_cols, None, None,
            fact_where, fact_where_cols, dim_wheres, dim_where_cols,
            join_where, measure_cols, fact_derived_cols, dim_renames,
        )
        from .distinct_matview import SupportStore

        self.distinct_cols = dict(distinct_cols)
        if not self.distinct_cols:
            raise ValueError("distinct_cols must name at least one output")
        outs = ["n_rows", *self.group_cols, *self.sum_cols]
        clash = set(self.distinct_cols) & set(outs)
        if clash:
            raise ValueError(f"distinct output names collide: {sorted(clash)}")
        self.n_buckets = int(n_buckets)
        self._support = SupportStore(self.root, self.group_cols, self.n_buckets)

    # -- star-algebra hooks -------------------------------------------------
    def _extra_cols(self) -> list[str]:
        # a derived name is synthesized post-projection, never selected
        return [
            c
            for c in dict.fromkeys(self.distinct_cols.values())
            if c not in self.fact_derived
        ]

    def _delta_rows(self, joined: DataFrame, sign: F.Column) -> DataFrame:
        """Base projection + the raw distinct source value per row (the
        support fold needs (group, value, ±1), not a pre-aggregate)."""
        return joined.select(
            *[F.col(g) for g in self.group_cols],
            *[
                (sign * F.coalesce(F.expr(src), F.lit(0))).alias(out)
                for out, src in self.sum_cols.items()
            ],
            sign.alias("n_rows"),
            *[
                F.col(src).alias(f"__v_{out}")
                for out, src in self.distinct_cols.items()
            ],
        )

    def _seed_commit(
        self,
        spark: SparkSession,
        f_seed: DataFrame,
        d_seeds: list[DataFrame],
        dim_pks: list[list[str]],
        meta: dict,
    ) -> None:
        joined = _seed_join(
            f_seed,
            [
                (d_seeds[i], self.dims[i][0], dim_pks[i])
                for i in range(len(self.dims))
            ],
        )
        if self.join_where:
            joined = joined.filter(F.expr(self.join_where))
        rollup = joined.groupBy(*[F.col(g) for g in self.group_cols]).agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.coalesce(F.sum(F.expr(src)), F.lit(0)).alias(out)
                for out, src in self.sum_cols.items()
            ],
            *[
                F.count_distinct(F.col(src)).cast("long").alias(out)
                for out, src in self.distinct_cols.items()
            ],
        )
        meta["distinct_outs"] = dict(self.distinct_cols)
        meta["n_buckets"] = self.n_buckets
        meta["bucket_versions"] = {
            out: self._support.seed_out(spark, out, joined, src)
            for out, src in self.distinct_cols.items()
        }
        self._commit(rollup, meta)

    def _fold_and_commit(
        self,
        spark: SparkSession,
        terms: list[DataFrame],
        meta: dict,
        sF: int,
        sDs: list[int],
        ctx: dict,
    ) -> None:
        if meta.get("distinct_outs") != self.distinct_cols:
            raise ValueError(
                f"view at {self.root} was seeded with distinct_outs="
                f"{meta.get('distinct_outs')!r}; constructed with "
                f"{self.distinct_cols!r} — rebuild instead of mixing"
            )
        if int(meta.get("n_buckets", -1)) != self.n_buckets:
            raise ValueError(
                f"view at {self.root} was seeded with "
                f"n_buckets={meta.get('n_buckets')}; constructed with "
                f"{self.n_buckets} — the support hash layout would split"
            )
        version = meta["version"] + 1
        out_cols = ["n_rows", *self.sum_cols]
        vcols = [f"__v_{out}" for out in self.distinct_cols]
        u = None
        for t in terms:
            sel = t.select(*self.group_cols, *out_cols, *vcols)
            u = sel if u is None else u.unionByName(sel)
        # changes-sized; checkpointing keeps the join-heavy term plans
        # from re-executing once per distinct output + once for the
        # rollup fold (same reason the mm fold checkpoints its union)
        u = u.localCheckpoint()

        bucket_versions = {
            o: dict(bv)
            for o, bv in (meta.get("bucket_versions") or {}).items()
        }
        superseded: list[Path] = []
        recounts: dict[str, DataFrame] = {}
        for out in self.distinct_cols:
            # net per-(group, value) support delta — joined rows a dim
            # change rewrote in place (same group, same value) cancel
            # here and touch nothing
            pairs = (
                u.filter(F.col(f"__v_{out}").isNotNull())
                .groupBy(*self.group_cols, F.col(f"__v_{out}").alias("__v"))
                .agg(F.sum("n_rows").alias("__cnt"))
                .filter(F.col("__cnt") != 0)
            )
            sup, recount, _touched = self._support.fold_out(
                spark, out, pairs, bucket_versions.setdefault(out, {}),
                version,
            )
            superseded.extend(sup)
            if recount is not None:
                recounts[out] = recount

        # ---- rollup: n_rows/sums fold by ±; distinct cols override per
        # touched group from the recount, untouched groups keep stored
        # counts, groups born with only-NULL values coalesce to 0
        stored = self.read(spark)
        deltas = u.select(
            *self.group_cols,
            *[F.col(c).cast("long").alias(c) for c in out_cols],
            *[
                F.lit(None).cast("long").alias(out)
                for out in self.distinct_cols
            ],
        )
        folded = (
            stored.select(*self.group_cols, *out_cols, *self.distinct_cols)
            .unionByName(deltas)
            .groupBy(*self.group_cols)
            .agg(
                *[F.sum(c).cast("long").alias(c) for c in out_cols],
                # the stored row is the only non-NULL contributor
                *[F.min(out).alias(out) for out in self.distinct_cols],
            )
            .filter(F.col("n_rows") > 0)
        )
        result = folded.alias("__f")
        sel = [F.col(f"__f.{c}").alias(c) for c in self.group_cols] + [
            F.col(f"__f.{c}").alias(c) for c in out_cols
        ]
        for out, rc in recounts.items():
            result = result.join(
                rc.alias(f"__r_{out}"),
                self._support.nullsafe_eq("__f", f"__r_{out}"),
                "left",
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
                    F.coalesce(
                        F.col(f"__f.{out}"), F.lit(0).cast("long")
                    ).alias(out)
                )
        result = result.select(*sel)

        meta["version"] = version
        meta["applied_fact"], meta["applied_dims"] = sF, sDs
        meta["bucket_versions"] = bucket_versions
        self._commit(result, meta)
        # GC AFTER the swap (crash → orphans the next refresh overwrites)
        for p in superseded:
            shutil.rmtree(p, ignore_errors=True)
        for out in self.distinct_cols:
            self._support.gc_out(out, bucket_versions.get(out) or {}, version)

    # -- probes: the maintained support store answers MORE than distinct
    # counts, with no base or joined scan — through the JOIN (the group
    # key may live entirely dim-side): per-group heavy hitters and exact
    # quantiles of the distinct source column, same contract as the
    # single-table view's probes
    def _bv(self, out: str) -> dict:
        if out not in self.distinct_cols:
            raise KeyError(f"{out!r} is not a maintained distinct column")
        return (self.meta().get("bucket_versions") or {}).get(out, {})

    def top_values(self, spark: SparkSession, out: str, k: int) -> DataFrame:
        got = self._support.top_values(spark, out, self._bv(out), k)
        if got is not None:
            return got
        return (
            self.read(spark)
            .select(*self.group_cols)
            .limit(0)
            .select(
                *self.group_cols,
                F.lit(None).alias("__v"),
                F.lit(0).cast("long").alias("__cnt"),
                F.lit(0).alias("rank"),
            )
        )

    def quantile_values(
        self,
        spark: SparkSession,
        out: str,
        quantiles: dict[str, tuple[int, int]],
    ) -> DataFrame:
        got = self._support.quantile_values(
            spark, out, self._bv(out), quantiles
        )
        if got is not None:
            return got
        qdf = spark.createDataFrame(
            [(lbl,) for lbl in quantiles], "q_label string"
        )
        return (
            self.read(spark)
            .select(*self.group_cols)
            .limit(0)
            .crossJoin(qdf)
            .select(*self.group_cols, "q_label", F.lit(None).alias("__v"))
        )
