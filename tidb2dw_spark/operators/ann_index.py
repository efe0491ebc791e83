"""IVF vector index as DERIVED STATE on a replicated table.

``build_ivf_index`` / ``append_to_ivf_index`` (functions/similarity.py)
cover append-only ingest; a replicated embedding store CHURNS — CDC
deletes and updates must leave the index, not just add to it.  This
module wraps the persisted IVF layout in the same
``exists()/build()/refresh(spark, table)`` protocol that
:class:`~.secondary_index.SecondaryIndex` and
:class:`~.matview.MaintainedAggregate` implement, so an ANN index rides
``TableReplicator(derived=[...])``'s poll loop exactly like a B-tree-ish
index or a rollup does.

Layout mirrors the other derived objects' crash contract::

    <root>/_meta.json      {"applied_seq", "version", "id_col", "vec_col",
                            "n_centroids", "centroids", "cell_versions",
                            "field_ids"}
    <root>/v=N/cell=C/…    (neighbor_id, qv) — integer-quantized vectors

Maintenance is O(changes + touched cells), never O(index):

- the REMOVAL side needs each changed id's OLD cell — which the change
  feed already carries: preimage/delete rows hold the old embedding, and
  cell assignment is a deterministic pure function of (vector, frozen
  centroids), so re-assigning the preimage vector reproduces exactly the
  cell its entry lives in.  No id→cell sidecar, no index scan.
- the ADDITION side is the per-id FINAL image of the slice (windowed by
  commit seq, postimage outranking its preimage), assigned to the same
  frozen centroids — intermediate states never touch the index.
- only the union of old/new cells rewrites (``cell_versions``, the same
  versioned-partition trick as ManagedTable buckets), and a crash
  between data write and ``_meta.json`` swap is repaired by the
  deterministic version overwrite on retry.

Centroids are FROZEN at build (the standard IVF trade: rebuild when the
distribution drifts — the build is one linear pass).  That freeze is
also what makes the maintained index TESTABLE: its contents after any
CDC history equal ``build()`` on the current table state with the same
centroids, so every probe result is oracle-checkable against a
from-scratch rebuild (and, in the driver gate, against a composed SQL
recompute in DuckDB).

Reference parity: the reference maintains warehouse-side derived tables
from the same changefeed its replication loop consumes
(sink/cdcsql, increment.go:141-167); this is that pattern applied to the
similarity layer.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.similarity import (
    _assign_cells,
    _probe_cells,
    _probe_score_rank,
    auto_n_centroids,
    ivf_centroids,
)
from ..table.managed import CHANGE_TYPE_COL, COMMIT_SEQ_COL, ManagedTable

_ADD_TYPES = ("insert", "update_postimage")
_REMOVE_TYPES = ("delete", "update_preimage")


def _cell_sim(centroids: list[list[int]]) -> F.Column:
    """True cosine of a row's ``qv`` to its assigned cell's centroid —
    the drift monitor's assignment-quality signal.  The centroid matrix
    constant-folds into one literal (same trick as
    similarity._cell_score_structs); zero-norm guards divide by 1 so a
    degenerate vector scores 0, not NaN."""
    import math

    matrix = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{x}L" for x in c) + ")" for c in centroids
        )
        + ")"
    )
    norms = F.array(
        *[
            F.lit(math.sqrt(sum(x * x for x in c)) or 1.0)
            for c in centroids
        ]
    )
    cent = F.element_at(matrix, F.col("cell") + F.lit(1))
    dot = F.aggregate(
        F.zip_with(F.col("qv"), cent, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")
    qnorm = F.sqrt(
        F.aggregate(
            F.transform(F.col("qv"), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).cast("double")
    )
    cnorm = F.element_at(norms, F.col("cell") + F.lit(1))
    denom = qnorm * cnorm
    return dot / F.when(denom > 0, denom).otherwise(F.lit(1.0))


def _cell_stats(assigned: DataFrame, centroids: list[list[int]]) -> dict:
    """Per-cell (count, Σ assignment-cosine) of an assigned frame — a
    cell-count-sized collect."""
    rows = (
        assigned.withColumn("__sim", _cell_sim(centroids))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__sim").alias("s"))
        .collect()
    )
    return {int(r["cell"]): (int(r["n"]), float(r["s"] or 0.0)) for r in rows}


class IvfVectorIndex:
    """Persisted IVF index over a CDF-enabled ManagedTable's embedding
    column, maintained incrementally from the change feed."""

    def __init__(
        self,
        root,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int | None = None,
        kernel: str = "arrow",
        auto_rebuild: bool = False,
    ):
        self.root = Path(root)
        self.id_col = id_col
        self.vec_col = vec_col
        # None (default) = AUTO: every build() sizes cells to
        # max(16, ceil(sqrt(N))) of the corpus it scans, so a rebuild on
        # a grown table rescales cells instead of keeping the seed-time
        # count (the one measured super-linear serving path in SCALE.md);
        # an explicit int pins the layout (the oracle registry rows do)
        self._auto_cells = n_centroids is None
        # constructor-level pin: an explicit count must keep pinning the
        # layout even after _load_meta adopts a stored auto flag
        self._cells_pinned = n_centroids is not None
        self.n_centroids = n_centroids
        self.kernel = kernel
        # opt-in self-repair: TableReplicator re-trains the index (one
        # build per trip — build resets the drift baseline that tripped)
        # when needs_rebuild() fires; default False because a rebuild is
        # an O(corpus) job the operator may want to schedule off-peak
        self.auto_rebuild = bool(auto_rebuild)
        self.centroids: list = []

    # -- meta (same crash contract as SecondaryIndex) ---------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def _commit(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def _load_meta(self, src_m: dict | None = None) -> dict:
        m = self.meta()
        if m["id_col"] != self.id_col or m["vec_col"] != self.vec_col:
            ok = False
            ids = m.get("field_ids") or {}
            if src_m is not None and ids:
                inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
                ok = (
                    inv.get(ids.get(m["id_col"]), m["id_col"]) == self.id_col
                    and inv.get(ids.get(m["vec_col"]), m["vec_col"])
                    == self.vec_col
                )
            if not ok:
                raise ValueError(
                    f"index at {self.root} is over ({m['id_col']!r}, "
                    f"{m['vec_col']!r}), not ({self.id_col!r}, {self.vec_col!r})"
                )
        self.id_col, self.vec_col = m["id_col"], m["vec_col"]
        self.n_centroids = m["n_centroids"]
        self.centroids = m["centroids"]
        # attach adopts the STORED sizing policy when this handle's
        # constructor did not pin one: a fresh default-constructed handle
        # over an index built with an explicit cell count must not flip
        # it to auto (needs_rebuild would trip on cell_growth and the
        # next build would rescale the operator-pinned layout)
        if not self._cells_pinned:
            self._auto_cells = bool(m.get("auto_cells", self._auto_cells))
        return m

    def _cur_names(self, m: dict, src_m: dict) -> dict[str, str]:
        """stored name → current base-table name, via field ids (rename
        continuity, same translation SecondaryIndex performs)."""
        ids = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        return {
            n: inv.get(ids.get(n), n) for n in (m["id_col"], m["vec_col"])
        }

    # -- payload hooks (IvfPqVectorIndex overrides) ------------------------
    def _fit_extra(
        self, spark: SparkSession, df: DataFrame, assigned: DataFrame
    ) -> dict:
        """Extra FROZEN parameters trained at build (e.g. PQ codebooks);
        merged into _meta.json.  Base IVF stores raw quantized vectors
        and needs none."""
        return {}

    def _encode(self, assigned: DataFrame, m: dict) -> DataFrame:
        """Cell-assigned rows → the rows actually stored per cell.  Base
        IVF stores (neighbor_id, qv, cell) unchanged."""
        return assigned

    # -- build / refresh --------------------------------------------------
    def build(
        self,
        spark: SparkSession,
        source: ManagedTable,
        centroids: list | None = None,
    ) -> int:
        """Full scan → cell-assigned quantized index; records the source's
        cdf_seq so refresh() starts exactly after the state this build
        saw.  *centroids* pins an explicit centroid matrix (used by the
        rebuild-equivalence tests); default derives them from the base
        (smallest-id init, deterministic)."""
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        df = source._read_state(spark, src_m).filter(
            F.col(self.vec_col).isNotNull()
        )
        if centroids is not None:
            self.n_centroids = len(centroids)
            self.centroids = centroids
        else:
            if self._auto_cells:
                # re-sized on EVERY build from the corpus this build
                # scans — the rebuild a tripped drift monitor schedules
                # therefore rescales cells as the table grows (√N), the
                # count itself is one extra job on a path that is
                # already a full scan
                self.n_centroids = auto_n_centroids(df.count())
            self.centroids = ivf_centroids(
                df, self.id_col, self.vec_col, self.n_centroids
            )
        assigned = _assign_cells(
            df, self.centroids, self.id_col, self.vec_col, self.kernel
        )
        extra = self._fit_extra(spark, df, assigned)
        # drift baseline: per-cell sizes + mean assignment cosine under
        # the frozen centroids (one extra key-columns-only pass; build is
        # already a full scan).  Refresh maintains the "cur_*" side in
        # O(changes) so needs_rebuild() is a metadata read, never a scan.
        stats = _cell_stats(assigned, self.centroids)
        n_total = sum(n for n, _ in stats.values())
        sim_sum = sum(s for _, s in stats.values())
        drift = {
            "built_n": n_total,
            "built_max_share": (
                max((n for n, _ in stats.values()), default=0) / n_total
                if n_total
                else 0.0
            ),
            "built_mean_sim": (sim_sum / n_total) if n_total else 0.0,
            "cur_cell_counts": {
                str(c): n for c, (n, _) in stats.items()
            },
            "cur_n": n_total,
            "cur_sim_sum": sim_sum,
            "churned": 0,
        }
        src_ids = src_m.get("field_ids", {})
        meta = {
            "applied_seq": src_seq,
            "version": 1,
            "id_col": self.id_col,
            "vec_col": self.vec_col,
            "n_centroids": self.n_centroids,
            "auto_cells": self._auto_cells,
            "centroids": self.centroids,
            "cell_versions": {
                str(c): 1 for c in range(len(self.centroids))
            },
            "field_ids": {
                n: src_ids[n]
                for n in (self.id_col, self.vec_col)
                if n in src_ids
            },
            "drift": drift,
            **extra,
        }
        self._encode(assigned, meta).write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(str(self.root / "v=1"))
        self._commit(meta)
        return src_seq

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Fold the feed slice (applied_seq, cdf_seq]: rewrite only the
        cells that lost or gained vectors."""
        src_m = source.manifest()
        m = self._load_meta(src_m)
        since, src_seq = m["applied_seq"], src_m.get("cdf_seq", 0)
        if src_seq <= since:
            return since
        names = self._cur_names(m, src_m)
        ch = source.changes(spark, since=since, until=src_seq).select(
            F.col(CHANGE_TYPE_COL),
            F.col(COMMIT_SEQ_COL),
            F.col(names[self.id_col]).alias(self.id_col),
            F.col(names[self.vec_col]).alias(self.vec_col),
        )
        # REMOVALS: every preimage/delete vector in the slice, re-assigned
        # to the frozen centroids — a NULL preimage vector was never
        # indexed, so it has no cell to clear
        removals = _assign_cells(
            ch.filter(
                F.col(CHANGE_TYPE_COL).isin(*_REMOVE_TYPES)
                & F.col(self.vec_col).isNotNull()
            ),
            m["centroids"], self.id_col, self.vec_col, self.kernel,
        ).select("neighbor_id", "cell", "qv").localCheckpoint()
        # ADDITIONS: per-id FINAL image only (postimage outranks its own
        # preimage within a commit) — intermediates never land.  Both
        # slice-derived frames are checkpointed: each feeds the touched
        # collect, the drift stats, AND the rewrite, and the Arrow
        # assignment kernel should run once per frame, not per consumer.
        w = Window.partitionBy(self.id_col).orderBy(
            F.desc(COMMIT_SEQ_COL),
            F.desc(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES).cast("int")),
        )
        final = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        additions = _assign_cells(
            final.filter(
                F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES)
                & F.col(self.vec_col).isNotNull()
            ),
            m["centroids"], self.id_col, self.vec_col, self.kernel,
        ).localCheckpoint()
        touched = sorted(
            r["cell"]
            for r in removals.select("cell")
            .unionByName(additions.select("cell"))
            .distinct()
            .collect()
        )
        if not touched:
            m["applied_seq"] = src_seq
            self._commit(m)
            return src_seq
        # drift bookkeeping (monitor-grade, O(changes)): cell counts move
        # by ±, the assignment-cosine running sum moves by the signed per
        # -cell sums, cumulative churn accrues both sides.  Legacy metas
        # (pre-monitor build) carry no baseline — skipped, needs_rebuild
        # stays silent until the next build().
        d = m.get("drift")
        if d is not None:
            # the monitor mirrors the index's NET effect per id: subtract
            # each id's PRE-SLICE image (the earliest event's preimage —
            # an id whose earliest event is an insert had no pre-slice
            # row) and add its FINAL image.  Counting EVERY intermediate
            # preimage (as `removals` does — a harmless superset for the
            # touched-cell rewrite) would skew cur_n/cur_sim_sum whenever
            # one id carries several events in a slice.
            w_first = Window.partitionBy(self.id_col).orderBy(
                F.asc(COMMIT_SEQ_COL),
                F.asc(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES).cast("int")),
            )
            pre = (
                ch.withColumn("__rn", F.row_number().over(w_first))
                .filter(
                    (F.col("__rn") == 1)
                    & F.col(CHANGE_TYPE_COL).isin(*_REMOVE_TYPES)
                    & F.col(self.vec_col).isNotNull()
                )
                .drop("__rn")
            )
            rm = _cell_stats(
                _assign_cells(
                    pre, m["centroids"], self.id_col, self.vec_col,
                    self.kernel,
                ),
                m["centroids"],
            )
            ad = _cell_stats(additions, m["centroids"])
            counts = d.get("cur_cell_counts", {})
            for c, (n, _) in rm.items():
                counts[str(c)] = max(0, counts.get(str(c), 0) - n)
            for c, (n, _) in ad.items():
                counts[str(c)] = counts.get(str(c), 0) + n
            n_rm = sum(n for n, _ in rm.values())
            n_ad = sum(n for n, _ in ad.values())
            d["cur_cell_counts"] = counts
            d["cur_n"] = max(0, d.get("cur_n", 0) + n_ad - n_rm)
            d["cur_sim_sum"] = (
                d.get("cur_sim_sum", 0.0)
                + sum(s for _, s in ad.values())
                - sum(s for _, s in rm.values())
            )
            d["churned"] = d.get("churned", 0) + n_ad + n_rm
        new_version = m["version"] + 1
        base = self._read_cells(spark, m, touched)
        gone = removals.select("neighbor_id").unionByName(
            additions.select("neighbor_id")
        )
        enc_add = self._encode(additions, m)
        survivors = (
            base.join(F.broadcast(gone), on="neighbor_id", how="left_anti")
            if base is not None
            else enc_add.limit(0)
        )
        out = survivors.unionByName(enc_add).dropDuplicates(["neighbor_id"])
        out.write.mode("overwrite").partitionBy("cell").parquet(
            str(self.root / f"v={new_version}")
        )
        m["version"] = new_version
        for c in touched:
            m["cell_versions"][str(c)] = new_version
        m["applied_seq"] = src_seq
        self._commit(m)
        for p in self.root.glob("v=*"):
            v = int(p.name.split("=", 1)[1])
            if v < new_version and v not in {
                int(x) for x in m["cell_versions"].values()
            }:
                shutil.rmtree(p, ignore_errors=True)
        return src_seq

    # -- drift monitor ----------------------------------------------------
    def drift_stats(self) -> dict:
        """Current drift gauges vs the build-time baseline — a metadata
        read, no Spark job.  Empty dict for a legacy (pre-monitor) meta.

        - ``cell_max_share``: largest cell's fraction of the index;
          ``skew_factor`` = its ratio to the build-time max share (a
          hot cell degrades probe latency AND recall — n_probe cells
          cover less of the corpus).
        - ``assign_sim_drop``: build-time mean assignment cosine minus
          the current mean — vectors drifting away from the frozen
          centroids land in increasingly wrong cells.
        - ``churn_ratio``: cumulative churned rows / built size — the
          coarse "how stale is the freeze" odometer.
        - ``cell_growth_factor``: what :func:`auto_n_centroids` would
          size the CURRENT corpus to, over the cell count the index
          actually has — the rows-per-cell gauge.  2.0 means the corpus
          grew ~4× past the layout (cells are 2× their target size and
          a fixed n_probe covers half the intended corpus share)."""
        m = self.meta()
        d = m.get("drift")
        if not d:
            return {}
        cur_n = max(0, int(d.get("cur_n", 0)))
        counts = [n for n in d.get("cur_cell_counts", {}).values() if n > 0]
        cur_max_share = (max(counts) / cur_n) if cur_n and counts else 0.0
        cur_mean_sim = (d.get("cur_sim_sum", 0.0) / cur_n) if cur_n else 0.0
        built_share = d.get("built_max_share") or 0.0
        n_cells = int(m.get("n_centroids") or 0) or 1
        return {
            "cur_n": float(cur_n),
            "cell_max_share": cur_max_share,
            "skew_factor": (
                cur_max_share / built_share if built_share else 0.0
            ),
            "assign_sim_drop": (
                d.get("built_mean_sim", 0.0) - cur_mean_sim
                if cur_n
                else 0.0
            ),
            "churn_ratio": (
                d.get("churned", 0) / d["built_n"]
                if d.get("built_n")
                else 0.0
            ),
            "cell_growth_factor": (
                auto_n_centroids(cur_n) / n_cells if cur_n else 0.0
            ),
        }

    def needs_rebuild(
        self,
        skew_factor: float = 2.0,
        sim_drop: float = 0.05,
        churn_ratio: float = 2.0,
        cell_growth: float = 2.0,
    ) -> bool:
        """True when any drift gauge crosses its threshold — the signal
        that the frozen centroids no longer fit the corpus and a
        ``build()`` is worth scheduling.  Maintenance itself stays EXACT
        either way (refresh is rebuild-equivalent under the frozen
        centroids); this guards RECALL, which the exactness oracle
        cannot see.  Always False for a legacy meta without a baseline.

        ``cell_growth`` trips when the corpus has outgrown the cell
        LAYOUT (``cell_growth_factor`` — √N target cells over actual
        cells); it guards serving COST rather than recall, and applies
        only to auto-sized indexes, where the ``build()`` it schedules
        actually rescales — a pinned cell count is an explicit operator
        choice this monitor must not overrule (the gauge still surfaces
        for alerting)."""
        s = self.drift_stats()
        if not s:
            return False
        return (
            s["skew_factor"] >= skew_factor
            or s["assign_sim_drop"] >= sim_drop
            or s["churn_ratio"] >= churn_ratio
            or (
                self._sizing_auto()
                and s["cell_growth_factor"] >= cell_growth
            )
        )

    def _sizing_auto(self) -> bool:
        """The EFFECTIVE sizing policy: a constructor pin always wins;
        otherwise the stored index's policy (so a default-constructed
        handle attached to a pinned index never auto-rescales it, even
        before any _load_meta call)."""
        if self._cells_pinned:
            return False
        if self.exists():
            return bool(self.meta().get("auto_cells", self._auto_cells))
        return self._auto_cells

    def health_gauges(self) -> dict:
        """Gauges for the replicator's metrics registry (surfaced as
        ``derived_<class>_<name>``); ``needs_rebuild`` rides along as
        0/1 so an alert can key on one series."""
        s = self.drift_stats()
        if not s:
            return {}
        return {
            **{k: float(v) for k, v in s.items()},
            "needs_rebuild": float(self.needs_rebuild()),
        }

    # -- probe ------------------------------------------------------------
    def _read_cells(self, spark, m: dict, cells) -> DataFrame | None:
        """ONE scan over the probed cells' CURRENT partition dirs.  The
        per-cell ``spark.read.parquet`` + union shape paid a sequential
        driver-side schema-inference job PER probed cell (measured: 16
        single-task jobs per search); passing every dir to a single read
        with ``basePath`` recovers the ``cell`` id from the directory
        name via partition discovery instead — one job, and the probed
        set still prunes at planning time (only the listed dirs exist in
        the scan's file index)."""
        paths = []
        for c in cells:
            p = (
                self.root
                / f"v={m['cell_versions'][str(c)]}"
                / f"cell={c}"
            )
            if p.exists():
                paths.append(str(p))
        if not paths:
            return None
        return (
            spark.read.option("basePath", str(self.root))
            .parquet(*paths)
            .drop("v")
            .withColumn("cell", F.col("cell").cast("int"))
        )

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
    ) -> DataFrame:
        """Search the maintained index — same probe plan as
        similarity.ivf_index_topk (broadcast probes, cell-pruned read,
        exact quantized-cosine rank), over the maintained cell
        versions."""
        m = self._load_meta()
        probes = _probe_cells(
            queries, self.id_col, self.vec_col, m["centroids"], n_probe,
            self.kernel,
        )
        if self.kernel == "arrow":
            # ONE probe materialization: the arrow scorer needs the full
            # (query_id, qv, cell) rows driver-side anyway — collecting
            # them here (instead of a distinct-cells collect now and the
            # scorer's own collect later) executes the probe lineage
            # once instead of twice per search
            probe_rows = probes.select("query_id", "qv", "cell").collect()
            cells = sorted({r["cell"] for r in probe_rows})
        else:
            probe_rows = None
            cells = sorted(
                r["cell"] for r in probes.select("cell").distinct().collect()
            )
        index = self._read_cells(spark, m, cells)
        if index is None:
            return spark.createDataFrame(
                [], "query_id long, neighbor_id long, score double, rank int"
            )
        return _probe_score_rank(
            index, probes, k, self.kernel, probe_rows=probe_rows
        )


class IvfPqVectorIndex(IvfVectorIndex):
    """Residual/plain IVF-PQ as derived state: same maintenance protocol
    as :class:`IvfVectorIndex` (removals by preimage re-assignment,
    additions from per-id final images, versioned touched-cell rewrites),
    but cells store **PQ codes** (M small ints per vector) instead of
    quantized vectors — the compressed layout for embedding stores whose
    vectors are too big to keep twice.  Codebooks are trained at build
    and FROZEN alongside the centroids (refresh re-encodes only changed
    vectors; rebuild when distribution drift decays code fidelity), which
    keeps the maintained index rebuild-equivalent and therefore
    oracle-checkable.  Search is the same ADC kernel as
    functions.pq.ivfpq_index_topk over the maintained cell versions."""

    def __init__(
        self,
        root,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int | None = None,
        n_sub: int = 8,
        k_codes: int = 64,
        iters: int = 2,
        residual: bool = True,
        kernel: str = "arrow",
        auto_rebuild: bool = False,
    ):
        super().__init__(
            root, id_col, vec_col, n_centroids, kernel, auto_rebuild
        )
        self.n_sub = n_sub
        self.k_codes = k_codes
        self.iters = iters
        self.residual = residual

    def _fit_extra(self, spark, df, assigned):
        import numpy as np

        from ..functions.pq import _fit_codebooks

        cents = _fit_codebooks(
            df, assigned, np.asarray(self.centroids, dtype=np.int64),
            n_sub=self.n_sub, k=self.k_codes, iters=self.iters,
            residual=self.residual, id_col=self.id_col,
            vec_col=self.vec_col,
        )
        return {
            "codebooks": cents,
            "residual": self.residual,
            "n_sub": self.n_sub,
            "k_codes": self.k_codes,
        }

    def _encode(self, assigned, m):
        from ..functions.pq import _encode_assigned

        return _encode_assigned(
            assigned, m["centroids"], m["codebooks"], m["residual"]
        )

    def topk(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
    ) -> DataFrame:
        """ADC search over the maintained cells — identical plan to
        functions.pq.ivfpq_index_topk, with the probed-cell read going
        through the versioned partition map."""
        from ..functions.pq import _ivfpq_search

        m = self._load_meta()
        return _ivfpq_search(
            spark,
            lambda cells: self._read_cells(spark, m, cells),
            m["centroids"],
            m["codebooks"],
            m["residual"],
            queries,
            self.id_col,
            self.vec_col,
            k,
            n_probe,
        )
