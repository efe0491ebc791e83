"""Iterative clustering over embedding columns — Lloyd's k-means with
deterministic, integer-exact math.

The driver coordinates the iteration (k·dim centroid matrix — metadata-
sized); each Lloyd step is ONE distributed pass: an integer-argmin
assignment expression (no join, no Python) followed by a per-(cluster,
element) partial-aggregated sum/count whose shuffle carries k·dim
accumulator cells, never vectors — the same shape as
entry_analytics.emb_label_centroids.  All arithmetic is on the quantized
integer domain (round(x·1e6)), and centroid updates use one explicit
half-up rational division, so results are bit-reproducible across runs,
partitionings, and a plain-Python reference implementation (tested).

Because the iteration count is a compile-time constant and every step is
integer-exact, even this "iterative algorithm" has an exact SQL oracle:
oracle_sql.kmeans_oracle unrolls the Lloyd loop into chained CTE stages
that reproduce the centroids bit-for-bit.  Exactness is additionally
pinned in pytest against a pure-Python twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import _quantize_py, ivf_centroids


def _halfup_div(s: int, n: int) -> int:
    """Half-up s/n for integer s (any sign), n > 0 — one exact rational op
    (floats would lose exactness for large accumulator sums).
    half-up(s/n) = floor(s/n + 1/2) = floor((2s+n)/(2n)); Python's //
    floors for negatives too, so one integer division suffices."""
    return (2 * s + n) // (2 * n)


def _euclid_argmin(qv: Column, centroids: list[list[int]]) -> Column:
    """Cluster index minimizing euclidean distance to *qv* — a single
    nested-literal expression (one F.expr matrix, constant-folded), scored
    as max over s = 2·x·c − ‖c‖² (equal ordering to −dist², all-integer).
    Ties break to the LOWER cluster via the negc struct field."""
    matrix = F.expr(
        "array("
        + ",".join(
            f"named_struct('c', array({','.join(f'{x}L' for x in qc)}),"
            f" 'nn', {sum(x * x for x in qc)}L, 'negc', {-i})"
            for i, qc in enumerate(centroids)
        )
        + ")"
    )
    scored = F.transform(
        matrix,
        lambda m: F.struct(
            (
                2
                * F.aggregate(
                    F.zip_with(qv, m["c"], lambda x, c: x * c),
                    F.lit(0).cast("long"),
                    lambda acc, z: acc + z,
                )
                - m["nn"]
            ).alias("s"),
            m["negc"].alias("negc"),
        ),
    )
    return (-F.array_max(scored)["negc"]).cast("int")


def kmeans_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> list[list[int]]:
    """Run *iters* Lloyd iterations from the deterministic IVF init (the k
    smallest-id vectors, quantized).  Returns the final integer centroid
    matrix.  An empty cluster keeps its previous centroid (the standard
    determinism-preserving choice)."""
    from .compute import spread_for_compute

    cents = ivf_centroids(corpus, id_col, vec_col, k)
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    # the per-iteration argmin + posexplode + partial agg is interpreted
    # expression work over every row; a single-split input (tiny file, or
    # one unsplittable row group) would run every Lloyd iteration on one
    # core — spread first (no-op on an already-parallel scan), the
    # exchange moves only (id, qv) rows and is paid once for all iters
    base = spread_for_compute(
        corpus.select(F.col(id_col).alias("id"), qv.alias("qv"))
    ).persist()
    try:
        dim = len(cents[0])
        for _ in range(iters):
            assigned = base.select(
                _euclid_argmin(F.col("qv"), cents).alias("cluster"), "qv"
            )
            rows = (
                assigned.select(
                    "cluster", F.posexplode_outer("qv").alias("pos", "x")
                )
                .groupBy("cluster", "pos")
                .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
                .collect()
            )
            # sums[cluster][pos] = (element sum, member count)
            sums: dict[int, dict[int, tuple[int, int]]] = {}
            for r in rows:
                sums.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["n"])
            cents = [
                [
                    _halfup_div(*sums[c][p]) if c in sums else cents[c][p]
                    for p in range(dim)
                ]
                for c in range(k)
            ]
    finally:
        base.unpersist()
    return cents


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[int]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final assignment pass: (id, cluster) — a narrow map, no shuffle."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    return corpus.select(
        F.col(id_col), _euclid_argmin(qv, centroids).alias("cluster")
    )


def kmeans_fit_py(vectors: dict[int, list[float]], k: int, iters: int) -> list[list[int]]:
    """Pure-Python twin of :func:`kmeans_fit` — the exactness oracle for
    tests: same init, same integer math, same empty-cluster rule."""
    ids = sorted(vectors)
    cents = [[_quantize_py(x) for x in vectors[i]] for i in ids[:k]]
    q = {i: [_quantize_py(x) for x in vectors[i]] for i in ids}
    dim = len(cents[0])
    for _ in range(iters):
        sums: dict[int, list] = {}
        for i in ids:
            best = min(
                range(k),
                key=lambda c: (
                    -(2 * sum(x * y for x, y in zip(q[i], cents[c]))
                      - sum(y * y for y in cents[c])),
                    c,
                ),
            )
            s = sums.setdefault(best, [[0, 0] for _ in range(dim)])
            for p, x in enumerate(q[i]):
                s[p][0] += x
                s[p][1] += 1
        cents = [
            [
                _halfup_div(sums[c][p][0], sums[c][p][1]) if c in sums else cents[c][p]
                for p in range(dim)
            ]
            for c in range(k)
        ]
    return cents


def _assign_score(
    corpus: DataFrame, cents: list[list[int]], id_col: str, vec_col: str
) -> DataFrame:
    """(id, qv, cluster, csim) for every corpus row against FIXED
    centroids — cluster assignment and centroid similarity as narrow
    JVM-side integer expressions (the k·dim centroid matrix is a
    constant-folded literal; no join, no shuffle)."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    cent_arr = F.expr(
        "array("
        + ",".join(
            f"named_struct('c', array({','.join(f'{x}L' for x in c)}),"
            f" 'nn', {sum(x * x for x in c)}L)"
            for c in cents
        )
        + ")"
    )
    assigned = corpus.select(
        F.col(id_col).alias("id"),
        qv.alias("qv"),
        _euclid_argmin(qv, cents).alias("cluster"),
    )
    m = F.element_at(cent_arr, F.col("cluster") + 1)
    dot = F.aggregate(
        F.zip_with(F.col("qv"), m["c"], lambda x, c: x * c),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    nq = F.aggregate(
        F.transform(F.col("qv"), lambda x: x * x),
        F.lit(0).cast("long"),
        lambda acc, z: acc + z,
    )
    # zero-norm guard (same convention as ann_index._cell_sim): a
    # degenerate vector scores csim 0, not NaN — under ANSI SQL the bare
    # 0/0 would otherwise ABORT the whole job, and NaN would poison the
    # (csim, id) survivor order
    denom = F.sqrt(nq.cast("double")) * F.sqrt(m["nn"].cast("double"))
    return assigned.withColumn(
        "csim",
        dot.cast("double") / F.when(denom > 0, denom).otherwise(F.lit(1.0)),
    )


def _blocked_semdedup(
    scored: DataFrame,
    stored: DataFrame | None,
    threshold: float,
    block: int,
) -> DataFrame:
    """EXACT SemDeDup rule with bounded task size for oversized clusters.

    The one-task-per-cluster kernel is O(cluster²) time inside a single
    task — a skew-collapsed k-means (which near-duplicate embeddings,
    the dedup input, produce) can put a huge corpus fraction in one
    cluster and stall the stage.  The keep rule decomposes exactly:
    member x is dropped iff max cosine over ALL (csim, id)-earlier
    members ≥ threshold, and max is associative — so the cluster is cut
    into contiguous BLOCKS of the survivor order and every (earlier
    block, block) pair becomes its own bounded task (block² work,
    2·block resident vectors).  Per-member partial maxima fold with one
    thin ``groupBy(id).max`` — bit-identical to the single-task kernel
    (same int64 dots, same float64 divide, max over a different but
    exhaustive partition of the same pair set).

    *stored* rows (the incremental store's survivors) are "earlier than
    everything" by contract and ride as NEGATIVE blocks — also cut to
    ≤ *block* rows each (−1, −2, …), so a store that has accumulated a
    huge cluster still yields bounded (stored-block, batch-block) pair
    tasks, never one task holding the whole stored cluster.  Their
    internal order is irrelevant (all stored rows are earlier than every
    batch row, and stored-stored pairs are excluded).  Output matches
    :func:`_semdedup_kernel`: one row per batch member with ``qv``
    retained."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    t = threshold
    w = Window.partitionBy("cluster").orderBy("csim", "id")
    # rank on a thin projection (no vectors ride the sort), then hang the
    # block id back on the full rows by unique id
    ranked = (
        scored.select("cluster", "csim", "id")
        .withColumn(
            "__b",
            ((F.row_number().over(w) - F.lit(1)) / F.lit(block)).cast("int"),
        )
        .select("id", "__b")
    )
    blocked = scored.select("id", "qv", "cluster", "csim").join(
        ranked, on="id"
    )
    if stored is not None:
        ws = Window.partitionBy("cluster").orderBy("id")
        s_ranked = (
            stored.select("cluster", "id")
            .withColumn(
                "__b",
                (
                    -1
                    - ((F.row_number().over(ws) - F.lit(1)) / F.lit(block))
                ).cast("int"),
            )
            .select("id", "__b")
        )
        blocked = blocked.unionByName(
            stored.select("id", "qv", "cluster", "csim").join(
                s_ranked, on="id"
            )
        )
    packed = blocked.groupBy("cluster", "__b").agg(
        F.collect_list(F.struct("id", "csim", "qv")).alias("mem")
    )
    pairs = (
        packed.alias("L")
        .join(
            packed.alias("R"),
            (F.col("L.cluster") == F.col("R.cluster"))
            & (F.col("L.__b") <= F.col("R.__b"))
            & (F.col("R.__b") >= 0),
        )
        .select(
            F.col("L.__b").alias("lb"),
            F.col("R.__b").alias("rb"),
            F.col("L.mem").alias("lmem"),
            F.col("R.mem").alias("rmem"),
        )
        # spread the pair tasks: without this, the arrow batches keep
        # several block-pairs on one core while others idle
        .repartition(F.col("lb"), F.col("rb"))
    )

    def kernel(pdfs):
        for pdf in pdfs:
            for lb, rb, lmem, rmem in zip(
                pdf["lb"], pdf["rb"], pdf["lmem"], pdf["rmem"]
            ):
                Ml = np.stack(
                    [np.asarray(m["qv"]) for m in lmem]
                ).astype(np.int64)
                Mr = np.stack(
                    [np.asarray(m["qv"]) for m in rmem]
                ).astype(np.int64)
                lnorm = np.sqrt((Ml * Ml).sum(axis=1).astype(np.float64))
                rnorm = np.sqrt((Mr * Mr).sum(axis=1).astype(np.float64))
                dots = Ml @ Mr.T
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = dots.astype(np.float64) / (
                        lnorm[:, None] * rnorm[None, :]
                    )
                # NaN (zero-norm cosine) = never-a-duplicate, BEFORE the
                # max: Spark's F.max/>= order NaN greatest, numpy's
                # propagate it — scrubbing here keeps the folded verdict
                # identical to the single-task kernels
                q = np.where(np.isnan(q), -np.inf, q)
                if lb == rb:
                    lcs = np.asarray([m["csim"] for m in lmem])
                    lid = np.asarray([m["id"] for m in lmem])
                    rcs = np.asarray([m["csim"] for m in rmem])
                    rid = np.asarray([m["id"] for m in rmem])
                    earlier = (lcs[:, None] < rcs[None, :]) | (
                        (lcs[:, None] == rcs[None, :])
                        & (lid[:, None] < rid[None, :])
                    )
                    q = np.where(earlier, q, -np.inf)
                yield pd.DataFrame(
                    {
                        "id": [m["id"] for m in rmem],
                        "mp": q.max(axis=0) if q.size else
                        np.full(len(rmem), -np.inf),
                    }
                )

    partial = pairs.mapInPandas(kernel, schema="id long, mp double")
    folded = partial.groupBy("id").agg(F.max("mp").alias("__mp"))
    return scored.join(folded, on="id", how="left").select(
        "id", "qv", "cluster", "csim",
        (
            ~(
                F.coalesce(F.col("__mp"), F.lit(float("-inf")))
                >= F.lit(t)
            )
        ).alias("kept"),
    )


def _oversized_clusters(
    scored: DataFrame, cluster_cap: int | None
) -> list[int]:
    """Cluster ids whose member count exceeds *cluster_cap* (k-sized
    collect); logs the skew event — at scale this is the signal that k
    is too small for the corpus and a re-fit is worth scheduling."""
    if cluster_cap is None:
        return []
    big = [
        (r["cluster"], r["count"])
        for r in scored.groupBy("cluster").count().collect()
        if r["count"] > cluster_cap
    ]
    if big:
        import logging

        logging.getLogger(__name__).warning(
            "semantic_dedup: %d cluster(s) exceed cluster_cap=%d %s — "
            "routing them through the blocked pair kernel (exact, "
            "bounded task size); consider raising k",
            len(big), cluster_cap, big[:8],
        )
    return [c for c, _ in big]


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.9,
    centroids: list[list[int]] | None = None,
    cluster_cap: int | None = 100_000,
    block: int = 8192,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters the embedding space, pairs WITHIN
    a cluster whose quantized cosine reaches *threshold* are semantic
    duplicates, and each duplicate neighborhood keeps its member with the
    LOWEST similarity to the cluster centroid (the paper's rule — the
    survivor is the least-redundant representative).  Concretely, member
    x is dropped iff some member y of the same cluster with
    (csim(y), id(y)) < (csim(x), id(x)) has cos(x, y) ≥ threshold.

    Returns (id, cluster, csim, kept) for EVERY corpus row — downstream
    filters ``kept`` to materialize the deduplicated corpus, or inspects
    the dropped complement.

    Scale shape: cluster assignment + centroid similarity are narrow
    JVM-side integer expressions (no join — the k·dim centroid matrix is
    a constant-folded literal); the pairwise verify runs as a
    cluster-local Arrow kernel (``groupBy(cluster).applyInPandas``, the
    same chunked int64-matmul shape as
    similarity.lsh_blocked_near_dup_pairs), so the whole operator is ONE
    shuffle on the cluster key and no pair row ever materializes — each
    member carries only the running max-similarity-to-earlier-members.
    Pair work is Σ cluster_size², the quantity *k* controls: the paper
    runs k ≈ 11k at 100M-document scale so clusters stay executor-sized;
    the resident per-cluster matrix (~0.5 GiB at 1M×64) is the cap, and
    raising k is the knob.  Integer-exact dots + single-IEEE-op
    norms/divide keep every csim and pairwise cosine bit-identical to
    the SQL oracle (oracle_sql.semantic_dedup_oracle), so even the
    approximate clustering decomposition is value-checked end-to-end.
    """
    import numpy as np
    import pandas as pd

    from .compute import spread_for_compute

    cents = centroids if centroids is not None else kmeans_fit(
        corpus, id_col, vec_col, k, iters
    )
    # checkpoint: the scored frame feeds the size guard's count AND the
    # kernel branch(es) — one assignment pass, not one per consumer.
    # The assignment itself is interpreted per-row expression work —
    # spread a single-split input across cores before paying it (the
    # checkpoint keeps the downstream plan the pinned one-exchange shape)
    scored = _assign_score(
        spread_for_compute(corpus), cents, id_col, vec_col
    ).localCheckpoint()
    t = threshold
    chunk = 4096
    # skew guard (round-7 finding): clusters above *cluster_cap* route
    # through the blocked pair kernel — EXACT same keep-set, task size
    # bounded at block² instead of cluster² (cluster_cap=None disables,
    # restoring the one-task-per-cluster plan unconditionally)
    big = _oversized_clusters(scored, cluster_cap)

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        # the (csim, id) sort IS the survivor order — ties on the double
        # break by id, mirroring the oracle's tuple comparison
        pdf = pdf.sort_values(["csim", "id"]).reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"id": [], "cluster": [], "csim": [], "kept": []}
            )
        M = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        norms = np.sqrt((M * M).sum(axis=1).astype(np.float64))
        max_prior = np.full(n, -np.inf)
        for j0 in range(0, n, chunk):
            j1 = min(j0 + chunk, n)
            for i0 in range(0, j1, chunk):
                i1 = min(i0 + chunk, n)
                dots = M[i0:i1] @ M[j0:j1].T
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = dots.astype(np.float64) / (
                        norms[i0:i1, None] * norms[None, j0:j1]
                    )
                earlier = (
                    np.arange(i0, i1)[:, None] < np.arange(j0, j1)[None, :]
                )
                # a zero-norm vector's cosine is NaN (0/0) — define it as
                # never-a-duplicate (-inf) so it can't poison the max and
                # every kernel (plain / blocked / incremental) agrees
                q = np.where(earlier & ~np.isnan(q), q, -np.inf)
                if q.size:
                    max_prior[j0:j1] = np.maximum(max_prior[j0:j1], q.max(axis=0))
        return pd.DataFrame(
            {
                "id": pdf["id"],
                "cluster": pdf["cluster"],
                "csim": pdf["csim"],
                "kept": ~(max_prior >= t),
            }
        )

    small = (
        scored.filter(~F.col("cluster").isin(big)) if big else scored
    )
    out = small.groupBy("cluster").applyInPandas(
        per_cluster, schema="id long, cluster int, csim double, kept boolean"
    )
    if big:
        out = out.unionByName(
            _blocked_semdedup(
                scored.filter(F.col("cluster").isin(big)), None, t, block
            ).select("id", "cluster", "csim", "kept")
        )
    return out


class IncrementalSemDedup:
    """Cross-batch SemDeDup against a persisted survivor store — the
    embedding-space twin of the banded signature store
    (functions/dedup.py): new batches are deduplicated against every
    SURVIVOR kept so far without ever rescanning past batches.

    Contract (the online variant of the batch rule): centroids are
    FROZEN at seed (like the IVF index — drift is a rebuild, not a
    refresh); a new-batch member x is dropped iff its quantized cosine
    to some STORED survivor of its cluster reaches the threshold, or to
    some batch member earlier than x in (csim, id) order.  Stored
    survivors are "earlier" by definition — they arrived first — so the
    decision is deterministic given the batch split, and survivors are
    never retroactively dropped (once kept, always kept).

    Scale shape: assignment + centroid similarity are narrow JVM
    expressions; the verify is the same cluster-local chunked Arrow
    matmul as :func:`semantic_dedup`, ONE shuffle on the cluster key
    over (batch ∪ store-restricted-to-batch-clusters); the store is
    cluster-partitioned parquet, so that restriction is partition
    pruning, and each batch appends one file set per touched cluster.
    Survivor counts are bounded by the threshold's packing number per
    cluster region, not by corpus size — the store grows with DISTINCT
    content only.

    Layout::

        <root>/_meta.json     {"centroids": [...], "k", "threshold",
                               "batches": N}   (os.replace)
        <root>/kept/cluster=<c>/…  (id, qv, csim) survivor rows
    """

    def __init__(
        self,
        root,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        k: int = 8,
        iters: int = 3,
        threshold: float = 0.9,
        cluster_cap: int | None = 100_000,
        block: int = 8192,
    ):
        from pathlib import Path

        self.root = Path(root)
        self.id_col, self.vec_col = id_col, vec_col
        self.k, self.iters, self.threshold = k, iters, threshold
        self.cluster_cap, self.block = cluster_cap, block

    def _meta_path(self):
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        import json

        return json.loads(self._meta_path().read_text())

    def _write_meta(self, meta: dict) -> None:
        import json
        import os
        import tempfile

        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def _append_kept(self, decisions: DataFrame) -> None:
        (
            decisions.filter(F.col("kept"))
            .select("id", "qv", "cluster", "csim")
            .write.mode("append")
            .partitionBy("cluster")
            .parquet(str(self.root / "kept"))
        )

    @staticmethod
    def _cluster_stats(scored: DataFrame) -> dict:
        """Per-cluster (count, Σ csim) — a k-sized collect over a frame
        the batch flow already materialized."""
        rows = (
            scored.groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("csim").alias("s"))
            .collect()
        )
        return {int(r["cluster"]): (int(r["n"]), float(r["s"] or 0.0)) for r in rows}

    # -- drift monitor (frozen-centroid staleness, same contract as the
    # ANN index's: the monitor guards DEDUP QUALITY — drifted batches
    # land in wrong clusters and near-dups stop meeting — while the rule
    # itself stays deterministic either way) ------------------------------
    def drift_stats(self) -> dict:
        """Incoming-batch distribution vs the seed fit — a metadata
        read.  Empty dict for a legacy (pre-monitor) meta or before any
        post-seed batch.

        - ``batch_max_share`` / ``skew_factor``: the post-seed rows'
          largest-cluster share vs the seed's (a collapsed assignment
          inflates the O(cluster²)-bounded work AND mis-blocks dups);
        - ``assign_sim_drop``: seed mean centroid-cosine minus the
          post-seed mean — incoming vectors no longer resemble what the
          centroids were fit on;
        - ``processed_ratio``: post-seed rows / seed rows (exposure
          odometer; informational, not a trip condition — a store is
          SUPPOSED to outlive its seed many times over)."""
        d = self.meta().get("drift")
        if not d:
            return {}
        cur_n = int(d.get("cur_n", 0))
        if cur_n <= 0:
            return {}
        counts = [n for n in d.get("cur_cluster_counts", {}).values() if n > 0]
        cur_share = (max(counts) / cur_n) if counts else 0.0
        built_share = d.get("built_max_share") or 0.0
        return {
            "cur_n": float(cur_n),
            "batch_max_share": cur_share,
            "skew_factor": cur_share / built_share if built_share else 0.0,
            "assign_sim_drop": (
                d.get("built_mean_sim", 0.0)
                - d.get("cur_sim_sum", 0.0) / cur_n
            ),
            "processed_ratio": (
                cur_n / d["built_n"] if d.get("built_n") else 0.0
            ),
        }

    def needs_rebuild(
        self, skew_factor: float = 2.0, sim_drop: float = 0.05
    ) -> bool:
        """True when the incoming distribution has left the frozen fit
        (cluster collapse or centroid-cosine drop) — re-seed a fresh
        store and re-dedup forward from it.  Never trips on volume
        alone."""
        s = self.drift_stats()
        if not s:
            return False
        return (
            s["skew_factor"] >= skew_factor
            or s["assign_sim_drop"] >= sim_drop
        )

    def health_gauges(self) -> dict:
        s = self.drift_stats()
        return {**s, "needs_rebuild": 1.0 if self.needs_rebuild() else 0.0}

    def seed(self, spark, batch: DataFrame) -> DataFrame:
        """Fit centroids on the first batch, run the one-shot rule, and
        persist the survivors.  Returns (id, cluster, csim, kept) for
        every batch row."""
        if self.exists():
            raise ValueError(f"store at {self.root} is already seeded")
        cents = kmeans_fit(batch, self.id_col, self.vec_col, self.k, self.iters)
        scored = _assign_score(
            batch, cents, self.id_col, self.vec_col
        ).localCheckpoint()  # feeds the size guard + the kernel once each
        decisions = _semdedup_kernel(
            scored, None, self.threshold, self.cluster_cap, self.block
        ).localCheckpoint()
        self._append_kept(decisions)
        # drift baseline: the seed batch's per-cluster shares + mean
        # centroid-cosine under the just-fit centroids (k-sized collect
        # over the checkpointed decisions — no extra corpus pass); the
        # "cur" side starts EMPTY and accumulates post-seed batches, so
        # the monitor measures incoming drift, not the seed against
        # itself
        stats = self._cluster_stats(decisions)
        built_n = sum(n for n, _ in stats.values())
        self._write_meta(
            {
                "centroids": cents,
                "k": self.k,
                "iters": self.iters,
                "threshold": self.threshold,
                "batches": 1,
                "drift": {
                    "built_n": built_n,
                    "built_max_share": (
                        max((n for n, _ in stats.values()), default=0)
                        / built_n
                        if built_n
                        else 0.0
                    ),
                    "built_mean_sim": (
                        sum(s for _, s in stats.values()) / built_n
                        if built_n
                        else 0.0
                    ),
                    "cur_cluster_counts": {},
                    "cur_n": 0,
                    "cur_sim_sum": 0.0,
                },
            }
        )
        return decisions.drop("qv")

    def dedup_batch(self, spark, batch: DataFrame) -> DataFrame:
        """Deduplicate *batch* against the store (and itself), append the
        new survivors, and return (id, cluster, csim, kept)."""
        meta = self.meta()
        if meta["threshold"] != self.threshold:
            raise ValueError(
                f"store at {self.root} was seeded with threshold="
                f"{meta['threshold']}; constructed with {self.threshold}"
            )
        scored = _assign_score(
            batch, meta["centroids"], self.id_col, self.vec_col
        ).localCheckpoint()  # pin: cluster ids drive the store pruning
        clusters = [
            r["cluster"] for r in scored.select("cluster").distinct().collect()
        ]
        spark_ = scored.sparkSession
        stored = (
            spark_.read.parquet(str(self.root / "kept"))
            .filter(F.col("cluster").isin(clusters))  # partition pruning
            .select("id", "qv", "cluster", "csim")
        )
        decisions = _semdedup_kernel(
            scored, stored, meta["threshold"], self.cluster_cap, self.block
        ).localCheckpoint()
        self._append_kept(decisions)
        meta["batches"] += 1
        # drift bookkeeping (legacy pre-monitor metas carry no baseline
        # — skipped, needs_rebuild stays silent until a re-seed)
        d = meta.get("drift")
        if d is not None:
            stats = self._cluster_stats(scored)
            counts = d.get("cur_cluster_counts", {})
            for c, (n, _) in stats.items():
                counts[str(c)] = counts.get(str(c), 0) + n
            d["cur_cluster_counts"] = counts
            d["cur_n"] = d.get("cur_n", 0) + sum(n for n, _ in stats.values())
            d["cur_sim_sum"] = d.get("cur_sim_sum", 0.0) + sum(
                s for _, s in stats.values()
            )
        self._write_meta(meta)
        return decisions.drop("qv")


def _semdedup_kernel(
    scored: DataFrame,
    stored: DataFrame | None,
    threshold: float,
    cluster_cap: int | None = 100_000,
    block: int = 8192,
) -> DataFrame:
    """Cluster-local survivor rule over (batch ∪ stored) with the same
    skew guard as :func:`semantic_dedup`: oversized clusters route
    through the blocked pair kernel — exact keep-set, bounded task
    size.  Sizing counts batch AND stored rows (a small batch against a
    store that has accumulated a collapsed cluster must still block —
    the plain kernel's task holds both sides)."""
    sized = (
        scored
        if stored is None
        else scored.select("cluster").unionByName(stored.select("cluster"))
    )
    big = _oversized_clusters(sized, cluster_cap)
    if not big:
        return _plain_semdedup_kernel(scored, stored, threshold)
    in_big = F.col("cluster").isin(big)
    return _plain_semdedup_kernel(
        scored.filter(~in_big),
        stored.filter(~in_big) if stored is not None else None,
        threshold,
    ).unionByName(
        _blocked_semdedup(
            scored.filter(in_big),
            stored.filter(in_big) if stored is not None else None,
            threshold,
            block,
        )
    )


def _plain_semdedup_kernel(
    scored: DataFrame, stored: DataFrame | None, threshold: float
) -> DataFrame:
    """One-task-per-cluster survivor rule over (batch ∪ stored): batch
    members sorted by (csim, id); each is dropped iff its max cosine to a
    stored survivor or an EARLIER batch member reaches *threshold*.
    Output has one row per BATCH member (stored rows only arm the
    comparison), with qv retained so the caller can persist new
    survivors."""
    import numpy as np
    import pandas as pd

    t = threshold
    chunk = 4096
    batch = scored.withColumn("__stored", F.lit(False))
    frame = (
        batch
        if stored is None
        else batch.unionByName(stored.withColumn("__stored", F.lit(True)))
    )

    def per_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        new = pdf[~pdf["__stored"]].sort_values(["csim", "id"]).reset_index(drop=True)
        old = pdf[pdf["__stored"]]
        n = len(new)
        if n == 0:
            return pd.DataFrame(
                {"id": [], "qv": [], "cluster": [], "csim": [], "kept": []}
            )
        M = np.stack(new["qv"].to_numpy()).astype(np.int64)
        norms = np.sqrt((M * M).sum(axis=1).astype(np.float64))
        max_prior = np.full(n, -np.inf)
        if len(old):
            S = np.stack(old["qv"].to_numpy()).astype(np.int64)
            snorms = np.sqrt((S * S).sum(axis=1).astype(np.float64))
            for j0 in range(0, n, chunk):
                j1 = min(j0 + chunk, n)
                for i0 in range(0, len(old), chunk):
                    i1 = min(i0 + chunk, len(old))
                    dots = S[i0:i1] @ M[j0:j1].T
                    with np.errstate(divide="ignore", invalid="ignore"):
                        q = dots.astype(np.float64) / (
                            snorms[i0:i1, None] * norms[None, j0:j1]
                        )
                    q = np.where(np.isnan(q), -np.inf, q)  # zero-norm ≠ dup
                    if q.size:
                        max_prior[j0:j1] = np.maximum(
                            max_prior[j0:j1], q.max(axis=0)
                        )
        for j0 in range(0, n, chunk):
            j1 = min(j0 + chunk, n)
            for i0 in range(0, j1, chunk):
                i1 = min(i0 + chunk, j1)
                dots = M[i0:i1] @ M[j0:j1].T
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = dots.astype(np.float64) / (
                        norms[i0:i1, None] * norms[None, j0:j1]
                    )
                earlier = (
                    np.arange(i0, i1)[:, None] < np.arange(j0, j1)[None, :]
                )
                # a zero-norm vector's cosine is NaN (0/0) — define it as
                # never-a-duplicate (-inf) so it can't poison the max and
                # every kernel (plain / blocked / incremental) agrees
                q = np.where(earlier & ~np.isnan(q), q, -np.inf)
                if q.size:
                    max_prior[j0:j1] = np.maximum(max_prior[j0:j1], q.max(axis=0))
        return pd.DataFrame(
            {
                "id": new["id"],
                "qv": new["qv"],
                "cluster": new["cluster"],
                "csim": new["csim"],
                "kept": ~(max_prior >= t),
            }
        )

    return frame.groupBy("cluster").applyInPandas(
        per_cluster,
        schema="id long, qv array<long>, cluster int, csim double, kept boolean",
    )
