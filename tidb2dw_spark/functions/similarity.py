"""Similarity search over an embedding column (array<float>).

Brute-force cosine/dot top-k as the exact baseline, and a sign-bit
(random-hyperplane) LSH bucketed variant as the scale path.  Vector math
uses ``zip_with`` + ``aggregate`` higher-order functions — JVM-side fold
per row, no Python, no explode, no shuffle for the scoring pass.

Scale design: queries are broadcast (a query set is small by definition);
the corpus is scanned once, each partition scores its rows against all
broadcast queries, and only (query_id, top-k candidates) leave the
executors through a partial top-k (window over query_id after a per-
partition filter).  At 100 TB the LSH variant prunes the scan: bucket
signatures are precomputed into the corpus table, queries probe only
matching buckets — partition pruning on the bucket column turns the scan
into an index lookup.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import md5_long


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + fold (sequential, deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def quantized_dot(a: Column, b: Column, scale: int = 1_000_000) -> Column:
    """Integer-quantized dot product: Σ round(aᵢ·s)·round(bᵢ·s) as BIGINT.
    Exact, order-independent integer math — the cross-engine-reproducible
    ranking key for oracle-checked top-k (float accumulation order differs
    between engines; int64 addition cannot)."""
    qa = F.transform(a, lambda x: F.round(x.cast("double") * scale).cast("long"))
    qb = F.transform(b, lambda x: F.round(x.cast("double") * scale).cast("long"))
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine(a: Column, b: Column, scale: int = 1_000_000) -> Column:
    """Cosine over integer-quantized vectors: exact int64 dots, then
    single-op double sqrt/divide — bit-identical across engines (the
    cross-engine-checkable stand-in for float cosine)."""
    qa = F.transform(a, lambda x: F.round(x.cast("double") * scale).cast("long"))
    qb = F.transform(b, lambda x: F.round(x.cast("double") * scale).cast("long"))

    def idot(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, v_: acc + v_,
        )

    return idot(qa, qb).cast("double") / (
        F.sqrt(idot(qa, qa).cast("double")) * F.sqrt(idot(qb, qb).cast("double"))
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, qcos ≥ threshold).

    Exact all-pairs self-join — correct baseline and fine for modest corpora
    / within LSH buckets; at 100 TB compose with :func:`lsh_bucket` to
    confine the pair space (same shape as dedup.minhash_lsh_pairs)."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )

    def idot(u: Column, w: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, z: acc + z,
        )

    v = df.select(F.col(id_col).alias("id"), qv.alias("qv")).withColumn(
        "norm", F.sqrt(idot(F.col("qv"), F.col("qv")).cast("double"))
    )
    left, right = v.alias("l"), v.alias("r")
    pairs = left.join(right, F.col("l.id") < F.col("r.id")).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        (
            idot(F.col("l.qv"), F.col("r.qv")).cast("double")
            / (F.col("l.norm") * F.col("r.norm"))
        ).alias("qcos"),
    )
    return pairs.filter(F.col("qcos") >= threshold)


def embedding_near_dup_pairs_arrow(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Arrow kernel for :func:`embedding_near_dup_pairs` — same exact
    result (identical int64 dots + IEEE divide), different physical plan.

    The expression version materializes the n×n pair space as a
    BroadcastNestedLoopJoin — the worst plan shape Spark has.  Here the
    quantized matrix ships once as a driver array (n×d int64; bounded the
    same way as a broadcast side — ~0.5 GiB at 1M×64, beyond which exact
    all-pairs is off the table anyway and the LSH/IVF approximate paths
    are the tool), and each corpus partition computes ONE vectorized
    int64 matmul against it, emitting only pairs (id_a < id_b, qcos ≥ t).
    Plan: single scan + mapInPandas, no join node at all; work is
    O(n²·d/P) SIMD multiply-adds instead of interpreted per-pair lambdas.

    Exactness note: at thresholds where LSH blocking is effective
    (tight angles, ≥0.9 on real near-dup corpora) prefer
    :func:`lsh_blocked_near_dup_pairs` for sub-quadratic work; this
    kernel is the exact path when the threshold sits too close to the
    corpus' noise floor for blocking to preserve recall."""
    from pyspark.sql import types as T

    rows = df.select(id_col, vec_col).collect()
    ids_all = np.array([r[id_col] for r in rows], dtype=np.int64)
    B = np.array(
        [[_quantize_py(x) for x in r[vec_col]] for r in rows], dtype=np.int64
    )
    b_norm = np.sqrt((B * B).sum(axis=1).astype(np.float64))

    def qarr(c: Column) -> Column:
        return F.transform(c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))

    base = df.select(F.col(id_col).alias("id"), qarr(F.col(vec_col)).alias("qv"))
    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType(), False),
            T.StructField("id_b", T.LongType(), False),
            T.StructField("qcos", T.DoubleType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["qv"].to_numpy())                      # (m, d) int64
            mids = pdf["id"].to_numpy()
            m_norm = np.sqrt((M * M).sum(axis=1).astype(np.float64))
            D = M @ B.T                                             # exact int64
            # operand order matches the expression path: norm_a * norm_b
            S = D.astype(np.float64) / (m_norm[:, None] * b_norm[None, :])
            # each unordered pair emitted once, by the partition owning id_a
            keep = (mids[:, None] < ids_all[None, :]) & (S >= threshold)
            ii, jj = np.nonzero(keep)
            yield pd.DataFrame(
                {"id_a": mids[ii], "id_b": ids_all[jj], "qcos": S[ii, jj]}
            )

    return base.mapInPandas(kernel, schema=out_schema)


def _brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    metric: str,
) -> DataFrame:
    """Arrow kernel for quantized top-k: queries collect to the driver
    (small by definition — same trust as a broadcast), each corpus
    partition scores its rows against all queries with ONE int64 matmul
    and emits only its local top-k per query; a final window ranks the
    partitions' candidates.  Exact: integer accumulation + single IEEE
    division, and per-partition pruning cannot drop a global top-k row.

    Scale: executors ship (partitions × queries × k) candidate rows — the
    same partial-top-k shape as the expression path, minus interpreted
    per-element lambdas."""
    from pyspark.sql import types as T

    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.array(
        [[_quantize_py(x) for x in r[vec_col]] for r in q_rows], dtype=np.int64
    )
    q_norm = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))

    def qarr(c: Column) -> Column:
        return F.transform(c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))

    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), qarr(F.col(vec_col)).alias("qv")
    )
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("score", T.DoubleType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["qv"].to_numpy())                      # (n, d) int64
            nids = pdf["neighbor_id"].to_numpy()
            D = M @ Q.T                                             # (n, m) exact
            if metric == "quantized_cosine":
                c_norm = np.sqrt((M * M).sum(axis=1).astype(np.float64))
                # operand order matches the expression path: q_norm * c_norm
                S = D.astype(np.float64) / (q_norm[None, :] * c_norm[:, None])
            elif metric == "quantized_sqeuclid":
                # negated exact integer distance: rank desc ≡ dist asc;
                # |dist| < 2^53 at 1e6-quantized 64-dim, so the double is
                # exact and cross-engine reproducible
                m2 = (M * M).sum(axis=1)
                q2 = (Q * Q).sum(axis=1)
                S = -(m2[:, None] - 2 * D + q2[None, :]).astype(np.float64)
            else:  # quantized_dot
                S = D.astype(np.float64)
            rows_q, rows_n, rows_s = [], [], []
            for j in range(len(qids)):
                mask = nids != qids[j]                              # drop self-pair
                s_j, n_j = S[mask, j], nids[mask]
                # (score desc, neighbor_id asc): lexsort minor→major
                order = np.lexsort((n_j, -s_j))[:k]
                rows_q.extend([qids[j]] * len(order))
                rows_n.extend(n_j[order])
                rows_s.extend(s_j[order])
            yield pd.DataFrame(
                {"query_id": rows_q, "neighbor_id": rows_n, "score": rows_s}
            )

    cand = base.mapInPandas(kernel, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "cosine",
    kernel: str = "expr",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus scan.

    Returns (query_id, neighbor_id, score, rank), self-pairs excluded,
    ties broken by neighbor_id ascending (deterministic).

    ``kernel='arrow'`` (quantized metrics only) switches the scoring pass
    to a vectorized int64 matmul with per-partition partial top-k — same
    exact results, no interpreted per-element lambdas."""
    if kernel == "arrow":
        if metric not in ("quantized_cosine", "quantized_dot", "quantized_sqeuclid"):
            raise ValueError("arrow kernel requires a quantized metric")
        return _brute_force_topk_arrow(corpus, queries, id_col, vec_col, k, metric)
    if metric == "quantized_sqeuclid":
        raise ValueError("quantized_sqeuclid is arrow-kernel-only")
    # precompute per-side quantized arrays / norms BEFORE the pair join:
    # per-pair work is then one dot product, not three (norms are per-row,
    # computing them inside the n×q join multiplies the work by the fan-out)
    def qarr(c: Column) -> Column:
        return F.transform(c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))

    def idot(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, w: acc + w,
        )

    if metric in ("quantized_cosine", "quantized_dot"):
        q = queries.select(
            F.col(id_col).alias("query_id"), qarr(F.col(vec_col)).alias("q_vec")
        ).withColumn("q_norm", F.sqrt(idot(F.col("q_vec"), F.col("q_vec")).cast("double")))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), qarr(F.col(vec_col)).alias("c_vec")
        ).withColumn("c_norm", F.sqrt(idot(F.col("c_vec"), F.col("c_vec")).cast("double")))
        dot = idot(F.col("q_vec"), F.col("c_vec"))
        if metric == "quantized_cosine":
            score = dot.cast("double") / (F.col("q_norm") * F.col("c_norm"))
        else:
            score = dot
    else:
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("q_norm", l2_norm(F.col("q_vec")))
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ).withColumn("c_norm", l2_norm(F.col("c_vec")))
        if metric == "cosine":
            score = dot_product(F.col("q_vec"), F.col("c_vec")) / (
                F.col("q_norm") * F.col("c_norm")
            )
        elif metric == "dot":
            score = dot_product(F.col("q_vec"), F.col("c_vec"))
        else:
            raise ValueError(f"unknown metric {metric!r}")
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", score.alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) — the other scale path: coarse-quantize the corpus into
# cells, probe only the n_probe nearest cells per query
# ---------------------------------------------------------------------------
def _quantize_py(x: float, scale: int = 1_000_000) -> int:
    """HALF_UP rounding of x*scale — matches Spark ``F.round`` and DuckDB
    ``round`` (Python's built-in round is half-to-even and would diverge on
    exact-.5 products)."""
    import math

    v = float(x) * scale
    return int(math.floor(v + 0.5)) if v >= 0 else int(math.ceil(v - 0.5))


def auto_n_centroids(n_rows: int) -> int:
    """Corpus-scaled IVF cell count: ``max(16, ceil(sqrt(N)))``.

    The classic IVF sizing rule — with √N cells, expected cell size is
    also √N, so probe cost (n_probe cells) and per-cell scan cost grow
    together as √N instead of one of them absorbing ALL corpus growth.
    A FIXED cell count makes every cell O(N): measured in SCALE.md as
    the one super-linear serving row (7.9× at 10× data under 16 cells;
    2.8× with √N cells).  Integer-exact ceil via isqrt — no float sqrt,
    so build sizing is deterministic cross-platform."""
    import math

    n = max(0, int(n_rows))
    return max(16, math.isqrt(n - 1) + 1 if n > 1 else 1)


def ivf_centroids(
    corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> list[list[int]]:
    """Deterministic coarse centroids: the *n_centroids* corpus vectors with
    the smallest ids, integer-quantized.  (Random-init IVF; a k-means
    refinement would only improve recall, not change the operator contract.)
    Driver-side collect of n_centroids rows — metadata-sized, like the
    broadcast threshold stats AQE collects."""
    rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(n_centroids).collect()
    return [[_quantize_py(x) for x in r[vec_col]] for r in rows]


def _cell_score_structs(qv: Column, centroids: list[list[int]]) -> Column:
    """array<struct<s: double, negc: int>> — per-centroid ranking score of
    *qv*, as ONE nested-literal matrix traversal.

    Ranking key is ``dot(qv, c) / ‖c‖`` — for a fixed row, ordering over
    cells is identical to cosine (the row norm is a positive per-row
    constant), and dropping it keeps the per-element lambda to a single
    fold.  The centroid matrix and norms are built with one ``F.expr`` each
    (a thousand ``F.lit`` calls would cost seconds of Py4J round-trips) and
    constant-fold into single literals.  One expression, evaluated once per
    row — projection collapse cannot duplicate it (an N-separate-columns
    formulation gets inlined N× by downstream argmax references).
    Struct order (s, negc): max = best score, ties prefer the LOWER cell."""
    import math

    matrix = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{x}L" for x in qc) + ")" for qc in centroids
        )
        + ")"
    )
    norm_negidx = F.expr(
        "array("
        + ",".join(
            f"named_struct('nc', {math.sqrt(sum(x * x for x in qc))!r}D, 'negc', {-i})"
            for i, qc in enumerate(centroids)
        )
        + ")"
    )

    def idot(u: Column, v: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, w: acc + w,
        )

    return F.zip_with(
        matrix,
        norm_negidx,
        lambda c, ni: F.struct(
            (idot(qv, c).cast("double") / ni["nc"]).alias("s"),
            ni["negc"].alias("negc"),
        ),
    )


def _arrow_cells(
    df: DataFrame, out_id: str, centroids: list[list[int]], n_top: int
) -> DataFrame:
    """(id, qv, cells[ n_top ]) via an Arrow-batched integer matmul.

    Exactness: quantized vectors and centroids are int64, so the matmul
    accumulates exact integers (|dot| ≤ dim·(scale/2)² ≪ 2⁶³); the ranking
    division by ‖c‖ is one IEEE double op — bit-identical to the
    expression kernel and the SQL oracle.  Ties: np.argsort(kind='stable')
    on the negated scores keeps ascending cell order, matching
    (score DESC, cell ASC)."""
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=np.int64)                  # (k, d)
    c_norm = np.sqrt((C * C).sum(axis=1).astype(np.float64))   # exact ints → f64

    schema = T.StructType(
        [
            T.StructField(out_id, T.LongType(), False),
            T.StructField("qv", T.ArrayType(T.LongType()), False),
            T.StructField("cells", T.ArrayType(T.IntegerType()), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf["qv"].to_numpy())                 # (n, d) int64
            R = (M @ C.T).astype(np.float64) / c_norm          # (n, k)
            order = np.argsort(-R, axis=1, kind="stable")[:, :n_top]
            yield pd.DataFrame(
                {
                    out_id: pdf[out_id].to_numpy(),
                    "qv": pdf["qv"],
                    "cells": list(order.astype(np.int32)),
                }
            )

    return df.mapInPandas(kernel, schema=schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    kernel: str = "arrow",
) -> DataFrame:
    """Approximate top-k via IVF: each corpus vector is assigned to its
    nearest centroid cell (argmax dot/‖c‖, ties → lowest cell); each query
    probes its *n_probe* nearest cells and scores only vectors in them —
    n_probe/n_centroids of the corpus per query.

    Scale shape: cell assignment is a narrow map over the corpus scan — no
    shuffle, no join.  At 100 TB the assigned corpus is written partitioned
    by cell and probes become partition-pruned scans.  Ranking uses
    integer-quantized math throughout, so results are exactly reproducible
    cross-engine with either kernel:

    - ``kernel='arrow'`` (default): Arrow-batched int64 numpy matmul —
      vectorized, ~5× faster than interpreted higher-order functions, and
      still exact (integer accumulation, single IEEE division).
    - ``kernel='expr'``: pure JVM expressions (zero Python on the hot
      path) — use where Python workers are unavailable/undesirable."""
    centroids = ivf_centroids(corpus, id_col, vec_col, n_centroids)

    def qarr(c: Column) -> Column:
        return F.transform(c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))

    def base(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(F.col(id_col).alias(out_id), qarr(F.col(vec_col)).alias("qv"))

    if kernel == "arrow":
        assigned = _arrow_cells(base(corpus, "neighbor_id"), "neighbor_id", centroids, 1).select(
            "neighbor_id", "qv", F.col("cells")[0].alias("cell")
        )
        probes = _arrow_cells(base(queries, "query_id"), "query_id", centroids, n_probe).select(
            "query_id", "qv", F.explode("cells").alias("cell")
        )
    elif kernel == "expr":
        def with_cells(df: DataFrame, out_id: str) -> DataFrame:
            return base(df, out_id).withColumn(
                "cells", _cell_score_structs(F.col("qv"), centroids)
            )

        assigned = with_cells(corpus, "neighbor_id").select(
            "neighbor_id",
            "qv",
            # array_max traverses the score array once (struct order: best
            # score, ties -> lower cell)
            (-F.array_max(F.col("cells"))["negc"]).alias("cell"),
        )
        probes = with_cells(queries, "query_id").select(
            "query_id",
            "qv",
            F.explode_outer(
                F.transform(
                    F.slice(F.sort_array(F.col("cells"), asc=False), 1, n_probe),
                    lambda s: -s["negc"],
                )
            ).alias("cell"),
        )
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    return _probe_score_rank(assigned, probes, k, kernel)


def _qcos_score_builder(kernel: str):
    """score(qv, pqv) — exact quantized cosine, arrow or expression form
    (bit-identical: integer dots, then one IEEE sqrt/division each)."""
    if kernel == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def qcos_vec(a: pd.Series, b: pd.Series) -> pd.Series:
            if len(a) == 0:
                return pd.Series([], dtype="float64")
            A = np.stack(a.to_numpy())
            B = np.stack(b.to_numpy())
            dot = (A * B).sum(axis=1).astype(np.float64)
            na = np.sqrt((A * A).sum(axis=1).astype(np.float64))
            nb = np.sqrt((B * B).sum(axis=1).astype(np.float64))
            return pd.Series(dot / (na * nb))

        def score_col(qv: Column, pqv: Column) -> Column:
            return qcos_vec(qv, pqv)
    else:
        def idot(u: Column, v: Column) -> Column:
            return F.aggregate(
                F.zip_with(u, v, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, w: acc + w,
            )

        def score_col(qv: Column, pqv: Column) -> Column:
            return idot(qv, pqv).cast("double") / (
                F.sqrt(idot(qv, qv).cast("double"))
                * F.sqrt(idot(pqv, pqv).cast("double"))
            )

    return score_col


def _probe_score_rank(
    assigned: DataFrame,
    probes: DataFrame,
    k: int,
    kernel: str,
    probe_rows=None,
) -> DataFrame:
    """Score the cell-assigned corpus against a broadcast-sized probe
    batch, per-query top-k.

    ``kernel='arrow'`` materializes the probe batch driver-side (the
    same rows the previous broadcast join shipped to every executor —
    queries×n_probe rows, broadcast-sized by this path's contract) and
    scores each corpus batch against its cells' probe matrices as exact
    int64 matmuls inside ONE mapInPandas stage: each corpus vector
    crosses the Python boundary once, instead of once per candidate
    pair through the join-then-per-pair-UDF shape (guide §4.1: control
    how many columns/rows cross; §8: decide with small rows, move big
    rows once).  The corpus side still never shuffles — the cell filter
    is a static IN over the partition column (prunes cell directories
    at planning time on the persisted-index path), and the only
    exchange left is the per-query top-k window.  ``kernel='expr'``
    keeps the zero-Python broadcast-join shape.  A caller that already
    collected the probe rows (e.g. to derive the probed-cell set)
    passes them via *probe_rows* so the probe lineage executes once."""
    if kernel == "arrow":
        rows = (
            probe_rows
            if probe_rows is not None
            else probes.select("query_id", "qv", "cell").collect()
        )
        cell_map: dict[int, tuple] = {}
        for r in rows:
            cell_map.setdefault(r["cell"], []).append(
                (r["query_id"], r["qv"])
            )
        for c, qs in cell_map.items():
            qids = np.array([q for q, _ in qs], dtype=np.int64)
            Q = np.array([v for _, v in qs], dtype=np.int64)
            nq = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))
            cell_map[c] = (qids, Q, nq)
        spark = assigned.sparkSession
        bc = spark.sparkContext.broadcast(cell_map)

        def score(batches):
            m = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                for cell, grp in pdf.groupby("cell", sort=False):
                    entry = m.get(cell)
                    if entry is None:
                        continue
                    qids, Q, nq = entry
                    V = np.stack(grp["qv"].to_numpy()).astype(
                        np.int64, copy=False
                    )
                    dot = (V @ Q.T).astype(np.float64)
                    nv = np.sqrt((V * V).sum(axis=1).astype(np.float64))
                    S = dot / (nv[:, None] * nq[None, :])
                    nid = grp["neighbor_id"].to_numpy()
                    nids = np.repeat(nid, len(qids))
                    qids = np.tile(qids, len(nid))
                    mask = nids != qids
                    yield pd.DataFrame(
                        {
                            "query_id": qids[mask],
                            "neighbor_id": nids[mask],
                            "score": S.ravel()[mask],
                        }
                    )

        scored = (
            assigned.filter(
                F.col("cell").isin([int(c) for c in cell_map])
                if cell_map
                else F.lit(False)
            )
            .select("cell", "neighbor_id", "qv")
            .mapInPandas(score, "query_id long, neighbor_id long, score double")
        )
    else:
        score_col = _qcos_score_builder(kernel)
        scored = (
            assigned.join(
                F.broadcast(
                    probes.select("query_id", F.col("qv").alias("pqv"), "cell")
                ),
                on="cell",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                score_col(F.col("qv"), F.col("pqv")).alias("score"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Persisted IVF index — the 100 TB shape of ivf_topk
# ---------------------------------------------------------------------------
def _assign_cells(
    corpus: DataFrame,
    centroids: list[list[int]],
    id_col: str,
    vec_col: str,
    kernel: str,
) -> DataFrame:
    """(neighbor_id, qv, cell): each vector quantized and labeled with its
    nearest-centroid cell — a narrow map over the scan, no shuffle."""

    def qarr(c: Column) -> Column:
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        )

    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), qarr(F.col(vec_col)).alias("qv")
    )
    if kernel == "arrow":
        return _arrow_cells(base, "neighbor_id", centroids, 1).select(
            "neighbor_id", "qv", F.col("cells")[0].alias("cell")
        )
    return base.withColumn(
        "cells", _cell_score_structs(F.col("qv"), centroids)
    ).select(
        "neighbor_id", "qv", (-F.array_max(F.col("cells"))["negc"]).alias("cell")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = None,
    kernel: str = "arrow",
    refine_iters: int = 0,
) -> list[list[int]]:
    """Materialize the IVF index: the cell-assigned, integer-quantized
    corpus written as parquet **partitioned by cell**, plus the centroid
    matrix as JSON next to it.

    This is what makes IVF a *scale* path rather than a per-query saving:
    assignment (the full-corpus pass) runs once at build time, and every
    subsequent search touches only ``n_probe/n_centroids`` of the data as
    a partition-pruned scan — the cell directories that were not probed
    are never listed, opened, or read.  Returns the centroids.

    ``refine_iters > 0`` runs that many Lloyd k-means iterations
    (functions.clustering — integer-exact, deterministic) from the same
    smallest-id init before assigning: refined centroids track the data
    distribution, tightening cells so a fixed n_probe recalls more.  Each
    iteration is one extra corpus pass at build time — amortized over
    every search the index ever serves.

    ``n_centroids=None`` (the default) auto-sizes cells to
    :func:`auto_n_centroids` — ``max(16, ceil(sqrt(N)))`` — so cell size
    and probe fan-out both grow as √N; pass an explicit count only when
    reproducing a pinned layout (the oracle-checked registry rows do)."""
    import json as _json
    import os

    if n_centroids is None:
        n_centroids = auto_n_centroids(corpus.count())
    if refine_iters > 0:
        from .clustering import kmeans_fit

        centroids = kmeans_fit(
            corpus, id_col=id_col, vec_col=vec_col, k=n_centroids, iters=refine_iters
        )
    else:
        centroids = ivf_centroids(corpus, id_col, vec_col, n_centroids)
    _assign_cells(corpus, centroids, id_col, vec_col, kernel).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(index_dir, "cells"))
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        _json.dump(centroids, f)
    return centroids


def append_to_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> None:
    """Add vectors to an existing IVF index without rebuilding it.

    New vectors are assigned to the index's FROZEN centroids (loaded from
    ``centroids.json``) and appended as new files inside their cell
    partitions — the ingest cost is one narrow assignment pass over the
    new batch, independent of index size, and searches see the union
    immediately.  Centroids staying fixed is the standard IVF trade: cell
    balance can drift as the distribution shifts; rebuild when it does
    (the build is itself one linear pass)."""
    import json as _json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _json.load(f)
    _assign_cells(corpus, centroids, id_col, vec_col, kernel).write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(index_dir, "cells"))


def _probe_cells(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[int]],
    n_probe: int,
    kernel: str,
) -> DataFrame:
    """(query_id, qv, cell) probe rows: quantize each query vector and
    explode its *n_probe* nearest cells (ties → lowest cell, matching
    the SQL oracle).  Shared by :func:`ivf_index_topk` and the
    CDF-maintained :class:`~..operators.ann_index.IvfVectorIndex` so the
    two probe paths can never diverge."""

    def qarr(c: Column) -> Column:
        return F.transform(
            c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
        )

    qbase = queries.select(
        F.col(id_col).alias("query_id"), qarr(F.col(vec_col)).alias("qv")
    )
    if kernel == "arrow":
        return _arrow_cells(qbase, "query_id", centroids, n_probe).select(
            "query_id", "qv", F.explode("cells").alias("cell")
        )
    return qbase.withColumn(
        "cells", _cell_score_structs(F.col("qv"), centroids)
    ).select(
        "query_id",
        "qv",
        F.explode_outer(
            F.transform(
                F.slice(F.sort_array(F.col("cells"), asc=False), 1, n_probe),
                lambda s: -s["negc"],
            )
        ).alias("cell"),
    )


def ivf_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    kernel: str = "arrow",
) -> DataFrame:
    """Search a :func:`build_ivf_index` index.  The probe side broadcasts
    (query_id, qv, cell); joining it to the cell-partitioned index on the
    partition column triggers **dynamic partition pruning** — the scan
    reads only probed cell directories (asserted in the test suite), so
    search cost is O(probed cells), independent of index size."""
    import json as _json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _json.load(f)

    probes = _probe_cells(queries, id_col, vec_col, centroids, n_probe, kernel)
    index = spark.read.parquet(os.path.join(index_dir, "cells"))
    return _probe_score_rank(index, probes, k, kernel)


def ivf_index_topk_join(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    kernel: str = "arrow",
) -> DataFrame:
    """Batch ANN JOIN — the many-query shape of :func:`ivf_index_topk`,
    for query sets too big to broadcast (embed a whole table, find each
    row's neighbors).  Identical results; different physical plan:

    - probe rows and the cell-partitioned index SHUFFLE-join on ``cell``
      (``shuffle_hash`` hint — neither side is broadcast, collected, or
      assumed driver-sized; AQE's skew handling splits hot cells);
    - the per-query top-k is one more exchange on ``query_id``.

    Two shuffles, both on keys the data already needs — the standard
    distributed ANN-join shape at 100 TB.  Use :func:`ivf_index_topk`
    when the query set is broadcast-sized; that path also keeps dynamic
    partition pruning (a shuffle join reads all cells that ANY query
    probes, which for a table-sized query set is the honest cost)."""
    import json as _json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _json.load(f)

    probes = _probe_cells(queries, id_col, vec_col, centroids, n_probe, kernel)
    index = spark.read.parquet(os.path.join(index_dir, "cells"))
    if kernel == "arrow":
        # per-CELL matmul instead of per-PAIR scoring: the join-then-UDF
        # shape shipped BOTH 64-int64 vectors across the Python boundary
        # once per candidate pair (cell_size × probes-per-cell pairs →
        # ~d×pairs×16 B of Arrow traffic); cogrouping on the cell key
        # ships each vector ONCE per cell and scores the whole
        # (vectors × probes) block as one exact int64 matmul.  Same
        # distributed shape as before — both sides exchange on `cell`
        # (no broadcast, no collect; AQE still splits skewed cells), the
        # per-query top-k is the same second exchange on query_id — and
        # bit-identical scores: integer dots, then the identical
        # (norm·norm) multiply and one IEEE divide (guide §4.2/§8:
        # shuffle/ship keys + payload once, compute on whole batches).
        scored = _cogroup_cell_scores(
            index.select("cell", "neighbor_id", "qv"),
            probes.select("cell", "query_id", F.col("qv").alias("pqv")),
        )
    else:
        score_col = _qcos_score_builder(kernel)
        scored = (
            index.hint("shuffle_hash")
            .join(
                probes.select(
                    "query_id", F.col("qv").alias("pqv"), "cell"
                ),
                on="cell",
            )
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select(
                "query_id",
                "neighbor_id",
                score_col(F.col("qv"), F.col("pqv")).alias("score"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _cogroup_cell_scores(index: DataFrame, probes: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, score) for every same-cell candidate pair
    with query ≠ neighbor, via one exact int64 matmul per cell block.

    Bit-identical to the per-pair ``qcos_vec`` kernel: the integer dot
    matrix is exact (|dot| ≤ d·(scale)² ≪ 2⁶³), the norms are sqrt of
    exact integer self-dots, and the score divides the f64 dot by the
    (norm·norm) product — the same two IEEE ops per pair in the same
    order."""

    def score(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "score": pd.Series([], dtype="float64"),
                }
            )
        V = np.stack(left["qv"].to_numpy()).astype(np.int64, copy=False)
        Q = np.stack(right["pqv"].to_numpy()).astype(np.int64, copy=False)
        dot = (V @ Q.T).astype(np.float64)                      # (n, m)
        nv = np.sqrt((V * V).sum(axis=1).astype(np.float64))    # (n,)
        nq = np.sqrt((Q * Q).sum(axis=1).astype(np.float64))    # (m,)
        S = dot / (nv[:, None] * nq[None, :])
        nid = left["neighbor_id"].to_numpy()
        qid = right["query_id"].to_numpy()
        nids = np.repeat(nid, len(qid))
        qids = np.tile(qid, len(nid))
        mask = nids != qids
        return pd.DataFrame(
            {
                "query_id": qids[mask],
                "neighbor_id": nids[mask],
                "score": S.ravel()[mask],
            }
        )

    return (
        index.groupBy("cell")
        .cogroup(probes.groupBy("cell"))
        .applyInPandas(score, "query_id long, neighbor_id long, score double")
    )


# ---------------------------------------------------------------------------
# Sign-bit LSH (random hyperplane) — the scale path
# ---------------------------------------------------------------------------
def _plane_component_q(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random INTEGER hyperplane component in
    [-1000, 1000]: md5-derived, so corpus and query sides (and any engine)
    agree bit-for-bit."""
    h = md5_long(F.concat_ws("_", F.lit("plane"), F.lit(plane), dim_idx.cast("string")), 7)
    return (h % 2001 - 1000).cast("long")


def lsh_bucket(vec: Column, num_planes: int = 8, plane_offset: int = 0) -> Column:
    """Sign-bit bucket id: bit p = sign(qv · plane_{plane_offset+p}) —
    INTEGER-EXACT.  *plane_offset* selects an independent plane set, so
    multiple hash tables (recall amplification) reuse this unchanged.

    The vector is quantized (round(x·1e6) as int64) and the hyperplane
    components are integers in [-1000, 1000], so the sign test is pure
    int64 arithmetic: the bucket assignment is deterministic and
    reproducible in any engine (a float dot product near zero could flip
    sign under a different accumulation order — an oracle-killer for a
    blocking key).  |Σ qv·c| ≤ dim·1e6·1000 ≪ 2⁶³, no overflow."""
    qv = F.transform(vec, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    def plane_dot(p: int):
        def fold(acc: Column, d: Column) -> Column:
            return acc + F.element_at(qv, d + 1) * _plane_component_q(plane_offset + p, d)

        return F.aggregate(dims, F.lit(0).cast("long"), fold)

    bucket = F.lit(0).cast("long")
    for p in range(num_planes):
        bucket = bucket + F.when(plane_dot(p) > 0, F.lit(2 ** p).cast("long")).otherwise(F.lit(0))
    return bucket


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: score only corpus rows sharing the query's LSH
    bucket.  ~2^-num_planes of the corpus is scored per query; at scale the
    corpus is written partitioned by bucket so the probe is partition-pruned.
    Recall is tested against :func:`brute_force_topk` in the suite."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        lsh_bucket(F.col(vec_col), num_planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_blocked_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_planes: int = 4,
    num_tables: int = 1,
) -> DataFrame:
    """Scale path for :func:`embedding_near_dup_pairs`: confine the
    quadratic pair space to random-hyperplane LSH buckets (expected
    bucket size n/2^planes → pair work n²/2^planes), then verify with the
    same exact quantized cosine.  APPROXIMATE: a true pair whose vectors
    land in different buckets is missed — recall amplifies with
    *num_tables* independent plane sets (miss probability decays
    geometrically: p_miss^T), the classic multi-table LSH trade of T×
    bucket work for recall; lowering num_planes widens buckets instead.
    One corpus pass computes all T buckets and explodes to T rows per
    vector; duplicate discoveries across tables collapse in one
    pair-keyed dropDuplicates (qcos is deterministic, so survivors are
    bit-identical regardless of which table found them).

    Execution: quantization + integer sign-bit bucketing stay JVM-side
    (bit-identical to the SQL oracle); the pair verify runs as a
    bucket-local Arrow kernel (``groupBy(bucket).applyInPandas``) doing a
    chunked int64 matmul.  vs the previous bucket self-join: each vector
    shuffles ONCE (no second join branch recomputing the lineage), no
    (pair × 2 arrays) intermediate ever materializes, and the per-pair
    dot is SIMD instead of an interpreted per-element fold — measured 3×
    warm at sf0.1.  Both matmul dims are chunked, so peak kernel memory is
    O(chunk² + bucket·dim), independent of pair count; the resident
    bucket matrix itself (~0.5 GiB at 1M×64) is the scale cap — at larger
    corpora raise num_planes so buckets stay executor-sized, exactly the
    knob the blocking design already turns."""
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                lsh_bucket(F.col(vec_col), num_planes, plane_offset=t * num_planes)
                .alias("bucket"),
            )
            for t in range(num_tables)
        ]
    )
    v = df.select(
        F.col(id_col).alias("id"), qv.alias("qv"), F.explode(tables).alias("tb")
    ).select("id", "qv", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    out_schema = (
        "id_a long, id_b long, qcos double"
    )
    chunk = 4096

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id")
        n = len(pdf)
        empty = pd.DataFrame({"id_a": [], "id_b": [], "qcos": []})
        if n < 2:
            return empty
        ids = pdf["id"].to_numpy()
        M = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
        # exact int64 self-dots; norms/divide are the same single IEEE ops
        # as the SQL oracle's sqrt(double)/double
        norms = np.sqrt((M * M).sum(axis=1).astype(np.float64))
        out_a, out_b, out_q = [], [], []
        for i0 in range(0, n, chunk):
            i1 = min(i0 + chunk, n)
            for j0 in range(i0, n, chunk):
                j1 = min(j0 + chunk, n)
                dots = M[i0:i1] @ M[j0:j1].T
                with np.errstate(divide="ignore", invalid="ignore"):
                    q = dots.astype(np.float64) / (
                        norms[i0:i1, None] * norms[None, j0:j1]
                    )
                # ids are sorted, so position j > i ⇔ id_b > id_a
                upper = np.arange(j0, j1)[None, :] > np.arange(i0, i1)[:, None]
                ri, cj = np.nonzero(upper & (q >= threshold))
                out_a.append(ids[ri + i0])
                out_b.append(ids[cj + j0])
                out_q.append(q[ri, cj])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "qcos": np.concatenate(out_q),
            }
        )

    pairs = v.groupBy("tbl", "bucket").applyInPandas(per_bucket, schema=out_schema)
    if num_tables == 1:
        return pairs
    return pairs.dropDuplicates(["id_a", "id_b"])
