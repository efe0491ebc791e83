"""Product quantization (PQ) — the ANN compression path for corpora too
big to keep full vectors hot.

A D-dim vector splits into M contiguous subvectors; each subspace gets
its own k-code codebook (Lloyd's k-means on the subvectors), and a vector
is stored as M small integers — 64 float32 dims become M bytes at k≤256,
a ~32-64× compression that is what makes billion-vector scans affordable
(Jégou et al., *Product Quantization for Nearest Neighbor Search*,
TPAMI'11).  Queries never decompress the corpus: an asymmetric distance
computation (ADC) precomputes, per query, an M×k lookup table of exact
subspace distances to every code, and a corpus row's distance is M table
lookups + a sum.

Spark shape (all stages scale-safe):
- **training**: one distributed pass per Lloyd iteration covering ALL
  subspaces at once — a vectorized Arrow kernel assigns codes and emits
  per-partition PARTIAL (sub, code, pos) accumulator cells (≤ k·D rows
  per partition), so the shuffle and the driver collect carry k·D
  integers, never vectors.  Same math as :mod:`.clustering`, generalized
  by a subspace axis.
- **encode**: a narrow mapInPandas (no shuffle) — one int64 matmul per
  subspace per batch.
- **top-k**: codes + the broadcast-sized LUT meet in a vectorized Arrow
  kernel (per-partition partial top-k), joinless, with ONE by-key
  exchange for the final per-query rank — the exact shape of
  :func:`.similarity.brute_force_topk`'s arrow path.

Everything runs on the quantized integer domain (round(x·1e6)) with
half-up centroid division and first-minimum (= lowest-code) tie breaks,
so codebooks, codes, and ADC distances are bit-reproducible across
engines — oracle_sql.pq_topk_oracle unrolls the identical computation in
SQL, and tests pin a pure-Python twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from .clustering import _halfup_div
from .similarity import _quantize_py

Codebooks = list[list[list[int]]]  # cents[sub][code] = centroid ints


def _qarr(c: Column) -> Column:
    return F.transform(c, lambda x: F.round(x.cast("double") * 1_000_000).cast("long"))


def _cents_np(cents: Codebooks) -> list[np.ndarray]:
    return [np.asarray(cb, dtype=np.int64) for cb in cents]


def _codes_np(V: np.ndarray, cents_np: list[np.ndarray]) -> np.ndarray:
    """(n, M) int64 codes: per subspace, argmin squared distance, ties to
    the LOWER code (np.argmin's first-minimum rule — same as the oracle's
    ``ORDER BY score DESC, code ASC``).  Scored as −2·x·C + ‖C‖² (equal
    ordering to distance; all int64, no overflow at 1e6-quantized dims)."""
    d0 = cents_np[0].shape[1]
    codes = np.empty((len(V), len(cents_np)), dtype=np.int64)
    for m, C in enumerate(cents_np):
        sub = V[:, m * d0 : (m + 1) * d0]
        s = -2 * (sub @ C.T) + (C * C).sum(axis=1)[None, :]
        codes[:, m] = np.argmin(s, axis=1)
    return codes


def pq_fit(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = 8,
    k: int = 64,
    iters: int = 2,
) -> Codebooks:
    """Train M=*n_sub* codebooks of *k* codes each — deterministic init
    (the k smallest-id vectors' subvectors) + *iters* integer-exact Lloyd
    steps; every step is ONE distributed pass whose shuffle carries only
    (sub, code, pos) partial sums.  Empty codes keep their previous
    centroid."""
    init_rows = corpus.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    dim = len(init_rows[0][vec_col])
    if dim % n_sub:
        raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
    d0 = dim // n_sub
    cents: Codebooks = [
        [
            [_quantize_py(x) for x in r[vec_col][m * d0 : (m + 1) * d0]]
            for r in init_rows
        ]
        for m in range(n_sub)
    ]
    return _lloyd_int(corpus.select(_qarr(F.col(vec_col)).alias("qv")), cents, iters)


def _lloyd_int(int_df: DataFrame, cents: Codebooks, iters: int) -> Codebooks:
    """The integer Lloyd core over a prepared ``qv: array<long>`` column —
    shared by raw-vector PQ (pq_fit) and residual PQ
    (build_ivfpq_index(residual=True))."""
    n_sub, k, d0 = len(cents), len(cents[0]), len(cents[0][0])
    base = int_df.persist()
    part_schema = T.StructType(
        [
            T.StructField("sub", T.IntegerType(), False),
            T.StructField("code", T.IntegerType(), False),
            T.StructField("pos", T.IntegerType(), False),
            T.StructField("s", T.LongType(), False),
            T.StructField("n", T.LongType(), False),
        ]
    )
    try:
        for _ in range(iters):
            cnp = _cents_np(cents)

            def kernel(batches, cnp=cnp):
                acc = np.zeros((n_sub, k, d0), dtype=np.int64)
                cnt = np.zeros((n_sub, k), dtype=np.int64)
                for pdf in batches:
                    if len(pdf) == 0:
                        continue
                    V = np.stack(pdf["qv"].to_numpy())
                    codes = _codes_np(V, cnp)
                    for m in range(n_sub):
                        sub = V[:, m * d0 : (m + 1) * d0]
                        np.add.at(acc[m], codes[:, m], sub)
                        np.add.at(cnt[m], codes[:, m], 1)
                ms, cs, ps = np.nonzero(acc | cnt[:, :, None])
                yield pd.DataFrame(
                    {
                        "sub": ms,
                        "code": cs,
                        "pos": ps,
                        "s": acc[ms, cs, ps],
                        "n": cnt[ms, cs],
                    }
                )

            rows = (
                base.mapInPandas(kernel, schema=part_schema)
                .groupBy("sub", "code", "pos")
                .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
                .collect()
            )
            sums: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
            for r in rows:
                sums.setdefault((r["sub"], r["code"]), {})[r["pos"]] = (r["s"], r["n"])
            cents = [
                [
                    [
                        _halfup_div(*sums[(m, c)][p])
                        if (m, c) in sums and sums[(m, c)][p][1]
                        else cents[m][c][p]
                        for p in range(d0)
                    ]
                    for c in range(k)
                ]
                for m in range(n_sub)
            ]
    finally:
        base.unpersist()
    return cents


def pq_encode(
    corpus: DataFrame,
    cents: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one narrow Arrow pass, no shuffle."""
    cnp = _cents_np(cents)
    out_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.LongType(), False), False),
        ]
    )
    base = corpus.select(
        F.col(id_col).alias("neighbor_id"), _qarr(F.col(vec_col)).alias("qv")
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["qv"].to_numpy())
            codes = _codes_np(V, cnp)
            yield pd.DataFrame(
                {"neighbor_id": pdf["neighbor_id"], "codes": list(codes)}
            )

    return base.mapInPandas(kernel, schema=out_schema).withColumnRenamed(
        "neighbor_id", id_col
    )


def _adc_luts(q_rows, vec_col: str, cents_np: list[np.ndarray]) -> np.ndarray:
    """LUT[q][m][code] = exact squared subspace distance (int64)."""
    d0 = cents_np[0].shape[1]
    Q = np.array(
        [[_quantize_py(x) for x in r[vec_col]] for r in q_rows], dtype=np.int64
    )
    lut = np.empty((len(q_rows), len(cents_np), cents_np[0].shape[0]), dtype=np.int64)
    for m, C in enumerate(cents_np):
        sub = Q[:, m * d0 : (m + 1) * d0]  # (q, d0)
        diff = sub[:, None, :] - C[None, :, :]  # (q, k, d0)
        lut[:, m, :] = (diff * diff).sum(axis=2)
    return lut


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    cents: Codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """ADC top-k: (query_id, neighbor_id, dist, rank), self-pairs
    excluded, ties to the lower neighbor_id.  The corpus is scanned as
    CODES (M small ints/row); per partition one vectorized gather+sum
    scores all queries and emits the local top-k, so the single by-key
    exchange carries (partitions × queries × k) candidates.  At 100 TB
    the codes table is ~1/32nd the vector bytes — the whole point of
    PQ — and would be written once by pq_encode and re-scanned by every
    query batch."""
    cnp = _cents_np(cents)
    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    lut = _adc_luts(q_rows, vec_col, cnp)

    codes = pq_encode(corpus, cents, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("dist", T.LongType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, M)
            nids = pdf["neighbor_id"].to_numpy()
            # D[i, q] = Σ_m lut[q, m, C[i, m]] — one gather per subspace
            D = np.zeros((len(C), len(qids)), dtype=np.int64)
            for m in range(lut.shape[1]):
                D += lut[:, m, :][:, C[:, m]].T  # (n, q)
            rows_q, rows_n, rows_d = [], [], []
            for j in range(len(qids)):
                mask = nids != qids[j]
                d_j, n_j = D[mask, j], nids[mask]
                order = np.lexsort((n_j, d_j))[:k]  # dist asc, id asc
                rows_q.extend([qids[j]] * len(order))
                rows_n.extend(n_j[order])
                rows_d.extend(d_j[order])
            yield pd.DataFrame(
                {"query_id": rows_q, "neighbor_id": rows_n, "dist": rows_d}
            )

    cand = codes.mapInPandas(kernel, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# -- IVF-PQ: cell-partitioned codes index -----------------------------------
def build_ivfpq_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_sub: int = 8,
    k: int = 64,
    iters: int = 2,
    refine_iters: int = 0,
    residual: bool = False,
) -> tuple[list[list[int]], Codebooks]:
    """The composed scale path: IVF's partition pruning × PQ's compression.

    One build pass assigns every vector to its nearest coarse centroid
    AND encodes its PQ codes; the index is parquet **partitioned by
    cell** holding only (id, codes) — M small ints per vector, so a
    billion-vector index is gigabytes, not terabytes — plus centroids +
    codebooks as JSON.  Search touches n_probe cells as a
    statically-pruned scan of codes.

    ``residual=True`` trains the codebooks on ``x − centroid[cell]``
    (FAISS-style IVFPQ): residuals concentrate near zero, so the same
    codebook budget spends its codes on a much tighter distribution —
    recall improves at identical index bytes.  Residuals are differences
    of quantized integers, so everything stays integer-exact."""
    import json as _json
    import os

    from .similarity import _assign_cells, ivf_centroids

    if refine_iters > 0:
        from .clustering import kmeans_fit

        centroids = kmeans_fit(
            corpus, id_col=id_col, vec_col=vec_col, k=n_centroids, iters=refine_iters
        )
    else:
        centroids = ivf_centroids(corpus, id_col, vec_col, n_centroids)

    assigned = _assign_cells(corpus, centroids, id_col, vec_col, "arrow")
    C = np.asarray(centroids, dtype=np.int64)
    d0 = C.shape[1] // n_sub

    cents = _fit_codebooks(
        corpus, assigned, C, n_sub=n_sub, k=k, iters=iters,
        residual=residual, id_col=id_col, vec_col=vec_col,
    )
    _encode_assigned(assigned, centroids, cents, residual).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(index_dir, "cells"))
    with open(os.path.join(index_dir, "centroids.json"), "w") as f:
        _json.dump(centroids, f)
    with open(os.path.join(index_dir, "codebooks.json"), "w") as f:
        _json.dump({"residual": residual, "codebooks": cents}, f)
    return centroids, cents


def _fit_codebooks(
    corpus: DataFrame,
    assigned: DataFrame,
    C: np.ndarray,
    n_sub: int,
    k: int,
    iters: int,
    residual: bool,
    id_col: str,
    vec_col: str,
) -> Codebooks:
    """Codebook training shared by :func:`build_ivfpq_index` and the
    derived-state :class:`~..operators.ann_index.IvfPqVectorIndex`:
    plain PQ trains on the raw quantized vectors, residual PQ on
    ``x − centroid[cell]`` via the same integer Lloyd core."""
    d0 = C.shape[1] // n_sub

    if residual:
        res_schema = T.StructType(
            [T.StructField("qv", T.ArrayType(T.LongType(), False), False)]
        )

        def res_kernel(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["qv"].to_numpy())
                RV = V - C[pdf["cell"].to_numpy()]
                yield pd.DataFrame({"qv": list(RV)})

        # init = the k smallest-id RESIDUALS (same deterministic rule as
        # pq_fit, applied to the residual domain)
        init_rows = (
            assigned.select("neighbor_id", "qv", "cell")
            .orderBy("neighbor_id")
            .limit(k)
            .collect()
        )
        init: Codebooks = [
            [
                [
                    int(r["qv"][m * d0 + p] - C[r["cell"], m * d0 + p])
                    for p in range(d0)
                ]
                for r in init_rows
            ]
            for m in range(n_sub)
        ]
        return _lloyd_int(
            assigned.mapInPandas(res_kernel, schema=res_schema), init, iters
        )
    return pq_fit(corpus, id_col, vec_col, n_sub=n_sub, k=k, iters=iters)


def _encode_assigned(
    assigned: DataFrame,
    centroids: list[list[int]],
    cents: Codebooks,
    residual: bool,
) -> DataFrame:
    """(neighbor_id, codes, cell) for a cell-assigned frame — the encode
    pass shared by build / append / derived-state refresh."""
    cnp = _cents_np(cents)
    C = np.asarray(centroids, dtype=np.int64)
    out_schema = T.StructType(
        [
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("codes", T.ArrayType(T.LongType(), False), False),
            T.StructField("cell", T.IntegerType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["qv"].to_numpy())
            if residual:
                V = V - C[pdf["cell"].to_numpy()]
            yield pd.DataFrame(
                {
                    "neighbor_id": pdf["neighbor_id"],
                    "codes": list(_codes_np(V, cnp)),
                    "cell": pdf["cell"],
                }
            )

    return assigned.mapInPandas(kernel, schema=out_schema)


def append_to_ivfpq_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Ingest new vectors against the FROZEN centroids + codebooks: one
    narrow assign+encode pass over the batch, appended as new files
    inside their cell partitions — cost independent of index size, and
    searches see the union immediately.  Same trade as
    ``append_to_ivf_index``: rebuild when distribution drift unbalances
    cells or decays code fidelity."""
    import json as _json
    import os

    from .similarity import _assign_cells

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _json.load(f)
    with open(os.path.join(index_dir, "codebooks.json")) as f:
        meta = _json.load(f)
    residual = isinstance(meta, dict) and meta.get("residual", False)
    cents: Codebooks = meta["codebooks"] if isinstance(meta, dict) else meta

    assigned = _assign_cells(corpus, centroids, id_col, vec_col, "arrow")
    _encode_assigned(assigned, centroids, cents, residual).write.mode(
        "append"
    ).partitionBy("cell").parquet(os.path.join(index_dir, "cells"))


def ivfpq_index_topk(
    spark,
    index_dir: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Search a :func:`build_ivfpq_index` index: per query, rank the
    coarse cells (same dot/‖c‖ scoring and stable tie order as the IVF
    probe kernel), statically prune the codes scan to the probed cell
    partitions, route rows to queries through a broadcast (query, cell)
    join, and ADC-score codes in the vectorized kernel.  Cost:
    O(probed-cell codes), independent of both index size and vector
    width."""
    import json as _json
    import os

    with open(os.path.join(index_dir, "centroids.json")) as f:
        centroids = _json.load(f)
    with open(os.path.join(index_dir, "codebooks.json")) as f:
        meta = _json.load(f)
    residual = isinstance(meta, dict) and meta.get("residual", False)
    cents: Codebooks = meta["codebooks"] if isinstance(meta, dict) else meta

    def read_cells(all_probed: list[int]) -> DataFrame:
        # reading through the partitioned root keeps Spark's STATIC
        # partition pruning on the isin filter (asserted in tests)
        return spark.read.parquet(os.path.join(index_dir, "cells")).filter(
            F.col("cell").isin(all_probed)
        )

    return _ivfpq_search(
        spark, read_cells, centroids, cents, residual, queries,
        id_col, vec_col, k, n_probe,
    )


def _ivfpq_search(
    spark,
    read_cells,
    centroids: list[list[int]],
    cents: Codebooks,
    residual: bool,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
) -> DataFrame:
    """ADC search core shared by :func:`ivfpq_index_topk` (static
    parquet layout) and the derived-state index (versioned cell dirs):
    *read_cells(cells)* returns the (neighbor_id, codes, cell) rows of
    the probed cells — or None when none exist."""
    cnp = _cents_np(cents)
    n_sub = len(cnp)
    kk = cnp[0].shape[0]
    d0 = cnp[0].shape[1]

    q_rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    # probe cells driver-side — same ranking as similarity._arrow_cells:
    # R = (Q @ C.T)/‖c‖ desc, stable argsort keeps ascending cell on ties
    C = np.asarray(centroids, dtype=np.int64)
    Q = np.array(
        [[_quantize_py(x) for x in r[vec_col]] for r in q_rows], dtype=np.int64
    )
    R = (Q @ C.T).astype(np.float64) / np.sqrt((C * C).sum(axis=1).astype(np.float64))
    probe_cells = np.argsort(-R, axis=1, kind="stable")[:, :n_probe]

    if residual:
        # LUT per (query, probed cell): subspace distances between the
        # query's residual against that cell and every code — still
        # metadata-sized (q × n_probe × M × k ints)
        lut4 = np.zeros((len(qids), C.shape[0], n_sub, kk), dtype=np.int64)
        for qi in range(len(qids)):
            for cell in probe_cells[qi]:
                rq = Q[qi] - C[cell]
                for m in range(n_sub):
                    sub = rq[m * d0 : (m + 1) * d0]
                    diff = sub[None, :] - cnp[m]
                    lut4[qi, cell, m, :] = (diff * diff).sum(axis=1)
    else:
        lut = _adc_luts(q_rows, vec_col, cnp)

    probes = spark.createDataFrame(
        [
            (int(qids[i]), int(c))
            for i in range(len(qids))
            for c in probe_cells[i]
        ],
        "query_id long, cell int",
    )
    all_probed = sorted({int(c) for row in probe_cells for c in row})
    index = read_cells(all_probed)
    if index is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, dist long, rank int"
        )
    routed = index.join(F.broadcast(probes), "cell")

    qid_sorted = np.sort(qids)
    qidx_of = np.argsort(qids, kind="stable")
    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType(), False),
            T.StructField("neighbor_id", T.LongType(), False),
            T.StructField("dist", T.LongType(), False),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Cd = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, M)
            row_qids = pdf["query_id"].to_numpy()
            nids = pdf["neighbor_id"].to_numpy()
            qi = qidx_of[np.searchsorted(qid_sorted, row_qids)]
            D = np.zeros(len(Cd), dtype=np.int64)
            if residual:
                cells = pdf["cell"].to_numpy()
                for m in range(n_sub):
                    D += lut4[qi, cells, m, Cd[:, m]]
            else:
                for m in range(n_sub):
                    D += lut[qi, m, Cd[:, m]]
            keep = nids != row_qids  # self-pairs excluded
            yield pd.DataFrame(
                {
                    "query_id": row_qids[keep],
                    "neighbor_id": nids[keep],
                    "dist": D[keep],
                }
            )

    cand = routed.mapInPandas(kernel, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# -- pure-Python twin (test oracle) -----------------------------------------
def pq_fit_py(
    vectors: dict[int, list[float]], n_sub: int, k: int, iters: int
) -> Codebooks:
    """Same init, same integer math, same tie/empty-code rules as pq_fit."""
    ids = sorted(vectors)
    q = {i: [_quantize_py(x) for x in vectors[i]] for i in ids}
    d0 = len(q[ids[0]]) // n_sub
    cents: Codebooks = [
        [q[i][m * d0 : (m + 1) * d0] for i in ids[:k]] for m in range(n_sub)
    ]
    return _lloyd_py_int(q, cents, iters)


def _lloyd_py_int(
    q: dict[int, list[int]], cents: Codebooks, iters: int
) -> Codebooks:
    """Pure-Python twin of :func:`_lloyd_int` over integer vectors."""
    n_sub, k, d0 = len(cents), len(cents[0]), len(cents[0][0])
    ids = sorted(q)

    def argmin(sub_v: list[int], cb: list[list[int]]) -> int:
        return min(
            range(len(cb)),
            key=lambda c: (sum((a - b) ** 2 for a, b in zip(sub_v, cb[c])), c),
        )

    for _ in range(iters):
        sums: dict[tuple[int, int], list] = {}
        for i in ids:
            for m in range(n_sub):
                sub_v = q[i][m * d0 : (m + 1) * d0]
                c = argmin(sub_v, cents[m])
                s = sums.setdefault((m, c), [[0, 0] for _ in range(d0)])
                for p, x in enumerate(sub_v):
                    s[p][0] += x
                    s[p][1] += 1
        cents = [
            [
                [
                    _halfup_div(sums[(m, c)][p][0], sums[(m, c)][p][1])
                    if (m, c) in sums
                    else cents[m][c][p]
                    for p in range(d0)
                ]
                for c in range(k)
            ]
            for m in range(n_sub)
        ]
    return cents
