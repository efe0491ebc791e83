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
    cents = ivf_centroids(corpus, id_col, vec_col, k)
    qv = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * 1_000_000).cast("long")
    )
    base = corpus.select(F.col(id_col).alias("id"), qv.alias("qv")).persist()
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
