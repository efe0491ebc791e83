"""Deterministic sampling / dataset splitting for training pipelines.

``df.sample()`` is seed-dependent *per partitioning* — resplitting after a
repartition reshuffles examples between train and test, which silently
leaks test data at scale.  These operators derive membership from a
**content hash** (md5 of the row id + a salt), so the split is a pure
function of the data: stable across runs, partitionings, engines — and
exactly reproducible in the DuckDB oracle with the same math
(conv/substr/md5, see functions.dedup.md5_long).

All expressions are per-row codegen — shuffle-free, no sampling state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

# md5_long with 15 hex digits is uniform on [0, 16^15)
_HASH_SPACE = 16 ** 15


def hash_fraction(col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from a column's content."""
    return md5_long(F.concat_ws("|", F.lit(salt), col.cast("string"))) / F.lit(
        float(_HASH_SPACE)
    )


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') keyed on the id hash.

    Membership depends only on (salt, id): adding or removing other rows
    never moves an example across the boundary — the property that makes
    incremental corpus refreshes safe against test-set leakage."""
    frac = hash_fraction(F.col(id_col), salt)
    return df.withColumn(
        "split", F.when(frac < test_fraction, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id hash falls
    under its stratum's fraction.  Replaces ``df.sampleBy`` (seed- and
    partitioning-dependent) with a reproducible filter; per-row expression,
    no shuffle, exact oracle."""
    frac = hash_fraction(F.col(id_col), salt)
    threshold = F.lit(float(default_fraction))
    for value, p in sorted(fractions.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(float(p))).otherwise(
            threshold
        )
    return df.filter(frac < threshold)
