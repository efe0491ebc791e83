"""Skew mitigation for hot join keys — the salting pattern.

AQE's skew-join splitting (enabled in session.py) handles most skew at
runtime by splitting oversized partitions, but it only applies to
sort-merge joins and can't help when one *key* is hot on the build side of
an aggregation-like join.  Salting is the explicit fix: replicate the
small side R times and scatter the big side's hot keys across R sub-keys,
so one executor's hot partition becomes R average ones.

    big:   key → (key, salt = pmod(hash(row-unique), R))
    small: key → (key, salt = 0..R-1)   (R-way explode)
    join on (key, salt) — same result set, R× the small side, no hot key

Use when a profile shows one reducer doing R× the work of the median; the
cost is R× duplication of the (small) dimension side, which is the same
trade broadcast makes — but salting also works when the small side is too
big to broadcast yet small enough to replicate R times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_large_side(df: DataFrame, num_salts: int) -> DataFrame:
    """Scatter rows across *num_salts* sub-keys.  The salt derives from the
    whole row (monotonically_increasing_id is partition-local and stable
    within a job), so a hot key's rows spread uniformly."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(num_salts))
    )


def explode_small_side(df: DataFrame, num_salts: int) -> DataFrame:
    """Replicate each row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the hot-key pressure spread across *num_salts*
    sub-partitions.  Result-equivalent to ``large.join(small, on, how)``
    for keys-unique-on-small joins (the replicated small side matches each
    large row exactly once, on its own salt)."""
    keys = list(on) + [SALT_COL]
    out = salt_large_side(large, num_salts).join(
        explode_small_side(small, num_salts), on=keys, how=how
    )
    return out.drop(SALT_COL)
