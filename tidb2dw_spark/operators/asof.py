"""As-of join — match each left row to the most recent right row at or
before its timestamp, per key.

The reference has no such operator (SURVEY.md §2.3 — its only joins are the
PK merge joins); this belongs to the training/event-analytics surface the
engine adds on top.  Spark has no built-in as-of join either, so we express
it as a *union + ordered window*, the shape that scales:

    tag left/right → union → last(right_payload, ignorenulls) over
    (partition by key order by ts, side rows unbounded preceding) → filter left

Cost at scale: ONE exchange of (left ∪ right) on the key columns and a
per-partition sort — no join, no broadcast, no per-row probe.  A join-based
formulation (equi-join on key + max-ts filter) would shuffle the same data
AND materialize every candidate pair; this keeps the state per key at a
single carried struct.  Works unchanged when both sides are 100 TB because
nothing is collected or broadcast.

Determinism requires (key, ts) be unique on the right side (true for the
events table — asserted in tests); otherwise pre-dedup the right side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PAYLOAD = "__asof_payload"
_MATCH = "__asof_match"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    *,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right.ts <= left.ts`` (strict ``<`` when ``allow_exact_matches`` is
    False) sharing the ``on`` keys.  ``right_cols`` maps right column →
    output alias; unmatched left rows keep NULL in those columns.
    """
    on = list(on)
    payload = F.struct(
        *[F.col(src).alias(alias) for src, alias in right_cols.items()]
    )
    # side orders rows with equal ts: right-before-left includes exact
    # matches, left-before-right excludes them.
    left_side, right_side = (1, 0) if allow_exact_matches else (0, 1)

    lt = left.select(
        *on,
        F.col(left_ts).alias(_TS),
        F.lit(left_side).alias(_SIDE),
        F.struct(*[F.col(c) for c in left.columns]).alias("__asof_row"),
        F.lit(None).cast(
            right.select(payload.alias(_PAYLOAD)).schema[_PAYLOAD].dataType
        ).alias(_PAYLOAD),
    )
    rt = right.select(
        *on,
        F.col(right_ts).alias(_TS),
        F.lit(right_side).alias(_SIDE),
        F.lit(None).cast(lt.schema["__asof_row"].dataType).alias("__asof_row"),
        payload.alias(_PAYLOAD),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(_TS, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        lt.unionByName(rt)
        .withColumn(_MATCH, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_SIDE) == left_side)
    )
    out_cols: list[Column] = [
        F.col(f"__asof_row.{c}").alias(c) for c in left.columns
    ]
    out_cols += [
        F.col(f"{_MATCH}.{alias}").alias(alias) for alias in right_cols.values()
    ]
    return matched.select(*out_cols)
