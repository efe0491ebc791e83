"""Bucketed time-range join — count/collect right rows inside a bounded
time window behind each left row, per key.

Naively `left JOIN right ON key AND r.ts BETWEEN l.ts - W AND l.ts` is an
inequality join: Spark plans it as a broadcast-nested-loop (or worse, a
cartesian) — O(|L|·|R|) per key and unusable at 100 TB.  The scale shape is
to quantize time into buckets of the window width W: a right row in range
of a left row at time t lives in bucket(t) or bucket(t)-1, so exploding
each left row into those two probe buckets turns the predicate into a pure
equi-join on (key, bucket) + a cheap residual filter.  Each right row is
joined at most twice, the shuffle is hash-partitioned, and AQE/skew
handling applies as with any equi-join.

No reference parity — the reference has no range predicates (SURVEY.md
§2.3); this extends the event-analytics surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"
_LUS = "__rj_l_us"
_RUS = "__rj_r_us"


def range_count_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Append to each left row the number of right rows (same ``on`` keys)
    with ``right.ts`` in ``[left.ts - window, left.ts]`` (inclusive both
    ends, microsecond precision).  Left rows with zero matches are kept.
    """
    on = list(on)
    w_us = int(window_seconds) * 1_000_000

    # cast: accept TIMESTAMP and TIMESTAMP_NTZ inputs alike (UTC session,
    # so the NTZ cast is epoch-identical to the naive value)
    lt = left.withColumn(_LUS, F.unix_micros(F.col(left_ts).cast("timestamp")))
    # two candidate buckets cover the whole window: floor(t/W) and that - 1
    lt = lt.withColumn(
        _BUCKET,
        F.explode(
            F.array(
                F.floor(F.col(_LUS) / w_us) - 1,
                F.floor(F.col(_LUS) / w_us),
            )
        ),
    )
    rt = right.select(
        *on,
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias(_RUS),
    ).withColumn(_BUCKET, F.floor(F.col(_RUS) / w_us))

    joined = lt.join(rt, [*on, _BUCKET], "left")
    in_range = (F.col(_RUS) >= F.col(_LUS) - w_us) & (F.col(_RUS) <= F.col(_LUS))
    group_cols = [c for c in left.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(F.count(F.when(in_range, 1)).alias(count_alias))
    )
