"""Structured Streaming surface (SURVEY §2.10).

Three pieces:

1. ``stream_changelog_files`` — the reference's incremental merge as a
   Structured Streaming query: file-source over the CDC layout →
   ``foreachBatch`` W1-dedup + merge into a ManagedTable.  Spark's file
   source provides new-file detection and checkpointing (S4's index-diff
   loop for free); within a micro-batch, ordering is irrelevant because the
   W1 window collapses events by (pk, commit_ts); *across* batches the
   merge is last-writer-wins idempotent.  DDL barriers are NOT expressible
   on this path (file order is nondeterministic) — schema-evolving streams
   use streaming.consumer.IncrementConsumer, exactly the trade-off the
   reference resolves the same way (SURVEY §4.3.1).

2. ``windowed_event_counts`` — tumbling-window aggregation with optional
   watermark for late data (works identically over batch and stream
   inputs; the reference has no windows, this is engine-completeness).

3. ``sessionize_events`` — custom stateful operator: session windows per
   user with an inactivity gap, via ``applyInPandasWithState`` on streams
   and an equivalent gaps-and-islands window query for batch (the batch
   twin is what the DuckDB oracle checks).

4. ``interval_join_clicks_before_errors`` — stream-stream interval join
   (watermarks on both sides bound the join state).

5. ``dedup_events_stream`` — exactly-once ingest over an at-least-once
   upstream via ``dropDuplicatesWithinWatermark`` (bounded dedup state).

6. ``lww_dedup_stream`` — stateful cross-batch W1: per-PK winner row held
   in GroupState, emitted only on change (idempotent under redelivery).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.envelope import envelope_schema
from ..sources.snapshot import CSV_OPTIONS
from ..table.managed import ManagedTable

# ---------------------------------------------------------------------------
# 1. Streaming changelog merge
# ---------------------------------------------------------------------------
def stream_changelog_files(
    spark: SparkSession,
    glob: str,
    table: ManagedTable,
    payload_schema: T.StructType,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start a streaming merge of CDC csv files into *table*.

    Returns the StreamingQuery; callers ``awaitTermination()``.  With
    ``available_now`` the query drains all currently-visible files and
    stops — the batch-parity trigger (reference poll loop ≈ 12s ticks;
    use ``processingTime`` for that behavior)."""
    reader = spark.readStream.schema(envelope_schema(payload_schema))
    for k, v in CSV_OPTIONS.items():
        reader = reader.option(k, v)
    stream = reader.csv(glob)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # ManagedTable.merge, not read→apply→overwrite: bucketed tables
        # rewrite only the touched bucket partitions and MoR tables commit
        # O(batch) delta files — a full-table overwrite per micro-batch
        # would be the 100 TB scale-killer this engine exists to avoid
        # (plain tables still fall back to overwrite inside merge)
        table.merge(batch_df.sparkSession, batch_df)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="12 seconds")
    return writer.start()


# ---------------------------------------------------------------------------
# 2. Tumbling-window aggregation (+watermark on streams)
# ---------------------------------------------------------------------------
def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str | None = None,
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """Events per (tumbling — or, with *slide*, sliding — window,
    event_type): count, distinct users, min/max value.  Streaming-safe:
    with a watermark, late rows beyond the bound are dropped and windows
    finalize incrementally.  A sliding window fans each row out to
    duration/slide windows before the shuffle — the partial aggregation
    still combines map-side, so shuffle bytes stay per-(window,type), not
    per-event."""
    # watermarks require TIMESTAMP (reject NTZ); UTC session makes the cast
    # epoch-identical for parquet-inferred TIMESTAMP_NTZ event time
    df = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    agg = [
        F.count("*").alias("n_events"),
        (F.approx_count_distinct("user_id") if df.isStreaming else F.countDistinct("user_id")).alias("n_users"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    window = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        df.groupBy(window.alias("w"), "event_type")
        .agg(*agg)
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "n_users",
            "min_value",
            "max_value",
        )
    )


# ---------------------------------------------------------------------------
# 3. Sessionization — custom stateful operator
# ---------------------------------------------------------------------------
SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def sessionize_events_batch(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Batch sessionization: gaps-and-islands with window functions —
    a session breaks when the gap to the previous event exceeds
    *gap_seconds*.  Returns one row per (user, session)."""
    ts = F.col(ts_col).cast("timestamp")
    by_user = Window.partitionBy("user_id").orderBy(ts, "event_id")
    flagged = events.withColumn(
        "__new_session",
        (
            F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts).over(by_user))
            > gap_seconds
        ).cast("int"),
    ).withColumn(
        "__session_no",
        F.sum(F.coalesce(F.col("__new_session"), F.lit(1))).over(
            by_user.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        flagged.groupBy("user_id", "__session_no")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .drop("__session_no")
    )


def sessionize_events_stream(
    events: DataFrame, gap_seconds: int = 1800, ts_col: str = "ts"
) -> DataFrame:
    """Streaming sessionization via applyInPandasWithState: per-user state
    holds the open session; a processing-time timeout flushes idle ones.
    Emits CLOSED sessions only (the batch twin emits all)."""
    gap_us = gap_seconds * 1_000_000

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start_us, unit="us")],
                        "session_end": [pd.Timestamp(last_us, unit="us")],
                        "n_events": [n],
                    }
                )
            return
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        closed = []
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = None, None, 0
        for t in rows[ts_col]:
            t_us = int(pd.Timestamp(t).value // 1_000)  # ns → µs (batch parity)
            if start_us is None:
                start_us, last_us, n = t_us, t_us, 1
            elif t_us - last_us > gap_us:
                closed.append((start_us, last_us, n))
                start_us, last_us, n = t_us, t_us, 1
            else:
                last_us, n = t_us, n + 1
        state.update((start_us, last_us, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n_ for _, _, n_ in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# 4. Stream-stream interval join
# ---------------------------------------------------------------------------
def interval_join_clicks_before_errors(
    errors: DataFrame,
    clicks: DataFrame,
    window_seconds: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Clicks in the *window_seconds* before each error by the same user —
    as a stream-stream inner join.  Streaming requires a watermark on BOTH
    sides plus a time-range join condition: together they bound the
    buffered state to watermark + interval width per side, so state never
    grows with stream length.  Works identically on batch inputs (the
    watermark is skipped; Catalyst plans a plain join).  The batch scale
    path for the same semantics is operators/rangejoin.range_count_join,
    which quantizes the interval into an equi-join instead of buffering.
    """
    e = errors.select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").cast("timestamp").alias("error_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("click_user"),
        F.col("ts").cast("timestamp").alias("click_ts"),
    )
    if errors.isStreaming:
        e = e.withWatermark("error_ts", watermark)
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("click_user"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr(f"INTERVAL {window_seconds} SECONDS"))
        & (F.col("click_ts") <= F.col("error_ts"))
    )
    return e.join(c, cond, "inner").select(
        "error_id", "user_id", "error_ts", "click_ts"
    )


# ---------------------------------------------------------------------------
# 5. Streaming ingest dedup
# ---------------------------------------------------------------------------
def dedup_events_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """At-least-once upstream delivery → exactly-once ingest: drop
    re-deliveries of the same event_id.  On streams this is
    ``dropDuplicatesWithinWatermark`` — state keeps one entry per key and
    is EVICTED once the watermark passes it (a plain streaming
    ``dropDuplicates`` would hold every key forever, unbounded at 100 TB/
    day ingest; the watermark variant trades that for "duplicates arrive
    within the lateness bound", which is what CDC/event buses guarantee).
    Batch twin: ``dropDuplicates`` on the same key."""
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


# ---------------------------------------------------------------------------
# 6. Streaming cross-batch last-writer-wins (stateful W1)
# ---------------------------------------------------------------------------
def lww_dedup_stream(
    changelog: DataFrame,
    pk_cols: list[str],
    ts_col: str = "commit_ts",
    flag_col: str = "flag",
    file_seq_col: str = "__file_seq",
) -> DataFrame:
    """Streaming-native W1: per-PK last-writer-wins ACROSS micro-batches
    via ``applyInPandasWithState``.  The batch W1 (operators/dedup.py)
    collapses one batch; here per-key state holds the current winning row
    image, and a batch's candidate replaces it only when its
    (commit_ts [, file_seq], flag) sort key is strictly newer — the same
    D < I < U tie order the batch window uses.  Emits a row only when the
    winner CHANGES, so the output is the evolving row-image stream a
    downstream merge sink consumes, and an at-least-once redelivery of an
    already-applied event emits nothing (idempotent replay for free).

    State is one row per live PK — the same footprint a streaming
    aggregation over the key space would hold; production deployments
    bound it by closing keys whose commit_ts falls behind the watermark.
    (Spark 4's ``transformWithStateInPandas`` is the designated successor
    API for this operator; its state-server protocol needs protobuf,
    which this container lacks, so the GroupState formulation is the
    portable one and the semantics are identical.)
    """
    schema = changelog.schema
    cols = [f.name for f in schema.fields]
    ts_i, flag_i = cols.index(ts_col), cols.index(flag_col)
    seq_i = cols.index(file_seq_col) if file_seq_col in cols else None
    sort_cols = [ts_col] + ([file_seq_col] if seq_i is not None else []) + [flag_col]

    def sort_key(row) -> tuple:
        seq = (row[seq_i] if seq_i is not None else -1) or -1
        return (row[ts_i], seq, row[flag_i])

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        # na_position='first' ranks a null file_seq lowest, matching the
        # batch window's desc-nulls-last precedence
        rows = pd.concat(list(pdfs)).sort_values(sort_cols, na_position="first")
        cand = [
            v.item() if hasattr(v, "item") else v for v in rows.iloc[-1][cols]
        ]
        if state.exists and sort_key(cand) <= sort_key(tuple(state.get)):
            return  # stale or replayed event: winner unchanged, emit nothing
        state.update(tuple(cand))
        yield pd.DataFrame([cand], columns=cols)

    return changelog.groupBy(*pk_cols).applyInPandasWithState(
        update,
        outputStructType=schema,
        stateStructType=schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# 7. Change-data-feed subscription (streaming CDF consumer)
# ---------------------------------------------------------------------------
def stream_changes(spark: SparkSession, table: ManagedTable) -> DataFrame:
    """Streaming source over a CDF-enabled table's change feed: Spark's
    file source discovers each merge commit's ``_changes/s=N`` files as
    they appear, with its own checkpointable progress — a live
    subscription to the table's row-level deltas.

    Schema is pinned to the CURRENT manifest (+ the three feed metadata
    columns); change files written before a metadata-only ADD surface the
    later column as NULL (the file source fills missing columns — it
    cannot apply per-column defaults the way ``ManagedTable.changes``
    conforms).  A metadata-only WIDENING MODIFY is harder: older change
    files physically store the narrower type (e.g. INT32 under a declared
    LONG), and a single file-source scan pinned to the widened schema
    fails parquet type conversion on them — ``changes()`` groups commits
    by physical footer schema for exactly this reason, but a raw file
    source cannot.  Like a rewrite-path RENAME, a widening DDL therefore
    requires restarting the stream with a fresh checkpoint positioned
    after the DDL — unless you use the COMMIT-LOG source
    (:func:`..streaming.cdf_source.stream_changes_commitlog`), which
    checkpoints by commit seq and conforms each commit by field id, so
    the same checkpoint rides every pre-start barrier un-re-seeded; this
    raw file source remains for consumers that want filesystem-latency
    wakeups with no conformance.  The file source also trusts the filesystem rather than
    the manifest gate, so a crashed merge's not-yet-committed directory
    can be seen early — deterministic retries overwrite it with identical
    content.  Consumers needing the strict manifest-gated view read
    ``changes()``; consumers driving side effects should checkpoint by
    ``_commit_seq`` (see :func:`stream_refresh_aggregate`, which folds
    idempotently by seq and uses the stream only as a wake-up signal)."""
    import json

    from pyspark.sql.types import IntegerType, StringType, StructField, StructType

    from ..table.managed import (
        CHANGE_TYPE_COL,
        COMMIT_SEQ_COL,
        COMMIT_VERSION_COL,
    )

    m = table.manifest()
    if not m.get("cdf"):
        raise ValueError("change data feed not enabled on this table")
    schema = StructType.fromJson(json.loads(m["schema_json"]))
    for fld in (
        StructField(CHANGE_TYPE_COL, StringType()),
        StructField(COMMIT_SEQ_COL, IntegerType()),
        StructField(COMMIT_VERSION_COL, IntegerType()),
    ):
        schema = schema.add(fld)
    return spark.readStream.schema(schema).parquet(
        str(table.root / "_changes" / "s=*")
    )


def stream_derived_refresh(
    spark: SparkSession,
    table: ManagedTable,
    derived,
    checkpoint_dir: str,
    available_now: bool = True,
    processing_interval: str = "12 seconds",
):
    """Keep DERIVED STATE (a :class:`~..operators.matview.
    MaintainedAggregate`, :class:`~..operators.secondary_index.
    SecondaryIndex`, :class:`~..operators.ann_index.IvfVectorIndex`, a
    bound join view (:meth:`~..operators.join_matview.
    MaintainedJoinAggregate.bind` — wake on EITHER table's feed, each
    refresh folds both), or a
    list of them) fresh from the live feed: the change stream is the
    WAKE-UP SIGNAL, each refresh itself folds by ``_commit_seq`` through
    the object's own checkpoint.  foreachBatch is at-least-once —
    applying the batch rows directly would double-count on replay;
    ``refresh`` is idempotent by construction (it applies exactly
    ``(applied_seq, cdf_seq]``), so replays and even concurrent refreshes
    converge.  The signal rides the COMMIT-LOG source
    (:func:`~.cdf_source.stream_changes_commitlog`), so checkpoints
    survive RENAME/widening/ADD/DROP barriers that predate the query —
    the derived objects already conform across those by field id; a
    barrier landing mid-run surfaces the source's restart contract
    (restart with the SAME checkpoint) instead of a silent re-seed."""
    from ..replicate import SliceSharingTable
    from .cdf_source import stream_changes_commitlog

    objs = list(derived) if isinstance(derived, (list, tuple)) else [derived]

    def wake(batch_df: DataFrame, batch_id: int) -> None:
        # same slice amortization as the poll loop: N woken objects at
        # the same applied_seq fold from ONE persisted feed scan
        shared = SliceSharingTable(table) if len(objs) > 1 else table
        for d in objs:
            # same bootstrap guard as TableReplicator's poll loop: an
            # index-shaped object (SecondaryIndex / IvfVectorIndex) needs
            # an explicit first build — refreshing an unbuilt one dies on
            # a missing _meta.json; view-shaped objects seed inside
            # refresh and take the else branch on first wake
            if not d.exists() and hasattr(d, "build"):
                d.build(batch_df.sparkSession, shared)
            else:
                d.refresh(batch_df.sparkSession, shared)
        if isinstance(shared, SliceSharingTable):
            shared.release()

    writer = (
        stream_changes_commitlog(spark, table)
        .writeStream.foreachBatch(wake)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_interval)
    return writer.start()


def stream_refresh_aggregate(
    spark: SparkSession,
    table: ManagedTable,
    mv,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Single-aggregate convenience wrapper over
    :func:`stream_derived_refresh` (the original name, kept for
    callers).

    Upgrade note: checkpoints written by this helper's pre-commit-log
    implementation (raw file source) are NOT resumable by the new source
    — the first drain fails loudly naming the mismatch.  Discard the old
    checkpoint directory and start fresh: the refresh itself is
    idempotent by the aggregate's own ``applied_seq``, so no state
    re-seeds and nothing double-counts."""
    return stream_derived_refresh(
        spark, table, mv, checkpoint_dir, available_now=available_now
    )
