"""Incremental (cross-batch) dedup against persisted fingerprint state.

The batch dedup ops in ``functions.dedup`` answer "which of these rows are
duplicates *of each other*"; a streaming ingest pipeline needs "which of
these rows duplicate *anything ever ingested*" — without rescanning the
corpus per batch.  This operator keeps the seen-fingerprint set in a
PK-bucketed :class:`~tidb2dw_spark.table.managed.ManagedTable` keyed by
fingerprint, so each batch:

1. collapses to one candidate per fingerprint (intra-batch dedup),
2. probes ONLY the state buckets its fingerprints hash to
   (``read_for_keys`` — a k-fingerprint probe scans ~k buckets, not the
   state table),
3. anti-joins to find novel fingerprints, and
4. merges them into the state through the table's atomic-manifest merge
   (same exactly-once semantics as the CDC path).

At 100 TB of ingested corpus the per-batch cost is O(batch + touched
buckets) — state size only affects the bucket count you choose.  Replays
are idempotent: a fingerprint re-presented by the SAME document that
registered it is still reported novel (so an at-least-once upstream can
re-emit a batch and downstream sees identical survivors), while a
different document with that fingerprint is a duplicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..table.managed import ManagedTable


class IncrementalDeduper:
    def __init__(self, root, pk_buckets: int = 64):
        self.table = ManagedTable(root)
        self.pk_buckets = pk_buckets

    def state_count(self, spark: SparkSession) -> int:
        return self.table.read(spark).count() if self.table.exists() else 0

    def dedup_batch(
        self,
        spark: SparkSession,
        batch: DataFrame,
        id_col: str,
        fingerprint: Column,
        commit_ts: int,
    ) -> DataFrame:
        """Return the rows of *batch* that are novel w.r.t. every prior
        batch (and each other), registering their fingerprints.

        *commit_ts* must be monotone per call (the batch sequence number);
        it rides the state-table merge for last-writer-wins replay
        safety."""
        fps = batch.select(F.col(id_col), fingerprint.alias("fp"))
        # intra-batch: deterministic keep-lowest-id per fingerprint
        w = Window.partitionBy("fp").orderBy(F.col(id_col))
        cands = (
            fps.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        if self.table.exists():
            seen = self.table.read_for_keys(spark, cands.select("fp"))
            novel = (
                cands.join(seen, on="fp", how="left")
                .filter(
                    F.col("first_id").isNull() | (F.col("first_id") == F.col(id_col))
                )
                .select(id_col, "fp")
            )
        else:
            novel = cands

        payload = novel.select("fp", F.col(id_col).alias("first_id"))
        if not self.table.exists():
            self.table.create(payload, ["fp"], pk_buckets=self.pk_buckets)
        else:
            changelog = payload.select(
                F.lit("I").alias("flag"),
                F.lit("dedup_state").alias("tablename"),
                F.lit("internal").alias("schemaname"),
                F.lit(commit_ts).cast("long").alias("commit_ts"),
                "fp",
                "first_id",
            )
            self.table.merge(spark, changelog)

        return batch.join(
            F.broadcast(novel.select(F.col(id_col))), on=id_col, how="left_semi"
        )
