"""Versioned Parquet managed table — the engine's "warehouse table".

The reference's sink is a warehouse table reached over SQL; ours is a
copy-on-write Parquet table with an atomically-swapped manifest, i.e. the
minimal core of what Delta/Iceberg provide (this container has no Delta):

    <root>/_meta/manifest.json        current version, pk, schema, and for
                                      bucketed tables the per-bucket version map
    <root>/v=N/part-*.parquet         plain table: data for version N
    <root>/v=N/__pk_bucket=B/…        bucketed table: bucket B as of version N

Commits write data first, then atomically replace the manifest
(os.replace), so readers always see a complete version and a crashed merge
leaves the table at its previous version — this is what makes
at-least-once file processing + idempotent merge exactly-once
(SURVEY §2.10).  Old versions are retained for time travel and vacuumed
explicitly.

Scale design — the two write paths:

- ``pk_buckets == 0``: full copy-on-write per commit.  Correct baseline;
  right for small dims.
- ``pk_buckets > 0``: rows are hash-bucketed by PK.  ``merge()`` computes
  the buckets touched by a changelog batch and rewrites ONLY those bucket
  partitions; the manifest's ``bucket_versions`` map points each bucket at
  the version that last rewrote it.  A 64 MiB CDC batch against a 100 TB
  table rewrites a handful of buckets instead of the table — merge cost is
  O(touched data), and the bucket column gives partition pruning on reads
  that filter by PK hash.
- ``merge_mode="mor"`` (merge-on-read, bucketed only): a batch lands as
  per-bucket delta files under ``delta/seq=N`` (O(batch) write — even the
  touched buckets are not rewritten); reads resolve last-writer-wins
  across base ∪ deltas, and ``compact()`` folds deltas back into base.
  The Hudi-MOR / deletion-vector trade for high-frequency CDC, where CoW's
  rewrite of a ~25 GB bucket per touched row is the write amplifier.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "__pk_bucket"
# read_for_keys' driver-side key-collect cap: at or under this many
# distinct key tuples the probe materializes once (LocalRelation keys);
# past it the key frame stays distributed (module-level for tests)
READ_PROBE_CAP = 8192
CHANGE_TYPE_COL = "_change_type"
COMMIT_SEQ_COL = "_commit_seq"
COMMIT_VERSION_COL = "_commit_version"


def cdf_epoch_index(epochs: list[dict], seq: int) -> int:
    """Index of the field epoch covering change seq *seq*: *epochs* is
    sorted by ``upto_seq`` and entry i covers seqs ≤ its ``upto_seq``;
    seqs past the last entry use the current manifest map (index
    ``len(epochs)``).  Shared by batch :meth:`ManagedTable.changes` and
    the streaming commit-log source — the feed's conformance semantics
    live HERE, once."""
    for i, e in enumerate(epochs):
        if seq <= e["upto_seq"]:
            return i
    return len(epochs)


def cdf_output_name(
    name: str, eidx: int, epochs: list[dict], field_ids: dict, id_to_cur: dict
) -> str | None:
    """Physical (write-time) payload column name → the CURRENT name of
    the same FIELD ID, or None when that id was since dropped (a dropped
    field's cells must never surface — not even under a later re-ADD of
    the same name).  This single decision is what both the batch
    ``changes()`` relabel and the streaming source's per-file spec
    apply; keeping it one function makes batch/stream drift impossible."""
    if eidx >= len(epochs) or not field_ids:
        return name
    wid = epochs[eidx]["ids"].get(name)
    if wid is None:
        return name
    return id_to_cur.get(wid)


class ManagedTable:
    def __init__(self, root: str | Path):
        self.root = Path(root)

    # -- metadata ---------------------------------------------------------
    @property
    def _manifest_path(self) -> Path:
        return self.root / "_meta" / "manifest.json"

    def exists(self) -> bool:
        return self._manifest_path.exists()

    def manifest(self) -> dict:
        return json.loads(self._manifest_path.read_text())

    def version(self) -> int:
        return self.manifest()["version"]

    def pk_cols(self) -> list[str]:
        return self.manifest()["pk"]

    # manifest keys snapshotted into every commit-log entry: enough to
    # reconstruct the table's READ state as of that commit (time travel),
    # excluding the potentially-large stats blocks (file_stats/bloom_stats)
    _HISTORY_STATE_KEYS = (
        "version", "data_version", "pk", "pk_buckets", "columns",
        "schema_json", "column_defaults", "bucket_versions",
        "bucket_deltas", "delta_seq", "merge_mode",
        "field_ids", "next_field_id", "field_epochs",
        "source_ts_high",
        # cdf_seq per commit lets ConsistentSnapshot map a pinned table
        # commit to the DERIVED state (matview/sketch applied_seq) that
        # reflects exactly the same source changes
        "cdf_seq",
    )

    def _commit(self, manifest: dict, action: str = "commit") -> None:
        meta_dir = self.root / "_meta"
        meta_dir.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=meta_dir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)
        # append-only commit log AFTER the manifest swap (DESCRIBE HISTORY
        # parity): best-effort observability — the manifest remains the
        # single source of truth, so a crash between swap and log write
        # loses a log line, never table state.  Each entry also snapshots
        # the restorable read state (bucket_versions, schema, delta lists),
        # which is what makes time travel on a bucket-pruned table possible:
        # v=N holds only the buckets version N rewrote, so reading "as of
        # commit C" needs C's whole bucket→version map, not just N.
        import time as _time

        entry = {
            "ts": round(_time.time(), 3),
            "action": action,
            **{
                k: manifest[k]
                for k in self._HISTORY_STATE_KEYS
                if k in manifest
            },
        }
        with open(meta_dir / "commits.jsonl", "a") as f:
            f.write(json.dumps(entry) + "\n")

    def history(self) -> list[dict]:
        """The table's commit log, oldest first: one entry per manifest
        swap with its action (create / merge / merge-mor / evolve /
        compact / overwrite / update-meta), resulting version, and for MoR
        tables the delta sequence.  Read straight from the append-only
        jsonl — no Spark job."""
        p = self.root / "_meta" / "commits.jsonl"
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines() if line]

    def _bucket_expr(self, pk_cols: list[str], n: int):
        return F.pmod(F.hash(*[F.col(c) for c in pk_cols]), F.lit(n))

    # -- write paths ------------------------------------------------------
    def create(
        self,
        df: DataFrame,
        pk_cols: Sequence[str],
        pk_buckets: int = 0,
        extra_meta: dict | None = None,
        merge_mode: str = "cow",
        cdf: bool = False,
    ) -> "ManagedTable":
        """CREATE OR REPLACE + initial load (S6 / D3 parity).

        ``cdf=True`` enables the CHANGE DATA FEED: every subsequent
        :meth:`merge` commit also writes its row-level change set
        (insert / update_preimage / update_postimage / delete) under
        ``_changes/s=N``, readable via :meth:`changes` — the Delta-CDF
        shape that lets downstream consumers (incremental aggregates,
        derived tables, audit) process O(changes) instead of re-diffing
        or re-scanning the table.  The initial load emits no changes
        (Delta parity: CDF describes deltas between versions, not the
        seed).

        ``merge_mode="mor"`` (bucketed tables only) switches :meth:`merge`
        to merge-on-read: a CDC batch appends per-bucket DELTA files
        instead of rewriting the touched buckets, and reads resolve
        last-writer-wins across base ∪ deltas.  Copy-on-write rewrites a
        ~25 GB bucket to apply one row; MoR writes O(batch) per commit and
        pays one window per delta-bearing bucket at read —
        the Delta-deletion-vector / Hudi-MOR trade, right for
        high-frequency CDC with compaction folding deltas in the
        background (:meth:`compact`)."""
        if merge_mode not in ("cow", "mor"):
            raise ValueError(f"unknown merge_mode {merge_mode!r}")
        if merge_mode == "mor" and pk_buckets <= 0:
            raise ValueError("merge_mode='mor' requires a PK-bucketed table")
        pk_cols = list(pk_cols)
        columns = [c for c in df.columns if c != BUCKET_COL]
        self._write_version_data(df, 1, pk_cols, pk_buckets)
        manifest = {
            "version": 1,
            "pk": pk_cols,
            "pk_buckets": pk_buckets,
            "columns": columns,
            # authoritative schema: lets an empty table (no data files yet /
            # truncated) still read with correct types
            "schema_json": df.drop(BUCKET_COL).schema.json()
            if BUCKET_COL in df.columns
            else df.schema.json(),
        }
        # stable FIELD IDS (Iceberg/Delta column-mapping parity, and the
        # reference's own rename detection keys on column ID —
        # tidbsql/ddl.go:31-45): every column gets an integer identity at
        # create; renames MOVE the name, never the id; ids are never
        # reused after a drop.  This is what lets the change feed follow
        # a RENAME barrier without re-seeding (see changes()).
        manifest["field_ids"] = {c: i + 1 for i, c in enumerate(columns)}
        manifest["next_field_id"] = len(columns) + 1
        # SOURCE TSO fence: the initial load is the snapshot at ts 0 (the
        # consumer's snapshot TSO); every merge advances it to the batch's
        # max commit_ts — see read_as_of_source_ts / ConsistentSnapshot
        manifest["source_ts_high"] = 0
        if pk_buckets > 0:
            manifest["bucket_versions"] = {str(b): 1 for b in range(pk_buckets)}
        else:
            manifest["data_version"] = 1
        if merge_mode != "cow":
            manifest["merge_mode"] = merge_mode
            manifest["delta_seq"] = 0
            manifest["bucket_deltas"] = {}
        if cdf:
            manifest["cdf"] = True
            manifest["cdf_seq"] = 0
        if extra_meta:
            manifest.update(extra_meta)
        self._commit(manifest, action="create")
        return self

    def overwrite(
        self,
        df: DataFrame,
        new_columns: list[str] | None = None,
        extra_meta: dict | None = None,
    ) -> int:
        """Commit *df* as a full next version (merge fallback & schema
        evolution).  *extra_meta* lands in the same atomic manifest swap, so
        e.g. the consumer's applied source-schema version commits together
        with the data it applies to (exactly-once across restarts)."""
        m = self.manifest()
        new_version = m["version"] + 1
        self._write_version_data(df, new_version, m["pk"], m.get("pk_buckets", 0))
        m["version"] = new_version
        if m.get("pk_buckets", 0) > 0:
            m["bucket_versions"] = {
                str(b): new_version for b in range(m["pk_buckets"])
            }
        else:
            # plain tables resolve data through this pointer (version is
            # the commit counter; restore() re-points data_version only)
            m["data_version"] = new_version
        if new_columns is not None:
            m["columns"] = new_columns
        m["schema_json"] = (
            df.drop(BUCKET_COL).schema.json()
            if BUCKET_COL in df.columns
            else df.schema.json()
        )
        # a full overwrite materializes the resolved state (read() folds
        # pending deltas into *df*'s lineage), so the delta lists reset
        if m.get("bucket_deltas"):
            m["bucket_deltas"] = {}
            self._gc_delta_stats(m)
        if extra_meta:
            m.update(extra_meta)
        self._commit(m, action="overwrite")
        return new_version

    def merge(
        self,
        spark: SparkSession,
        batch: DataFrame,
        extra_meta: dict | None = None,
        broadcast_batch: bool = True,
    ) -> int:
        """Apply a raw changelog batch (envelope columns + payload).

        Bucketed tables rewrite only the buckets containing touched PKs;
        plain tables fall back to a full overwrite.  The batch is W1-deduped
        inside (idempotent for replays of the same files).
        *broadcast_batch=False* (backlog-sized batches — the consumer
        decides from its group's file bytes) drops the key-set broadcast
        hint and lets AQE pick the join strategy."""
        from ..operators.dedup import last_writer_wins  # local: avoid cycle
        from ..operators.merge import merge_changelog

        m = self.manifest()
        pk_cols, n_buckets = m["pk"], m.get("pk_buckets", 0)
        # SOURCE TSO fence bookkeeping: each merge advances source_ts_high
        # to the batch's max commit_ts (monotone under the consumer's O1-O3
        # ordering), snapshotted into the commit-log entry so
        # read_as_of_source_ts can resolve a fence to a commit ordinal.
        has_ts = "commit_ts" in batch.columns
        if n_buckets <= 0:
            if has_ts:
                mx, n_batch = batch.agg(
                    F.max("commit_ts"), F.count(F.lit(1))
                ).collect()[0]
                if mx is not None:
                    extra_meta = {
                        **(extra_meta or {}),
                        "source_ts_high": max(
                            int(m.get("source_ts_high", 0) or 0), int(mx)
                        ),
                    }
                elif n_batch:
                    # rows changed but carried no fence position — the
                    # fence is now INCOMPLETE for this table's lifetime:
                    # fenced reads must refuse rather than serve a
                    # commit that may hide newer-than-fence changes
                    extra_meta = {**(extra_meta or {}), "fence_incomplete": True}
            elif not batch.take(1):
                # same semantics as the bucketed arm's `if not touched:`
                # no-op — an empty ts-less batch changes nothing, so it
                # must neither poison the fence nor rewrite the table
                if extra_meta:
                    self.update_meta(**extra_meta)
                return m["version"]
            else:
                # rows changed with no fence position at all (the batch
                # lacks commit_ts): fenced reads must refuse from now on
                extra_meta = {**(extra_meta or {}), "fence_incomplete": True}
            target = self.read(spark)
            final = last_writer_wins(batch, pk_cols)
            merged = merge_changelog(
                target, final, pk_cols, broadcast_batch=broadcast_batch
            )
            if m.get("cdf"):
                seq = self._write_change_set(
                    final, target, m, m["version"] + 1, broadcast_batch
                )
                extra_meta = {**(extra_meta or {}), "cdf_seq": seq}
            return self.overwrite(merged, extra_meta=extra_meta)

        # 1. which buckets does the batch touch?  (distinct over ≤n_buckets
        #    values — a metadata-sized driver collect; the TSO fence max
        #    rides the SAME job, not a second batch scan)
        if has_ts:
            stats = batch.groupBy(
                self._bucket_expr(pk_cols, n_buckets).alias("b")
            ).agg(F.max("commit_ts").alias("mx")).collect()
            touched = sorted(r["b"] for r in stats)
            mxs = [int(r["mx"]) for r in stats if r["mx"] is not None]
            if mxs:
                m["source_ts_high"] = max(
                    int(m.get("source_ts_high", 0) or 0), max(mxs)
                )
            elif touched:
                # data moved with no fence position — see the unbucketed
                # branch: fenced reads must refuse from now on
                m["fence_incomplete"] = True
        else:
            touched = sorted(
                r["b"]
                for r in batch.select(
                    self._bucket_expr(pk_cols, n_buckets).alias("b")
                ).distinct().collect()
            )
            if touched:
                m["fence_incomplete"] = True
        if not touched:
            if extra_meta:
                self.update_meta(**extra_meta)
            return m["version"]
        if m.get("merge_mode") == "mor":
            return self._merge_mor(
                spark, m, batch, touched, extra_meta, broadcast_batch=broadcast_batch
            )
        new_version = m["version"] + 1

        # 2. merge only those buckets' current data with the batch (the W1
        #    winners are shared between the merge and the change feed, so
        #    both see the identical upsert set)
        target = self._read_buckets(spark, m, touched)
        final = last_writer_wins(batch, pk_cols)
        merged = merge_changelog(
            target, final, pk_cols, broadcast_batch=broadcast_batch
        )
        if m.get("cdf"):
            m["cdf_seq"] = self._write_change_set(
                final, target, m, new_version, broadcast_batch
            )

        # 3. rewrite exactly the touched bucket partitions under the new
        #    version; untouched buckets keep their existing files
        out = merged.withColumn(BUCKET_COL, self._bucket_expr(pk_cols, n_buckets))
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
            str(self.root / f"v={new_version}")
        )
        m["version"] = new_version
        for b in touched:
            m["bucket_versions"][str(b)] = new_version
        if extra_meta:
            m.update(extra_meta)
        self._commit(m, action="merge")
        return new_version

    def _merge_mor(
        self,
        spark: SparkSession,
        m: dict,
        batch: DataFrame,
        touched: list[int],
        extra_meta: dict | None,
        broadcast_batch: bool = True,
    ) -> int:
        """Merge-on-read commit: W1-dedup the batch, land it as per-bucket
        delta files under ``delta/seq=N``, and record the delta in the
        touched buckets' manifest lists — NO base rewrite.  Write cost is
        O(batch); the read path (:meth:`_read_buckets`) resolves
        last-writer-wins across base ∪ deltas (newest delta seq wins, the
        same winner sequential CoW merges would produce), and
        :meth:`compact` folds deltas back into base.

        The commit point is still the atomic manifest swap: a crash after
        the delta write leaves an unreferenced ``seq=N`` directory (mode
        "overwrite" makes the replay idempotent) that :meth:`vacuum`
        collects."""
        from ..operators.dedup import last_writer_wins  # local: avoid cycle
        from ..sources.envelope import FLAG_COL

        pk_cols, n_buckets = m["pk"], m["pk_buckets"]
        final = last_writer_wins(batch, pk_cols)
        if m.get("cdf"):
            # classifying insert vs update needs the pre-image, which MoR
            # merges otherwise never read: CDF costs one bucket-pruned read
            # of the touched buckets (resolving pending deltas) on top of
            # the O(batch) delta write — the same read CoW pays anyway
            m["cdf_seq"] = self._write_change_set(
                final,
                self._read_buckets(spark, m, touched),
                m,
                m["version"],
                broadcast_batch=broadcast_batch,
            )
        seq = m.get("delta_seq", 0) + 1
        out = final.select(*m["columns"], FLAG_COL).withColumn(
            BUCKET_COL, self._bucket_expr(pk_cols, n_buckets)
        )
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
            str(self.root / "delta" / f"seq={seq}")
        )
        m["delta_seq"] = seq
        bd = m.setdefault("bucket_deltas", {})
        for b in touched:
            bd.setdefault(str(b), []).append(seq)
        # per-(seq, bucket) key-range stats over EVERY pk column (deletes
        # included — the range must cover every event in the file):
        # read_for_keys skips pending deltas whose range cannot contain
        # any probed key, bounding MoR read amplification by the deltas
        # that OVERLAP the probe instead of every pending delta.  Stats
        # are HARVESTED from the parquet footers the delta write above
        # just produced — a driver-side metadata read over the handful of
        # files in ``delta/seq=N``, NOT a second batch-sized Spark job
        # (that extra aggregation cost +36% on the MoR replay bench).
        # Types beyond int/string (not JSON-round-trippable) simply skip
        # stats and stay conservative.
        stats = self._harvest_delta_stats(
            self.root / "delta" / f"seq={seq}", pk_cols, dict(final.dtypes)
        )
        if stats:
            m.setdefault("delta_stats", {})[str(seq)] = stats
        if extra_meta:
            m.update(extra_meta)
        self._commit(m, action="merge-mor")
        return m["version"]

    _DELTA_STATS_TYPES = (
        "string", "int", "bigint", "smallint", "tinyint", "long",
    )

    def _harvest_delta_stats(
        self, delta_dir: Path, pk_cols: list[str], dtypes: dict
    ) -> dict:
        """Per-bucket ``{pk_col: [lo, hi]}`` ranges for a freshly written
        ``delta/seq=N`` directory, read from the parquet FOOTERS the delta
        write just produced — the writer already computed per-column
        min/max per row group, so stamping stats costs a driver-side
        metadata read (ms), not a second batch aggregation job.

        Truncated string statistics (parquet writers may shorten long
        binary min/max) remain valid LOWER/UPPER bounds, so pruning on
        them stays conservative; UTF-8 byte order equals code-point order,
        so Python ``str`` comparison against probe values agrees with the
        order the writer used.  Any row group missing stats for a column
        drops that column for the bucket (conservative: fewer columns to
        prune on); a bucket with no usable columns records nothing and its
        deltas are always read."""
        import pyarrow.parquet as _pq

        cols = [c for c in pk_cols if dtypes.get(c) in self._DELTA_STATS_TYPES]
        if not cols:
            return {}
        out: dict[str, dict] = {}
        for bdir in sorted(delta_dir.glob(f"{BUCKET_COL}=*")):
            b = bdir.name.split("=", 1)[1]
            ranges: dict[str, list] = {}
            dead: set[str] = set()
            for f in sorted(bdir.glob("*.parquet")):
                md = _pq.ParquetFile(str(f)).metadata
                idx = {
                    md.schema.column(i).name: i for i in range(md.num_columns)
                }
                for c in cols:
                    if c in dead:
                        continue
                    ci = idx.get(c)
                    if ci is None:
                        dead.add(c)
                        continue
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(ci).statistics
                        if (
                            st is None
                            or not st.has_min_max
                            or st.min is None
                            or st.max is None
                        ):
                            dead.add(c)
                            break
                        cur = ranges.get(c)
                        if cur is None:
                            ranges[c] = [st.min, st.max]
                        else:
                            cur[0] = min(cur[0], st.min)
                            cur[1] = max(cur[1], st.max)
            kept = {c: v for c, v in ranges.items() if c not in dead}
            if kept:
                out[b] = kept
        return out

    # -- DML conveniences --------------------------------------------------
    def _synthetic_batch(self, rows: DataFrame, flag: str) -> DataFrame:
        """Wrap table-shaped *rows* in the changelog envelope so the DML
        routes through :meth:`merge` — bucket pruning, MoR deltas, and the
        change feed all apply identically to engine-originated DML.
        commit_ts 0: each synthetic batch holds one event per key, and
        last-writer-wins only orders events WITHIN a batch."""
        from ..sources.envelope import FLAG_COL

        return (
            rows.withColumn(FLAG_COL, F.lit(flag))
            .withColumn("tablename", F.lit(self.root.name))
            .withColumn("schemaname", F.lit("_local"))
            .withColumn("commit_ts", F.lit(0).cast("long"))
        )

    def delete_where(self, spark: SparkSession, pred) -> int:
        """DELETE FROM t WHERE pred — matching rows become a 'D' changelog
        batch applied via :meth:`merge`: only the buckets holding matches
        rewrite (or gain deltas under MoR), and with CDF on, the deletes
        land in the feed with their pre-images."""
        rows = self.read(spark).filter(pred)
        return self.merge(spark, self._synthetic_batch(rows, "D"))

    def update_where(self, spark: SparkSession, pred, assignments: dict) -> int:
        """UPDATE t SET … WHERE pred — *assignments* maps column name →
        Column expression (evaluated against the matching rows).  Matches
        become a 'U' batch through :meth:`merge`.  PK columns cannot be
        assigned (that is a delete + insert, and silently rekeying rows
        through an upsert would duplicate them)."""
        bad = [c for c in assignments if c in self.pk_cols()]
        if bad:
            raise ValueError(f"cannot UPDATE primary-key column(s) {bad}")
        rows = self.read(spark).filter(pred)
        # ONE select, not chained withColumn: SQL UPDATE evaluates every
        # SET expression against the PRE-update row, so SET a=b, b=a must
        # swap — sequential withColumn would make the second assignment
        # see the first's output
        rows = rows.select(
            *[
                (assignments[c].alias(c) if c in assignments else F.col(c))
                for c in rows.columns
            ]
        )
        return self.merge(spark, self._synthetic_batch(rows, "U"))

    # -- change data feed --------------------------------------------------
    def _compute_changes(
        self,
        final: DataFrame,
        pre: DataFrame,
        pk_cols: list[str],
        cols: list[str],
        broadcast_batch: bool,
    ) -> DataFrame:
        """Row-level change set of applying the W1-deduped batch *final* to
        pre-image *pre*: MERGE-arm classification by pre-image presence, not
        by CDC flag (an 'I' on an existing key is an upsert → update; a 'U'
        on a key deleted earlier resolves to insert; a 'D' on an absent key
        is a no-op and emits nothing).

        Plan shape: an outer join that preserves the (small) batch side
        cannot broadcast-build it — BroadcastHashJoin only builds the
        non-preserved side — so a naive batch-LEFT-OUTER-pre would shuffle
        the whole pre-image.  Instead the pre-image is first restricted to
        the batch's keys with a broadcast LEFT-SEMI join (one streaming
        pass over the touched buckets, supported build side, output ≤
        |batch| rows), and the outer join then runs small-vs-small with
        the shrunken pre side broadcast.  The pre-image is scanned once
        and never shuffled.  Each joined row explodes into its 0–2 change
        rows via an array-of-structs literal — a single pass, not four
        filter-branch re-joins.  *broadcast_batch=False* (backlog-sized
        batches) drops both hints and lets AQE choose."""
        from ..sources.envelope import FLAG_COL

        non_pk = [c for c in cols if c not in pk_cols]
        pk_cols = list(pk_cols)
        batch_keys = final.select(*pk_cols)
        pre_small = pre.join(
            F.broadcast(batch_keys) if broadcast_batch else batch_keys,
            on=pk_cols,
            how="left_semi",
        ).select(
            *pk_cols,
            *[F.col(c).alias(f"__pre_{c}") for c in non_pk],
            F.lit(1).alias("__pre_hit"),
        )
        j = final.join(
            F.broadcast(pre_small) if broadcast_batch else pre_small,
            on=pk_cols,
            how="left_outer",
        )
        matched = F.col("__pre_hit").isNotNull()
        is_del = F.col(FLAG_COL) == "D"
        new_payload = [F.col(c) for c in cols]
        pre_payload = [
            F.col(c) if c in pk_cols else F.col(f"__pre_{c}") for c in cols
        ]

        def ch(payload, tag: str):
            return F.struct(
                *[p.alias(c) for p, c in zip(payload, cols)],
                F.lit(tag).alias(CHANGE_TYPE_COL),
            )

        arr = (
            F.when(matched & is_del, F.array(ch(pre_payload, "delete")))
            .when(
                matched,
                F.array(
                    ch(pre_payload, "update_preimage"),
                    ch(new_payload, "update_postimage"),
                ),
            )
            .otherwise(F.array(ch(new_payload, "insert")))
        )
        return (
            j.filter(matched | ~is_del)  # delete of an absent key: no-op
            .select(F.explode(arr).alias("__ch"))
            .select("__ch.*")
        )

    def _write_change_set(
        self,
        final: DataFrame,
        pre: DataFrame,
        m: dict,
        new_version: int,
        broadcast_batch: bool,
    ) -> int:
        """Write this commit's change rows under ``_changes/s=SEQ`` and
        return SEQ.  The caller commits ``cdf_seq=SEQ`` in the SAME atomic
        manifest swap as the data, so a crash after the change write leaves
        an unreferenced directory (mode "overwrite" → idempotent retry)
        that readers, which trust only ``cdf_seq``, never see.  SEQ is a
        dedicated counter rather than the table version because MoR merge
        commits do not bump the version."""
        seq = m.get("cdf_seq", 0) + 1
        out = (
            self._compute_changes(
                final, pre, m["pk"], m["columns"], broadcast_batch
            )
            .withColumn(COMMIT_SEQ_COL, F.lit(seq))
            .withColumn(COMMIT_VERSION_COL, F.lit(new_version))
        )
        out.write.mode("overwrite").parquet(str(self.root / "_changes" / f"s={seq}"))
        return seq

    def changes(
        self, spark: SparkSession, since: int = 0, until: int | None = None
    ) -> DataFrame:
        """Read the change data feed: rows of every commit with
        ``since < _commit_seq ≤ until`` (default: through the latest).

        Payload columns are conformed to the CURRENT table schema — change
        files written before a metadata-only ADD materialize the later
        column as its rendered default, exactly like the base read path —
        plus ``_change_type`` / ``_commit_seq`` / ``_commit_version``.
        Conformance is BY FIELD ID, not by name: each rewrite-path RENAME
        appends a field epoch (the pre-rename name→id map, valid through
        the cdf_seq at the DDL) to the manifest, and pre-rename change
        files are re-labeled to the current name of the same field id —
        so a feed consumer reads straight across a RENAME barrier without
        re-seeding (the reference's own rename detection keys on column
        ID, tidbsql/ddl.go:31-45; tables created before field ids fall
        back to by-name conformance).
        Commits sharing a physical schema (the common case — DDL barriers
        are rare relative to merges) group into ONE multi-path scan, so a
        long catch-up read plans #distinct-schemas scan nodes, not
        #commits (schemas are peeked from one parquet footer per commit
        directory, driver-side, no Spark job)."""
        m = self.manifest()
        if not m.get("cdf"):
            raise ValueError(
                "change data feed not enabled on this table (create(cdf=True))"
            )
        hi = m.get("cdf_seq", 0)
        if until is not None:
            hi = min(until, hi)
        meta_keep = (CHANGE_TYPE_COL, COMMIT_SEQ_COL, COMMIT_VERSION_COL)
        import pyarrow.parquet as _pq

        # field epochs: entry e covers change seqs ≤ e["upto_seq"] with the
        # name→id map in force when those files were written; seqs past the
        # last entry use the current manifest map
        epochs = sorted(m.get("field_epochs", []), key=lambda e: e["upto_seq"])

        def epoch_idx(seq: int) -> int:
            return cdf_epoch_index(epochs, seq)

        by_schema: dict[tuple, list[str]] = {}
        for s in range(since + 1, hi + 1):
            p = self.root / "_changes" / f"s={s}"
            if not p.exists():
                # every committed seq leaves a directory (even a zero-row
                # commit writes _SUCCESS), so absence means vacuum_changes
                # collected it: a consumer whose checkpoint lags the
                # retention window must re-seed, not silently skip changes
                raise ValueError(
                    f"change seq {s} was vacuumed (retention passed this "
                    "consumer's checkpoint); re-seed the downstream state"
                )
            files = sorted(p.glob("*.parquet"))
            if not files:  # zero-row commit may write only _SUCCESS
                continue
            # signature = names AND physical types: commits straddling a
            # metadata-only widening MODIFY share column names but store
            # INT32 vs INT64 — one multi-path scan over both would fail
            # the parquet type conversion.  The epoch index joins the key
            # so two epochs whose schemas collide by name (a→b→a round
            # trip) still conform through their own maps.
            sch = _pq.read_schema(str(files[0]))
            sig = (epoch_idx(s),) + tuple(f"{f.name}:{f.type}" for f in sch)
            by_schema.setdefault(sig, []).append(str(p))

        cur_ids = m.get("field_ids", {})
        id_to_cur = {v: k for k, v in cur_ids.items()}

        def relabel(df: DataFrame, eidx: int) -> DataFrame:
            """Map physical (write-time) names to current names via field
            ids — a single select, so simultaneous renames (swaps) stay
            unambiguous.  A column whose id was since DROPPED is renamed
            to a sentinel, never left under its physical name: if a later
            ADD reused that name, by-name conformance would resurrect the
            dead field's cells into the new column (change files are
            never physically rewritten, so the tombstone/rewrite dance
            that protects the base path cannot protect the feed — the
            epoch map is what does)."""
            if eidx >= len(epochs) or not cur_ids:
                return df
            writer_ids = epochs[eidx]["ids"]
            out = []
            for c in df.columns:
                if c in (CHANGE_TYPE_COL, COMMIT_SEQ_COL, COMMIT_VERSION_COL):
                    out.append(F.col(c))
                    continue
                cur = cdf_output_name(c, eidx, epochs, cur_ids, id_to_cur)
                if cur is None:
                    out.append(F.col(c).alias(f"__dead_{writer_ids[c]}__{c}"))
                elif cur != c:
                    out.append(F.col(c).alias(cur))
                else:
                    out.append(F.col(c))
            return df.select(*out)

        parts = [
            self._conform(
                spark, relabel(spark.read.parquet(*paths), sig[0]), m,
                keep=meta_keep,
            )
            for sig, paths in sorted(by_schema.items())
        ]
        if not parts:
            from pyspark.sql.types import (
                IntegerType,
                StringType,
                StructField,
                StructType,
            )

            schema = StructType.fromJson(json.loads(m["schema_json"]))
            for fld in (
                StructField(CHANGE_TYPE_COL, StringType()),
                StructField(COMMIT_SEQ_COL, IntegerType()),
                StructField(COMMIT_VERSION_COL, IntegerType()),
            ):
                schema = schema.add(fld)
            return spark.createDataFrame([], schema=schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _write_version_data(
        self, df: DataFrame, version: int, pk_cols: list[str], pk_buckets: int
    ) -> None:
        path = str(self.root / f"v={version}")
        if pk_buckets > 0:
            df = df.withColumn(BUCKET_COL, self._bucket_expr(pk_cols, pk_buckets))
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)

    def evolve_schema_metadata_only(
        self,
        new_columns: list[str],
        new_schema_json: str,
        column_defaults: dict | None = None,
        extra_meta: dict | None = None,
    ) -> int:
        """ADD/DROP COLUMN as a pure manifest commit — no data rewrite.

        Old files keep their physical schema; reads conform every file to
        the manifest (missing added columns materialize as their rendered
        default, dropped columns are pruned by the projection).  This is
        what makes a DDL barrier O(1) instead of O(table): at 100 TB an
        ADD COLUMN must not rewrite every bucket inside the consumer loop.
        RENAME/MODIFY still rewrite (they change existing cells)."""
        m = self.manifest()
        # field-id bookkeeping: retained names keep their ids, dropped
        # names leave the map (ids never reused), genuinely new names
        # take fresh ids.  A DROP records a FIELD EPOCH on CDF tables
        # (like a rename): change files are never physically rewritten,
        # so if a later ADD reuses the dropped name, changes() needs the
        # pre-DROP map to know the old files' same-named column is a
        # DIFFERENT (dead) field and must not resurrect into the new one.
        if "field_ids" in m:
            old_ids = m["field_ids"]
            ids = {c: old_ids[c] for c in new_columns if c in old_ids}
            nxt = m.get("next_field_id", max(old_ids.values(), default=0) + 1)
            for c in new_columns:
                if c not in ids:
                    ids[c] = nxt
                    nxt += 1
            dropped_ids = set(old_ids.values()) - set(ids.values())
            if dropped_ids and m.get("cdf"):
                m["field_epochs"] = m.get("field_epochs", []) + [
                    {"upto_seq": m.get("cdf_seq", 0), "ids": old_ids}
                ]
            m["field_ids"], m["next_field_id"] = ids, nxt
        m["columns"] = list(new_columns)
        m["schema_json"] = new_schema_json
        defaults = dict(m.get("column_defaults", {}))
        for k, v in (column_defaults or {}).items():
            defaults[k] = v
        # keep only defaults for live columns
        m["column_defaults"] = {k: v for k, v in defaults.items() if k in new_columns}
        if extra_meta:
            m.update(extra_meta)
        self._commit(m, action="evolve")
        return m["version"]

    # -- read path --------------------------------------------------------
    def _conform(self, spark: SparkSession, df: DataFrame, m: dict,
                 keep: Sequence[str] = ()) -> DataFrame:
        """Project *df* to the manifest schema: prune dropped columns,
        materialize manifest columns missing from the files (added
        metadata-only) as their rendered default cast to the declared
        type, and cast columns whose physical type predates a
        metadata-only widening MODIFY (schema.evolve only takes that path
        for lossless widenings, so the cast cannot truncate).  *keep*
        columns (delta-resolution metadata) survive the projection,
        appended after the manifest columns."""
        from pyspark.sql.types import StructType

        cols = m.get("columns", df.columns)
        by_name = {}
        if "schema_json" in m:
            schema = StructType.fromJson(json.loads(m["schema_json"]))
            by_name = {f.name: f for f in schema.fields}
        missing = [c for c in cols if c not in df.columns]
        if missing:
            defaults = m.get("column_defaults", {})
            for c in missing:
                dtype = by_name[c].dataType if c in by_name else None
                d = defaults.get(c)
                col = F.lit(d) if d is not None else F.lit(None)
                df = df.withColumn(c, col.cast(dtype) if dtype is not None else col)
        file_types = {f.name: f.dataType for f in df.schema.fields}
        for c in cols:
            want = by_name[c].dataType if c in by_name else None
            if want is not None and c in file_types and file_types[c] != want:
                df = df.withColumn(c, F.col(c).cast(want))
        return df.select(*[c for c in cols if c in df.columns], *keep)

    def _read_buckets(self, spark: SparkSession, m: dict, buckets) -> DataFrame:
        """Read bucket partitions grouped BY VERSION: every version
        directory is written atomically with one physical schema, but a
        metadata-only ADD means different versions can carry different
        column sets — each group is read with its own schema and conformed
        (added columns materialize as the rendered default for rows
        written before the column existed; rows written after keep their
        stored values, including explicit NULLs)."""
        bv = m.get("bucket_versions", {})
        bd = m.get("bucket_deltas", {})
        buckets = list(buckets)
        with_deltas = [b for b in buckets if bd.get(str(b))]
        plain = [b for b in buckets if not bd.get(str(b))]

        def base_of(bs) -> DataFrame | None:
            by_version: dict[str, list[str]] = {}
            for b in bs:
                p = self.root / f"v={bv[str(b)]}" / f"{BUCKET_COL}={b}"
                if p.exists():
                    by_version.setdefault(str(bv[str(b)]), []).append(str(p))
            if not by_version:
                return None
            parts = [
                self._conform(spark, spark.read.parquet(*paths), m)
                for _, paths in sorted(by_version.items())
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out

        def empty() -> DataFrame:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(m["schema_json"]))
            return spark.createDataFrame([], schema=schema)

        out = base_of(plain) if plain else None
        if with_deltas:
            resolved = self._resolve_mor(spark, m, with_deltas, base_of(with_deltas))
            out = resolved if out is None else out.unionByName(resolved)
        return out if out is not None else empty()

    def _resolve_mor(
        self,
        spark: SparkSession,
        m: dict,
        buckets: list[int],
        base: DataFrame | None,
    ) -> DataFrame:
        """Last-writer-wins across base ∪ pending deltas for delta-bearing
        buckets: base rows enter at delta seq 0, each delta batch at its
        commit seq; the newest seq per PK wins (exactly the winner
        sequential CoW merges would have produced — each delta batch is
        already W1-collapsed to one row per key), and a winning delete
        removes the key.  One window shuffle over the delta-bearing
        buckets' rows — the read-side cost MoR trades for O(batch)
        writes; compaction folds it away."""
        from ..sources.envelope import FLAG_COL

        bd = m.get("bucket_deltas", {})
        by_seq: dict[int, list[str]] = {}
        for b in buckets:
            for s in bd.get(str(b), []):
                p = self.root / "delta" / f"seq={s}" / f"{BUCKET_COL}={b}"
                if p.exists():
                    by_seq.setdefault(s, []).append(str(p))
        parts = []
        if base is not None:
            parts.append(
                base.withColumn(FLAG_COL, F.lit("I")).withColumn("__dseq", F.lit(0))
            )
        for s, paths in sorted(by_seq.items()):
            parts.append(
                self._conform(
                    spark, spark.read.parquet(*paths), m, keep=(FLAG_COL,)
                ).withColumn("__dseq", F.lit(s))
            )
        if not parts:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(m["schema_json"]))
            return spark.createDataFrame([], schema=schema)
        allrows = parts[0]
        for p in parts[1:]:
            allrows = allrows.unionByName(p)
        from pyspark.sql import Window

        w = Window.partitionBy(*m["pk"]).orderBy(F.desc("__dseq"))
        return (
            allrows.withColumn("__rn", F.row_number().over(w))
            .filter((F.col("__rn") == 1) & (F.col(FLAG_COL) != "D"))
            .drop("__rn", "__dseq", FLAG_COL)
        )

    def read_for_keys(
        self, spark: SparkSession, keys: DataFrame, manifest: dict | None = None
    ) -> DataFrame:
        """Point/batch lookup by PK: for a bucketed table, read ONLY the
        bucket partitions the requested keys hash to, then semi-join.

        This is the read-side payoff of PK bucketing: a k-key probe against
        a 100 TB table scans ~k buckets (table_size / pk_buckets each), not
        the table.  *keys* must carry the PK columns; it is assumed small
        (broadcast).  *manifest* PINS the probed state: a caller that also
        reads the change feed bounded by a manifest's cdf_seq passes the
        SAME manifest here, so a merge landing concurrently can't surface
        in the probe yet replay through the feed (the incremental-fold
        double-count hazard)."""
        m = manifest if manifest is not None else self.manifest()
        pk_cols, n = m["pk"], m.get("pk_buckets", 0)
        if n <= 0:
            return self.read(spark).join(F.broadcast(keys), on=pk_cols, how="left_semi")
        # ONE probe-capped collect of the key rows serves every
        # driver-side need of this read: the touched-bucket list, MoR
        # delta-stats pruning (when pending deltas carry stats), AND the
        # semi-join's key side as a LocalRelation — joining the original
        # (lazy) keys frame would re-execute its whole lineage (e.g. a
        # secondary-index probe) a second time; the collected tuples are
        # the identical key set with zero recompute.  The attempt is a
        # plain LIMIT (CollectLimit stops after probe_cap+1 ROWS — no
        # distinct shuffle, so a huge key frame pays only an
        # early-stopped partial scan, measured ~free vs the full
        # distinct a previous shape ran); at or under the cap the
        # multiset is complete, so driver-side dedup yields the exact
        # distinct key set.  Past the cap (by raw rows, duplicates
        # included — conservative) we fall back to the bucket-only
        # collect (bounded by bucket count), read every pending delta,
        # and keep the lazy keys frame distributed.  The over-cap case
        # runs two jobs over the key set; accepted — the truncated rows
        # cannot seed the bucket list (a bucket whose keys all arrive
        # past the cap would be silently dropped from the read set)
        has_stats = bool(m.get("delta_stats")) and any(
            m.get("bucket_deltas", {}).values()
        )
        probe_cap = READ_PROBE_CAP
        key_rows = (
            keys.select(
                self._bucket_expr(pk_cols, n).alias("b"),
                *[F.col(c).alias(f"k{i}") for i, c in enumerate(pk_cols)],
            )
            .limit(probe_cap + 1)
            .collect()
        )
        if len(key_rows) <= probe_cap:
            probes: dict[int, set] = {}
            for r in key_rows:
                probes.setdefault(r["b"], set()).add(
                    tuple(r[f"k{i}"] for i in range(len(pk_cols)))
                )
            touched = sorted(probes)
            if has_stats:
                m = self._prune_delta_seqs(m, probes)
            distinct_keys = list(
                dict.fromkeys(
                    tuple(r[f"k{i}"] for i in range(len(pk_cols)))
                    for r in key_rows
                )
            )
            key_schema = keys.select(*pk_cols).schema
            try:
                # pandas + Arrow: the relation lands in the JVM as Arrow
                # batches, so executing the semi-join never spins up a
                # Python worker; the plain list-of-tuples path backs the
                # frame with a pickled Python RDD that re-pays a Python
                # evaluation on every action (measured ~0.4 s per probe)
                import pandas as _pd

                pdf = _pd.DataFrame(
                    distinct_keys, columns=pk_cols, dtype=object
                )
                keys = spark.createDataFrame(pdf, schema=key_schema)
            except Exception:
                # exotic pk types the arrow path can't convert: the
                # pickled path is slower but always correct
                keys = spark.createDataFrame(distinct_keys, schema=key_schema)
        else:
            touched = sorted(
                r["b"]
                for r in keys.select(self._bucket_expr(pk_cols, n).alias("b"))
                .distinct()
                .collect()
            )
        target = self._read_buckets(spark, m, touched)
        return target.join(F.broadcast(keys), on=pk_cols, how="left_semi")

    def _prune_delta_seqs(self, m: dict, probes: dict[int, set]) -> dict:
        """MoR probe pruning: drop pending delta seqs whose recorded
        per-pk-column ranges (delta_stats, harvested from the delta files'
        parquet footers at commit) cannot contain any probed key tuple of
        that bucket — the resolve window then runs over only the
        OVERLAPPING deltas.  *probes* maps bucket → set of pk-value TUPLES
        (one slot per pk column, in ``m["pk"]`` order); a composite-PK
        probe prunes on the CONJUNCTION of the per-column ranges, so a
        delta matching the leading column but not a later one is still
        skipped.  Missing stats (legacy commits, non-orderable pk types,
        NULL probe slots) stay conservative: the seq is read.  Returns a
        shallow-copied manifest; on tables without pending deltas this is
        a no-op."""
        bd = m.get("bucket_deltas", {})
        ds = m.get("delta_stats", {})
        if not any(bd.values()) or not ds:
            return m
        pk_cols = m["pk"]

        def contained(st, key: tuple) -> bool:
            if isinstance(st, list):  # legacy format: leading-pk [lo, hi]
                return key[0] is None or st[0] <= key[0] <= st[1]
            for i, c in enumerate(pk_cols):
                rng = st.get(c)
                if rng is None or key[i] is None:
                    continue  # no stats / NULL probe slot: can't exclude
                if not (rng[0] <= key[i] <= rng[1]):
                    return False
            return True

        pruned: dict[str, list[int]] = {}
        for b_str, seqs in bd.items():
            b = int(b_str)
            if b not in probes:
                pruned[b_str] = seqs  # bucket not probed; never read anyway
                continue
            keys = probes[b]
            keep = []
            for s in seqs:
                st = ds.get(str(s), {}).get(b_str)
                if st is None or any(contained(st, k) for k in keys):
                    keep.append(s)
            pruned[b_str] = keep
        m2 = dict(m)
        m2["bucket_deltas"] = pruned
        return m2

    @staticmethod
    def _gc_delta_stats(m: dict) -> None:
        """Drop delta_stats entries for seqs no bucket's pending list
        references anymore (folded by compaction/overwrite/rebucket)."""
        live = {s for seqs in m.get("bucket_deltas", {}).values() for s in seqs}
        ds = m.get("delta_stats")
        if not ds:
            m.pop("delta_stats", None)
            return
        for s in list(ds):
            if int(s) not in live:
                del ds[s]
        if not ds:
            m.pop("delta_stats", None)

    def _state_at(self, entry: dict) -> dict:
        """Reconstruct a read-state manifest from a commit-log entry.  Keys
        are taken from the ENTRY alone (plus immutable pk/pk_buckets): a key
        absent at commit time (e.g. bucket_deltas before the first MoR
        merge) must read as absent, not inherit today's value.  The stats
        blocks are dropped — they are version-stamped for the current
        version and the pruning helpers ignore stale ones anyway."""
        base = self.manifest()
        m2 = {k: base[k] for k in ("pk", "pk_buckets") if k in base}
        m2.update(
            {k: entry[k] for k in self._HISTORY_STATE_KEYS if k in entry}
        )
        return m2

    def read_at(self, spark: SparkSession, commit: int) -> DataFrame:
        """TIME TRAVEL by commit ordinal: the table as of ``history()[commit]``.

        Works on bucket-pruned tables — ``v=N`` holds only the buckets
        version N rewrote, so the read resolves each bucket through the
        COMMIT'S ``bucket_versions`` snapshot (and, for MoR, its pending
        delta lists), then conforms to the schema AS OF that commit.
        Requires the referenced version/delta directories to still exist:
        :meth:`vacuum`'s ``keep_last`` is the retention knob."""
        h = self.history()
        entry = h[commit]
        m2 = self._state_at(entry)
        if "version" not in entry:
            raise ValueError(f"commit {commit} predates history state snapshots")
        n = m2.get("pk_buckets", 0)
        if n > 0:
            if "bucket_versions" not in m2:
                raise ValueError(
                    f"commit {commit} predates history state snapshots"
                )
            # fail loudly on vacuumed state: a missing BUCKET dir just means
            # the bucket was empty, but a missing VERSION dir means vacuum
            # collected it (the read would silently come back partial/empty)
            gone = sorted(
                v
                for v in {int(x) for x in m2["bucket_versions"].values()}
                if not (self.root / f"v={v}").exists()
            )
            # MoR: the commit's pending delta files are part of its state —
            # a compacted+vacuumed seq silently missing would read as rows
            # never having been merged (deltas carry deletes/overwrites)
            gone_deltas = sorted(
                s
                for s in {
                    s
                    for seqs in m2.get("bucket_deltas", {}).values()
                    for s in seqs
                }
                if not (self.root / "delta" / f"seq={s}").exists()
            )
            if gone or gone_deltas:
                what = []
                if gone:
                    what.append(f"version(s) {gone}")
                if gone_deltas:
                    what.append(f"delta seq(s) {gone_deltas}")
                raise ValueError(
                    f"commit {commit} references vacuumed {' and '.join(what)}; "
                    "raise vacuum(keep_last=…) to retain deeper time travel"
                )
            df = self._read_buckets(spark, m2, range(n))
        else:
            df = spark.read.parquet(
                str(self.root / f"v={m2.get('data_version', m2['version'])}")
            )
            if BUCKET_COL in df.columns:
                df = df.drop(BUCKET_COL)
        return self._conform(spark, df, m2)

    def source_ts_high(self) -> int:
        """The SOURCE TSO fence this table has applied: max commit_ts
        across all merged batches (0 = snapshot only).  A metadata read."""
        return int(self.manifest().get("source_ts_high", 0) or 0)

    def commit_for_source_ts(self, ts: int) -> int:
        """Largest commit ordinal whose state contains ONLY source
        changes at commit_ts ≤ *ts* — i.e. the last commit whose
        ``source_ts_high`` fence is within the requested one.

        Correctness leans on the consumer's ordering contract (O1-O3:
        changelog files apply in commit-ts order, DDL barriers
        inclusive), which makes ``source_ts_high`` NONDECREASING across
        commits; the scan below still tolerates a plateau (metadata-only
        commits inherit the fence unchanged).  The requested *ts* should
        be a batch boundary the producer actually emitted — between
        fences the table holds the last complete fence ≤ ts, exactly the
        reference's snapshot-at-TSO semantics (the dump and the
        changefeed share one StartTSO fetched by GetCurrentTSO in the
        reference's Run, cmd/core.go:183-220).

        Refuses when the fence is INCOMPLETE: any merge that changed
        data without a commit_ts position (flagged at merge time) means
        some commit may contain changes NEWER than its recorded fence —
        resolving would silently serve a torn read while claiming
        consistency, the one failure mode this primitive exists to
        prevent."""
        if self.manifest().get("fence_incomplete"):
            raise ValueError(
                f"table {self.root} applied at least one merge without "
                "commit_ts — its source-TSO fence is incomplete, so a "
                "fenced read could include changes newer than the "
                "requested ts; re-snapshot the table (or replay with "
                "commit_ts) to restore fenced reads"
            )
        best = None
        for i, e in enumerate(self.history()):
            if "version" not in e:
                continue
            if int(e.get("source_ts_high", 0) or 0) <= ts:
                best = i
        if best is None:
            raise ValueError(
                f"no commit of {self.root} is at or before source ts {ts} "
                "(the initial load itself is past the fence)"
            )
        return best

    def read_as_of_source_ts(self, spark: SparkSession, ts: int) -> DataFrame:
        """TIME TRAVEL by SOURCE TSO: the table as of the last applied
        batch whose max commit_ts ≤ *ts* (see commit_for_source_ts).
        Same retention requirements as :meth:`read_at`."""
        return self.read_at(spark, self.commit_for_source_ts(ts))

    def _read_state(self, spark: SparkSession, m: dict) -> DataFrame:
        """Read the table as described by a GIVEN manifest dict — the
        single source of truth for what "the table's data" means.  Having
        a pinned-manifest read lets callers (seeding a maintained
        aggregate, read_at) work against one consistent snapshot instead
        of re-reading the manifest mid-plan.  Plain tables resolve their
        data through ``data_version`` (which `restore` re-points without
        moving data); bucketed tables through ``bucket_versions``."""
        n_buckets = m.get("pk_buckets", 0)
        if n_buckets > 0:
            df = self._read_buckets(spark, m, range(n_buckets))
        else:
            v = m.get("data_version", m["version"])
            df = spark.read.parquet(str(self.root / f"v={v}"))
            if BUCKET_COL in df.columns:
                df = df.drop(BUCKET_COL)
        return self._conform(spark, df, m)

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.manifest()
        n_buckets = m.get("pk_buckets", 0)
        if version is None or version == m["version"]:
            # current state (version == current must NOT read the raw v=N
            # dir: on a bucketed table that dir holds only the buckets the
            # last commit rewrote)
            return self._read_state(spark, m)
        if n_buckets > 0:
            # bucketed time travel: v=N is partial by design (only the
            # buckets N rewrote); resolve through the LAST commit at that
            # version, whose bucket_versions map is the complete state
            h = self.history()
            for i in range(len(h) - 1, -1, -1):
                e = h[i]
                if e.get("version") == version and "bucket_versions" in e:
                    return self.read_at(spark, i)
            raise ValueError(
                f"no commit-log state for version {version}; bucketed "
                "time travel needs a history entry with bucket_versions"
            )
        df = spark.read.parquet(str(self.root / f"v={version}"))
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        return self._conform(spark, df, m)

    # -- maintenance ------------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop version directories no bucket references and older than the
        newest *keep_last* full versions, plus delta directories no bucket's
        pending list references (folded by compaction, or orphaned by a
        crash between delta write and manifest commit).

        ``keep_last`` is also the TIME-TRAVEL retention window: any version
        a retained commit's ``bucket_versions`` snapshot references is kept,
        so :meth:`read_at` works for every commit whose version is within
        the window.  (MoR delta directories are retained only while a
        bucket's CURRENT pending list references them — compaction bounds
        MoR time travel, the same trade Delta makes with deletion vectors.)"""
        m = self.manifest()
        current = m["version"]
        referenced = {int(v) for v in m.get("bucket_versions", {}).values()}
        if "data_version" in m:
            referenced.add(int(m["data_version"]))
        for e in self.history():
            if e.get("version", 0) > current - keep_last:
                referenced |= {
                    int(v) for v in e.get("bucket_versions", {}).values()
                }
                if "data_version" in e:
                    referenced.add(int(e["data_version"]))
        removed = []
        for p in sorted(self.root.glob("v=*")):
            v = int(p.name.split("=", 1)[1])
            if v <= current - keep_last and v not in referenced:
                shutil.rmtree(p)
                removed.append(v)
        live_seqs = {s for seqs in m.get("bucket_deltas", {}).values() for s in seqs}
        for p in sorted(self.root.glob("delta/seq=*")):
            s = int(p.name.split("=", 1)[1])
            # seqs above delta_seq belong to an in-flight (uncommitted)
            # merge — never collect those out from under it
            if s not in live_seqs and s <= m.get("delta_seq", 0):
                shutil.rmtree(p)
        return removed

    def count_rows(self, spark: SparkSession | None = None) -> int:
        """COUNT(*) from parquet footer metadata — a driver-side walk of
        the live data files summing ``num_rows`` (O(files), zero Spark
        jobs, no data bytes read): the warehouse metadata-count fast
        path.  Exact for CoW state; MoR tables with pending deltas fall
        back to the resolving read (delta rows carry deletes and
        overwrites that footers cannot see) — which needs *spark*."""
        import pyarrow.parquet as _pq

        m = self.manifest()
        if any(m.get("bucket_deltas", {}).values()):
            if spark is None:
                raise ValueError("pending MoR deltas: pass spark for a resolving count")
            return self.read(spark).count()
        n = m.get("pk_buckets", 0)
        total = 0
        if n > 0:
            for b in range(n):
                p = self.root / f"v={m['bucket_versions'][str(b)]}" / f"{BUCKET_COL}={b}"
                for f in p.glob("*.parquet") if p.exists() else ():
                    total += _pq.ParquetFile(str(f)).metadata.num_rows
        else:
            vdir = self.root / f"v={m.get('data_version', m['version'])}"
            for f in vdir.rglob("*.parquet"):
                total += _pq.ParquetFile(str(f)).metadata.num_rows
        return total

    def rebucket(self, spark: SparkSession, new_buckets: int) -> int:
        """Change the PK bucket count — the one layout decision fixed at
        create time.  Necessarily a full rewrite (every row's bucket
        assignment changes), committed as one atomic version swap: readers
        never observe a half-rebucketed table, and a crash leaves the old
        layout live.  Run it like compaction — out-of-band of a live
        consumer — when the table outgrows ~25 GB/bucket or shrank far
        below it."""
        if new_buckets <= 0:
            raise ValueError("new_buckets must be positive")
        m = self.manifest()
        df = self.read(spark)
        new_version = m["version"] + 1
        self._write_version_data(df, new_version, m["pk"], new_buckets)
        m["version"] = new_version
        m["pk_buckets"] = new_buckets
        m["bucket_versions"] = {str(b): new_version for b in range(new_buckets)}
        if m.get("bucket_deltas") is not None:
            m["bucket_deltas"] = {}  # read() resolved them into the rewrite
            self._gc_delta_stats(m)
        # a previously-plain table resolves data through bucket_versions
        # from here on; a stale data_version key would pin the old full-
        # copy v= directory in vacuum()'s referenced set forever
        m.pop("data_version", None)
        self._commit(m, action="rebucket")
        return new_version

    def restore(self, commit: int) -> int:
        """ROLL BACK to ``history()[commit]`` as a NEW commit (Delta
        RESTORE parity) — metadata-only: the manifest re-points at the
        historical bucket_versions/schema/delta state, no data moves, and
        the rollback is itself an auditable history entry (restoring
        forward to the pre-restore state works the same way).  Requires
        the referenced version directories to still exist (vacuum
        retention, same contract as :meth:`read_at`).

        The change feed does NOT emit rows for a restore (Delta parity):
        the feed describes forward merges; consumers that must follow a
        rollback re-seed, exactly as they would after any out-of-band
        rewrite.  ``cdf_seq`` is preserved so post-restore merges keep
        appending to the feed without seq collisions."""
        h = self.history()
        entry = h[commit]
        if "version" not in entry:
            raise ValueError(f"commit {commit} predates history state snapshots")
        m2 = self._state_at(entry)
        gone = sorted(
            v
            for v in {int(x) for x in m2.get("bucket_versions", {}).values()}
            | {int(m2.get("data_version", m2["version"]))}
            if not (self.root / f"v={v}").exists()
        )
        gone_deltas = sorted(
            s
            for s in {
                s for seqs in m2.get("bucket_deltas", {}).values() for s in seqs
            }
            if not (self.root / "delta" / f"seq={s}").exists()
        )
        if gone or gone_deltas:
            raise ValueError(
                f"commit {commit} references vacuumed version(s) {gone} / "
                f"delta seq(s) {gone_deltas}; cannot restore past the "
                "vacuum retention window"
            )
        m = self.manifest()
        for k in self._HISTORY_STATE_KEYS:
            if k in m2:
                m[k] = m2[k]
            elif k in m and k not in ("pk", "pk_buckets"):
                del m[k]
        # version must move FORWARD: a restore is a new commit, and reusing
        # the old number would collide with the existing v=N directory on
        # the next merge's v=N+1 write.  The DATA pointers roll back:
        # bucket_versions (copied above) for bucketed tables, data_version
        # for plain ones (entries predating the pointer fall back to their
        # commit version — which was the data version then)
        m["version"] = self.manifest()["version"]
        if m.get("pk_buckets", 0) == 0:
            m["data_version"] = m2.get("data_version", m2["version"])
        if m.get("cdf"):
            m["cdf_seq"] = self.manifest().get("cdf_seq", 0)
        # stats are stamped for the pre-restore version; readers ignore
        # stale ones, but drop them to keep the manifest honest
        m.pop("file_stats", None)
        m.pop("bloom_stats", None)
        self._commit(m, action="restore")
        return m["version"]

    def vacuum_changes(self, keep_since: int) -> list[int]:
        """Drop change-feed directories with ``_commit_seq ≤ keep_since``
        (the consumer's checkpointed high-water mark — everything at or
        below it has been processed by every downstream).  Retention is
        caller-driven, like Delta's CDF: the table never decides for its
        consumers.  Directories above the manifest's ``cdf_seq`` are left
        alone — one may belong to an in-flight merge."""
        m = self.manifest()
        hi = min(keep_since, m.get("cdf_seq", 0))
        removed = []
        for p in sorted(self.root.glob("_changes/s=*")):
            s = int(p.name.split("=", 1)[1])
            if s <= hi:
                shutil.rmtree(p)
                removed.append(s)
        return removed

    def compact(
        self,
        spark: SparkSession,
        max_files_per_bucket: int = 4,
        target_bytes: int = 128 << 20,
    ) -> int | None:
        """Bin-pack small files into a new version (Delta OPTIMIZE parity).

        Every merge writes each touched bucket with one file per shuffle
        task, so a long-running CDC stream decays the table into thousands
        of tiny files and scan cost becomes footer/open overhead instead of
        bytes.  Compaction rewrites ONLY the buckets whose file count
        exceeds *max_files_per_bucket* — one shuffle task per touched
        bucket, so each lands as a single file (buckets are sized to stay
        under ``target_bytes``; a bucket that outgrows it should be re-split
        by raising ``pk_buckets``, not packed looser here).  Commit is the
        same atomic manifest swap as merge: readers never observe a
        half-compacted table and a crash leaves the previous version live.
        Returns the new version, or None if nothing needed rewriting."""
        m = self.manifest()
        n = m.get("pk_buckets", 0)
        if n <= 0:
            vdir = self.root / f"v={m.get('data_version', m['version'])}"
            files = list(vdir.rglob("*.parquet"))
            if len(files) <= max_files_per_bucket:
                return None
            total = sum(p.stat().st_size for p in files)
            n_out = int(max(1, -(-total // target_bytes)))
            return self.overwrite(self.read(spark).coalesce(n_out))

        bv = m["bucket_versions"]
        bd = m.get("bucket_deltas", {})
        touched = []
        for b in range(n):
            bdir = self.root / f"v={bv[str(b)]}" / f"{BUCKET_COL}={b}"
            many_files = (
                bdir.exists()
                and len(list(bdir.glob("*.parquet"))) > max_files_per_bucket
            )
            # MoR: pending deltas are the other form of read amplification
            # compaction exists to fold away — any delta-bearing bucket
            # compacts (the rewrite resolves base ∪ deltas via
            # _read_buckets and clears the bucket's delta list)
            if many_files or bd.get(str(b)):
                touched.append(b)
        if not touched:
            return None
        new_version = m["version"] + 1
        out = (
            self._read_buckets(spark, m, touched)
            .withColumn(BUCKET_COL, self._bucket_expr(m["pk"], n))
            .repartition(len(touched), F.col(BUCKET_COL))
        )
        out.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(
            str(self.root / f"v={new_version}")
        )
        m["version"] = new_version
        for b in touched:
            m["bucket_versions"][str(b)] = new_version
            m.get("bucket_deltas", {}).pop(str(b), None)
        self._gc_delta_stats(m)
        self._commit(m, action="compact")
        return new_version

    def cluster_by(self, spark: SparkSession, cols: Sequence[str],
                   target_bytes: int = 128 << 20, zorder: bool = False,
                   zorder_bits: int = 8) -> int:
        """OPTIMIZE … CLUSTER BY parity: rewrite the current version
        range-partitioned + sorted on *cols*, so each output file covers a
        narrow value range.  This is what makes :meth:`analyze` zone maps
        selective — on an unclustered (or PK-hash-bucketed) layout every
        file spans the whole domain and min/max pruning cannot skip
        anything.  Plain tables only: bucketed tables are PK-hash-clustered
        by construction (their pruning lever is ``read_for_keys``;
        within-bucket sort would only tighten parquet row-group stats).

        ``zorder=True`` is OPTIMIZE … ZORDER BY: instead of a lexicographic
        sort (zone maps selective on the FIRST column only), rows order by
        the Morton interleave of per-column quantile cells
        (table.zorder) — each file covers a small hyper-rectangle, so
        :meth:`read_range` / :meth:`read_multi_range` skip files for
        predicates on ANY clustered column."""
        m = self.manifest()
        if m.get("pk_buckets", 0) > 0:
            raise ValueError("cluster_by applies to plain tables; bucketed "
                             "tables are PK-hash-clustered (read_for_keys)")
        df = self.read(spark)
        vdir = self.root / f"v={m.get('data_version', m['version'])}"
        total = sum(p.stat().st_size for p in vdir.rglob("*.parquet")) or 1
        n_out = int(max(1, -(-total // target_bytes)))
        if zorder and len(cols) > 1:
            from .zorder import quantile_boundaries, zorder_value

            bounds = quantile_boundaries(df, cols, bits=zorder_bits)
            z = zorder_value(df, cols, bounds, bits=zorder_bits)
            out = (
                df.withColumn("__zvalue", z)
                .repartitionByRange(n_out, F.col("__zvalue"))
                .sortWithinPartitions("__zvalue")
                .drop("__zvalue")
            )
        else:
            out = df.repartitionByRange(n_out, *[F.col(c) for c in cols]) \
                    .sortWithinPartitions(*cols)
        return self.overwrite(out)

    def analyze(self, spark: SparkSession, cols: Sequence[str]) -> dict:
        """Collect per-file zone maps (min/max of *cols*) for the current
        version into the manifest — one distributed pass grouped by
        ``input_file_name``.  Stats are version-stamped: :meth:`read_range`
        ignores them (conservatively scanning everything) once the table
        moves past the analyzed version.  Values are stored as JSON
        numbers/strings; strings (incl. ISO timestamps) compare
        lexicographically, matching parquet's ordering for our types."""
        m = self.manifest()
        df = self.read(spark).withColumn("__f", F.input_file_name())
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"lo_{c}"), F.max(c).alias(f"hi_{c}")]
        rows = df.groupBy("__f").agg(*aggs).collect()

        def enc(v):
            return v if isinstance(v, (int, float)) and not isinstance(v, bool) else (
                None if v is None else str(v))

        files = {
            r["__f"].replace("file:", ""): {
                c: [enc(r[f"lo_{c}"]), enc(r[f"hi_{c}"])] for c in cols
            }
            for r in rows
        }
        stats = {"version": m["version"], "cols": list(cols), "files": files}
        self.update_meta(file_stats=stats)
        return stats

    def _zone_keep(self, m: dict, col: str, lo, hi) -> list[str] | None:
        """File paths whose [min, max] zone for *col* intersects [lo, hi],
        or None when the stats cannot prune (missing, stale version,
        unanalyzed column, bucketed layout, incomparable probe type)."""
        stats = m.get("file_stats")
        if (
            not stats
            or stats.get("version") != m["version"]
            or col not in stats.get("cols", [])
            or m.get("pk_buckets", 0) > 0
        ):
            return None

        def enc(v):
            return v if isinstance(v, (int, float)) and not isinstance(v, bool) else str(v)

        elo, ehi = enc(lo), enc(hi)
        try:
            return [
                f for f, cs in stats["files"].items()
                if cs[col][0] is not None and not (cs[col][1] < elo or cs[col][0] > ehi)
            ]
        except TypeError:
            # probe type doesn't compare with the stored stats (e.g. Decimal
            # probe vs numeric-JSON stats): pruning is an optimization, so
            # degrade to a full scan instead of failing the query
            return None

    def _read_files_filtered(self, spark: SparkSession, m: dict,
                             keep: list[str] | None, pred) -> DataFrame:
        if keep is None:
            return self.read(spark).filter(pred)
        if not keep:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(m["schema_json"]))
            return spark.createDataFrame([], schema=schema).filter(pred)
        return self._conform(spark, spark.read.parquet(*keep), m).filter(pred)

    # -- bloom file skipping ----------------------------------------------
    _BLOOM_SALT = "b:"

    def analyze_bloom(self, spark: SparkSession, cols: Sequence[str],
                      m_bits: int = 8192) -> dict:
        """Per-file BLOOM FILTERS for equality-probe file skipping — the
        complement of zone maps: min/max prunes *ranges* on clustered
        columns, a bloom prunes *point probes* on any column whose values
        are file-localized (clustered or naturally correlated), with no
        ordering requirement.

        Two md5-derived hash positions per value over ``CAST(col AS
        STRING)``; the per-file distinct position sets (≤ m_bits ints per
        file per column — bounded regardless of row count) aggregate
        distributed, and the driver folds them into m_bits-wide bitsets
        stored base64 in the manifest (1 KiB per file per column at the
        default).  Version-stamped like zone maps: stale stats are
        ignored, never wrong.  String/integer columns only — float and
        timestamp string renderings differ between engines and the probe
        side, and a mismatched rendering would silently disable (though
        never corrupt) the pruning."""
        import base64

        from ..functions.dedup import md5_long

        m = self.manifest()
        if m.get("pk_buckets", 0) > 0:
            raise ValueError("bloom stats apply to plain tables; bucketed "
                             "tables prune by PK hash (read_for_keys)")
        base = self.read(spark)
        dtypes = dict(base.dtypes)
        for c in cols:
            if dtypes[c] not in ("string", "int", "bigint", "smallint", "tinyint", "long"):
                raise ValueError(
                    f"bloom column {c!r} has type {dtypes[c]}; only "
                    "string/integer columns probe reproducibly"
                )
        df = base.withColumn("__f", F.input_file_name())
        aggs = []
        for c in cols:
            s = F.col(c).cast("string")
            h1 = F.pmod(md5_long(s), F.lit(m_bits))
            h2 = F.pmod(md5_long(F.concat(F.lit(self._BLOOM_SALT), s)), F.lit(m_bits))
            aggs += [
                F.collect_set(h1).alias(f"p1_{c}"),
                F.collect_set(h2).alias(f"p2_{c}"),
            ]
        rows = df.groupBy("__f").agg(*aggs).collect()
        files = {}
        for r in rows:
            per_col = {}
            for c in cols:
                bits = bytearray(m_bits // 8)
                for p in list(r[f"p1_{c}"]) + list(r[f"p2_{c}"]):
                    bits[p // 8] |= 1 << (p % 8)
                per_col[c] = base64.b64encode(bytes(bits)).decode()
            files[r["__f"].replace("file:", "")] = per_col
        stats = {
            "version": m["version"], "cols": list(cols),
            "m_bits": m_bits, "files": files,
        }
        self.update_meta(bloom_stats=stats)
        return stats

    def _bloom_keep(self, m: dict, col: str, value) -> list[str] | None:
        """Files whose bloom possibly contains *value* for *col*, or None
        when the stats cannot prune."""
        import base64

        from ..functions.dedup import md5_long_py

        stats = m.get("bloom_stats")
        if (
            not stats
            or stats.get("version") != m["version"]
            or col not in stats.get("cols", [])
            or value is None
        ):
            return None
        m_bits = stats["m_bits"]
        sv = str(value)
        # shared driver-side twin of md5_long(cast(col as string)) —
        # identical for the string/int types analyze_bloom admits
        h1 = md5_long_py(sv) % m_bits
        h2 = md5_long_py(self._BLOOM_SALT + sv) % m_bits
        keep = []
        for f, per_col in stats["files"].items():
            bits = base64.b64decode(per_col[col])
            if bits[h1 // 8] >> (h1 % 8) & 1 and bits[h2 // 8] >> (h2 % 8) & 1:
                keep.append(f)
        return keep

    def read_eq(self, spark: SparkSession, col: str, value) -> DataFrame:
        """Equality read with file skipping: intersect the bloom's
        possibly-contains list with the zone maps' range list (a point is
        the range [v, v]) — either pruner alone helps, together they
        open only files that both admit; the exact predicate still
        applies to whatever is read."""
        m = self.manifest()
        pred = F.col(col) == value
        keep: set[str] | None = None
        for k in (self._bloom_keep(m, col, value), self._zone_keep(m, col, value, value)):
            if k is not None:
                keep = set(k) if keep is None else keep & set(k)
        return self._read_files_filtered(
            spark, m, sorted(keep) if keep is not None else None, pred
        )

    def read_range(self, spark: SparkSession, col: str, lo, hi) -> DataFrame:
        """Range read with zone-map file skipping: open only files whose
        [min, max] for *col* intersects [lo, hi] (missing/stale stats fall
        back to the full file list), then apply the exact residual filter.
        On a clustered table a narrow range touches O(range/total · files)
        files — the driver never even lists the rest."""
        m = self.manifest()
        pred = (F.col(col) >= lo) & (F.col(col) <= hi)
        return self._read_files_filtered(spark, m, self._zone_keep(m, col, lo, hi), pred)

    def read_multi_range(self, spark: SparkSession,
                         ranges: dict[str, tuple]) -> DataFrame:
        """Conjunctive multi-column range read: a file survives only if its
        zone intersects EVERY predicate's range (per-column keep lists
        intersect; a column without usable stats simply cannot prune).
        This is the read-side payoff of z-order clustering — on a
        lexicographic sort only the leading column's list is selective,
        z-order makes every clustered column's list selective at once."""
        m = self.manifest()
        pred = None
        keep: set[str] | None = None
        for col, (lo, hi) in ranges.items():
            p = (F.col(col) >= lo) & (F.col(col) <= hi)
            pred = p if pred is None else (pred & p)
            k = self._zone_keep(m, col, lo, hi)
            if k is not None:
                keep = set(k) if keep is None else keep & set(k)
        if pred is None:
            return self.read(spark)
        return self._read_files_filtered(
            spark, m, sorted(keep) if keep is not None else None, pred
        )

    def update_meta(self, **kv) -> None:
        m = self.manifest()
        m.update(kv)
        self._commit(m, action="update-meta")
