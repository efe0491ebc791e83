"""Commit-log-driven streaming source for a ManagedTable's change feed —
the streaming twin of :meth:`ManagedTable.changes` that RIDES DDL
barriers without re-seeding downstream state.

The raw file-source subscription (``stream_changes``) pins one physical
parquet schema per run: a rewrite-path RENAME or a metadata-only widening
MODIFY leaves older ``_changes/s=N`` files physically incompatible with
the pinned schema, forcing a fresh checkpoint and a downstream re-seed.
The reference's consumer treats DDL as an in-stream barrier it rides
through (increment.go:141-167, 283-329) — that is the core streaming
semantic of the whole system, and batch ``changes()`` already delivers it
by conforming each commit's files BY FIELD ID (managed.py field epochs).

This module delivers the same through Spark's Python Data Source API
(SPARK-44076, the idiomatic Spark 4 vehicle for a custom streaming
source):

- **Offsets are commit sequence numbers** (``{"seq": N}``), not file
  lists: ``latestOffset`` reads the manifest's ``cdf_seq`` — the same
  atomic gate batch readers trust — so a crashed merge's half-written
  directory is never visible, unlike the raw file source.
- **partitions(start, end)** enumerates the ``(start, end]`` commit
  directories DRIVER-side, peeks one parquet footer per commit (no Spark
  job), and emits one InputPartition PER FILE carrying a self-contained
  conformance spec: physical→current column mapping via the manifest's
  field epochs (RENAME/DROP continuity), rendered defaults for columns
  added after the file was written, and the target type per column
  (lossless-widening casts).  A 1000-executor catch-up read therefore
  parallelizes per file with zero driver-side data movement.
- **read(partition)** streams Arrow record batches straight from the
  parquet file through rename → cast → default-fill → reorder, yielding
  batches that match the query's fixed schema.  All columnar, no
  per-row Python.

Schema lifecycle (the part Structured Streaming fixes at query start):
the source pins the manifest state — columns, types, defaults, field
epochs — when the stream STARTS.  Every barrier that predates the start
conforms transparently (that is the un-re-seed contract: a consumer
restarting after any number of RENAME/widening barriers keeps its
checkpointed seq and reads straight across them).  A DDL landing while
the query is RUNNING raises :class:`SchemaEvolvedError` on the next
microbatch — restart the query with the SAME checkpoint to adopt the new
schema; the offset survives, downstream state is never re-seeded.  This
mirrors Delta's CDF streaming contract (fail the query on schema change,
resume from the same checkpoint), which is the honest behavior under
Structured Streaming's fixed-schema model.

Reference parity: pkg/apiservice + sink/cdcsql consume TiCDC's ordered
changelog with in-stream DDL barriers (increment.go:141-167); this is
that consumer, re-expressed as a Spark streaming source over the managed
table's own commit log.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

FORMAT_NAME = "tidb2dw_cdf"
_META_COLS = ("_change_type", "_commit_seq", "_commit_version")


class SchemaEvolvedError(RuntimeError):
    """A DDL barrier landed AFTER this stream pinned its schema: restart
    the query with the SAME checkpoint (offsets are commit seqs; they
    survive) to adopt the evolved schema.  No downstream re-seed."""


def _feed_schema(m: dict) -> StructType:
    schema = StructType.fromJson(json.loads(m["schema_json"]))
    for f in (
        StructField(_META_COLS[0], StringType()),
        StructField(_META_COLS[1], IntegerType()),
        StructField(_META_COLS[2], IntegerType()),
    ):
        schema = schema.add(f)
    return schema


@dataclass
class _CommitFilePartition(InputPartition):
    """One parquet file of one commit directory + everything read() needs
    to conform it — picklable primitives only."""

    path: str
    renames: dict  # physical footer name -> output name (None = drop)
    defaults: dict  # output name -> rendered default (applied if absent)
    schema_json: str  # the query's fixed output schema (Spark JSON)


class CDFStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, planned_schema: StructType | None = None):
        from ..table.managed import ManagedTable

        self.root = Path(options["path"])
        table = ManagedTable(self.root)
        m = table.manifest()
        if not m.get("cdf"):
            raise ValueError(
                "change data feed not enabled on this table (create(cdf=True))"
            )
        # PIN the conformance inputs at stream start: every pre-start
        # barrier conforms; a post-start barrier is detected per commit
        # (see _spec_for) and raises SchemaEvolvedError
        self.columns = list(m["columns"])
        self.schema_json = json.dumps(_feed_schema(m).jsonValue())
        self.defaults = dict(m.get("column_defaults", {}))
        self.field_ids = dict(m.get("field_ids", {}))
        self.epochs = sorted(
            m.get("field_epochs", []), key=lambda e: e["upto_seq"]
        )
        self.pin_seq = m.get("cdf_seq", 0)
        self.start_seq = int(options.get("startingseq", options.get("startingSeq", 0)))
        # the query's schema was fixed at PLANNING (.load() called
        # DataSource.schema()); a DDL landing between planning and start
        # would make this reader conform to a schema the query no longer
        # has — surface the restart contract instead of a per-batch
        # Arrow/catalyst schema error
        if planned_schema is not None and json.dumps(
            planned_schema.jsonValue()
        ) != self.schema_json:
            raise SchemaEvolvedError(
                f"{self.root}: a DDL barrier landed between query planning "
                "and query start; restart the query (same checkpoint) to "
                "adopt the evolved schema"
            )

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        from ..table.managed import ManagedTable

        return {"seq": ManagedTable(self.root).manifest().get("cdf_seq", 0)}

    def commit(self, end: dict) -> None:
        pass

    # -- planning ---------------------------------------------------------
    def _spec_for(self, seq: int, footer) -> dict:
        """physical name → output name for one commit's files, via the
        PINNED field epochs; detects post-pin schema drift — by NAME
        (rename/ADD/DROP) and, for post-pin commits, by TYPE too: a
        metadata-only widening MODIFY changes no names, but its post-DDL
        files store the wider physical type, and casting them down to
        the stale pinned type would narrow (or crash) — that must
        surface as the restart contract, not an executor ArrowInvalid."""
        import pyarrow.parquet as _pq  # noqa: F401 (signature docs)
        from pyspark.sql.pandas.types import to_arrow_schema

        # the epoch index and physical-name→current-name decisions are the
        # SHARED batch/stream conformance semantics — they live in
        # table.managed (cdf_epoch_index / cdf_output_name) so the two
        # surfaces cannot drift
        from ..table.managed import cdf_epoch_index, cdf_output_name

        eidx = cdf_epoch_index(self.epochs, seq)
        id_to_cur = {v: k for k, v in self.field_ids.items()}
        footer_names = list(footer.names)
        target_types = {
            f.name: f.type
            for f in to_arrow_schema(
                StructType.fromJson(json.loads(self.schema_json))
            )
        }
        renames: dict = {}
        for name in footer_names:
            if name in _META_COLS:
                renames[name] = name
                continue
            out = cdf_output_name(
                name, eidx, self.epochs, self.field_ids, id_to_cur
            )
            if out is None:
                renames[name] = None  # dead field: never resurrect
                continue
            if out not in self.columns:
                if seq > self.pin_seq:
                    raise SchemaEvolvedError(
                        f"commit seq {seq} of {self.root} carries column "
                        f"{name!r} unknown to the schema this stream pinned "
                        f"at start (cdf_seq {self.pin_seq}); a DDL barrier "
                        "landed mid-run — restart the query with the SAME "
                        "checkpoint to adopt the evolved schema"
                    )
                renames[name] = None  # pre-pin file of a since-dropped col
                continue
            renames[name] = out
        if seq > self.pin_seq:
            mapped = {v for v in renames.values() if v is not None}
            missing = [c for c in self.columns if c not in mapped]
            if missing:
                raise SchemaEvolvedError(
                    f"commit seq {seq} of {self.root} lacks pinned "
                    f"column(s) {missing}; a DDL barrier landed mid-run — "
                    "restart the query with the SAME checkpoint"
                )
            import pyarrow.types as _pat

            def _width_family(t):
                # widening MODIFYs change integer/float WIDTH; other
                # arrow-type spellings (timestamp tz flavors, string vs
                # large_string) vary by writer without any DDL, so only
                # the numeric families are drift evidence
                if _pat.is_integer(t) or _pat.is_floating(t):
                    return str(t)
                return None

            for name, out in renames.items():
                want = target_types.get(out)
                got = footer.field(name).type
                if (
                    want is not None
                    and _width_family(got) is not None
                    and _width_family(want) is not None
                    and _width_family(got) != _width_family(want)
                ):
                    raise SchemaEvolvedError(
                        f"commit seq {seq} of {self.root} stores column "
                        f"{out!r} as {got}, but this stream pinned {want} "
                        f"at start (cdf_seq {self.pin_seq}); a widening "
                        "MODIFY landed mid-run — restart the query with "
                        "the SAME checkpoint to adopt the wider type"
                    )
        return renames

    def partitions(self, start: dict, end: dict):
        import pyarrow.parquet as _pq

        if "seq" not in start or "seq" not in end:
            raise ValueError(
                f"offset {start!r} is not a commit-log offset: this "
                "checkpoint was written by a DIFFERENT source (e.g. the "
                "file-source stream_changes subscription this source "
                "replaced).  Start the query with a FRESH checkpoint — "
                "safe for derived-state refresh consumers, whose refresh "
                "is idempotent by each object's own applied_seq"
            )
        lo, hi = start["seq"], end["seq"]
        parts: list[_CommitFilePartition] = []
        for s in range(lo + 1, hi + 1):
            p = self.root / "_changes" / f"s={s}"
            if not p.exists():
                raise ValueError(
                    f"change seq {s} was vacuumed (retention passed this "
                    "consumer's checkpoint); re-seed the downstream state"
                )
            files = sorted(p.glob("*.parquet"))
            if not files:  # zero-row commit wrote only _SUCCESS
                continue
            footer = _pq.read_schema(str(files[0]))
            renames = self._spec_for(s, footer)
            for f in files:
                parts.append(
                    _CommitFilePartition(
                        path=str(f),
                        renames=renames,
                        defaults=self.defaults,
                        schema_json=self.schema_json,
                    )
                )
        return parts

    # -- executor-side read ----------------------------------------------
    def read(self, partition: _CommitFilePartition):
        import pyarrow as pa
        import pyarrow.parquet as _pq
        from pyspark.sql.pandas.types import to_arrow_schema

        target = StructType.fromJson(json.loads(partition.schema_json))
        arrow_target = to_arrow_schema(target)
        pf = _pq.ParquetFile(partition.path)
        for batch in pf.iter_batches(batch_size=1 << 16):
            by_out = {}
            for i, name in enumerate(batch.schema.names):
                out = partition.renames.get(name, name)
                if out is not None:
                    by_out[out] = batch.column(i)
            n = batch.num_rows
            arrays = []
            for fld in arrow_target:
                arr = by_out.get(fld.name)
                if arr is None:
                    d = partition.defaults.get(fld.name)
                    if d is None:
                        arr = pa.nulls(n, type=fld.type)
                    else:
                        # rendered default cast to the declared type —
                        # the Arrow twin of _conform's lit(d).cast(dtype)
                        arr = pa.array([d] * n).cast(fld.type)
                elif arr.type != fld.type:
                    # lossless widening (evolve only takes the metadata-
                    # only path for widenings, so the cast cannot
                    # truncate); safe=True still guards the invariant
                    arr = arr.cast(fld.type)
                arrays.append(arr)
            yield pa.RecordBatch.from_arrays(arrays, schema=arrow_target)


class CDFCommitLogDataSource(DataSource):
    """``spark.readStream.format("tidb2dw_cdf").option("path", root)`` —
    register with ``spark.dataSource.register(CDFCommitLogDataSource)``
    (or call :func:`stream_changes_commitlog`, which does both)."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> StructType:
        from ..table.managed import ManagedTable

        return _feed_schema(ManagedTable(Path(self.options["path"])).manifest())

    def streamReader(self, schema: StructType) -> CDFStreamReader:
        return CDFStreamReader(dict(self.options), planned_schema=schema)


def stream_changes_commitlog(
    spark: SparkSession, table, starting_seq: int | None = None
) -> DataFrame:
    """Streaming DataFrame over *table*'s change feed, driven by the
    COMMIT LOG (offsets = commit seqs, conformance by field id) — reads
    straight across every RENAME/widening/ADD/DROP barrier that predates
    the query start, with the same checkpoint surviving restarts.  See
    the module docstring for the mid-run DDL contract."""
    spark.dataSource.register(CDFCommitLogDataSource)
    reader = (
        spark.readStream.format(FORMAT_NAME).option("path", str(table.root))
    )
    if starting_seq is not None:
        reader = reader.option("startingSeq", str(starting_seq))
    return reader.load()
