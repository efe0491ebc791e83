"""Export a managed table BACK into the reference staging layout —
cascade replication.

The reference is a one-way pipe: TiCDC staging files → warehouse.  A
CDF-enabled :class:`~..table.managed.ManagedTable` has everything needed
to be a SOURCE again: its snapshot is the staging snapshot, its change
feed is the changelog.  ``export_snapshot`` + ``export_changelog`` emit
the exact layout ``replicate``/:class:`IncrementConsumer` ingest
(snapshot CSVs, versioned ``CDC*.csv`` files, checksummed schema JSONs),
so a second engine instance — or the reference itself — can chain off a
warehouse table: A → warehouse₁ → (export) → warehouse₂.

Consistency contract: export the snapshot at change seq S, then export
changelogs ``since=S`` — the chained consumer folds to exactly the
source table (proven end-to-end in tests/test_cdf.py).  Change rows map
to envelope events as insert→I, update_postimage→U, delete→D (preimages
drop — TiCDC rows carry only the new image), with ``commit_ts =
_commit_seq``: monotonic per key across commits because each commit
holds at most one event per key — the same delivery guarantee TiCDC
gives the reference (sorter.go ordering).

Scale: both exports are single distributed writes (no collect); the
changelog export writes one CSV directory per change commit, sized by
that commit's batch.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schema.table_def import TableCol, TableDefinition
from ..table.managed import CHANGE_TYPE_COL, COMMIT_SEQ_COL, ManagedTable
from .snapshot import write_snapshot_csv


def spark_type_to_tidb(dt: T.DataType) -> tuple[str, str | None, str | None]:
    """(tp, precision, scale) — the inverse of types.tidb_type_to_spark,
    chosen so a round-trip re-maps to the SAME Spark type."""
    if isinstance(dt, T.LongType):
        return "bigint", None, None
    if isinstance(dt, T.IntegerType):
        return "int", "11", None
    if isinstance(dt, T.FloatType):
        return "float", None, None
    if isinstance(dt, T.DoubleType):
        return "double", None, None
    if isinstance(dt, T.DecimalType):
        return "decimal", str(dt.precision), str(dt.scale)
    if isinstance(dt, T.BooleanType):
        return "boolean", None, None
    if isinstance(dt, T.DateType):
        return "date", None, None
    if isinstance(dt, T.TimestampType):
        return "datetime", None, None
    if isinstance(dt, T.BinaryType):
        return "blob", None, None
    if isinstance(dt, T.StringType):
        return "varchar", "255", None
    raise ValueError(f"no staging-layout rendering for Spark type {dt}")


def table_def_from_manifest(
    table: ManagedTable, schema_name: str, table_name: str, version: int = 1
) -> TableDefinition:
    """Render the table's CURRENT manifest schema as a checksummed
    TableDefinition (what the consumer's meta/ directory expects)."""
    import json

    m = table.manifest()
    schema = T.StructType.fromJson(json.loads(m["schema_json"]))
    pk = set(m["pk"])
    cols = []
    for i, fld in enumerate(schema.fields, start=1):
        tp, precision, scale = spark_type_to_tidb(fld.dataType)
        cols.append(
            TableCol(
                id=str(i),
                name=fld.name,
                tp=tp,
                precision=precision or "",
                scale=scale or "",
                is_pk="true" if fld.name in pk else "false",
                nullable="false" if fld.name in pk else "true",
            )
        )
    return TableDefinition(
        schema=schema_name, table=table_name, version=version, columns=cols
    )


def export_snapshot(
    spark: SparkSession,
    table: ManagedTable,
    out_root: str | Path,
    schema_name: str,
    table_name: str,
) -> int:
    """Write the table's current state as staging snapshot CSVs and
    return the change seq it represents (pass it as ``since`` to
    :func:`export_changelog` for a consistent chain)."""
    out = Path(out_root) / "snapshot" / f"{schema_name}.{table_name}.000000001.csv"
    # ONE pinned manifest serves both the snapshot read and the returned
    # seq (the same pattern as MaintainedAggregate.refresh): reading via
    # table.read() would re-read the manifest, so a merge landing between
    # the two would bake its rows into the snapshot while the returned seq
    # causes those changes to be re-exported — idempotent for the chained
    # table's LWW fold, but double-applied into any ± aggregate fed from
    # the exported changelog
    m = table.manifest()
    write_snapshot_csv(table._read_state(spark, m).select(*m["columns"]), str(out))
    return m.get("cdf_seq", 0)


_FLAG_BY_CHANGE = {"insert": "I", "update_postimage": "U", "delete": "D"}


def export_changelog(
    spark: SparkSession,
    table: ManagedTable,
    out_root: str | Path,
    schema_name: str,
    table_name: str,
    since: int = 0,
    until: int | None = None,
    version: int = 1,
    date: str = "2024-01-01",
) -> int:
    """Emit change commits ``(since, until]`` as staging CDC files under
    ``increment/<schema>/<table>/<version>/1/<date>/CDC<seq>.csv`` plus
    the schema JSON the consumer's barrier loop reads.  One file set per
    commit keeps the consumer's per-file ordering identical to the
    original commit order.  Returns the last exported seq."""
    import shutil
    import tempfile

    m = table.manifest()
    hi = m.get("cdf_seq", 0) if until is None else min(until, m.get("cdf_seq", 0))
    root = Path(out_root) / "increment" / schema_name / table_name / str(version)
    table_def_from_manifest(table, schema_name, table_name, version).dump(
        root / "meta"
    )
    payload = m["columns"]
    dest = root / "1" / date
    # CDC paths must be single FILES with strictly ascending indices (the
    # consumer's lister and ordering contract), so each commit's Spark CSV
    # output is moved part-by-part into the next CDC<idx> slots — later
    # commits always get higher indices, preserving commit order for the
    # consumer's serial file application
    idx = 1 + max(
        (
            int(p.stem[3:])
            for p in dest.glob("CDC*.csv")
            if p.is_file() and p.stem[3:].isdigit()
        ),
        default=0,
    )
    for seq in range(since + 1, hi + 1):
        ch = table.changes(spark, since=seq - 1, until=seq).filter(
            F.col(CHANGE_TYPE_COL).isin(*_FLAG_BY_CHANGE)
        )
        flag = F.element_at(
            F.create_map(
                *[F.lit(x) for kv in _FLAG_BY_CHANGE.items() for x in kv]
            ),
            F.col(CHANGE_TYPE_COL),
        )
        out = ch.select(
            flag.alias("flag"),
            F.lit(table_name).alias("tablename"),
            F.lit(schema_name).alias("schemaname"),
            F.col(COMMIT_SEQ_COL).cast("long").alias("commit_ts"),
            *payload,
        )
        tmp = Path(tempfile.mkdtemp(prefix="tidb2dw_export_"))
        write_snapshot_csv(out, str(tmp / "data"))
        dest.mkdir(parents=True, exist_ok=True)
        for p in sorted((tmp / "data").glob("part-*.csv")):
            if p.stat().st_size == 0:
                continue
            shutil.move(str(p), dest / f"CDC{idx:06d}.csv")
            idx += 1
        shutil.rmtree(tmp, ignore_errors=True)
    return hi
