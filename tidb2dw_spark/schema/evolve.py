"""D5/D6 — apply a column diff to a ManagedTable (schema evolution).

The reference rewrites diffs into per-dialect ALTER statements
(snowsql/ddl.go:41-99, redshiftsql/ddl.go:14-69, bigquerysql/ddl.go:35-98,
databrickssql/ddl.go:12-66).  On a copy-on-write Parquet table every
evolution is a projection + version commit, so we support the full action
set — including MODIFY (type change), which two of the four reference
dialects refuse (redshiftsql/ddl.go:54-55, databrickssql/ddl.go:51-52):

    ADD      → lit(default) backfill (default-value rendering parity,
               snowsql/sql.go:68-74)
    DROP     → drop column
    RENAME   → withColumnRenamed
    MODIFY   → cast to the new Spark type

TRUNCATE / DROP TABLE map to ``truncate_table`` / removing the table root;
CREATE TABLE and RENAME TABLE inside a changefeed are rejected exactly like
the reference (snowsql/ddl.go:15-39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .diff import ColumnDiff, DiffAction
from .types import tidb_type_to_spark
from ..table.managed import ManagedTable

# DDL action names the reference's rewriters refuse to propagate
# (snowsql/ddl.go:15-39: CREATE TABLE and RENAME TABLE inside a changefeed
# are errors; supported set is ADD/DROP/MODIFY/RENAME COLUMN, TRUNCATE,
# DROP TABLE, DROP SCHEMA)
REJECTED_DDL_ACTIONS = {"create-table", "rename-table"}
SUPPORTED_DDL_ACTIONS = {
    "add-column",
    "drop-column",
    "modify-column",
    "rename-column",
    "truncate-table",
    "drop-table",
    "drop-schema",
}


class UnsupportedDDLError(ValueError):
    pass


def guard_ddl_action(action: str) -> None:
    """Reject-path parity with the reference's DDL rewriters."""
    if action in REJECTED_DDL_ACTIONS:
        raise UnsupportedDDLError(
            f"DDL action {action!r} cannot be replicated through a changefeed "
            "(reference snowsql/ddl.go:15-39 parity)"
        )
    if action not in SUPPORTED_DDL_ACTIONS:
        raise UnsupportedDDLError(f"unknown DDL action {action!r}")


def project_column_diffs(df: DataFrame, diffs: list[ColumnDiff]) -> DataFrame:
    """Pure-DataFrame evolution: returns *df* reshaped to the new schema."""
    out = df
    final_order: list[str] = []
    for d in diffs:
        if d.action == DiffAction.UNCHANGE:
            final_order.append(d.curr.name)
        elif d.action == DiffAction.RENAME:
            out = out.withColumnRenamed(d.prev.name, d.curr.name)
            final_order.append(d.curr.name)
        elif d.action == DiffAction.MODIFY:
            new_type = tidb_type_to_spark(d.curr.tp, d.curr.precision, d.curr.scale)
            out = out.withColumn(d.curr.name, F.col(d.curr.name).cast(new_type))
            final_order.append(d.curr.name)
        elif d.action == DiffAction.ADD:
            new_type = tidb_type_to_spark(d.curr.tp, d.curr.precision, d.curr.scale)
            default = F.lit(d.curr.default).cast(new_type) if d.curr.default is not None else F.lit(None).cast(new_type)
            out = out.withColumn(d.curr.name, default)
            final_order.append(d.curr.name)
        elif d.action == DiffAction.DROP:
            out = out.drop(d.prev.name)
    return out.select(*final_order)


def apply_column_diffs(
    spark: SparkSession,
    table: ManagedTable,
    diffs: list[ColumnDiff],
    extra_meta: dict | None = None,
) -> int:
    """Commit the evolved schema — metadata-only when possible.

    ADD and DROP never touch existing cells, so they commit as a pure
    manifest swap (ManagedTable.evolve_schema_metadata_only): reads
    conform old files by materializing added columns' defaults and
    pruning dropped ones.  At 100 TB this keeps a DDL barrier O(1)
    instead of rewriting every bucket inside the consumer loop — the
    same trick Delta/Iceberg use.  RENAME and MODIFY change existing
    data (names/cells in files), so they keep the rewrite path."""
    # a DROP of a primary-key column would leave the manifest 'pk' pointing
    # at a missing column — every later merge/read_for_keys would fail far
    # from the DDL that caused it; reject at the barrier like the
    # reference's unsupported-DDL guard (snowsql/ddl.go:15-39)
    pk = set(table.pk_cols())
    dropped_pk = [
        d.prev.name
        for d in diffs
        if d.action == DiffAction.DROP and d.prev.name in pk
    ]
    if dropped_pk:
        raise UnsupportedDDLError(
            f"DROP of primary-key column(s) {dropped_pk} cannot be replicated"
        )
    if all(d.action == DiffAction.UNCHANGE for d in diffs):
        if extra_meta:
            table.update_meta(**extra_meta)
        return table.version()
    # metadata-only fast path — unless an ADD reuses a tombstoned (dropped
    # metadata-only) name: old version directories still physically carry
    # the dropped column, and a by-name conform would resurrect the stale
    # pre-DROP cells instead of the new column's default.  Delta/Iceberg
    # solve this with field IDs; on a by-name layout the rewrite path
    # (which physically drops the column everywhere) is the correct fallback.
    tombstones = set(table.manifest().get("dropped_columns", []))
    add_collides = any(
        d.action == DiffAction.ADD and d.curr.name in tombstones for d in diffs
    )
    if not add_collides and all(
        d.action in (DiffAction.UNCHANGE, DiffAction.ADD, DiffAction.DROP)
        or (d.action == DiffAction.MODIFY and _widening_metadata_ok(table, d))
        for d in diffs
    ):
        return _evolve_metadata_only(table, diffs, extra_meta)
    df = table.read(spark)
    evolved = project_column_diffs(df, diffs)
    # a RENAME of a PK column must follow through to the manifest's key list
    # or every subsequent merge would join on a dropped name
    renames = {
        d.prev.name: d.curr.name for d in diffs if d.action == DiffAction.RENAME
    }
    meta = dict(extra_meta or {})
    # record ADDed columns' defaults even on the rewrite path, so a
    # late-arriving pre-DDL changelog file can still be conformed
    # (streaming.consumer._conform_batch fills exactly these)
    adds = {d.curr.name: d.curr.default for d in diffs if d.action == DiffAction.ADD}
    if adds:
        defaults = dict(table.manifest().get("column_defaults", {}))
        defaults.update(adds)
        meta["column_defaults"] = defaults
    old_pk = table.pk_cols()
    new_pk = [renames.get(c, c) for c in old_pk]
    if new_pk != old_pk:
        meta["pk"] = new_pk
    # a full rewrite physically conforms every file to the new schema, so
    # no stale dropped-column cells survive anywhere — clear the tombstones
    meta["dropped_columns"] = []
    # field-id bookkeeping: ids FOLLOW renames (the reference's rename
    # detection keys on column id, tidbsql/ddl.go:31-45), dropped names
    # leave the map, added names take fresh ids.  When names actually
    # change on a CDF table, the pre-DDL name→id map is appended as a
    # FIELD EPOCH valid through the current cdf_seq — changes() uses it
    # to conform pre-rename change files to post-rename names, which is
    # what lets feed consumers read across the barrier without re-seeding.
    m = table.manifest()
    if "field_ids" in m:
        old_ids = m["field_ids"]
        nxt = m.get("next_field_id", max(old_ids.values(), default=0) + 1)
        new_ids: dict[str, int] = {}
        for c in evolved.columns:
            prev_name = next((o for o, n in renames.items() if n == c), c)
            if prev_name in old_ids:
                new_ids[c] = old_ids[prev_name]
            else:
                new_ids[c] = nxt
                nxt += 1
        meta["field_ids"], meta["next_field_id"] = new_ids, nxt
        # epoch on rename (name moved) OR drop (a later ADD may reuse the
        # name; the feed's old files must not resurrect the dead field)
        map_shrunk = set(old_ids.values()) - set(new_ids.values())
        if (renames or map_shrunk) and m.get("cdf"):
            meta["field_epochs"] = m.get("field_epochs", []) + [
                {"upto_seq": m.get("cdf_seq", 0), "ids": old_ids}
            ]
    return table.overwrite(evolved, new_columns=evolved.columns, extra_meta=meta)


def _lossless_widening(old, new) -> bool:
    """True when every *old*-typed value casts to *new* without loss —
    the warehouse ALTER COLUMN TYPE contract (Snowflake/BigQuery allow
    exactly these as metadata-only)."""
    from pyspark.sql import types as T

    if old == new:
        return True
    ints = [T.ByteType, T.ShortType, T.IntegerType, T.LongType]
    if type(old) in ints and type(new) in ints:
        return ints.index(type(old)) <= ints.index(type(new))
    if isinstance(old, T.FloatType) and isinstance(new, T.DoubleType):
        return True
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        return new.scale == old.scale and new.precision >= old.precision
    return False


def _widening_metadata_ok(table: ManagedTable, d: ColumnDiff) -> bool:
    """A MODIFY can commit metadata-only iff it is a same-name lossless
    type widening of a column whose value never feeds the PK-hash bucket
    layout.  Reads then cast old files up to the manifest type
    (ManagedTable._conform).  The PK exclusion on bucketed tables is
    load-bearing, not conservative: Spark's Murmur3 hashes int32 and
    int64 renderings of the same value DIFFERENTLY, so widening a bucket
    key's type metadata-only would route new batches to different buckets
    than the rows they must merge with — silent duplicate keys.  The
    rewrite path re-buckets everything under the new type instead."""
    import json as _json

    from pyspark.sql import types as T

    from .types import tidb_type_to_spark

    if d.prev.name != d.curr.name:
        return False
    m = table.manifest()
    if m.get("pk_buckets", 0) > 0 and d.curr.name in m.get("pk", []):
        return False
    old_types = {
        f.name: f.dataType
        for f in T.StructType.fromJson(_json.loads(m["schema_json"])).fields
    }
    if d.prev.name not in old_types:
        return False
    try:
        new_type = tidb_type_to_spark(d.curr.tp, d.curr.precision, d.curr.scale)
    except Exception:
        return False
    return _lossless_widening(old_types[d.prev.name], new_type)


def _evolve_metadata_only(
    table: ManagedTable, diffs: list[ColumnDiff], extra_meta: dict | None
) -> int:
    """Build the post-DDL manifest schema: retained columns keep their
    existing manifest field (authoritative types from the data), added
    columns append with their mapped Spark type + rendered default."""
    import json as _json

    from pyspark.sql import types as T

    m = table.manifest()
    existing = {
        f.name: f for f in T.StructType.fromJson(_json.loads(m["schema_json"])).fields
    }
    fields: list[T.StructField] = []
    order: list[str] = []
    defaults: dict[str, str | None] = {}
    dropped: list[str] = []
    for d in diffs:
        if d.action == DiffAction.DROP:
            dropped.append(d.prev.name)
            continue
        name = d.curr.name
        order.append(name)
        if d.action == DiffAction.ADD:
            dtype = tidb_type_to_spark(d.curr.tp, d.curr.precision, d.curr.scale)
            fields.append(T.StructField(name, dtype, True))
            defaults[name] = d.curr.default
        elif d.action == DiffAction.MODIFY:
            # reachable only for lossless widenings (_widening_metadata_ok):
            # the manifest takes the NEW type, reads cast old files up
            dtype = tidb_type_to_spark(d.curr.tp, d.curr.precision, d.curr.scale)
            fields.append(T.StructField(name, dtype, existing[name].nullable))
        else:
            fields.append(existing[name])
    # tombstone metadata-only DROPs: old version dirs still physically
    # carry the column; a later ADD of the same name must take the rewrite
    # path (apply_column_diffs checks this) or stale cells would resurrect
    meta = dict(extra_meta or {})
    if dropped:
        meta["dropped_columns"] = sorted(
            set(m.get("dropped_columns", [])) | set(dropped)
        )
    return table.evolve_schema_metadata_only(
        new_columns=order,
        new_schema_json=T.StructType(fields).json(),
        column_defaults=defaults,
        extra_meta=meta or None,
    )


def truncate_table(spark: SparkSession, table: ManagedTable) -> int:
    """TRUNCATE parity (snowsql/ddl.go truncate path)."""
    df = table.read(spark)
    return table.overwrite(df.limit(0))
