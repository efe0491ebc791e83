"""Driver-checked end-to-end pipeline replay (S3/S4/S5/S6, O1/O3, D4-D7,
W1, J1-J3, ST4/ST5/S11 in one row).

The reference's whole runtime is: snapshot load, then an ordered multi-file
multi-version changelog consumed through DDL barriers with checkpoint
markers (replicate/increment.go:331-371).  The unit tests cover it; these
two registry entries make the DRIVER's DuckDB gate cover it too:

- ``pipeline_changelog_replay``: stages a deterministic snapshot + CDC
  layout derived from the ``orders`` table (two partition directories with
  adversarial commit_ts ordering, a second table version adding a column),
  replays it through ``IncrementConsumer`` into a PK-bucketed
  ``ManagedTable``, and returns the final table.
- ``pipeline_replay_resume``: same fold, but consumed by TWO consumer
  instances across a simulated restart — the second instance must skip
  checkpoint-marked files, resume from the managed table's persisted
  schema version, and still converge to the same final state.

The oracle recomputes the fold FROM THE SAME STAGED FILES with DuckDB
``read_csv``: per table version, last-writer-wins by (commit_ts,
application order) over the unioned CDC files, anti-join ∪ survivors
against the running state, with the version-2 ADD-column barrier applied
between the folds.  Staging lives under fixed /tmp roots because oracle
SQL strings are static; the Spark callable rewrites the layout from
scratch on every call (the driver always runs the Spark side first), so
the oracle always reads the layout for the scale factor under test.

Fixture timestamps keep per-key commit_ts monotonic across ascending file
indices (TiCDC's delivery guarantee); the adversarial case — an OLDER
commit_ts in a HIGHER-numbered partition directory — is staged explicitly
and must lose.
"""

from __future__ import annotations

import csv
import io
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema.table_def import TableCol, TableDefinition
from .schema.types import table_def_to_struct
from .sources.snapshot import read_snapshot_csv
from .streaming.consumer import IncrementConsumer
from .table.managed import ManagedTable

REPLAY_ROOT = "/tmp/tidb2dw_replay"
RESUME_ROOT = "/tmp/tidb2dw_replay_resume"
MOR_ROOT = "/tmp/tidb2dw_replay_mor"

_SCHEMA, _TABLE = "tpch", "orders_replay"
_PK_BUCKETS = 8


def _def_v1() -> TableDefinition:
    return TableDefinition(
        schema=_SCHEMA, table=_TABLE, version=1,
        columns=[
            TableCol(id="1", name="o_orderkey", tp="bigint", is_pk="true", nullable="false"),
            TableCol(id="2", name="o_custkey", tp="bigint"),
            TableCol(id="3", name="o_orderstatus", tp="varchar", precision="10"),
            TableCol(id="4", name="o_total_cents", tp="bigint"),
        ],
    )


def _def_v2() -> TableDefinition:
    d = _def_v1()
    d.version = 2
    d.query = "ALTER TABLE orders_replay ADD COLUMN o_note varchar(20)"
    d.columns = d.columns + [
        TableCol(id="5", name="o_note", tp="varchar", precision="20")
    ]
    return d


def _fmt(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, str):
        return '"' + v.replace('"', '""') + '"'
    return str(v)


def _write_csv(path: Path, rows: list[tuple]) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    buf = io.StringIO()
    for r in rows:
        buf.write(",".join(_fmt(v) for v in r) + "\n")
    path.write_text(buf.getvalue())


_BASE_TARGET_ROWS = 8_000
_BASE_CACHE: dict[str, list[tuple]] = {}


def _base_rows(spark: SparkSession, sf_dir: str) -> list[tuple]:
    """Deterministic snapshot subset (~≤8k rows at any scale factor).

    The replay verifies ORDERING/FOLD semantics, not scan throughput, so
    the base is capped by widening the key modulus — a pure function of
    the table's row count, and the oracle reads the STAGED FILES, so any
    Spark-side selection keeps both engines identical by construction.
    Memoized per sf_dir: repeated invocations (bench best-of-3) re-stage
    and re-consume the layout but don't re-derive the identical subset."""
    if sf_dir in _BASE_CACHE:
        return _BASE_CACHE[sf_dir]
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    stride = 3 * max(1, int(df.count() // (3 * _BASE_TARGET_ROWS)))
    rows = [
        (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"], r["o_total_cents"])
        for r in df.filter(F.col("o_orderkey") % stride == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("o_total_cents"),
        )
        .collect()
    ]
    rows.sort(key=lambda r: r[0])
    _BASE_CACHE[sf_dir] = rows
    return rows


def _env(flag: str, ts: int, payload: tuple) -> tuple:
    return (flag, _TABLE, _SCHEMA, ts) + payload


def _stage_v1(root: Path, base: list[tuple], extra_p1_file: bool) -> None:
    """Snapshot + version-1 changelog.  Partition 2 carries a STALE update
    to the same keys as partition 1 (older commit_ts, lexically later path)
    — cross-partition last-writer-wins must discard it."""
    _write_csv(root / "snapshot" / f"{_SCHEMA}.{_TABLE}.000000001.csv", base)
    _def_v1().dump(root / "increment" / _SCHEMA / _TABLE / "1" / "meta")

    upd = [r for r in base if r[0] % 21 == 0]
    dels = [r for r in base if r[0] % 33 == 0]
    ins = [r for r in base if r[0] % 30 == 0]

    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "1" / "1" / "2024-01-01" / "CDC000001.csv",
        [_env("U", 10000 + r[0] % 97, (r[0], r[1], "P1", r[3] + 100)) for r in upd],
    )
    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "1" / "1" / "2024-01-01" / "CDC000002.csv",
        [_env("D", 20000 + r[0] % 97, r) for r in dels]
        + [_env("I", 21000 + r[0] % 97, (r[0] + 9000000, r[1], "N1", r[3] + 1)) for r in ins],
    )
    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "1" / "2" / "2024-01-01" / "CDC000001.csv",
        [_env("U", 9000 + r[0] % 97, (r[0], r[1], "STALE", r[3] - 5)) for r in upd],
    )
    if extra_p1_file:
        more = [r for r in base if r[0] % 24 == 0]
        _write_csv(
            root / "increment" / _SCHEMA / _TABLE / "1" / "1" / "2024-01-01" / "CDC000003.csv",
            [_env("U", 22000 + r[0] % 97, (r[0], r[1], "P3", r[3] + 3)) for r in more],
        )


def _stage_v2(root: Path, base: list[tuple]) -> None:
    """Version-2 barrier (ADD o_note) + post-DDL changelog."""
    _def_v2().dump(root / "increment" / _SCHEMA / _TABLE / "2" / "meta")
    v2 = [r for r in base if r[0] % 27 == 0]
    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "2" / "2024-01-02" / "CDC000001.csv",
        [_env("U", 30000 + r[0] % 97, (r[0], r[1], "V2", r[3] + 7, "v2")) for r in v2],
    )


def _load_snapshot(spark: SparkSession, root: Path) -> ManagedTable:
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark,
        f"{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(v1),
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_replay_wh_"))
    return ManagedTable(wh / _TABLE).create(snap, v1.pk_columns, pk_buckets=_PK_BUCKETS)


def pipeline_changelog_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-poll full lifecycle: snapshot load → v1 files (3 files, 2
    partition dirs, adversarial ts) → DDL barrier → v2 file."""
    root = Path(REPLAY_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _stage_v1(root, base, extra_p1_file=False)
    _stage_v2(root, base)
    table = _load_snapshot(spark, root)
    IncrementConsumer(spark, root / "increment", table).poll_once()
    return table.read(spark)


def pipeline_mor_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same single-poll lifecycle as ``pipeline_changelog_replay``,
    consumed into a MERGE-ON-READ table: every poll commits per-bucket
    delta files (no base rewrite — write cost O(batch)), the v1 deltas
    stay pending across the metadata-only ADD barrier, and the read
    resolves last-writer-wins over base ∪ deltas while conforming
    pre-DDL delta files to the evolved schema.  Checked against the SAME
    DuckDB fold oracle as the CoW replay — driver-level proof that the
    MoR read path reproduces the reference's merge semantics exactly."""
    root = Path(MOR_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _stage_v1(root, base, extra_p1_file=False)
    _stage_v2(root, base)
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark,
        f"{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(v1),
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_replay_mor_wh_"))
    table = ManagedTable(wh / _TABLE).create(
        snap, v1.pk_columns, pk_buckets=_PK_BUCKETS, merge_mode="mor"
    )
    IncrementConsumer(spark, root / "increment", table).poll_once()
    assert table.manifest().get("bucket_deltas"), "MoR merge wrote no deltas"
    return table.read(spark)


def pipeline_replay_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restart parity: consumer #1 processes the initial v1 files; new
    files + the v2 barrier arrive; a FRESH consumer #2 (rebuilt state) must
    skip the marker-checkpointed files and converge to the same fold."""
    root = Path(RESUME_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _stage_v1(root, base, extra_p1_file=False)
    table = _load_snapshot(spark, root)
    r1 = IncrementConsumer(spark, root / "increment", table).poll_once()
    assert r1.files_processed == 3, r1

    # late arrivals: one more v1 file + the DDL barrier + a v2 file
    _stage_v1(root, base, extra_p1_file=True)  # rewrites v1 files; markers persist
    _stage_v2(root, base)
    r2 = IncrementConsumer(spark, root / "increment", table).poll_once()
    assert r2.files_skipped == 3 and r2.files_processed == 2 and r2.ddl_applied == 1, r2
    return table.read(spark)


_ENV_COLS = (
    "'flag':'VARCHAR','tablename':'VARCHAR','schemaname':'VARCHAR','commit_ts':'BIGINT'"
)
_V1_COLS = (
    "'o_orderkey':'BIGINT','o_custkey':'BIGINT',"
    "'o_orderstatus':'VARCHAR','o_total_cents':'BIGINT'"
)
_V2_COLS = _V1_COLS + ",'o_note':'VARCHAR'"


def _fold_ctes(root: str) -> str:
    """The shared CTE chain recomputing the consumer fold from the staged
    files: snapshot, per-version winners (w1/w2), and the intermediate
    state after the v1 merge (s1 / s1b = s1 + the ADD-column barrier).

    Application order within a version = lexicographic file path (the
    consumer's (partition, date, index) sort is exactly the path order for
    this layout), used as the commit_ts tiebreaker like FILE_SEQ_COL."""
    return f"""
snap AS (
  SELECT * FROM read_csv('{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv',
    header=false, nullstr='\\N', columns={{{_V1_COLS}}})
),
e1 AS (
  SELECT *, dense_rank() OVER (ORDER BY filename) AS seq
  FROM read_csv('{root}/increment/{_SCHEMA}/{_TABLE}/1/*/*/CDC*.csv',
    header=false, nullstr='\\N', filename=true,
    columns={{{_ENV_COLS},{_V1_COLS}}})
),
w1 AS (
  SELECT * FROM e1
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
    ORDER BY commit_ts DESC, seq DESC, flag DESC) = 1
),
s1 AS (
  SELECT t.* FROM snap t
  WHERE NOT EXISTS (SELECT 1 FROM w1 f WHERE f.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_total_cents
  FROM w1 WHERE flag <> 'D'
),
s1b AS (SELECT *, CAST(NULL AS VARCHAR) AS o_note FROM s1),
e2 AS (
  SELECT *, dense_rank() OVER (ORDER BY filename) AS seq
  FROM read_csv('{root}/increment/{_SCHEMA}/{_TABLE}/2/*/CDC*.csv',
    header=false, nullstr='\\N', filename=true,
    columns={{{_ENV_COLS},{_V2_COLS}}})
),
w2 AS (
  SELECT * FROM e2
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
    ORDER BY commit_ts DESC, seq DESC, flag DESC) = 1
)"""


_FOLD_FINAL = """
SELECT t.* FROM s1b t
WHERE NOT EXISTS (SELECT 1 FROM w2 f WHERE f.o_orderkey = t.o_orderkey)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_total_cents, o_note
FROM w2 WHERE flag <> 'D'
"""


def _fold_oracle(root: str) -> str:
    """DuckDB recomputation of the consumer fold from the staged files."""
    return f"WITH {_fold_ctes(root)}\n{_FOLD_FINAL}"


# ---------------------------------------------------------------------------
# Change-data-feed lifecycle rows: the same staged layout consumed into a
# CDF-enabled table.  Three rows share one consume (memoized per sf_dir —
# deterministic, so order doesn't matter): the change feed itself, an
# incrementally-maintained aggregate fed ONLY by the feed, and a time-travel
# read of the commit before the DDL barrier.
# ---------------------------------------------------------------------------
CDF_ROOT = "/tmp/tidb2dw_replay_cdf"
_CDF_CACHE: dict[str, ManagedTable] = {}


def _cdf_table(spark: SparkSession, sf_dir: str) -> ManagedTable:
    """Stage the replay layout under CDF_ROOT and consume it into a
    PK-bucketed table with the change data feed enabled.  Commits: create
    (v1) → v1-group merge (v2, change seq 1) → metadata-only ADD barrier
    (v2) → v2-group merge (v3, change seq 2)."""
    if sf_dir in _CDF_CACHE:
        return _CDF_CACHE[sf_dir]
    root = Path(CDF_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _stage_v1(root, base, extra_p1_file=False)
    _stage_v2(root, base)
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark,
        f"{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(v1),
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_replay_cdf_wh_"))
    table = ManagedTable(wh / _TABLE).create(
        snap, v1.pk_columns, pk_buckets=_PK_BUCKETS, cdf=True
    )
    IncrementConsumer(spark, root / "increment", table).poll_once()
    assert table.manifest().get("cdf_seq") == 2, table.manifest().get("cdf_seq")
    _CDF_CACHE[sf_dir] = table
    return table


# ---------------------------------------------------------------------------
# Rename-continuity lifecycle row: the SAME consumer replay but the v2 DDL
# barrier is a RENAME (o_orderstatus → o_status).  The returned change feed
# SPANS the barrier un-re-seeded: pre-rename change files surface under the
# post-rename name with their true values (manifest field ids — the
# reference's own rename detection keys on column id, tidbsql/ddl.go:31-45).
# ---------------------------------------------------------------------------
RENAME_ROOT = "/tmp/tidb2dw_replay_rename"
_RENAME_CACHE: dict[str, ManagedTable] = {}


def _def_v2_rename() -> TableDefinition:
    d = _def_v1()
    d.version = 2
    d.query = "ALTER TABLE orders_replay RENAME COLUMN o_orderstatus TO o_status"
    cols = list(d.columns)
    cols[2] = TableCol(id="3", name="o_status", tp="varchar", precision="10")
    d.columns = cols
    return d


def _stage_v2_rename(root: Path, base: list[tuple]) -> None:
    """Version-2 RENAME barrier + post-DDL changelog (updates AND deletes
    so both post-rename images and pre-rename preimages flow)."""
    _def_v2_rename().dump(root / "increment" / _SCHEMA / _TABLE / "2" / "meta")
    upd = [r for r in base if r[0] % 27 == 0]
    dels = [r for r in base if r[0] % 36 == 0]
    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "2" / "2024-01-02" / "CDC000001.csv",
        [_env("U", 30000 + r[0] % 97, (r[0], r[1], "R2", r[3] + 7)) for r in upd]
        + [_env("D", 31000 + r[0] % 97, r) for r in dels],
    )


def _rename_cdf_table(spark: SparkSession, sf_dir: str) -> ManagedTable:
    if sf_dir in _RENAME_CACHE:
        return _RENAME_CACHE[sf_dir]
    root = Path(RENAME_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _stage_v1(root, base, extra_p1_file=False)
    _stage_v2_rename(root, base)
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark,
        f"{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(v1),
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_replay_ren_wh_"))
    table = ManagedTable(wh / _TABLE).create(
        snap, v1.pk_columns, pk_buckets=_PK_BUCKETS, cdf=True
    )
    r = IncrementConsumer(spark, root / "increment", table).poll_once()
    assert r.ddl_applied == 1, r
    assert table.manifest().get("cdf_seq") == 2, table.manifest().get("cdf_seq")
    assert table.manifest().get("field_epochs"), "RENAME recorded no field epoch"
    _RENAME_CACHE[sf_dir] = table
    return table


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def _cdfstream_root() -> Path:
    """This process's stream sink/checkpoint root.  The pid suffix
    isolates CONCURRENT processes (gate + bench + pytest on one box);
    so a dir is garbage the moment its pid exits — an atexit hook
    removes ours, and stale siblings whose pid is no longer alive are
    swept on first use (covers processes that died before their own
    atexit ran)."""
    root = Path("/tmp") / f"tidb2dw_cdfstream_{os.getpid()}"
    if not getattr(_cdfstream_root, "_registered", False):
        import atexit

        atexit.register(shutil.rmtree, root, ignore_errors=True)
        for p in Path("/tmp").glob("tidb2dw_cdfstream_*"):
            try:
                pid = int(p.name.rsplit("_", 1)[1])
            except ValueError:
                continue
            if pid != os.getpid() and not _pid_alive(pid):
                shutil.rmtree(p, ignore_errors=True)
        _cdfstream_root._registered = True
    return root


def pipeline_rename_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full change feed ACROSS the rename barrier, through BOTH
    surfaces: batch ``changes()`` AND the commit-log STREAMING source
    (streaming/cdf_source.py — offsets are manifest-gated commit seqs,
    per-commit conformance by field id), each labeled by a ``via``
    column.  Commit-1 rows (written physically as o_orderstatus) and
    commit-2 rows (o_status) surface in ONE conformed frame under the
    current name, every value real — the oracle re-derives all change
    rows relationally from the staged files twice (once per label), so a
    re-seeded/defaulted pre-rename row on EITHER surface breaks the
    hash.  The streamed half is the driver-level proof of the streaming
    DDL-barrier ride the reference consumer performs in-stream
    (increment.go:141-167, 283-329)."""
    from .streaming.cdf_source import stream_changes_commitlog

    table = _rename_cdf_table(spark, sf_dir)
    batch = table.changes(spark).withColumn("via", F.lit("batch"))
    # fixed per-sf, PER-PROCESS root OVERWRITTEN per call (not mkdtemp):
    # the driver gate and bench invoke this repeatedly, and each drain
    # needs a fresh checkpoint + sink anyway — an abandoned dir per call
    # would accrete a feed copy each time.  The pid suffix keeps
    # CONCURRENT processes (gate + bench + test runs on one box) from
    # rmtree'ing each other's in-flight checkpoint, which surfaced as
    # Spark's "Race while writing batch 0"; _cdfstream_root cleans up
    # at exit and sweeps dirs left by dead pids
    out = _cdfstream_root() / Path(sf_dir).name
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True, exist_ok=True)
    q = (
        stream_changes_commitlog(spark, table)
        .writeStream.format("parquet")
        .option("path", str(out / "data"))
        .option("checkpointLocation", str(out / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(300):
        q.stop()
        raise RuntimeError(
            "commit-log CDF drain did not finish within 300s; reading the "
            "sink now would hash a PARTIAL stream half as a conformance bug"
        )
    streamed = spark.read.parquet(str(out / "data")).withColumn(
        "via", F.lit("stream")
    )
    return batch.unionByName(streamed)


# ---------------------------------------------------------------------------
# MIN/MAX maintained-aggregate row: a changelog that DELETES every group's
# current extremum (the non-self-maintainable case), folded incrementally and
# checked bit-equal against a DuckDB full recompute of the fold.
# ---------------------------------------------------------------------------
MINMAX_ROOT = "/tmp/tidb2dw_replay_minmax"
_MINMAX_CACHE: dict[str, ManagedTable] = {}


def _minmax_table(spark: SparkSession, sf_dir: str) -> ManagedTable:
    """Stage snapshot + ONE adversarial CDC batch: per status group, the
    current-max and current-min rows are DELETED (deterministic argmax /
    argmin over the staged snapshot — the oracle reads the staged files,
    so the chosen keys need no cross-engine tie-break), plus ordinary
    value updates to exercise the insert-side tightening."""
    if sf_dir in _MINMAX_CACHE:
        return _MINMAX_CACHE[sf_dir]
    from collections import defaultdict

    root = Path(MINMAX_ROOT)
    shutil.rmtree(root, ignore_errors=True)
    base = _base_rows(spark, sf_dir)
    _write_csv(root / "snapshot" / f"{_SCHEMA}.{_TABLE}.000000001.csv", base)
    _def_v1().dump(root / "increment" / _SCHEMA / _TABLE / "1" / "meta")
    groups: dict = defaultdict(list)
    for r in base:
        groups[r[2]].append(r)
    extremum_keys: set = set()
    evs, ts = [], 50_000
    for st in sorted(groups):
        rows = groups[st]
        mx = max(rows, key=lambda r: (r[3], -r[0]))
        mn = min(rows, key=lambda r: (r[3], r[0]))
        for victim in ({mx[0]: mx, mn[0]: mn}).values():
            evs.append(_env("D", ts, victim))
            extremum_keys.add(victim[0])
            ts += 1
    upd = [r for r in base if r[0] % 40 == 0 and r[0] not in extremum_keys]
    evs += [
        _env("U", ts + i, (r[0], r[1], r[2], r[3] + 13)) for i, r in enumerate(upd)
    ]
    _write_csv(
        root / "increment" / _SCHEMA / _TABLE / "1" / "1" / "2024-01-03" / "CDC000001.csv",
        evs,
    )
    v1 = _def_v1()
    snap = read_snapshot_csv(
        spark,
        f"{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(v1),
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_replay_mm_wh_"))
    table = ManagedTable(wh / _TABLE).create(
        snap, v1.pk_columns, pk_buckets=_PK_BUCKETS, cdf=True
    )
    IncrementConsumer(spark, root / "increment", table).poll_once()
    assert table.manifest().get("cdf_seq") == 1, table.manifest().get("cdf_seq")
    _MINMAX_CACHE[sf_dir] = table
    return table


_MM_GROUP = ["o_orderstatus"]
_MM_SUM = {"total_cents": "o_total_cents"}
_MM_MIN = {"min_cents": "o_total_cents"}
_MM_MAX = {"max_cents": "o_total_cents"}


def pipeline_incremental_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX maintenance across an extremum-deleting batch: seed from
    the SNAPSHOT, fold ONLY the change feed (the deletes dirty every
    group, forcing the group-pruned base rescan), and match the oracle's
    full recompute bit-for-bit."""
    from .operators.matview import apply_changes_to_agg, init_agg

    table = _minmax_table(spark, sf_dir)
    snap = read_snapshot_csv(
        spark,
        f"{MINMAX_ROOT}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(_def_v1()),
    )
    seed = init_agg(snap, _MM_GROUP, _MM_SUM, _MM_MIN, _MM_MAX)
    return apply_changes_to_agg(
        seed,
        table.changes(spark),
        _MM_GROUP,
        _MM_SUM,
        _MM_MIN,
        _MM_MAX,
        base=table.read(spark),
    )


def _minmax_oracle(root: str) -> str:
    """Full recompute of the maintained min/max aggregate over the fold
    of the staged snapshot + extremum-deleting batch."""
    return f"""
WITH snap AS (
  SELECT * FROM read_csv('{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv',
    header=false, nullstr='\\N', columns={{{_V1_COLS}}})
),
e1 AS (
  SELECT *, dense_rank() OVER (ORDER BY filename) AS seq
  FROM read_csv('{root}/increment/{_SCHEMA}/{_TABLE}/1/*/*/CDC*.csv',
    header=false, nullstr='\\N', filename=true,
    columns={{{_ENV_COLS},{_V1_COLS}}})
),
w1 AS (
  SELECT * FROM e1
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
    ORDER BY commit_ts DESC, seq DESC, flag DESC) = 1
),
s1 AS (
  SELECT t.* FROM snap t
  WHERE NOT EXISTS (SELECT 1 FROM w1 f WHERE f.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_total_cents
  FROM w1 WHERE flag <> 'D'
)
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(o_total_cents), 0) AS BIGINT) AS total_cents,
       MIN(o_total_cents) AS min_cents, MAX(o_total_cents) AS max_cents
FROM s1 GROUP BY o_orderstatus
"""


def pipeline_cdf_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full change data feed of the replay: both merge commits' row-level
    insert/update_preimage/update_postimage/delete sets, conformed to the
    final schema.  The oracle re-derives every change row relationally from
    the staged files — including the adversarial deleted-in-v1 keys whose
    v2 'U' events must classify as INSERTS (no pre-image)."""
    table = _cdf_table(spark, sf_dir)
    return table.changes(spark)


def pipeline_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance: seed per-status (count, cents) from
    the SNAPSHOT, then fold in ONLY the change feed — the final table is
    never read.  Matching the oracle's full recompute over the fold proves
    the O(changes) maintenance path reproduces the O(table) rescan."""
    from .operators.matview import apply_changes_to_agg, init_agg

    table = _cdf_table(spark, sf_dir)
    snap = read_snapshot_csv(
        spark,
        f"{CDF_ROOT}/snapshot/{_SCHEMA}.{_TABLE}.*.csv",
        table_def_to_struct(_def_v1()),
    )
    seed = init_agg(snap, ["o_orderstatus"], {"total_cents": "o_total_cents"})
    return apply_changes_to_agg(
        seed, table.changes(spark), ["o_orderstatus"], {"total_cents": "o_total_cents"}
    )


def pipeline_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel on a bucket-pruned table: read the state as of the FIRST
    merge commit (after the v1 fold, before the ADD barrier) via its
    commit-log bucket_versions snapshot — v=2 alone holds only the buckets
    that merge rewrote, so the read must resolve untouched buckets to v=1.
    The result carries the v1 schema (no o_note)."""
    table = _cdf_table(spark, sf_dir)
    first_merge = next(
        i for i, e in enumerate(table.history()) if e["action"] == "merge"
    )
    return table.read_at(spark, first_merge)


def _cdf_changes_oracle(root: str) -> str:
    """Every change row of both merge commits, classified by pre-image
    presence (snap for commit 1, the post-v1 fold for commit 2)."""
    payload1 = "w.o_orderkey, w.o_custkey, w.o_orderstatus, w.o_total_cents"
    pre1 = "s.o_orderkey, s.o_custkey, s.o_orderstatus, s.o_total_cents"
    return f"""
WITH {_fold_ctes(root)}
SELECT {payload1}, CAST(NULL AS VARCHAR) AS o_note,
       'insert' AS _change_type, 1 AS _commit_seq, 2 AS _commit_version
FROM w1 w WHERE w.flag <> 'D'
  AND NOT EXISTS (SELECT 1 FROM snap s WHERE s.o_orderkey = w.o_orderkey)
UNION ALL
SELECT {pre1}, CAST(NULL AS VARCHAR), 'update_preimage', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {payload1}, CAST(NULL AS VARCHAR), 'update_postimage', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pre1}, CAST(NULL AS VARCHAR), 'delete', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag = 'D'
UNION ALL
SELECT w.o_orderkey, w.o_custkey, w.o_orderstatus, w.o_total_cents, w.o_note,
       'insert', 2, 3
FROM w2 w WHERE w.flag <> 'D'
  AND NOT EXISTS (SELECT 1 FROM s1b s WHERE s.o_orderkey = w.o_orderkey)
UNION ALL
SELECT {pre1}, s.o_note, 'update_preimage', 2, 3
FROM w2 w JOIN s1b s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT w.o_orderkey, w.o_custkey, w.o_orderstatus, w.o_total_cents, w.o_note,
       'update_postimage', 2, 3
FROM w2 w JOIN s1b s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pre1}, s.o_note, 'delete', 2, 3
FROM w2 w JOIN s1b s ON s.o_orderkey = w.o_orderkey WHERE w.flag = 'D'
"""


_V2R_COLS = (
    "'o_orderkey':'BIGINT','o_custkey':'BIGINT',"
    "'o_status':'VARCHAR','o_total_cents':'BIGINT'"
)


def _rename_changes_oracle(root: str) -> str:
    """Every change row of both merge commits around the RENAME barrier,
    all under the post-rename name with true values: commit 1 classified
    against the snapshot (o_orderstatus aliased to o_status), commit 2
    against the post-v1 fold.  Commit versions: create=1, v1 merge=2,
    rename rewrite=3, v2 merge=4."""
    pay1 = "w.o_orderkey, w.o_custkey, w.o_orderstatus AS o_status, w.o_total_cents"
    pre1 = "s.o_orderkey, s.o_custkey, s.o_orderstatus AS o_status, s.o_total_cents"
    pay2 = "w.o_orderkey, w.o_custkey, w.o_status, w.o_total_cents"
    pre2 = "s.o_orderkey, s.o_custkey, s.o_status, s.o_total_cents"
    return f"""
WITH snap AS (
  SELECT * FROM read_csv('{root}/snapshot/{_SCHEMA}.{_TABLE}.*.csv',
    header=false, nullstr='\\N', columns={{{_V1_COLS}}})
),
e1 AS (
  SELECT *, dense_rank() OVER (ORDER BY filename) AS seq
  FROM read_csv('{root}/increment/{_SCHEMA}/{_TABLE}/1/*/*/CDC*.csv',
    header=false, nullstr='\\N', filename=true,
    columns={{{_ENV_COLS},{_V1_COLS}}})
),
w1 AS (
  SELECT * FROM e1
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
    ORDER BY commit_ts DESC, seq DESC, flag DESC) = 1
),
s1 AS (
  SELECT t.o_orderkey, t.o_custkey, t.o_orderstatus AS o_status, t.o_total_cents
  FROM snap t
  WHERE NOT EXISTS (SELECT 1 FROM w1 f WHERE f.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_total_cents
  FROM w1 WHERE flag <> 'D'
),
e2 AS (
  SELECT *, dense_rank() OVER (ORDER BY filename) AS seq
  FROM read_csv('{root}/increment/{_SCHEMA}/{_TABLE}/2/*/CDC*.csv',
    header=false, nullstr='\\N', filename=true,
    columns={{{_ENV_COLS},{_V2R_COLS}}})
),
w2 AS (
  SELECT * FROM e2
  QUALIFY row_number() OVER (PARTITION BY o_orderkey
    ORDER BY commit_ts DESC, seq DESC, flag DESC) = 1
)
SELECT {pay1}, 'insert' AS _change_type, 1 AS _commit_seq, 2 AS _commit_version
FROM w1 w WHERE w.flag <> 'D'
  AND NOT EXISTS (SELECT 1 FROM snap s WHERE s.o_orderkey = w.o_orderkey)
UNION ALL
SELECT {pre1}, 'update_preimage', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pay1}, 'update_postimage', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pre1}, 'delete', 1, 2
FROM w1 w JOIN snap s ON s.o_orderkey = w.o_orderkey WHERE w.flag = 'D'
UNION ALL
SELECT {pay2}, 'insert', 2, 4
FROM w2 w WHERE w.flag <> 'D'
  AND NOT EXISTS (SELECT 1 FROM s1 s WHERE s.o_orderkey = w.o_orderkey)
UNION ALL
SELECT {pre2}, 'update_preimage', 2, 4
FROM w2 w JOIN s1 s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pay2}, 'update_postimage', 2, 4
FROM w2 w JOIN s1 s ON s.o_orderkey = w.o_orderkey WHERE w.flag <> 'D'
UNION ALL
SELECT {pre2}, 'delete', 2, 4
FROM w2 w JOIN s1 s ON s.o_orderkey = w.o_orderkey WHERE w.flag = 'D'
"""


def _incremental_agg_oracle(root: str) -> str:
    """Full recompute of the maintained aggregate over the final fold."""
    return f"""
WITH {_fold_ctes(root)},
fold AS ({_FOLD_FINAL})
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(COALESCE(SUM(o_total_cents), 0) AS BIGINT) AS total_cents
FROM fold GROUP BY o_orderstatus
"""


def _time_travel_oracle(root: str) -> str:
    """The post-v1-merge, pre-DDL state: exactly the s1 CTE."""
    return f"WITH {_fold_ctes(root)}\nSELECT * FROM s1"


_LOOKUP_KEY_MOD = 997


def table_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-pruned point lookup (the read-side payoff of PK bucketing):
    load a deterministic orders subset into a PK-bucketed ManagedTable,
    then ``read_for_keys`` a sparse key set — the scan opens ONLY the
    bucket directories the probe keys hash to (asserted in
    tests/test_consumer.py::test_bucketed_key_lookup_prunes_buckets); the
    oracle recomputes the same rows relationally from the orders view."""
    base = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("o_total_cents"),
        )
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_lookup_wh_"))
    table = ManagedTable(wh / "orders").create(base, ["o_orderkey"], pk_buckets=16)
    keys = (
        spark.range(0, 3_000_000, 3 * _LOOKUP_KEY_MOD)
        .select(F.col("id").alias("o_orderkey"))
    )
    return table.read_for_keys(spark, keys)


POINT_LOOKUP_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_orderstatus,
       CAST(round(o_totalprice * 100) AS BIGINT) AS o_total_cents
FROM orders
WHERE o_orderkey % 3 = 0 AND o_orderkey % {3 * _LOOKUP_KEY_MOD} = 0
  AND o_orderkey < 3000000
"""





# ---------------------------------------------------------------------------
# Secondary-index lifecycle row: build on the base, merge a changelog batch
# through the CDF, refresh the index from the feed, probe by value.
# ---------------------------------------------------------------------------
_INDEX_CUSTKEYS = (7, 11, 23)


def table_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value→PK secondary index over ``o_custkey`` (a NON-key column of a
    PK-bucketed table), maintained from the change data feed: load orders
    into a CDF-enabled table, build the index, apply the standard fixture
    changelog (I/U/D incl. inserted keys), refresh the index from the
    feed alone, then answer three customer probes — each one reads ONE
    value bucket driver-side and chains into bucket-pruned
    ``read_for_keys``.  The oracle recomputes the merge fold relationally
    and filters by the same customers, so a stale index entry (missed
    removal or addition) breaks the hash."""
    from .fixtures import CHANGELOG_SQL, TABLE_PK, register_views
    from .operators.secondary_index import SecondaryIndex

    register_views(spark, sf_dir, ["orders"])
    base = spark.table("orders")
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_ixrow_"))
    table = ManagedTable(wh / "orders").create(
        base, TABLE_PK["orders"], pk_buckets=16, cdf=True
    )
    ix = SecondaryIndex(
        wh / "orders_by_custkey", col="o_custkey",
        pk_cols=TABLE_PK["orders"], n_buckets=8,
    )
    ix.build(spark, table)
    table.merge(spark, spark.sql(CHANGELOG_SQL["orders"]))
    ix.refresh(spark, table)
    out = None
    for ck in _INDEX_CUSTKEYS:
        part = ix.lookup(spark, table, ck)
        out = part if out is None else out.unionByName(part)
    return out


_RANGE_LO, _RANGE_HI = 100, 400
# composite (status, timestamp) range probe: lexicographic [lo, hi] with a
# shared status prefix ≡ date BETWEEN under that status — the reference
# warehouses' SORTKEY probe shape (redshiftsql/sql.go:52-92)
_RANGE_STATUS = "F"
_RANGE_TS_LO, _RANGE_TS_HI = "1995-02-01 00:00:00", "1995-04-30 00:00:00"


def table_index_range_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-layout secondary indexes: value-sorted buckets with
    per-bucket zone maps in the index meta — the managed table's zone-map
    trick applied to the index itself.  Two indexes share the lifecycle
    (build → merge the fixture changelog → refresh from the feed):

    - single INT key over ``o_custkey``, probed BETWEEN [lo, hi];
    - COMPOSITE (``o_orderstatus``, ``o_orderdate``) key — typed-tuple
      boundaries ordered lexicographically — probed with a shared status
      prefix, i.e. a date BETWEEN under status 'F'.

    Both probes read ONLY zone-intersecting value buckets before chaining
    into bucket-pruned ``read_for_keys``; results union with a ``probe``
    discriminator.  The oracle recomputes the merge fold and filters the
    same intervals, so a stale zone map, a missed bucket rewrite, or a
    driver/executor collation mismatch on the tuple order breaks the
    hash."""
    import datetime as _dt

    from .fixtures import CHANGELOG_SQL, TABLE_PK, register_views
    from .operators.secondary_index import SecondaryIndex

    register_views(spark, sf_dir, ["orders"])
    base = spark.table("orders")
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_ixrange_"))
    table = ManagedTable(wh / "orders").create(
        base, TABLE_PK["orders"], pk_buckets=16, cdf=True
    )
    ix = SecondaryIndex(
        wh / "orders_by_custkey_range", col="o_custkey",
        pk_cols=TABLE_PK["orders"], n_buckets=8, layout="range",
    )
    ix.build(spark, table)
    ix2 = SecondaryIndex(
        wh / "orders_by_status_date", col=["o_orderstatus", "o_orderdate"],
        pk_cols=TABLE_PK["orders"], n_buckets=8, layout="range",
    )
    ix2.build(spark, table)
    table.merge(spark, spark.sql(CHANGELOG_SQL["orders"]))
    ix.refresh(spark, table)
    ix2.refresh(spark, table)
    assert len(ix._range_buckets(_RANGE_LO, _RANGE_HI)) < ix.n_buckets or (
        ix.n_buckets <= 1
    )
    lo = (_RANGE_STATUS, _dt.datetime.fromisoformat(_RANGE_TS_LO))
    hi = (_RANGE_STATUS, _dt.datetime.fromisoformat(_RANGE_TS_HI))
    return (
        ix.lookup_range(spark, table, _RANGE_LO, _RANGE_HI)
        .withColumn("probe", F.lit("custkey_int"))
        .unionByName(
            ix2.lookup_range(spark, table, lo, hi)
            .withColumn("probe", F.lit("status_date"))
        )
    )


def _index_range_lookup_oracle() -> str:
    from .fixtures import CHANGELOG_SQL, ORDERS_PAYLOAD

    return f"""
WITH changelog AS ({CHANGELOG_SQL["orders"]}),
final AS (
  SELECT * FROM changelog
  QUALIFY row_number() OVER (
    PARTITION BY o_orderkey ORDER BY commit_ts DESC, flag DESC) = 1
),
merged AS (
  SELECT t.* FROM orders t
  WHERE NOT EXISTS (SELECT 1 FROM final f WHERE f.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT {ORDERS_PAYLOAD} FROM final WHERE flag <> 'D'
)
SELECT m.*, 'custkey_int' AS probe
FROM merged m WHERE o_custkey BETWEEN {_RANGE_LO} AND {_RANGE_HI}
UNION ALL
SELECT m.*, 'status_date' AS probe
FROM merged m
WHERE o_orderstatus = '{_RANGE_STATUS}'
  AND o_orderdate BETWEEN TIMESTAMP '{_RANGE_TS_LO}' AND TIMESTAMP '{_RANGE_TS_HI}'
"""


def _index_lookup_oracle() -> str:
    """Relational recompute of the merge fold, filtered to the probed
    customers — identical to entry_queries._merge_oracle's fold (can't
    import it: entry_queries imports this module)."""
    from .fixtures import CHANGELOG_SQL, ORDERS_PAYLOAD

    keys = ", ".join(str(k) for k in _INDEX_CUSTKEYS)
    return f"""
WITH changelog AS ({CHANGELOG_SQL["orders"]}),
final AS (
  SELECT * FROM changelog
  QUALIFY row_number() OVER (
    PARTITION BY o_orderkey ORDER BY commit_ts DESC, flag DESC) = 1
),
merged AS (
  SELECT t.* FROM orders t
  WHERE NOT EXISTS (SELECT 1 FROM final f WHERE f.o_orderkey = t.o_orderkey)
  UNION ALL
  SELECT {ORDERS_PAYLOAD} FROM final WHERE flag <> 'D'
)
SELECT * FROM merged WHERE o_custkey IN ({keys})
"""


def index_bench_phases(spark: SparkSession, sf_dir: str) -> dict[str, float]:
    """Timed SPLIT of the secondary-index lifecycle for bench.py — the
    composite table_index_lookup row timed build+refresh+probe as one
    number, which let probe-latency regressions hide behind the O(base)
    build.  Three metrics, three cost models:

    - ``index_build``   one-time, O(base table) by design
    - ``index_refresh`` steady-state maintenance, O(changes + touched buckets)
    - ``index_probe``   the serving path, must stay O(1) in table size
                        (one driver-hashed value bucket + pruned base read)

    probe is best-of-3 (it is the latency-sensitive path); build/refresh
    run once (re-creating the table per repeat would measure fixture
    staging, not the index)."""
    import time as _time

    from .fixtures import CHANGELOG_SQL, TABLE_PK, register_views
    from .operators.secondary_index import SecondaryIndex

    register_views(spark, sf_dir, ["orders"])
    base = spark.table("orders")
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_ixbench_"))
    table = ManagedTable(wh / "orders").create(
        base, TABLE_PK["orders"], pk_buckets=16, cdf=True
    )
    ix = SecondaryIndex(
        wh / "orders_by_custkey", col="o_custkey",
        pk_cols=TABLE_PK["orders"], n_buckets=8,
    )
    t0 = _time.perf_counter()
    ix.build(spark, table)
    build_s = _time.perf_counter() - t0
    table.merge(spark, spark.sql(CHANGELOG_SQL["orders"]))
    t0 = _time.perf_counter()
    ix.refresh(spark, table)
    refresh_s = _time.perf_counter() - t0
    probe_s = float("inf")
    for _ in range(3):
        t0 = _time.perf_counter()
        for ck in _INDEX_CUSTKEYS:
            ix.lookup(spark, table, ck).count()
        probe_s = min(probe_s, _time.perf_counter() - t0)
    return {
        "index_build": round(build_s, 3),
        "index_refresh": round(refresh_s, 3),
        "index_probe": round(probe_s, 3),
    }


# ---------------------------------------------------------------------------
# Incremental JOIN-view maintenance row: a revenue-by-(priority, segment)
# rollup over orders ⋈ customer kept fresh from BOTH tables' change feeds
# (operators/join_matview.py — Δ(F⋈D) = ΔF⋈D_old ∪ F_new⋈ΔD with signed
# rows).  Adversarial churn lands on both sides in one refresh window:
# fact deletes + fk-moving updates + inserts onto both live and deleted
# dim keys, dim deletes (danglings appear), segment-moving updates, and
# inserts that ATTACH previously dangling fact rows.  The oracle is a
# full join+group recompute over the churned states — any stale term,
# double-applied slice, or missed dangling breaks the hash.
# ---------------------------------------------------------------------------
_JOINAGG_CACHE: dict[str, object] = {}


def pipeline_incremental_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.join_matview import MaintainedJoinAggregate

    if sf_dir not in _JOINAGG_CACHE:
        cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
        fact_src = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .select(
                "o_orderkey",
                "o_custkey",
                "o_orderpriority",
                cents.alias("cents"),
            )
        )
        dim_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_joinagg_"))
        fact = ManagedTable(wh / "fact").create(
            fact_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        dim = ManagedTable(wh / "dim").create(
            dim_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedJoinAggregate(
            wh / "mv",
            fk_col="o_custkey",
            fact_group_cols=["o_orderpriority"],
            dim_group_cols=["c_mktsegment"],
            sum_cols={"total_cents": "cents"},
        )
        mv.refresh(spark, fact, dim)  # seed from the pre-churn join

        fenv = [
            "flag string, tablename string, schemaname string, "
            "commit_ts long, o_orderkey long, o_custkey long, "
            "o_orderpriority string, cents long"
        ][0]

        def fbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("fact").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority", "cents",
            )

        _ = fenv  # schema doc above; batches derive from the source frame
        f_del = fact_src.filter(F.col("o_orderkey") % 10 == 7)
        f_upd = fact_src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            "o_orderpriority",
            (F.col("cents") + 11).alias("cents"),
        )
        f_ins = fact_src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            (F.col("o_orderkey") % 120 + 1).alias("o_custkey"),
            "o_orderpriority",
            (F.col("cents") + 5).alias("cents"),
        )
        fact.merge(
            spark,
            fbatch(f_del, "D")
            .unionByName(fbatch(f_upd, "U"))
            .unionByName(fbatch(f_ins, "I")),
        )

        def dbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("dim").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "c_custkey", "c_mktsegment",
            )

        d_del = dim_src.filter(F.col("c_custkey") % 10 == 3)
        d_upd = dim_src.filter(F.col("c_custkey") % 10 == 6).select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_X")).alias("c_mktsegment"),
        )
        d_ins = dim_src.filter(F.col("c_custkey") % 20 == 1).select(
            (F.col("c_custkey") + 100000000).alias("c_custkey"),
            F.concat(
                F.lit("NEW_"), (F.col("c_custkey") % 7).cast("string")
            ).alias("c_mktsegment"),
        )
        dim.merge(
            spark,
            dbatch(d_del, "D")
            .unionByName(dbatch(d_upd, "U"))
            .unionByName(dbatch(d_ins, "I")),
        )
        mv.refresh(spark, fact, dim)  # ONE refresh folds both feeds
        _JOINAGG_CACHE[sf_dir] = mv
    mv = _JOINAGG_CACHE[sf_dir]
    return mv.read(spark).select(
        "o_orderpriority", "c_mktsegment", "n_rows", "total_cents"
    )


# ---------------------------------------------------------------------------
# MIN/MAX over the maintained JOIN view: revenue extremes per customer
# segment kept fresh through TWO churn rounds — the second one derived
# from the replica's own post-round-1 state so deletes/updates hit the
# CURRENT extrema and force the dirty-group rescan through the join
# (adds alone only tighten; the rescan path is what this row proves).
# Oracle: DuckDB full join recompute of the doubly-churned state.
# ---------------------------------------------------------------------------
_JOINMM_CACHE: dict[str, object] = {}


def pipeline_join_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.join_matview import MaintainedJoinAggregate

    if sf_dir not in _JOINMM_CACHE:
        cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
        fact_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", cents.alias("cents")
        )
        dim_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_joinmm_"))
        fact = ManagedTable(wh / "fact").create(
            fact_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        dim = ManagedTable(wh / "dim").create(
            dim_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedJoinAggregate(
            wh / "mv",
            fk_col="o_custkey",
            fact_group_cols=[],
            dim_group_cols=["c_mktsegment"],
            sum_cols={"total_cents": "cents"},
            min_cols={"min_cents": "cents"},
            max_cols={"max_cents": "cents"},
        )
        mv.refresh(spark, fact, dim)  # seed

        def fbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("fact").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "cents",
            )

        # round 1: the standard modular churn on both feeds
        f_del = fact_src.filter(F.col("o_orderkey") % 10 == 7)
        f_upd = fact_src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            (F.col("cents") + 11).alias("cents"),
        )
        f_ins = fact_src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            (F.col("o_orderkey") % 120 + 1).alias("o_custkey"),
            (F.col("cents") + 5).alias("cents"),
        )
        fact.merge(
            spark,
            fbatch(f_del, "D")
            .unionByName(fbatch(f_upd, "U"))
            .unionByName(fbatch(f_ins, "I")),
        )

        def dbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("dim").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "c_custkey", "c_mktsegment",
            )

        d_del = dim_src.filter(F.col("c_custkey") % 10 == 3)
        d_upd = dim_src.filter(F.col("c_custkey") % 10 == 6).select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_X")).alias("c_mktsegment"),
        )
        dim.merge(spark, dbatch(d_del, "D").unionByName(dbatch(d_upd, "U")))
        mv.refresh(spark, fact, dim)

        # round 2 derives from the replica's CURRENT state, so the
        # deletes remove rows holding the refreshed extrema and the
        # cents cuts undercut stored minima group-wide
        cur = fact.read(spark)
        f2_del = cur.filter(F.col("o_orderkey") % 7 == 5)
        f2_upd = cur.filter(
            (F.col("o_orderkey") % 7 != 5) & (F.col("o_orderkey") % 9 == 2)
        ).select(
            "o_orderkey", "o_custkey", (F.col("cents") - 17).alias("cents")
        )
        fact.merge(
            spark, fbatch(f2_del, "D").unionByName(fbatch(f2_upd, "U"))
        )
        mv.refresh(spark, fact, dim)
        _JOINMM_CACHE[sf_dir] = mv
    mv = _JOINMM_CACHE[sf_dir]
    return mv.read(spark).select(
        "c_mktsegment", "n_rows", "total_cents", "min_cents", "max_cents"
    )


_JOINMM_ORACLE = """
WITH fact1 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN (o_custkey % 50) + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 10 = 4
              THEN CAST(round(o_totalprice * 100.0) AS BIGINT) + 11
              ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, (o_orderkey % 120) + 1,
         CAST(round(o_totalprice * 100.0) AS BIGINT) + 5
  FROM orders WHERE o_orderkey % 25 = 3
), fact2 AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 9 = 2 THEN cents - 17 ELSE cents END AS cents
  FROM fact1 WHERE o_orderkey % 7 <> 5
), dim2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 6 THEN c_mktsegment || '_X'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 10 <> 3
)
SELECT d.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.cents) AS BIGINT) AS total_cents,
       CAST(MIN(f.cents) AS BIGINT) AS min_cents,
       CAST(MAX(f.cents) AS BIGINT) AS max_cents
FROM fact2 f JOIN dim2 d ON f.o_custkey = d.c_custkey
GROUP BY d.c_mktsegment
"""


# ---------------------------------------------------------------------------
# TPC-H Q1 as a MAINTAINED view: the canonical pricing-summary rollup
# (sums, counts, and exact integer-division averages per
# returnflag/linestatus, WHERE shipdate <= cutoff) kept fresh through
# churn whose shipdate pushes move rows ACROSS the predicate boundary —
# a filtered maintained view must fold an update as a one-sided
# remove/add when only the WHERE verdict changes.  Measures are
# integer-quantized at ingest (cents, discount/tax in hundredths;
# disc_price/charge as exact integer products) so incremental == DuckDB
# recompute bit-for-bit, averages included (floor division both sides).
# ---------------------------------------------------------------------------
_Q1VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q1VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            "l_linestatus",
            F.col("l_quantity").cast("long").alias("qty"),
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias(
                "base_cents"
            ),
            F.round(F.col("l_discount") * 100.0).cast("long").alias("disc_h"),
            F.round(F.col("l_tax") * 100.0).cast("long").alias("tax_h"),
            "l_shipdate",
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("base_cents"), F.desc("qty"), F.desc("disc_h"),
            F.desc("tax_h"), F.desc("l_returnflag"), F.desc("l_linestatus"),
            F.desc("l_shipdate"),
        )
        src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

        def derive(df: DataFrame) -> DataFrame:
            dp = F.col("base_cents") * (F.lit(100) - F.col("disc_h"))
            return df.withColumn("disc_price_c", dp).withColumn(
                "charge_c", dp * (F.lit(100) + F.col("tax_h"))
            )

        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q1view_"))
        li = ManagedTable(wh / "lineitem").create(
            derive(src), ["l_orderkey", "l_linenumber"], pk_buckets=8,
            cdf=True,
        )
        mv = MaintainedAggregate(
            wh / "mv",
            ["l_returnflag", "l_linestatus"],
            sum_cols={
                "sum_qty": "qty",
                "sum_base_cents": "base_cents",
                "sum_disc_price": "disc_price_c",
                "sum_charge": "charge_c",
                "sum_disc_h": "disc_h",
            },
            where="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'",
            where_cols=["l_shipdate"],
        )
        mv.refresh(spark, li)  # seed from the pre-churn state

        cols = [
            "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "qty", "base_cents", "disc_h", "tax_h", "disc_price_c",
            "charge_c", "l_shipdate",
        ]

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return derive(df).select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        plain = src  # pre-churn image drives the batch derivations
        b_del = plain.filter(F.col("l_orderkey") % 10 == 7)
        b_upd = plain.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            (F.col("qty") + 1).alias("qty"),
            "base_cents", "disc_h", "tax_h",
            (F.col("l_shipdate") + F.expr("INTERVAL 200 DAY")).alias(
                "l_shipdate"
            ),
        )
        b_ins = plain.filter(F.col("l_orderkey") % 25 == 3).select(
            (F.col("l_orderkey") + 10000000000).alias("l_orderkey"),
            "l_linenumber", "l_returnflag", "l_linestatus", "qty",
            (F.col("base_cents") + 7).alias("base_cents"),
            "disc_h", "tax_h",
            (F.col("l_shipdate") - F.expr("INTERVAL 30 DAY")).alias(
                "l_shipdate"
            ),
        )
        li.merge(
            spark,
            batch(b_del, "D")
            .unionByName(batch(b_upd, "U"))
            .unionByName(batch(b_ins, "I")),
        )
        mv.refresh(spark, li)  # ONE slice folds deletes/boundary-crossers
        _Q1VIEW_CACHE[sf_dir] = mv
    mv = _Q1VIEW_CACHE[sf_dir]
    return mv.read(spark).select(
        "l_returnflag", "l_linestatus", "n_rows", "sum_qty",
        "sum_base_cents", "sum_disc_price", "sum_charge",
        F.expr("(1000 * sum_qty) div n_rows").alias("avg_qty_milli"),
        F.expr("(1000 * sum_base_cents) div n_rows").alias("avg_price_milli"),
        F.expr("(1000 * sum_disc_h) div n_rows").alias("avg_disc_milli"),
    )


_Q1VIEW_ORACLE = """
WITH li AS (
  SELECT * FROM (
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS base_cents,
           CAST(round(l_discount * 100.0) AS BIGINT) AS disc_h,
           CAST(round(l_tax * 100.0) AS BIGINT) AS tax_h,
           l_shipdate,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      CAST(l_quantity AS BIGINT) DESC,
                      CAST(round(l_discount * 100.0) AS BIGINT) DESC,
                      CAST(round(l_tax * 100.0) AS BIGINT) DESC,
                      l_returnflag DESC, l_linestatus DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), cur AS (
  SELECT l_returnflag, l_linestatus,
         CASE WHEN l_orderkey % 10 = 4 THEN qty + 1 ELSE qty END AS qty,
         base_cents, disc_h, tax_h,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 200 DAY
              ELSE l_shipdate END AS l_shipdate
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_returnflag, l_linestatus, qty, base_cents + 7, disc_h, tax_h,
         l_shipdate - INTERVAL 30 DAY
  FROM li WHERE l_orderkey % 25 = 3
)
SELECT l_returnflag, l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(base_cents) AS BIGINT) AS sum_base_cents,
       CAST(SUM(base_cents * (100 - disc_h)) AS BIGINT) AS sum_disc_price,
       CAST(SUM(base_cents * (100 - disc_h) * (100 + tax_h)) AS BIGINT)
         AS sum_charge,
       (1000 * CAST(SUM(qty) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS avg_qty_milli,
       (1000 * CAST(SUM(base_cents) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS avg_price_milli,
       (1000 * CAST(SUM(disc_h) AS BIGINT)) // CAST(COUNT(*) AS BIGINT)
         AS avg_disc_milli
FROM cur
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q3 as a MAINTAINED snowflake view: unshipped-order revenue
# (lineitem ⋈ orders ⋈ customer, customer reached through ORDERS'
# o_custkey — a chain hop) with ALL THREE of Q3's filters live:
# fact_where on l_shipdate, dim_wheres on o_orderdate and
# c_mktsegment='BUILDING'.  The churn crosses every boundary at once —
# shipdates move in/out, order dates move in/out, custkey re-points
# change BUILDING membership with no customer event (chain-hop), whole
# orders delete (dangling lineitems), segments flip on customers.  The
# read is the classic top-10 by revenue with a deterministic tiebreak.
# ---------------------------------------------------------------------------
_Q3VIEW_CACHE: dict[str, object] = {}
_Q3_CUTOFF = "TIMESTAMP '1995-03-15 00:00:00'"


def pipeline_maintained_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q3VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias(
                "base_cents"
            ),
            F.round(F.col("l_discount") * 100.0).cast("long").alias("disc_h"),
            "l_shipdate",
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("base_cents"), F.desc("disc_h"), F.desc("l_shipdate")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .withColumn(
                "disc_price_c",
                F.col("base_cents") * (F.lit(100) - F.col("disc_h")),
            )
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q3view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", ["o_orderdate", "o_orderpriority"]),
                ("o_custkey", []),  # chain hop through orders
            ],
            fact_group_cols=["l_orderkey"],
            sum_cols={"revenue_c": "disc_price_c"},
            fact_where=f"l_shipdate > {_Q3_CUTOFF}",
            fact_where_cols=["l_shipdate"],
            dim_wheres=[
                f"o_orderdate < {_Q3_CUTOFF}",
                "c_mktsegment = 'BUILDING'",
            ],
            dim_where_cols=[[], ["c_mktsegment"]],
        )
        mv.refresh_star(spark, li, [orders, cust])  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.withColumn(
                "disc_price_c",
                F.col("base_cents") * (F.lit(100) - F.col("disc_h")),
            ).select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "base_cents", "disc_h",
                "disc_price_c", "l_shipdate",
            )

        plain = li_src.drop("disc_price_c")
        l_del = plain.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = plain.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            (F.col("base_cents") + 100).alias("base_cents"), "disc_h",
            (F.col("l_shipdate") - F.expr("INTERVAL 300 DAY")).alias(
                "l_shipdate"
            ),
        )
        l_ins = plain.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            "base_cents", "disc_h",
            (F.col("l_shipdate") + F.expr("INTERVAL 50 DAY")).alias(
                "l_shipdate"
            ),
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        def obatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority",
            )

        o_del = ord_src.filter(F.col("o_orderkey") % 10 == 3)
        o_date = ord_src.filter(F.col("o_orderkey") % 10 == 8).select(
            "o_orderkey", "o_custkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 150 DAY")).alias(
                "o_orderdate"
            ),
            "o_orderpriority",
        )
        o_repoint = ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
            "o_orderkey",
            (F.col("o_custkey") % 100 + 1).alias("o_custkey"),
            "o_orderdate", "o_orderpriority",
        )
        orders.merge(
            spark,
            obatch(o_del, "D")
            .unionByName(obatch(o_date, "U"))
            .unionByName(obatch(o_repoint, "U")),
        )

        c_seg = cust_src.filter(F.col("c_custkey") % 10 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("customer").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "c_custkey", F.lit("BUILDING").alias("c_mktsegment"),
        ).unionByName(
            cust_src.filter(F.col("c_custkey") % 10 == 5).select(
                F.lit("U").alias("flag"),
                F.lit("customer").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "c_custkey", F.lit("OTHER").alias("c_mktsegment"),
            )
        )
        cust.merge(spark, c_seg)

        mv.refresh_star(spark, li, [orders, cust])  # ONE three-feed fold
        _Q3VIEW_CACHE[sf_dir] = mv
    mv = _Q3VIEW_CACHE[sf_dir]
    return (
        mv.read(spark)
        .select("l_orderkey", "o_orderdate", "o_orderpriority", "revenue_c")
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


_Q3VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, base_cents, disc_h, l_shipdate FROM (
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS base_cents,
           CAST(round(l_discount * 100.0) AS BIGINT) AS disc_h,
           l_shipdate,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      CAST(round(l_discount * 100.0) AS BIGINT) DESC,
                      l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN base_cents + 100
              ELSE base_cents END AS base_cents,
         disc_h,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate - INTERVAL 300 DAY
              ELSE l_shipdate END AS l_shipdate
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, base_cents, disc_h, l_shipdate + INTERVAL 50 DAY
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN (o_custkey % 100) + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 10 = 8 THEN o_orderdate + INTERVAL 150 DAY
              ELSE o_orderdate END AS o_orderdate,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 3
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN 'BUILDING'
              WHEN c_custkey % 10 = 5 THEN 'OTHER'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer
)
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(l.base_cents * (100 - l.disc_h)) AS BIGINT) AS revenue_c
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
WHERE l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND c.c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_c DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# TPC-H Q13 via COMPOSITION: the inner correlation (orders per customer,
# with Q13's anti-filter) is a maintained keyed-count view — O(changes)
# upkeep — and the outer distribution is a customer LEFT JOIN against
# that groups-sized state at read (exactly what Q13 itself scans).  The
# churn flips orders across the filter, deletes a customer's LAST
# qualifying order (they must move to the c_count=0 bucket), and gives
# order-less customers their first (0 → 1).
# ---------------------------------------------------------------------------
_Q13VIEW_CACHE: dict[str, object] = {}
_Q13_FILTER = "o_orderpriority NOT LIKE '1-%'"


def pipeline_maintained_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q13VIEW_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q13view_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        mv = MaintainedAggregate(
            wh / "mv",
            ["o_custkey"],
            sum_cols={},
            where=_Q13_FILTER,
            where_cols=["o_orderpriority"],
        )
        mv.refresh(spark, orders)

        def obatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority",
            )

        o_del = ord_src.filter(F.col("o_orderkey") % 10 == 7)
        o_flip = ord_src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey", "o_custkey",
            # URGENT ↔ not: crosses the filter in both directions
            F.when(
                F.col("o_orderpriority").startswith("1-"), F.lit("3-MEDIUM")
            ).otherwise(F.lit("1-URGENT")).alias("o_orderpriority"),
        )
        o_ins = ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            # first orders for high custkeys that may have had none
            (F.col("o_orderkey") % 299983).alias("o_custkey"),
            F.lit("5-LOW").alias("o_orderpriority"),
        )
        orders.merge(
            spark,
            obatch(o_del, "D")
            .unionByName(obatch(o_flip, "U"))
            .unionByName(obatch(o_ins, "I")),
        )
        mv.refresh(spark, orders)
        _Q13VIEW_CACHE[sf_dir] = mv
    mv = _Q13VIEW_CACHE[sf_dir]
    customers = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey"
    )
    counts = mv.read(spark).select(
        F.col("o_custkey").alias("c_custkey"), F.col("n_rows").alias("c_count")
    )
    # no forced broadcast: the count state is customer-cardinality at the
    # limit, so let the optimizer pick the join strategy from its size
    return (
        customers.join(counts, on="c_custkey", how="left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("long").alias("custdist"))
    )


_Q13VIEW_ORACLE = """
WITH curo AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 10 = 4 THEN
                CASE WHEN o_orderpriority LIKE '1-%' THEN '3-MEDIUM'
                     ELSE '1-URGENT' END
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_orderkey % 299983, '5-LOW'
  FROM orders WHERE o_orderkey % 25 = 3
), per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN (
    SELECT * FROM curo WHERE o_orderpriority NOT LIKE '1-%'
  ) o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(COUNT(*) AS BIGINT) AS custdist
FROM per_cust
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# TPC-H Q16 as a LIVE view — exact COUNT(DISTINCT supplier) THROUGH the
# join (MaintainedDistinctStarAggregate): fact lineitem, part dim supplies
# the (brand, size) group key under Q16's part filters, and the supplier
# exclusion ("NOT IN complaints") is the σ-dim "s_nationkey >= 10" (every
# l_suppkey exists in supplier, so inner-join-on-the-allowlist ≡ NOT IN
# the denylist).  Churn hits ALL THREE feeds: lineitem deletes remove
# suppliers' LAST qualifying rows in some groups, supplier re-points move
# rows between suppliers, part size/type moves RELOCATE whole support
# sets across groups or out of the σ, and nationkey flips admit/expel a
# supplier's every row at once.  The oracle recomputes COUNT(DISTINCT)
# relationally over the churned state — the maintained answer must be
# bit-equal.  (Batch twin: entry_analytics.q_brand_supplier_counts;
# reference parity: the reference leaves COUNT(DISTINCT) to per-query
# warehouse recompute, e.g. pkg/snowsql/sql.go merge pipelines.)
# ---------------------------------------------------------------------------
_Q16VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedDistinctStarAggregate

    if sf_dir not in _Q16VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
        # testdata lineitem carries duplicate (l_orderkey, l_linenumber)
        # keys — derive a deterministic survivor per PK (TESTDATA gotcha)
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("l_partkey"), F.desc("l_suppkey")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_brand",
            F.col("p_size").cast("long").alias("p_size"), "p_type",
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q16view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedDistinctStarAggregate(
            wh / "mv",
            dims=[("l_partkey", ["p_brand", "p_size"]), ("l_suppkey", [])],
            fact_group_cols=[],
            sum_cols={},
            distinct_cols={"supplier_cnt": "l_suppkey"},
            dim_wheres=[
                "p_type <> 'PROMO' AND p_size IN (1, 9, 19, 29, 39, 49)",
                "s_nationkey >= 10",
            ],
            dim_where_cols=[["p_type"], ["s_nationkey"]],
        )
        mv.refresh_star(spark, li, [part, supp])  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_sup = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            (F.col("l_suppkey") % 50 + 1).alias("l_suppkey"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            "l_partkey",
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_sup, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        p_move = part_src.filter(F.col("p_partkey") % 10 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("part").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "p_partkey", "p_brand",
            F.lit(9).cast("long").alias("p_size"), "p_type",
        ).unionByName(
            part_src.filter(F.col("p_partkey") % 10 == 5).select(
                F.lit("U").alias("flag"),
                F.lit("part").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "p_partkey", "p_brand", "p_size",
                F.lit("PROMO").alias("p_type"),
            )
        )
        part.merge(spark, p_move)

        s_flip = supp_src.filter(F.col("s_suppkey") % 10 == 3).select(
            F.lit("U").alias("flag"),
            F.lit("supplier").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "s_suppkey",
            (F.col("s_nationkey") + 10).alias("s_nationkey"),
        ).unionByName(
            supp_src.filter(F.col("s_suppkey") % 10 == 6).select(
                F.lit("U").alias("flag"),
                F.lit("supplier").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "s_suppkey",
                (F.col("s_nationkey") % 5).alias("s_nationkey"),
            )
        )
        supp.merge(spark, s_flip)

        mv.refresh_star(spark, li, [part, supp])  # ONE three-feed fold
        _Q16VIEW_CACHE[sf_dir] = mv
    mv = _Q16VIEW_CACHE[sf_dir]
    return mv.read(spark).select(
        "p_brand", "p_size",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("supplier_cnt").cast("long").alias("supplier_cnt"),
    )


_Q16VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_partkey DESC, l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 50) + 1
              ELSE l_suppkey END AS l_suppkey
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_partkey, (l_suppkey % 97) + 1
  FROM li WHERE l_orderkey % 25 = 3
), curp AS (
  SELECT p_partkey, p_brand,
         CAST(CASE WHEN p_partkey % 10 = 2 THEN 9 ELSE p_size END AS BIGINT)
           AS p_size,
         CASE WHEN p_partkey % 10 = 5 THEN 'PROMO' ELSE p_type END AS p_type
  FROM part
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN s_nationkey + 10
              WHEN s_suppkey % 10 = 6 THEN s_nationkey % 5
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
)
SELECT p.p_brand, p.p_size,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM curl l
JOIN curp p ON l.l_partkey = p.p_partkey
JOIN curs s ON l.l_suppkey = s.s_suppkey
WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 19, 29, 39, 49)
  AND s.s_nationkey >= 10
GROUP BY p.p_brand, p.p_size
"""


def pipeline_q16_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters THROUGH the join, free from the maintained Q16
    store: the top-2 suppliers by qualifying-lineitem count per
    (brand, size) — the support multiset H(group, supplier) already
    holds exactly these counts, so the probe is a window over the
    distinct-pairs-sized store with no base, dim, or joined scan."""
    pipeline_maintained_q16(spark, sf_dir)  # ensure seeded + churned
    mv = _Q16VIEW_CACHE[sf_dir]
    return mv.top_values(spark, "supplier_cnt", k=2).select(
        "p_brand", "p_size",
        F.col("__v").cast("long").alias("l_suppkey"),
        F.col("__cnt").cast("long").alias("n_rows_v"),
        F.col("rank").cast("long").alias("rank"),
    )


_Q16TOP_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_partkey DESC, l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 50) + 1
              ELSE l_suppkey END AS l_suppkey
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_partkey, (l_suppkey % 97) + 1
  FROM li WHERE l_orderkey % 25 = 3
), curp AS (
  SELECT p_partkey, p_brand,
         CAST(CASE WHEN p_partkey % 10 = 2 THEN 9 ELSE p_size END AS BIGINT)
           AS p_size,
         CASE WHEN p_partkey % 10 = 5 THEN 'PROMO' ELSE p_type END AS p_type
  FROM part
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN s_nationkey + 10
              WHEN s_suppkey % 10 = 6 THEN s_nationkey % 5
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
), counts AS (
  SELECT p.p_brand, p.p_size, l.l_suppkey, COUNT(*) AS n
  FROM curl l
  JOIN curp p ON l.l_partkey = p.p_partkey
  JOIN curs s ON l.l_suppkey = s.s_suppkey
  WHERE p.p_type <> 'PROMO' AND p.p_size IN (1, 9, 19, 29, 39, 49)
    AND s.s_nationkey >= 10
  GROUP BY p.p_brand, p.p_size, l.l_suppkey
)
SELECT p_brand, p_size, l_suppkey,
       CAST(n AS BIGINT) AS n_rows_v, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY p_brand, p_size ORDER BY n DESC, l_suppkey ASC
  ) AS rank FROM counts
) WHERE rank <= 2
"""


# ---------------------------------------------------------------------------
# TPC-H Q5 as a LIVE view — the DEEP snowflake: lineitem ⋈ orders ⋈
# customer ⋈ supplier ⋈ nation ⋈ region with the cross-dim equality
# c_nationkey = s_nationkey (join_where: row-local over the JOINED row,
# so it commutes with the delta terms) and the region σ.  Ownership
# chains at depth: customer hangs off orders, nation off customer,
# region off nation — three hops the Q3 view (one hop) never exercises.
# Churn lands on FIVE feeds, including a nation→region re-point that
# relocates a whole nation's revenue in/out of ASIA and nationkey moves
# on BOTH customer and supplier that flip the equality row by row.
# Oracle = DuckDB recompute over the churned state (batch twin:
# entry_analytics.q_local_supplier_revenue).
# ---------------------------------------------------------------------------
_Q5VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q5VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_suppkey")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        reg_src = spark.read.parquet(f"{sf_dir}/region.parquet").select(
            "r_regionkey", "r_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q5view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        nation = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        region = ManagedTable(wh / "region").create(
            reg_src, ["r_regionkey"], pk_buckets=2, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", []),      # orders (carries o_custkey)
                ("o_custkey", []),       # customer, chained off orders
                ("l_suppkey", []),       # supplier (carries s_nationkey)
                ("c_nationkey", ["n_name"]),  # nation, chained off customer
                ("n_regionkey", []),     # region, chained off nation
            ],
            fact_group_cols=[],
            sum_cols={"revenue_c": "revenue_c"},
            dim_wheres=[None, None, None, None, "r_name = 'ASIA'"],
            dim_where_cols=[[], [], ["s_nationkey"], [], ["r_name"]],
            join_where="c_nationkey = s_nationkey",
        )
        mv.refresh_star(spark, li, [orders, cust, supp, nation, region])

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_suppkey", "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_suppkey") % 50 + 1).alias("l_suppkey"),
            (F.col("revenue_c") + 11).alias("revenue_c"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            "revenue_c",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
            return df.select(
                F.lit("U").alias("flag"),
                F.lit(tbl).alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        orders.merge(spark, env(
            ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
                "o_orderkey", (F.col("o_custkey") % 100 + 1).alias("o_custkey")
            ),
            "orders", ["o_orderkey", "o_custkey"],
        ))
        cust.merge(spark, env(
            cust_src.filter(F.col("c_custkey") % 10 == 2).select(
                "c_custkey",
                ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
            ),
            "customer", ["c_custkey", "c_nationkey"],
        ))
        supp.merge(spark, env(
            supp_src.filter(F.col("s_suppkey") % 10 == 3).select(
                "s_suppkey",
                ((F.col("s_nationkey") + 3) % 25).alias("s_nationkey"),
            ),
            "supplier", ["s_suppkey", "s_nationkey"],
        ))
        nation.merge(spark, env(
            nat_src.filter(F.col("n_nationkey") % 5 == 2).select(
                "n_nationkey", "n_name",
                ((F.col("n_regionkey") + 1) % 5).alias("n_regionkey"),
            ),
            "nation", ["n_nationkey", "n_name", "n_regionkey"],
        ))

        # ONE six-feed fold
        mv.refresh_star(spark, li, [orders, cust, supp, nation, region])
        _Q5VIEW_CACHE[sf_dir] = mv
    mv = _Q5VIEW_CACHE[sf_dir]
    return mv.read(spark).select(
        "n_name",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("revenue_c").cast("long").alias("revenue_c"),
    )


_Q5VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_suppkey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 50) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 11
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, (l_suppkey % 97) + 1, revenue_c
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN (o_custkey % 100) + 1
              ELSE o_custkey END AS o_custkey
  FROM orders
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN (s_nationkey + 3) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
), curn AS (
  SELECT n_nationkey, n_name,
         CASE WHEN n_nationkey % 5 = 2 THEN (n_regionkey + 1) % 5
              ELSE n_regionkey END AS n_regionkey
  FROM nation
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l.revenue_c) AS BIGINT) AS revenue_c
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
JOIN curs s ON l.l_suppkey = s.s_suppkey
JOIN curn n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE c.c_nationkey = s.s_nationkey AND r.r_name = 'ASIA'
GROUP BY n.n_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q10 as a LIVE view — returned-item revenue per customer: the
# fact σ (returnflag) and a dim σ (order-date quarter) with the GROUP
# KEY at customer cardinality supplied entirely by a dim (c_custkey,
# c_name) — so a customer RENAME is a dim-attribute move that must
# relocate the group's whole revenue, and churn flipping returnflag /
# shifting dates crosses both σ boundaries.  Read = top-20 by revenue
# over the maintained state (TakeOrderedAndProject, groups-sized input).
# Batch twin: entry_analytics.q10_returned_items.
# ---------------------------------------------------------------------------
_Q10VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q10VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_returnflag",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_returnflag")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q10view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", []),
                ("o_custkey", ["c_custkey", "c_name"]),
            ],
            fact_group_cols=[],
            sum_cols={"revenue_c": "revenue_c"},
            fact_where="l_returnflag = 'R'",
            fact_where_cols=["l_returnflag"],
            dim_wheres=[
                "o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
                "o_orderdate < TIMESTAMP '1997-04-01 00:00:00'",
                None,
            ],
            dim_where_cols=[["o_orderdate"], []],
        )
        mv.refresh_star(spark, li, [orders, cust])  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_returnflag", "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_flip = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            # crosses the fact σ in BOTH directions
            F.when(F.col("l_returnflag") == "R", F.lit("N"))
            .otherwise(F.lit("R")).alias("l_returnflag"),
            (F.col("revenue_c") + 11).alias("revenue_c"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            F.lit("R").alias("l_returnflag"),
            "revenue_c",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_flip, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
            return df.select(
                F.lit("U").alias("flag"),
                F.lit(tbl).alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        orders.merge(spark, env(
            ord_src.filter(F.col("o_orderkey") % 10 == 8).select(
                "o_orderkey", "o_custkey",
                (F.col("o_orderdate") + F.expr("INTERVAL 150 DAY")).alias(
                    "o_orderdate"
                ),
            ),
            "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        ).unionByName(env(
            ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
                "o_orderkey",
                (F.col("o_custkey") % 100 + 1).alias("o_custkey"),
                "o_orderdate",
            ),
            "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        )))
        cust.merge(spark, env(
            cust_src.filter(F.col("c_custkey") % 10 == 2).select(
                "c_custkey",
                F.concat(F.lit("R#"), F.col("c_custkey").cast("string"))
                .alias("c_name"),
            ),
            "customer", ["c_custkey", "c_name"],
        ))

        mv.refresh_star(spark, li, [orders, cust])  # ONE three-feed fold
        _Q10VIEW_CACHE[sf_dir] = mv
    mv = _Q10VIEW_CACHE[sf_dir]
    return (
        mv.read(spark)
        .select(
            "c_custkey", "c_name",
            F.col("revenue_c").cast("long").alias("revenue_c"),
        )
        .orderBy(F.desc("revenue_c"), F.asc("c_custkey"))
        .limit(20)
    )


_Q10VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_returnflag, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_returnflag DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN
                CASE WHEN l_returnflag = 'R' THEN 'N' ELSE 'R' END
              ELSE l_returnflag END AS l_returnflag,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 11
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, 'R', revenue_c FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN (o_custkey % 100) + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 10 = 8 THEN o_orderdate + INTERVAL 150 DAY
              ELSE o_orderdate END AS o_orderdate
  FROM orders
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN 'R#' || CAST(c_custkey AS VARCHAR)
              ELSE c_name END AS c_name
  FROM customer
)
SELECT c.c_custkey, c.c_name,
       CAST(SUM(l.revenue_c) AS BIGINT) AS revenue_c
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
GROUP BY c.c_custkey, c.c_name
QUALIFY row_number() OVER (
  ORDER BY SUM(l.revenue_c) DESC, c.c_custkey
) <= 20
"""


# ---------------------------------------------------------------------------
# TPC-H Q18 via COMPOSITION (the Q13 pattern, threshold flavor): the
# per-order quantity rollup is a maintained keyed aggregate — O(changes)
# upkeep, order-count-sized state — and the HAVING + joins run at read
# over the rare big-order survivors.  Churn moves orders ACROSS the
# threshold in both directions, removes an order's last line (it must
# leave the state entirely), and inserts lines pushing new orders over.
# Batch twin: entry_analytics.q_big_order_customers.
# ---------------------------------------------------------------------------
_Q18VIEW_CACHE: dict[str, object] = {}
_Q18_THRESHOLD = 25000


def pipeline_maintained_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q18VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber",
            F.round(F.col("l_quantity") * 100.0).cast("long").alias("qty_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("qty_c")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q18view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        mv = MaintainedAggregate(
            wh / "mv", ["l_orderkey"], sum_cols={"qty_cents": "qty_c"}
        )
        mv.refresh(spark, li)

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "qty_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            # big swings cross the 25000 threshold both ways
            (F.col("qty_c") * 3 % 20000).alias("qty_c"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            (F.col("qty_c") + 2000).alias("qty_c"),
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )
        mv.refresh(spark, li)
        _Q18VIEW_CACHE[sf_dir] = mv
    mv = _Q18VIEW_CACHE[sf_dir]
    big = mv.read(spark).filter(
        F.col("qty_cents") > _Q18_THRESHOLD
    ).select("l_orderkey", F.col("qty_cents").cast("long").alias("qty_cents"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100.0).cast("long").alias(
            "totalprice_cents"
        ),
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name"
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_custkey", "o_orderkey", "o_orderdate",
            "totalprice_cents", "qty_cents",
        )
    )


_Q18VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, qty_c FROM (
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_quantity * 100.0) AS BIGINT) DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (qty_c * 3) % 20000
              ELSE qty_c END AS qty_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, qty_c + 2000 FROM li WHERE l_orderkey % 25 = 3
), big AS (
  SELECT l_orderkey, CAST(SUM(qty_c) AS BIGINT) AS qty_cents
  FROM curl GROUP BY l_orderkey
  HAVING SUM(qty_c) > 25000
)
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
       CAST(round(o.o_totalprice * 100.0) AS BIGINT) AS totalprice_cents,
       b.qty_cents
FROM big b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
"""


# ---------------------------------------------------------------------------
# Maintained BM25 — the inverted index as DERIVED STATE
# (operators/inverted_index.py): postings (term→doc, tf) and doc lengths
# are SupportStore multisets folded ± from the change feed, corpus
# scalars (N, S) ride the meta, and the query reads O(query terms'
# buckets).  Churn deletes docs (a term's last posting must vanish),
# EDITS docs (preimage tokens must subtract — the ghost-posting trap),
# and inserts new ones; the maintained scores must equal text.bm25_topk's
# integer-ratio recompute over the churned corpus, score for score.
# ---------------------------------------------------------------------------
_BM25VIEW_CACHE: dict[str, object] = {}
_BM25VIEW_TERMS = ["spark", "join", "scan", "window"]


def pipeline_maintained_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.inverted_index import MaintainedInvertedIndex

    if sf_dir not in _BM25VIEW_CACHE:
        src = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_bm25view_"))
        docs = ManagedTable(wh / "documents").create(
            src, ["doc_id"], pk_buckets=8, cdf=True
        )
        idx = MaintainedInvertedIndex(
            wh / "inv", "doc_id", "text", term_buckets=32, doc_buckets=16
        )
        idx.refresh(spark, docs)  # seed

        def env(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("documents").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "doc_id", "text",
            )

        d_del = src.filter(F.col("doc_id") % 10 == 7)
        d_upd = src.filter(F.col("doc_id") % 10 == 4).select(
            "doc_id",
            F.concat(F.col("text"), F.lit(" spark graft spark")).alias(
                "text"
            ),
        )
        d_ins = src.filter(F.col("doc_id") % 25 == 3).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.lit("graft spark retrieval join scan").alias("text"),
        )
        docs.merge(
            spark,
            env(d_del, "D").unionByName(env(d_upd, "U")).unionByName(
                env(d_ins, "I")
            ),
        )
        idx.refresh(spark, docs)  # ONE fold over the churn
        _BM25VIEW_CACHE[sf_dir] = idx
    idx = _BM25VIEW_CACHE[sf_dir]
    return idx.bm25_topk(spark, _BM25VIEW_TERMS, k=10).select(
        "doc_id",
        F.col("score_q").cast("long").alias("score_q"),
        F.col("n_terms").cast("long").alias("n_terms"),
    )


_BM25VIEW_DOCS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 10 = 4 THEN text || ' spark graft spark'
            ELSE text END AS text
FROM documents WHERE doc_id % 10 <> 7
UNION ALL
SELECT doc_id + 1000000, 'graft spark retrieval join scan'
FROM documents WHERE doc_id % 25 = 3
"""


def _bm25view_oracle() -> str:
    from .functions import oracle_sql as O

    return O.bm25_topk_oracle(
        _BM25VIEW_TERMS, 10, docs_sql=_BM25VIEW_DOCS_SQL
    )


# ---------------------------------------------------------------------------
# Exact COUNT(DISTINCT) maintenance row (operators/distinct_matview.py):
# customers-and-statuses per order priority, maintained through a churn
# batch that stresses exactly what signed folding cannot express — the
# fk-collapsing update folds MANY custkeys onto (k % 50) + 1 (removing
# some values' last occurrence while others keep support elsewhere), the
# delete removes whole rows, and the insert re-adds values.  The oracle
# is a DuckDB COUNT(DISTINCT) full recompute over the churned state.
# ---------------------------------------------------------------------------
_DISTINCT_CACHE: dict[str, object] = {}


def pipeline_incremental_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.distinct_matview import MaintainedDistinctAggregate

    if sf_dir not in _DISTINCT_CACHE:
        src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_distinct_"))
        t = ManagedTable(wh / "orders").create(
            src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        mv = MaintainedDistinctAggregate(
            wh / "mv",
            ["o_orderpriority"],
            {"n_cust": "o_custkey", "n_status": "o_orderstatus"},
            n_buckets=8,
        )
        mv.refresh(spark, t)  # seed pre-churn

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority", "o_orderstatus",
            )

        d = src.filter(F.col("o_orderkey") % 10 == 7)
        u = src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            "o_orderpriority",
            F.lit("X").alias("o_orderstatus"),
        )
        i = src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            (F.col("o_orderkey") % 120 + 1).alias("o_custkey"),
            "o_orderpriority",
            F.lit("N").alias("o_orderstatus"),
        )
        t.merge(
            spark,
            batch(d, "D").unionByName(batch(u, "U")).unionByName(batch(i, "I")),
        )
        mv.refresh(spark, t)  # ONE incremental fold over the churn
        _DISTINCT_CACHE[sf_dir] = mv
    mv = _DISTINCT_CACHE[sf_dir]
    return mv.read(spark).select(
        "o_orderpriority", "n_rows", "n_cust", "n_status"
    )


def pipeline_distinct_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters FREE from the maintained support store: top-5
    customers by order count per priority, probed from the same
    MaintainedDistinctAggregate the distinct row maintains (no base
    scan; the window is partitioned by group).  The oracle recomputes
    counts over the churned state and ranks with the same
    (count DESC, value ASC) tiebreak."""
    pipeline_incremental_distinct(spark, sf_dir)  # (cached) build + churn
    mv = _DISTINCT_CACHE[sf_dir]
    return mv.top_values(spark, "n_cust", 5).select(
        "o_orderpriority",
        F.col("__v").alias("o_custkey"),
        F.col("__cnt").alias("cnt"),
        "rank",
    )


# ---------------------------------------------------------------------------
# Two-dim STAR rollup row (operators/join_matview.py:
# MaintainedStarAggregate): quantity and revenue by (part brand,
# supplier nation) over lineitem ⋈ part ⋈ supplier, maintained through
# ONE refresh window that churns ALL THREE feeds — fact fk moves onto
# deleted part keys (danglings), part deletes/brand moves, supplier
# nation moves.  The telescoped delta algebra (module docstring) must
# absorb every cross-table interaction; the oracle is a DuckDB full
# three-way join+group recompute.  lineitem's duplicate
# (l_orderkey, l_linenumber) keys (TESTDATA quirk) are deduplicated with
# a total-order row_number mirrored in the oracle.
# ---------------------------------------------------------------------------
_STAR_CACHE: dict[str, object] = {}


def pipeline_star_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _STAR_CACHE:
        cents = F.round(F.col("l_extendedprice") * 100.0).cast("long")
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.col("l_quantity").cast("long").alias("qty"),
            cents.alias("cents"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("cents"), F.desc("qty"),
            F.asc("l_partkey"), F.asc("l_suppkey"),
        )
        src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_brand"
        )
        supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", F.col("s_nationkey").cast("long").alias("s_nationkey")
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_star_"))
        fact = ManagedTable(wh / "lineitem").create(
            src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        d_part = ManagedTable(wh / "part").create(
            part, ["p_partkey"], pk_buckets=4, cdf=True
        )
        d_supp = ManagedTable(wh / "supplier").create(
            supp, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[("l_partkey", ["p_brand"]), ("l_suppkey", ["s_nationkey"])],
            fact_group_cols=[],
            sum_cols={"qty_sum": "qty", "cents_sum": "cents"},
        )
        mv.refresh_star(spark, fact, [d_part, d_supp])  # seed pre-churn

        def fb(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "qty", "cents",
            )

        f_d = src.filter(F.col("l_orderkey") % 10 == 7)
        f_u = src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_partkey") % 50 + 1).alias("l_partkey"),
            "l_suppkey", "qty",
            (F.col("cents") + 7).alias("cents"),
        )
        f_i = src.filter(F.col("l_orderkey") % 25 == 3).select(
            (F.col("l_orderkey") + 2000000).alias("l_orderkey"),
            "l_linenumber",
            (F.col("l_orderkey") % 80 + 1).alias("l_partkey"),
            (F.col("l_orderkey") % 60 + 1).alias("l_suppkey"),
            "qty",
            (F.col("cents") + 5).alias("cents"),
        )
        fact.merge(
            spark,
            fb(f_d, "D").unionByName(fb(f_u, "U")).unionByName(fb(f_i, "I")),
        )

        def pb(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("part").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "p_partkey", "p_brand",
            )

        p_d = part.filter(F.col("p_partkey") % 10 == 3)
        p_u = part.filter(F.col("p_partkey") % 10 == 6).select(
            "p_partkey",
            F.concat(F.col("p_brand"), F.lit("_X")).alias("p_brand"),
        )
        d_part.merge(spark, pb(p_d, "D").unionByName(pb(p_u, "U")))

        s_u = supp.filter(F.col("s_suppkey") % 5 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("supplier").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "s_suppkey",
            ((F.col("s_nationkey") + 7) % 25).alias("s_nationkey"),
        )
        d_supp.merge(spark, s_u)

        mv.refresh_star(spark, fact, [d_part, d_supp])  # ONE three-feed fold
        _STAR_CACHE[sf_dir] = mv
    mv = _STAR_CACHE[sf_dir]
    return mv.read(spark).select(
        "p_brand", "s_nationkey", "n_rows", "qty_sum", "cents_sum"
    )


_STAR_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, qty, cents FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(l_quantity AS BIGINT) AS qty,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      CAST(l_quantity AS BIGINT) DESC,
                      l_partkey ASC, l_suppkey ASC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curf AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_partkey % 50) + 1
              ELSE l_partkey END AS l_partkey,
         l_suppkey, qty,
         CASE WHEN l_orderkey % 10 = 4 THEN cents + 7
              ELSE cents END AS cents
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey + 2000000, l_linenumber, (l_orderkey % 80) + 1,
         (l_orderkey % 60) + 1, qty, cents + 5
  FROM li WHERE l_orderkey % 25 = 3
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 10 = 6 THEN p_brand || '_X'
              ELSE p_brand END AS p_brand
  FROM part WHERE p_partkey % 10 <> 3
), curs AS (
  SELECT s_suppkey,
         CAST(CASE WHEN s_suppkey % 5 = 2 THEN (s_nationkey + 7) % 25
              ELSE s_nationkey END AS BIGINT) AS s_nationkey
  FROM supplier
)
SELECT p.p_brand, s.s_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.qty) AS BIGINT) AS qty_sum,
       CAST(SUM(f.cents) AS BIGINT) AS cents_sum
FROM curf f
JOIN curp p ON f.l_partkey = p.p_partkey
JOIN curs s ON f.l_suppkey = s.s_suppkey
GROUP BY p.p_brand, s.s_nationkey
"""


# ---------------------------------------------------------------------------
# SNOWFLAKE chain row: orders ⋈ customer ⋈ nation where NATION joins on
# CUSTOMER's attribute (c_nationkey) — the chain-hop topology resolved
# by schema ownership.  The customer churn re-points nationkeys, so fact
# rows change their nation group with NO fact or nation event at all —
# the delta only a chain-aware fold can absorb.
# ---------------------------------------------------------------------------
_SNOWFLAKE_CACHE: dict[str, object] = {}


def pipeline_snowflake_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _SNOWFLAKE_CACHE:
        cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
        fact_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", cents.alias("cents")
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment",
            F.col("c_nationkey").cast("long").alias("c_nationkey"),
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_snowflake_"))
        fact = ManagedTable(wh / "orders").create(
            fact_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        nat = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("o_custkey", ["c_mktsegment"]),
                ("c_nationkey", ["n_name"]),  # ← lives on customer
            ],
            fact_group_cols=[],
            sum_cols={"total_cents": "cents"},
        )
        mv.refresh_star(spark, fact, [cust, nat])  # seed pre-churn

        def fb(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "cents",
            )

        f_d = fact_src.filter(F.col("o_orderkey") % 10 == 7)
        f_u = fact_src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey",
            (F.col("o_custkey") % 50 + 1).alias("o_custkey"),
            (F.col("cents") + 11).alias("cents"),
        )
        f_i = fact_src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            (F.col("o_orderkey") % 120 + 1).alias("o_custkey"),
            (F.col("cents") + 5).alias("cents"),
        )
        fact.merge(
            spark,
            fb(f_d, "D").unionByName(fb(f_u, "U")).unionByName(fb(f_i, "I")),
        )

        def cb(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("customer").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "c_custkey", "c_mktsegment", "c_nationkey",
            )

        c_d = cust_src.filter(F.col("c_custkey") % 10 == 3)
        c_u = cust_src.filter(F.col("c_custkey") % 10 == 6).select(
            "c_custkey",
            F.concat(F.col("c_mktsegment"), F.lit("_X")).alias("c_mktsegment"),
            ((F.col("c_nationkey") + 5) % 25).alias("c_nationkey"),
        )
        c_i = cust_src.filter(F.col("c_custkey") % 20 == 1).select(
            (F.col("c_custkey") + 100000000).alias("c_custkey"),
            F.concat(
                F.lit("NEW_"), (F.col("c_custkey") % 7).cast("string")
            ).alias("c_mktsegment"),
            (F.col("c_custkey") % 25).alias("c_nationkey"),
        )
        cust.merge(
            spark,
            cb(c_d, "D").unionByName(cb(c_u, "U")).unionByName(cb(c_i, "I")),
        )

        n_u = nat_src.filter(F.col("n_nationkey") % 5 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("nation").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "n_nationkey",
            F.concat(F.col("n_name"), F.lit("_R")).alias("n_name"),
        )
        nat.merge(spark, n_u)

        mv.refresh_star(spark, fact, [cust, nat])  # ONE three-feed fold
        _SNOWFLAKE_CACHE[sf_dir] = mv
    mv = _SNOWFLAKE_CACHE[sf_dir]
    return mv.read(spark).select(
        "c_mktsegment", "n_name", "n_rows", "total_cents"
    )


_SNOWFLAKE_ORACLE = """
WITH curf AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN (o_custkey % 50) + 1
              ELSE o_custkey END AS o_custkey,
         CASE WHEN o_orderkey % 10 = 4
              THEN CAST(round(o_totalprice * 100.0) AS BIGINT) + 11
              ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, (o_orderkey % 120) + 1,
         CAST(round(o_totalprice * 100.0) AS BIGINT) + 5
  FROM orders WHERE o_orderkey % 25 = 3
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 6 THEN c_mktsegment || '_X'
              ELSE c_mktsegment END AS c_mktsegment,
         CAST(CASE WHEN c_custkey % 10 = 6 THEN (c_nationkey + 5) % 25
              ELSE c_nationkey END AS BIGINT) AS c_nationkey
  FROM customer WHERE c_custkey % 10 <> 3
  UNION ALL
  SELECT c_custkey + 100000000, 'NEW_' || CAST(c_custkey % 7 AS VARCHAR),
         CAST(c_custkey % 25 AS BIGINT)
  FROM customer WHERE c_custkey % 20 = 1
), curn AS (
  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
         CASE WHEN n_nationkey % 5 = 2 THEN n_name || '_R'
              ELSE n_name END AS n_name
  FROM nation
)
SELECT c.c_mktsegment, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.cents) AS BIGINT) AS total_cents
FROM curf f
JOIN curc c ON f.o_custkey = c.c_custkey
JOIN curn n ON c.c_nationkey = n.n_nationkey
GROUP BY c.c_mktsegment, n.n_name
"""


_QUANTILE_CACHE: dict[str, object] = {}


def pipeline_distinct_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact maintained quantiles: the support multiset H(g, v) is the
    row multiset projected onto v, so its cnt-weighted lower quantile IS
    the plain per-group quantile — here the p25/p50/p90 order value
    (cents) per priority, kept fresh through churn without a base
    rescan.  Thresholds are integer arithmetic (ceil via div), so the
    DuckDB oracle cannot disagree on boundary rows."""
    from .operators.distinct_matview import MaintainedDistinctAggregate

    if sf_dir not in _QUANTILE_CACHE:
        cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
        src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority", cents.alias("cents")
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_quantile_"))
        t = ManagedTable(wh / "orders").create(
            src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        mv = MaintainedDistinctAggregate(
            wh / "mv", ["o_orderpriority"], {"cents_q": "cents"}, n_buckets=8
        )
        mv.refresh(spark, t)  # seed pre-churn

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_orderpriority", "cents",
            )

        d = src.filter(F.col("o_orderkey") % 10 == 7)
        u = src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey", "o_orderpriority",
            (F.col("cents") + 11).alias("cents"),
        )
        i = src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100000000).alias("o_orderkey"),
            "o_orderpriority",
            (F.col("cents") + 5).alias("cents"),
        )
        t.merge(
            spark,
            batch(d, "D").unionByName(batch(u, "U")).unionByName(batch(i, "I")),
        )
        mv.refresh(spark, t)
        _QUANTILE_CACHE[sf_dir] = mv
    mv = _QUANTILE_CACHE[sf_dir]
    return mv.quantile_values(
        spark, "cents_q", {"p25": (1, 4), "p50": (1, 2), "p90": (9, 10)}
    ).select("o_orderpriority", "q_label", F.col("__v").alias("cents"))


_QUANTILE_ORACLE = """
WITH cur AS (
  SELECT o_orderkey, o_orderpriority,
         CASE WHEN o_orderkey % 10 = 4
              THEN CAST(round(o_totalprice * 100.0) AS BIGINT) + 11
              ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) + 5
  FROM orders WHERE o_orderkey % 25 = 3
), counted AS (
  SELECT o_orderpriority, cents, COUNT(*) AS cnt
  FROM cur GROUP BY o_orderpriority, cents
), cum AS (
  SELECT o_orderpriority, cents, cnt,
         SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY o_orderpriority) AS tot
  FROM counted
), q(q_label, qn, qd) AS (
  VALUES ('p25', 1, 4), ('p50', 1, 2), ('p90', 9, 10)
)
SELECT o_orderpriority, q_label, cents
FROM cum CROSS JOIN q
WHERE cum >= (tot * qn + qd - 1) // qd
  AND cum - cnt < (tot * qn + qd - 1) // qd
"""


_DISTINCT_TOPK_ORACLE = """
WITH cur AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN (o_custkey % 50) + 1
              ELSE o_custkey END AS o_custkey,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, (o_orderkey % 120) + 1, o_orderpriority
  FROM orders WHERE o_orderkey % 25 = 3
), counted AS (
  SELECT o_orderpriority, o_custkey,
         CAST(COUNT(*) AS BIGINT) AS cnt,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY o_orderpriority
           ORDER BY COUNT(*) DESC, o_custkey ASC
         ) AS INT) AS rank
  FROM cur GROUP BY o_orderpriority, o_custkey
)
SELECT o_orderpriority, o_custkey, cnt, rank FROM counted WHERE rank <= 5
"""


_DISTINCT_ORACLE = """
WITH cur AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN (o_custkey % 50) + 1
              ELSE o_custkey END AS o_custkey,
         o_orderpriority,
         CASE WHEN o_orderkey % 10 = 4 THEN 'X'
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, (o_orderkey % 120) + 1, o_orderpriority, 'N'
  FROM orders WHERE o_orderkey % 25 = 3
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
       CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_status
FROM cur GROUP BY o_orderpriority
"""


_JOINAGG_ORACLE = """
WITH fact2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN (o_custkey % 50) + 1
              ELSE o_custkey END AS o_custkey,
         o_orderpriority,
         CASE WHEN o_orderkey % 10 = 4
              THEN CAST(round(o_totalprice * 100.0) AS BIGINT) + 11
              ELSE CAST(round(o_totalprice * 100.0) AS BIGINT) END AS cents
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, (o_orderkey % 120) + 1, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) + 5
  FROM orders WHERE o_orderkey % 25 = 3
), dim2 AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 6 THEN c_mktsegment || '_X'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 10 <> 3
  UNION ALL
  SELECT c_custkey + 100000000, 'NEW_' || CAST(c_custkey % 7 AS VARCHAR)
  FROM customer WHERE c_custkey % 20 = 1
)
SELECT f.o_orderpriority, d.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.cents) AS BIGINT) AS total_cents
FROM fact2 f JOIN dim2 d ON f.o_custkey = d.c_custkey
GROUP BY f.o_orderpriority, d.c_mktsegment
"""


# ---------------------------------------------------------------------------
# Self-healing stream supervision: RENAME + widening barriers land WHILE a
# continuous commit-log stream maintains an aggregate; the supervisor
# restarts from the same checkpoint each time (streaming/supervisor.py) and
# the drained rollup must equal a full recompute — the reference consumer's
# unattended DDL ride (increment.go:283-329), proven end-to-end.
# ---------------------------------------------------------------------------
def pipeline_stream_selfheal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintained rollup (status → count, sum cents) kept fresh by a
    CONTINUOUS supervised stream while three CDC batches land — the
    second after a live RENAME (o_orderstatus → o_status), the third
    after a live widening MODIFY (o_total_cents int → bigint).  Each
    barrier kills the running query with SchemaEvolvedError; the
    supervisor restarts it from the SAME checkpoint with no manual
    intervention, and the function raises loudly if the heal never
    happened (restarts < 2) or a catch-up stalls — so a green row IS the
    self-heal proof.  The oracle recomputes the final fold relationally
    from the orders table."""
    import time as _time

    from .operators.matview import MaintainedAggregate
    from .schema.diff import diff_columns
    from .schema.evolve import apply_column_diffs
    from .streaming.supervisor import StreamSupervisor

    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_selfheal_"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("int").alias("o_total_cents"),
    )
    table = ManagedTable(wh / "orders_live").create(
        orders, ["o_orderkey"], pk_buckets=_PK_BUCKETS, cdf=True
    )
    k = F.col("o_orderkey")

    def _env_batch(df: DataFrame, flag, ts_base: int, status, cents) -> DataFrame:
        return df.select(
            F.lit(flag).alias("flag"),
            F.lit(_TABLE).alias("tablename"),
            F.lit(_SCHEMA).alias("schemaname"),
            (F.lit(ts_base) + k % 97).cast("long").alias("commit_ts"),
            F.col("o_orderkey").cast("long"),
            F.col("o_custkey").cast("long"),
            status.alias("o_orderstatus"),
            cents.alias("o_total_cents"),
        )

    b1 = (
        _env_batch(  # updates
            orders.filter(k % 21 == 0), "U", 10_000,
            F.lit("P1"), (F.col("o_total_cents") + 100).cast("int"),
        )
        .unionByName(_env_batch(  # deletes land LAST within the batch
            orders.filter(k % 33 == 0), "D", 20_000,
            F.lit(None).cast("string"), F.lit(None).cast("int"),
        ))
        .unionByName(_env_batch(  # inserts on fresh keys
            orders.filter(k % 30 == 0).withColumn(
                "o_orderkey", k + 100_000_000
            ), "I", 21_000,
            F.lit("N1"), (F.col("o_total_cents") + 1).cast("int"),
        ))
    )

    def _wait(cond, what: str, timeout: float = 240) -> None:
        end = _time.time() + timeout
        while _time.time() < end:
            if cond():
                return
            _time.sleep(0.5)
        raise RuntimeError(f"self-heal stream stalled waiting for {what}")

    mv = MaintainedAggregate(
        wh / "mv", ["o_orderstatus"], {"total_cents": "o_total_cents"}
    )
    sup = StreamSupervisor(
        spark, table, mv, wh / "ckpt", processing_interval="1 second"
    )
    table.merge(spark, b1)
    sup.start()
    try:
        _wait(
            lambda: mv.exists()
            and mv.meta()["applied_seq"] == table.manifest()["cdf_seq"],
            "initial catch-up",
        )
        # ---- live RENAME o_orderstatus -> o_status (mid-run barrier 1)
        v1 = _def_v1().columns  # ids 1..4 match creation order
        v1 = [
            v1[0], v1[1], v1[2],
            TableCol(id="4", name="o_total_cents", tp="int"),
        ]
        v2 = [
            v1[0], v1[1],
            TableCol(id="3", name="o_status", tp="varchar", precision="10"),
            v1[3],
        ]
        apply_column_diffs(spark, table, diff_columns(v1, v2))
        b2 = _env_batch(
            orders.filter(k % 27 == 0), "U", 30_000,
            F.lit("R2"), (F.col("o_total_cents") + 7).cast("int"),
        ).withColumnRenamed("o_orderstatus", "o_status")
        table.merge(spark, b2)
        _wait(
            lambda: mv.meta()["applied_seq"] == table.manifest()["cdf_seq"],
            "heal after rename",
        )
        # ---- live widening o_total_cents int -> bigint (barrier 2)
        v3 = [
            v2[0], v2[1], v2[2],
            TableCol(id="9", name="o_total_cents", tp="bigint"),
        ]
        apply_column_diffs(spark, table, diff_columns(v2, v3))
        b3 = _env_batch(
            orders.filter(k % 45 == 0), "U", 40_000,
            F.lit("W3"),
            (F.col("o_total_cents").cast("long") + F.lit(3_000_000_000)),
        ).withColumnRenamed("o_orderstatus", "o_status")
        table.merge(spark, b3)
        _wait(
            lambda: mv.meta()["applied_seq"] == table.manifest()["cdf_seq"],
            "heal after widening",
        )
    finally:
        stats = sup.stop()
    if stats["restarts"] < 2:
        raise RuntimeError(
            f"expected >=2 mid-run heals (rename + widening), got "
            f"{stats['restarts']} — the barriers did not exercise the "
            "supervisor"
        )
    return mv.read(spark).select(
        "o_orderstatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("total_cents").cast("long").alias("total_cents"),
    )


_SELFHEAL_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), final AS (
  SELECT k,
    CASE WHEN k % 45 = 0 THEN 'W3'
         WHEN k % 27 = 0 THEN 'R2'
         WHEN k % 21 = 0 THEN 'P1'
         ELSE st END AS st,
    CASE WHEN k % 45 = 0 THEN cents + 3000000000
         WHEN k % 27 = 0 THEN cents + 7
         WHEN k % 21 = 0 THEN cents + 100
         ELSE cents END AS cents
  FROM base
  WHERE NOT (k % 33 = 0 AND k % 27 <> 0 AND k % 45 <> 0)
  UNION ALL
  SELECT k + 100000000, 'N1', cents + 1 FROM base WHERE k % 30 = 0
)
SELECT st AS o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS total_cents
FROM final GROUP BY st
"""


# ---------------------------------------------------------------------------
# TPC-H Q12 as a LIVE view — EXPRESSION MEASURES through the join: the
# high/low conditional counts are row-local CASE expressions over the
# DIM attribute (o_orderpriority), maintained exactly because a signed
# joined-delta row evaluates the CASE exactly as the full join would.
# A dim-side priority flip rewrites every joined row it touches as a
# remove+add pair whose CASE arms differ — the fold nets the move with
# no rescan.  Batch twin: entry_analytics.q12_linestatus_priority.
# ---------------------------------------------------------------------------
_Q12VIEW_CACHE: dict[str, object] = {}
_Q12_HIGH = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


def pipeline_maintained_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q12VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_linestatus", "l_shipdate"
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("l_shipdate"), F.desc("l_linestatus")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q12view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[("l_orderkey", [])],
            fact_group_cols=["l_linestatus"],
            sum_cols={
                "high_lines": f"CASE WHEN {_Q12_HIGH} THEN 1 ELSE 0 END",
                "low_lines": f"CASE WHEN {_Q12_HIGH} THEN 0 ELSE 1 END",
            },
            measure_cols=["o_orderpriority"],
            fact_where=(
                "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
                "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
            ),
            fact_where_cols=["l_shipdate"],
        )
        mv.refresh_star(spark, li, [orders])  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_linestatus", "l_shipdate",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            # status move WITHIN the view + date move ACROSS the fact σ
            F.when(F.col("l_linestatus") == "O", F.lit("F"))
            .otherwise(F.lit("O")).alias("l_linestatus"),
            (F.col("l_shipdate") + F.expr("INTERVAL 300 DAY")).alias(
                "l_shipdate"
            ),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            F.lit("O").alias("l_linestatus"),
            F.lit("1997-06-15 00:00:00").cast("timestamp").alias("l_shipdate"),
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )
        # priority flips CROSS the CASE boundary through the join
        orders.merge(spark, ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
            F.lit("U").alias("flag"),
            F.lit("orders").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "o_orderkey",
            F.when(F.expr(_Q12_HIGH), F.lit("5-LOW"))
            .otherwise(F.lit("1-URGENT")).alias("o_orderpriority"),
        ))
        mv.refresh_star(spark, li, [orders])  # ONE two-feed fold
        _Q12VIEW_CACHE[sf_dir] = mv
    mv = _Q12VIEW_CACHE[sf_dir]
    return mv.read(spark).select(
        "l_linestatus",
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("high_lines").cast("long").alias("high_lines"),
        F.col("low_lines").cast("long").alias("low_lines"),
    )


_Q12VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_linestatus, l_shipdate FROM (
    SELECT l_orderkey, l_linenumber, l_linestatus, l_shipdate,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_shipdate DESC, l_linestatus DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN
                CASE WHEN l_linestatus = 'O' THEN 'F' ELSE 'O' END
              ELSE l_linestatus END AS l_linestatus,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 300 DAY
              ELSE l_shipdate END AS l_shipdate
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, 'O', TIMESTAMP '1997-06-15 00:00:00'
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN
                CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN '5-LOW' ELSE '1-URGENT' END
              ELSE o_orderpriority END AS o_orderpriority
  FROM orders
)
SELECT l.l_linestatus,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_lines,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_lines
FROM curl l JOIN curo o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
"""


# ---------------------------------------------------------------------------
# TPC-H Q7 as a LIVE view — DERIVED GROUP KEY at year grain: ship_year
# is a fact_derived_cols expression (year(l_shipdate)), so the
# maintained state is a (year × cust_nation × supp_nation) cube —
# ~25·25·7 groups instead of date-grain, the cardinality that matters
# at 100 TB — and a shipdate update that crosses a year boundary folds
# as a derived-group move.  The nation-pair σ and names resolve at
# READ over the tiny static nation dim (the maintained cube keeps ALL
# pairs, so the analyst can re-point the pair without a reseed).
# Batch twin: entry_analytics.q_volume_shipping.
# ---------------------------------------------------------------------------
_Q7VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q7VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_suppkey"), F.desc("l_shipdate")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q7view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        nation = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", []),              # orders (carries o_custkey)
                ("o_custkey", ["c_nationkey"]),  # customer, chained
                ("l_suppkey", ["s_nationkey"]),  # supplier
            ],
            fact_group_cols=["ship_year"],
            sum_cols={"revenue_cents": "revenue_c"},
            fact_derived_cols={
                "ship_year": ("CAST(year(l_shipdate) AS BIGINT)", ["l_shipdate"])
            },
        )
        mv.refresh_star(spark, li, [orders, cust, supp])  # seed
        # ROLE-PLAYING twin: the SAME nation table chained TWICE (off
        # customer's and supplier's nationkey) under per-role renames —
        # the maintained state is the (year × cust_nation × supp_nation)
        # NAME cube, relabeled live when nation itself churns
        mv2 = MaintainedStarAggregate(
            wh / "mv_roles",
            dims=[
                ("l_orderkey", []),
                ("o_custkey", []),               # carries c_nationkey
                ("l_suppkey", []),               # carries s_nationkey
                ("c_nationkey", ["cust_nation"]),  # nation ROLE A
                ("s_nationkey", ["supp_nation"]),  # nation ROLE B
            ],
            fact_group_cols=["ship_year"],
            sum_cols={"revenue_cents": "revenue_c"},
            fact_derived_cols={
                "ship_year": ("CAST(year(l_shipdate) AS BIGINT)", ["l_shipdate"])
            },
            dim_renames=[
                {}, {}, {},
                {"n_nationkey": "cn_key", "n_name": "cust_nation"},
                {"n_nationkey": "sn_key", "n_name": "supp_nation"},
            ],
        )
        mv2.refresh_star(spark, li, [orders, cust, supp, nation, nation])

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
                "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        # +400 days crosses a YEAR boundary — a derived-group move
        l_mv = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_suppkey",
            (F.col("l_shipdate") + F.expr("INTERVAL 400 DAY")).alias(
                "l_shipdate"
            ),
            (F.col("revenue_c") + 7).alias("revenue_c"),
        )
        l_re = li_src.filter(F.col("l_orderkey") % 10 == 5).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            "l_shipdate", "revenue_c",
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            (F.col("l_suppkey") % 89 + 1).alias("l_suppkey"),
            "l_shipdate", "revenue_c",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_mv, "U"))
            .unionByName(lbatch(l_re, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
            return df.select(
                F.lit("U").alias("flag"),
                F.lit(tbl).alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        orders.merge(spark, env(
            ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
                "o_orderkey", (F.col("o_custkey") % 100 + 1).alias("o_custkey")
            ),
            "orders", ["o_orderkey", "o_custkey"],
        ))
        cust.merge(spark, env(
            cust_src.filter(F.col("c_custkey") % 10 == 2).select(
                "c_custkey",
                ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
            ),
            "customer", ["c_custkey", "c_nationkey"],
        ))
        supp.merge(spark, env(
            supp_src.filter(F.col("s_suppkey") % 10 == 3).select(
                "s_suppkey",
                ((F.col("s_nationkey") + 3) % 25).alias("s_nationkey"),
            ),
            "supplier", ["s_suppkey", "s_nationkey"],
        ))
        # nation RENAMES relabel the cube's group keys through BOTH roles
        nation.merge(spark, env(
            nat_src.filter(F.col("n_nationkey") % 5 == 2).select(
                "n_nationkey",
                F.concat(F.col("n_name"), F.lit("_R")).alias("n_name"),
            ),
            "nation", ["n_nationkey", "n_name"],
        ))
        mv.refresh_star(spark, li, [orders, cust, supp])  # ONE 4-feed fold
        # ONE fold over all five slots (nation twice) — both roles' terms
        mv2.refresh_star(spark, li, [orders, cust, supp, nation, nation])
        _Q7VIEW_CACHE[sf_dir] = (mv, mv2)
    mv = _Q7VIEW_CACHE[sf_dir][0]
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        "n_nationkey", "n_name"
    ).filter(F.col("n_name").isin("NATION_3", "NATION_7"))
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    return (
        mv.read(spark)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", "ship_year")
        .agg(
            F.sum("n_rows").cast("long").alias("n_lineitems"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


def pipeline_maintained_q7_roles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Q7 NAME cube maintained with nation joined in TWO ROLES
    (cust_nation chained off customer, supp_nation off supplier — one
    table, one feed, two join slots under per-role renames).  A nation
    rename relabels every affected group through BOTH roles in the one
    fold; the read is the whole cube, so the fingerprint covers every
    (year, cust_nation, supp_nation) cell."""
    pipeline_maintained_q7(spark, sf_dir)  # build + churn the fixture
    mv2 = _Q7VIEW_CACHE[sf_dir][1]
    return mv2.read(spark).select(
        "supp_nation", "cust_nation",
        F.col("ship_year").cast("long").alias("ship_year"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
    )


_Q7ROLES_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_suppkey DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 400 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 7
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, (l_suppkey % 89) + 1, l_shipdate, revenue_c
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN (o_custkey % 100) + 1
              ELSE o_custkey END AS o_custkey
  FROM orders
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN (s_nationkey + 3) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
), curn AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 5 = 2 THEN n_name || '_R'
              ELSE n_name END AS n_name
  FROM nation
)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l.revenue_c) AS BIGINT) AS revenue_cents
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
JOIN curs s ON l.l_suppkey = s.s_suppkey
JOIN curn cn ON c.c_nationkey = cn.n_nationkey
JOIN curn sn ON s.s_nationkey = sn.n_nationkey
GROUP BY 1, 2, 3
"""


_Q7VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_suppkey DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 400 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 7
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, (l_suppkey % 89) + 1, l_shipdate, revenue_c
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN (o_custkey % 100) + 1
              ELSE o_custkey END AS o_custkey
  FROM orders
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN (s_nationkey + 3) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
)
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS ship_year,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(SUM(l.revenue_c) AS BIGINT) AS revenue_cents
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
JOIN curs s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
    OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# TPC-H Q14 as a LIVE view — both round-8 features at once: the revenue
# measure is a fact_derived_cols expression (cents quantization of
# l_extendedprice·(1−l_discount), so the managed table replicates the
# source's RAW columns), and the promo split is a CASE over the DIM's
# p_type.  A part flipping PROMO↔STANDARD moves its entire joined
# revenue between the measures in one fold; the maintained state is
# brand-grain (25 rows), the scalar (promo, total) pair is the read.
# Batch twin: entry_analytics.q14_promo_revenue.
# ---------------------------------------------------------------------------
_Q14VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q14VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate",
            "l_extendedprice", "l_discount",
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("l_extendedprice"), F.desc("l_discount"),
            F.desc("l_partkey"), F.desc("l_shipdate"),
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_brand", "p_type"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q14view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[("l_partkey", ["p_brand"])],
            fact_group_cols=[],
            sum_cols={
                "promo_cents": (
                    "CASE WHEN p_type = 'PROMO' THEN disc_cents ELSE 0 END"
                ),
                "total_cents": "disc_cents",
            },
            measure_cols=["p_type"],
            fact_derived_cols={
                "disc_cents": (
                    "CAST(round(l_extendedprice * (1 - l_discount) * 100.0) "
                    "AS BIGINT)",
                    ["l_extendedprice", "l_discount"],
                )
            },
            fact_where=(
                "l_shipdate >= TIMESTAMP '1997-03-01 00:00:00' AND "
                "l_shipdate < TIMESTAMP '1997-06-01 00:00:00'"
            ),
            fact_where_cols=["l_shipdate"],
        )
        mv.refresh_star(spark, li, [part])  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_shipdate",
                "l_extendedprice", "l_discount",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            # crosses the σ window; price change re-derives the measure
            (F.col("l_shipdate") + F.expr("INTERVAL 100 DAY")).alias(
                "l_shipdate"
            ),
            (F.col("l_extendedprice") + 1.5).alias("l_extendedprice"),
            "l_discount",
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            "l_partkey",
            F.lit("1997-04-10 00:00:00").cast("timestamp").alias("l_shipdate"),
            "l_extendedprice", "l_discount",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )
        # PROMO↔STANDARD flips move revenue between the CASE arms
        part.merge(spark, part_src.filter(F.col("p_partkey") % 7 == 1).select(
            F.lit("U").alias("flag"),
            F.lit("part").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "p_partkey", "p_brand",
            F.when(F.col("p_type") == "PROMO", F.lit("STANDARD"))
            .otherwise(F.lit("PROMO")).alias("p_type"),
        ))
        mv.refresh_star(spark, li, [part])  # ONE two-feed fold
        _Q14VIEW_CACHE[sf_dir] = mv
    mv = _Q14VIEW_CACHE[sf_dir]
    return mv.read(spark).agg(
        F.sum("n_rows").cast("long").alias("n_lines"),
        F.coalesce(F.sum("promo_cents"), F.lit(0)).cast("long").alias(
            "promo_revenue_cents"
        ),
        F.coalesce(F.sum("total_cents"), F.lit(0)).cast("long").alias(
            "total_revenue_cents"
        ),
    )


_Q14VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate,
         l_extendedprice, l_discount FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_shipdate,
           l_extendedprice, l_discount,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_extendedprice DESC, l_discount DESC,
                      l_partkey DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey, l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 100 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN l_extendedprice + 1.5
              ELSE l_extendedprice END AS l_extendedprice,
         l_discount
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, l_partkey, TIMESTAMP '1997-04-10 00:00:00',
         l_extendedprice, l_discount
  FROM li WHERE l_orderkey % 25 = 3
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 7 = 1 THEN
                CASE WHEN p_type = 'PROMO' THEN 'STANDARD' ELSE 'PROMO' END
              ELSE p_type END AS p_type
  FROM part
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COALESCE(SUM(CASE WHEN p.p_type = 'PROMO'
         THEN CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
                   AS BIGINT) ELSE 0 END), 0) AS BIGINT)
         AS promo_revenue_cents,
       CAST(COALESCE(SUM(
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
              AS BIGINT)), 0) AS BIGINT) AS total_revenue_cents
FROM curl l JOIN curp p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate < TIMESTAMP '1997-06-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# TPC-H Q15 COMPOSED — the per-supplier quarter-revenue rollup is a
# single-table maintained WHERE-view (matview.py) at supplier grain;
# the argmax (rank-1, spec tie semantics) and the name join run at READ
# over supplier-count-sized state.  Churn deletes the leader's rows,
# re-ranks by revenue updates, and moves rows across the σ window.
# Batch twin: entry_analytics.q15_top_supplier.
# ---------------------------------------------------------------------------
_Q15VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q15VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_suppkey"), F.desc("l_shipdate")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q15view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        mv = MaintainedAggregate(
            wh / "mv",
            group_cols=["l_suppkey"],
            sum_cols={"total_revenue_cents": "revenue_c"},
            where=(
                "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
                "l_shipdate < TIMESTAMP '1997-04-01 00:00:00'"
            ),
            where_cols=["l_shipdate"],
        )
        mv.refresh(spark, li)  # seed

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_suppkey", "l_shipdate",
                "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_suppkey",
            (F.col("l_shipdate") + F.expr("INTERVAL 120 DAY")).alias(
                "l_shipdate"
            ),
            (F.col("revenue_c") + 1000).alias("revenue_c"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            (F.col("l_suppkey") % 89 + 1).alias("l_suppkey"),
            F.lit("1997-02-14 00:00:00").cast("timestamp").alias("l_shipdate"),
            "revenue_c",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_upd, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )
        mv.refresh(spark, li)  # fold the churn
        _Q15VIEW_CACHE[sf_dir] = mv
    mv = _Q15VIEW_CACHE[sf_dir]
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    wr = Window.orderBy(F.desc("total_revenue_cents"))
    return (
        mv.read(spark)
        .withColumn("__rk", F.rank().over(wr))
        .filter(F.col("__rk") == 1)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_revenue_cents").cast("long").alias(
                "total_revenue_cents"
            ),
        )
    )


_Q15VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_suppkey DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 120 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 1000
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT (l_suppkey % 89) + 1, TIMESTAMP '1997-02-14 00:00:00', revenue_c
  FROM li WHERE l_orderkey % 25 = 3
), rev AS (
  SELECT l_suppkey,
         CAST(SUM(revenue_c) AS BIGINT) AS total_revenue_cents
  FROM curl
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_cents
FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
QUALIFY rank() OVER (ORDER BY r.total_revenue_cents DESC) = 1
"""


# ---------------------------------------------------------------------------
# HLL sketch as DERIVED STATE — the approximate-distinct tier
# maintained from the feed: an insert-only commit folds the registers
# by max in O(changes + registers); a delete-bearing commit triggers
# the documented register recount (HLL cannot subtract), asserted here
# so a green row proves BOTH paths ran.  Registers, harmonic sum, and
# the raw estimate are bit-equal to a DuckDB recompute over the folded
# state.  Exact sibling: pipeline_incremental_distinct.
# ---------------------------------------------------------------------------
_HLLVIEW_CACHE: dict[str, object] = {}
_HLL_P = 10


def pipeline_maintained_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedHLLSketch, hll_numerator

    if sf_dir not in _HLLVIEW_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_hllview_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        sk = MaintainedHLLSketch(
            wh / "sk", ["o_orderpriority"], "o_custkey", p=_HLL_P
        )
        sk.refresh(spark, orders)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority",
            )

        # commit 1: INSERT-ONLY → the max-fold path
        orders.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + 500_000).alias("o_custkey"),
                "o_orderpriority",
            ),
            "I",
        ))
        sk.refresh(spark, orders)
        if int(sk.meta()["recounts"]) != 0:
            raise RuntimeError(
                "insert-only commit took the recount path — the "
                "monotone fold is broken"
            )
        # commit 2: DELETES → the recount path (registers must drop)
        orders.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 10 == 7), "D"
        ))
        sk.refresh(spark, orders)
        if int(sk.meta()["recounts"]) != 1:
            raise RuntimeError(
                "delete-bearing commit did not trigger the register "
                "recount — the sketch would silently overestimate"
            )
        _HLLVIEW_CACHE[sf_dir] = sk
    sk = _HLLVIEW_CACHE[sf_dir]
    return (
        sk.estimate(spark)
        .select(
            "o_orderpriority",
            F.col("used_buckets").cast("long").alias("used_buckets"),
            F.col("hsum_scaled").cast("long").alias("hsum_scaled"),
            "est_raw",
        )
    )


def _hllview_oracle() -> str:
    from .operators.sketch import hll_numerator, hll_register_sql

    p = _HLL_P
    m = 1 << p
    wp1 = 61 - p
    bucket, rho = hll_register_sql("o_custkey", p)
    a = hll_numerator(p)
    return f"""
WITH cur AS (
  SELECT o_orderkey, o_custkey, o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey + 500000, o_orderpriority
  FROM orders WHERE o_orderkey % 25 = 3
), regs AS (
  SELECT o_orderpriority, {bucket} AS bucket, MAX({rho}) AS rho
  FROM cur WHERE o_custkey IS NOT NULL
  GROUP BY 1, 2
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS used_buckets,
       CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS hsum_scaled,
       {a!r} / CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS est_raw
FROM regs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# HLL register ROLLUP — the mergeable-sketch payoff: coarser-grain
# distinct (here the GLOBAL o_custkey cardinality) answered by
# max-merging the per-priority registers, NO base scan.  Spark rolls
# the maintained fine-grain sketch up; the DuckDB oracle builds the
# coarse sketch DIRECTLY from the churned base rows — bit-equal
# registers prove the merge is exact (a register is a max over its
# group's rows, and the fine groups partition the base).
# ---------------------------------------------------------------------------
def pipeline_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipeline_maintained_hll(spark, sf_dir)  # share the maintained fixture
    sk = _HLLVIEW_CACHE[sf_dir]
    return sk.estimate_rollup(spark, []).select(
        F.col("used_buckets").cast("long").alias("used_buckets"),
        F.col("hsum_scaled").cast("long").alias("hsum_scaled"),
        "est_raw",
    )


def _hll_rollup_oracle() -> str:
    from .operators.sketch import hll_numerator, hll_register_sql

    p = _HLL_P
    m = 1 << p
    wp1 = 61 - p
    bucket, rho = hll_register_sql("o_custkey", p)
    a = hll_numerator(p)
    return f"""
WITH cur AS (
  SELECT o_orderkey, o_custkey, o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey + 500000, o_orderpriority
  FROM orders WHERE o_orderkey % 25 = 3
), regs AS (
  SELECT {bucket} AS bucket, MAX({rho}) AS rho
  FROM cur WHERE o_custkey IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS used_buckets,
       CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS hsum_scaled,
       {a!r} / CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS est_raw
FROM regs
"""


# ---------------------------------------------------------------------------
# HLL CROSS-TABLE union — the sketch-algebra payoff one level up from
# the rollup: distinct custkeys across TWO tables (the churned orders
# feed ∪ the customer dimension) answered by max-merging two maintained
# sketches' registers, scanning NEITHER base.  The oracle builds the
# union sketch directly from both tables' live rows — bit-equal
# registers prove the cross-table merge exact (registers are maxes and
# the two tables partition the bag union).
# ---------------------------------------------------------------------------
_HLL_UNION_CACHE: dict[str, object] = {}


def pipeline_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedHLLSketch

    pipeline_maintained_hll(spark, sf_dir)  # the churned orders sketch
    sk_orders = _HLLVIEW_CACHE[sf_dir]
    if sf_dir not in _HLL_UNION_CACHE:
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_hllunion_"))
        cust = ManagedTable(wh / "cust").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        sk_cust = MaintainedHLLSketch(wh / "sk", [], "c_custkey", p=_HLL_P)
        sk_cust.refresh(spark, cust)
        _HLL_UNION_CACHE[sf_dir] = sk_cust
    sk_cust = _HLL_UNION_CACHE[sf_dir]
    return sk_orders.estimate_union(spark, sk_cust, []).select(
        F.col("used_buckets").cast("long").alias("used_buckets"),
        F.col("hsum_scaled").cast("long").alias("hsum_scaled"),
        "est_raw",
    )


def _hll_union_oracle() -> str:
    from .operators.sketch import hll_numerator, hll_register_sql

    p = _HLL_P
    m = 1 << p
    wp1 = 61 - p
    bucket, rho = hll_register_sql("ck", p)
    a = hll_numerator(p)
    return f"""
WITH cur AS (
  SELECT o_custkey AS ck FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_custkey + 500000 FROM orders WHERE o_orderkey % 25 = 3
  UNION ALL
  SELECT c_custkey FROM customer
), regs AS (
  SELECT {bucket} AS bucket, MAX({rho}) AS rho
  FROM cur WHERE ck IS NOT NULL
  GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS used_buckets,
       CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS hsum_scaled,
       {a!r} / CAST(SUM(CAST(1 AS BIGINT) << ({wp1} - rho))
            + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << {wp1})
            AS BIGINT) AS est_raw
FROM regs
"""


# ---------------------------------------------------------------------------
# Approximate QUANTILES as maintained state — the sketch tier of the
# quantile family (exact sibling: pipeline_distinct_quantile's support
# store).  A fixed-width integer histogram per o_orderpriority over
# order cents: bin counts are SIGNED aggregates, so the delete-bearing
# churn below folds in O(changes + touched bins) with NO recount path
# (the HLL sibling's weakness) — and the whole answer (rank, total,
# bin bounds) is pure integer algebra, hash-verified vs a DuckDB
# recompute including its own cumulative-walk quantile read.
# ---------------------------------------------------------------------------
_QSKETCH_CACHE: dict[str, object] = {}
_QSKETCH_W = 100_000  # $1000 bins over order cents


def pipeline_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedQuantileHistogram

    if sf_dir not in _QSKETCH_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderpriority",
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias(
                "cents"
            ),
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_qsketch_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        qh = MaintainedQuantileHistogram(
            wh / "qh", ["o_orderpriority"], "cents", bin_width=_QSKETCH_W
        )
        qh.refresh(spark, orders)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_orderpriority", "cents",
            )

        # ONE slice carrying deletes, bin-crossing updates AND inserts:
        # the signed fold must drain bins, move bins, and open bins
        orders.merge(
            spark,
            batch(ord_src.filter(F.col("o_orderkey") % 10 == 7), "D")
            .unionByName(batch(
                ord_src.filter(F.col("o_orderkey") % 10 == 4).select(
                    "o_orderkey", "o_orderpriority",
                    (F.col("cents") + 150_000).alias("cents"),
                ),
                "U",
            ))
            .unionByName(batch(
                ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                    (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                    "o_orderpriority",
                    (F.col("cents") * 2).alias("cents"),
                ),
                "I",
            )),
        )
        qh.refresh(spark, orders)
        _QSKETCH_CACHE[sf_dir] = qh
    qh = _QSKETCH_CACHE[sf_dir]
    return qh.quantiles(spark, [250, 500, 900])


_QSKETCH_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), cur AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 4 THEN cents + 150000
              ELSE cents END AS cents
  FROM base WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderpriority, cents * 2 FROM base WHERE o_orderkey % 25 = 3
), hist AS (
  SELECT o_orderpriority,
         (((cents) - (((cents) % {_QSKETCH_W} + {_QSKETCH_W})
            % {_QSKETCH_W}))) // {_QSKETCH_W} AS bin,
         COUNT(*) AS n
  FROM cur WHERE cents IS NOT NULL GROUP BY 1, 2
), cum AS (
  SELECT o_orderpriority, bin, n,
         SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY bin) AS cum,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS total
  FROM hist
), q AS (SELECT unnest([250, 500, 900]) AS q_milli)
SELECT o_orderpriority, CAST(q_milli AS BIGINT) AS q_milli,
       CAST(rank AS BIGINT) AS rank, CAST(total AS BIGINT) AS total,
       CAST(bin_lo AS BIGINT) AS bin_lo, CAST(bin_hi AS BIGINT) AS bin_hi
FROM (
  SELECT c.o_orderpriority, q.q_milli,
         GREATEST(1, (q.q_milli * c.total + 999) // 1000) AS rank,
         c.total, c.bin * {_QSKETCH_W} AS bin_lo,
         (c.bin + 1) * {_QSKETCH_W} AS bin_hi,
         row_number() OVER (
           PARTITION BY c.o_orderpriority, q.q_milli ORDER BY c.bin
         ) AS rn
  FROM cum c CROSS JOIN q
  WHERE c.cum >= GREATEST(1, (q.q_milli * c.total + 999) // 1000)
) WHERE rn = 1
"""


# BETWEEN-selectivity from the SAME maintained bins, bracketed both
# sides: est_lo sums fully-contained bins, est_hi adds the edge bins —
# the binned tier's twin of the dyadic pipeline_cms_range_count (which
# can only overestimate).  Ranges chosen to exercise all three edge
# shapes: bin-aligned (bracket collapses, est_lo == est_hi),
# misaligned edges, and a sub-bin range (est_lo = 0).
_QRANGE_RANGES = [
    (0, 9_999_999),          # 100 whole bins: est_lo == est_hi
    (150_000, 5_000_000),    # misaligned lo edge
    (33_333, 77_777),        # inside one bin: est_lo = 0
]


def pipeline_quantile_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipeline_quantile_sketch(spark, sf_dir)  # share the maintained fixture
    qh = _QSKETCH_CACHE[sf_dir]
    return qh.estimate_range(spark, _QRANGE_RANGES).select(
        "o_orderpriority",
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
        F.col("est_lo").cast("long").alias("est_lo"),
        F.col("est_hi").cast("long").alias("est_hi"),
    )


_QRANGE_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), cur AS (
  SELECT o_orderpriority,
         CASE WHEN o_orderkey % 10 = 4 THEN cents + 150000
              ELSE cents END AS cents
  FROM base WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderpriority, cents * 2 FROM base WHERE o_orderkey % 25 = 3
), hist AS (
  SELECT o_orderpriority,
         (((cents) - (((cents) % {_QSKETCH_W} + {_QSKETCH_W})
            % {_QSKETCH_W}))) // {_QSKETCH_W} AS bin,
         COUNT(*) AS n
  FROM cur WHERE cents IS NOT NULL GROUP BY 1, 2
), ranges(lo, hi) AS (
  VALUES {", ".join(f"({lo}, {hi})" for lo, hi in _QRANGE_RANGES)}
), groups AS (
  SELECT DISTINCT o_orderpriority FROM hist
)
SELECT g.o_orderpriority, CAST(r.lo AS BIGINT) AS lo,
       CAST(r.hi AS BIGINT) AS hi,
       CAST(COALESCE(SUM(CASE WHEN h.bin * {_QSKETCH_W} >= r.lo
            AND (h.bin + 1) * {_QSKETCH_W} - 1 <= r.hi
            THEN h.n END), 0) AS BIGINT) AS est_lo,
       CAST(COALESCE(SUM(CASE WHEN h.bin * {_QSKETCH_W} <= r.hi
            AND (h.bin + 1) * {_QSKETCH_W} - 1 >= r.lo
            THEN h.n END), 0) AS BIGINT) AS est_hi
FROM groups g CROSS JOIN ranges r
LEFT JOIN hist h ON h.o_orderpriority = g.o_orderpriority
GROUP BY 1, 2, 3
"""


def pipeline_quantile_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL quantiles from the per-priority histogram — bin counts
    ADD across groups, so the coarse answer needs no base scan; the
    oracle recomputes the global histogram AND its cumulative walk
    directly from the churned rows."""
    pipeline_quantile_sketch(spark, sf_dir)  # share the maintained fixture
    qh = _QSKETCH_CACHE[sf_dir]
    return qh.quantiles_rollup(spark, [250, 500, 900], [])


_QROLLUP_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), cur AS (
  SELECT CASE WHEN o_orderkey % 10 = 4 THEN cents + 150000
              ELSE cents END AS cents
  FROM base WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT cents * 2 FROM base WHERE o_orderkey % 25 = 3
), hist AS (
  SELECT (((cents) - (((cents) % {_QSKETCH_W} + {_QSKETCH_W})
            % {_QSKETCH_W}))) // {_QSKETCH_W} AS bin,
         COUNT(*) AS n
  FROM cur WHERE cents IS NOT NULL GROUP BY 1
), cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin) AS cum,
         SUM(n) OVER () AS total
  FROM hist
), q AS (SELECT unnest([250, 500, 900]) AS q_milli)
SELECT CAST(q_milli AS BIGINT) AS q_milli,
       CAST(rank AS BIGINT) AS rank, CAST(total AS BIGINT) AS total,
       CAST(bin_lo AS BIGINT) AS bin_lo, CAST(bin_hi AS BIGINT) AS bin_hi
FROM (
  SELECT q.q_milli,
         GREATEST(1, (q.q_milli * c.total + 999) // 1000) AS rank,
         c.total, c.bin * {_QSKETCH_W} AS bin_lo,
         (c.bin + 1) * {_QSKETCH_W} AS bin_hi,
         row_number() OVER (
           PARTITION BY q.q_milli ORDER BY c.bin
         ) AS rn
  FROM cum c CROSS JOIN q
  WHERE c.cum >= GREATEST(1, (q.q_milli * c.total + 999) // 1000)
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Count-Min sketch as DERIVED STATE — the FREQUENCY family's sketch
# tier, completing the three-way symmetry (distinct→HLL registers,
# quantiles→binned histogram, frequencies→CM counters).  CM is LINEAR:
# the churn below (inserts + group-moving updates + deletes) folds as
# signed counter deltas in ONE code path — no recount arm exists (the
# meta carries `folds`, never `recounts`) — and the serving read is
# pure integer algebra over the state (min across depth rows), never
# the base.  Counters AND estimates are bit-equal to a DuckDB
# recompute.  Exact sibling: the heavy-hitter support store
# (pipeline_distinct_topk).
# ---------------------------------------------------------------------------
_CMS_CACHE: dict[str, object] = {}
_CMS_D = 3
_CMS_W = 1024


def pipeline_maintained_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedCountMinSketch

    if sf_dir not in _CMS_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_cmsview_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        sk = MaintainedCountMinSketch(
            wh / "sk", ["o_orderpriority"], "o_custkey",
            depth=_CMS_D, width=_CMS_W,
        )
        sk.refresh(spark, orders)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority",
            )

        # commit 1: INSERTS (new keys, shifted custkeys)
        orders.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + 500_000).alias("o_custkey"),
                "o_orderpriority",
            ),
            "I",
        ))
        sk.refresh(spark, orders)
        # commit 2: UPDATES moving mass into the probe range + DELETES,
        # one slice — the ± fold drains and moves counters together
        orders.merge(
            spark,
            batch(
                ord_src.filter(F.col("o_orderkey") % 10 == 4).select(
                    "o_orderkey",
                    (F.col("o_custkey") % 1000 + 1).alias("o_custkey"),
                    "o_orderpriority",
                ),
                "U",
            ).unionByName(
                batch(ord_src.filter(F.col("o_orderkey") % 10 == 7), "D")
            ),
        )
        sk.refresh(spark, orders)
        m = sk.meta()
        if int(m["folds"]) != 2 or "recounts" in m:
            raise RuntimeError(
                "CM maintenance did not take the linear fold path "
                f"twice (meta: {m}) — the turnstile contract is broken"
            )
        _CMS_CACHE[sf_dir] = sk
    sk = _CMS_CACHE[sf_dir]
    probes = (
        sk.read(spark)
        .select("o_orderpriority")
        .distinct()
        .crossJoin(
            spark.range(1, 41).select(F.col("id").alias("o_custkey"))
        )
    )
    return sk.estimate(spark, probes).select(
        "o_orderpriority",
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("est").cast("long").alias("est"),
    )


def _cms_oracle() -> str:
    from .operators.sketch import cms_bucket_sql

    cb = cms_bucket_sql("o_custkey", "t.d", _CMS_W)
    pb = cms_bucket_sql("p.o_custkey", "p.depth", _CMS_W)
    return f"""
WITH cur AS (
  SELECT CASE WHEN o_orderkey % 10 = 4 THEN o_custkey % 1000 + 1
              ELSE o_custkey END AS o_custkey,
         o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_custkey + 500000, o_orderpriority
  FROM orders WHERE o_orderkey % 25 = 3
), counters AS (
  SELECT o_orderpriority, t.d AS depth, {cb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cur, range({_CMS_D}) t(d)
  WHERE o_custkey IS NOT NULL
  GROUP BY 1, 2, 3
), probes AS (
  SELECT g.o_orderpriority, v.cust AS o_custkey, t.d AS depth
  FROM (SELECT DISTINCT o_orderpriority FROM cur
        WHERE o_custkey IS NOT NULL) g,
       range(1, 41) v(cust), range({_CMS_D}) t(d)
)
SELECT p.o_orderpriority, CAST(p.o_custkey AS BIGINT) AS o_custkey,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
FROM probes p
LEFT JOIN counters c
  ON c.o_orderpriority = p.o_orderpriority
 AND c.depth = p.depth AND c.bucket = {pb}
GROUP BY 1, 2
"""


def pipeline_cms_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL frequency estimates by ADDING the per-priority counters —
    linearity means the merged sketch IS the sketch of the whole table;
    the oracle builds the global counters directly from the churned
    rows, so bit-equal estimates prove the merge exact."""
    pipeline_maintained_cms(spark, sf_dir)  # share the maintained fixture
    sk = _CMS_CACHE[sf_dir]
    probes = spark.range(1, 41).select(F.col("id").alias("o_custkey"))
    return sk.estimate_rollup(spark, probes, []).select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("est").cast("long").alias("est"),
    )


def _cms_rollup_oracle() -> str:
    from .operators.sketch import cms_bucket_sql

    cb = cms_bucket_sql("o_custkey", "t.d", _CMS_W)
    pb = cms_bucket_sql("p.o_custkey", "p.depth", _CMS_W)
    return f"""
WITH cur AS (
  SELECT CASE WHEN o_orderkey % 10 = 4 THEN o_custkey % 1000 + 1
              ELSE o_custkey END AS o_custkey
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_custkey + 500000 FROM orders WHERE o_orderkey % 25 = 3
), counters AS (
  SELECT t.d AS depth, {cb} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cur, range({_CMS_D}) t(d)
  WHERE o_custkey IS NOT NULL
  GROUP BY 1, 2
), probes AS (
  SELECT v.cust AS o_custkey, t.d AS depth
  FROM range(1, 41) v(cust), range({_CMS_D}) t(d)
)
SELECT CAST(p.o_custkey AS BIGINT) AS o_custkey,
       CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est
FROM probes p
LEFT JOIN counters c ON c.depth = p.depth AND c.bucket = {pb}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Dyadic CM heavy-hitter ENUMERATION (operators/sketch.py
# MaintainedCMHeavyHitters — Cormode & Muthukrishnan, TODS 2005): the
# turnstile "NAME the heavy values" answer the plain CMS cannot give.
# Lifecycle: a value carrying ~1/3 of the mass DECAYS below threshold
# via deletes, a new value GROWS past it via inserts, and an update
# wave concentrates mass on a ~3·10^12 value so the descent exercises
# deep prefix levels.  The oracle rebuilds the ENTIRE dyadic structure
# (8 levels of counters) and replays the 8-step descent as chained
# CTEs — bit-equal output proves fold, levels, and descent exact.
# ---------------------------------------------------------------------------
_CMHH_CACHE: dict[str, tuple[object, int]] = {}
_CMHH_D = 3
_CMHH_W = 2048
_CMHH_BIG = 3_000_000_000_007


def pipeline_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedCMHeavyHitters

    if sf_dir not in _CMHH_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            F.col("o_orderpriority").alias("prio"),
            F.when(F.col("o_orderkey") % 3 == 0, F.lit(50))
            .otherwise(F.col("o_custkey") % 97)
            .cast("long")
            .alias("v"),
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_cmhh_"))
        t = ManagedTable(wh / "vals").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        hh = MaintainedCMHeavyHitters(
            wh / "hh", ["prio"], "v", depth=_CMHH_D, width=_CMHH_W
        )
        hh.refresh(spark, t)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("vals").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "prio", "v",
            )

        # commit 1: INSERTS concentrate fresh mass on v=61 (grows heavy)
        t.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "prio",
                F.lit(61).cast("long").alias("v"),
            ),
            "I",
        ))
        hh.refresh(spark, t)
        # commit 2: DELETE every v=50 carrier (the heavy value DECAYS
        # below threshold) + UPDATES concentrating mass on a ~3·10^12
        # value (deep prefix levels); update keys disjoint from deletes
        t.merge(
            spark,
            batch(ord_src.filter(F.col("o_orderkey") % 3 == 0), "D")
            .unionByName(batch(
                ord_src.filter(
                    (F.col("o_orderkey") % 10 == 4)
                    & (F.col("o_orderkey") % 3 != 0)
                ).select(
                    "o_orderkey", "prio",
                    F.lit(_CMHH_BIG).cast("long").alias("v"),
                ),
                "U",
            )),
        )
        hh.refresh(spark, t)
        m = hh.meta()
        if int(m["folds"]) != 2 or "recounts" in m:
            raise RuntimeError(
                "dyadic CM maintenance did not take the linear fold "
                f"path twice (meta: {m})"
            )
        n_live = t.read(spark).filter(F.col("v").isNotNull()).count()
        thr = max(1, n_live // 250)
        # fixture sanity: the decay/growth story must actually happen
        live = {
            r["v"]: r["n"]
            for r in t.read(spark).groupBy("v")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if live.get(61, 0) < thr or live.get(_CMHH_BIG, 0) < thr:
            raise RuntimeError(
                f"fixture lost its grown heavy values (thr={thr})"
            )
        _CMHH_CACHE[sf_dir] = (hh, thr)
    hh, thr = _CMHH_CACHE[sf_dir]
    return hh.enumerate_heavy(spark, thr).select(
        "prio",
        F.col("v").cast("long").alias("v"),
        F.col("est").cast("long").alias("est"),
    )


# planner-facing range selectivity from the same dyadic state: each
# BETWEEN predicate decomposes into its canonical cover and the answer
# is the sum of per-node CM estimates — never an underestimate.  The
# oracle embeds the IDENTICAL node set (the builder calls the same
# dyadic_cover), so the whole read is hash-verified.
_CMHH_RANGES = [
    (40, 70),                                      # straddles 50 + 61
    (2_999_999_999_900, 3_000_000_000_100),        # the deep huge value
    (0, 1 << 62),                                  # full domain (top nodes)
]


def pipeline_cms_range_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipeline_cms_heavy_hitters(spark, sf_dir)  # share the maintained fixture
    hh, _thr = _CMHH_CACHE[sf_dir]
    return hh.estimate_range(spark, _CMHH_RANGES).select(
        "prio",
        F.col("lo").cast("long").alias("lo"),
        F.col("hi").cast("long").alias("hi"),
        F.col("est").cast("long").alias("est"),
    )


def _cmhh_range_oracle() -> str:
    from .operators.sketch import cms_bucket_sql, dyadic_cover

    cb = cms_bucket_sql(
        "(v // (CAST(1 AS BIGINT) << (8 * l.lv)))", "t.d", _CMHH_W
    )
    pb = cms_bucket_sql("p.pfx", "p.depth", _CMHH_W)
    vals = ", ".join(
        f"({lo}, {hi}, {lvl}, {pfx})"
        for lo, hi in _CMHH_RANGES
        for lvl, pfx in dyadic_cover(lo, hi)
    )
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(CASE WHEN o_orderkey % 3 = 0 THEN 50
                   ELSE o_custkey % 97 END AS BIGINT) AS v
  FROM orders
), cur AS (
  SELECT prio,
         CASE WHEN o_orderkey % 10 = 4 AND o_orderkey % 3 <> 0
              THEN CAST({_CMHH_BIG} AS BIGINT) ELSE v END AS v
  FROM base WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT prio, CAST(61 AS BIGINT) FROM base WHERE o_orderkey % 25 = 3
), counters AS (
  SELECT prio, l.lv AS level, t.d AS depth, {cb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cur, range(8) l(lv), range({_CMHH_D}) t(d)
  WHERE v IS NOT NULL
  GROUP BY 1, 2, 3, 4
), nodes(lo, hi, level, pfx) AS (
  VALUES {vals}
), node_probe AS (
  SELECT g.prio, n.lo, n.hi, n.level, n.pfx, t.d AS depth
  FROM (SELECT DISTINCT prio FROM cur WHERE v IS NOT NULL) g,
       nodes n, range({_CMHH_D}) t(d)
), node_est AS (
  SELECT p.prio, p.lo, p.hi, p.level, p.pfx,
         CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS e
  FROM node_probe p
  LEFT JOIN counters c ON c.prio = p.prio AND c.level = p.level
       AND c.depth = p.depth AND c.bucket = {pb}
  GROUP BY 1, 2, 3, 4, 5
)
SELECT prio, CAST(lo AS BIGINT) AS lo, CAST(hi AS BIGINT) AS hi,
       CAST(SUM(e) AS BIGINT) AS est
FROM node_est GROUP BY 1, 2, 3
"""


# the third read family from the same dyadic state: per-group
# quantiles by rank WALK down the prefix tree (no bin-width parameter,
# state independent of the value range).  The oracle replays the walk —
# totals, rank clamps, per-level cumsum pick — as chained CTEs.
_CMHH_QS = [250, 500, 900]


_CMHH_QDF: dict[str, DataFrame] = {}


def pipeline_cms_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    pipeline_cms_heavy_hitters(spark, sf_dir)  # share the maintained fixture
    # the walk statement is PREPARED once per process and re-executed —
    # analysis of the 8-hop window chain is ~half its fresh-call cost,
    # and a serving layer prepares a fixed read once; the fixture is
    # static after build, so the prepared plan's pinned state version
    # stays current (a refreshed sketch would need re-preparation)
    if sf_dir not in _CMHH_QDF:
        hh, _thr = _CMHH_CACHE[sf_dir]
        _CMHH_QDF[sf_dir] = hh.quantile_values(spark, _CMHH_QS).select(
            "prio",
            F.col("q_milli").cast("long").alias("q_milli"),
            F.col("rank").cast("long").alias("rank"),
            F.col("total").cast("long").alias("total"),
            F.col("value").cast("long").alias("value"),
            F.col("est").cast("long").alias("est"),
        )
    return _CMHH_QDF[sf_dir]


def _cmhh_quantile_oracle() -> str:
    from .operators.sketch import cms_bucket_sql

    cb = cms_bucket_sql(
        "(v // (CAST(1 AS BIGINT) << (8 * l.lv)))", "t.d", _CMHH_W
    )
    tb = cms_bucket_sql("b.pfx", "b.depth", _CMHH_W)
    qs_vals = ", ".join(f"({q})" for q in _CMHH_QS)
    walk = []
    for lv in range(6, -1, -1):
        walk.append(f"""e{lv} AS (
  SELECT b.prio, b.q_milli, b.rank, b.total, b.R, b.pfx,
         CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS e
  FROM (SELECT s.prio, s.q_milli, s.rank, s.total, s.R,
               s.pfx * 256 + o.o AS pfx, t.d AS depth
        FROM w{lv + 1} s, range(256) o(o), range({_CMHH_D}) t(d)) b
  LEFT JOIN counters c ON c.prio = b.prio AND c.level = {lv}
       AND c.depth = b.depth AND c.bucket = {tb}
  GROUP BY 1, 2, 3, 4, 5, 6
), w{lv} AS (
  SELECT prio, q_milli, rank, total, pfx, e,
         CASE WHEN tc > 0 THEN LEAST(R, tc) - cum + e
              ELSE 1 END AS R
  FROM (
    SELECT *,
           SUM(e) OVER (PARTITION BY prio, q_milli ORDER BY pfx) AS cum,
           SUM(e) OVER (PARTITION BY prio, q_milli) AS tc
    FROM e{lv}
  )
  QUALIFY row_number() OVER (PARTITION BY prio, q_milli
      ORDER BY CASE WHEN tc > 0 AND cum >= LEAST(R, tc) THEN 0 ELSE 1 END,
               pfx) = 1
)""")
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(CASE WHEN o_orderkey % 3 = 0 THEN 50
                   ELSE o_custkey % 97 END AS BIGINT) AS v
  FROM orders
), cur AS (
  SELECT prio,
         CASE WHEN o_orderkey % 10 = 4 AND o_orderkey % 3 <> 0
              THEN CAST({_CMHH_BIG} AS BIGINT) ELSE v END AS v
  FROM base WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT prio, CAST(61 AS BIGINT) FROM base WHERE o_orderkey % 25 = 3
), counters AS (
  SELECT prio, l.lv AS level, t.d AS depth, {cb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cur, range(8) l(lv), range({_CMHH_D}) t(d)
  WHERE v IS NOT NULL
  GROUP BY 1, 2, 3, 4
), tops AS (
  SELECT b.prio, b.pfx, CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS e
  FROM (SELECT g.prio, p.p AS pfx, t.d AS depth
        FROM (SELECT DISTINCT prio FROM cur WHERE v IS NOT NULL) g,
             range(128) p(p), range({_CMHH_D}) t(d)) b
  LEFT JOIN counters c ON c.prio = b.prio AND c.level = 7
       AND c.depth = b.depth AND c.bucket = {tb}
  GROUP BY 1, 2
), totals AS (
  SELECT prio, CAST(SUM(e) AS BIGINT) AS total FROM tops GROUP BY 1
), qs(q_milli) AS (
  VALUES {qs_vals}
), st AS (
  SELECT t.prio, q.q_milli, t.total,
         GREATEST(1, (q.q_milli * t.total + 999) // 1000) AS rank
  FROM totals t, qs q
), w7 AS (
  SELECT prio, q_milli, rank, total, pfx, e,
         CASE WHEN tc > 0 THEN LEAST(R, tc) - cum + e
              ELSE 1 END AS R
  FROM (
    SELECT s.prio, s.q_milli, s.rank, s.total, s.rank AS R, n.pfx, n.e,
           SUM(n.e) OVER (PARTITION BY s.prio, s.q_milli
                          ORDER BY n.pfx) AS cum,
           SUM(n.e) OVER (PARTITION BY s.prio, s.q_milli) AS tc
    FROM st s JOIN tops n ON n.prio = s.prio
  )
  QUALIFY row_number() OVER (PARTITION BY prio, q_milli
      ORDER BY CASE WHEN tc > 0 AND cum >= LEAST(R, tc) THEN 0 ELSE 1 END,
               pfx) = 1
), {", ".join(walk)}
SELECT prio, CAST(q_milli AS BIGINT) AS q_milli,
       CAST(rank AS BIGINT) AS rank, CAST(total AS BIGINT) AS total,
       CAST(pfx AS BIGINT) AS value, CAST(e AS BIGINT) AS est
FROM w0
"""


# ---------------------------------------------------------------------------
# STRING-domain heavy-hitter enumeration (operators/sketch.py
# MaintainedStringHeavyHitters): the dyadic tree only counts BIGINTs,
# but the LLM-pipeline's heavy-hitter asks are strings — tokens, URLs,
# fingerprints.  A value↔dense-id DICTIONARY is maintained as derived
# state from the same feed (append-only, ids assigned max_id +
# rank-by-value per slice — deterministic, so DuckDB replays it), the
# 4-level dyadic sketch counts the dense ids, and the descent's named
# ids decode back through the dictionary.  Lifecycle mirrors the BIGINT
# row: a heavy URL DECAYS below threshold via deletes, a new URL GROWS
# past it via inserts, an update wave concentrates mass on a third
# late-arriving string.
# ---------------------------------------------------------------------------
_SHH_CACHE: dict[str, tuple[object, int]] = {}


def pipeline_cms_string_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedStringHeavyHitters

    if sf_dir not in _SHH_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            F.col("o_orderpriority").alias("prio"),
            F.when(F.col("o_orderkey") % 3 == 0, F.lit("url://hot"))
            .otherwise(
                F.concat(
                    F.lit("tok:"), (F.col("o_custkey") % 97).cast("string")
                )
            )
            .alias("v"),
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_shh_"))
        t = ManagedTable(wh / "vals").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        hh = MaintainedStringHeavyHitters(
            wh / "shh", ["prio"], "v", depth=_CMHH_D, width=_CMHH_W,
            levels=4,
        )
        hh.refresh(spark, t)  # seed: dict ids 1..n0 in value order

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("vals").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "prio", "v",
            )

        # commit 1: INSERTS grow a NEW url past the threshold (first
        # slice-time dictionary extension: id = n0 + 1)
        t.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "prio",
                F.lit("url://rising").alias("v"),
            ),
            "I",
        ))
        hh.refresh(spark, t)
        # commit 2: DELETE every url://hot carrier (decays below the
        # threshold) + UPDATES concentrating mass on a third new string
        # (id = n0 + 2); update keys disjoint from deletes
        t.merge(
            spark,
            batch(ord_src.filter(F.col("o_orderkey") % 3 == 0), "D")
            .unionByName(batch(
                ord_src.filter(
                    (F.col("o_orderkey") % 10 == 4)
                    & (F.col("o_orderkey") % 3 != 0)
                ).select(
                    "o_orderkey", "prio",
                    F.lit("deep://fingerprint").alias("v"),
                ),
                "U",
            )),
        )
        hh.refresh(spark, t)
        m = hh.meta()
        if int(m["folds"]) != 2 or "recounts" in m:
            raise RuntimeError(
                "string dyadic maintenance did not take the linear "
                f"fold path twice (meta: {m})"
            )
        n_live = t.read(spark).filter(F.col("v").isNotNull()).count()
        thr = max(1, n_live // 250)
        live = {
            r["v"]: r["n"]
            for r in t.read(spark).groupBy("v")
            .agg(F.count(F.lit(1)).alias("n")).collect()
        }
        if (
            live.get("url://rising", 0) < thr
            or live.get("deep://fingerprint", 0) < thr
            or live.get("url://hot", 0) >= thr
        ):
            raise RuntimeError(
                f"fixture lost its decay/growth story (thr={thr})"
            )
        _SHH_CACHE[sf_dir] = (hh, thr)
    hh, thr = _SHH_CACHE[sf_dir]
    return hh.enumerate_heavy_values(spark, thr).select(
        "prio",
        F.col("v").cast("string").alias("v"),
        F.col("est").cast("long").alias("est"),
    )


def _shh_oracle() -> str:
    # rebuilds the dictionary (slice-ordered dense ids), the 4-level
    # dyadic counters over the ids, the 4-hop descent, and the decode
    # join — bit-equal output proves dict fold + tree + descent exact
    from .operators.sketch import cms_bucket_sql

    cb = cms_bucket_sql(
        "(vid // (CAST(1 AS BIGINT) << (8 * l.lv)))", "t.d", _CMHH_W
    )
    descent = []
    for lv in range(3, -1, -1):
        if lv == 3:
            base = (
                "SELECT g.prio, p.p AS pfx, t.d AS depth\n"
                "        FROM (SELECT DISTINCT prio FROM mapped) g,\n"
                f"             range(256) p(p), range({_CMHH_D}) t(d)"
            )
        else:
            base = (
                f"SELECT s.prio, s.pfx * 256 + o.o AS pfx, t.d AS depth\n"
                f"        FROM lvl{lv + 1} s, range(256) o(o), "
                f"range({_CMHH_D}) t(d)"
            )
        pb = cms_bucket_sql("b.pfx", "b.depth", _CMHH_W)
        descent.append(
            f"lvl{lv} AS (\n"
            f"  SELECT b.prio, b.pfx,\n"
            f"         CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est\n"
            f"  FROM ({base}) b\n"
            f"  LEFT JOIN counters c ON c.prio = b.prio "
            f"AND c.level = {lv}\n"
            f"       AND c.depth = b.depth AND c.bucket = {pb}\n"
            f"  GROUP BY 1, 2\n"
            f"  HAVING MIN(COALESCE(c.cnt, 0)) >= (SELECT t FROM thr)\n"
            f")"
        )
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CASE WHEN o_orderkey % 3 = 0 THEN 'url://hot'
              ELSE 'tok:' || CAST(o_custkey % 97 AS VARCHAR) END AS v
  FROM orders
), cur AS (
  SELECT prio,
         CASE WHEN o_orderkey % 10 = 4 AND o_orderkey % 3 <> 0
              THEN 'deep://fingerprint' ELSE v END AS v
  FROM base WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT prio, 'url://rising' FROM base WHERE o_orderkey % 25 = 3
), thr AS (
  SELECT GREATEST(1, COUNT(*) // 250) AS t FROM cur WHERE v IS NOT NULL
), d0 AS (
  -- seed slice: first-seen values ranked by value (binary collation)
  SELECT v, CAST(row_number() OVER (ORDER BY v) AS BIGINT) AS vid
  FROM (SELECT DISTINCT v FROM base WHERE v IS NOT NULL)
), dict AS (
  SELECT * FROM d0
  UNION ALL  -- slice 1: one new value -> id n0 + 1
  SELECT 'url://rising', (SELECT COUNT(*) FROM d0) + 1
  UNION ALL  -- slice 2: one new value -> id n0 + 2
  SELECT 'deep://fingerprint', (SELECT COUNT(*) FROM d0) + 2
), mapped AS (
  SELECT c.prio, d.vid FROM cur c JOIN dict d ON d.v = c.v
), counters AS (
  SELECT prio, l.lv AS level, t.d AS depth, {cb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM mapped, range(4) l(lv), range({_CMHH_D}) t(d)
  GROUP BY 1, 2, 3, 4
), {", ".join(descent)}
SELECT l.prio, d.v AS v, l.est
FROM lvl0 l JOIN dict d ON d.vid = l.pfx
"""


def _cmhh_oracle() -> str:
    from .operators.sketch import cms_bucket_sql

    # counters over every dyadic level: prefix = v // 2^(8·level)
    # (non-negative domain, so DuckDB // == Spark shiftright)
    cb = cms_bucket_sql(
        "(v // (CAST(1 AS BIGINT) << (8 * l.lv)))", "t.d", _CMHH_W
    )
    descent = []
    for lv in range(7, -1, -1):
        if lv == 7:
            base = (
                "SELECT g.prio, p.p AS pfx, t.d AS depth\n"
                "        FROM (SELECT DISTINCT prio FROM cur WHERE v IS "
                "NOT NULL) g,\n"
                f"             range(128) p(p), range({_CMHH_D}) t(d)"
            )
        else:
            base = (
                f"SELECT s.prio, s.pfx * 256 + o.o AS pfx, t.d AS depth\n"
                f"        FROM lvl{lv + 1} s, range(256) o(o), "
                f"range({_CMHH_D}) t(d)"
            )
        pb = cms_bucket_sql("b.pfx", "b.depth", _CMHH_W)
        descent.append(
            f"lvl{lv} AS (\n"
            f"  SELECT b.prio, b.pfx,\n"
            f"         CAST(MIN(COALESCE(c.cnt, 0)) AS BIGINT) AS est\n"
            f"  FROM ({base}) b\n"
            f"  LEFT JOIN counters c ON c.prio = b.prio "
            f"AND c.level = {lv}\n"
            f"       AND c.depth = b.depth AND c.bucket = {pb}\n"
            f"  GROUP BY 1, 2\n"
            f"  HAVING MIN(COALESCE(c.cnt, 0)) >= (SELECT t FROM thr)\n"
            f")"
        )
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderpriority AS prio,
         CAST(CASE WHEN o_orderkey % 3 = 0 THEN 50
                   ELSE o_custkey % 97 END AS BIGINT) AS v
  FROM orders
), cur AS (
  SELECT prio,
         CASE WHEN o_orderkey % 10 = 4 AND o_orderkey % 3 <> 0
              THEN CAST({_CMHH_BIG} AS BIGINT) ELSE v END AS v
  FROM base WHERE o_orderkey % 3 <> 0
  UNION ALL
  SELECT prio, CAST(61 AS BIGINT) FROM base WHERE o_orderkey % 25 = 3
), thr AS (
  SELECT GREATEST(1, COUNT(*) // 250) AS t FROM cur WHERE v IS NOT NULL
), counters AS (
  SELECT prio, l.lv AS level, t.d AS depth, {cb} AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM cur, range(8) l(lv), range({_CMHH_D}) t(d)
  WHERE v IS NOT NULL
  GROUP BY 1, 2, 3, 4
), {", ".join(descent)}
SELECT prio, CAST(pfx AS BIGINT) AS v, est FROM lvl0
"""


# ---------------------------------------------------------------------------
# Time-bucketed LIVE rollup — the "streaming windowed aggregation"
# shape maintained EXACTLY from the CDC feed: the month bucket is a
# single-table derived_cols expression (date_trunc), so the maintained
# state is month-grain (≤ ~80 rows here, ~1200 rows over a century)
# while the base churns at row grain; an order-date edit crossing a
# month boundary folds as a derived-group move, and the second-moment
# measure (sum of squared dollars) rides as an expression sum —
# mean/variance per month are the reader's two integer divides.
# Batch twin: entry_analytics.q_monthly_order_stats.
# ---------------------------------------------------------------------------
_MONTHLY_CACHE: dict[str, object] = {}


def pipeline_maintained_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.matview import MaintainedAggregate

    if sf_dir not in _MONTHLY_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias(
                "o_total_cents"
            ),
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_monthly_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        mv = MaintainedAggregate(
            wh / "mv",
            ["month"],
            sum_cols={
                "revenue_cents": "o_total_cents",
                # dollars² keeps Σx² under 2^63 through sf100
                "rev_dollars_sq": (
                    "(o_total_cents DIV 100) * (o_total_cents DIV 100)"
                ),
            },
            derived_cols={
                "month": ("date_trunc('month', o_orderdate)", ["o_orderdate"])
            },
        )
        mv.refresh(spark, orders)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_orderdate", "o_total_cents",
            )

        o_del = ord_src.filter(F.col("o_orderkey") % 10 == 7)
        # +40 days crosses a MONTH boundary — a derived-group move
        o_mv = ord_src.filter(F.col("o_orderkey") % 10 == 4).select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 40 DAY")).alias(
                "o_orderdate"
            ),
            (F.col("o_total_cents") + 250).alias("o_total_cents"),
        )
        o_ins = ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
            (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
            "o_orderdate",
            (F.col("o_total_cents") + 9).alias("o_total_cents"),
        )
        orders.merge(
            spark,
            batch(o_del, "D")
            .unionByName(batch(o_mv, "U"))
            .unionByName(batch(o_ins, "I")),
        )
        mv.refresh(spark, orders)  # fold the churn
        _MONTHLY_CACHE[sf_dir] = mv
    mv = _MONTHLY_CACHE[sf_dir]
    return mv.read(spark).select(
        F.col("month").cast("timestamp").alias("month"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.col("rev_dollars_sq").cast("long").alias("rev_dollars_sq"),
    )


_MONTHLY_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderdate,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS o_total_cents
  FROM orders
), cur AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 4 THEN o_orderdate + INTERVAL 40 DAY
              ELSE o_orderdate END AS o_orderdate,
         CASE WHEN o_orderkey % 10 = 4 THEN o_total_cents + 250
              ELSE o_total_cents END AS o_total_cents
  FROM base WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_orderdate, o_total_cents + 9
  FROM base WHERE o_orderkey % 25 = 3
)
SELECT date_trunc('month', o_orderdate) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(o_total_cents) AS BIGINT) AS revenue_cents,
       CAST(SUM((o_total_cents // 100) * (o_total_cents // 100)) AS BIGINT)
         AS rev_dollars_sq
FROM cur GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Maintained TPC-H Q6 / Q19 / Q4 off ONE shared churned fixture —
# three σ/join shapes over the same replicated trio:
#   Q6  = single-table σ-view (date window + double-typed discount/qty
#         bounds) with an expression revenue measure;
#   Q19 = the THREE-BRANCH DISJUNCTION as a row-local join_where over
#         (p_brand, p_size, l_quantity) spanning both join sides;
#   Q4  = EXISTS composed: a maintained per-order returned-line count
#         (order-count-sized state) + the date-window join at read.
# Churn crosses every boundary: σ windows, discount/qty envelopes,
# returnflag flips, part re-points, brand/size moves, orderdate moves.
# ---------------------------------------------------------------------------
_MISC_CACHE: dict[str, tuple] = {}
_Q19_DISJ = (
    "(p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
    " AND l_quantity BETWEEN 1 AND 11) OR "
    "(p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 "
    " AND l_quantity BETWEEN 10 AND 20) OR "
    "(p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 "
    " AND l_quantity BETWEEN 20 AND 30)"
)
_Q6_WHERE = (
    "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
    "l_shipdate < TIMESTAMP '1998-01-01 00:00:00' AND "
    "l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24"
)


def _misc_fixture(spark: SparkSession, sf_dir: str) -> tuple:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate
    from .operators.matview import MaintainedAggregate

    if sf_dir in _MISC_CACHE:
        return _MISC_CACHE[sf_dir]
    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
        "l_shipdate", "l_extendedprice", "l_discount", "l_returnflag",
    )
    w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
        F.desc("l_extendedprice"), F.desc("l_partkey"),
        F.desc("l_shipdate"), F.desc("l_returnflag"),
    )
    li_src = (
        raw.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_brand", "p_size"
    )
    ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    wh = Path(tempfile.mkdtemp(prefix="tidb2dw_miscview_"))
    li = ManagedTable(wh / "lineitem").create(
        li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
    )
    part = ManagedTable(wh / "part").create(
        part_src, ["p_partkey"], pk_buckets=4, cdf=True
    )
    orders = ManagedTable(wh / "orders").create(
        ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
    )
    q6v = MaintainedAggregate(
        wh / "q6v",
        ["l_returnflag"],
        sum_cols={
            "revenue_cents": (
                "CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)"
            )
        },
        where=_Q6_WHERE,
        where_cols=["l_shipdate", "l_discount", "l_quantity"],
        measure_cols=["l_extendedprice", "l_discount"],
    )
    q19v = MaintainedStarAggregate(
        wh / "q19v",
        dims=[("l_partkey", ["p_brand"])],
        fact_group_cols=[],
        sum_cols={
            "revenue_cents": "disc_cents",
        },
        fact_derived_cols={
            "disc_cents": (
                "CAST(round(l_extendedprice * (1 - l_discount) * 100.0) "
                "AS BIGINT)",
                ["l_extendedprice", "l_discount"],
            )
        },
        join_where=_Q19_DISJ,
        fact_where_cols=["l_quantity"],
        dim_where_cols=[["p_size"]],
    )
    q4v = MaintainedAggregate(
        wh / "q4v",
        ["l_orderkey"],
        sum_cols={},
        where="l_returnflag = 'R'",
        where_cols=["l_returnflag"],
    )
    q6v.refresh(spark, li)
    q19v.refresh_star(spark, li, [part])
    q4v.refresh(spark, li)

    def lbatch(df: DataFrame, flag: str) -> DataFrame:
        return df.select(
            F.lit(flag).alias("flag"),
            F.lit("lineitem").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "l_orderkey", "l_linenumber", "l_partkey", "l_quantity",
            "l_shipdate", "l_extendedprice", "l_discount", "l_returnflag",
        )

    l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
    l_u1 = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
        "l_orderkey", "l_linenumber", "l_partkey",
        (F.col("l_quantity") + 10.0).alias("l_quantity"),
        (F.col("l_shipdate") + F.expr("INTERVAL 200 DAY")).alias("l_shipdate"),
        (F.col("l_extendedprice") + 2.0).alias("l_extendedprice"),
        (F.col("l_discount") + 0.01).alias("l_discount"),
        "l_returnflag",
    )
    l_u2 = li_src.filter(F.col("l_orderkey") % 10 == 5).select(
        "l_orderkey", "l_linenumber",
        (F.col("l_partkey") % 97 + 1).alias("l_partkey"),
        "l_quantity", "l_shipdate", "l_extendedprice", "l_discount",
        F.when(F.col("l_returnflag") == "R", F.lit("N"))
        .otherwise(F.lit("R")).alias("l_returnflag"),
    )
    l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
        "l_orderkey",
        (F.col("l_linenumber") + 100).alias("l_linenumber"),
        "l_partkey",
        F.lit(10.0).alias("l_quantity"),
        F.lit("1997-05-20 00:00:00").cast("timestamp").alias("l_shipdate"),
        "l_extendedprice",
        F.lit(0.05).alias("l_discount"),
        F.lit("R").alias("l_returnflag"),
    )
    li.merge(
        spark,
        lbatch(l_del, "D")
        .unionByName(lbatch(l_u1, "U"))
        .unionByName(lbatch(l_u2, "U"))
        .unionByName(lbatch(l_ins, "I")),
    )

    def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
        return df.select(
            F.lit("U").alias("flag"),
            F.lit(tbl).alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            *cols,
        )

    part.merge(spark, env(
        part_src.filter(F.col("p_partkey") % 7 == 1).select(
            "p_partkey", "p_brand",
            (F.col("p_size") % 35 + 1).alias("p_size"),
        ),
        "part", ["p_partkey", "p_brand", "p_size"],
    ).unionByName(env(
        part_src.filter(
            (F.col("p_partkey") % 11 == 2) & (F.col("p_partkey") % 7 != 1)
        ).select(
            "p_partkey", F.lit("Brand#1").alias("p_brand"), "p_size"
        ),
        "part", ["p_partkey", "p_brand", "p_size"],
    )))
    orders.merge(spark, env(
        ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias(
                "o_orderdate"
            ),
            "o_orderpriority",
        ),
        "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"],
    ))
    q6v.refresh(spark, li)
    q19v.refresh_star(spark, li, [part])
    q4v.refresh(spark, li)
    _MISC_CACHE[sf_dir] = (li, part, orders, q6v, q19v, q4v)
    return _MISC_CACHE[sf_dir]


def pipeline_maintained_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 live: the σ-view (date window + double-typed discount /
    quantity bounds) maintained at returnflag grain; the read sums the
    3-row state to the spec's scalar."""
    _, _, _, q6v, _, _ = _misc_fixture(spark, sf_dir)
    return q6v.read(spark).agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_lineitems"),
        F.coalesce(F.sum("revenue_cents"), F.lit(0)).cast("long").alias(
            "revenue_cents"
        ),
    )


def pipeline_maintained_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 live: the three-branch (brand, size, quantity)
    disjunction as a row-local join_where — brand-grain maintained
    state, scalar read."""
    _, _, _, _, q19v, _ = _misc_fixture(spark, sf_dir)
    return q19v.read(spark).agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("long").alias("n_lineitems"),
        F.coalesce(F.sum("revenue_cents"), F.lit(0)).cast("long").alias(
            "revenue_cents"
        ),
    )


def pipeline_maintained_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 composed: EXISTS(returned line) is a maintained
    per-order count view (order-count-sized, O(changes) upkeep); the
    read semi-joins the CURRENT orders state's date window against it —
    returnflag flips that remove an order's LAST returned line must
    drop the order."""
    _, _, orders, _, _, q4v = _misc_fixture(spark, sf_dir)
    o = orders.read(spark).filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    has_ret = q4v.read(spark).filter(F.col("n_rows") > 0).select("l_orderkey")
    return (
        o.join(
            has_ret, o["o_orderkey"] == has_ret["l_orderkey"], "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )


_MISC_LI_FOLD = """
li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_shipdate,
         l_extendedprice, l_discount, l_returnflag FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_shipdate,
           l_extendedprice, l_discount, l_returnflag,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_extendedprice DESC, l_partkey DESC,
                      l_shipdate DESC, l_returnflag DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_partkey % 97) + 1
              ELSE l_partkey END AS l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_quantity + 10.0
              ELSE l_quantity END AS l_quantity,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 200 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN l_extendedprice + 2.0
              ELSE l_extendedprice END AS l_extendedprice,
         CASE WHEN l_orderkey % 10 = 4 THEN l_discount + 0.01
              ELSE l_discount END AS l_discount,
         CASE WHEN l_orderkey % 10 = 5 THEN
                CASE WHEN l_returnflag = 'R' THEN 'N' ELSE 'R' END
              ELSE l_returnflag END AS l_returnflag
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, l_partkey, 10.0, TIMESTAMP '1997-05-20 00:00:00',
         l_extendedprice, 0.05, 'R'
  FROM li WHERE l_orderkey % 25 = 3
)
"""

_Q6VIEW_ORACLE = f"""
WITH {_MISC_LI_FOLD.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(SUM(
         CAST(round(l_extendedprice * l_discount * 100.0) AS BIGINT)), 0)
         AS BIGINT) AS revenue_cents
FROM curl
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24
"""

_Q19VIEW_ORACLE = f"""
WITH {_MISC_LI_FOLD.strip()}, curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 11 = 2 AND p_partkey % 7 <> 1
              THEN 'Brand#1' ELSE p_brand END AS p_brand,
         CASE WHEN p_partkey % 7 = 1 THEN (p_size % 35) + 1
              ELSE p_size END AS p_size
  FROM part
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_lineitems,
       CAST(COALESCE(SUM(
         CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100.0)
              AS BIGINT)), 0) AS BIGINT) AS revenue_cents
FROM curl l JOIN curp p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""

_Q4VIEW_ORACLE = f"""
WITH {_MISC_LI_FOLD.strip()}, curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN o_orderdate + INTERVAL 90 DAY
              ELSE o_orderdate END AS o_orderdate,
         o_orderpriority
  FROM orders
)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM curo o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM curl l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
"""


# ---------------------------------------------------------------------------
# TPC-H Q22 COMPOSED — the global-scalar + anti-join shape as two tiny
# maintained views: (a) the positive-balance population scalar
# (Σ bal, n) kept as a 2-group rollup on a DERIVED sign flag, and
# (b) per-customer recent-order counts (σ-filtered, customer-sized).
# The read filters the CURRENT customer state by the live threshold
# (bal·n > Σ — integer cross-multiply, no float mean) and anti-joins
# the recent-order keys.  Churn crosses every boundary: balances flip
# sign and cross the threshold, order-date moves flip recency, and a
# customer's LAST recent order deleting must revive them.
# ---------------------------------------------------------------------------
_Q22_CACHE: dict[str, tuple] = {}
_Q22_RECENT = "o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'"


def pipeline_maintained_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q22_CACHE:
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey",
            F.round(F.col("c_acctbal") * 100.0).cast("long").alias("bal_cents"),
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q22view_"))
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        posv = MaintainedAggregate(
            wh / "posv",
            ["is_pos"],
            sum_cols={"total_bal": "bal_cents"},
            derived_cols={
                "is_pos": ("CASE WHEN bal_cents > 0 THEN 1 ELSE 0 END",
                           ["bal_cents"])
            },
        )
        recv = MaintainedAggregate(
            wh / "recv",
            ["o_custkey"],
            sum_cols={},
            where=_Q22_RECENT,
            where_cols=["o_orderdate"],
        )
        posv.refresh(spark, cust)
        recv.refresh(spark, orders)

        def cbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("customer").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "c_custkey", "c_nationkey", "bal_cents",
            )

        c_del = cust_src.filter(F.col("c_custkey") % 10 == 7)
        c_upd = cust_src.filter(F.col("c_custkey") % 10 == 4).select(
            "c_custkey", "c_nationkey",
            # sign flips AND threshold crossings
            (F.lit(0) - F.col("bal_cents") + 12345).alias("bal_cents"),
        )
        c_ins = cust_src.filter(F.col("c_custkey") % 25 == 3).select(
            (F.col("c_custkey") + 100_000_000).alias("c_custkey"),
            "c_nationkey",
            (F.col("bal_cents") + 990_000).alias("bal_cents"),
        )
        cust.merge(
            spark,
            cbatch(c_del, "D")
            .unionByName(cbatch(c_upd, "U"))
            .unionByName(cbatch(c_ins, "I")),
        )

        def obatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderdate",
            )

        # recency flips in BOTH directions + deletes that may remove a
        # customer's last recent order.  The update set EXCLUDES the
        # delete set: both land in one commit at one commit_ts, and a
        # same-key D+U pair would resolve by the engine's flag tiebreak
        # while the oracle CTE applies the delete — keep them disjoint
        # so both engines see the same final state.
        o_del = ord_src.filter(F.col("o_orderkey") % 9 == 1)
        o_mv = ord_src.filter(
            (F.col("o_orderkey") % 10 == 6) & (F.col("o_orderkey") % 9 != 1)
        ).select(
            "o_orderkey", "o_custkey",
            (F.col("o_orderdate") + F.expr("INTERVAL 400 DAY")).alias(
                "o_orderdate"
            ),
        )
        orders.merge(
            spark,
            obatch(o_del, "D").unionByName(obatch(o_mv, "U")),
        )
        posv.refresh(spark, cust)
        recv.refresh(spark, orders)
        _Q22_CACHE[sf_dir] = (cust, posv, recv)
    cust, posv, recv = _Q22_CACHE[sf_dir]
    scalar = (
        posv.read(spark)
        .filter(F.col("is_pos") == 1)
        .select(
            F.col("total_bal").alias("__total"), F.col("n_rows").alias("__n")
        )
    )
    recent = recv.read(spark).filter(F.col("n_rows") > 0).select("o_custkey")
    c = cust.read(spark)
    return (
        c.join(F.broadcast(scalar))
        .filter(F.col("bal_cents") * F.col("__n") > F.col("__total"))
        .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cust"),
            F.sum("bal_cents").cast("long").alias("total_bal_cents"),
        )
    )


_Q22VIEW_ORACLE = """
WITH curc AS (
  SELECT c_custkey, c_nationkey,
         CASE WHEN c_custkey % 10 = 4
              THEN 0 - CAST(round(c_acctbal * 100.0) AS BIGINT) + 12345
              ELSE CAST(round(c_acctbal * 100.0) AS BIGINT)
         END AS bal_cents
  FROM customer WHERE c_custkey % 10 <> 7
  UNION ALL
  SELECT c_custkey + 100000000, c_nationkey,
         CAST(round(c_acctbal * 100.0) AS BIGINT) + 990000
  FROM customer WHERE c_custkey % 25 = 3
), curo AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 10 = 6 THEN o_orderdate + INTERVAL 400 DAY
              ELSE o_orderdate END AS o_orderdate
  FROM orders WHERE o_orderkey % 9 <> 1
), pos AS (
  SELECT CAST(SUM(bal_cents) AS BIGINT) AS total, COUNT(*) AS n
  FROM curc WHERE bal_cents > 0
)
SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(c.bal_cents) AS BIGINT) AS total_bal_cents
FROM curc c, pos
WHERE c.bal_cents * pos.n > pos.total
  AND NOT EXISTS (SELECT 1 FROM curo o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
"""


# ---------------------------------------------------------------------------
# TPC-H Q8 as a LIVE view — national market share: a 7-table snowflake
# (orders→customer→nation→region σ chain + part σ + supplier) kept at
# (o_orderdate × s_nationkey) grain; the read rolls the cube to years
# and splits the one-nation numerator with a conditional sum over the
# ~60k-row state.  Every σ boundary churns: region re-points via
# nationkey moves, part types flip in/out of 'STANDARD', order dates
# shift years, suppliers re-nation.
# ---------------------------------------------------------------------------
_Q8VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q8VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_partkey"), F.desc("l_suppkey")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_nationkey"
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_regionkey"
        )
        reg_src = spark.read.parquet(f"{sf_dir}/region.parquet").select(
            "r_regionkey", "r_name"
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_type"
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q8view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "customer").create(
            cust_src, ["c_custkey"], pk_buckets=4, cdf=True
        )
        nation = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        region = ManagedTable(wh / "region").create(
            reg_src, ["r_regionkey"], pk_buckets=2, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", ["o_orderdate"]),   # orders (date group)
                ("o_custkey", []),                 # customer, chained
                ("c_nationkey", []),               # nation, chained
                ("n_regionkey", []),               # region, chained (σ)
                ("l_partkey", []),                 # part (σ)
                ("l_suppkey", ["s_nationkey"]),    # supplier (group)
            ],
            fact_group_cols=[],
            sum_cols={"revenue_c": "revenue_c"},
            dim_wheres=[
                None, None, None, "r_name = 'AMERICA'",
                "p_type = 'STANDARD'", None,
            ],
            dim_where_cols=[[], [], [], ["r_name"], ["p_type"], []],
        )
        mv.refresh_star(
            spark, li, [orders, cust, nation, region, part, supp]
        )

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_partkey") % 89 + 1).alias("l_partkey"),
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            (F.col("revenue_c") + 3).alias("revenue_c"),
        )
        li.merge(spark, lbatch(l_del, "D").unionByName(lbatch(l_upd, "U")))

        def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
            return df.select(
                F.lit("U").alias("flag"),
                F.lit(tbl).alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        orders.merge(spark, env(
            ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
                "o_orderkey", "o_custkey",
                (F.col("o_orderdate") + F.expr("INTERVAL 400 DAY")).alias(
                    "o_orderdate"
                ),
            ),
            "orders", ["o_orderkey", "o_custkey", "o_orderdate"],
        ))
        cust.merge(spark, env(
            cust_src.filter(F.col("c_custkey") % 10 == 2).select(
                "c_custkey",
                ((F.col("c_nationkey") + 1) % 25).alias("c_nationkey"),
            ),
            "customer", ["c_custkey", "c_nationkey"],
        ))
        part.merge(spark, env(
            part_src.filter(F.col("p_partkey") % 7 == 1).select(
                "p_partkey",
                F.when(F.col("p_type") == "STANDARD", F.lit("ECONOMY"))
                .otherwise(F.lit("STANDARD")).alias("p_type"),
            ),
            "part", ["p_partkey", "p_type"],
        ))
        supp.merge(spark, env(
            supp_src.filter(F.col("s_suppkey") % 10 == 3).select(
                "s_suppkey",
                ((F.col("s_nationkey") + 3) % 25).alias("s_nationkey"),
            ),
            "supplier", ["s_suppkey", "s_nationkey"],
        ))
        mv.refresh_star(
            spark, li, [orders, cust, nation, region, part, supp]
        )
        _Q8VIEW_CACHE[sf_dir] = mv
    mv = _Q8VIEW_CACHE[sf_dir]
    nat_one = (
        spark.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_name") == "NATION_1")
        .select("n_nationkey")
    )
    key = [r["n_nationkey"] for r in nat_one.collect()][0]
    return (
        mv.read(spark)
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("s_nationkey") == key, F.col("revenue_c"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("nation_rev_cents"),
            F.sum("revenue_c").cast("long").alias("total_rev_cents"),
        )
    )


_Q8VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_partkey DESC, l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_partkey % 89) + 1
              ELSE l_partkey END AS l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN revenue_c + 3
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 9 THEN o_custkey ELSE o_custkey END
           AS o_custkey,
         CASE WHEN o_orderkey % 10 = 9 THEN o_orderdate + INTERVAL 400 DAY
              ELSE o_orderdate END AS o_orderdate
  FROM orders
), curc AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 2 THEN (c_nationkey + 1) % 25
              ELSE c_nationkey END AS c_nationkey
  FROM customer
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 7 = 1 THEN
                CASE WHEN p_type = 'STANDARD' THEN 'ECONOMY'
                     ELSE 'STANDARD' END
              ELSE p_type END AS p_type
  FROM part
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN (s_nationkey + 3) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
)
SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CASE WHEN s.s_nationkey =
                      (SELECT n_nationkey FROM nation
                       WHERE n_name = 'NATION_1')
                     THEN l.revenue_c ELSE 0 END) AS BIGINT)
         AS nation_rev_cents,
       CAST(SUM(l.revenue_c) AS BIGINT) AS total_rev_cents
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curc c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
JOIN curp p ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
JOIN curs s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# TPC-H Q17 COMPOSED, INDEX-ACCELERATED — three derived objects on one
# replicated pair working together: (a) the per-part quantity rollup
# (MaintainedAggregate — the live correlated-aggregate threshold,
# integer cross-multiply 5·q·n < Σq), (b) a SecondaryIndex on the
# fact's l_partkey, and (c) the part replica.  The read resolves the
# brand σ to part keys (dim-sized), probes the INDEX for their fact
# PKs (O(probed value buckets)), bucket-prunes the fact read via
# read_for_keys, and judges each row against the LIVE threshold — no
# fact scan anywhere on the serving path.
# ---------------------------------------------------------------------------
_Q17_CACHE: dict[str, tuple] = {}
_Q17_BRANDS = ("Brand#1", "Brand#2", "Brand#3")
# serving-path σ-collect cap: past this many σ-part keys the index is
# probed by broadcast semi-join instead of driver literals (at sf100 a
# 3-brand σ is ~2.4M keys — never a multi-million literal IN)
_Q17_SIGMA_CAP = 8192


def pipeline_maintained_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.matview import MaintainedAggregate
    from .operators.secondary_index import SecondaryIndex

    if sf_dir not in _Q17_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey",
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias(
                "cents"
            ),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("cents"), F.desc("l_partkey"), F.desc("q")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_brand"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q17view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        statv = MaintainedAggregate(
            wh / "statv", ["l_partkey"], sum_cols={"sq": "q"}
        )
        idx = SecondaryIndex(
            wh / "ix_partkey", col="l_partkey",
            pk_cols=["l_orderkey", "l_linenumber"],
        )
        statv.refresh(spark, li)
        idx.build(spark, li)

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "q", "cents",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_u1 = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            (F.col("q") + 20).alias("q"),     # crosses the threshold
            (F.col("cents") + 5).alias("cents"),
        )
        l_u2 = li_src.filter(F.col("l_orderkey") % 10 == 5).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_partkey") % 89 + 1).alias("l_partkey"),  # index move
            "q", "cents",
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            "l_partkey", F.lit(1).cast("long").alias("q"), "cents",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_u1, "U"))
            .unionByName(lbatch(l_u2, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )
        part.merge(spark, part_src.filter(F.col("p_partkey") % 11 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("part").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "p_partkey",
            F.lit("Brand#1").alias("p_brand"),
        ))
        statv.refresh(spark, li)
        idx.refresh(spark, li)
        _Q17_CACHE[sf_dir] = (li, part, statv, idx)
    li, part, statv, idx = _Q17_CACHE[sf_dir]
    sigma = (
        part.read(spark)
        .filter(F.col("p_brand").isin(*_Q17_BRANDS))
        .select("p_partkey", "p_brand")
    )
    brand_rows = sigma.limit(_Q17_SIGMA_CAP + 1).collect()
    if len(brand_rows) <= _Q17_SIGMA_CAP:
        pks = idx.lookup_pks_in(spark, [r["p_partkey"] for r in brand_rows])
        # under the cap the σ frame is proven driver-sized — broadcast
        brands = F.broadcast(spark.createDataFrame(
            [(r["p_partkey"], r["p_brand"]) for r in brand_rows],
            "p_partkey long, p_brand string",
        ))
    else:
        # over-cap σ: the key set stays distributed — the index is
        # probed by broadcast semi-join (O(index size), never a fact
        # scan) and the fact probe still rides read_for_keys' bucket
        # pruning (its internal collects are probe-capped).  NO
        # broadcast hint here: the cap just declared this frame
        # unbounded, so AQE picks the join strategy from its measured
        # size (it will still broadcast when the σ happens to be small)
        pks = idx.lookup_pks_semi(
            spark, sigma.select(F.col("p_partkey").alias("l_partkey"))
        )
        brands = sigma
    li_rows = li.read_for_keys(spark, pks).select("l_partkey", "q", "cents")
    stats = statv.read(spark).select(
        "l_partkey", F.col("n_rows").alias("__n"), F.col("sq").alias("__sq")
    )
    return (
        li_rows.join(
            brands,
            li_rows["l_partkey"] == brands["p_partkey"],
            "inner",
        )
        .join(F.broadcast(stats), on="l_partkey", how="inner")
        .filter(5 * F.col("q") * F.col("__n") < F.col("__sq"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_small"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
    )


_Q17VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, q, cents FROM (
    SELECT l_orderkey, l_linenumber, l_partkey,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      l_partkey DESC, CAST(l_quantity AS BIGINT) DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_partkey % 89) + 1
              ELSE l_partkey END AS l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN q + 20 ELSE q END AS q,
         CASE WHEN l_orderkey % 10 = 4 THEN cents + 5 ELSE cents END AS cents
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, l_partkey, 1, cents FROM li WHERE l_orderkey % 25 = 3
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 11 = 2 THEN 'Brand#1' ELSE p_brand END
           AS p_brand
  FROM part
), stats AS (
  SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS n FROM curl GROUP BY l_partkey
)
SELECT p.p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(l.cents) AS BIGINT) AS revenue_cents
FROM curl l
JOIN stats s ON l.l_partkey = s.l_partkey
JOIN curp p ON l.l_partkey = p.p_partkey
WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
  AND 5 * l.q * s.n < s.sq
GROUP BY p.p_brand
"""


# ---------------------------------------------------------------------------
# TPC-H Q9 as a LIVE view — product-type profit: the (nation, o_year)
# profit cube maintained through the lineitem⋈orders⋈part⋈supplier⋈
# nation snowflake (reference parity: the warehouse-side Q9 the
# replicated tables serve).  TESTDATA has no partsupp, so supply cost
# is a DETERMINISTIC fact_derived_cols expression over
# (l_partkey, l_suppkey) — integer cents, the same synthetic-on-
# synthetic move the other fixtures use — making the profit measure
#   profit_c = revenue_c − sc_c·q
# pure BIGINT algebra (cross-engine exact).  The part dim contributes
# only its σ (p_name LIKE 'blue%'); o_year is an orders attribute;
# nation arrives via the supplier chain hop.  Churn lands on ALL five
# feeds — lineitem deletes/re-part (σ moves)/re-supplier/inserts, an
# orders year bump (grain move), part renames that flip σ membership
# both ways, a supplier re-nation (relocates whole profit slices), and
# a nation relabel (group-key attribute move) — and the fixture RAISES
# unless some (nation, o_year) group's profit changed SIGN under churn
# (the mixed-sign property that makes Q9 maintenance adversarial: ±
# folds must track through zero, not just shrink magnitudes).
# Q9 closes the maintained TPC-H set at 22 of 22 (Q9 was the last hole).
# ---------------------------------------------------------------------------
_Q9VIEW_CACHE: dict[str, object] = {}
# supply cost synth: sc ∈ [1, 400000] cents over (partkey, suppkey);
# with q ∈ [1,50] the cost term spans the revenue scale, so row amounts
# (and group sums) carry BOTH signs
_Q9_SC = "(l_partkey * 7919 + l_suppkey * 12553) % 400000 + 1"


def pipeline_maintained_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q9VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.col("l_quantity").cast("long").alias("q"),
            F.round(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
            ).cast("long").alias("revenue_c"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("revenue_c"), F.desc("l_partkey"), F.desc("l_suppkey"),
            F.desc("q"),
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_name"
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q9view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        nation = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_orderkey", ["o_year"]),    # orders (grain attribute)
                ("l_partkey", []),             # part (σ only)
                ("l_suppkey", []),             # supplier (carries nationkey)
                ("s_nationkey", ["n_name"]),   # nation, chained off supplier
            ],
            fact_group_cols=[],
            sum_cols={"profit_c": f"revenue_c - ({_Q9_SC}) * q"},
            measure_cols=["revenue_c", "q", "l_partkey", "l_suppkey"],
            dim_wheres=[None, "p_name LIKE 'blue%'", None, None],
            dim_where_cols=[[], ["p_name"], [], []],
        )
        mv.refresh_star(spark, li, [orders, part, supp, nation])  # seed
        before = {
            (r["n_name"], r["o_year"]): r["profit_c"]
            for r in mv.read(spark).collect()
        }

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "q", "revenue_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        # re-part moves rows across the σ boundary AND re-derives the
        # supply cost; +40 qty pushes amounts deep negative (sign driver)
        l_u1 = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            ((F.col("l_partkey") + 3) % 200).alias("l_partkey"),
            "l_suppkey",
            (F.col("q") + 40).alias("q"),
            "revenue_c",
        )
        l_u2 = li_src.filter(F.col("l_orderkey") % 10 == 5).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            ((F.col("l_suppkey") + 3) % 10).alias("l_suppkey"),
            "q",
            (F.col("revenue_c") + 13).alias("revenue_c"),
        )
        l_ins = li_src.filter(F.col("l_orderkey") % 25 == 3).select(
            "l_orderkey",
            (F.col("l_linenumber") + 100).alias("l_linenumber"),
            "l_partkey", "l_suppkey",
            F.lit(5).cast("long").alias("q"),
            "revenue_c",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_u1, "U"))
            .unionByName(lbatch(l_u2, "U"))
            .unionByName(lbatch(l_ins, "I")),
        )

        def env(df: DataFrame, tbl: str, cols: list[str]) -> DataFrame:
            return df.select(
                F.lit("U").alias("flag"),
                F.lit(tbl).alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                *cols,
            )

        orders.merge(spark, env(
            ord_src.filter(F.col("o_orderkey") % 10 == 9).select(
                "o_orderkey", (F.col("o_year") + 1).alias("o_year")
            ),
            "orders", ["o_orderkey", "o_year"],
        ))
        part.merge(spark, env(
            part_src.filter(F.col("p_partkey") % 4 == 1).select(
                "p_partkey",
                F.expr(
                    "CASE WHEN p_name LIKE 'blue%' "
                    "THEN concat('red', substring(p_name, 5)) "
                    "ELSE concat('blue ', p_name) END"
                ).alias("p_name"),
            ),
            "part", ["p_partkey", "p_name"],
        ))
        supp.merge(spark, env(
            supp_src.filter(F.col("s_suppkey") % 3 == 1).select(
                "s_suppkey",
                ((F.col("s_nationkey") + 5) % 25).alias("s_nationkey"),
            ),
            "supplier", ["s_suppkey", "s_nationkey"],
        ))
        nation.merge(spark, env(
            nat_src.filter(F.col("n_nationkey") % 6 == 2).select(
                "n_nationkey", F.concat("n_name", F.lit("_X")).alias("n_name")
            ),
            "nation", ["n_nationkey", "n_name"],
        ))

        # ONE five-feed fold
        mv.refresh_star(spark, li, [orders, part, supp, nation])
        after = {
            (r["n_name"], r["o_year"]): r["profit_c"]
            for r in mv.read(spark).collect()
        }
        flips = [
            k for k, v in after.items()
            if k in before and before[k] * v < 0
        ]
        if not flips:
            raise RuntimeError(
                "q9 fixture churn produced no sign-flipping group — the "
                "± fold through zero went unexercised"
            )
        _Q9VIEW_CACHE[sf_dir] = mv
    mv = _Q9VIEW_CACHE[sf_dir]
    return mv.read(spark).select(
        F.col("n_name").alias("nation"),
        F.col("o_year").cast("long").alias("o_year"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("profit_c").cast("long").alias("profit_c"),
    )


_Q9VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, q, revenue_c FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(l_quantity AS BIGINT) AS q,
           CAST(round(l_extendedprice * (1 - l_discount) * 100.0) AS BIGINT)
             AS revenue_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * (1 - l_discount) * 100.0)
                           AS BIGINT) DESC,
                      l_partkey DESC, l_suppkey DESC,
                      CAST(l_quantity AS BIGINT) DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_partkey + 3) % 200
              ELSE l_partkey END AS l_partkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_suppkey + 3) % 10
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN q + 40 ELSE q END AS q,
         CASE WHEN l_orderkey % 10 = 5 THEN revenue_c + 13
              ELSE revenue_c END AS revenue_c
  FROM li WHERE l_orderkey % 10 <> 7
  UNION ALL
  SELECT l_orderkey, l_partkey, l_suppkey, 5, revenue_c
  FROM li WHERE l_orderkey % 25 = 3
), curo AS (
  SELECT o_orderkey,
         CAST(year(o_orderdate) AS BIGINT)
           + CASE WHEN o_orderkey % 10 = 9 THEN 1 ELSE 0 END AS o_year
  FROM orders
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 4 = 1 THEN
              CASE WHEN p_name LIKE 'blue%'
                   THEN concat('red', substring(p_name, 5))
                   ELSE concat('blue ', p_name) END
              ELSE p_name END AS p_name
  FROM part
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 3 = 1 THEN (s_nationkey + 5) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
), curn AS (
  SELECT n_nationkey,
         CASE WHEN n_nationkey % 6 = 2 THEN concat(n_name, '_X')
              ELSE n_name END AS n_name
  FROM nation
)
SELECT n.n_name AS nation,
       o.o_year,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(l.revenue_c
                - ((l.l_partkey * 7919 + l.l_suppkey * 12553) % 400000 + 1)
                  * l.q) AS BIGINT) AS profit_c
FROM curl l
JOIN curo o ON l.l_orderkey = o.o_orderkey
JOIN curp p ON l.l_partkey = p.p_partkey
JOIN curs s ON l.l_suppkey = s.s_suppkey
JOIN curn n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE 'blue%'
GROUP BY n.n_name, o.o_year
"""


# ---------------------------------------------------------------------------
# TPC-H Q11 as a LIVE view — important stock: per-part value sums over
# one nation's suppliers (the σ rides the supplier→nation chain, so a
# supplier re-nationing moves its whole value contribution in or out),
# with the GLOBAL threshold derived from the same maintained state at
# read (one broadcast of the state's own total — no second view, no
# base scan).
# ---------------------------------------------------------------------------
_Q11VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q11VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias(
                "value_c"
            ),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("value_c"), F.desc("l_partkey"), F.desc("l_suppkey")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        supp_src = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
            "s_suppkey", "s_nationkey"
        )
        nat_src = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
            "n_nationkey", "n_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q11view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        supp = ManagedTable(wh / "supplier").create(
            supp_src, ["s_suppkey"], pk_buckets=4, cdf=True
        )
        nation = ManagedTable(wh / "nation").create(
            nat_src, ["n_nationkey"], pk_buckets=2, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[
                ("l_suppkey", []),         # supplier (carries s_nationkey)
                ("s_nationkey", []),       # nation, chained (σ)
            ],
            fact_group_cols=["l_partkey"],
            sum_cols={"value_cents": "value_c"},
            dim_wheres=[None, "n_name = 'NATION_2'"],
            dim_where_cols=[[], ["n_name"]],
        )
        mv.refresh_star(spark, li, [supp, nation])

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "value_c",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_partkey") % 89 + 1).alias("l_partkey"),
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            (F.col("value_c") + 7).alias("value_c"),
        )
        li.merge(spark, lbatch(l_del, "D").unionByName(lbatch(l_upd, "U")))
        # supplier re-nations CROSS the chained σ in both directions
        supp.merge(spark, supp_src.filter(F.col("s_suppkey") % 10 == 3).select(
            F.lit("U").alias("flag"),
            F.lit("supplier").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "s_suppkey",
            ((F.col("s_nationkey") + 1) % 25).alias("s_nationkey"),
        ))
        mv.refresh_star(spark, li, [supp, nation])
        _Q11VIEW_CACHE[sf_dir] = mv
    mv = _Q11VIEW_CACHE[sf_dir]
    state = mv.read(spark).select("l_partkey", "value_cents")
    tot = state.agg(
        F.coalesce(F.sum("value_cents"), F.lit(0)).alias("__total")
    )
    return (
        state.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 20000 > F.col("__total"))
        .select(
            "l_partkey", F.col("value_cents").cast("long").alias("value_cents")
        )
    )


_Q11VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, value_c FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS value_c,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      l_partkey DESC, l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_partkey % 89) + 1
              ELSE l_partkey END AS l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN value_c + 7
              ELSE value_c END AS value_c
  FROM li WHERE l_orderkey % 10 <> 7
), curs AS (
  SELECT s_suppkey,
         CASE WHEN s_suppkey % 10 = 3 THEN (s_nationkey + 1) % 25
              ELSE s_nationkey END AS s_nationkey
  FROM supplier
), v AS (
  SELECT l.l_partkey, CAST(SUM(l.value_c) AS BIGINT) AS value_cents
  FROM curl l
  JOIN curs s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_2'
  GROUP BY l.l_partkey
), tot AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total FROM v)
SELECT v.l_partkey, v.value_cents FROM v, tot
WHERE v.value_cents * 20000 > tot.total
"""


# ---------------------------------------------------------------------------
# TPC-H Q21 COMPOSED — the double-correlated EXISTS/NOT-EXISTS as two
# maintained DISTINCT views on one fact: n_supp per order (unfiltered)
# and n_ret per order (σ l_returnflag='R' — the round-8 σ on the
# single-table distinct view), whose SUPPORT STORE also answers the
# waiting supplier's IDENTITY (top_values k=1: for n_ret=1 orders the
# rank-1 value IS the supplier).  The orders-status σ rides the
# CURRENT orders state at read.  Churn: returnflag flips move orders
# across the n_ret boundary and change the culprit; status flips move
# orders in/out of the σ; deletes remove last returned rows.
# ---------------------------------------------------------------------------
_Q21_CACHE: dict[str, tuple] = {}


def pipeline_maintained_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.distinct_matview import MaintainedDistinctAggregate

    if sf_dir not in _Q21_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag"
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("l_suppkey"), F.desc("l_returnflag")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_orderstatus"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q21view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        dv_all = MaintainedDistinctAggregate(
            wh / "dv_all", ["l_orderkey"], {"n_supp": "l_suppkey"}
        )
        dv_ret = MaintainedDistinctAggregate(
            wh / "dv_ret", ["l_orderkey"], {"n_ret": "l_suppkey"},
            where="l_returnflag = 'R'", where_cols=["l_returnflag"],
        )
        dv_all.refresh(spark, li)
        dv_ret.refresh(spark, li)

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_flip = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_suppkey",
            F.when(F.col("l_returnflag") == "R", F.lit("N"))
            .otherwise(F.lit("R")).alias("l_returnflag"),
        )
        l_mv = li_src.filter(F.col("l_orderkey") % 10 == 5).select(
            "l_orderkey", "l_linenumber",
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            "l_returnflag",
        )
        li.merge(
            spark,
            lbatch(l_del, "D")
            .unionByName(lbatch(l_flip, "U"))
            .unionByName(lbatch(l_mv, "U")),
        )
        orders.merge(spark, ord_src.filter(F.col("o_orderkey") % 10 == 6).select(
            F.lit("U").alias("flag"),
            F.lit("orders").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "o_orderkey",
            F.when(F.col("o_orderstatus") == "F", F.lit("O"))
            .otherwise(F.lit("F")).alias("o_orderstatus"),
        ))
        dv_all.refresh(spark, li)
        dv_ret.refresh(spark, li)
        _Q21_CACHE[sf_dir] = (orders, dv_all, dv_ret)
    orders, dv_all, dv_ret = _Q21_CACHE[sf_dir]
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    f_orders = orders.read(spark).filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    nsupp = dv_all.read(spark).select(
        F.col("l_orderkey").alias("__ok_all"), "n_supp"
    )
    nret = dv_ret.read(spark).select("l_orderkey", "n_ret")
    culprit = dv_ret.top_values(spark, "n_ret", 1).select(
        F.col("l_orderkey").alias("__ok_top"), F.col("__v").alias("ret_supp")
    )
    qual = (
        nret.filter(F.col("n_ret") == 1)
        .join(nsupp, nret["l_orderkey"] == nsupp["__ok_all"], "inner")
        .filter(F.col("n_supp") >= 2)
        .join(
            f_orders, nret["l_orderkey"] == f_orders["o_orderkey"],
            "left_semi",
        )
        .join(culprit, nret["l_orderkey"] == culprit["__ok_top"], "inner")
    )
    return (
        qual.join(F.broadcast(supp), qual["ret_supp"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )


_Q21VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag FROM (
    SELECT l_orderkey, l_linenumber, l_suppkey, l_returnflag,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY l_suppkey DESC, l_returnflag DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey,
         CASE WHEN l_orderkey % 10 = 5 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN
                CASE WHEN l_returnflag = 'R' THEN 'N' ELSE 'R' END
              ELSE l_returnflag END AS l_returnflag
  FROM li WHERE l_orderkey % 10 <> 7
), curo AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 10 = 6 THEN
                CASE WHEN o_orderstatus = 'F' THEN 'O' ELSE 'F' END
              ELSE o_orderstatus END AS o_orderstatus
  FROM orders
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
           AS n_ret,
         MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS ret_supp
  FROM curl GROUP BY l_orderkey
)
SELECT s.s_suppkey, s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM per_order p
JOIN curo o ON p.l_orderkey = o.o_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON p.ret_supp = s.s_suppkey
WHERE p.n_supp >= 2 AND p.n_ret = 1
GROUP BY s.s_suppkey, s.s_name
"""


# ---------------------------------------------------------------------------
# TPC-H Q20 as a LIVE view — widget-part quantity per supplier: fact σ
# (1997 ship window) + dim σ (p_name LIKE — a predicate the part churn
# crosses by renaming parts into/out of widget-hood), supplier-grain
# maintained state, threshold + name join at read.
# ---------------------------------------------------------------------------
_Q20VIEW_CACHE: dict[str, object] = {}


def pipeline_maintained_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.join_matview import MaintainedStarAggregate

    if sf_dir not in _Q20VIEW_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            "l_shipdate",
            F.round(F.col("l_quantity")).cast("long").alias("qty"),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("qty"), F.desc("l_partkey"), F.desc("l_suppkey"),
            F.desc("l_shipdate"),
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_name"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q20view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        mv = MaintainedStarAggregate(
            wh / "mv",
            dims=[("l_partkey", [])],
            fact_group_cols=["l_suppkey"],
            sum_cols={"qty_shipped": "qty"},
            fact_where=(
                "l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND "
                "l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
            ),
            fact_where_cols=["l_shipdate"],
            dim_wheres=["p_name LIKE '%widget'"],
            dim_where_cols=[["p_name"]],
        )
        mv.refresh_star(spark, li, [part])

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "l_shipdate", "qty",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            (F.col("l_shipdate") + F.expr("INTERVAL 200 DAY")).alias(
                "l_shipdate"
            ),
            (F.col("qty") + 5).alias("qty"),
        )
        li.merge(spark, lbatch(l_del, "D").unionByName(lbatch(l_upd, "U")))
        # renames move parts INTO and OUT OF widget-hood (the LIKE σ)
        part.merge(spark, part_src.filter(F.col("p_partkey") % 6 == 1).select(
            F.lit("U").alias("flag"),
            F.lit("part").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "p_partkey",
            F.when(
                F.col("p_name").like("%widget"),
                F.concat(F.col("p_name"), F.lit("_x")),
            ).otherwise(F.lit("retro widget")).alias("p_name"),
        ))
        mv.refresh_star(spark, li, [part])
        _Q20VIEW_CACHE[sf_dir] = mv
    mv = _Q20VIEW_CACHE[sf_dir]
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    return (
        mv.read(spark)
        .filter(F.col("qty_shipped") > 100)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("qty_shipped").cast("long").alias("qty_shipped"),
        )
    )


_Q20VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate, qty
  FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
           CAST(round(l_quantity) AS BIGINT) AS qty,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_quantity) AS BIGINT) DESC,
                      l_partkey DESC, l_suppkey DESC, l_shipdate DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey, l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN l_shipdate + INTERVAL 200 DAY
              ELSE l_shipdate END AS l_shipdate,
         CASE WHEN l_orderkey % 10 = 4 THEN qty + 5 ELSE qty END AS qty
  FROM li WHERE l_orderkey % 10 <> 7
), curp AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 6 = 1 THEN
                CASE WHEN p_name LIKE '%widget' THEN p_name || '_x'
                     ELSE 'retro widget' END
              ELSE p_name END AS p_name
  FROM part
), shipped AS (
  SELECT l.l_suppkey, CAST(SUM(l.qty) AS BIGINT) AS qty_shipped
  FROM curl l JOIN curp p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE '%widget'
    AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, sh.qty_shipped
FROM shipped sh JOIN supplier s ON sh.l_suppkey = s.s_suppkey
WHERE sh.qty_shipped > 100
"""


# ---------------------------------------------------------------------------
# TPC-H Q2 COMPOSED — min-cost supplier per part: the (part × supplier)
# cost rollup is maintained (pair-grain state, collapsing repeat trades;
# O(changes) upkeep), and the read resolves the part σ first (p_size ≤ 5
# on the CURRENT part state) so the argmin window runs over the matched
# pairs only — churn re-ranks mins, deletes the current min pair, and
# moves parts across the σ.
# ---------------------------------------------------------------------------
_Q2_CACHE: dict[str, tuple] = {}


def pipeline_maintained_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .operators.matview import MaintainedAggregate

    if sf_dir not in _Q2_CACHE:
        raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
            F.round(F.col("l_extendedprice") * 100.0).cast("long").alias(
                "cents"
            ),
        )
        w = Window.partitionBy("l_orderkey", "l_linenumber").orderBy(
            F.desc("cents"), F.desc("l_partkey"), F.desc("l_suppkey")
        )
        li_src = (
            raw.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        part_src = spark.read.parquet(f"{sf_dir}/part.parquet").select(
            "p_partkey", "p_brand", "p_size"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_q2view_"))
        li = ManagedTable(wh / "lineitem").create(
            li_src, ["l_orderkey", "l_linenumber"], pk_buckets=8, cdf=True
        )
        part = ManagedTable(wh / "part").create(
            part_src, ["p_partkey"], pk_buckets=4, cdf=True
        )
        costv = MaintainedAggregate(
            wh / "costv", ["l_partkey", "l_suppkey"],
            sum_cols={"cost_cents": "cents"},
        )
        costv.refresh(spark, li)

        def lbatch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("lineitem").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                "cents",
            )

        l_del = li_src.filter(F.col("l_orderkey") % 10 == 7)
        l_upd = li_src.filter(F.col("l_orderkey") % 10 == 4).select(
            "l_orderkey", "l_linenumber", "l_partkey",
            (F.col("l_suppkey") % 97 + 1).alias("l_suppkey"),
            (F.col("cents") - 500).alias("cents"),   # re-ranks the argmin
        )
        li.merge(spark, lbatch(l_del, "D").unionByName(lbatch(l_upd, "U")))
        part.merge(spark, part_src.filter(F.col("p_partkey") % 9 == 2).select(
            F.lit("U").alias("flag"),
            F.lit("part").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "p_partkey", "p_brand",
            (F.col("p_size") % 10 + 1).alias("p_size"),  # σ crossings
        ))
        costv.refresh(spark, li)
        _Q2_CACHE[sf_dir] = (part, costv)
    part, costv = _Q2_CACHE[sf_dir]
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        "s_suppkey", "s_name"
    )
    small = part.read(spark).filter(F.col("p_size") <= 5).select(
        "p_partkey", "p_brand"
    )
    state = costv.read(spark).select("l_partkey", "l_suppkey", "cost_cents")
    matched = state.join(
        F.broadcast(small), state["l_partkey"] == small["p_partkey"], "inner"
    )
    wmin = Window.partitionBy("l_partkey")
    return (
        matched.withColumn("__min", F.min("cost_cents").over(wmin))
        .filter(F.col("cost_cents") == F.col("__min"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "p_partkey", "p_brand", "s_name",
            F.col("cost_cents").cast("long").alias("cost_cents"),
        )
    )


_Q2VIEW_ORACLE = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, cents FROM (
    SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
           CAST(round(l_extendedprice * 100.0) AS BIGINT) AS cents,
           row_number() OVER (
             PARTITION BY l_orderkey, l_linenumber
             ORDER BY CAST(round(l_extendedprice * 100.0) AS BIGINT) DESC,
                      l_partkey DESC, l_suppkey DESC
           ) AS rn
    FROM lineitem
  ) WHERE rn = 1
), curl AS (
  SELECT l_orderkey, l_partkey,
         CASE WHEN l_orderkey % 10 = 4 THEN (l_suppkey % 97) + 1
              ELSE l_suppkey END AS l_suppkey,
         CASE WHEN l_orderkey % 10 = 4 THEN cents - 500
              ELSE cents END AS cents
  FROM li WHERE l_orderkey % 10 <> 7
), curp AS (
  SELECT p_partkey, p_brand,
         CASE WHEN p_partkey % 9 = 2 THEN (p_size % 10) + 1
              ELSE p_size END AS p_size
  FROM part
), costs AS (
  SELECT l_partkey, l_suppkey, CAST(SUM(cents) AS BIGINT) AS cost_cents
  FROM curl GROUP BY 1, 2
), ranked AS (
  SELECT *, MIN(cost_cents) OVER (PARTITION BY l_partkey) AS min_cost
  FROM costs
)
SELECT p.p_partkey, p.p_brand, s.s_name, r.cost_cents
FROM ranked r
JOIN curp p ON r.l_partkey = p.p_partkey AND p.p_size <= 5
JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.cost_cents = r.min_cost
"""



# ---------------------------------------------------------------------------
# KMV sketch as DERIVED STATE — the SET-ALGEBRA distinct tier.  Three
# sketches maintained from ONE churned orders feed: the per-priority
# estimate sketch (pipeline_maintained_kmv: insert-only k-min fold,
# then the delete-triggered group-scoped recount, both asserted
# in-row), and two GLOBAL sigma-sketches over overlapping priority
# classes whose k-row states answer cross-set questions with no base
# scan: pipeline_kmv_union (k-min merge == direct build, bit-equal)
# and pipeline_kmv_intersection — the row HLL fundamentally cannot
# express: how many distinct customers the two classes SHARE,
# estimated from 2·k retained hashes via the theta-sketch overlap
# (rho/k of the union estimate).  n_hashes/theta/rho are cross-engine
# exact BIGINTs; est_raw is literal-numerator IEEE arithmetic in the
# same association order in both engines.
# ---------------------------------------------------------------------------
_KMVVIEW_CACHE: dict[str, object] = {}
_KMV_K = 256
_KMV_LO_WHERE = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
_KMV_HI_WHERE = "o_orderpriority IN ('2-HIGH', '3-MEDIUM')"
_KMV_LO_SQL = "o_orderpriority IN ('1-URGENT', '2-HIGH')"
_KMV_HI_SQL = "o_orderpriority IN ('2-HIGH', '3-MEDIUM')"


def _kmv_fixture(spark: SparkSession, sf_dir: str):
    from .operators.sketch import MaintainedKMVSketch

    if sf_dir not in _KMVVIEW_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_kmvview_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        sk = MaintainedKMVSketch(
            wh / "sk", ["o_orderpriority"], "o_custkey", k=_KMV_K
        )
        lo = MaintainedKMVSketch(
            wh / "lo", [], "o_custkey", k=_KMV_K,
            where=_KMV_LO_WHERE, where_cols=["o_orderpriority"],
        )
        hi = MaintainedKMVSketch(
            wh / "hi", [], "o_custkey", k=_KMV_K,
            where=_KMV_HI_WHERE, where_cols=["o_orderpriority"],
        )
        for s in (sk, lo, hi):
            s.refresh(spark, orders)  # seed

        def batch(df: DataFrame, flag: str) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_orderpriority",
            )

        # commit 1: INSERT-ONLY -> every sketch takes the k-min-merge fold
        orders.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                (F.col("o_custkey") + 500_000).alias("o_custkey"),
                "o_orderpriority",
            ),
            "I",
        ))
        for s in (sk, lo, hi):
            s.refresh(spark, orders)
            if int(s.meta()["recounts"]) != 0:
                raise RuntimeError(
                    "insert-only commit took the recount path — the "
                    "monotone k-min fold is broken"
                )
        # commit 2: DELETES -> the recount path (hashes may be evicted)
        orders.merge(spark, batch(
            ord_src.filter(F.col("o_orderkey") % 10 == 7), "D"
        ))
        for s in (sk, lo, hi):
            s.refresh(spark, orders)
            if int(s.meta()["recounts"]) != 1:
                raise RuntimeError(
                    "delete-bearing commit did not trigger the k-min "
                    "recount — the sketch would silently overestimate"
                )
        _KMVVIEW_CACHE[sf_dir] = (sk, lo, hi)
    return _KMVVIEW_CACHE[sf_dir]


def pipeline_maintained_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk, _, _ = _kmv_fixture(spark, sf_dir)
    return sk.estimate(spark).select(
        "o_orderpriority",
        F.col("n_hashes").cast("long").alias("n_hashes"),
        F.col("theta").cast("long").alias("theta"),
        "est_raw",
    )


def pipeline_kmv_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers in EITHER priority class, answered by k-min-
    merging the two global sigma-sketch states — bit-equal to the sketch a
    direct build over the OR-predicate would produce (the oracle builds
    exactly that), no scan of the base."""
    _, lo, hi = _kmv_fixture(spark, sf_dir)
    return lo.estimate_union(spark, hi, []).select(
        F.col("n_hashes").cast("long").alias("n_hashes"),
        F.col("theta").cast("long").alias("theta"),
        "est_raw",
    )


def pipeline_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers in BOTH priority classes from the two k-row
    states alone — the theta-sketch overlap estimate (rho hashes common
    below the union theta, scaled by the union estimate)."""
    _, lo, hi = _kmv_fixture(spark, sf_dir)
    return lo.estimate_intersection(spark, hi, []).select(
        F.col("n_union").cast("long").alias("n_union"),
        F.col("theta").cast("long").alias("theta"),
        F.col("rho").cast("long").alias("rho"),
        "est_raw",
    )


_KMV_CUR_SQL = """
  SELECT o_orderkey, o_custkey, o_orderpriority
  FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey + 500000, o_orderpriority
  FROM orders WHERE o_orderkey % 25 = 3
"""


def _kmvview_oracle() -> str:
    from .operators.sketch import kmv_hash_sql, kmv_numerator

    k = _KMV_K
    num = kmv_numerator(k)
    h = kmv_hash_sql("o_custkey")
    return f"""
WITH cur AS ({_KMV_CUR_SQL}), hs AS (
  SELECT DISTINCT o_orderpriority, {h} AS h
  FROM cur WHERE o_custkey IS NOT NULL
), kmin AS (
  SELECT o_orderpriority, h FROM (
    SELECT o_orderpriority, h,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY h) AS rn
    FROM hs
  ) WHERE rn <= {k}
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_hashes,
       CAST(MAX(h) AS BIGINT) AS theta,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE {num!r} / CAST(MAX(h) AS BIGINT) END AS est_raw
FROM kmin GROUP BY 1
"""


def _kmv_union_oracle() -> str:
    from .operators.sketch import kmv_hash_sql, kmv_numerator

    k = _KMV_K
    num = kmv_numerator(k)
    h = kmv_hash_sql("o_custkey")
    return f"""
WITH cur AS ({_KMV_CUR_SQL}), hs AS (
  SELECT DISTINCT {h} AS h
  FROM cur
  WHERE o_custkey IS NOT NULL AND (({_KMV_LO_SQL}) OR ({_KMV_HI_SQL}))
), kmin AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hs
  ) WHERE rn <= {k}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_hashes,
       CAST(MAX(h) AS BIGINT) AS theta,
       CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
            ELSE {num!r} / CAST(MAX(h) AS BIGINT) END AS est_raw
FROM kmin
"""


def _kmv_intersection_oracle() -> str:
    from .operators.sketch import kmv_hash_sql, kmv_numerator

    k = _KMV_K
    num = kmv_numerator(k)
    h = kmv_hash_sql("o_custkey")

    def kmin(pred: str) -> str:
        return f"""(
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT {h} AS h FROM cur
      WHERE o_custkey IS NOT NULL AND ({pred})
    )
  ) WHERE rn <= {k}
)"""

    return f"""
WITH cur AS ({_KMV_CUR_SQL}),
ka AS {kmin(_KMV_LO_SQL)},
kb AS {kmin(_KMV_HI_SQL)},
u AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT h FROM ka UNION SELECT h FROM kb
    )
  ) WHERE rn <= {k}
), ustats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(MAX(h) AS BIGINT) AS theta
  FROM u
), rho AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rho
  FROM (SELECT h FROM ka INTERSECT SELECT h FROM kb) c, ustats
  WHERE c.h <= ustats.theta
)
SELECT u.n_union, u.theta, r.rho,
       CASE WHEN u.n_union < {k} THEN CAST(r.rho AS DOUBLE)
            ELSE r.rho * {num!r} / u.theta / {float(k)!r} END AS est_raw
FROM ustats u, rho r
"""



# ---------------------------------------------------------------------------
# TSO-CONSISTENT CROSS-TABLE SNAPSHOT — the reference's one-TSO
# consistency (cmd/core.go:183-220: dump + changefeed share one
# startTSO fetched by tidbsql.GetCurrentTSO)
# carried through to multi-table READS: orders and customer are churned
# with interleaved fences (ts=10 on both, then ts=20 on both), and the
# snapshot pinned at ts=15 joins the two tables at their LAST COMPLETE
# COMMON FENCE — both ts=10 changes visible, both ts=20 changes not,
# so the join can never see an order without its customer epoch (a
# torn read).  Resolution is metadata-only (one commit-log scan per
# table) and the pinned read keeps bucket pruning.  The row also
# proves the pin is immutable: the ts=20 merges land BEFORE the
# snapshot is read, yet stay invisible.
# ---------------------------------------------------------------------------
_SNAPVIEW_CACHE: dict[str, object] = {}


def pipeline_consistent_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .table.consistent import ConsistentSnapshot

    if sf_dir not in _SNAPVIEW_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        from .operators.matview import MaintainedAggregate

        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_snapview_"))
        # cdf on orders feeds the maintained view the DERIVED-state pin
        # (pipeline_consistent_snapshot_view) covers at the same fence
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "cust").create(
            cust_src, ["c_custkey"], pk_buckets=8
        )
        rev = MaintainedAggregate(
            wh / "rev",
            ["ckbucket"],
            sum_cols={
                "revenue_cents": (
                    "CAST(round(o_totalprice * 100.0) AS BIGINT)"
                )
            },
            measure_cols=["o_totalprice"],
            derived_cols={
                "ckbucket": (
                    "CAST(o_custkey % 100 AS BIGINT)", ["o_custkey"]
                )
            },
            keep_versions=4,
        )
        rev.refresh(spark, orders)  # seed

        def obatch(df: DataFrame, flag: str, ts: int) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("orders").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(ts).cast("long").alias("commit_ts"),
                "o_orderkey", "o_custkey", "o_totalprice",
            )

        def cbatch(df: DataFrame, flag: str, ts: int) -> DataFrame:
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("cust").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(ts).cast("long").alias("commit_ts"),
                "c_custkey", "c_mktsegment",
            )

        # fence 10 on BOTH tables
        orders.merge(spark, obatch(
            ord_src.filter(F.col("o_orderkey") % 10 == 7), "D", 10
        ))
        rev.refresh(spark, orders)  # view state covering the ts=10 commit
        cust.merge(spark, cbatch(
            cust_src.filter(F.col("c_custkey") % 7 == 3).withColumn(
                "c_mktsegment", F.lit("MOVED")
            ),
            "U", 10,
        ))
        # fence 20 on BOTH tables — must stay invisible at the pin
        orders.merge(spark, obatch(
            ord_src.filter(F.col("o_orderkey") % 25 == 3).select(
                (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
                "o_custkey", "o_totalprice",
            ),
            "I", 20,
        ))
        rev.refresh(spark, orders)  # view advances PAST the pin
        cust.merge(spark, cbatch(
            cust_src.filter(F.col("c_custkey") % 5 == 1), "D", 20
        ))
        snap = ConsistentSnapshot(
            {"orders": orders, "cust": cust}, 15,
            views={"rev": (rev, "orders")},
        )
        if snap.fences() != {"orders": 10, "cust": 10}:
            raise RuntimeError(
                f"snapshot pinned {snap.fences()}, expected the common "
                "ts=10 fence — the TSO resolution is broken"
            )
        _SNAPVIEW_CACHE[sf_dir] = snap
    snap = _SNAPVIEW_CACHE[sf_dir]
    o = snap.read(spark, "orders")
    c = snap.read(spark, "cust")
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100.0, 0).cast("long")
            ).cast("long").alias("revenue_cents"),
        )
    )


_SNAPVIEW_ORACLE = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
), c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 3 THEN 'MOVED' ELSE c_mktsegment END
           AS c_mktsegment
  FROM customer
)
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM o JOIN c ON o.o_custkey = c.c_custkey
GROUP BY 1
"""


def pipeline_consistent_snapshot_view(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DERIVED state at the fence: the snapshot pins the maintained
    per-custkey-bucket revenue view to the version whose fold covers
    EXACTLY the pinned orders commit (cdf_seq mapping), even though the
    live view has since folded the ts=20 inserts — the oracle
    recomputes the aggregate relationally from the fenced rows, so a
    view served ahead of or behind the pin (the tear a per-table fence
    alone allows) breaks the hash."""
    pipeline_consistent_snapshot(spark, sf_dir)  # share the pinned fixture
    snap = _SNAPVIEW_CACHE[sf_dir]
    return snap.read(spark, "rev").select(
        F.col("ckbucket").cast("long").alias("ckbucket"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
    )


_SNAPVIEW_VIEW_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 10 <> 7
)
SELECT CAST(o_custkey % 100 AS BIGINT) AS ckbucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM o
GROUP BY 1
"""



# ---------------------------------------------------------------------------
# CM JOIN-SIZE STATISTIC — the planner-facing payoff of the linear
# sketch: |orders ⋈ customer ON custkey| estimated from the two
# maintained counter states alone (CM inner product: min over depth of
# Σ_bucket cntA·cntB — never an underestimate, Cormode & Muthukrishnan
# §4.2), next to the exact join count recomputed from the live rows,
# plus the orders-side SELF-join size (F2, Σ f(custkey)² — the skew
# statistic that says whether the key needs salting before a shuffle).
# Every output is an exact BIGINT; churn on BOTH feeds folds ± through
# the linear counters before the read.
# ---------------------------------------------------------------------------
_CMSJOIN_CACHE: dict[str, object] = {}
_CMSJOIN_D, _CMSJOIN_W = 3, 4096


def _cmsjoin_fixture(spark: SparkSession, sf_dir: str):
    from .operators.sketch import MaintainedCountMinSketch

    if sf_dir not in _CMSJOIN_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey"
        )
        cust_src = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
            "c_custkey", "c_mktsegment"
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_cmsjoin_"))
        orders = ManagedTable(wh / "orders").create(
            ord_src, ["o_orderkey"], pk_buckets=8, cdf=True
        )
        cust = ManagedTable(wh / "cust").create(
            cust_src, ["c_custkey"], pk_buckets=8, cdf=True
        )
        ska = MaintainedCountMinSketch(
            wh / "ska", [], "o_custkey", depth=_CMSJOIN_D, width=_CMSJOIN_W
        )
        skb = MaintainedCountMinSketch(
            wh / "skb", [], "c_custkey", depth=_CMSJOIN_D, width=_CMSJOIN_W
        )
        ska.refresh(spark, orders)
        skb.refresh(spark, cust)
        # churn BOTH feeds: orders lose the %10==7 slice and gain +100M
        # clones; customers %5==1 leave (their orders dangle — the join
        # size must drop with them)
        orders.merge(spark, ord_src.filter(
            F.col("o_orderkey") % 10 == 7
        ).select(
            F.lit("D").alias("flag"), F.lit("o").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "o_orderkey", "o_custkey",
        ))
        orders.merge(spark, ord_src.filter(
            F.col("o_orderkey") % 25 == 3
        ).select(
            F.lit("I").alias("flag"), F.lit("o").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(2).cast("long").alias("commit_ts"),
            (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
            "o_custkey",
        ))
        cust.merge(spark, cust_src.filter(
            F.col("c_custkey") % 5 == 1
        ).select(
            F.lit("D").alias("flag"), F.lit("c").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "c_custkey", "c_mktsegment",
        ))
        ska.refresh(spark, orders)
        skb.refresh(spark, cust)
        _CMSJOIN_CACHE[sf_dir] = (orders, cust, ska, skb)
    return _CMSJOIN_CACHE[sf_dir]


def pipeline_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust, ska, skb = _cmsjoin_fixture(spark, sf_dir)
    est = ska.estimate_join_size(spark, skb, []).select(
        F.col("est_join_size").cast("long").alias("est_join_size")
    )
    f2 = ska.estimate_join_size(spark, ska, []).select(
        F.col("est_join_size").cast("long").alias("est_f2")
    )
    exact = (
        orders.read(spark)
        .join(
            cust.read(spark),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact_join"))
    )
    return (
        exact.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(f2))
        .select("n_exact_join", "est_join_size", "est_f2")
    )


def _cmsjoin_oracle() -> str:
    from .operators.sketch import cms_bucket_sql

    d, w = _CMSJOIN_D, _CMSJOIN_W
    ob = cms_bucket_sql("o_custkey", "t.d", w)
    cb = cms_bucket_sql("c_custkey", "t.d", w)
    return f"""
WITH ocur AS (
  SELECT o_custkey FROM orders WHERE o_orderkey % 10 <> 7
  UNION ALL
  SELECT o_custkey FROM orders WHERE o_orderkey % 25 = 3
), ccur AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 5 <> 1
), ca AS (
  SELECT t.d AS depth, {ob} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ocur, range({d}) t(d) WHERE o_custkey IS NOT NULL
  GROUP BY 1, 2
), cb AS (
  SELECT t.d AS depth, {cb} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM ccur, range({d}) t(d) WHERE c_custkey IS NOT NULL
  GROUP BY 1, 2
), j AS (
  SELECT a.depth, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS s
  FROM ca a JOIN cb b USING (depth, bucket)
  GROUP BY 1
), f2 AS (
  SELECT a.depth, CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS s
  FROM ca a JOIN ca b USING (depth, bucket)
  GROUP BY 1
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_join
  FROM ocur o JOIN ccur c ON o.o_custkey = c.c_custkey
)
SELECT ex.n_exact_join,
       (SELECT CASE WHEN COUNT(*) < {d} THEN 0 ELSE MIN(s) END FROM j)
         AS est_join_size,
       (SELECT CASE WHEN COUNT(*) < {d} THEN 0 ELSE MIN(s) END FROM f2)
         AS est_f2
FROM ex
"""



# ---------------------------------------------------------------------------
# KMV DIFFERENCE row — the third leg of the set algebra over the same
# two sigma-sketch states: distinct customers with orders in the LO
# priority class and NONE in the HI class, from the retained hashes
# alone.  rho counts hashes retained by LO, absent from HI, at or below
# the union theta; the three rhos (∩, LO∖HI, HI∖LO) partition the
# union's retained set, so the estimates compose exactly.
# ---------------------------------------------------------------------------
def pipeline_kmv_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, lo, hi = _kmv_fixture(spark, sf_dir)
    return lo.estimate_difference(spark, hi, []).select(
        F.col("n_union").cast("long").alias("n_union"),
        F.col("theta").cast("long").alias("theta"),
        F.col("rho").cast("long").alias("rho"),
        "est_raw",
    )


def _kmv_difference_oracle() -> str:
    from .operators.sketch import kmv_hash_sql, kmv_numerator

    k = _KMV_K
    num = kmv_numerator(k)
    h = kmv_hash_sql("o_custkey")

    def kmin(pred: str) -> str:
        return f"""(
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT DISTINCT {h} AS h FROM cur
      WHERE o_custkey IS NOT NULL AND ({pred})
    )
  ) WHERE rn <= {k}
)"""

    return f"""
WITH cur AS ({_KMV_CUR_SQL}),
ka AS {kmin(_KMV_LO_SQL)},
kb AS {kmin(_KMV_HI_SQL)},
u AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM (
      SELECT h FROM ka UNION SELECT h FROM kb
    )
  ) WHERE rn <= {k}
), ustats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_union,
         CAST(MAX(h) AS BIGINT) AS theta
  FROM u
), rho AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rho
  FROM (SELECT h FROM ka EXCEPT SELECT h FROM kb) c, ustats
  WHERE c.h <= ustats.theta
)
SELECT u.n_union, u.theta, r.rho,
       CASE WHEN u.n_union < {k} THEN CAST(r.rho AS DOUBLE)
            ELSE r.rho * {num!r} / u.theta / {float(k)!r} END AS est_raw
FROM ustats u, rho r
"""


# ---------------------------------------------------------------------------
# QUANTILE UNION row — quantiles over TWO tables' bag-union from their
# maintained histograms alone (bins add; cross-table linearity).  The
# natural shape: a LIVE and an ARCHIVE orders table (keys split by
# parity), the live side churned, and the union histogram answering
# "the p25/p50/p90 order value across both" with no scan of either.
# ---------------------------------------------------------------------------
_QUNION_CACHE: dict[str, object] = {}


def pipeline_quantile_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sketch import MaintainedQuantileHistogram

    if sf_dir not in _QUNION_CACHE:
        ord_src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100.0).cast("long").alias(
                "cents"
            ),
        )
        wh = Path(tempfile.mkdtemp(prefix="tidb2dw_qunion_"))
        live = ManagedTable(wh / "live").create(
            ord_src.filter(F.col("o_orderkey") % 2 == 0),
            ["o_orderkey"], pk_buckets=8, cdf=True,
        )
        archive = ManagedTable(wh / "arch").create(
            ord_src.filter(F.col("o_orderkey") % 2 == 1),
            ["o_orderkey"], pk_buckets=8, cdf=True,
        )
        qlive = MaintainedQuantileHistogram(
            wh / "qlive", [], "cents", bin_width=_QSKETCH_W
        )
        qarch = MaintainedQuantileHistogram(
            wh / "qarch", [], "cents", bin_width=_QSKETCH_W
        )
        qlive.refresh(spark, live)
        qarch.refresh(spark, archive)
        # churn the live side only; the archive histogram stays frozen
        live.merge(spark, ord_src.filter(
            (F.col("o_orderkey") % 2 == 0) & (F.col("o_orderkey") % 10 == 4)
        ).select(
            F.lit("D").alias("flag"), F.lit("o").alias("tablename"),
            F.lit("s").alias("schemaname"),
            F.lit(1).cast("long").alias("commit_ts"),
            "o_orderkey", "cents",
        ))
        qlive.refresh(spark, live)
        _QUNION_CACHE[sf_dir] = (qlive, qarch)
    qlive, qarch = _QUNION_CACHE[sf_dir]
    return qlive.quantiles_union(spark, qarch, [250, 500, 900], [])


_QUNION_ORACLE = f"""
WITH base AS (
  SELECT o_orderkey,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders
), cur AS (
  SELECT cents FROM base
  WHERE o_orderkey % 2 = 0 AND o_orderkey % 10 <> 4
  UNION ALL
  SELECT cents FROM base WHERE o_orderkey % 2 = 1
), hist AS (
  SELECT (((cents) - (((cents) % {_QSKETCH_W} + {_QSKETCH_W})
            % {_QSKETCH_W}))) // {_QSKETCH_W} AS bin,
         COUNT(*) AS n
  FROM cur WHERE cents IS NOT NULL GROUP BY 1
), cum AS (
  SELECT bin, n,
         SUM(n) OVER (ORDER BY bin) AS cum,
         SUM(n) OVER () AS total
  FROM hist
), q AS (SELECT unnest([250, 500, 900]) AS q_milli)
SELECT CAST(q_milli AS BIGINT) AS q_milli,
       CAST(rank AS BIGINT) AS rank, CAST(total AS BIGINT) AS total,
       CAST(bin_lo AS BIGINT) AS bin_lo, CAST(bin_hi AS BIGINT) AS bin_hi
FROM (
  SELECT q.q_milli,
         GREATEST(1, (q.q_milli * c.total + 999) // 1000) AS rank,
         c.total, c.bin * {_QSKETCH_W} AS bin_lo,
         (c.bin + 1) * {_QSKETCH_W} AS bin_hi,
         row_number() OVER (
           PARTITION BY q.q_milli ORDER BY c.bin
         ) AS rn
  FROM cum c CROSS JOIN q
  WHERE c.cum >= GREATEST(1, (q.q_milli * c.total + 999) // 1000)
) WHERE rn = 1
"""


QUERIES = {
    "pipeline_changelog_replay": pipeline_changelog_replay,
    "pipeline_replay_resume": pipeline_replay_resume,
    "pipeline_mor_replay": pipeline_mor_replay,
    "pipeline_cdf_replay": pipeline_cdf_replay,
    "pipeline_rename_continuity": pipeline_rename_continuity,
    "pipeline_stream_selfheal": pipeline_stream_selfheal,
    "pipeline_maintained_q16": pipeline_maintained_q16,
    "pipeline_q16_top_suppliers": pipeline_q16_top_suppliers,
    "pipeline_maintained_q5": pipeline_maintained_q5,
    "pipeline_maintained_q7": pipeline_maintained_q7,
    "pipeline_maintained_q7_roles": pipeline_maintained_q7_roles,
    "pipeline_maintained_q10": pipeline_maintained_q10,
    "pipeline_maintained_q12": pipeline_maintained_q12,
    "pipeline_maintained_q14": pipeline_maintained_q14,
    "pipeline_maintained_q15": pipeline_maintained_q15,
    "pipeline_maintained_hll": pipeline_maintained_hll,
    "pipeline_maintained_kmv": pipeline_maintained_kmv,
    "pipeline_kmv_union": pipeline_kmv_union,
    "pipeline_kmv_intersection": pipeline_kmv_intersection,
    "pipeline_kmv_difference": pipeline_kmv_difference,
    "pipeline_quantile_union": pipeline_quantile_union,
    "pipeline_hll_rollup": pipeline_hll_rollup,
    "pipeline_hll_union": pipeline_hll_union,
    "pipeline_quantile_sketch": pipeline_quantile_sketch,
    "pipeline_quantile_rollup": pipeline_quantile_rollup,
    "pipeline_quantile_range": pipeline_quantile_range,
    "pipeline_maintained_cms": pipeline_maintained_cms,
    "pipeline_cms_rollup": pipeline_cms_rollup,
    "pipeline_cms_join_size": pipeline_cms_join_size,
    "pipeline_cms_heavy_hitters": pipeline_cms_heavy_hitters,
    "pipeline_cms_range_count": pipeline_cms_range_count,
    "pipeline_cms_quantile": pipeline_cms_quantile,
    "pipeline_cms_string_topk": pipeline_cms_string_topk,
    "pipeline_maintained_monthly": pipeline_maintained_monthly,
    "pipeline_maintained_q4": pipeline_maintained_q4,
    "pipeline_maintained_q6": pipeline_maintained_q6,
    "pipeline_maintained_q19": pipeline_maintained_q19,
    "pipeline_maintained_q22": pipeline_maintained_q22,
    "pipeline_maintained_q8": pipeline_maintained_q8,
    "pipeline_maintained_q17": pipeline_maintained_q17,
    "pipeline_maintained_q9": pipeline_maintained_q9,
    "pipeline_maintained_q11": pipeline_maintained_q11,
    "pipeline_maintained_q21": pipeline_maintained_q21,
    "pipeline_maintained_q2": pipeline_maintained_q2,
    "pipeline_maintained_q20": pipeline_maintained_q20,
    "pipeline_maintained_q18": pipeline_maintained_q18,
    "pipeline_maintained_bm25": pipeline_maintained_bm25,
    "pipeline_incremental_minmax": pipeline_incremental_minmax,
    "pipeline_incremental_agg": pipeline_incremental_agg,
    "pipeline_incremental_join_agg": pipeline_incremental_join_agg,
    "pipeline_star_join_agg": pipeline_star_join_agg,
    "pipeline_snowflake_join_agg": pipeline_snowflake_join_agg,
    "pipeline_join_minmax": pipeline_join_minmax,
    "pipeline_maintained_q1": pipeline_maintained_q1,
    "pipeline_maintained_q3": pipeline_maintained_q3,
    "pipeline_maintained_q13": pipeline_maintained_q13,
    "pipeline_incremental_distinct": pipeline_incremental_distinct,
    "pipeline_distinct_topk": pipeline_distinct_topk,
    "pipeline_distinct_quantile": pipeline_distinct_quantile,
    "pipeline_time_travel": pipeline_time_travel,
    "pipeline_consistent_snapshot": pipeline_consistent_snapshot,
    "pipeline_consistent_snapshot_view": pipeline_consistent_snapshot_view,
    "table_point_lookup": table_point_lookup,
    "table_index_lookup": table_index_lookup,
    "table_index_range_lookup": table_index_range_lookup,
}
ORACLES = {
    "pipeline_changelog_replay": _fold_oracle(REPLAY_ROOT),
    "pipeline_replay_resume": _fold_oracle(RESUME_ROOT),
    "pipeline_mor_replay": _fold_oracle(MOR_ROOT),
    "pipeline_cdf_replay": _cdf_changes_oracle(CDF_ROOT),
    # the Spark side returns the feed twice (batch changes() + the
    # commit-log streaming drain), labeled by 'via' — the oracle mirrors
    # the duplication so EACH surface must independently reproduce every
    # conformed change row
    "pipeline_rename_continuity": (
        f"WITH feed AS ({_rename_changes_oracle(RENAME_ROOT)})\n"
        "SELECT f.*, 'batch' AS via FROM feed f\n"
        "UNION ALL\nSELECT f.*, 'stream' AS via FROM feed f"
    ),
    "pipeline_stream_selfheal": _SELFHEAL_ORACLE,
    "pipeline_maintained_q16": _Q16VIEW_ORACLE,
    "pipeline_q16_top_suppliers": _Q16TOP_ORACLE,
    "pipeline_maintained_q5": _Q5VIEW_ORACLE,
    "pipeline_maintained_q7": _Q7VIEW_ORACLE,
    "pipeline_maintained_q7_roles": _Q7ROLES_ORACLE,
    "pipeline_maintained_q10": _Q10VIEW_ORACLE,
    "pipeline_maintained_q12": _Q12VIEW_ORACLE,
    "pipeline_maintained_q14": _Q14VIEW_ORACLE,
    "pipeline_maintained_q15": _Q15VIEW_ORACLE,
    "pipeline_maintained_hll": _hllview_oracle(),
    "pipeline_maintained_kmv": _kmvview_oracle(),
    "pipeline_kmv_union": _kmv_union_oracle(),
    "pipeline_kmv_intersection": _kmv_intersection_oracle(),
    "pipeline_kmv_difference": _kmv_difference_oracle(),
    "pipeline_quantile_union": _QUNION_ORACLE,
    "pipeline_hll_rollup": _hll_rollup_oracle(),
    "pipeline_hll_union": _hll_union_oracle(),
    "pipeline_quantile_sketch": _QSKETCH_ORACLE,
    "pipeline_quantile_rollup": _QROLLUP_ORACLE,
    "pipeline_quantile_range": _QRANGE_ORACLE,
    "pipeline_maintained_cms": _cms_oracle(),
    "pipeline_cms_rollup": _cms_rollup_oracle(),
    "pipeline_cms_join_size": _cmsjoin_oracle(),
    "pipeline_cms_heavy_hitters": _cmhh_oracle(),
    "pipeline_cms_range_count": _cmhh_range_oracle(),
    "pipeline_cms_quantile": _cmhh_quantile_oracle(),
    "pipeline_cms_string_topk": _shh_oracle(),
    "pipeline_maintained_monthly": _MONTHLY_ORACLE,
    "pipeline_maintained_q4": _Q4VIEW_ORACLE,
    "pipeline_maintained_q6": _Q6VIEW_ORACLE,
    "pipeline_maintained_q19": _Q19VIEW_ORACLE,
    "pipeline_maintained_q22": _Q22VIEW_ORACLE,
    "pipeline_maintained_q8": _Q8VIEW_ORACLE,
    "pipeline_maintained_q17": _Q17VIEW_ORACLE,
    "pipeline_maintained_q9": _Q9VIEW_ORACLE,
    "pipeline_maintained_q11": _Q11VIEW_ORACLE,
    "pipeline_maintained_q21": _Q21VIEW_ORACLE,
    "pipeline_maintained_q2": _Q2VIEW_ORACLE,
    "pipeline_maintained_q20": _Q20VIEW_ORACLE,
    "pipeline_maintained_q18": _Q18VIEW_ORACLE,
    "pipeline_maintained_bm25": _bm25view_oracle(),
    "pipeline_incremental_minmax": _minmax_oracle(MINMAX_ROOT),
    "pipeline_incremental_agg": _incremental_agg_oracle(CDF_ROOT),
    "pipeline_incremental_join_agg": _JOINAGG_ORACLE,
    "pipeline_star_join_agg": _STAR_ORACLE,
    "pipeline_snowflake_join_agg": _SNOWFLAKE_ORACLE,
    "pipeline_join_minmax": _JOINMM_ORACLE,
    "pipeline_maintained_q1": _Q1VIEW_ORACLE,
    "pipeline_maintained_q3": _Q3VIEW_ORACLE,
    "pipeline_maintained_q13": _Q13VIEW_ORACLE,
    "pipeline_incremental_distinct": _DISTINCT_ORACLE,
    "pipeline_distinct_topk": _DISTINCT_TOPK_ORACLE,
    "pipeline_distinct_quantile": _QUANTILE_ORACLE,
    "pipeline_time_travel": _time_travel_oracle(CDF_ROOT),
    "pipeline_consistent_snapshot": _SNAPVIEW_ORACLE,
    "pipeline_consistent_snapshot_view": _SNAPVIEW_VIEW_ORACLE,
    "table_point_lookup": POINT_LOOKUP_ORACLE,
    "table_index_lookup": _index_lookup_oracle(),
    "table_index_range_lookup": _index_range_lookup_oracle(),
}
