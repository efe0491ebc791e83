"""Secondary index over a ManagedTable column, maintained from the change
data feed.

A PK-bucketed table answers key probes in O(probed buckets)
(``read_for_keys``), but a predicate on any OTHER column still scans every
bucket.  Warehouses solve this with a value-keyed derived table kept fresh
by the pipeline; this module is that pattern as a first-class object:

    <root>/_meta.json              {"applied_seq", "version", "col", "pk",
                                    "n_buckets", "bucket_versions"}
    <root>/v=N/__vb=B/…            (col value, pk…) entries, hash-bucketed
                                   BY VALUE

- ``build()`` scans the base once and writes every value bucket.
- ``refresh()`` folds a CDF slice: preimage/delete rows REMOVE their
  (old value, pk) entry, postimage/insert rows ADD theirs — an update
  that changes the indexed value naturally moves the entry between value
  buckets.  Only touched value buckets rewrite (the same bucket_versions
  trick as ManagedTable), so maintenance is O(changes + touched buckets),
  never O(base table).
- ``lookup()`` hashes the probe value DRIVER-side (md5-derived bucket —
  the same engine-portable idiom as the bloom probe, which is why the
  indexed column is restricted to string/integer types), reads ONE value
  bucket, and hands the matching PKs to ``source.read_for_keys`` — a
  fully index-accelerated point query: O(1) index probe + O(k) base
  buckets, independent of table size at both hops.

NULL values are not indexed (lookups are equality probes; SQL equality
never matches NULL).  Exactly-once across restarts mirrors the managed
table: state lives in ``_meta.json``, committed by ``os.replace`` after
the data write, and orphan version directories from crashes are
overwritten on retry.
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

from ..functions.dedup import md5_long, md5_long_py
from ..table.managed import CHANGE_TYPE_COL, COMMIT_SEQ_COL, ManagedTable

VAL_BUCKET_COL = "__vb"
_ADD_TYPES = ("insert", "update_postimage")
_REMOVE_TYPES = ("delete", "update_preimage")


class SecondaryIndex:
    def __init__(self, root, col: str, pk_cols: Sequence[str], n_buckets: int = 16):
        self.root = Path(root)
        self.col = col
        self.pk_cols = list(pk_cols)
        self.n_buckets = n_buckets

    # -- meta -------------------------------------------------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def _load_meta(self, src_m: dict | None = None) -> dict:
        """Read persisted meta AND reconcile it with the constructor: the
        stored (col, pk, n_buckets) are authoritative — a reconstructed
        object with a different n_buckets would mis-hash every probe and
        silently return empty lookups, so n_buckets is adopted from disk
        and a col/pk mismatch (a genuinely different index) is an error.

        With the source manifest available, the constructor may also name
        the columns by their CURRENT (post-rename) base-table names: the
        stored field ids translate them, and the index keeps operating
        under its build-time (stored) names internally — bucket files
        never need rewriting for a base RENAME."""
        m = self.meta()
        if m["col"] != self.col or m["pk"] != self.pk_cols:
            ok = False
            ids = m.get("field_ids") or {}
            if src_m is not None and ids:
                inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
                cur_col = inv.get(ids.get(m["col"]), m["col"])
                cur_pk = [inv.get(ids.get(c), c) for c in m["pk"]]
                ok = cur_col == self.col and cur_pk == self.pk_cols
            if not ok:
                raise ValueError(
                    f"index at {self.root} is over ({m['col']!r}, pk={m['pk']}), "
                    f"not ({self.col!r}, pk={self.pk_cols})"
                )
        self.col, self.pk_cols = m["col"], list(m["pk"])
        self.n_buckets = m["n_buckets"]
        return m

    def _cur_names(self, m: dict, src_m: dict) -> dict[str, str]:
        """stored name → current base-table name, via field ids."""
        ids = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        return {
            n: inv.get(ids.get(n), n) for n in [m["col"], *m["pk"]]
        }

    def _commit(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    # -- hashing ----------------------------------------------------------
    def _bucket_col(self) -> F.Column:
        return F.pmod(
            md5_long(F.col(self.col).cast("string")), F.lit(self.n_buckets)
        )

    def _bucket_of(self, value) -> int:
        """Driver-side twin of :meth:`_bucket_col` (shared md5_long_py —
        identical for the string/int types the index admits)."""
        return md5_long_py(value) % self.n_buckets

    def _entries(self, df: DataFrame) -> DataFrame:
        return df.filter(F.col(self.col).isNotNull()).select(
            self.col, *self.pk_cols
        )

    # -- build / refresh --------------------------------------------------
    def build(self, spark: SparkSession, source: ManagedTable) -> int:
        """Full scan of the base table → every value bucket written;
        records the source's current cdf_seq so refresh() starts exactly
        after the state this build saw."""
        # one manifest read pins the scanned data AND the recorded seq (a
        # merge landing in between would otherwise be both in the build
        # and replayed by the first refresh), and one DataFrame serves the
        # type check and the scan
        src_m = source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        df = source._read_state(spark, src_m)
        dtypes = dict(df.dtypes)
        if dtypes.get(self.col) not in (
            "string", "int", "bigint", "smallint", "tinyint", "long",
        ):
            raise ValueError(
                f"indexed column {self.col!r} has type {dtypes.get(self.col)}; "
                "only string/integer columns probe reproducibly driver-side"
            )
        out = self._entries(df).withColumn(VAL_BUCKET_COL, self._bucket_col())
        out.write.mode("overwrite").partitionBy(VAL_BUCKET_COL).parquet(
            str(self.root / "v=1")
        )
        # pin the indexed columns' field ids: refresh/lookup translate a
        # later base RENAME back to these build-time names, so the bucket
        # files (physically carrying build-time names) never rewrite
        src_ids = src_m.get("field_ids", {})
        self._commit(
            {
                "applied_seq": src_seq,
                "version": 1,
                "col": self.col,
                "pk": self.pk_cols,
                "n_buckets": self.n_buckets,
                "bucket_versions": {str(b): 1 for b in range(self.n_buckets)},
                "field_ids": {
                    n: src_ids[n]
                    for n in [self.col, *self.pk_cols]
                    if n in src_ids
                },
            }
        )
        return src_seq

    def _read_buckets(self, spark: SparkSession, m: dict, buckets) -> DataFrame | None:
        paths = []
        for b in buckets:
            p = self.root / f"v={m['bucket_versions'][str(b)]}" / f"{VAL_BUCKET_COL}={b}"
            if p.exists():
                paths.append(str(p))
        return spark.read.parquet(*paths) if paths else None

    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Fold the feed slice (applied_seq, cdf_seq]: rewrite only the
        value buckets that gained or lost entries."""
        src_m = source.manifest()
        m = self._load_meta(src_m)
        since, src_seq = m["applied_seq"], src_m.get("cdf_seq", 0)
        if src_seq <= since:
            return since
        ch = source.changes(spark, since=since, until=src_seq)
        # translate the feed's current names back to the index's stored
        # (build-time) names by field id: a base RENAME barrier inside
        # the slice is then invisible to the fold below
        names = self._cur_names(m, src_m)
        ch = ch.select(
            F.col(CHANGE_TYPE_COL),
            F.col(COMMIT_SEQ_COL),
            *[
                F.col(cur).alias(stored) if cur != stored else F.col(stored)
                for stored, cur in names.items()
            ],
        )
        # Collapse the slice to each PK's NET effect before folding.  A
        # naive pairwise fold (preimages remove, postimages add) is wrong
        # the moment a PK's indexed value changes more than once inside
        # the slice: commit 1 inserts value A, commit 2 updates A→B — the
        # commit-1 addition (A, pk) would survive the union even though
        # commit 2's preimage removed it, leaving a stale entry that
        # lookup(A) would serve forever.  Instead: every (value, pk) seen
        # ANYWHERE in the slice is a removal candidate, and only the
        # final image per PK (window by pk, last commit wins; within a
        # commit the postimage outranks its preimage) is re-added —
        # intermediate states never touch the index.
        from pyspark.sql import Window

        removals = self._entries(ch)
        w = Window.partitionBy(*self.pk_cols).orderBy(
            F.desc(COMMIT_SEQ_COL),
            F.desc(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES).cast("int")),
        )
        final = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        additions = self._entries(final.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES)))
        delta = removals.unionByName(additions)
        touched = sorted(
            r["b"]
            for r in delta.select(self._bucket_col().alias("b")).distinct().collect()
        )
        if not touched:
            m["applied_seq"] = src_seq
            self._commit(m)
            return src_seq
        new_version = m["version"] + 1
        base = self._read_buckets(spark, m, touched)
        # an entry is keyed by (value, pk): anti-join the removals,
        # union the additions; both sides are changes-sized → broadcast
        keyed = [self.col, *self.pk_cols]
        survivors = (
            base.join(F.broadcast(removals), on=keyed, how="left_anti")
            if base is not None
            else additions.limit(0)
        )
        out = (
            survivors.unionByName(additions)
            .dropDuplicates(keyed)
            .withColumn(VAL_BUCKET_COL, self._bucket_col())
        )
        out.write.mode("overwrite").partitionBy(VAL_BUCKET_COL).parquet(
            str(self.root / f"v={new_version}")
        )
        m["version"] = new_version
        for b in touched:
            m["bucket_versions"][str(b)] = new_version
        m["applied_seq"] = src_seq
        self._commit(m)
        for p in self.root.glob("v=*"):
            v = int(p.name.split("=", 1)[1])
            if v < new_version and v not in {
                int(x) for x in m["bucket_versions"].values()
            }:
                shutil.rmtree(p, ignore_errors=True)
        return src_seq

    # -- probe ------------------------------------------------------------
    def lookup_pks(self, spark: SparkSession, value) -> DataFrame:
        """PKs whose indexed column equals *value*: reads ONE value bucket
        (driver-side hash — no Spark job to locate it)."""
        m = self._load_meta()
        b = self._bucket_of(value)
        base = self._read_buckets(spark, m, [b])
        if base is None:
            from pyspark.sql.types import StructType

            fields = StructType()
            return spark.createDataFrame([], schema=fields)
        return base.filter(F.col(self.col) == value).select(*self.pk_cols)

    def lookup(self, spark: SparkSession, source: ManagedTable, value) -> DataFrame:
        """Index-accelerated equality read of the BASE table: one index
        bucket → matching PKs → bucket-pruned ``read_for_keys``."""
        src_m = source.manifest()
        m = self._load_meta(src_m)
        pks = self.lookup_pks(spark, value)
        if not pks.columns:
            return source.read(spark).limit(0)
        # the index's stored names may lag a base-table RENAME: hand the
        # base its CURRENT names (field-id translation)
        names = self._cur_names(m, src_m)
        pks = pks.select(
            *[
                F.col(stored).alias(names[stored])
                if names[stored] != stored
                else F.col(stored)
                for stored in self.pk_cols
            ]
        )
        # re-verify against the base row: index maintenance races (a
        # refresh lagging the base's cdf_seq) must surface as a MISS, not
        # as a row whose current value no longer matches the probe
        return source.read_for_keys(spark, pks).filter(
            F.col(names[self.col]) == value
        )
