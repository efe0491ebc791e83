"""Secondary index over ManagedTable columns, maintained from the change
data feed.

A PK-bucketed table answers key probes in O(probed buckets)
(``read_for_keys``), but a predicate on any OTHER column still scans every
bucket.  Warehouses solve this with a value-keyed derived table kept fresh
by the pipeline; this module is that pattern as a first-class object:

    <root>/_meta.json              {"applied_seq", "version", "col", "pk",
                                    "n_buckets", "layout", "bucket_versions",
                                    "field_ids"[, "boundaries", "zone"]}
    <root>/v=N/__vb=B/…            (col value(s), pk…) entries, bucketed
                                   BY VALUE

Two layouts:

- ``layout="hash"`` (default): buckets are ``md5(value) % n`` — equality
  probes only.  The indexed key may be a COMPOSITE (a sequence of
  columns): the hash covers the tuple (``concat_ws`` with an unlikely
  separator, bit-identical to the driver-side twin), and probes pass a
  matching tuple of values.
- ``layout="range"``: buckets are VALUE-SORTED — boundaries are fixed at
  build (approximate quantiles of the base), and ``_meta.json`` carries a
  per-bucket (min, max) ZONE MAP maintained at every refresh — the
  managed table's zone-map trick applied to the index itself.
  ``lookup_range(lo, hi)`` reads only buckets whose zone intersects the
  probe interval: O(intersecting buckets), independent of index size.
  Keys may be int, string, or date columns — including COMPOSITE keys
  ordered lexicographically (boundaries are typed tuples; the Spark side
  buckets by ``struct(cols) > struct(boundary)`` comparisons and the
  driver twin bisects the same tuples — Python str comparison by code
  point equals Spark's UTF-8 binary collation because UTF-8 preserves
  code-point order, and ``datetime.date`` ordering is the calendar order
  both engines use).  The warehouses the reference targets sort/cluster
  on arbitrary scalar columns (e.g. Redshift SORTKEY rendering,
  redshiftsql/sql.go:52-92); date-BETWEEN over a status prefix is the
  canonical analytics probe this layout serves.

- ``build()`` scans the base once and writes every value bucket.
- ``refresh()`` folds a CDF slice collapsed to each PK's NET effect:
  every (value, pk) seen anywhere in the slice is a removal candidate and
  only the per-PK final image re-adds — a value changing more than once
  inside one slice leaves no stale intermediate entries.  Only touched
  value buckets rewrite (the same bucket_versions trick as ManagedTable),
  so maintenance is O(changes + touched buckets), never O(base table).
- ``lookup()`` hashes/bisects the probe value DRIVER-side, reads ONE
  value bucket, and hands the matching PKs to ``source.read_for_keys`` —
  a fully index-accelerated point query: O(1) index probe + O(k) base
  buckets, independent of table size at both hops.  The base read is
  defensively re-filtered by the probe, so a refresh lagging the base
  surfaces as a miss, never a mismatched row.

Rename continuity: the indexed columns' FIELD IDS are pinned at build;
refresh/lookup translate a later base-table RENAME back to the build-time
(stored) names, so bucket files never rewrite for a rename and the object
may be reconstructed under either name.

NULL values are not indexed (lookups are equality/range probes; SQL
comparisons never match NULL — for composite keys, a NULL in ANY member
column excludes the row).  Exactly-once across restarts mirrors the
managed table: state lives in ``_meta.json``, committed by ``os.replace``
after the data write, and orphan version directories from crashes are
overwritten on retry.
"""

from __future__ import annotations

import bisect
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
# composite-key hash separator: unlikely in data, and the driver twin
# joins with the same byte so both sides hash the identical string
_SEP = "\x1f"
_PORTABLE_TYPES = ("string", "int", "bigint", "smallint", "tinyint", "long")
_NUM_TYPES = ("int", "bigint", "smallint", "tinyint", "long")
# timestamps admit range keys because every comparison is normalized to
# the session zone (pinned UTC): collected values shift local→UTC via
# _utc_key, literals parse as ISO strings in the session zone, and naive
# probe datetimes mean UTC wall time — so driver-side datetime ordering
# agrees with Spark's timestamp ordering on ANY host zone, the same
# contract string keys get from UTF-8 preserving code-point order
_RANGE_TYPES = _NUM_TYPES + ("string", "date", "timestamp", "timestamp_ntz")


def _enc_key(key: tuple) -> list:
    """JSON-encode one boundary/zone key tuple (dates/timestamps → ISO
    strings; datetime is a date subclass so one check covers both)."""
    import datetime as _dt

    return [v.isoformat() if isinstance(v, _dt.date) else v for v in key]


def _dec_key(raw: list, key_types: list[str]) -> tuple:
    """Decode a stored key back to the typed tuple the comparisons use."""
    import datetime as _dt

    out = []
    for v, t in zip(raw, key_types):
        if t == "date" and isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        elif t == "date" and isinstance(v, _dt.datetime):
            # a datetime probe against a date member: normalize, or the
            # driver-side tuple comparisons raise (datetime and date are
            # mutually incomparable in Python)
            v = v.date()
        elif t in ("timestamp", "timestamp_ntz") and isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        elif (
            t in ("timestamp", "timestamp_ntz")
            and isinstance(v, _dt.date)
            and not isinstance(v, _dt.datetime)
        ):
            # the mirror of the date-member case above: a plain date
            # probe against a timestamp member becomes midnight, or the
            # driver-side tuple comparisons raise TypeError
            v = _dt.datetime.combine(v, _dt.time.min)
        out.append(v)
    return tuple(out)


def _utc_key(key: tuple, key_types: list[str]) -> tuple:
    """Normalize a COLLECTED key tuple's TimestampType members to UTC
    wall time.  Classic PySpark's ``TimestampType.fromInternal`` runs
    ``datetime.fromtimestamp`` — the OS-LOCAL zone — even though the
    session (timeZone=UTC) ordered and will re-parse values in UTC, so
    on a non-UTC driver every collected timestamp arrives shifted.
    Boundaries and zone maps must store the UTC wall time or driver-side
    bisect/zone pruning silently disagrees with the Spark-side bucketing
    (a UTC host makes this a no-op; TIMESTAMP_NTZ's utcfromtimestamp and
    date's ordinal conversions are already zone-free)."""
    import datetime as _dt

    return tuple(
        v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        if t == "timestamp" and isinstance(v, _dt.datetime)
        else v
        for v, t in zip(key, key_types)
    )


class SecondaryIndex:
    def __init__(
        self,
        root,
        col: str | Sequence[str],
        pk_cols: Sequence[str],
        n_buckets: int = 16,
        layout: str = "hash",
    ):
        self.root = Path(root)
        self.cols = [col] if isinstance(col, str) else list(col)
        self.pk_cols = list(pk_cols)
        self.n_buckets = n_buckets
        if layout not in ("hash", "range"):
            raise ValueError(f"unknown index layout {layout!r}")
        self.layout = layout
        self.boundaries: list = []  # list of typed key TUPLES, sorted
        self.key_types: list = []

    @property
    def col(self) -> str:
        """Single-column convenience accessor (legacy callers)."""
        if len(self.cols) != 1:
            raise ValueError("composite index has no single .col")
        return self.cols[0]

    # -- meta -------------------------------------------------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    @staticmethod
    def _meta_cols(m: dict) -> list[str]:
        c = m["col"]
        return [c] if isinstance(c, str) else list(c)

    def _load_meta(self, src_m: dict | None = None) -> dict:
        """Read persisted meta AND reconcile it with the constructor: the
        stored (col, pk, n_buckets, layout) are authoritative — a
        reconstructed object with a different n_buckets would mis-hash
        every probe and silently return empty lookups, so layout state is
        adopted from disk and a col/pk mismatch (a genuinely different
        index) is an error.

        With the source manifest available, the constructor may also name
        the columns by their CURRENT (post-rename) base-table names: the
        stored field ids translate them, and the index keeps operating
        under its build-time (stored) names internally — bucket files
        never need rewriting for a base RENAME."""
        m = self.meta()
        stored_cols = self._meta_cols(m)
        if stored_cols != self.cols or m["pk"] != self.pk_cols:
            ok = False
            ids = m.get("field_ids") or {}
            if src_m is not None and ids:
                inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
                cur_cols = [inv.get(ids.get(c), c) for c in stored_cols]
                cur_pk = [inv.get(ids.get(c), c) for c in m["pk"]]
                ok = cur_cols == self.cols and cur_pk == self.pk_cols
            if not ok:
                raise ValueError(
                    f"index at {self.root} is over ({m['col']!r}, pk={m['pk']}), "
                    f"not ({self.cols!r}, pk={self.pk_cols})"
                )
        self.cols, self.pk_cols = stored_cols, list(m["pk"])
        self.n_buckets = m["n_buckets"]
        self.layout = m.get("layout", "hash")
        raw = m.get("boundaries", [])
        # legacy single-int stores kept scalar boundaries; current stores
        # keep typed tuples (lists) + their dtypes
        self.key_types = m.get("key_types") or ["bigint"] * len(self.cols)
        self.boundaries = sorted(
            _dec_key(b if isinstance(b, list) else [b], self.key_types)
            for b in raw
        )
        return m

    def _cur_names(self, m: dict, src_m: dict) -> dict[str, str]:
        """stored name → current base-table name, via field ids."""
        ids = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        return {
            n: inv.get(ids.get(n), n)
            for n in [*self._meta_cols(m), *m["pk"]]
        }

    def _commit(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    # -- bucketing --------------------------------------------------------
    def _key_expr(self) -> F.Column:
        """The sort key as ONE comparable Column: the bare column for a
        single-column key, a struct (Spark orders structs
        lexicographically) for a composite key."""
        if len(self.cols) == 1:
            return F.col(self.cols[0])
        return F.struct(*[F.col(c) for c in self.cols])

    def _member_lit(self, v, i: int) -> F.Column:
        """One boundary/probe member as a literal cast to the indexed
        column's exact Spark type — F.lit infers e.g. TIMESTAMP for a
        datetime while the column may be TIMESTAMP_NTZ, and struct
        comparisons reject mismatched member types.  datetime/date
        values route through an ISO-STRING cast: string→timestamp parses
        in the SESSION time zone (pinned UTC), whereas F.lit(datetime)
        bakes in the OS-local zone via time.mktime — wrong on any
        non-UTC driver."""
        import datetime as _dt

        if isinstance(v, _dt.datetime):
            lit = F.lit(v.isoformat(sep=" "))
        elif isinstance(v, _dt.date):
            lit = F.lit(v.isoformat())
        else:
            lit = F.lit(v)
        if i < len(self.key_types):
            lit = lit.cast(self.key_types[i])
        return lit

    def _key_lit(self, key: tuple) -> F.Column:
        if len(self.cols) == 1:
            return self._member_lit(key[0], 0)
        return F.struct(*[self._member_lit(v, i) for i, v in enumerate(key)])

    def _bucket_col(self) -> F.Column:
        if self.layout == "range":
            # static boundaries (fixed at build, like pk_buckets at
            # create): key k → #boundaries STRICTLY BELOW k, i.e.
            # bisect_left — a key equal to a boundary stays in the
            # lower bucket ((k > b) is false), and the driver twin must
            # mirror exactly that (boundaries come from quantiles, i.e.
            # they are real data values, so probes DO hit them).
            # Composite keys compare lexicographically via struct
            # ordering, matching Python tuple comparison; string order is
            # UTF-8 binary on both engines (UTF-8 preserves code points).
            key = self._key_expr()
            expr = F.lit(0)
            for b in self.boundaries:
                expr = expr + (key > self._key_lit(b)).cast("int")
            return expr
        return F.pmod(
            md5_long(
                F.concat_ws(_SEP, *[F.col(c).cast("string") for c in self.cols])
            ),
            F.lit(self.n_buckets),
        )

    def _coerce_key(self, value) -> tuple:
        """Normalize a probe value to the index's typed key tuple (scalars
        wrap; ISO strings against a date member decode — convenience for
        callers holding config-file probes)."""
        vals = tuple(value) if isinstance(value, (tuple, list)) else (value,)
        if len(vals) != len(self.cols):
            raise ValueError(
                f"probe has {len(vals)} value(s); index key is {self.cols}"
            )
        if self.layout == "range":
            return _dec_key(list(vals), self.key_types)
        return vals

    def _bucket_of(self, value) -> int:
        """Driver-side twin of :meth:`_bucket_col` (shared md5_long_py /
        bisect — identical for the types each layout admits)."""
        if self.layout == "range":
            # bisect_left twins the writer's strict (key > boundary)
            # count: boundary keys land in the LOWER bucket on both sides
            return bisect.bisect_left(self.boundaries, self._coerce_key(value))
        vals = self._coerce_key(value)
        return md5_long_py(_SEP.join(str(v) for v in vals)) % self.n_buckets

    def _entries(self, df: DataFrame) -> DataFrame:
        cond = None
        for c in self.cols:
            nn = F.col(c).isNotNull()
            cond = nn if cond is None else (cond & nn)
        return df.filter(cond).select(*self.cols, *self.pk_cols)

    # -- build / refresh --------------------------------------------------
    def build(
        self, spark: SparkSession, source: ManagedTable,
        manifest: dict | None = None,
    ) -> int:
        """Full scan of the base table → every value bucket written;
        records the source's current cdf_seq so refresh() starts exactly
        after the state this build saw.  *manifest* PINS the scanned
        state (same contract as ``read_for_keys``): a caller composing
        the index into a larger pinned refresh (e.g. the join view's
        chain-hop probe) passes its own manifest so the index lands at
        exactly that state, not a concurrently-advanced one."""
        # one manifest read pins the scanned data AND the recorded seq (a
        # merge landing in between would otherwise be both in the build
        # and replayed by the first refresh), and one DataFrame serves the
        # type check and the scan
        src_m = manifest if manifest is not None else source.manifest()
        src_seq = src_m.get("cdf_seq", 0)
        df = source._read_state(spark, src_m)
        dtypes = dict(df.dtypes)
        allowed = _RANGE_TYPES if self.layout == "range" else _PORTABLE_TYPES
        for c in self.cols:
            if dtypes.get(c) not in allowed:
                raise ValueError(
                    f"indexed column {c!r} has type {dtypes.get(c)}; "
                    f"{self.layout} layout admits only {allowed} so probes "
                    "reproduce driver-side"
                )
        if self.layout == "range":
            # boundary estimation — accuracy only affects balance, never
            # correctness (the same stored boundaries drive writes and
            # probes forever after).  Single numeric column: Spark's
            # approxQuantile (one distributed pass, no collect).  String/
            # date/composite keys: exact quantiles of a bounded SAMPLE
            # (~200k keys driver-side — sampling error only skews bucket
            # balance, and the sample is key-columns-only)
            self.key_types = [dtypes[c] for c in self.cols]
            if len(self.cols) == 1 and self.key_types[0] in _NUM_TYPES:
                qs = [i / self.n_buckets for i in range(1, self.n_buckets)]
                raw = df.select(
                    F.col(self.cols[0]).cast("double").alias(self.cols[0])
                ).na.drop()
                cuts = raw.approxQuantile(self.cols[0], qs, 0.001)
                self.boundaries = sorted({(int(x),) for x in cuts})
            else:
                # count + sample = two key-column scans; accepted — build
                # is already a full-table pass, the extra scan is pruned
                # to the key columns, and a blind limit() would bias the
                # boundaries to the first partitions of sorted data
                keyed = self._entries(df).select(*self.cols)
                n = keyed.count()
                frac = min(1.0, 200_000 / n) if n else 1.0
                sample = keyed.sample(False, frac, seed=7).limit(200_000).collect()
                keys = sorted(
                    _utc_key(tuple(r[c] for c in self.cols), self.key_types)
                    for r in sample
                )
                self.boundaries = sorted(
                    {
                        keys[(i * len(keys)) // self.n_buckets]
                        for i in range(1, self.n_buckets)
                    }
                    if keys
                    else set()
                )
        out = self._entries(df).withColumn(VAL_BUCKET_COL, self._bucket_col())
        out.write.mode("overwrite").partitionBy(VAL_BUCKET_COL).parquet(
            str(self.root / "v=1")
        )
        # pin the indexed columns' field ids: refresh/lookup translate a
        # later base RENAME back to these build-time names, so the bucket
        # files (physically carrying build-time names) never rewrite
        src_ids = src_m.get("field_ids", {})
        meta = {
            "applied_seq": src_seq,
            "version": 1,
            "col": self.cols[0] if len(self.cols) == 1 else self.cols,
            "pk": self.pk_cols,
            "n_buckets": self.n_buckets,
            "layout": self.layout,
            "bucket_versions": {str(b): 1 for b in range(self.n_buckets)},
            "field_ids": {
                n: src_ids[n]
                for n in [*self.cols, *self.pk_cols]
                if n in src_ids
            },
        }
        if self.layout == "range":
            meta["boundaries"] = [_enc_key(b) for b in self.boundaries]
            meta["key_types"] = self.key_types
            meta["zone"] = self._zone_of(out)
        self._commit(meta)
        return src_seq

    def _zone_of(self, out: DataFrame) -> dict:
        """Per-bucket (min, max) of the indexed key — the index's zone
        map, one bucket-count-sized collect.  Stored JSON-encoded
        (``[enc(lo_tuple), enc(hi_tuple)]``); composite keys take the
        lexicographic struct min/max, matching the bucketing order."""
        key = self._key_expr()
        zone = {}
        for r in (
            out.groupBy(F.col(VAL_BUCKET_COL).alias("b"))
            .agg(F.min(key).alias("lo"), F.max(key).alias("hi"))
            .collect()
        ):
            lo = tuple(r["lo"]) if len(self.cols) > 1 else (r["lo"],)
            hi = tuple(r["hi"]) if len(self.cols) > 1 else (r["hi"],)
            lo, hi = _utc_key(lo, self.key_types), _utc_key(hi, self.key_types)
            zone[str(r["b"])] = [_enc_key(lo), _enc_key(hi)]
        return zone

    def _read_buckets(self, spark: SparkSession, m: dict, buckets) -> DataFrame | None:
        paths = []
        for b in buckets:
            p = self.root / f"v={m['bucket_versions'][str(b)]}" / f"{VAL_BUCKET_COL}={b}"
            if p.exists():
                paths.append(str(p))
        return spark.read.parquet(*paths) if paths else None

    def refresh(
        self, spark: SparkSession, source: ManagedTable,
        manifest: dict | None = None,
    ) -> int:
        """Fold the feed slice (applied_seq, cdf_seq]: rewrite only the
        value buckets that gained or lost entries.  *manifest* PINS the
        slice's upper bound (see :meth:`build`); the caller must be the
        index's single writer so ``applied_seq`` only ever advances to
        its own pinned seqs."""
        src_m = manifest if manifest is not None else source.manifest()
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

        # persist both changes-sized frames: each is consumed by the
        # touched-bucket collect AND the rewrite below — without the
        # cache the feed slice (CDF read + the net-effect window) would
        # re-execute once per consumer (measured 3 slice reads per
        # refresh); the cached rows are O(changes), exactly what the
        # broadcast below assumes fits
        removals = self._entries(ch).persist()
        w = Window.partitionBy(*self.pk_cols).orderBy(
            F.desc(COMMIT_SEQ_COL),
            F.desc(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES).cast("int")),
        )
        final = (
            ch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        additions = self._entries(
            final.filter(F.col(CHANGE_TYPE_COL).isin(*_ADD_TYPES))
        ).persist()
        try:
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
            # an entry is keyed by (value(s), pk): anti-join the removals,
            # union the additions; both sides are changes-sized → broadcast
            keyed = [*self.cols, *self.pk_cols]
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
            if self.layout == "range":
                # zone maps of the rewritten buckets (others untouched) — a
                # bucket emptied by this refresh loses its zone and range
                # probes skip it (computed from the JUST-WRITTEN version
                # dir: a columnar min/max scan of the rewritten buckets,
                # instead of re-executing the whole rewrite lineage)
                zone = dict(m.get("zone", {}))
                new_zone = self._zone_of(
                    spark.read.parquet(str(self.root / f"v={new_version}"))
                )
                for b in touched:
                    if str(b) in new_zone:
                        zone[str(b)] = new_zone[str(b)]
                    else:
                        zone.pop(str(b), None)
                m["zone"] = zone
        finally:
            removals.unpersist()
            additions.unpersist()
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
        """PKs whose indexed column(s) equal *value* (a tuple for
        composite keys): reads ONE value bucket (driver-side hash/bisect
        — no Spark job to locate it)."""
        m = self._load_meta()
        b = self._bucket_of(value)
        base = self._read_buckets(spark, m, [b])
        if base is None:
            from pyspark.sql.types import StructType

            fields = StructType()
            return spark.createDataFrame([], schema=fields)
        vals = value if isinstance(value, (tuple, list)) else (value,)
        cond = None
        for c, v in zip(self.cols, vals):
            eq = F.col(c) == v
            cond = eq if cond is None else (cond & eq)
        return base.filter(cond).select(*self.pk_cols)

    def lookup_pks_in(self, spark: SparkSession, values) -> DataFrame:
        """PKs whose indexed key equals ANY of *values* (each a scalar,
        or a tuple for composite keys) — the batch twin of
        :meth:`lookup_pks`: ONE read over only the value buckets the
        probes hash/bisect to, O(distinct probe buckets) regardless of
        index size.  Serves reverse (attribute → pk) resolution — e.g.
        the join view's chain hop, where a changed dim's keys map back
        through the owning dim's attribute to its PKs without scanning
        the dim.  Hash layout admits only string/int key types, so plain
        literal IN is exact with no temporal-zone hazard; range-layout
        temporal keys route through the ISO-cast literals the layout's
        probes already use."""
        m = self._load_meta()
        keys = {self._coerce_key(v) for v in values}
        if not keys:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], schema=StructType())
        buckets = sorted({self._bucket_of(k) for k in keys})
        base = self._read_buckets(spark, m, buckets)
        if base is None:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], schema=StructType())
        use_lits = self.layout == "range"  # key_types known → cast lits
        if len(self.cols) == 1:
            cond = F.col(self.cols[0]).isin(
                [self._member_lit(k[0], 0) for k in keys]
                if use_lits
                else [k[0] for k in keys]
            )
        else:
            # per-member IN prunes the scan (pushes to parquet); the
            # struct-IN refines to the exact tuple set
            cond = F.struct(*[F.col(c) for c in self.cols]).isin(
                [
                    self._key_lit(k)
                    if use_lits
                    else F.struct(*[F.lit(v) for v in k])
                    for k in keys
                ]
            )
            for i, c in enumerate(self.cols):
                mem = (
                    [self._member_lit(k[i], i) for k in keys]
                    if use_lits
                    else [k[i] for k in keys]
                )
                cond = F.col(c).isin(mem) & cond
        return base.filter(cond).select(*self.pk_cols)

    def lookup_pks_semi(self, spark: SparkSession, keys: DataFrame) -> DataFrame:
        """Over-cap twin of :meth:`lookup_pks_in`: when the probe VALUE
        set is too large to materialize driver-side (a wide σ over the
        attribute — millions of keys at sf100), semi-join the whole
        index against the broadcast key frame instead.  O(index size)
        read — the index holds (value, pk) rows, orders of magnitude
        smaller than the base table it avoids scanning.  *keys* must
        carry the indexed column(s) under the index's own names; no
        driver round-trip means no literal-coercion hazard."""
        m = self._load_meta()
        base = self._read_buckets(
            spark, m, sorted(int(b) for b in m["bucket_versions"])
        )
        if base is None:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], schema=StructType())
        return base.join(
            F.broadcast(keys.select(*self.cols).distinct()),
            on=list(self.cols),
            how="left_semi",
        ).select(*self.pk_cols)

    def _range_buckets(self, lo: tuple, hi: tuple) -> list[int]:
        """Buckets whose ZONE MAP intersects [lo, hi] (typed key tuples) —
        the probe's read set, O(intersecting buckets) by construction."""
        if self.layout != "range":
            raise ValueError("range probes require layout='range'")
        m = self._load_meta()
        lo, hi = self._coerce_key(lo), self._coerce_key(hi)  # idempotent
        zone = m.get("zone", {})
        out = []
        for b, (bmin, bmax) in zone.items():
            if bmin is None or bmax is None:
                continue
            # legacy scalar zones wrap into 1-tuples like boundaries do
            zlo = _dec_key(bmin if isinstance(bmin, list) else [bmin], self.key_types)
            zhi = _dec_key(bmax if isinstance(bmax, list) else [bmax], self.key_types)
            if zlo <= hi and zhi >= lo:
                out.append(int(b))
        return sorted(out)

    def _range_filter(self, lo: tuple, hi: tuple, names=None) -> F.Column:
        """[lo, hi] lexicographic containment as a Column; for composite
        keys a leading-column conjunct rides along because the struct
        comparison itself cannot push down to the parquet scan while the
        plain leading-column bounds (implied by any lexicographic range)
        can."""
        names = names or {c: c for c in self.cols}
        if len(self.cols) == 1:
            c = F.col(names[self.cols[0]])
            return (c >= self._member_lit(lo[0], 0)) & (
                c <= self._member_lit(hi[0], 0)
            )
        key = F.struct(*[F.col(names[c]) for c in self.cols])
        los = F.struct(*[self._member_lit(v, i) for i, v in enumerate(lo)])
        his = F.struct(*[self._member_lit(v, i) for i, v in enumerate(hi)])
        c0 = F.col(names[self.cols[0]])
        push = (c0 >= self._member_lit(lo[0], 0)) & (
            c0 <= self._member_lit(hi[0], 0)
        )
        return push & (key >= los) & (key <= his)

    def lookup_range_pks(self, spark: SparkSession, lo, hi) -> DataFrame:
        """PKs whose indexed key lies in [lo, hi] lexicographically: reads
        ONLY the zone-intersecting value buckets."""
        m = self._load_meta()
        lo, hi = self._coerce_key(lo), self._coerce_key(hi)
        buckets = self._range_buckets(lo, hi)
        base = self._read_buckets(spark, m, buckets) if buckets else None
        if base is None:
            from pyspark.sql.types import StructType

            return spark.createDataFrame([], schema=StructType())
        return base.filter(self._range_filter(lo, hi)).select(*self.pk_cols)

    def _translated_pks(self, pks: DataFrame, names: dict[str, str]) -> DataFrame:
        """Hand the base its CURRENT pk names (field-id translation)."""
        return pks.select(
            *[
                F.col(stored).alias(names[stored])
                if names[stored] != stored
                else F.col(stored)
                for stored in self.pk_cols
            ]
        )

    def lookup(self, spark: SparkSession, source: ManagedTable, value) -> DataFrame:
        """Index-accelerated equality read of the BASE table: one index
        bucket → matching PKs → bucket-pruned ``read_for_keys``."""
        src_m = source.manifest()
        m = self._load_meta(src_m)
        pks = self.lookup_pks(spark, value)
        if not pks.columns:
            return source.read(spark).limit(0)
        names = self._cur_names(m, src_m)
        pks = self._translated_pks(pks, names)
        # re-verify against the base row: index maintenance races (a
        # refresh lagging the base's cdf_seq) must surface as a MISS, not
        # as a row whose current value no longer matches the probe
        vals = value if isinstance(value, (tuple, list)) else (value,)
        cond = None
        for c, v in zip(self.cols, vals):
            eq = F.col(names[c]) == v
            cond = eq if cond is None else (cond & eq)
        return source.read_for_keys(spark, pks).filter(cond)

    def lookup_range(
        self, spark: SparkSession, source: ManagedTable, lo, hi
    ) -> DataFrame:
        """Index-accelerated RANGE read of the BASE table: zone-pruned
        index buckets → matching PKs → bucket-pruned ``read_for_keys``,
        defensively re-filtered by the probe interval."""
        src_m = source.manifest()
        m = self._load_meta(src_m)
        lo, hi = self._coerce_key(lo), self._coerce_key(hi)
        pks = self.lookup_range_pks(spark, lo, hi)
        if not pks.columns:
            return source.read(spark).limit(0)
        names = self._cur_names(m, src_m)
        pks = self._translated_pks(pks, names)
        return source.read_for_keys(spark, pks).filter(
            self._range_filter(lo, hi, names)
        )
