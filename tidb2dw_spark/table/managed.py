"""Versioned Parquet managed table — the engine's "warehouse table".

The reference's sink is a warehouse table reached over SQL; ours is a
copy-on-write Parquet table with an atomically-swapped manifest, i.e. the
minimal core of what Delta/Iceberg provide (this container has no Delta):

    <root>/_meta/manifest.json     {"version": N, "pk": [...], "schema": ...}
    <root>/v=N/part-*.parquet      data for version N

Commits write the new version directory first, then atomically replace the
manifest (os.replace), so readers always see a complete version and a
crashed merge leaves the table at its previous version — this is what makes
at-least-once file processing + idempotent merge exactly-once
(SURVEY §2.10).  Old versions are retained for time travel / debugging and
vacuumed explicitly.

Scale: copy-on-write rewrites the table per merge, which is the right
baseline for warehouse parity (the reference's MERGE also rewrites
warehouse micro-partitions).  For 100 TB targets the write path partitions
by a stable hash-bucket of the PK (``pk_buckets``) so (a) merge joins
co-locate by bucket without shuffling the target and (b) a future
partial-rewrite merge only rewrites buckets containing touched keys — the
bucket column enables partition pruning on the anti-join side.
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

    def _commit(self, manifest: dict) -> None:
        meta_dir = self.root / "_meta"
        meta_dir.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=meta_dir, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path)

    # -- write paths ------------------------------------------------------
    def create(
        self,
        df: DataFrame,
        pk_cols: Sequence[str],
        pk_buckets: int = 0,
        extra_meta: dict | None = None,
    ) -> "ManagedTable":
        """CREATE OR REPLACE + initial load (S6 / D3 parity)."""
        self._write_version(df, 1, list(pk_cols), pk_buckets)
        manifest = {
            "version": 1,
            "pk": list(pk_cols),
            "pk_buckets": pk_buckets,
            "columns": df.drop(BUCKET_COL).columns if BUCKET_COL in df.columns else df.columns,
        }
        if extra_meta:
            manifest.update(extra_meta)
        self._commit(manifest)
        return self

    def overwrite(
        self,
        df: DataFrame,
        new_columns: list[str] | None = None,
        extra_meta: dict | None = None,
    ) -> int:
        """Commit *df* as the next version (used by merge & schema evolution).

        *extra_meta* lands in the same atomic manifest swap, so e.g. the
        consumer's applied source-schema version commits together with the
        data it applies to (exactly-once across restarts)."""
        m = self.manifest()
        new_version = m["version"] + 1
        self._write_version(df, new_version, m["pk"], m.get("pk_buckets", 0))
        m["version"] = new_version
        if new_columns is not None:
            m["columns"] = new_columns
        if extra_meta:
            m.update(extra_meta)
        self._commit(m)
        return new_version

    def update_meta(self, **kv) -> None:
        m = self.manifest()
        m.update(kv)
        self._commit(m)

    def _write_version(
        self, df: DataFrame, version: int, pk_cols: list[str], pk_buckets: int
    ) -> None:
        path = str(self.root / f"v={version}")
        if pk_buckets > 0:
            # stable hash-bucketing by PK: co-locates merge joins and enables
            # bucket-pruned partial rewrites at scale
            bucket = F.pmod(F.hash(*[F.col(c) for c in pk_cols]), F.lit(pk_buckets))
            df = df.withColumn(BUCKET_COL, bucket)
            df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
        else:
            df.write.mode("overwrite").parquet(path)

    # -- read path --------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        m = self.manifest()
        v = version if version is not None else m["version"]
        df = spark.read.parquet(str(self.root / f"v={v}"))
        if BUCKET_COL in df.columns:
            df = df.drop(BUCKET_COL)
        # manifest column order is the authoritative schema order
        cols = [c for c in m.get("columns", df.columns) if c in df.columns]
        return df.select(*cols)

    # -- maintenance ------------------------------------------------------
    def vacuum(self, keep_last: int = 1) -> list[int]:
        """Drop all but the newest *keep_last* version directories."""
        current = self.version()
        removed = []
        for p in sorted(self.root.glob("v=*")):
            v = int(p.name.split("=", 1)[1])
            if v <= current - keep_last:
                shutil.rmtree(p)
                removed.append(v)
        return removed
