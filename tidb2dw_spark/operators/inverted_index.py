"""Incremental INVERTED INDEX + maintained BM25 over the change feed.

The text-retrieval twin of the ANN derived state: a corpus that churns
(docs added, edited, deleted) keeps a searchable term index — and the
BM25 corpus statistics that rank against it — fresh at
O(changed docs' tokens + touched buckets) per refresh, never O(corpus).
The reference replicates document tables and leaves search to the
warehouse engine (recomputed per query); a 100 TB corpus can't re-scan
per query, and a static index (text.bm25_topk explodes the corpus every
call) goes stale the first merge after it's built.

Both persisted structures are :class:`~.distinct_matview.SupportStore`
multisets — the observation that makes this ~free to maintain:

- ``tf``:  H(term, doc) = token occurrences of *term* in *doc* — the
  postings list with term frequencies.  A change-feed row explodes to
  (term, doc, ±1) token rows; their per-(term, doc) net sums ARE the
  store's ± deltas (an edited doc's preimage tokens subtract, its
  postimage tokens add; unchanged term counts cancel and touch
  nothing).  df(term) = #rows with cnt > 0 in the term's bucket — read,
  not maintained.
- ``dl``:  H(∅, doc) = token count of *doc* (the same token rows,
  grouped by doc only).

Buckets hash with the engine's PORTABLE md5 hash (``md5_long`` /
``md5_long_py``, the SecondaryIndex contract), so a query resolves its
term buckets DRIVER-SIDE — a BM25 query reads O(query terms' buckets) of
postings plus O(candidate docs' buckets) of lengths (candidates capped,
else the dl store scans — doc-count-sized, one int per doc), and two
scalars (corpus doc/token counts) come from the meta.  Scoring reuses
``text.bm25_topk``'s integer-ratio formula verbatim (same 2^53 validity
bound), so maintained scores hash bit-equal to a batch recompute over
the current state — which is exactly what the driver row
``pipeline_maintained_bm25`` proves after churn on the corpus.

Crash contract: store data dirs are written first, ``_meta.json``
(bucket pointers + corpus scalars + applied_seq) swaps atomically last,
superseded dirs GC after — identical to every other derived object.
Fits the single-table derived protocol (``exists()`` /
``refresh(spark, table)``), so it rides ``TableReplicator(derived=[…])``
and ``stream_derived_refresh``.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.dedup import md5_long, md5_long_py
from ..functions.text import tokenize
from ..table.managed import CHANGE_TYPE_COL, ManagedTable
from .distinct_matview import SupportStore

_ADD = ("insert", "update_postimage")
_SUB = ("delete", "update_preimage")
_DL_PROBE_CAP = 8192


class _TermStore(SupportStore):
    """Postings store: buckets hash the TERM with the portable md5 hash
    so a query's buckets resolve driver-side (no Spark job)."""

    def bucket_expr(self) -> F.Column:
        return F.pmod(md5_long(F.col("term")), F.lit(self.n_buckets))

    def bucket_of(self, term: str) -> int:
        return md5_long_py(term) % self.n_buckets


class _DocStore(SupportStore):
    """Doc-length store (group-less): buckets hash the VALUE (doc id,
    stringified — int↔string renderings agree between Spark and
    Python for the integral id types the index admits)."""

    def bucket_expr(self) -> F.Column:
        return F.pmod(
            md5_long(F.col("__v").cast("string")), F.lit(self.n_buckets)
        )

    def bucket_of(self, doc) -> int:
        return md5_long_py(str(doc)) % self.n_buckets


class MaintainedInvertedIndex:
    """A persisted, restartable inverted index (+ BM25 scorer) over a
    CDF-enabled :class:`ManagedTable`'s text column.

    Layout::

        <root>/_meta.json          applied_seq, n_docs, total_tokens,
                                   bucket_versions{tf|dl}, field_ids
        <root>/support/tf/r=R/__b=K   (term, __v=doc, __cnt=tf)
        <root>/support/dl/r=R/__b=K   (__v=doc, __cnt=dl)
    """

    def __init__(
        self,
        root,
        id_col: str,
        text_col: str,
        term_buckets: int = 64,
        doc_buckets: int = 32,
    ):
        self.root = Path(root)
        self.id_col = id_col
        self.text_col = text_col
        self.term_buckets = int(term_buckets)
        self.doc_buckets = int(doc_buckets)
        self._tf = _TermStore(self.root, ["term"], self.term_buckets)
        self._dl = _DocStore(self.root, [], self.doc_buckets)

    # -- meta ---------------------------------------------------------------
    def _meta_path(self) -> Path:
        return self.root / "_meta.json"

    def exists(self) -> bool:
        return self._meta_path().exists()

    def meta(self) -> dict:
        return json.loads(self._meta_path().read_text())

    def _swap_meta(self, meta: dict) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".json.tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path())

    def _translated(self, m: dict, src_m: dict) -> list:
        stored = m.get("field_ids") or {}
        inv = {v: k for k, v in (src_m.get("field_ids") or {}).items()}
        cols = []
        for n in (self.id_col, self.text_col):
            cur = inv.get(stored.get(n), n) if stored else n
            cols.append(F.col(cur).alias(n) if cur != n else F.col(n))
        return cols

    # -- tokenization (must stay bit-identical to text.bm25_topk) ------------
    def _token_rows(self, frame: DataFrame, sign: F.Column) -> DataFrame:
        """One row per token occurrence: (term, __v=doc, __sign)."""
        return frame.select(
            F.col(self.id_col).alias("__v"),
            sign.alias("__sign"),
            F.explode_outer(tokenize(F.col(self.text_col))).alias("term"),
        ).filter(F.col("term") != "")

    @staticmethod
    def _stats_exprs(text: F.Column) -> list[F.Column]:
        """(doc count, token count) contribution of one doc image —
        NULL/blank-safe twin of the exploded token rows."""
        toks = F.filter(tokenize(text), lambda t: t != "")
        n_tok = F.when(text.isNull(), F.lit(0)).otherwise(F.size(toks))
        return [F.lit(1), n_tok]

    # -- refresh --------------------------------------------------------------
    def refresh(self, spark: SparkSession, source: ManagedTable) -> int:
        """Seed on first call, then fold exactly ``(applied_seq,
        cdf_seq]``; returns the applied checkpoint."""
        src_m = source.manifest()
        if not src_m.get("cdf"):
            raise ValueError(
                "inverted-index maintenance needs the change feed (cdf=True)"
            )
        src_seq = src_m.get("cdf_seq", 0)
        src_ids = src_m.get("field_ids", {})

        if not self.exists():
            base = source._read_state(spark, src_m).select(
                self.id_col, self.text_col
            )
            toks = self._token_rows(base, F.lit(1))
            bucket_versions = {
                # seed_out groups (group_cols…, src→__v) and counts rows:
                # per (term, doc) = tf; per (doc,) = dl — same token rows
                "tf": self._tf.seed_out(spark, "tf", toks, "__v"),
                "dl": self._dl.seed_out(spark, "dl", toks, "__v"),
            }
            one, n_tok = self._stats_exprs(F.col(self.text_col))
            row = base.agg(
                F.count(one).alias("n"),
                F.coalesce(F.sum(n_tok), F.lit(0)).alias("s"),
            ).collect()[0]
            self._swap_meta(
                {
                    "applied_seq": src_seq,
                    "version": 1,
                    "n_docs": int(row["n"]),
                    "total_tokens": int(row["s"]),
                    "term_buckets": self.term_buckets,
                    "doc_buckets": self.doc_buckets,
                    "bucket_versions": bucket_versions,
                    "field_ids": {
                        n: src_ids[n]
                        for n in (self.id_col, self.text_col)
                        if n in src_ids
                    },
                }
            )
            return src_seq

        meta = self.meta()
        for knob, mine in [
            ("term_buckets", self.term_buckets),
            ("doc_buckets", self.doc_buckets),
        ]:
            if int(meta.get(knob, -1)) != mine:
                raise ValueError(
                    f"index at {self.root} was built with "
                    f"{knob}={meta.get(knob)}; constructed with {mine} — "
                    "the bucket hash layout would split; rebuild instead"
                )
        since = meta["applied_seq"]
        if src_seq <= since:
            return since

        slice_df = source.changes(spark, since=since, until=src_seq).select(
            F.col(CHANGE_TYPE_COL), *self._translated(meta, src_m)
        )
        sign = (
            F.when(F.col(CHANGE_TYPE_COL).isin(*_ADD), F.lit(1))
            .when(F.col(CHANGE_TYPE_COL).isin(*_SUB), F.lit(-1))
            .otherwise(F.lit(0))
        )
        signed = slice_df.select(self.id_col, self.text_col, sign.alias("__s"))
        toks = self._token_rows(
            signed.withColumnRenamed("__s", "__sign_src"),
            F.col("__sign_src"),
        )

        version = meta["version"] + 1
        bucket_versions = {
            o: dict(bv)
            for o, bv in (meta.get("bucket_versions") or {}).items()
        }
        # net (term, doc, Δtf): an edit's unchanged term counts cancel
        # here (preimage −, postimage +) and touch NO bucket
        pairs_tf = (
            toks.groupBy("term", "__v")
            .agg(F.sum("__sign").alias("__cnt"))
            .filter(F.col("__cnt") != 0)
        )
        sup_tf, _, _ = self._tf.fold_out(
            spark, "tf", pairs_tf, bucket_versions.setdefault("tf", {}),
            version,
        )
        pairs_dl = (
            toks.groupBy("__v")
            .agg(F.sum("__sign").alias("__cnt"))
            .filter(F.col("__cnt") != 0)
        )
        sup_dl, _, _ = self._dl.fold_out(
            spark, "dl", pairs_dl, bucket_versions.setdefault("dl", {}),
            version,
        )
        one, n_tok = self._stats_exprs(F.col(self.text_col))
        row = signed.agg(
            F.coalesce(F.sum(F.col("__s")), F.lit(0)).alias("dn"),
            F.coalesce(F.sum(F.col("__s") * n_tok), F.lit(0)).alias("ds"),
        ).collect()[0]

        meta.update(
            {
                "applied_seq": src_seq,
                "version": version,
                "n_docs": int(meta["n_docs"]) + int(row["dn"]),
                "total_tokens": int(meta["total_tokens"]) + int(row["ds"]),
                "bucket_versions": bucket_versions,
            }
        )
        self._swap_meta(meta)
        for p in [*sup_tf, *sup_dl]:
            shutil.rmtree(p, ignore_errors=True)
        self._tf.gc_out("tf", bucket_versions.get("tf") or {}, version)
        self._dl.gc_out("dl", bucket_versions.get("dl") or {}, version)
        return src_seq

    # -- query ----------------------------------------------------------------
    def bm25_topk(
        self, spark: SparkSession, query_terms: list[str], k: int = 10
    ) -> DataFrame:
        """Top-*k* docs for *query_terms* under the SAME integer-ratio
        BM25 as :func:`..functions.text.bm25_topk` (k1=6/5, b=3/4,
        log-free Robertson idf, per-term contributions quantized to
        BIGINT before the per-doc sum; same 2^53 validity bound) — but
        reading O(query terms' buckets) of maintained postings instead
        of exploding the corpus, with N and S as meta literals."""
        meta = self.meta()
        bv = meta.get("bucket_versions") or {}
        terms = sorted({t for t in query_terms})
        empty = spark.createDataFrame(
            [], f"{self.id_col} long, score_q long, n_terms long"
        )
        if not terms:
            return empty
        tbuckets = sorted({self._tf.bucket_of(t) for t in terms})
        tf_rows = self._tf.read_buckets(spark, "tf", bv.get("tf", {}), tbuckets)
        if tf_rows is None:
            return empty
        tf = tf_rows.filter(F.col("term").isin(terms)).select(
            "term",
            F.col("__v").alias(self.id_col),
            F.col("__cnt").alias("__tf"),
        )
        dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
        # candidate doc ids → dl bucket pruning (capped: a stop-word
        # query degrades to the doc-count-sized dl scan, never breaks)
        cand = (
            tf.select(self.id_col)
            .distinct()
            .limit(_DL_PROBE_CAP + 1)
            .collect()
        )
        if not cand:
            return empty
        if len(cand) <= _DL_PROBE_CAP:
            dbuckets = sorted(
                {self._dl.bucket_of(r[self.id_col]) for r in cand}
            )
        else:
            dbuckets = sorted(int(b) for b in bv.get("dl", {}))
        dl_rows = self._dl.read_buckets(spark, "dl", bv.get("dl", {}), dbuckets)
        dl = dl_rows.select(
            F.col("__v").alias(self.id_col), F.col("__cnt").alias("__dl")
        )
        joined = tf.join(F.broadcast(dfreq), "term").join(dl, self.id_col)
        s_lit = F.lit(float(meta["total_tokens"]))
        n_lit = F.lit(float(meta["n_docs"]))
        tf_part = (F.lit(44.0) * s_lit * F.col("__tf")) / (
            F.lit(20.0) * s_lit * F.col("__tf")
            + F.lit(6.0) * s_lit
            + F.lit(18.0) * F.col("__dl") * n_lit
        )
        idf_part = (
            F.lit(2.0) * n_lit - F.lit(2.0) * F.col("__df") + F.lit(1.0)
        ) / (F.lit(2.0) * F.col("__df") + F.lit(1.0))
        contrib = F.round(F.lit(1000000.0) * tf_part * idf_part).cast("long")
        scored = joined.groupBy(self.id_col).agg(
            F.sum(contrib).alias("score_q"),
            F.count(F.lit(1)).cast("long").alias("n_terms"),
        )
        return scored.orderBy(
            F.col("score_q").desc(), F.col(self.id_col).asc()
        ).limit(k)

    def term_df(self, spark: SparkSession, terms: list[str]) -> DataFrame:
        """Document frequency per term — a probed-buckets read (the
        curation question 'how common is this phrase' answered from
        maintained state)."""
        meta = self.meta()
        bv = (meta.get("bucket_versions") or {}).get("tf", {})
        ts = sorted(set(terms))
        buckets = sorted({self._tf.bucket_of(t) for t in ts})
        rows = self._tf.read_buckets(spark, "tf", bv, buckets)
        if rows is None:
            return spark.createDataFrame([], "term string, df long")
        return (
            rows.filter(F.col("term").isin(ts))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("df"))
        )
