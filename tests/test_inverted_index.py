"""MaintainedInvertedIndex: incremental postings + maintained BM25
(operators/inverted_index.py).

Invariant under test: after ANY churn on the document table, the
maintained ``bm25_topk`` equals :func:`text.bm25_topk` recomputed over
the table's CURRENT state — score-for-score (both use the same
integer-ratio formula, so equality is exact, not approximate).  The
fold must absorb the cases a naive index gets wrong: an EDIT whose
preimage tokens must subtract (else ghost postings), a delete removing
a term's last posting (df must shrink), unchanged-term cancellation
(no bucket touched), and corpus scalars (N, S) drifting with churn.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tidb2dw_spark.functions.text import bm25_topk
from tidb2dw_spark.operators.inverted_index import MaintainedInvertedIndex
from tidb2dw_spark.table.managed import ManagedTable

SCHEMA = "doc_id long, body string"
ENV = (
    "flag string, tablename string, schemaname string, commit_ts long, "
    "doc_id long, body string"
)

BASE = [
    (1, "spark join scan spark"),
    (2, "window join the fast table"),
    (3, "spark spark spark window"),
    (4, "slow scan scan scan join"),
    (5, "the a of and"),
    (6, ""),          # blank: zero tokens, counts toward N only
    (7, None),        # NULL text: zero tokens, counts toward N only
]
TERMS = ["spark", "join", "scan"]


def _mk(spark, tmp_path, rows=BASE):
    t = ManagedTable(tmp_path / "docs").create(
        spark.createDataFrame(rows, SCHEMA),
        pk_cols=["doc_id"], pk_buckets=4, cdf=True,
    )
    idx = MaintainedInvertedIndex(
        tmp_path / "inv", "doc_id", "body", term_buckets=8, doc_buckets=4
    )
    return t, idx


def _batch(spark, events):
    return spark.createDataFrame(
        [(f, "t", "s", ts, d, b) for f, d, ts, b in events], ENV
    )


def _scores(df):
    return [
        (r["doc_id"], r["score_q"], r["n_terms"]) for r in df.collect()
    ]


def _recompute(spark, table, terms=TERMS, k=10):
    return _scores(bm25_topk(table.read(spark), "doc_id", "body", terms, k))


def test_seed_matches_batch_scorer(spark, tmp_path):
    t, idx = _mk(spark, tmp_path)
    idx.refresh(spark, t)
    got = _scores(idx.bm25_topk(spark, TERMS, k=10))
    assert got == _recompute(spark, t)
    m = idx.meta()
    assert m["n_docs"] == 7
    assert m["total_tokens"] == 22


def test_edit_subtracts_preimage_and_delete_shrinks_df(spark, tmp_path):
    t, idx = _mk(spark, tmp_path)
    idx.refresh(spark, t)

    # EDIT doc 1: 'spark join scan spark' -> 'join window window' — the
    # preimage's spark/scan postings must vanish (ghost postings are the
    # classic incremental-index bug), tf(join) stays 1 (cancellation)
    t.merge(spark, _batch(spark, [("U", 1, 5, "join window window")]))
    idx.refresh(spark, t)
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)
    assert {
        r["term"]: r["df"]
        for r in idx.term_df(spark, ["spark", "scan"]).collect()
    } == {"spark": 1, "scan": 1}  # doc 3 / doc 4 only now

    # DELETE doc 3 — spark's LAST posting goes; the term must disappear
    t.merge(spark, _batch(spark, [("D", 3, 6, None)]))
    idx.refresh(spark, t)
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)
    assert idx.term_df(spark, ["spark"]).count() == 0

    # INSERT revives it; blank->text and text->blank transitions too
    t.merge(spark, _batch(spark, [
        ("I", 8, 7, "spark scan fresh"),
        ("U", 6, 7, "spark spark"),
        ("U", 2, 7, ""),
    ]))
    idx.refresh(spark, t)
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)
    m = idx.meta()
    cur = t.read(spark)
    n = cur.count()
    s = cur.select(
        F.coalesce(
            F.sum(
                F.when(F.col("body").isNull(), F.lit(0)).otherwise(
                    F.size(F.filter(
                        F.split(F.trim(F.lower("body")), r"\s+"),
                        lambda x: x != "",
                    ))
                )
            ),
            F.lit(0),
        )
    ).collect()[0][0]
    assert (m["n_docs"], m["total_tokens"]) == (n, s)


def test_cadence_invariance_and_restart(spark, tmp_path):
    batches = [
        [("U", 4, 5, "scan join join"), ("D", 5, 5, None)],
        [("I", 9, 6, "the spark table"), ("U", 3, 6, "window only now")],
        [("D", 9, 7, None), ("U", 2, 7, "join scan spark window")],
    ]
    for mode, root in [("per", "a"), ("span", "b")]:
        base = tmp_path / root
        base.mkdir()
        t, idx = _mk(spark, base)
        idx.refresh(spark, t)
        for evs in batches:
            t.merge(spark, _batch(spark, evs))
            if mode == "per":
                idx.refresh(spark, t)
        idx.refresh(spark, t)
        # restart from disk: a FRESH object answers identically
        reopened = MaintainedInvertedIndex(
            base / "inv", "doc_id", "body", term_buckets=8, doc_buckets=4
        )
        assert reopened.exists()
        assert _scores(reopened.bm25_topk(spark, TERMS, 10)) == _recompute(
            spark, t
        ), mode


def test_unchanged_terms_touch_no_bucket(spark, tmp_path):
    """Structural O(touched buckets) pin: an edit that only changes ONE
    term's count advances only that term's tf bucket pointer (plus the
    doc's dl bucket) — every other pointer survives verbatim."""
    t, idx = _mk(spark, tmp_path)
    idx.refresh(spark, t)
    before = idx.meta()["bucket_versions"]

    # doc 4: 'slow scan scan scan join' -> 'slow scan scan join' (only
    # scan's tf changes; slow/join counts cancel pre vs post)
    t.merge(spark, _batch(spark, [("U", 4, 5, "slow scan scan join")]))
    idx.refresh(spark, t)
    after = idx.meta()["bucket_versions"]

    scan_b = str(idx._tf.bucket_of("scan"))
    changed_tf = {
        b for b in set(before["tf"]) | set(after["tf"])
        if before["tf"].get(b) != after["tf"].get(b)
    }
    assert changed_tf == {scan_b}
    dl_b = str(idx._dl.bucket_of(4))
    changed_dl = {
        b for b in set(before["dl"]) | set(after["dl"])
        if before["dl"].get(b) != after["dl"].get(b)
    }
    assert changed_dl == {dl_b}
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)


def test_knob_mismatch_refused_and_rename_survival(spark, tmp_path):
    t, idx = _mk(spark, tmp_path)
    idx.refresh(spark, t)
    t.merge(spark, _batch(spark, [("U", 1, 5, "spark renamed")]))
    other = MaintainedInvertedIndex(
        tmp_path / "inv", "doc_id", "body", term_buckets=16, doc_buckets=4
    )
    with pytest.raises(ValueError, match="term_buckets"):
        other.refresh(spark, t)

    # base RENAME of the text column: field-id translation keeps folding
    from tidb2dw_spark.schema.diff import diff_columns
    from tidb2dw_spark.schema.evolve import apply_column_diffs
    from tidb2dw_spark.schema.table_def import TableCol

    prev = [
        TableCol(
            id="1", name="doc_id", tp="bigint", is_pk="true",
            nullable="false",
        ),
        TableCol(id="2", name="body", tp="varchar", precision="200"),
    ]
    curr = [
        prev[0],
        TableCol(id="2", name="content", tp="varchar", precision="200"),
    ]
    apply_column_diffs(spark, t, diff_columns(prev, curr))
    t.merge(
        spark,
        spark.createDataFrame(
            [("U", "t", "s", 6, 2, "spark spark join")],
            ENV.replace("body string", "content string"),
        ),
    )
    idx.refresh(spark, t)
    got = _scores(idx.bm25_topk(spark, TERMS, 10))
    want = _scores(
        bm25_topk(
            t.read(spark).withColumnRenamed("content", "body"),
            "doc_id", "body", TERMS, 10,
        )
    )
    assert got == want


def test_rides_stream_derived_refresh(spark, tmp_path):
    """The index fits the single-table derived protocol: a commit-log
    drain seeds it on first wake and folds churn on the next, same
    checkpoint."""
    from tidb2dw_spark.streaming.stream import stream_derived_refresh

    t, idx = _mk(spark, tmp_path)
    q = stream_derived_refresh(
        spark, t, idx, str(tmp_path / "ckpt"), available_now=True
    )
    assert q.awaitTermination(180)
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)

    t.merge(spark, _batch(spark, [
        ("U", 1, 5, "join window window"),
        ("D", 4, 5, None),
        ("I", 8, 5, "spark scan fresh"),
    ]))
    q2 = stream_derived_refresh(
        spark, t, idx, str(tmp_path / "ckpt"), available_now=True
    )
    assert q2.awaitTermination(180)
    assert _scores(idx.bm25_topk(spark, TERMS, 10)) == _recompute(spark, t)
