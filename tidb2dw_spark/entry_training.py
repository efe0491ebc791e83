"""Training-data-pipeline queries for the driver contract.

Registers the dedup / similarity / text-analysis / multimodal operators
with their DuckDB oracles (built in functions.oracle_sql from the same
constants the Spark side uses).  Imported by entry_queries for the union
registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import oracle_sql as O
from .functions.compute import spread_for_compute
from .functions.sampling import (
    cap_per_key,
    pack_sequences,
    stratified_sample,
    train_test_split,
)
from .functions.dedup import (
    connected_components,
    connected_components_star,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_dup_pairs,
)
from .functions.multimodal import (
    attach_media,
    decode_image_features,
    extract_audio_features,
    extract_image_features,
    resize_decoded_images,
    resize_images,
    sample_video_frames,
    wav_energy,
)
from .functions.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_index_topk,
    ivf_topk,
    lsh_blocked_near_dup_pairs,
    lsh_bucketed_topk,
)
from .functions.text import (
    doc_fingerprint,
    lang_id,
    quality_features,
    regex_token_count,
    tfidf_top_terms,
    token_count,
)

# tuned so each op yields non-trivial output on the word-soup testdata
MINHASH_NUM, MINHASH_BANDS, SHINGLE_N, JACCARD_T = 16, 8, 3, 0.2
SIMHASH_MAX_HAMMING = 2  # ≤3 keeps the 4-byte-block candidate pigeonhole exact
NGRAM_BLOCK, NGRAM_N, NGRAM_T = "lang", 3, 0.08
TOPK_QUERY_MOD, TOPK_K = 50, 5
NEAR_DUP_T = 0.35  # testdata embeddings are near-orthogonal (max qcos ≈ 0.51)
NEAR_DUP_PLANES = 2  # LSH blocking: 4 buckets (small corpus keeps recall useful)
NEAR_DUP_TABLES = 2  # independent plane sets: miss prob p² instead of p
NEAR_DUP_TABLES_HI = 3  # the high-recall variant (sim_embedding_near_dup): p³

QUERIES = {}
ORACLES = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _docs(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """*spread*: the tiny testdata file arrives as 1 split; the md5-heavy
    dedup ops are compute-bound, so those spread across cores (factor 2:
    skewed doc lengths load-balance over 2 task waves; no-op at scale).
    Cheap per-row text ops skip it — the repartition exchange would cost
    more than it buys."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return spread_for_compute(df, min_factor=2) if spread else df


def _emb(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    """*spread=False* for Arrow-kernel ops: the vectorized matmul is cheap
    per row, so on the tiny single-split testdata the 32-way round-robin
    exchange plus 32 Python-worker dispatches per job cost far more than
    they save.  Interpreted expression kernels (near-dup fold, LSH) stay
    spread.  At cluster scale the input arrives multi-split and
    ``spread_for_compute`` is a no-op either way."""
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return spread_for_compute(df) if spread else df


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
@register("text_features", O.TEXT_FEATURES_ORACLE)
def text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    t = F.col("text")
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        token_count(t).alias("n_tokens"),
        regex_token_count(t).alias("n_bpe_tokens"),
        doc_fingerprint(t).alias("fingerprint"),
        lang_id(t).alias("lang_pred"),
    )


@register("text_quality_score", O.QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    feats = quality_features(F.col("text"))
    return df.select(
        "doc_id",
        feats["n_chars"].alias("n_chars"),
        feats["n_tokens"].alias("n_tokens"),
        feats["avg_token_len"].alias("avg_token_len"),
        feats["punct_ratio"].alias("punct_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
        feats["quality_score"].alias("quality_score"),
    )


# ---------------------------------------------------------------------------
# Dedup family
# ---------------------------------------------------------------------------
@register("dedup_exact", O.EXACT_DEDUP_ORACLE)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir)
    return exact_dedup(df, "doc_id", doc_fingerprint(F.col("text")))


@register(
    "dedup_minhash_signature",
    O.minhash_signature_oracle(MINHASH_NUM, SHINGLE_N),
)
def dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    # posexplode_OUTER: plain posexplode makes InferFiltersFromGenerate
    # inject a size>0/notnull pre-filter that re-evaluates the whole
    # minhash fold twice more — measured 7× slower.  With null texts
    # filtered at the scan, outer ≡ inner for any input.
    df = _docs(spark, sf_dir, spread=True).filter(F.col("text").isNotNull())
    sig = minhash_signatures(df, "doc_id", "text", MINHASH_NUM, SHINGLE_N)
    return sig.select(
        F.col("id").alias("doc_id"),
        F.posexplode_outer("sig").alias("hash_idx", "minhash"),
    )


@register(
    "dedup_minhash_lsh_pairs",
    O.minhash_lsh_pairs_oracle(MINHASH_NUM, MINHASH_BANDS, SHINGLE_N, JACCARD_T),
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_pairs(
        _docs(spark, sf_dir, spread=True),
        "doc_id",
        "text",
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        jaccard_threshold=JACCARD_T,
    )


@register("dedup_simhash", O.SIMHASH_ORACLE)
def dedup_simhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _docs(spark, sf_dir, spread=True)
    return df.select("doc_id", simhash(F.col("text")).alias("simhash"))


@register("dedup_simhash_pairs", O.simhash_pairs_oracle(SIMHASH_MAX_HAMMING))
def dedup_simhash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dup_pairs(
        _docs(spark, sf_dir, spread=True), "doc_id", "text", max_hamming=SIMHASH_MAX_HAMMING
    )


@register(
    "dedup_ngram_jaccard_pairs",
    O.ngram_jaccard_pairs_oracle(NGRAM_BLOCK, NGRAM_N, NGRAM_T),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir, spread=True),
        "doc_id",
        "text",
        block_col=NGRAM_BLOCK,
        n=NGRAM_N,
        threshold=NGRAM_T,
    )


DECON_EVAL_MOD, DECON_N = 13, 4


@register(
    "dedup_decontaminate",
    O.contamination_oracle(DECON_EVAL_MOD, DECON_N),
)
def dedup_decontaminate_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: the doc_id % 13 slice plays the held-out
    benchmark; train docs sharing any word 4-gram with it are flagged."""
    from .functions.dedup import contamination_hits

    df = _docs(spark, sf_dir, spread=True)
    return contamination_hits(
        df, "doc_id", "text",
        eval_pred=F.col("doc_id") % DECON_EVAL_MOD == 0,
        n=DECON_N,
    )


@register("text_dup_ngram_stats", O.dup_ngram_stats_oracle(3))
def text_dup_ngram_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb repetition signal: per-doc count of word 3-grams
    shared with any other document."""
    from .functions.dedup import dup_ngram_stats

    return dup_ngram_stats(_docs(spark, sf_dir, spread=True), "doc_id", "text", n=3)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
@register("sim_topk_quantized_cosine", O.topk_qcos_oracle(TOPK_QUERY_MOD, TOPK_K))
def sim_topk_qcos(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir, spread=False)  # arrow kernel: see _emb
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return brute_force_topk(
        emb, queries, k=TOPK_K, metric="quantized_cosine", kernel="arrow"
    )


@register(
    "sim_embedding_near_dup",
    O.lsh_blocked_near_dup_oracle(NEAR_DUP_T, NEAR_DUP_PLANES, NEAR_DUP_TABLES_HI),
)
def sim_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-recall near-dup pairs: the SAME sub-quadratic LSH-blocked
    plan as sim_near_dup_lsh_blocked but with three independent hash
    tables (miss probability p³) — the knob a curator turns when recall
    matters more than bucket work.  The oracle recomputes the identical
    3-table blocking, so the approximation itself is value-checked.  The
    exact all-pairs kernels (expression BNLJ and the Arrow tile matmul,
    functions/similarity.py) are deliberately NOT driver-registered: both
    materialize the full pair space / collect the corpus matrix — the
    right tool only for small-sf cross-checks, which is exactly where
    they live now (tests/test_training_ops.py verifies blocked ⊆ exact
    with bit-identical qcos at sf0.001 scale)."""
    return lsh_blocked_near_dup_pairs(
        _emb(spark, sf_dir),
        threshold=NEAR_DUP_T,
        num_planes=NEAR_DUP_PLANES,
        num_tables=NEAR_DUP_TABLES_HI,
    )


@register(
    "sim_near_dup_lsh_blocked",
    O.lsh_blocked_near_dup_oracle(NEAR_DUP_T, NEAR_DUP_PLANES, NEAR_DUP_TABLES),
)
def sim_near_dup_lsh_blocked_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE registered near-dup path: sub-quadratic LSH-blocked pairs
    (two independent hash tables for recall amplification) with the exact
    quantized-cosine verify.  The oracle recomputes the IDENTICAL integer
    sign-bit blocking per table, so the approximation itself is
    value-checked.  Unlike the exact all-pairs kernels (pytest-only
    small-sf cross-checks) this plan never collects the corpus: the
    (table, bucket) column is the shuffle key, and at 100 TB it is what
    the stored corpus is partitioned by — each bucket's pair loop is
    partition-local."""
    return lsh_blocked_near_dup_pairs(
        _emb(spark, sf_dir),
        threshold=NEAR_DUP_T,
        num_planes=NEAR_DUP_PLANES,
        num_tables=NEAR_DUP_TABLES,
    )


@register(
    "sim_paraphrase_candidates",
    O.paraphrase_candidates_oracle(
        NEAR_DUP_T,
        pairs_oracle=O.lsh_blocked_near_dup_oracle(NEAR_DUP_T, NEAR_DUP_PLANES),
    ),
)
def sim_paraphrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal curation op: embedding near-dup pairs annotated with
    whether the texts actually differ — same-fingerprint pairs are exact
    dups (drop one), different-text pairs are paraphrase candidates (the
    interesting set for dedup policy and eval-contamination checks).  The
    pair frame is tiny relative to the corpus, so the two fingerprint
    joins are AQE-broadcast of the pair side at scale.  Pairs come from
    the scale-safe LSH-blocked path (no full-corpus collect; blocking
    recomputed by the oracle)."""
    pairs = lsh_blocked_near_dup_pairs(
        _emb(spark, sf_dir), threshold=NEAR_DUP_T, num_planes=NEAR_DUP_PLANES
    )
    fp = _docs(spark, sf_dir).select(
        "doc_id", doc_fingerprint(F.col("text")).alias("fp")
    )
    fa = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fp_a"))
    fb = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        pairs.join(fa, "id_a")
        .join(fb, "id_b")
        .select(
            "id_a",
            "id_b",
            "qcos",
            (F.col("fp_a") != F.col("fp_b")).alias("texts_differ"),
        )
    )


LSH_TOPK_PLANES = 8


@register("sim_topk_cosine")  # float scores: id-membership-checked via suite
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return brute_force_topk(emb, queries, k=TOPK_K, metric="cosine")


@register("sim_lsh_bucketed_topk")  # float scores: id-membership via suite
def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return lsh_bucketed_topk(emb, queries, k=TOPK_K, num_planes=LSH_TOPK_PLANES)


# Oracles used ONLY inside suite_similarity_checksums (the member queries
# return score/rank columns the float-path oracles deliberately omit, so
# these are not registered in ORACLES — a full-column parity compare of a
# float score is not cross-engine meaningful; the suite fingerprints only
# the spec'd id columns)
SIM_SUITE_ORACLES = {
    "sim_topk_cosine": O.topk_float_cos_oracle(TOPK_QUERY_MOD, TOPK_K),
    "sim_lsh_bucketed_topk": O.lsh_bucketed_topk_oracle(
        TOPK_QUERY_MOD, TOPK_K, LSH_TOPK_PLANES
    ),
}


IVF_CENTROIDS, IVF_PROBE = 16, 4


@register(
    "sim_ivf_topk",
    O.ivf_topk_oracle(TOPK_QUERY_MOD, TOPK_K, IVF_CENTROIDS, IVF_PROBE),
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: approximate but *deterministic* (quantized math + fixed
    centroid rule), so unlike LSH it gets an exact value-level oracle."""
    emb = _emb(spark, sf_dir, spread=False)  # arrow kernel: see _emb
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return ivf_topk(
        emb, queries, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE
    )


EDIT_T, EDIT_PREFIX = 12, 40


@register(
    "dedup_edit_distance_pairs",
    f"""
WITH p AS (
  SELECT lang AS blk, doc_id, substr(text, 1, {EDIT_PREFIX}) AS pref
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pref, b.pref) AS INT) AS distance
FROM p a JOIN p b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pref, b.pref) <= {EDIT_T}
""",
)
def dedup_edit_distance_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typo-level near-dup pairs by blocked prefix Levenshtein."""
    from .functions.dedup import edit_distance_pairs

    out = edit_distance_pairs(
        _docs(spark, sf_dir, spread=True),
        "doc_id",
        "text",
        block_col="lang",
        max_distance=EDIT_T,
        prefix_chars=EDIT_PREFIX,
    )
    return out.withColumn("distance", F.col("distance").cast("int"))


@register("dedup_incremental_two_batches", O.INCREMENTAL_DEDUP_ORACLE)
def dedup_incremental_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch dedup against persisted fingerprint state
    (operators/incremental.py): even-id docs ingest first, odd-id docs
    dedup against them via bucket-pruned state probes — the streaming
    shape where a batch never rescans the corpus it dedups against."""
    import tempfile

    from .operators.incremental import IncrementalDeduper

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    d = IncrementalDeduper(tempfile.mkdtemp(prefix="tidb2dw_dedup_"), pk_buckets=8)
    out1 = d.dedup_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 0), "doc_id",
        doc_fingerprint(F.col("text")), commit_ts=1,
    )
    out2 = d.dedup_batch(
        spark, docs.filter(F.col("doc_id") % 2 == 1), "doc_id",
        doc_fingerprint(F.col("text")), commit_ts=2,
    )
    return out1.select("doc_id").unionAll(out2.select("doc_id"))


@register(
    "dedup_incremental_minhash",
    O.incremental_minhash_oracle(MINHASH_NUM, MINHASH_BANDS, SHINGLE_N, 8),
)
def dedup_incremental_minhash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous NEAR-dup against a persisted signature store
    (functions/dedup.py:incremental_minhash_pairs): even-id docs ingest
    first (phase 1 surfaces even-even pairs), odd-id docs then band-join
    against store∪batch (phase 2 surfaces every pair with an odd member)
    — no batch ever rescans text it deduped against, and the store holds
    ~num_hashes ints per doc.  The signature-match verify is integer, so
    the oracle recomputes both phases exactly from the full corpus."""
    import tempfile

    from .functions.dedup import incremental_minhash_pairs

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="tidb2dw_sigstore_") + "/sigs"
    common = dict(
        num_hashes=MINHASH_NUM, bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N, min_sig_matches=8,
    )
    p1 = incremental_minhash_pairs(
        docs.filter(F.col("doc_id") % 2 == 0), store, **common
    )
    p2 = incremental_minhash_pairs(
        docs.filter(F.col("doc_id") % 2 == 1), store, **common
    )
    return (
        p1.withColumn("phase", F.lit(1))
        .unionByName(p2.withColumn("phase", F.lit(2)))
        .select("phase", "id_a", "id_b", "n_sig_matches")
    )


_IVF_INDEX_DIRS: dict[str, str] = {}


@register(
    "sim_ivf_index_topk",
    O.ivf_topk_oracle(TOPK_QUERY_MOD, TOPK_K, IVF_CENTROIDS, IVF_PROBE),
)
def sim_ivf_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search path of the *persisted* IVF index: bit-identical results to
    sim_ivf_topk (same oracle), but the full-corpus assignment pass ran
    once at build time and the probe join dynamic-partition-prunes the
    cell-partitioned scan — the 100 TB shape, where per-query cost is
    O(probed cells) independent of corpus size."""
    emb = _emb(spark, sf_dir, spread=False)  # arrow kernel: see _emb
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    idx = _IVF_INDEX_DIRS.get(sf_dir)
    if idx is None:
        import tempfile

        idx = tempfile.mkdtemp(prefix="tidb2dw_ivf_")
        build_ivf_index(emb, idx, n_centroids=IVF_CENTROIDS)
        _IVF_INDEX_DIRS[sf_dir] = idx
    return ivf_index_topk(spark, idx, queries, k=TOPK_K, n_probe=IVF_PROBE)


IVF_JOIN_QUERY_MOD = 4  # 25% of the corpus as queries — a table, not a batch


@register(
    "sim_ivf_topk_join",
    # the join path pins (query_id, neighbor_id, rank) only — its score
    # is the same quantized integer math, but the column is projected
    # away Spark-side, so the shared oracle is wrapped to match
    "SELECT query_id, neighbor_id, rank FROM (\n"
    + O.ivf_topk_oracle(IVF_JOIN_QUERY_MOD, TOPK_K, IVF_CENTROIDS, IVF_PROBE)
    + "\n)",
)
def sim_ivf_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ANN JOIN: a query TABLE (every 4th corpus vector —
    too big to treat as a driver batch) against the persisted IVF index
    via a shuffle join on the cell key — neither side broadcast or
    collected, per-query top-k as a second exchange on query_id.  Same
    deterministic quantized math as sim_ivf_index_topk, so the exact
    value-level oracle applies; the fingerprint pins (query_id,
    neighbor_id, rank)."""
    from .functions.similarity import ivf_index_topk_join

    sim_ivf_index_topk(spark, sf_dir)  # ensure the shared index exists
    emb = _emb(spark, sf_dir, spread=False)
    queries = emb.filter(F.col("vec_id") % IVF_JOIN_QUERY_MOD == 0)
    return ivf_index_topk_join(
        spark, _IVF_INDEX_DIRS[sf_dir], queries, k=TOPK_K, n_probe=IVF_PROBE
    ).select("query_id", "neighbor_id", "rank")


_IVF_DERIVED_CACHE: dict[str, object] = {}


def _derived_churn_fixture(
    spark: SparkSession, sf_dir: str, cache: dict, wh_prefix: str, make_index
):
    """Shared build→churn→refresh fixture for the derived-ANN rows: a
    CDF table over the embeddings corpus, an index built PRE-churn via
    *make_index(wh_dir)*, then ONE CDC commit applying the churn recipe
    both oracles mirror — delete vec_id%10==7, negate vec_id%10==4's
    embedding, insert (vec_id+100000, reversed embedding) for
    vec_id%25==3 — followed by refresh().  The recipe lives HERE only:
    an edit desynchronizing it from the oracles breaks both rows'
    fingerprints instead of silently forking."""
    import tempfile
    from pathlib import Path

    from .table.managed import ManagedTable

    if sf_dir not in cache:
        emb = _emb(spark, sf_dir, spread=False)
        wh = Path(tempfile.mkdtemp(prefix=wh_prefix))
        t = ManagedTable(wh / "emb").create(
            emb, ["vec_id"], pk_buckets=8, cdf=True
        )
        ix = make_index(wh)
        ix.build(spark, t)

        def env(df: DataFrame, flag: str) -> DataFrame:
            # the envelope carries EVERY table column (embeddings also
            # has a label column the index ignores)
            return df.select(
                F.lit(flag).alias("flag"),
                F.lit("emb").alias("tablename"),
                F.lit("s").alias("schemaname"),
                F.lit(1).cast("long").alias("commit_ts"),
                "vec_id",
                "embedding",
                "label",
            )

        dels = emb.filter(F.col("vec_id") % 10 == 7)
        upds = emb.filter(F.col("vec_id") % 10 == 4).withColumn(
            "embedding", F.transform("embedding", lambda x: -x)
        )
        ins = emb.filter(F.col("vec_id") % 25 == 3).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.reverse("embedding").alias("embedding"),
            "label",
        )
        t.merge(
            spark,
            env(dels, "D").unionByName(env(upds, "U")).unionByName(env(ins, "I")),
        )
        ix.refresh(spark, t)
        cache[sf_dir] = (t, ix)
    return cache[sf_dir]


@register(
    "sim_ivf_derived_refresh",
    O.ivf_derived_refresh_oracle(TOPK_QUERY_MOD, TOPK_K, IVF_CENTROIDS, IVF_PROBE),
)
def sim_ivf_derived_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF index as DERIVED STATE on a replicated table
    (operators/ann_index.py): built pre-churn, then a single CDC commit
    deletes, negates, and inserts vectors; ``refresh()`` folds the change
    feed — removals located by re-assigning PREIMAGE vectors to the
    frozen centroids, additions from the per-id final image — rewriting
    only the touched cells.  The oracle recomputes the search over the
    post-churn corpus with the pre-churn centroids in SQL, so a stale
    entry (missed delete), a resurrected intermediate, or a wrong-cell
    removal breaks the fingerprint.  The churn ops (negate, reverse) are
    bit-exact float transforms in both engines."""
    from .operators.ann_index import IvfVectorIndex

    t, ix = _derived_churn_fixture(
        spark, sf_dir, _IVF_DERIVED_CACHE, "tidb2dw_ivfderived_",
        lambda wh: IvfVectorIndex(
            wh / "ivf", id_col="vec_id", vec_col="embedding",
            n_centroids=IVF_CENTROIDS,
        ),
    )
    queries = t.read(spark).filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return ix.topk(spark, queries, k=TOPK_K, n_probe=IVF_PROBE)


# ---------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas — rows-only, exactness in pytest)
# ---------------------------------------------------------------------------
@register("mm_image_features", O.IMAGE_FEATURES_ORACLE)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact oracle via the ASCII-bytes technique (blobs are UTF-8 text):
    n_bytes/mean_byte recomputed from the characters in SQL; the float
    feature vector stays pytest-verified (array-of-float formatting is
    not portable across engines)."""
    media = attach_media(_docs(spark, sf_dir, spread=True))
    return extract_image_features(media).drop("feature")


@register("mm_resize_then_features", O.resized_features_oracle(16 * 4))
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composability check: resize output feeds feature extraction —
    exact oracle over the truncate/zero-pad resize contract."""
    media = attach_media(_docs(spark, sf_dir, spread=True))
    resized = resize_images(media, target_w=16, target_h=4)
    return extract_image_features(resized).drop("feature")


@register(
    "sim_ivf_recall_eval",
    f"""
WITH ivf AS (
  SELECT * FROM ({{IVF}}) t
), ex AS (
  SELECT * FROM ({{EXACT}}) t
)
SELECT e.query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       {{K}} AS k
FROM ex e LEFT JOIN ivf i
  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""".replace("{IVF}", O.ivf_topk_oracle(TOPK_QUERY_MOD, TOPK_K, IVF_CENTROIDS, IVF_PROBE))
   .replace("{EXACT}", O.topk_qcos_oracle(TOPK_QUERY_MOD, TOPK_K))
   .replace("{K}", str(TOPK_K)),
)
def sim_ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN evaluation harness IN the engine: per-query recall@k of the
    IVF search against exact brute force — the measurement a pipeline
    runs before trusting an index for production retrieval.  Both sides
    are deterministic quantized math, so even the recall numbers have an
    exact cross-engine oracle (composed from the two search oracles)."""
    emb = _emb(spark, sf_dir, spread=False)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    ivf = ivf_topk(
        emb, queries, k=TOPK_K, n_centroids=IVF_CENTROIDS, n_probe=IVF_PROBE
    ).select("query_id", "neighbor_id")
    ex = brute_force_topk(
        emb, queries, k=TOPK_K, metric="quantized_cosine", kernel="arrow"
    ).select("query_id", "neighbor_id")
    return (
        ex.alias("e")
        .join(
            ivf.alias("i"),
            (F.col("e.query_id") == F.col("i.query_id"))
            & (F.col("e.neighbor_id") == F.col("i.neighbor_id")),
            "left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(F.count(F.col("i.neighbor_id")).alias("n_hits"))
        .withColumn("k", F.lit(TOPK_K))
    )


KMEANS_K, KMEANS_ITERS = 8, 3
# SemDeDup threshold sits below the corpus' near-orthogonal qcos ceiling
# (~0.51) so clusters actually shed members at test scale
SEMDEDUP_K, SEMDEDUP_ITERS, SEMDEDUP_T = 8, 2, 0.3


@register("emb_kmeans_centroids", O.kmeans_oracle(8, 3))
def emb_kmeans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative Lloyd k-means with an EXACT oracle: the iteration count
    is a compile-time constant, so the driver-side loop unrolls into
    chained SQL stages (oracle_sql.kmeans_oracle); integer-only math makes
    every stage bit-identical.  Also pinned in pytest against a
    pure-Python twin.  Returns the final centroid matrix as
    (cluster, pos, value) rows plus each cluster's member count."""
    from .functions.clustering import kmeans_assign, kmeans_fit

    emb = _emb(spark, sf_dir, spread=False)
    cents = kmeans_fit(emb, k=KMEANS_K, iters=KMEANS_ITERS)
    sizes = {
        r["cluster"]: r["n"]
        for r in kmeans_assign(emb, cents).groupBy("cluster").agg(
            F.count("*").alias("n")
        ).collect()
    }
    rows = [
        (c, p, v, int(sizes.get(c, 0)))
        for c, vec in enumerate(cents)
        for p, v in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows, "cluster int, pos int, centroid_q long, cluster_n int"
    )


@register(
    "sem_dedup_keep",
    O.semantic_dedup_oracle(SEMDEDUP_K, SEMDEDUP_ITERS, SEMDEDUP_T),
)
def sem_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) as a first-class
    operator: k-means blocks the embedding space, within-cluster pairs
    above the cosine threshold are semantic duplicates, and each
    neighborhood keeps its lowest-centroid-similarity member.  ONE
    shuffle on the cluster key; the pairwise verify is a cluster-local
    chunked Arrow matmul, and the whole decomposition (clusters, csim,
    verdicts) is bit-checked against the unrolled SQL oracle."""
    from .functions.clustering import semantic_dedup

    emb = _emb(spark, sf_dir, spread=False)
    return semantic_dedup(
        emb, k=SEMDEDUP_K, iters=SEMDEDUP_ITERS, threshold=SEMDEDUP_T
    ).select(F.col("id").alias("vec_id"), "cluster", "csim", "kept")


_SEMDEDUP_STORE_CACHE: dict[str, object] = {}


@register(
    "dedup_incremental_semdedup",
    O.incremental_semdedup_oracle(SEMDEDUP_K, SEMDEDUP_ITERS, SEMDEDUP_T),
)
def dedup_incremental_semdedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-batch SemDeDup against a persisted survivor store
    (clustering.IncrementalSemDedup) — the embedding-space twin of the
    banded signature store: the SEED batch (vec_id % 2 == 0) fits the
    frozen centroids and keeps its one-shot survivors; the SECOND batch
    is deduplicated against those survivors AND itself without
    rescanning batch one (store read = partition-pruned to the batch's
    clusters; verify = the same cluster-local chunked Arrow matmul; one
    shuffle).  The oracle re-derives both phases exactly, including the
    store-then-batch precedence."""
    import tempfile as _tf
    from pathlib import Path as _P

    from .functions.clustering import IncrementalSemDedup

    if sf_dir not in _SEMDEDUP_STORE_CACHE:
        emb = _emb(spark, sf_dir, spread=False)
        store = IncrementalSemDedup(
            _P(_tf.mkdtemp(prefix="tidb2dw_semstore_")) / "store",
            k=SEMDEDUP_K, iters=SEMDEDUP_ITERS, threshold=SEMDEDUP_T,
        )
        d0 = store.seed(spark, emb.filter(F.col("vec_id") % 2 == 0))
        d1 = store.dedup_batch(spark, emb.filter(F.col("vec_id") % 2 == 1))
        _SEMDEDUP_STORE_CACHE[sf_dir] = (
            d0.withColumn("phase", F.lit(0).cast("int")),
            d1.withColumn("phase", F.lit(1).cast("int")),
        )
    d0, d1 = _SEMDEDUP_STORE_CACHE[sf_dir]
    return d0.unionByName(d1).select(
        F.col("id").alias("vec_id"), "cluster", "csim", "phase", "kept"
    )


PQ_SUB, PQ_K, PQ_ITERS, PQ_DIM = 8, 64, 2, 64

# codebook training is deterministic (integer Lloyd, fixed init), so the
# two PQ entries and repeat bench runs share one fit per scale factor —
# training is the one-time index build; encode+ADC is the per-query work
_PQ_CENTS_CACHE: dict[str, list] = {}


def _pq_cents(spark: SparkSession, sf_dir: str) -> list:
    if sf_dir not in _PQ_CENTS_CACHE:
        from .functions.pq import pq_fit

        _PQ_CENTS_CACHE[sf_dir] = pq_fit(
            _emb(spark, sf_dir, spread=False), n_sub=PQ_SUB, k=PQ_K, iters=PQ_ITERS
        )
    return _PQ_CENTS_CACHE[sf_dir]


@register(
    "emb_pq_codebooks", O.pq_codebooks_oracle(PQ_SUB, PQ_K, PQ_ITERS, PQ_DIM)
)
def emb_pq_codebooks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization training (functions/pq.py): 8 per-subspace
    codebooks of 64 codes over the 64-dim corpus, integer-exact Lloyd, one
    distributed pass per iteration covering all subspaces.  The oracle
    unrolls the identical computation (training is deterministic +
    integer, so even codebooks are bit-checkable)."""
    from .functions.pq import pq_encode

    emb = _emb(spark, sf_dir, spread=False)
    cents = _pq_cents(spark, sf_dir)
    sizes = {
        (r["sub"], r["code"]): r["n"]
        for r in pq_encode(emb, cents)
        .select(F.posexplode("codes").alias("sub", "code"))
        .groupBy("sub", "code")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = [
        (m, c, p, v, int(sizes.get((m, c), 0)))
        for m, cb in enumerate(cents)
        for c, vec in enumerate(cb)
        for p, v in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows, "sub int, code int, pos int, centroid_q long, code_n int"
    )


@register(
    "sim_pq_topk",
    O.pq_topk_oracle(PQ_SUB, PQ_K, PQ_ITERS, PQ_DIM, TOPK_QUERY_MOD, TOPK_K),
)
def sim_pq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k: the corpus is scanned as M=8 small codes per row
    (~32× fewer bytes than the float vectors — the representation that
    keeps a 100 TB ANN scan affordable) and scored against a
    per-query M×k lookup table of exact subspace distances in a joinless
    Arrow kernel with per-partition partial top-k.  Integer distances
    end-to-end, so the oracle reproduces training + encode + ADC + rank
    bit-for-bit."""
    from .functions.pq import pq_topk

    emb = _emb(spark, sf_dir, spread=False)
    cents = _pq_cents(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return pq_topk(emb, queries, cents, k=TOPK_K)


BPE_MERGES = 8

# training is deterministic, so both BPE entries (and repeat bench runs)
# share one trained (merges, segmentation) per scale factor — the train
# is the one-time vocabulary build; tokenization is the per-corpus work
_BPE_CACHE: dict[str, tuple] = {}


def _bpe_trained(spark: SparkSession, sf_dir: str) -> tuple:
    if sf_dir not in _BPE_CACHE:
        from .functions.bpe import bpe_train

        _BPE_CACHE[sf_dir] = bpe_train(_docs(spark, sf_dir), n_merges=BPE_MERGES)
    return _BPE_CACHE[sf_dir]


@register("text_bpe_merges", O.bpe_merges_oracle(BPE_MERGES))
def text_bpe_merges_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (functions/bpe.py): one corpus
    pass builds the weighted vocabulary, then each merge step is window
    logic over the (small) segmentation table — greedy left-to-right
    application is positional, so the fixed-step loop unrolls into an
    EXACT chained-CTE oracle, like k-means and PQ.  Returns the trained
    merge table."""
    from .functions.bpe import bpe_merges_df

    merges, _seg = _bpe_trained(spark, sf_dir)
    return bpe_merges_df(spark, merges)


@register("text_bpe_tokenize", O.bpe_tokenize_oracle(BPE_MERGES))
def text_bpe_tokenize_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the trained subword vocabulary: the
    per-word symbol count (vocabulary-sized) broadcasts against one
    corpus pass — per-doc word + subword-token counts, oracle-checked
    end-to-end through the same unrolled training chain."""
    from .functions.bpe import bpe_token_counts

    _merges, seg = _bpe_trained(spark, sf_dir)
    return bpe_token_counts(_docs(spark, sf_dir), seg)


# 64 codes / 4-of-8 probes ≈ 0.4 recall@5 at sf0.01 on this worst-case
# uniform corpus (clustered production data fares far better — see the
# residual-vs-raw pytest); the recall_eval row is exactly the dial that
# chose these numbers
IVFPQ_CELLS, IVFPQ_CODES, IVFPQ_PROBE = 8, 64, 4

# same memoization rationale as _pq_cents: the build (cells + residual
# codebooks + codes parquet) is the one-time index construction; search
# is the per-query-batch work the bench should measure
_IVFPQ_DIR_CACHE: dict[str, str] = {}


def _ivfpq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir not in _IVFPQ_DIR_CACHE:
        import tempfile as _tf

        from .functions.pq import build_ivfpq_index

        d = _tf.mkdtemp(prefix="tidb2dw_ivfpq_")
        build_ivfpq_index(
            _emb(spark, sf_dir, spread=False),
            d,
            n_centroids=IVFPQ_CELLS,
            n_sub=PQ_SUB,
            k=IVFPQ_CODES,
            iters=PQ_ITERS,
            residual=True,
        )
        _IVFPQ_DIR_CACHE[sf_dir] = d
    return _IVFPQ_DIR_CACHE[sf_dir]


@register(
    "sim_ivfpq_recall_eval",
    f"""
WITH pq AS (
  SELECT * FROM ({{IVFPQ}}) t
), ex AS (
  SELECT * FROM ({{EXACT}}) t
)
SELECT e.query_id,
       CAST(count(i.neighbor_id) AS BIGINT) AS n_hits,
       {{K}} AS k
FROM ex e LEFT JOIN pq i
  ON i.query_id = e.query_id AND i.neighbor_id = e.neighbor_id
GROUP BY e.query_id
""".replace(
        "{IVFPQ}",
        O.ivfpq_topk_oracle(
            IVFPQ_CELLS, PQ_SUB, IVFPQ_CODES, PQ_ITERS, PQ_DIM,
            TOPK_QUERY_MOD, TOPK_K, IVFPQ_PROBE,
        ),
    ).replace("{EXACT}", O.topk_sqeuclid_oracle(TOPK_QUERY_MOD, TOPK_K))
    .replace("{K}", str(TOPK_K)),
)
def sim_ivfpq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN evaluation for the compressed index: per-query recall@k of
    residual IVF-PQ against exact squared-euclidean brute force (the
    metric ADC approximates).  Deterministic integer math end-to-end, so
    the recall numbers compose the two search oracles exactly — the
    measurement that decides probe count and codebook budget before an
    index serves production retrieval."""
    from .functions.pq import ivfpq_index_topk

    emb = _emb(spark, sf_dir, spread=False)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    pq = ivfpq_index_topk(
        spark, _ivfpq_index_dir(spark, sf_dir), queries,
        k=TOPK_K, n_probe=IVFPQ_PROBE,
    ).select("query_id", "neighbor_id")
    ex = brute_force_topk(
        emb, queries, k=TOPK_K, metric="quantized_sqeuclid", kernel="arrow"
    ).select("query_id", "neighbor_id")
    return (
        ex.alias("e")
        .join(
            pq.alias("i"),
            on=[
                F.col("e.query_id") == F.col("i.query_id"),
                F.col("e.neighbor_id") == F.col("i.neighbor_id"),
            ],
            how="left",
        )
        .groupBy(F.col("e.query_id").alias("query_id"))
        .agg(F.count(F.col("i.neighbor_id")).alias("n_hits"))
        .withColumn("k", F.lit(TOPK_K))
    )


@register(
    "sim_ivfpq_topk",
    O.ivfpq_topk_oracle(
        IVFPQ_CELLS, PQ_SUB, IVFPQ_CODES, PQ_ITERS, PQ_DIM,
        TOPK_QUERY_MOD, TOPK_K, IVFPQ_PROBE,
    ),
)
def sim_ivfpq_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual IVF-PQ search over the persisted cell-partitioned CODES
    index: coarse cells prune the scan statically, residual codebooks
    (trained on x − centroid[cell]) quantize tightly, and ADC ranks
    integer distances — so the ENTIRE composition (cell assignment,
    residual Lloyd training, codes, per-(query, cell) LUTs, final rank)
    is reproduced bit-for-bit by one unrolled SQL oracle.  The build is
    the one-time index construction (memoized per scale factor); this
    query measures the steady-state search."""
    from .functions.pq import ivfpq_index_topk

    emb = _emb(spark, sf_dir, spread=False)
    queries = emb.filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return ivfpq_index_topk(
        spark,
        _ivfpq_index_dir(spark, sf_dir),
        queries,
        k=TOPK_K,
        n_probe=IVFPQ_PROBE,
    )


_IVFPQ_DERIVED_CACHE: dict[str, object] = {}


@register(
    "sim_ivfpq_derived_refresh",
    O.ivfpq_derived_refresh_oracle(
        IVFPQ_CELLS, PQ_SUB, IVFPQ_CODES, PQ_ITERS, PQ_DIM,
        TOPK_QUERY_MOD, TOPK_K, IVFPQ_PROBE,
    ),
)
def sim_ivfpq_derived_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPRESSED ANN index as derived state
    (operators/ann_index.IvfPqVectorIndex): residual codebooks train at
    build and freeze with the centroids; the same delete/negate/insert
    churn as the IVF derived row lands as one CDC commit; refresh
    re-encodes only the changed vectors and rewrites only touched cells.
    The oracle re-trains the frozen parameters on the pre-churn corpus
    in SQL and ADC-searches the post-churn corpus — a stale code, a
    missed delete, or an intermediate-state encode breaks the
    fingerprint."""
    from .operators.ann_index import IvfPqVectorIndex

    t, ix = _derived_churn_fixture(
        spark, sf_dir, _IVFPQ_DERIVED_CACHE, "tidb2dw_ivfpqderived_",
        lambda wh: IvfPqVectorIndex(
            wh / "ivfpq", id_col="vec_id", vec_col="embedding",
            n_centroids=IVFPQ_CELLS, n_sub=PQ_SUB, k_codes=IVFPQ_CODES,
            iters=PQ_ITERS, residual=True,
        ),
    )
    queries = t.read(spark).filter(F.col("vec_id") % TOPK_QUERY_MOD == 0)
    return ix.topk(spark, queries, k=TOPK_K, n_probe=IVFPQ_PROBE)


PHASH_MAX_HAMMING = 4


@register("mm_image_phash", O.IMAGE_PHASH_ORACLE)
def mm_image_phash_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual hash per image blob — mapInPandas kernel with an EXACT
    oracle (the corpus is ASCII, so the byte-stream blockhash is
    reproducible from the text in SQL)."""
    from .functions.multimodal import image_phash

    media = attach_media(_docs(spark, sf_dir, spread=True))
    return image_phash(media)


@register("mm_image_phash_pairs", O.phash_pairs_oracle(PHASH_MAX_HAMMING))
def mm_image_phash_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup dedup: banded phash pairs, exact ≤ hamming 7 by
    pigeonhole — the multimodal counterpart of simhash text dedup."""
    from .functions.multimodal import image_phash, phash_dup_pairs

    media = attach_media(_docs(spark, sf_dir, spread=True))
    return phash_dup_pairs(image_phash(media), max_hamming=PHASH_MAX_HAMMING)


@register(
    "mm_audio_energy",
    # the fake kernel windows the UTF-8 byte stream: n_windows = ceil(len/256)
    "SELECT doc_id, CAST(CEIL(COALESCE(octet_length(encode(text)), 0) / 256.0) AS INT)"
    " AS n_windows FROM documents",
)
def mm_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_media(_docs(spark, sf_dir, spread=True))
    return extract_audio_features(media).drop("energy")


@register(
    "mm_video_frame_sample",
    # 1→num_frames fan-out per non-null blob
    "SELECT d.doc_id, CAST(g.r AS INT) AS frame_idx FROM documents d "
    "CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) g "
    "WHERE d.text IS NOT NULL",
)
def mm_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N cardinality change through mapInPandas; frame bytes dropped from
    the driver-checked output (row shape is the contract)."""
    media = attach_media(_docs(spark, sf_dir, spread=True))
    return sample_video_frames(media, num_frames=4).drop("frame")


# real-codec rows: blobs are genuine binary P6 / RIFF-PCM files built
# JVM-side from the text bytes; the kernels PARSE them (codecs.py), and the
# oracles recompute the decoded statistics from the same bytes — so a
# header-math, padding, channel-order or chunk-walk bug breaks the hash.
MM_RESIZE_W, MM_RESIZE_H = 8, 2


@register("mm_ppm_decode_features", O.PPM_DECODE_ORACLE)
def mm_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode (netpbm parser, no stand-in kernel): per-channel
    integer pixel sums of the P6 fixture blobs."""
    # no spread: the decode kernel is cheap per row, and at real scale
    # parquet splits provide the parallelism — 64 micro-tasks of Python
    # worker overhead cost 3x at this sf (see _docs docstring)
    media = attach_media(_docs(spark, sf_dir), fmt="ppm")
    return decode_image_features(media)


@register(
    "mm_ppm_resize_features", O.ppm_resized_oracle(MM_RESIZE_W, MM_RESIZE_H)
)
def mm_ppm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode → nearest-neighbour resample → re-encode P6 → decode again:
    the oracle reproduces the exact integer index mapping, so a one-pixel
    sampling offset anywhere in the codec chain flips the hash."""
    media = attach_media(_docs(spark, sf_dir), fmt="ppm")
    resized = resize_decoded_images(media, target_w=MM_RESIZE_W, target_h=MM_RESIZE_H)
    return decode_image_features(resized)


@register("mm_wav_energy", O.WAV_ENERGY_ORACLE)
def mm_wav_energy_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RIFF/PCM decode: sample rate from the parsed fmt chunk, total
    energy as an exact int64 sum of squared little-endian int16 samples."""
    media = attach_media(_docs(spark, sf_dir), fmt="wav")
    return wav_energy(media)


@register(
    "mm_gzip_text_roundtrip",
    f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({O.sql_token_count("text")} AS BIGINT) AS n_tokens,
       md5(text) AS text_md5
FROM documents WHERE text IS NOT NULL
""",
)
def mm_gzip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-text-column pattern: genuine gzip members inflated by a
    real decompressor, verified by md5 of the decompressed text — a
    single corrupted byte anywhere in the deflate stream breaks the hash.
    Driver-visible as a multimodal-suite member."""
    from .functions.multimodal import attach_gzip_text, decompress_text
    from .functions.text import token_count

    blobs = attach_gzip_text(_docs(spark, sf_dir))
    text = decompress_text(blobs)
    return text.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
        F.md5(F.col("text")).alias("text_md5"),
    )


@register("mm_png_decode_features", O.PPM_DECODE_ORACLE)
def mm_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed-format decode: genuine zlib-deflated PNGs (CRC'd
    chunks, filtered scanlines) decoded by codecs.decode_png — inflate +
    unfilter + chunk walk, no codec library.  The fixture writes the text
    bytes as the pixel payload in the same geometry as the PPM fixture,
    so the oracle is the identical channel-sum math; a wrong inflate,
    filter reversal or CRC acceptance breaks the hash.  Driver-visible as
    a multimodal-suite member (the registry's 50 individual slots are
    full)."""
    from .functions.multimodal import attach_png_media

    media = attach_png_media(_docs(spark, sf_dir))
    return decode_image_features(media)


# ---------------------------------------------------------------------------
# Dataset splitting / sampling (deterministic, content-hashed)
# ---------------------------------------------------------------------------
SPLIT_TEST_FRAC, SPLIT_SALT = 0.1, "split"
SAMPLE_FRACS, SAMPLE_SALT = {"en": 0.5, "es": 0.25, "de": 0.1}, "sample"


@register(
    "split_train_test",
    O.train_test_split_oracle(SPLIT_TEST_FRAC, SPLIT_SALT),
)
def split_train_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe split: membership is a pure function of (salt, id) —
    stable across runs, repartitionings, and corpus refreshes."""
    df = train_test_split(
        _docs(spark, sf_dir), "doc_id", test_fraction=SPLIT_TEST_FRAC, salt=SPLIT_SALT
    )
    return df.select("doc_id", "split")


@register(
    "sample_stratified_by_lang",
    O.stratified_sample_oracle(SAMPLE_FRACS, 0.0, SAMPLE_SALT),
)
def sample_stratified_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (data-mixture control)."""
    df = stratified_sample(
        _docs(spark, sf_dir),
        strata_col="lang",
        fractions=SAMPLE_FRACS,
        id_col="doc_id",
        salt=SAMPLE_SALT,
    )
    return df.select("doc_id", "lang")


CAP_N, CAP_SALT = 25, "cap"


@register("sample_cap_per_source", O.cap_per_key_oracle("source", CAP_N, CAP_SALT))
def sample_cap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap (≤ CAP_N docs per domain) — deterministic reservoir
    equivalent for corpus balancing."""
    df = cap_per_key(_docs(spark, sf_dir), "source", "doc_id", CAP_N, salt=CAP_SALT)
    return df.select("doc_id", "source", "sample_rank")


GROUP_SPLIT_FRAC, GROUP_SPLIT_SALT = 0.2, "gsplit"


@register(
    "split_by_source_group",
    f"""
SELECT doc_id, source,
       CASE WHEN {O.sql_hash_fraction("source", GROUP_SPLIT_SALT)} < {GROUP_SPLIT_FRAC}
            THEN 'test' ELSE 'train' END AS split
FROM documents
""",
)
def split_by_group_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-level leakage-safe split: the hash is keyed on SOURCE, so
    every document from one domain lands in the same split — near-dups
    within a domain can never straddle the train/test boundary (the
    leakage mode a per-doc split can't prevent)."""
    df = train_test_split(
        _docs(spark, sf_dir), "source",
        test_fraction=GROUP_SPLIT_FRAC, salt=GROUP_SPLIT_SALT,
    )
    return df.select("doc_id", "source", "split")


@register(
    "corpus_stats_by_source",
    f"""
WITH base AS (
  SELECT source, lang, {O.sql_token_count("text")} AS toks FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(toks) AS BIGINT) AS total_tokens,
       CAST(sum(toks) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
FROM base GROUP BY source
""",
)
def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health report per source: doc/token totals, mean length
    (one exact-int division), language diversity — the monitoring query a
    data-mixture pipeline runs after every ingest.  Token counting stays
    in the scan stage; the exchange carries per-source partials."""
    from .functions.text import token_count

    df = _docs(spark, sf_dir).select(
        "source", "lang", token_count(F.col("text")).alias("toks")
    )
    return df.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("total_tokens"),
        (F.sum("toks").cast("double") / F.count("*")).alias("avg_tokens"),
        F.countDistinct("lang").alias("n_langs"),
    )


CHUNK_TOKENS, CHUNK_STRIDE = 32, 24
BUDGET_TOKENS, BUDGET_SALT = 800, "budget"


@register("chunk_documents", O.chunk_documents_oracle(CHUNK_TOKENS, CHUNK_STRIDE))
def chunk_documents_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token context windows per document (embedding /
    pretraining prep) — shuffle-free per-row array codegen."""
    from .functions.sampling import chunk_documents

    return chunk_documents(
        _docs(spark, sf_dir), "doc_id", "text",
        chunk_tokens=CHUNK_TOKENS, stride=CHUNK_STRIDE,
    )


@register(
    "sample_token_budget_per_source",
    O.token_budget_oracle("source", BUDGET_TOKENS, BUDGET_SALT),
)
def token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: keep docs per source, in content-hash
    order, while the source's cumulative tokens stay within budget."""
    from .functions.sampling import token_budget_per_key
    from .functions.text import token_count

    df = token_budget_per_key(
        _docs(spark, sf_dir), "source", "doc_id",
        token_count(F.col("text")), budget=BUDGET_TOKENS, salt=BUDGET_SALT,
    )
    return df.select("doc_id", "source", "n_tokens", "cum_tokens")


TFIDF_K = 3


@register("text_tfidf_top_terms", O.tfidf_top_terms_oracle(TFIDF_K))
def tfidf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TFIDF_K rarity-weighted terms per document (keyword extraction)."""
    return tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=TFIDF_K)


BM25_TERMS = ["spark", "join", "scan", "window"]
BM25_K = 10


@register("text_bm25_topk", O.bm25_topk_oracle(BM25_TERMS, BM25_K))
def bm25_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval top-k (integer-ratio scoring, cross-engine exact)."""
    from .functions.text import bm25_topk

    return bm25_topk(
        _docs(spark, sf_dir), "doc_id", "text", BM25_TERMS, k=BM25_K
    )


@register(
    "dedup_components",
    O.connected_components_oracle(
        O.minhash_lsh_pairs_oracle(MINHASH_NUM, MINHASH_BANDS, SHINGLE_N, JACCARD_T)
    ),
)
def dedup_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → clusters via alternating large-star/small-star — the
    O(log n)-round formulation that stays distributed on adversarial
    graph shapes (keep-rule downstream: doc_id == component survives).
    Min-label propagation (connected_components) remains available for
    the near-clique graphs dedup usually produces; both are pinned
    bit-identical in tests/test_connected_components.py."""
    pairs = minhash_lsh_pairs(
        _docs(spark, sf_dir, spread=True),
        "doc_id",
        "text",
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        jaccard_threshold=JACCARD_T,
    )
    return connected_components_star(pairs)


@register(
    "dedup_apply_canonical",
    O.dedup_apply_oracle(
        O.minhash_lsh_pairs_oracle(MINHASH_NUM, MINHASH_BANDS, SHINGLE_N, JACCARD_T)
    ),
)
def dedup_apply_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline a corpus pass actually runs, end-to-end in
    one plan: shingle → minhash → LSH-band join → Jaccard verify →
    large-star/small-star clustering → drop non-canonical docs.

    Scale shape: the only frames that ever shuffle are signatures, band
    keys, candidate pairs and the (pairs-sized) duplicate-id list; the
    final anti-join streams the corpus once against that list with AQE
    picking broadcast vs shuffle-hash by its real size — no forced
    broadcast, so a pathological everything-is-duplicate corpus degrades
    to a shuffle join instead of an OOM."""
    docs = _docs(spark, sf_dir, spread=True)
    pairs = minhash_lsh_pairs(
        docs,
        "doc_id",
        "text",
        num_hashes=MINHASH_NUM,
        bands=MINHASH_BANDS,
        shingle_n=SHINGLE_N,
        jaccard_threshold=JACCARD_T,
    )
    dupes = (
        connected_components_star(pairs)
        .filter(F.col("doc_id") != F.col("component"))
        .select("doc_id")
    )
    return docs.join(dupes, "doc_id", "left_anti").select("doc_id", "lang", "source")


CURATE_QUALITY_T = 0.75


@register(
    "curate_pipeline",
    O.curate_pipeline_oracle(CURATE_QUALITY_T, SPLIT_TEST_FRAC, SPLIT_SALT),
)
def curate_pipeline_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation: quality gate -> exact-dedup survivors ->
    leakage-safe split.  One declarative plan: the dedup keep-set join
    broadcasts (fingerprint aggregation output is tiny relative to the
    corpus) and the quality/split expressions fuse into the same scan —
    the whole pipeline reads the corpus twice (once for fingerprint
    grouping, once for output), independent of how many stages compose."""
    docs = _docs(spark, sf_dir)
    feats = quality_features(F.col("text"))
    keep = exact_dedup(docs, "doc_id", doc_fingerprint(F.col("text"))).select(
        F.col("keep_id").alias("doc_id")
    )
    out = (
        docs.join(F.broadcast(keep), on="doc_id")
        .withColumn("quality_score", feats["quality_score"])
        .filter(F.col("quality_score") >= CURATE_QUALITY_T)
    )
    out = train_test_split(out, "doc_id", SPLIT_TEST_FRAC, SPLIT_SALT)
    return out.select("doc_id", "lang", "split", "quality_score")


PACK_BUDGET, PACK_SHARDS = 512, 16


@register("pack_sequences", O.pack_sequences_oracle(PACK_BUDGET, PACK_SHARDS))
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: shard-parallel contiguous packing under a
    token budget (the windowed cut that would need a global sort runs per
    shard — corpus/num_shards per window at scale)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"), "text"
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", PACK_BUDGET, PACK_SHARDS)
    return out.select("doc_id", "n_tokens", "shard", "pack_id", "pack_offset")


def _contamination_kmv_oracle() -> str:
    from .functions.oracle_sql import sql_md5_long, sql_shingles, sql_tokens
    from .operators.sketch import kmv_numerator

    k = CONTAM_KMV_K
    num = kmv_numerator(k)

    def kmin(src: str) -> str:
        return f"""(
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn FROM {src}
  ) WHERE rn <= {k}
)"""

    return f"""
WITH base AS (
  SELECT doc_id, {sql_shingles(sql_tokens("text"), DECON_N)} AS sh FROM documents
), ev AS (
  SELECT DISTINCT {sql_md5_long("g", 15)} AS h
  FROM (SELECT unnest(sh) AS g FROM base WHERE doc_id % {DECON_EVAL_MOD} = 0)
), tr AS (
  SELECT DISTINCT {sql_md5_long("g", 15)} AS h
  FROM (SELECT unnest(sh) AS g FROM base WHERE doc_id % {DECON_EVAL_MOD} <> 0)
), ka AS {kmin("ev")}, kb AS {kmin("tr")},
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
), ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_exact
  FROM (SELECT h FROM ev INTERSECT SELECT h FROM tr)
)
SELECT e.n_exact, u.n_union, u.theta, r.rho,
       CASE WHEN u.n_union < {k} THEN CAST(r.rho AS DOUBLE)
            ELSE r.rho * {num!r} / u.theta / {float(k)!r} END AS est_raw
FROM ex e, ustats u, rho r
"""


CONTAM_KMV_K = 512


@register("text_contamination_kmv", None)
def text_contamination_kmv_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram CONTAMINATION VOLUME from two KMV sketches:
    how many distinct word 4-grams the train corpus shares with the
    held-out slice, estimated from 2·k retained hashes (theta overlap)
    next to the exact intersection count.  At 100 TB this is the triage
    read before the per-doc decontamination pass (dedup_decontaminate):
    each corpus folds to k 60-bit hashes — the overlap question costs
    two k-row states, not a cross-corpus join.  Oracle registered via
    ORACLES (cross-engine-exact state: same shingle + md5 idiom)."""
    from .functions.dedup import md5_long, word_shingles
    from .operators.sketch import kmv_numerator

    k = CONTAM_KMV_K
    df = _docs(spark, sf_dir, spread=True)
    grams = df.select(
        (F.col("doc_id") % DECON_EVAL_MOD == 0).alias("is_eval"),
        F.explode(word_shingles(F.col("text"), DECON_N)).alias("g"),
    ).select("is_eval", md5_long(F.col("g")).alias("h"))

    # ONE pass over the gram stream serves all four consumers: the
    # per-hash side-membership aggregate replaces four separate
    # evaluations of the full shingle→md5→explode lineage (ka, kb, and
    # both sides of the exact intersection each re-derived the corpus —
    # measured 4 full 65-task corpus passes; guide §2.3 "aggregate
    # before you shuffle" + §2.4 shared exchange).  The persisted frame
    # is O(distinct grams) — the same magnitude the exact branch already
    # shuffles, and exactly what every branch below needs.
    sides = (
        grams.groupBy("h")
        .agg(
            F.max(F.col("is_eval")).alias("in_eval"),
            F.max(~F.col("is_eval")).alias("in_train"),
        )
        .persist()
    )

    def kmin(side):
        return side.select("h").orderBy("h").limit(k)

    ka = kmin(sides.filter("in_eval"))
    kb = kmin(sides.filter("in_train"))
    u = (
        ka.unionByName(kb).distinct().orderBy("h").limit(k)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_union"),
            F.max("h").cast("long").alias("theta"),
        )
    )
    rho = (
        ka.join(kb, "h")
        .crossJoin(F.broadcast(u.select("theta")))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("rho"))
    )
    ex = (
        sides.filter(F.col("in_eval") & F.col("in_train"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    )
    num = kmv_numerator(k)
    return (
        ex.crossJoin(F.broadcast(u))
        .crossJoin(F.broadcast(rho))
        .select(
            "n_exact",
            "n_union",
            "theta",
            "rho",
            F.when(
                F.col("n_union") < k, F.col("rho").cast("double")
            )
            .otherwise(
                F.col("rho") * F.lit(num) / F.col("theta")
                / F.lit(float(k))
            )
            .alias("est_raw"),
        )
    )


ORACLES["text_contamination_kmv"] = _contamination_kmv_oracle()
