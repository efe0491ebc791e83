"""Deduplication families for a training-data pipeline.

Exact, MinHash+LSH, SimHash and n-gram-Jaccard dedup — all expressed with
JVM-side higher-order array functions (``transform``/``aggregate``/
``filter``), no Python UDFs, so the whole pipeline stays in codegen and
scales linearly: per-row signature computation is shuffle-free; only the
candidate-pair join shuffles, and it shuffles *signatures* (bytes/row),
never documents.

Hashing is md5-hex-substring → integer, chosen because it is bit-identical
in Spark (``conv(substr(md5(x),1,k),16,10)``) and DuckDB
(``('0x'||substr(md5(x),1,k))::BIGINT``) — every operator here has an exact
cross-engine oracle.

Scale design (100 TB corpus):
- signatures: one narrow pass, column-pruned scan of (id, text) only
- LSH banding: explode to (band, key) rows — ``bands × n`` small rows;
  the self-join shuffles on (band, key), a uniform md5-derived key, so no
  skew; AQE handles residual imbalance
- verification joins fetch only shingle arrays for candidate ids
  (semi-join pruned), never the full corpus
- generator inputs use explode_OUTER: plain explode triggers Catalyst's
  InferFiltersFromGenerate, whose size>0/notnull pre-filter re-evaluates
  the (expensive) generator expression twice more — measured 7× on the
  minhash fold.  Null/empty inputs produce null rows that the downstream
  equi-joins drop, so results are identical.
"""

from __future__ import annotations

import random
from collections.abc import Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import tokenize

# minhash parameters: (a*H(s)+b) mod P over 28-bit md5-derived shingle
# hashes; a,b from a fixed seed so the SQL oracle regenerates them exactly
MINHASH_PRIME = 2147483647  # 2^31 - 1
_SEED = 20260813


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    rng = random.Random(_SEED)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def md5_long_py(value, hex_digits: int = 15) -> int:
    """Driver-side twin of :func:`md5_long` over ``str(value)`` — THE one
    copy of the first-N-md5-hex-digits idiom (bloom probes and
    secondary-index bucket hashing both depend on it staying bit-identical
    to the Spark expression)."""
    import hashlib

    return int(hashlib.md5(str(value).encode()).hexdigest()[:hex_digits], 16)


def md5_long(col: Column, hex_digits: int = 15) -> Column:
    """First *hex_digits* of md5 as a non-negative int (≤60 bits)."""
    return F.conv(F.substring(F.md5(col), 1, hex_digits), 16, 10).cast("long")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; whole text if shorter than n words."""
    words = tokenize(text)
    starts = F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0)))
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_join(F.slice(words, i + 1, n), " "))
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup(
    df: DataFrame, id_col: str, fingerprint: Column
) -> DataFrame:
    """Hash-groupBy exact dedup: one surviving id + multiplicity per
    fingerprint.  A pure partial-aggregatable groupBy — map-side combine
    shrinks each 100 TB scan partition to its distinct fingerprints before
    the single shuffle."""
    return (
        df.select(F.col(id_col), fingerprint.alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def boilerplate_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = r"\. ",
    min_docs: int = 10,
) -> DataFrame:
    """Cross-document segment-frequency dedup (C4/RefinedWeb-style
    boilerplate detection): split each document into segments, count the
    distinct documents each segment appears in, and flag segments whose
    spread reaches *min_docs* — headers, footers, nav chrome, subscription
    prompts.  Downstream reassembly drops flagged segments.

    Scale shape: the (doc, segment) explode partial-aggregates its
    distinct count map-side before one shuffle on segment; the frequency
    frame is segment-vocabulary-sized and the flag join is left to AQE
    (broadcast when it fits, shuffle-hash at corpus scale)."""
    segs = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), sep)).alias("seg")
    )
    freq = segs.groupBy("seg").agg(F.countDistinct(id_col).alias("seg_docs"))
    return segs.join(freq, "seg").select(
        id_col,
        "seg",
        "seg_docs",
        (F.col("seg_docs") >= min_docs).alias("is_boilerplate"),
    )


def contamination_hits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_pred: Column,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with the held-out eval set (the GPT-3/PaLM-style overlap check
    run before every pretraining launch).  Returns one row per
    contaminated train doc with its shared-distinct-gram count.

    Scale shape: the eval side collapses to a distinct set of 8-byte gram
    hashes (eval sets are benchmark-sized — MBs, not TBs) and is
    broadcast, so the 100 TB train side never shuffles raw grams: the
    explode → broadcast-join → partial countDistinct pipeline puts only
    surviving (doc_id, gram_hash) pairs — contamination is rare — through
    the single by-doc exchange.
    """
    sh = word_shingles(F.col(text_col), n)
    grams = df.select(
        F.col(id_col), eval_pred.alias("is_eval"), F.explode_outer(sh).alias("g")
    ).select(id_col, "is_eval", md5_long(F.col("g")).alias("gh"))
    ev = grams.filter("is_eval").select("gh").distinct()
    # word_shingles is array_distinct per doc, so count(*) ≡ countDistinct
    # here — and saves the two-phase distinct's extra (id, gh) exchange
    return (
        grams.filter(~F.col("is_eval"))
        .join(F.broadcast(ev), "gh")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_shared_grams"))
    )


def dup_ngram_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Per-document duplicated-n-gram counts (Gopher/RefinedWeb-style
    repetition quality signal): for each doc, how many of its distinct
    word n-grams also appear in at least one other document.  High
    duplicated-gram share marks template/boilerplate text that survives
    document-level dedup.

    Scale shape: grams travel as 8-byte md5 hashes, and the doc frequency
    is a COUNT(*) window over gh (shingles are per-doc distinct, so
    count(*) IS the doc frequency) — ONE pass over the gram stream with
    exactly two exchanges (by gh for the window, by doc for the final
    agg).  The window formulation replaces the aggregate-then-join-back
    shape, which cost a third exchange plus a persist of the gram table
    to stop the text→shingle→md5 lineage running per join branch
    (measured 2× at sf0.1).  Skew exposure is identical: a universal
    gram lands on one task either way (window group ≙ join build group),
    and WindowExec spills where the join would."""
    sh = word_shingles(F.col(text_col), n)
    grams = (
        df.select(F.col(id_col), F.explode_outer(sh).alias("g"))
        .select(id_col, md5_long(F.col("g")).alias("gh"))
        # null-text docs produce a single null gh; the old inner join
        # dropped them, so the window path must too
        .filter(F.col("gh").isNotNull())
    )
    from pyspark.sql import Window

    gram_docs = F.count("*").over(Window.partitionBy("gh"))
    return (
        grams.withColumn("gram_docs", gram_docs)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("gram_docs") > 1).cast("long")).alias("n_dup_grams"),
        )
    )


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    max_distance: int,
    prefix_chars: int = 40,
) -> DataFrame:
    """Near-dup pairs by Levenshtein distance over a text prefix, blocked
    by *block_col* (fuzzy title/header dedup — catches typo-level edits
    that shingle-based methods need high thresholds to see).

    Scale shape: the self-join is quadratic ONLY within a block, so the
    block key is the scale lever (language, domain, length bucket, …);
    the equi-join on the block shuffles each side once and AQE splits
    skewed blocks.  ``prefix_chars`` caps the O(len²) per-pair cost.
    Levenshtein is integer-exact in both engines."""
    left = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("pa"),
    )
    right = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_b"),
        F.substring(F.col(text_col), 1, prefix_chars).alias("pb"),
    )
    return (
        left.join(right, on="blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("distance", F.levenshtein(F.col("pa"), F.col("pb")))
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
    )


def minhash_signature(
    text: Column, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """MinHash signature as array<long>: min over shingles of
    (a_i * H28(shingle) + b_i) mod P for each of *num_hashes* permutations.

    NOTE: as a single Column this embeds the shingle-hash subtree once per
    hash function (Column trees are trees, not DAGs).  Fine for one-off
    selects; pipelines should use :func:`minhash_signatures` which stages
    shingles → hashes → signature through real projections so each level
    is computed once per row."""
    shingles = word_shingles(text, shingle_n)
    hashes = F.transform(shingles, lambda s: md5_long(s, 7))
    sig = [
        F.array_min(
            F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_PRIME)
        )
        for a, b in minhash_coeffs(num_hashes)
    ]
    return F.array(*sig)


def minhash_fold(hs: Column, num_hashes: int) -> Column:
    """Signature from a shingle-hash array in ONE pass: fold the array with
    an accumulator of *num_hashes* running minima, zip_with against a
    literal (a,b) coefficient array.  Equivalent to num_hashes separate
    ``array_min(transform(...))`` trees but: one traversal of ``hs`` instead
    of num_hashes, and an expression tree O(1) in num_hashes — which also
    cuts codegen compile time, a real cost when queries are compiled per
    micro-batch."""
    ab = F.array(
        *[
            F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
            for a, b in minhash_coeffs(num_hashes)
        ]
    )
    init = F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes)
    folded = F.aggregate(
        hs,
        init,
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, c: F.least(m, (c["a"] * h + c["b"]) % MINHASH_PRIME)
        ),
    )
    # null text → null hash array: match the per-hash formulation (and the
    # SQL oracle), which yields an array of nulls, not a null array
    nulls = F.array(*[F.lit(None).cast("long") for _ in range(num_hashes)])
    return F.when(hs.isNull(), nulls).otherwise(folded)


def minhash_fold_arrow(num_hashes: int):
    """Arrow twin of :func:`minhash_fold`: given the JVM-computed shingle
    hash array, compute the num_hashes running minima as ONE vectorized
    int64 matrix op per row instead of an interpreted per-(shingle×hash)
    lambda.  Bit-exact: ``md5_long(s, 7)`` < 2²⁸ and coefficients < 2³¹,
    so every a·h+b stays far below 2⁶³ and int64 ``%`` agrees with the
    expression path (and the SQL oracle) exactly.  Edge parity pinned to
    the fold: null array → array of nulls; empty array → all-PRIME."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    coeffs = minhash_coeffs(num_hashes)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]

    @pandas_udf("array<long>")
    def fold(hs: pd.Series) -> pd.Series:
        out = []
        for arr in hs:
            if arr is None:
                out.append([None] * num_hashes)
            elif len(arr) == 0:
                out.append([MINHASH_PRIME] * num_hashes)
            else:
                h = np.asarray(arr, dtype=np.int64)[None, :]
                out.append(
                    ((A * h + B) % MINHASH_PRIME).min(axis=1).tolist()
                )
        return pd.Series(out)

    return fold


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig) MinHash signatures, staged so the shingle/hash arrays are
    attributes (computed once per row) and folded via :func:`minhash_fold`
    (single traversal, O(1)-size expression tree)."""
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    hashed = shingled.select(
        "id", F.transform(F.col("shingles"), lambda s: md5_long(s, 7)).alias("hs")
    )
    return hashed.select("id", minhash_fold(F.col("hs"), num_hashes).alias("sig"))


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """array<struct<band:int, key:string>> — md5 of each signature band.
    One ``transform`` over the band indices (Column-typed slice start), so
    the expression tree is O(1) in the band count."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("key"),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    cache_intermediate: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    shingle→minhash→band→bucket-join→verify: candidate pairs are ids
    sharing ≥1 band key; each candidate is verified with the exact Jaccard
    of its distinct shingle sets.  Returns (id_a, id_b, jaccard) with
    id_a < id_b, deduplicated across bands.

    *cache_intermediate* persists the (id, shingles) and (id, sig) tables:
    both feed a self-join, and without materialization Spark evaluates the
    full text→shingle→hash lineage once per join branch — at 100 TB that
    is two extra corpus scans; the signature table is tiny relative to the
    corpus and is exactly what you want resident.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    shingled = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    if cache_intermediate:
        shingled = shingled.persist()
    # derive signatures FROM the (persisted) shingle table — tokenize+slice+
    # md5 is the expensive pass over the corpus; recomputing it from raw text
    # for the signature branch would scan the corpus twice
    hashed = shingled.select(
        "id", F.transform(F.col("shingles"), lambda s: md5_long(s, 7)).alias("hs")
    )
    sigs = hashed.select("id", minhash_fold(F.col("hs"), num_hashes).alias("sig"))
    if cache_intermediate:
        sigs = sigs.persist()
    # band rows carry ONLY (id, band, key): the candidate self-join must not
    # drag shingle arrays through the near-quadratic bucket explosion — at
    # any scale that multiplies shuffle bytes by the document size
    banded = sigs.select(
        "id", F.explode_outer(lsh_band_keys(F.col("sig"), bands, rows_per_band)).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(right, on=["band", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # fetch shingle arrays only for surviving candidate ids
    verified = (
        candidates.join(
            shingled.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a")),
            on="id_a",
        )
        .join(
            shingled.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b")),
            on="id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = inter.cast("double") / union.cast("double")
    return (
        verified.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
SIMHASH_BITS = 32


def simhash(text: Column) -> Column:
    """32-bit SimHash over distinct words: per-bit signed vote of each
    word's 32-bit md5-derived hash, bit set where the vote is positive.

    Single pass: fold the word-hash array once with a 32-slot vote
    accumulator (zip_with against a literal bit-index array), then collapse
    votes to the bit field — vs 32 separate aggregates this traverses the
    array once and keeps the expression tree O(1) in bit width (fast
    codegen compile).  All JVM-side, shuffle-free, no explode."""
    hashes = F.transform(
        F.array_distinct(tokenize(text)), lambda w: md5_long(w, 8)
    )
    powers = F.array(*[F.lit(2 ** b).cast("long") for b in range(SIMHASH_BITS)])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), SIMHASH_BITS),
        lambda acc, h: F.zip_with(
            acc,
            powers,
            lambda v, p: v
            + F.when(h.bitwiseAND(p) != 0, F.lit(1)).otherwise(F.lit(-1)),
        ),
    )
    return F.aggregate(
        F.zip_with(
            votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def hamming32(a: Column, b: Column) -> Column:
    """Hamming distance between two 32-bit simhashes (native popcount)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("long")


def simhash_dup_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: block on the 4 bytes of the simhash
    (a ≤max_hamming-bit difference leaves ≥1 of 4 byte-blocks identical
    for max_hamming ≤ 3 — pigeonhole), verify with exact Hamming distance."""
    base = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sh")
    )
    blocked = base.select(
        "id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.shiftright(F.col("sh"), i * 8).bitwiseAND(F.lit(0xFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.block").alias("block"), F.col("bk.key").alias("key"))
    left, right = blocked.alias("l"), blocked.alias("r")
    cand = (
        left.join(right, on=["block", "key"])
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.sh").alias("sh_a"),
            F.col("r.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn("hamming", hamming32(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Connected components — near-dup pairs → clusters → canonical survivor
# ---------------------------------------------------------------------------
def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve duplicate-pair edges into clusters: (doc_id, component) where
    component = min id reachable from doc_id.  Downstream keep-rule: keep
    rows where doc_id == component.

    Iterative min-label propagation (the classic Spark formulation):
    each round joins labels across edges and takes the per-node min; the
    driver loops until a fixpoint.  ``localCheckpoint`` truncates lineage
    per round — without it the plan doubles every iteration.  Rounds needed
    = graph diameter; dedup clusters are near-cliques (diameter ~1-2), so
    this converges in 2-3 rounds regardless of corpus size.  At 100 TB the
    per-round cost is one shuffle of (node, label) pairs — edges, not
    documents; for adversarial long-chain graphs swap in large-star/
    small-star (Kiveris et al.), same interface.

    Only nodes appearing in *pairs* are returned (singletons are their own
    implicit component)."""
    fwd = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = fwd.union(
        fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).distinct().persist()
    labels = edges.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        prop = edges.join(labels, on="u").select(F.col("v").alias("u"), "label")
        new_labels = (
            labels.union(prop).groupBy("u").agg(F.min("label").alias("label"))
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="u")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("component"))


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al., *Connected Components in MapReduce and Beyond*,
    SoCC'14) — same contract as :func:`connected_components` ((doc_id,
    component = min reachable id), only nodes appearing in *pairs*), but
    O(log n) rounds on ANY graph shape, where min-label propagation needs
    O(diameter) rounds and loses on adversarial chains.

    Each round is two shuffles of the (shrinking) edge list:
    - large-star: every node links its larger neighbours to the minimum of
      its closed neighbourhood — long tails collapse toward minima;
    - small-star: every node re-points its smaller-or-equal neighbours at
      that minimum — stars flatten to depth 1.
    Edges stay canonical (u > v), so the fixpoint is exactly the star
    forest whose centres are component minima.  Convergence = the new edge
    SET equals the old one: both sides are distinct, so equal counts plus
    an empty left-anti probe is an exact set-equality test (no fingerprint
    collisions).  ``localCheckpoint`` truncates lineage per round, as in
    the propagation variant."""
    nodes = (
        pairs.select(F.col(id_a).alias("n"))
        .union(pairs.select(F.col(id_b).alias("n")))
        .distinct()
    )
    edges = (
        pairs.select(
            F.greatest(F.col(id_a), F.col(id_b)).alias("u"),
            F.least(F.col(id_a), F.col(id_b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        # e is canonical u > v: each u's neighbours here are its smaller ones
        mins = e.groupBy("u").agg(F.min("v").alias("m"))
        relink = (
            e.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        root_links = mins.select("u", F.col("m").alias("v"))
        return (
            relink.union(root_links).filter(F.col("u") != F.col("v")).distinct()
        )

    for _ in range(max_iter):
        new_edges = small_star(large_star(edges)).localCheckpoint()
        # set equality in ONE job: both sides are distinct, so an empty
        # full-outer symmetric difference ⟺ identical edge sets (replaces
        # the count + left-anti pair — one fewer action per round)
        converged = (
            new_edges.withColumn("_l", F.lit(1))
            .join(edges.withColumn("_r", F.lit(1)), ["u", "v"], "full_outer")
            .filter(F.col("_l").isNull() | F.col("_r").isNull())
            .isEmpty()
        )
        edges = new_edges
        if converged:
            break
    # fixpoint is a star forest pointing larger → centre; centres (and any
    # node seen only in self-pairs) never appear on the u side — they are
    # their own component, like the oracle's reflexive closure
    return edges.select(
        F.col("u").alias("doc_id"), F.col("v").alias("component")
    ).union(
        nodes.join(edges, nodes["n"] == edges["u"], "left_anti")
        .select(F.col("n").alias("doc_id"), F.col("n").alias("component"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (blocked exact similarity)
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact word-n-gram Jaccard over pairs sharing a blocking key (e.g.
    source, language, or a length bucket) — the O(n²) pair space is
    confined to blocks; the join shuffles on the block key only."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(block_col).alias("block"),
        word_shingles(F.col(text_col), n).alias("sh"),
    )
    left, right = base.alias("l"), base.alias("r")
    pairs = (
        left.join(right, on="block")
        .filter(F.col("l.id") < F.col("r.id"))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            (
                F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh"))).cast("double")
                / F.size(F.array_union(F.col("l.sh"), F.col("r.sh"))).cast("double")
            ).alias("jaccard"),
        )
    )
    return pairs.filter(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# Incremental MinHash near-dup — continuous dedup against a signature store
# ---------------------------------------------------------------------------
# key-space sub-partitions per band: the store read prunes to the (band, kb)
# partitions the batch touches, and each batch appends ≤ bands × this many
# files — sized so both the pruning grain and the file count stay sane
SIG_STORE_KEY_BUCKETS = 16


def incremental_minhash_pairs(
    new_docs: DataFrame,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    min_sig_matches: int = 8,
    auto_compact_dirs: int | None = None,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against everything seen so far.

    The persisted store holds the BANDED signatures (*bands* rows of
    ~num_hashes ints per document — never shingles or text), PARTITIONED
    BY (band, key-bucket): at 100 TB the per-batch candidate join prunes
    the store read to only the (band, kb) partitions the new batch's own
    band keys touch — a micro-batch against a petabyte store reads a
    batch-bounded slice, not the whole store.  Band keys of the new batch
    join band keys of store∪batch (only pairs with ≥1 new member can
    surface), and candidates verify by the signature-estimated Jaccard:
    the count of equal minhash positions, an unbiased estimator whose
    integer exactness also gives the operator a SQL oracle.  Returns
    (id_a, id_b, n_sig_matches) with n_sig_matches ≥ *min_sig_matches*,
    materialized BEFORE the new signatures append to the store (so the
    result never sees its own batch through the store read).

    *auto_compact_dirs* (opt-in) keeps a CONTINUOUS ingest loop's
    directory count bounded without a separate maintenance job: when the
    store holds more than that many ``batch-*`` dirs at ENTRY, they fold
    through :func:`compact_signature_store` before this batch reads —
    entry-time placement matters, because compacting after the append
    would delete directories a just-returned (cached but evictable)
    result still references for recompute.

    Caller contract under *auto_compact_dirs*: CONSUME (collect, write,
    or ``localCheckpoint``) each returned pairs DataFrame BEFORE the next
    ingest call.  The result is only ``persist()``-ed — evictable — and
    its recompute path reads the store dirs enumerated at ITS call; a
    later call's entry-time compaction deletes those dirs, so an evicted
    result that is first materialized after a subsequent ingest fails
    (loudly, with a missing-path error — never silently wrong).  Without
    auto-compaction the store is append-only and returned frames stay
    recomputable indefinitely."""
    from .compute import spread_for_compute

    spark = new_docs.sparkSession
    if auto_compact_dirs is not None:
        compact_signature_store(spark, store_dir, max_batch_dirs=auto_compact_dirs)
    rows_per_band = num_hashes // bands
    # a micro-batch typically arrives as a handful of CDC files — far
    # fewer splits than cores — while the per-row shingle→md5→fold chain
    # below is the operator's dominant compute; spread the batch before
    # it (factor 2 so skewed doc lengths load-balance), a no-op whenever
    # the feed is already at least core-parallel (guide §2.5 input skew)
    new_docs = spread_for_compute(new_docs, min_factor=2)
    sh = new_docs.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("shingles"),
    )
    hs = sh.select("id", F.transform("shingles", lambda s: md5_long(s, 7)).alias("hs"))
    # the signature derivation is the dominant cost: per-shingle md5 stays
    # JVM-side, the num_hashes minima fold runs as a vectorized Arrow
    # kernel (bit-exact int64 twin of minhash_fold — see minhash_fold_arrow),
    # and the tiny result (~num_hashes ints/doc) persists so the band join,
    # store union, and store write all reuse one computation
    new_sigs = hs.select(
        "id", minhash_fold_arrow(num_hashes)(F.col("hs")).alias("sig")
    )

    # BANDED form once, cached: it is the join's left side, the touched-
    # partition probe, AND the store append — one banding pass serves all
    # three.  kb = md5(key) % SIG_STORE_KEY_BUCKETS sub-partitions each
    # band so the store read below prunes to the exact key neighborhoods
    # the batch can collide in.
    def banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "id",
            "sig",
            F.explode_outer(
                lsh_band_keys(F.col("sig"), bands, rows_per_band)
            ).alias("bk"),
        ).select("id", "sig", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    new_sigs = new_sigs.persist()
    # bkb packs (band, kb) into ONE stored int64 — the store read below
    # prunes with a constant-size `bkb IN (...)` predicate (pushed to
    # parquet row-group stats on a single column) instead of an OR-chain
    # of (band = b AND kb = k) conjuncts whose size grows with
    # bands × SIG_STORE_KEY_BUCKETS; sorting by bkb is identical to
    # sorting by (band, kb) since kb < SIG_STORE_KEY_BUCKETS.
    banded_new = banded(new_sigs).withColumn(
        "kb", F.pmod(md5_long(F.col("key"), 7), F.lit(SIG_STORE_KEY_BUCKETS))
    ).withColumn(
        "bkb",
        (F.col("band") * SIG_STORE_KEY_BUCKETS + F.col("kb")).cast("long"),
    )

    # ONE driver action materializes the signature cache AND yields both
    # driver-side facts this call needs: the batch size (store-write file
    # sizing) and the touched (band, kb) set (store-read pruning).  The
    # previous shape paid two actions — a distinct-collect whose first
    # execution ran BEFORE the cache was pinned (measured re-running the
    # whole shingle→md5→fold chain), then a separate new_sigs.count().
    # collect_set is bounded by bands × SIG_STORE_KEY_BUCKETS entries;
    # count(*) is exactly bands rows per signature (lsh_band_keys always
    # emits `bands` structs, null-text signatures included).
    _stats = banded_new.agg(
        F.count(F.lit(1)).alias("n_banded"),
        F.collect_set(F.struct("band", "kb")).alias("touched"),
    ).collect()[0]
    n_new = int(_stats["n_banded"]) // bands
    touched = sorted((t["band"], t["kb"]) for t in _stats["touched"])

    # store read as ONE scan over a snapshot of the batch directories
    # (enumerating them BEFORE the append below pins the read set — the
    # new batch can never leak into its own read), PRUNED to the (band,
    # kb) neighborhoods the batch touches: store files are SORTED by
    # (band, kb) at write, so the pushed-down predicate skips whole row
    # groups via parquet min/max stats — a micro-batch against a huge
    # store reads a batch-bounded slice without paying a
    # directory-per-partition layout (which decays into file-count
    # overhead at exactly the micro-batch cadence that needs it)
    from pathlib import Path as _Path

    root = _Path(store_dir)
    batch_dirs = sorted(str(d) for d in root.glob("batch-*"))
    right = banded_new.select("band", "key", "id", "sig")
    if batch_dirs:
        # fail loudly on a store written by the pre-banded layout (plain
        # (id, sig) rows): a mixed-schema read would either error on the
        # missing band column or silently NULL it out, degrading the
        # "dedup against everything seen so far" contract to batch-local.
        # Check one footer per batch DIR (not just the alphabetically
        # first dir — batch names are uuid hex, so with concurrent
        # ingests a legacy dir can land anywhere in the ordering); a
        # driver-side footer peek costs ~ms per dir and compaction keeps
        # the dir count bounded.
        import pyarrow.parquet as _pq

        all_bkb = True
        for d in batch_dirs:
            first = next(_Path(d).rglob("*.parquet"), None)
            if first is None:
                continue
            names = _pq.read_schema(str(first)).names
            if "band" not in names:
                raise ValueError(
                    f"signature store dir {d} uses the legacy (id, sig) "
                    "layout; rebuild the store (re-ingest the corpus) "
                    "before appending banded batches"
                )
            all_bkb = all_bkb and "bkb" in names
        # an empty batch touches nothing and can match nothing — skip the
        # store read entirely instead of building an empty filter
        if touched:
            old = spark.read.parquet(*batch_dirs)
            if len(touched) < bands * SIG_STORE_KEY_BUCKETS:
                if all_bkb:
                    # constant-size pushed predicate on the packed column
                    old = old.filter(
                        F.col("bkb").isin(
                            [b * SIG_STORE_KEY_BUCKETS + kb for b, kb in touched]
                        )
                    )
                else:
                    # a dir predating the packed column (or a mixed
                    # store): the OR-chain over the two stored columns
                    # still pushes down, just with a fatter predicate
                    cond = None
                    for b, kb in touched:
                        t = (F.col("band") == b) & (F.col("kb") == kb)
                        cond = t if cond is None else (cond | t)
                    old = old.filter(cond)
            right = right.unionByName(old.select("band", "key", "id", "sig"))

    # signatures ride THROUGH the band join (16 ints/row — cheaper than
    # re-fetching them), so the verify runs inline on each band collision
    # and the plan is ONE join + one dedup shuffle instead of the previous
    # candidate-join → dropDuplicates → two verify re-joins.  Verify
    # BEFORE dedup: n_sig_matches is a pure function of the pair, so a
    # pair colliding in k ≤ bands bands recomputes one zip_with k times
    # (bounded fan-out) and survivors are identical whichever collision
    # produced them — strictly cheaper than re-joining the signature
    # store at any scale.
    n_match = F.size(
        F.filter(
            F.zip_with("l.sig", "r.sig", lambda x, y: x == y), lambda t: t
        )
    )
    pairs = (
        banded_new.alias("l")
        .join(right.alias("r"), on=["band", "key"])
        .filter(F.col("l.id") != F.col("r.id"))
        .select(
            F.least("l.id", "r.id").alias("id_a"),
            F.greatest("l.id", "r.id").alias("id_b"),
            n_match.alias("n_sig_matches"),
        )
        .filter(F.col("n_sig_matches") >= min_sig_matches)
        .dropDuplicates(["id_a", "id_b"])
        .persist()
    )
    pairs.count()  # materialize before the store mutates
    # each batch lands in its OWN subdirectory: appending into the shared
    # root would recacheByPath-invalidate every cached plan reading the
    # store (including the just-persisted result of THIS call — its pairs
    # would silently recompute on next use), and per-batch dirs are also
    # the layout concurrent ingests / retention GC want.  File count is
    # sized by bytes (a banded signature row is ~(num_hashes+1)×8 B ×
    # bands copies), and rows SORT by (band, kb) within each file so the
    # read-side predicate above prunes at row-group granularity.
    import uuid as _uuid

    est_bytes = n_new * (num_hashes + 1) * 16 * bands
    n_files = int(max(1, -(-est_bytes // (128 << 20))))
    banded_new.repartition(n_files, F.col("band"), F.col("kb")).sortWithinPartitions(
        "band", "kb"
    ).write.mode("overwrite").parquet(str(root / f"batch-{_uuid.uuid4().hex}"))
    new_sigs.unpersist()  # pairs is materialized; the cache has served
    return pairs


def compact_signature_store(
    spark: SparkSession, store_dir: str, max_batch_dirs: int = 16
) -> int:
    """Fold the signature store's per-batch directories into ONE
    consolidated (band, kb)-sorted directory when their count exceeds
    *max_batch_dirs*; returns the number of directories folded (0 = under
    threshold, nothing touched).

    Why: continuous dedup at CDC cadence (the reference's 12 s poll,
    cmd/core.go:284) appends one ``batch-*`` dir per micro-batch — ~7k
    dirs/day — and although the READ is pruned to touched (band, kb) row
    groups, directory listing and per-dir footer checks grow linearly
    with dir count.  Compaction restores O(1) listing while preserving
    the exact same row set and sort order, so
    :func:`incremental_minhash_pairs` results are bit-identical across a
    compaction.

    Crash contract: the consolidated dir is written FIRST (under the same
    ``batch-`` prefix readers glob), folded dirs are removed after.  A
    crash in between leaves duplicate signature rows in the store — which
    the candidate generator tolerates by construction (pairs are
    ``dropDuplicates(id_a, id_b)`` and n_sig_matches is a pure function
    of the pair), and a re-run of compaction collapses them: the fold
    reads DISTINCT rows.  Concurrent ingests appending new ``batch-*``
    dirs during the fold are untouched (the fold removes only the dirs it
    enumerated at entry)."""
    from pathlib import Path as _Path
    import shutil as _shutil
    import uuid as _uuid

    root = _Path(store_dir)
    batch_dirs = sorted(str(d) for d in root.glob("batch-*"))
    if len(batch_dirs) <= max_batch_dirs:
        return 0
    # the same legacy-layout guard the reader enforces: folding a legacy
    # (id, sig) dir into a consolidated banded dir would NULL its band
    # keys and permanently destroy the reader's ability to detect the
    # degradation (the consolidated footer carries a band column forever)
    import pyarrow.parquet as _pq

    for d in batch_dirs:
        first = next(_Path(d).rglob("*.parquet"), None)
        if first is not None and "band" not in _pq.read_schema(str(first)).names:
            raise ValueError(
                f"signature store dir {d} uses the legacy (id, sig) "
                "layout; rebuild the store (re-ingest the corpus) before "
                "compacting"
            )
    # select the five stable columns then RECOMPUTE the packed bkb: a
    # mixed store (dirs predating the packed column) would otherwise
    # read NULL bkb for old rows under the newer footer's schema, and
    # the fold is exactly where such dirs get upgraded
    old = (
        spark.read.parquet(*batch_dirs)
        .select("id", "sig", "band", "key", "kb")
        .distinct()
        .withColumn(
            "bkb",
            (F.col("band") * SIG_STORE_KEY_BUCKETS + F.col("kb")).cast("long"),
        )
    )
    est_bytes = sum(
        f.stat().st_size for d in batch_dirs for f in _Path(d).rglob("*.parquet")
    )
    n_files = int(max(1, -(-est_bytes // (128 << 20))))
    (
        old.repartition(n_files, F.col("band"), F.col("kb"))
        .sortWithinPartitions("band", "kb")
        .write.mode("overwrite")
        .parquet(str(root / f"batch-{_uuid.uuid4().hex}"))
    )
    for d in batch_dirs:
        _shutil.rmtree(d, ignore_errors=True)
    return len(batch_dirs)
