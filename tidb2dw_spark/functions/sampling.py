"""Deterministic sampling / dataset splitting for training pipelines.

``df.sample()`` is seed-dependent *per partitioning* — resplitting after a
repartition reshuffles examples between train and test, which silently
leaks test data at scale.  These operators derive membership from a
**content hash** (md5 of the row id + a salt), so the split is a pure
function of the data: stable across runs, partitionings, engines — and
exactly reproducible in the DuckDB oracle with the same math
(conv/substr/md5, see functions.dedup.md5_long).

All expressions are per-row codegen — shuffle-free, no sampling state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

# md5_long with 15 hex digits is uniform on [0, 16^15)
_HASH_SPACE = 16 ** 15


def hash_fraction(col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from a column's content."""
    return md5_long(F.concat_ws("|", F.lit(salt), col.cast("string"))) / F.lit(
        float(_HASH_SPACE)
    )


def train_test_split(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test') keyed on the id hash.

    Membership depends only on (salt, id): adding or removing other rows
    never moves an example across the boundary — the property that makes
    incremental corpus refreshes safe against test-set leakage."""
    frac = hash_fraction(F.col(id_col), salt)
    return df.withColumn(
        "split", F.when(frac < test_fraction, F.lit("test")).otherwise(F.lit("train"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    id_col: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its id hash falls
    under its stratum's fraction.  Replaces ``df.sampleBy`` (seed- and
    partitioning-dependent) with a reproducible filter; per-row expression,
    no shuffle, exact oracle."""
    frac = hash_fraction(F.col(id_col), salt)
    threshold = F.lit(float(default_fraction))
    for value, p in sorted(fractions.items()):
        threshold = F.when(F.col(strata_col) == value, F.lit(float(p))).otherwise(
            threshold
        )
    return df.filter(frac < threshold)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most *n* rows per key, chosen uniformly by content hash —
    the deterministic equivalent of per-key reservoir sampling (cap docs
    per domain/source, a standard corpus-balancing pass).

    Adds ``sample_rank`` (1-based position in the key's hash order).
    Membership is a pure function of (salt, id): re-runs, repartitions and
    unrelated inserts never change which rows survive.  One window per
    key — per-partition work is bounded by the key's row count; a skewed
    giant key is the same skew the equivalent groupBy would have, and AQE
    splits the sort."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        hash_fraction(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    num_shards: int = 64,
    salt: str = "pack",
) -> DataFrame:
    """Contiguous sequence packing: assign each document to a training pack
    of at most ~*budget* tokens.

    Documents are scattered deterministically into *num_shards* shards
    (content hash — reproducible like everything here), ordered by id
    within the shard, and cut into packs wherever the running token total
    crosses a budget multiple.  Output adds ``shard``, ``pack_id`` (unique
    across shards) and ``pack_offset`` (tokens before this doc in its
    pack).  Documents longer than the budget get a pack of their own.

    Scale shape: ONE window per shard (partitionBy shard) — the global
    sort a naive packing needs would serialize 100 TB through one
    partition; sharding bounds each window to corpus/num_shards and packs
    never span shards, so shards = units of parallelism for both packing
    and downstream pack assembly."""
    shard = F.pmod(
        md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(num_shards),
    )
    from pyspark.sql import Window

    out = df.withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(F.col(token_col)).over(w)
    before = (cum - F.col(token_col)).cast("long")
    local_pack = F.floor(before / F.lit(budget)).cast("long")
    return (
        out.withColumn("__before", before)
        .withColumn("pack_id", F.col("shard") * 1_000_000 + local_pack)
        .withColumn(
            "pack_offset", (F.col("__before") - local_pack * F.lit(budget)).cast("long")
        )
        .drop("__before")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Context-window chunking: split each document into overlapping
    fixed-token windows (stride < chunk_tokens ⇒ chunk_tokens - stride
    tokens of overlap) — the standard prep for embedding models and
    fixed-context pretraining.  Emits (id, chunk_id, chunk_n_tokens,
    chunk_text); the whole op is per-row array codegen (tokenize →
    sequence of starts → slice/join), so it is shuffle-free and scales as
    a narrow map over the corpus: the fan-out multiplies rows by
    ~n_tokens/stride but each output row is bounded by chunk_tokens."""
    words = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n = F.size(words)
    # last start = stride * floor((n-1)/stride), so starts cover every token
    starts = F.sequence(
        F.lit(0), F.lit(stride) * F.floor((n - 1) / stride), F.lit(stride)
    )
    chunks = F.transform(
        starts, lambda s: F.slice(words, s + 1, chunk_tokens)
    )
    # posexplode_OUTER + null-text scan filter: plain posexplode triggers
    # InferFiltersFromGenerate, which re-evaluates the whole chunk
    # expression twice in a pre-filter; with null texts dropped at the
    # scan, outer ≡ inner for any input
    exploded = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.posexplode_outer(chunks).alias("chunk_id", "chunk_words")
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.size("chunk_words").alias("chunk_n_tokens"),
        F.array_join("chunk_words", " ").alias("chunk_text"),
    )


def token_budget_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    token_count_col: Column,
    budget: int,
    salt: str = "budget",
) -> DataFrame:
    """Corpus mixing by token budget: keep documents per key (source /
    domain / language) — in deterministic content-hash order — while the
    key's cumulative token count stays within *budget*.  The token-weighted
    complement of ``cap_per_key`` (which caps rows): data-mixture recipes
    are specified in tokens, not documents.

    One window per key (cumulative sum over the hash order), same scale
    shape as cap_per_key; membership is a pure function of (salt, ids,
    token counts), so re-runs and repartitions keep identical mixtures."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy(key_col)
        .orderBy(hash_fraction(F.col(id_col), salt), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn("n_tokens", token_count_col)
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
    )
