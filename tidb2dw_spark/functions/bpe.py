"""Distributed BPE (byte-pair-encoding) merge training — the tokenizer-
vocabulary builder a training-data pipeline runs over its corpus
(Sennrich et al., *Neural Machine Translation of Rare Words with Subword
Units*, ACL'16).

Shape: ONE corpus pass builds the weighted distinct-word table (the only
thing that ever touches the documents), then each merge step runs on
that vocabulary table alone — pair counting is a partial-aggregated
groupBy carrying (pair, count) rows, and re-segmentation is pure window
logic over (word, pos, sym).  At 100 TB the corpus pass dominates and
every merge step costs O(vocab), not O(corpus).

Determinism (and hence an exact SQL oracle): the winning pair is chosen
by (weighted count DESC, left ASC, right ASC) — byte-order string
comparison in both engines — and greedy left-to-right non-overlapping
application is POSITIONAL, not sequential:

- for a pair (a, b) with a ≠ b, occurrences can never overlap (an
  overlap at adjacent positions would force a = b), so ALL occurrences
  merge;
- for (a, a), occurrences inside a run of k a's overlap pairwise; greedy
  left-to-right keeps exactly the even offsets within each run
  (floor(k/2) merges), which a gaps-and-islands window computes.

So every step is expressible with lead/row_number windows — no UDF, no
recursion — and oracle_sql.bpe_merges_oracle unrolls the identical
computation; a pure-Python twin is pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

END_SYM = "</w>"


def _tokens(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt): the one corpus-wide pass."""
    return (
        docs.select(F.explode(_tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def initial_segmentation(words: DataFrame) -> DataFrame:
    """(word, cnt, pos, sym): characters plus a terminal '</w>' symbol."""
    syms = F.concat(
        F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))"),
        F.array(F.lit(END_SYM)),
    )
    return words.select(
        "word", "cnt", F.posexplode(syms).alias("pos", "sym")
    )


def top_pair(seg: DataFrame) -> tuple[str, str, int] | None:
    """The winning adjacent pair: (weighted count DESC, left ASC, right
    ASC).  One groupBy over the vocabulary table; the single winning row
    collects to the driver (metadata-sized, like a centroid)."""
    w = Window.partitionBy("word").orderBy("pos")
    pairs = (
        seg.withColumn("nxt", F.lead("sym").over(w))
        .filter(F.col("nxt").isNotNull())
        .groupBy("sym", "nxt")
        .agg(F.sum("cnt").alias("n"))
        .orderBy(F.desc("n"), F.asc("sym"), F.asc("nxt"))
        .limit(1)
        .collect()
    )
    if not pairs:
        return None
    r = pairs[0]
    return (r["sym"], r["nxt"], r["n"])


def merge_pair(seg: DataFrame, a: str, b: str) -> DataFrame:
    """Apply one merge greedily left-to-right via window logic (see module
    docstring for why this is positional, not sequential)."""
    w = Window.partitionBy("word").orderBy("pos")
    s = seg.withColumn("nxt", F.lead("sym").over(w)).withColumn(
        "occ", (F.col("sym") == a) & (F.col("nxt") == b)
    )
    if a == b:
        # gaps-and-islands over consecutive sym == a runs; keep even offsets
        is_a = (F.col("sym") == a).cast("int")
        rn_a = F.sum(is_a).over(w.rowsBetween(Window.unboundedPreceding, 0))
        s = s.withColumn("grp", F.when(F.col("sym") == a, F.col("pos") - rn_a))
        off = F.col("pos") - F.min("pos").over(Window.partitionBy("word", "grp"))
        s = s.withColumn("sel", F.col("occ") & (off % 2 == 0))
    else:
        s = s.withColumn("sel", F.col("occ"))
    s = s.withColumn("absorbed", F.coalesce(F.lag("sel").over(w), F.lit(False)))
    out = (
        s.filter(~F.col("absorbed"))
        .select(
            "word",
            "cnt",
            "pos",
            F.when(F.col("sel"), F.lit(a + b)).otherwise(F.col("sym")).alias("sym"),
        )
        .withColumn("pos", F.row_number().over(w) - 1)
    )
    return out


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Train *n_merges* BPE merges; returns (merge list [(left, right,
    weighted_count)], final segmentation frame).  Each step persists the
    (small) vocabulary segmentation so the next step starts from
    materialized rows instead of an ever-deeper window lineage."""
    seg = initial_segmentation(word_counts(docs, text_col)).persist()
    prev: DataFrame | None = None
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            # ONE action per step: top_pair materializes the persisted seg,
            # after which its parent can be released (unpersisting earlier
            # would force a full-lineage recompute)
            best = top_pair(seg)
            if prev is not None:
                prev.unpersist()
                prev = None
            if best is None or best[2] < 1:
                break
            a, b, n = best
            merges.append((a, b, n))
            prev, seg = seg, merge_pair(seg, a, b).persist()
        if prev is not None:
            seg.count()  # materialize the final segmentation
            prev.unpersist()
        return merges, seg
    except Exception:
        seg.unpersist()
        raise


def bpe_merges_df(spark: SparkSession, merges: list[tuple[str, str, int]]) -> DataFrame:
    rows = [
        (i, a, b, a + b, int(n)) for i, (a, b, n) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "step int, lhs string, rhs string, merged string, pair_count long"
    )


def bpe_token_counts(
    docs: DataFrame,
    seg: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize the corpus with a trained segmentation: (doc_id, n_words,
    n_subword_tokens).  The per-word symbol count is vocabulary-sized, so
    the join broadcasts it against one corpus pass — the same shape as
    every other per-doc text feature."""
    wtok = seg.groupBy("word").agg(F.count("*").alias("n_sym"))
    words = docs.select(
        F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("word")
    )
    return (
        words.join(F.broadcast(wtok), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_subword_tokens"),
        )
    )


# -- pure-Python twin (test oracle) -----------------------------------------
def bpe_train_py(
    texts: list[str], n_merges: int = 8
) -> list[tuple[str, str, int]]:
    """Reference implementation: same tokenization, same tie order, same
    greedy left-to-right merge."""
    counts: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            counts[w] = counts.get(w, 0) + 1
    seg = {w: list(w) + [END_SYM] for w in counts}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        for w, syms in seg.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + counts[w]
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b, n))
        for w, syms in seg.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seg[w] = out
    return merges
