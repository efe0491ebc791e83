"""DuckDB oracle SQL builders for the functions layer.

Generated from the SAME Python constants as the Spark implementations
(stopword lists, minhash coefficients, token regexes), so the two sides
cannot drift.  Cross-engine-deterministic building blocks (verified by
probe + test suite):

- md5-hex-substring → int:  Spark ``conv(substr(md5(x),1,k),16,10)`` ≡
  DuckDB ``('0x'||substr(md5(x),1,k))::BIGINT``
- whitespace tokens:  ``split(trim(lower(x)),'\\s+')`` ≡
  ``string_split_regex(trim(lower(x)),'\\s+')``
- integer-quantized vector math (round(x*1e6) as BIGINT) — order-
  independent exact arithmetic where float accumulation would diverge
- single-op double arithmetic (ratios, sqrt, division) — IEEE-identical

NOTE: DuckDB's lambda arrow ``->`` misparses a ``>>`` inside the body, so
bit tests use ``(h // 2^b) % 2`` instead of shifts.
"""

from __future__ import annotations

from .dedup import MINHASH_PRIME, SIMHASH_BITS, minhash_coeffs
from .text import LANG_STOPWORDS, PUNCT_REGEX, TOKEN_REGEX

# -- fragments --------------------------------------------------------------

def sql_tokens(col: str) -> str:
    return f"string_split_regex(trim(lower({col})), '\\s+')"


def sql_md5_long(expr: str, hex_digits: int) -> str:
    return f"('0x'||substr(md5({expr}),1,{hex_digits}))::BIGINT"


def sql_token_count(col: str) -> str:
    return f"CASE WHEN length(trim({col})) = 0 THEN 0 ELSE len({sql_tokens(col)}) END"


def sql_shingles(words: str, n: int) -> str:
    """Distinct word n-grams (whole text if shorter than n words)."""
    return (
        f"list_distinct([array_to_string({words}[i:i+{n - 1}], ' ') "
        f"for i in range(1, greatest(len({words})-{n}, 0)+2)])"
    )


def sql_stopword_hits(words: str, stopwords: list[str]) -> str:
    arr = "[" + ", ".join(f"'{w}'" for w in stopwords) + "]"
    return f"len(list_filter({words}, w -> list_contains({arr}, w)))"


def sql_lang_id(words: str) -> str:
    """Mirror of text.lang_id: first lang in priority order whose hit count
    ≥ max(1, every lower-priority lang's hits)."""
    langs = list(LANG_STOPWORDS)
    hits = {lg: sql_stopword_hits(words, LANG_STOPWORDS[lg]) for lg in langs}
    cases = []
    for i, lg in enumerate(langs):
        rest = [hits[o] for o in langs[i + 1:]]
        bound = f"greatest(1, {', '.join(rest)})" if rest else "1"
        cases.append(f"WHEN {hits[lg]} >= {bound} THEN '{lg}'")
    return "CASE " + " ".join(cases) + " ELSE 'und' END"


def sql_minhash_array(hashes: str, num_hashes: int) -> str:
    exprs = ", ".join(
        f"list_min(list_transform({hashes}, h -> ({a}*h + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_coeffs(num_hashes)
    )
    return f"[{exprs}]"


def sql_simhash(word_hashes: str) -> str:
    """Mirror of dedup.simhash over a 32-bit word-hash list column."""
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform({word_hashes}, "
        f"v -> CASE WHEN (v // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"({bits})::BIGINT"


def sql_quantized(vec: str, scale: int = 1_000_000) -> str:
    return (
        f"[(round(CAST({vec}[i] AS DOUBLE)*{scale}))::BIGINT "
        f"for i in range(1, len({vec})+1)]"
    )


def sql_int_dot(qa: str, qb: str) -> str:
    return f"list_sum([{qa}[i]*{qb}[i] for i in range(1, len({qa})+1)])"


def sql_qcos(qa: str, qb: str) -> str:
    """Quantized cosine: int dots (exact) + single-op double sqrt/div."""
    return (
        f"CAST({sql_int_dot(qa, qb)} AS DOUBLE) / "
        f"(sqrt(CAST({sql_int_dot(qa, qa)} AS DOUBLE)) * "
        f"sqrt(CAST({sql_int_dot(qb, qb)} AS DOUBLE)))"
    )


# -- whole-query oracles ----------------------------------------------------

TEXT_FEATURES_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {sql_tokens("text")} AS words FROM documents
)
SELECT doc_id,
       length(text) AS n_chars,
       {sql_token_count("text")} AS n_tokens,
       len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS n_bpe_tokens,
       md5(array_to_string(words, ' ')) AS fingerprint,
       {sql_lang_id("words")} AS lang_pred
FROM base
"""

QUALITY_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text, {sql_tokens("text")} AS words FROM documents
), feats AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {sql_token_count("text")} AS n_tokens,
         len(regexp_extract_all(text, '{PUNCT_REGEX}')) AS n_punct,
         {sql_stopword_hits("words", LANG_STOPWORDS["en"])} AS n_stop
  FROM base
)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens > 0 THEN CAST(n_chars AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
       CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
       (CAST(0.4 AS DOUBLE) * (CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 THEN 1.0 ELSE 0.0 END)
        + CAST(0.3 AS DOUBLE) * least(CAST(1.0 AS DOUBLE), (CASE WHEN n_tokens > 0 THEN CAST(n_stop AS DOUBLE)/CAST(n_tokens AS DOUBLE) ELSE 0.0 END) * CAST(4.0 AS DOUBLE))
        + CAST(0.3 AS DOUBLE) * (CAST(1.0 AS DOUBLE) - least(CAST(1.0 AS DOUBLE), (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/CAST(n_chars AS DOUBLE) ELSE 0.0 END) * CAST(10.0 AS DOUBLE)))
       ) AS quality_score
FROM feats
"""

EXACT_DEDUP_ORACLE = f"""
WITH base AS (
  SELECT doc_id, md5(array_to_string({sql_tokens("text")}, ' ')) AS fp FROM documents
)
SELECT fp, min(doc_id) AS keep_id, count(*) AS n_copies FROM base GROUP BY fp
"""


INCREMENTAL_DEDUP_ORACLE = f"""
WITH fp AS (
  SELECT doc_id, md5(array_to_string({sql_tokens("text")}, ' ')) AS fp
  FROM documents
),
b1 AS (SELECT * FROM fp WHERE doc_id % 2 = 0),
b2 AS (SELECT * FROM fp WHERE doc_id % 2 = 1),
s1 AS (SELECT min(doc_id) AS doc_id FROM b1 GROUP BY fp),
s2 AS (
  SELECT min(doc_id) AS doc_id FROM b2 b
  WHERE NOT EXISTS (SELECT 1 FROM b1 WHERE b1.fp = b.fp)
  GROUP BY b.fp
)
SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
"""


def minhash_signature_oracle(num_hashes: int, shingle_n: int) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {sql_tokens("text")} AS words FROM documents
), sh AS (
  SELECT doc_id, {sql_shingles("words", shingle_n)} AS shingles FROM base
), h AS (
  SELECT doc_id, list_transform(shingles, s -> {sql_md5_long("s", 7)}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {sql_minhash_array("hs", num_hashes)} AS sig FROM h
)
SELECT doc_id, generate_subscripts(sig, 1) - 1 AS hash_idx, unnest(sig) AS minhash
FROM sig
"""


SIMHASH_ORACLE = f"""
WITH base AS (
  SELECT doc_id, list_distinct({sql_tokens("text")}) AS words FROM documents
), h AS (
  SELECT doc_id, list_transform(words, w -> {sql_md5_long("w", 8)}) AS hs FROM base
)
SELECT doc_id, {sql_simhash("hs")} AS simhash FROM h
"""


def minhash_lsh_pairs_oracle(
    num_hashes: int, bands: int, shingle_n: int, threshold: float
) -> str:
    rows = num_hashes // bands
    return f"""
WITH base AS (
  SELECT doc_id, {sql_tokens("text")} AS words FROM documents
), sh AS (
  SELECT doc_id, {sql_shingles("words", shingle_n)} AS shingles FROM base
), h AS (
  SELECT doc_id, shingles, list_transform(shingles, s -> {sql_md5_long("s", 7)}) AS hs FROM sh
), sig AS (
  SELECT doc_id, shingles, {sql_minhash_array("hs", num_hashes)} AS sig FROM h
), banded AS (
  SELECT doc_id, shingles, b,
         md5(array_to_string(sig[b*{rows}+1:(b+1)*{rows}], ',')) AS key
  FROM sig, range(0, {bands}) r(b)
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id
), verified AS (
  SELECT c.id_a, c.id_b,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
         CAST(len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           AS jaccard
  FROM cand c
  JOIN sh a ON a.doc_id = c.id_a
  JOIN sh b ON b.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


def topk_sqeuclid_oracle(query_mod: int, k: int) -> str:
    """Exact squared-euclidean top-k (the metric ADC approximates):
    integer distances, ties to the lower neighbor — ids only, matching
    the recall-eval join sides."""
    return f"""
WITH c AS (
  SELECT vec_id AS neighbor_id, {sql_quantized("embedding")} AS cv FROM embeddings
), q AS (
  SELECT vec_id AS query_id, {sql_quantized("embedding")} AS qv
  FROM embeddings WHERE vec_id % {query_mod} = 0
), scored AS (
  SELECT q.query_id, c.neighbor_id,
         CAST(list_sum([(c.cv[i]-q.qv[i])*(c.cv[i]-q.qv[i])
                        for i in range(1, len(q.qv)+1)]) AS BIGINT) AS dist
  FROM q CROSS JOIN c WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist ASC, neighbor_id ASC) AS rank
  FROM scored) __t WHERE rank <= {k}
"""


def incremental_minhash_oracle(
    num_hashes: int, bands: int, shingle_n: int, min_match: int
) -> str:
    """Oracle for the two-phase incremental near-dup entry: phase 1
    stages the even-id docs (pairs among evens), phase 2 stages the odds
    against the store (pairs with ≥1 odd member) — which together are
    exactly the full banded candidate set, tagged by parity.  The verify
    is the signature-match count (integer, same estimator both sides)."""
    rows = num_hashes // bands
    return f"""
WITH base AS (
  SELECT doc_id, {sql_tokens("text")} AS words FROM documents
), sh AS (
  SELECT doc_id, {sql_shingles("words", shingle_n)} AS shingles FROM base
), h AS (
  SELECT doc_id, list_transform(shingles, s -> {sql_md5_long("s", 7)}) AS hs FROM sh
), sig AS (
  SELECT doc_id, {sql_minhash_array("hs", num_hashes)} AS sig FROM h
), banded AS (
  SELECT doc_id, b,
         md5(array_to_string(sig[b*{rows}+1:(b+1)*{rows}], ',')) AS key
  FROM sig, range(0, {bands}) r(b)
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
  FROM banded l JOIN banded r ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id
), verified AS (
  SELECT c.id_a, c.id_b,
         len([1 for i in range(1, {num_hashes}+1) if a.sig[i] = b.sig[i]])
           AS n_sig_matches
  FROM cand c
  JOIN sig a ON a.doc_id = c.id_a
  JOIN sig b ON b.doc_id = c.id_b
)
SELECT CASE WHEN id_a % 2 = 0 AND id_b % 2 = 0 THEN 1 ELSE 2 END AS phase,
       id_a, id_b, n_sig_matches
FROM verified WHERE n_sig_matches >= {min_match}
"""


def simhash_pairs_oracle(max_hamming: int) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, list_distinct({sql_tokens("text")}) AS words FROM documents
), h AS (
  SELECT doc_id, list_transform(words, w -> {sql_md5_long("w", 8)}) AS hs FROM base
), sims AS (
  SELECT doc_id, {sql_simhash("hs")} AS sh FROM h
), blocked AS (
  SELECT doc_id, sh, blk, (sh // power(256, blk)::BIGINT) % 256 AS key
  FROM sims, range(0, 4) r(blk)
), cand AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b, l.sh AS sh_a, r.sh AS sh_b
  FROM blocked l JOIN blocked r ON l.blk = r.blk AND l.key = r.key AND l.doc_id < r.doc_id
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_hamming}
"""


def ngram_jaccard_pairs_oracle(block_col: str, n: int, threshold: float) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, {block_col} AS block, {sql_shingles(sql_tokens("text"), n)} AS sh
  FROM documents
)
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
       CAST(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS DOUBLE) AS jaccard
FROM base l JOIN base r ON l.block = r.block AND l.doc_id < r.doc_id
WHERE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) /
      CAST(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS DOUBLE) >= {threshold}
"""


def contamination_oracle(eval_mod: int, n: int) -> str:
    """Train docs sharing any word n-gram with the eval slice
    (doc_id % eval_mod = 0), with shared-distinct-gram counts."""
    return f"""
WITH base AS (
  SELECT doc_id, {sql_shingles(sql_tokens("text"), n)} AS sh FROM documents
), ev AS (
  SELECT DISTINCT {sql_md5_long("g", 15)} AS gh
  FROM (SELECT unnest(sh) AS g FROM base WHERE doc_id % {eval_mod} = 0)
), tr AS (
  SELECT doc_id, {sql_md5_long("g", 15)} AS gh
  FROM (SELECT doc_id, unnest(sh) AS g FROM base WHERE doc_id % {eval_mod} <> 0)
)
SELECT tr.doc_id, count(DISTINCT tr.gh) AS n_shared_grams
FROM tr JOIN ev USING (gh)
GROUP BY tr.doc_id
"""


def dup_ngram_stats_oracle(n: int) -> str:
    """Per-doc counts of distinct word n-grams shared with other docs."""
    return f"""
WITH base AS (
  SELECT doc_id, {sql_shingles(sql_tokens("text"), n)} AS sh FROM documents
), g AS (
  SELECT doc_id, {sql_md5_long("u", 15)} AS gh
  FROM (SELECT doc_id, unnest(sh) AS u FROM base)
), f AS (
  SELECT gh, count(*) AS gram_docs FROM g GROUP BY gh
)
SELECT doc_id, count(*) AS n_grams,
       CAST(sum(CASE WHEN gram_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams
FROM g JOIN f USING (gh)
GROUP BY doc_id
"""


def _kmeans_ctes(k: int, iters: int, source: str = "embeddings") -> str:
    """The unrolled integer-Lloyd CTE chain shared by
    :func:`kmeans_oracle` and :func:`semantic_dedup_oracle`: ``pts``
    (exploded quantized vectors), ``c0``..``c{iters}`` (centroid stages),
    ``a0``..``a{iters}`` (assignments; ``a{iters}`` is the final one).
    Returns the full ``WITH ...`` prefix ending at ``a{iters}`` so
    callers append their own CTEs with a leading comma.  *source* is the
    relation the fit runs over (a table name or parenthesized subquery —
    the incremental oracle fits on the SEED batch only)."""
    q = """
WITH pts AS (
  SELECT vec_id AS id, e['p'] AS pos, e['x'] AS x FROM (
    SELECT vec_id,
           unnest([{'p': i-1,
                    'x': (round(CAST(embedding[i] AS DOUBLE)*1000000))::BIGINT}
                   for i in range(1, len(embedding)+1)]) AS e
    FROM __SRC__ __s) __u
),
c0 AS (
  SELECT s.rn - 1 AS cluster, p.pos, p.x AS v
  FROM (SELECT vec_id AS id, row_number() OVER (ORDER BY vec_id) AS rn
        FROM __SRC__ __s2 ORDER BY vec_id LIMIT __K__) s
  JOIN pts p ON p.id = s.id
)""".replace("__SRC__", source)
    for t in range(iters + 1):  # one extra assignment for member counts
        q += f""",
n{t} AS (SELECT cluster, CAST(SUM(v*v) AS BIGINT) AS nn FROM c{t} GROUP BY cluster),
a{t} AS (
  SELECT id, cluster FROM (
    SELECT p.id, c.cluster,
           row_number() OVER (
             PARTITION BY p.id
             ORDER BY (2*SUM(p.x*c.v) - MIN(n.nn)) DESC, c.cluster ASC) AS rk
    FROM pts p JOIN c{t} c ON c.pos = p.pos JOIN n{t} n ON n.cluster = c.cluster
    GROUP BY p.id, c.cluster
  ) __r WHERE rk = 1
)"""
        if t < iters:
            q += f""",
u{t} AS (
  SELECT a.cluster, p.pos, CAST(SUM(p.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{t} a JOIN pts p ON p.id = a.id GROUP BY a.cluster, p.pos
),
c{t + 1} AS (
  SELECT c.cluster, c.pos,
         CASE WHEN u.n IS NULL THEN c.v
              ELSE (2*u.s + u.n
                    - ((((2*u.s + u.n) % (2*u.n)) + 2*u.n) % (2*u.n))) // (2*u.n)
         END AS v
  FROM c{t} c LEFT JOIN u{t} u ON u.cluster = c.cluster AND u.pos = c.pos
)"""
    return q.replace("__K__", str(k))


def kmeans_oracle(k: int, iters: int) -> str:
    """Exact oracle for integer-Lloyd k-means (functions/clustering.py):
    the iteration count is a compile-time constant, so the "iterative
    algorithm" unrolls into *iters* chained CTE stages — init = the k
    smallest-id quantized vectors, each stage = argmin assignment
    (score 2·x·c − ‖c‖², ties to the lower cluster) + half-up integer
    centroid update floor((2s+n)/(2n)) with empty clusters keeping their
    previous centroid, then a final assignment for member counts.  All
    arithmetic stays on exact BIGINTs (posmod-based floor division), so
    the result is bit-identical to the Spark/driver implementation."""
    return f"""{_kmeans_ctes(k, iters)}
SELECT CAST(c.cluster AS INT) AS cluster, CAST(c.pos AS INT) AS pos,
       CAST(c.v AS BIGINT) AS centroid_q, CAST(COALESCE(fn.n, 0) AS INT) AS cluster_n
FROM c{iters} c
LEFT JOIN (SELECT cluster, COUNT(*) AS n FROM a{iters} GROUP BY cluster) fn
  ON fn.cluster = c.cluster
"""


def semantic_dedup_oracle(k: int, iters: int, threshold: float) -> str:
    """Mirror of clustering.semantic_dedup (SemDeDup, arXiv:2303.09540):
    reuses the exact unrolled k-means chain for clusters and centroids,
    computes each member's centroid similarity (exact integer dots, the
    same single IEEE sqrt/divide as the Spark side), and drops member x
    iff an EARLIER member y of its cluster — earlier in (csim, id) tuple
    order, i.e. closer to the paper's low-redundancy survivor — has
    quantized cosine ≥ *threshold*.  Every float compared here is built
    from exact BIGINT dots by one IEEE op each, so the verdicts are
    bit-identical across engines."""
    return f"""{_kmeans_ctes(k, iters)},
cvec AS (
  SELECT cluster, list(v ORDER BY pos) AS cv, CAST(SUM(v*v) AS BIGINT) AS nn
  FROM c{iters} GROUP BY cluster
),
qvs AS (SELECT vec_id AS id, {sql_quantized("embedding")} AS q FROM embeddings),
mem AS (
  SELECT qvs.id, a.cluster, qvs.q,
         CAST({sql_int_dot("qvs.q", "cv.cv")} AS DOUBLE) /
         (sqrt(CAST({sql_int_dot("qvs.q", "qvs.q")} AS DOUBLE)) *
          sqrt(CAST(cv.nn AS DOUBLE))) AS csim
  FROM qvs
  JOIN a{iters} a ON a.id = qvs.id
  JOIN cvec cv ON cv.cluster = a.cluster
),
dropped AS (
  SELECT r.id
  FROM mem l JOIN mem r
    ON l.cluster = r.cluster
   AND (l.csim < r.csim OR (l.csim = r.csim AND l.id < r.id))
  WHERE {sql_qcos("l.q", "r.q")} >= {threshold}
  GROUP BY r.id
)
SELECT m.id AS vec_id, CAST(m.cluster AS INT) AS cluster, m.csim,
       (d.id IS NULL) AS kept
FROM mem m LEFT JOIN dropped d ON d.id = m.id
"""


def incremental_semdedup_oracle(
    k: int, iters: int, threshold: float, split_mod: int = 2
) -> str:
    """Mirror of clustering.IncrementalSemDedup driven by the driver
    row's deterministic split (seed = vec_id % *split_mod* == 0, one
    incremental batch = the rest): the k-means chain fits on the SEED
    subset only (frozen centroids), every row is assigned/scored against
    those centroids, phase-0 decisions follow the one-shot rule, and a
    phase-1 member is dropped iff a PHASE-0 SURVIVOR of its cluster or
    an earlier (csim, id) phase-1 member reaches the cosine threshold —
    the store-then-batch precedence the incremental operator pins."""
    src = f"(SELECT * FROM embeddings WHERE vec_id % {split_mod} = 0)"
    return f"""{_kmeans_ctes(k, iters, source=src)},
cvec AS (
  SELECT cluster, list(v ORDER BY pos) AS cv, CAST(SUM(v*v) AS BIGINT) AS nn
  FROM c{iters} GROUP BY cluster
),
qall AS (SELECT vec_id AS id, {sql_quantized("embedding")} AS q,
                CAST(CASE WHEN vec_id % {split_mod} = 0 THEN 0 ELSE 1 END
                     AS INT) AS phase
         FROM embeddings),
asg AS (
  SELECT id, cluster FROM (
    SELECT qall.id, cv.cluster,
           row_number() OVER (
             PARTITION BY qall.id
             ORDER BY (2*{sql_int_dot("qall.q", "cv.cv")} - cv.nn) DESC,
                      cv.cluster ASC) AS rk
    FROM qall CROSS JOIN cvec cv
  ) __r WHERE rk = 1
),
mem AS (
  SELECT qall.id, qall.phase, asg.cluster, qall.q,
         CAST({sql_int_dot("qall.q", "cv.cv")} AS DOUBLE) /
         (sqrt(CAST({sql_int_dot("qall.q", "qall.q")} AS DOUBLE)) *
          sqrt(CAST(cv.nn AS DOUBLE))) AS csim
  FROM qall JOIN asg ON asg.id = qall.id
  JOIN cvec cv ON cv.cluster = asg.cluster
),
drop0 AS (
  SELECT r.id FROM mem l JOIN mem r
    ON l.cluster = r.cluster AND l.phase = 0 AND r.phase = 0
   AND (l.csim < r.csim OR (l.csim = r.csim AND l.id < r.id))
  WHERE {sql_qcos("l.q", "r.q")} >= {threshold}
  GROUP BY r.id
),
prior AS (
  SELECT m.id, m.cluster, m.csim, m.q, TRUE AS st
  FROM mem m LEFT JOIN drop0 d ON d.id = m.id
  WHERE m.phase = 0 AND d.id IS NULL
  UNION ALL
  SELECT id, cluster, csim, q, FALSE FROM mem WHERE phase = 1
),
drop1 AS (
  SELECT r.id FROM prior l JOIN mem r
    ON l.cluster = r.cluster AND r.phase = 1 AND l.id <> r.id
   AND (l.st OR l.csim < r.csim OR (l.csim = r.csim AND l.id < r.id))
  WHERE {sql_qcos("l.q", "r.q")} >= {threshold}
  GROUP BY r.id
)
SELECT m.id AS vec_id, CAST(m.cluster AS INT) AS cluster, m.csim,
       CAST(m.phase AS INT) AS phase,
       (CASE WHEN m.phase = 0 THEN d0.id IS NULL
             ELSE d1.id IS NULL END) AS kept
FROM mem m
LEFT JOIN drop0 d0 ON d0.id = m.id
LEFT JOIN drop1 d1 ON d1.id = m.id
"""


def _pq_lloyd_chain(iters: int) -> str:
    """The unrolled integer-Lloyd CTE chain, parameter-free: expects CTEs
    ``pts`` (id, sub, pos, x) and ``c0`` (sub, code, pos, v) to be already
    defined, and emits ``,n0,a0,u0,c1,…`` ending with a{iters} = every
    id's code per subspace.  Shared by raw-vector PQ (pts = quantized
    embeddings) and residual IVF-PQ (pts = x − coarse-centroid)."""
    q = ""
    for t in range(iters + 1):  # one extra assignment = the final codes
        q += f""",
n{t} AS (SELECT sub, code, CAST(SUM(v*v) AS BIGINT) AS nn
         FROM c{t} GROUP BY sub, code),
a{t} AS (
  SELECT id, sub, code FROM (
    SELECT p.id, c.sub, c.code,
           row_number() OVER (
             PARTITION BY p.id, c.sub
             ORDER BY (2*SUM(p.x*c.v) - MIN(n.nn)) DESC, c.code ASC) AS rk
    FROM pts p
    JOIN c{t} c ON c.sub = p.sub AND c.pos = p.pos
    JOIN n{t} n ON n.sub = c.sub AND n.code = c.code
    GROUP BY p.id, c.sub, c.code
  ) __r WHERE rk = 1
)"""
        if t < iters:
            q += f""",
u{t} AS (
  SELECT a.sub, a.code, p.pos, CAST(SUM(p.x) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{t} a JOIN pts p ON p.id = a.id AND p.sub = a.sub
  GROUP BY a.sub, a.code, p.pos
),
c{t + 1} AS (
  SELECT c.sub, c.code, c.pos,
         CASE WHEN u.n IS NULL THEN c.v
              ELSE (2*u.s + u.n
                    - ((((2*u.s + u.n) % (2*u.n)) + 2*u.n) % (2*u.n))) // (2*u.n)
         END AS v
  FROM c{t} c
  LEFT JOIN u{t} u ON u.sub = c.sub AND u.code = c.code AND u.pos = c.pos
)"""
    return q


def _pq_training_ctes(n_sub: int, k: int, iters: int, dim: int) -> str:
    """Raw-vector PQ prelude + Lloyd chain: pts = the quantized corpus
    split by subspace, c0 = the k smallest-id vectors' subvectors."""
    d0 = dim // n_sub
    return (
        f"""
WITH pts AS (
  SELECT vec_id AS id, (e['p'] // {d0}) AS sub, (e['p'] % {d0}) AS pos,
         e['x'] AS x FROM (
    SELECT vec_id,
           unnest([{{'p': i-1,
                    'x': (round(CAST(embedding[i] AS DOUBLE)*1000000))::BIGINT}}
                   for i in range(1, len(embedding)+1)]) AS e
    FROM embeddings) __u
),
c0 AS (
  SELECT p.sub, s.rn - 1 AS code, p.pos, p.x AS v
  FROM (SELECT vec_id AS id, row_number() OVER (ORDER BY vec_id) AS rn
        FROM embeddings ORDER BY vec_id LIMIT {k}) s
  JOIN pts p ON p.id = s.id
)"""
        + _pq_lloyd_chain(iters)
    )


def pq_codebooks_oracle(n_sub: int, k: int, iters: int, dim: int) -> str:
    """Exact oracle for PQ codebook training (functions/pq.py:pq_fit):
    final per-subspace centroid matrices plus each code's member count."""
    return (
        _pq_training_ctes(n_sub, k, iters, dim)
        + f"""
SELECT CAST(c.sub AS INT) AS sub, CAST(c.code AS INT) AS code,
       CAST(c.pos AS INT) AS pos, CAST(c.v AS BIGINT) AS centroid_q,
       CAST(COALESCE(fn.n, 0) AS INT) AS code_n
FROM c{iters} c
LEFT JOIN (SELECT sub, code, COUNT(*) AS n FROM a{iters} GROUP BY sub, code) fn
  ON fn.sub = c.sub AND fn.code = c.code
"""
    )


def pq_topk_oracle(
    n_sub: int, k: int, iters: int, dim: int, query_mod: int, topk: int
) -> str:
    """Exact oracle for ADC top-k over PQ codes (functions/pq.py:pq_topk):
    recomputes the training, the per-vector codes, the per-query M×k
    distance LUT, and the gather-sum ranking — all on exact BIGINTs, so
    distances and the (dist asc, neighbor_id asc) order are bit-identical
    to the Spark kernel."""
    return (
        _pq_training_ctes(n_sub, k, iters, dim)
        + f""",
qv AS (SELECT id, sub, pos, x FROM pts WHERE id % {query_mod} = 0),
lut AS (
  SELECT q.id AS qid, c.sub, c.code,
         CAST(SUM((q.x - c.v)*(q.x - c.v)) AS BIGINT) AS d
  FROM qv q JOIN c{iters} c ON c.sub = q.sub AND c.pos = q.pos
  GROUP BY q.id, c.sub, c.code
),
adc AS (
  SELECT l.qid AS query_id, a.id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS dist
  FROM a{iters} a JOIN lut l ON l.sub = a.sub AND l.code = a.code
  WHERE a.id <> l.qid
  GROUP BY l.qid, a.id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS INT)
           AS rank
  FROM adc
) __t WHERE rank <= {topk}
"""
    )


def _ivfpq_prelude(n_centroids: int, k_codes: int, d0: int) -> str:
    """Residual IVF-PQ TRAINING prelude over the (pre-churn) corpus:
    coarse cells, residual points, deterministic codebook init — feeds
    :func:`_pq_lloyd_chain`.  Shared by :func:`ivfpq_topk_oracle` and
    :func:`ivfpq_derived_refresh_oracle` (whose search side runs over a
    CHURNED corpus against these frozen parameters)."""
    return f"""
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         {sql_quantized("embedding")} AS qc
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
), cvec AS (
  SELECT vec_id AS id, {sql_quantized("embedding")} AS cv FROM embeddings
), assign AS (
  SELECT id, cv, cell, qc FROM (
    SELECT c.id, c.cv, cent.cell, cent.qc,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {sql_cell_rank("cv", "qc")} DESC, cent.cell ASC) AS rn
    FROM cvec c CROSS JOIN cent) __a WHERE rn = 1
), pts AS (
  SELECT id, (e['p'] // {d0}) AS sub, (e['p'] % {d0}) AS pos, e['x'] AS x
  FROM (
    SELECT id, unnest([{{'p': i-1, 'x': cv[i] - qc[i]}}
                       for i in range(1, len(cv)+1)]) AS e
    FROM assign) __r
), c0 AS (
  SELECT p.sub, s.rn - 1 AS code, p.pos, p.x AS v
  FROM (SELECT id, row_number() OVER (ORDER BY id) AS rn
        FROM assign ORDER BY id LIMIT {k_codes}) s
  JOIN pts p ON p.id = s.id
)"""


def ivfpq_topk_oracle(
    n_centroids: int,
    n_sub: int,
    k_codes: int,
    iters: int,
    dim: int,
    query_mod: int,
    topk: int,
    n_probe: int,
) -> str:
    """Exact oracle for RESIDUAL IVF-PQ search (functions/pq.py:
    build_ivfpq_index(residual=True) + ivfpq_index_topk): coarse cells =
    argmax dot/‖c‖ over the n smallest-id vectors (the proven IVF
    assignment SQL), residual points x − centroid[cell] feed the SAME
    unrolled Lloyd chain as the PQ oracles, and search recomputes the
    per-(query, probed-cell) distance LUT and the gather-sum rank — all
    integer except the one IEEE cell-ranking divide already proven
    bit-identical by the IVF rows."""
    d0 = dim // n_sub
    prelude = _ivfpq_prelude(n_centroids, k_codes, d0)
    search = f""",
q0 AS (
  SELECT vec_id AS qid, {sql_quantized("embedding")} AS qv
  FROM embeddings WHERE vec_id % {query_mod} = 0
), qprobe AS (
  SELECT qid, qv, cell, qc FROM (
    SELECT q.qid, q.qv, cent.cell, cent.qc,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cell_rank("qv", "qc")} DESC, cent.cell ASC) AS rn
    FROM q0 q CROSS JOIN cent) __p WHERE rn <= {n_probe}
), qrpts AS (
  SELECT qid, cell, (e['p'] // {d0}) AS sub, (e['p'] % {d0}) AS pos, e['x'] AS x
  FROM (
    SELECT qid, cell, unnest([{{'p': i-1, 'x': qv[i] - qc[i]}}
                              for i in range(1, len(qv)+1)]) AS e
    FROM qprobe) __q
), lut AS (
  SELECT q.qid, q.cell, c.sub, c.code,
         CAST(SUM((q.x - c.v)*(q.x - c.v)) AS BIGINT) AS d
  FROM qrpts q JOIN c{iters} c ON c.sub = q.sub AND c.pos = q.pos
  GROUP BY q.qid, q.cell, c.sub, c.code
), adc AS (
  SELECT l.qid AS query_id, av.id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS dist
  FROM assign av
  JOIN lut l ON l.cell = av.cell
  JOIN a{iters} ac ON ac.id = av.id AND ac.sub = l.sub AND ac.code = l.code
  WHERE av.id <> l.qid
  GROUP BY l.qid, av.id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS INT)
           AS rank
  FROM adc
) __t WHERE rank <= {topk}
"""
    return prelude + _pq_lloyd_chain(iters) + search


def ivfpq_derived_refresh_oracle(
    n_centroids: int,
    n_sub: int,
    k_codes: int,
    iters: int,
    dim: int,
    query_mod: int,
    topk: int,
    n_probe: int,
) -> str:
    """Mirror of entry_training.sim_ivfpq_derived_refresh: centroids AND
    residual codebooks train on the PRE-churn corpus (frozen, like the
    maintained index's), then the same CDC churn as the IVF derived row
    (delete %10==7, negate %10==4, insert reversed %25==3) lands, and
    the ADC search runs over the POST-churn corpus re-assigned and
    re-encoded against the frozen parameters — exactly what
    IvfPqVectorIndex.refresh must leave behind (unchanged rows keep
    their build-time codes, which equal a re-encode because encoding is
    a pure function of vector × frozen params)."""
    d0 = dim // n_sub
    churn_search = f""",
corpus2 AS (
  SELECT vec_id,
         CASE WHEN vec_id % 10 = 4
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 10 <> 7
  UNION ALL
  SELECT vec_id + 100000, list_reverse(embedding)
  FROM embeddings WHERE vec_id % 25 = 3
), cvec2 AS (
  SELECT vec_id AS id, {sql_quantized("embedding")} AS cv FROM corpus2
), assign2 AS (
  SELECT id, cv, cell, qc FROM (
    SELECT c.id, c.cv, cent.cell, cent.qc,
           row_number() OVER (PARTITION BY c.id
                              ORDER BY {sql_cell_rank("cv", "qc")} DESC, cent.cell ASC) AS rn
    FROM cvec2 c CROSS JOIN cent) __a2 WHERE rn = 1
), pts2 AS (
  SELECT id, (e['p'] // {d0}) AS sub, (e['p'] % {d0}) AS pos, e['x'] AS x
  FROM (
    SELECT id, unnest([{{'p': i-1, 'x': cv[i] - qc[i]}}
                       for i in range(1, len(cv)+1)]) AS e
    FROM assign2) __r2
), encn AS (
  SELECT sub, code, CAST(SUM(v*v) AS BIGINT) AS nn
  FROM c{iters} GROUP BY sub, code
), enc AS (
  SELECT id, sub, code FROM (
    SELECT p.id, c.sub, c.code,
           row_number() OVER (
             PARTITION BY p.id, c.sub
             ORDER BY (2*SUM(p.x*c.v) - MIN(n.nn)) DESC, c.code ASC) AS rk
    FROM pts2 p
    JOIN c{iters} c ON c.sub = p.sub AND c.pos = p.pos
    JOIN encn n ON n.sub = c.sub AND n.code = c.code
    GROUP BY p.id, c.sub, c.code
  ) __e WHERE rk = 1
), q0 AS (
  SELECT vec_id AS qid, {sql_quantized("embedding")} AS qv
  FROM corpus2 WHERE vec_id % {query_mod} = 0
), qprobe AS (
  SELECT qid, qv, cell, qc FROM (
    SELECT q.qid, q.qv, cent.cell, cent.qc,
           row_number() OVER (PARTITION BY q.qid
                              ORDER BY {sql_cell_rank("qv", "qc")} DESC, cent.cell ASC) AS rn
    FROM q0 q CROSS JOIN cent) __p WHERE rn <= {n_probe}
), qrpts AS (
  SELECT qid, cell, (e['p'] // {d0}) AS sub, (e['p'] % {d0}) AS pos, e['x'] AS x
  FROM (
    SELECT qid, cell, unnest([{{'p': i-1, 'x': qv[i] - qc[i]}}
                              for i in range(1, len(qv)+1)]) AS e
    FROM qprobe) __q
), lut AS (
  SELECT q.qid, q.cell, c.sub, c.code,
         CAST(SUM((q.x - c.v)*(q.x - c.v)) AS BIGINT) AS d
  FROM qrpts q JOIN c{iters} c ON c.sub = q.sub AND c.pos = q.pos
  GROUP BY q.qid, q.cell, c.sub, c.code
), adc AS (
  SELECT l.qid AS query_id, av.id AS neighbor_id, CAST(SUM(l.d) AS BIGINT) AS dist
  FROM assign2 av
  JOIN lut l ON l.cell = av.cell
  JOIN enc ec ON ec.id = av.id AND ec.sub = l.sub AND ec.code = l.code
  WHERE av.id <> l.qid
  GROUP BY l.qid, av.id
)
SELECT * FROM (
  SELECT query_id, neighbor_id, dist,
         CAST(row_number() OVER (
           PARTITION BY query_id ORDER BY dist ASC, neighbor_id ASC) AS INT)
           AS rank
  FROM adc
) __t WHERE rank <= {topk}
"""
    return (
        _ivfpq_prelude(n_centroids, k_codes, d0)
        + _pq_lloyd_chain(iters)
        + churn_search
    )


def _bpe_chain(n_merges: int) -> str:
    """Shared BPE-training CTE chain (functions/bpe.py parity): the merge
    loop unrolls into *n_merges* chained stages.  Greedy left-to-right
    application is positional (see the bpe module docstring): all
    occurrences merge when left ≠ right, and even offsets within each
    run merge when left = right — both pure window logic, so each stage
    is lead/lag/row_number over the vocabulary table and the winning
    pair is an ORDER BY ... LIMIT 1 sub-CTE.  Ends with m0..m{n-1} (the
    merge table rows) and seg{n_merges} (the trained segmentation)."""
    q = """
WITH words AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                              t -> t <> '')) AS word
    FROM documents) __w
  GROUP BY word
),
seg0 AS MATERIALIZED (
  SELECT word, cnt, e['p'] AS pos, e['s'] AS sym FROM (
    SELECT word, cnt,
           unnest([{'p': i-1, 's': substr(word, i, 1)}
                   for i in range(1, len(word)+1)]
                  || [{'p': len(word), 's': '</w>'}]) AS e
    FROM words) __s
)"""
    for t in range(n_merges):
        q += f""",
m{t} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, CAST(SUM(cnt) AS BIGINT) AS n
  FROM (SELECT word, cnt, pos, sym,
               lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt
        FROM seg{t}) __x
  WHERE nxt IS NOT NULL
  GROUP BY sym, nxt
  ORDER BY n DESC, a ASC, b ASC
  LIMIT 1
),
y{t} AS (
  SELECT word, cnt, pos, sym, a, b,
         (sym = a AND nxt = b) AS occ,
         CASE WHEN sym = a THEN pos - SUM(CASE WHEN sym = a THEN 1 ELSE 0 END)
              OVER (PARTITION BY word ORDER BY pos ROWS UNBOUNDED PRECEDING)
         END AS grp
  FROM (SELECT s.word, s.cnt, s.pos, s.sym,
               lead(s.sym) OVER (PARTITION BY s.word ORDER BY s.pos) AS nxt,
               m.a, m.b
        FROM seg{t} s CROSS JOIN m{t} m) __f
),
z{t} AS (
  SELECT word, cnt, pos, sym, a, b,
         COALESCE(occ AND (CASE WHEN a = b
                  THEN (pos - MIN(pos) OVER (PARTITION BY word, grp)) % 2 = 0
                  ELSE TRUE END), FALSE) AS sel
  FROM y{t}
),
seg{t + 1} AS MATERIALIZED (
  SELECT word, cnt,
         row_number() OVER (PARTITION BY word ORDER BY pos) - 1 AS pos,
         CASE WHEN sel THEN a || b ELSE sym END AS sym
  FROM (SELECT *, COALESCE(lag(sel) OVER (PARTITION BY word ORDER BY pos),
                           FALSE) AS absorbed
        FROM z{t}) __k
  WHERE NOT absorbed
)"""
    return q


def bpe_merges_oracle(n_merges: int) -> str:
    """Exact oracle for BPE training: the trained merge table."""
    return _bpe_chain(n_merges) + "\n" + "\nUNION ALL\n".join(
        f"SELECT {t} AS step, a AS lhs, b AS rhs, a || b AS merged, "
        f"n AS pair_count FROM m{t}"
        for t in range(n_merges)
    )


def bpe_tokenize_oracle(n_merges: int) -> str:
    """Exact oracle for corpus tokenization with the trained vocabulary:
    per-document word and subword-token counts — the trained
    segmentation's per-word symbol count joined back to the corpus."""
    return _bpe_chain(n_merges) + f"""
, wtok AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_sym
  FROM seg{n_merges} GROUP BY word
),
dwords AS (
  SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                    t -> t <> '')) AS word
  FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.n_sym) AS BIGINT) AS n_subword_tokens
FROM dwords d JOIN wtok w USING (word)
GROUP BY doc_id
"""


IMAGE_FEATURES_ORACLE = """
SELECT doc_id,
       CAST(COALESCE(octet_length(encode(text)), 0) AS INT) AS n_bytes,
       CASE WHEN text IS NULL OR length(text) = 0 THEN NULL
            ELSE list_sum([ord(text[i]) for i in range(1, length(text)+1)])
                 / CAST(octet_length(encode(text)) AS DOUBLE)
       END AS mean_byte
FROM documents
"""


def resized_features_oracle(n: int) -> str:
    """Oracle for resize(target bytes = n) → feature extraction: the fake
    resize kernel truncates/zero-pads the UTF-8 byte stream to n bytes, so
    n_bytes is n for every non-null blob and mean_byte sums the first
    min(len, n) bytes over n (zero padding contributes nothing).  Exact
    because the corpus is ASCII (ord == byte value), the byte sum is an
    exact integer in both engines, and the single double divide is IEEE."""
    return f"""
SELECT doc_id,
       CAST(CASE WHEN text IS NULL THEN 0 ELSE {n} END AS INT) AS n_bytes,
       CASE WHEN text IS NULL THEN NULL
            ELSE COALESCE(list_sum(
                   [ord(text[i]) for i in range(1, least(length(text), {n}) + 1)]
                 ), 0) / {n}.0
       END AS mean_byte
FROM documents
"""


IMAGE_PHASH_ORACLE = """
WITH b AS (
  SELECT doc_id,
         [list_sum([ord(text[i]) for i in range(1+blk, length(text)+1, 64)])
          for blk in range(0, 64)] AS blocks,
         list_sum([ord(text[i]) for i in range(1, length(text)+1)]) AS total
  FROM documents
)
SELECT doc_id,
       list_sum([CASE WHEN 64*COALESCE(blocks[blk+1], 0) > total
                      THEN (1::BIGINT << blk) ELSE 0 END
                 for blk in range(0, 63)])::BIGINT AS phash
FROM b
"""


def phash_pairs_oracle(max_hamming: int) -> str:
    """Brute-force phash pair oracle — exact because the Spark side's
    8-block banding is pigeonhole-complete for hamming ≤ 7."""
    return f"""
WITH p AS ({IMAGE_PHASH_ORACLE})
SELECT l.doc_id AS id_a, r.doc_id AS id_b,
       CAST(bit_count(xor(l.phash, r.phash)) AS BIGINT) AS hamming
FROM p l JOIN p r ON l.doc_id < r.doc_id
WHERE bit_count(xor(l.phash, r.phash)) <= {max_hamming}
"""


# width of the PPM fixture: text bytes fill a 4-row RGB strip
_PPM_W = "greatest((length(text) + 11) // 12, 1)"


def _ppm_channel_sum(channel: int) -> str:
    """Sum of the fixture-PPM channel *channel* = every 3rd text byte
    starting at 1-based offset channel+1 (zero padding contributes 0)."""
    return (
        f"CAST(COALESCE(list_sum([ord(text[i]) "
        f"for i in range({channel + 1}, length(text) + 1, 3)]), 0) AS BIGINT)"
    )


PPM_DECODE_ORACLE = f"""
SELECT doc_id,
       CAST({_PPM_W} AS INT) AS width,
       4 AS height,
       CAST({_PPM_W} * 4 AS INT) AS n_pixels,
       {_ppm_channel_sum(0)} AS sum_r,
       {_ppm_channel_sum(1)} AS sum_g,
       {_ppm_channel_sum(2)} AS sum_b
FROM documents
WHERE text IS NOT NULL
"""


def ppm_resized_oracle(target_w: int, target_h: int, src_h: int = 4) -> str:
    """Decode → nearest-neighbour resize → feature oracle: output pixel
    (y, x) samples source pixel (y*src_h//target_h, x*w//target_w), whose
    channel-c byte sits at 0-based payload offset (sy*w + sx)*3 + c — a
    text byte if < length, else a zero pad byte.  Pure integer index math,
    identical to codecs.resize_nearest."""
    n = target_w * target_h

    def chan(c: int) -> str:
        sy = f"((i // {target_w}) * {src_h}) // {target_h}"
        sx = f"((i % {target_w}) * w) // {target_w}"
        p = f"(({sy}) * w + ({sx})) * 3 + {c}"
        return (
            f"CAST(COALESCE(list_sum([CASE WHEN ({p}) < length(text) "
            f"THEN ord(text[({p}) + 1]) ELSE 0 END "
            f"for i in range(0, {n})]), 0) AS BIGINT)"
        )

    return f"""
WITH b AS (
  SELECT doc_id, text, {_PPM_W} AS w FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       {target_w} AS width,
       {target_h} AS height,
       {n} AS n_pixels,
       {chan(0)} AS sum_r,
       {chan(1)} AS sum_g,
       {chan(2)} AS sum_b
FROM b
"""


WAV_ENERGY_ORACLE = """
WITH s AS (
  SELECT doc_id,
         [ord(text[2*j + 1]) + 256 * ord(text[2*j + 2])
          for j in range(0, length(text) // 2)] AS vals
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       8000 AS sample_rate,
       CAST(len(vals) AS INT) AS n_samples,
       CAST(COALESCE(list_sum(list_transform(vals,
         v -> CASE WHEN v >= 32768 THEN (v - 65536) * (v - 65536)
                   ELSE v * v END)), 0) AS BIGINT) AS energy_sq
FROM s
"""


def topk_qcos_oracle(query_mod: int, k: int) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, {sql_quantized("embedding")} AS qv
  FROM embeddings WHERE vec_id % {query_mod} = 0
), c AS (
  SELECT vec_id AS neighbor_id, {sql_quantized("embedding")} AS cv FROM embeddings
), scored AS (
  SELECT q.query_id, c.neighbor_id, {sql_qcos("qv", "cv")} AS score
  FROM c, q WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def embedding_near_dup_oracle(threshold: float) -> str:
    return f"""
WITH v AS (
  SELECT vec_id, {sql_quantized("embedding")} AS qv FROM embeddings
)
SELECT l.vec_id AS id_a, r.vec_id AS id_b, {sql_qcos("l.qv", "r.qv")} AS qcos
FROM v l JOIN v r ON l.vec_id < r.vec_id
WHERE {sql_qcos("l.qv", "r.qv")} >= {threshold}
"""


def sql_lsh_bucket(qv: str, num_planes: int, plane_offset: int = 0) -> str:
    """Mirror of similarity.lsh_bucket over an already-quantized int64
    list: integer plane components (md5-derived, [-1000, 1000]) and int64
    dot products, so the sign test — and therefore the bucket — is
    bit-identical across engines.  *plane_offset* mirrors the Spark
    side's independent-table plane sets."""
    def pdot(p: int) -> str:
        comp = (
            f"(('0x'||substr(md5('plane_{p}_' || CAST(i-1 AS VARCHAR)),1,7))::BIGINT"
            f" % 2001 - 1000)"
        )
        return f"list_sum([{qv}[i] * {comp} for i in range(1, len({qv})+1)])"

    bits = " + ".join(
        f"(CASE WHEN {pdot(plane_offset + p)} > 0 THEN {2 ** p} ELSE 0 END)"
        for p in range(num_planes)
    )
    return f"({bits})::BIGINT"


def lsh_blocked_near_dup_oracle(
    threshold: float, num_planes: int, num_tables: int = 1
) -> str:
    """Mirror of similarity.lsh_blocked_near_dup_pairs: the oracle
    recomputes the IDENTICAL deterministic blocking (integer sign-bit LSH,
    one independent plane set per table) plus the exact quantized-cosine
    verify, so the approximation itself is value-checked, not just the
    verify step.  Cross-table duplicate discoveries collapse via DISTINCT
    (qcos is deterministic, so pair rows are bit-identical per table)."""
    per_table = [
        f"""
SELECT l.vec_id AS id_a, r.vec_id AS id_b, {sql_qcos("l.qv", "r.qv")} AS qcos
FROM (SELECT vec_id, qv, {sql_lsh_bucket("qv", num_planes, t * num_planes)} AS bucket FROM v) l
JOIN (SELECT vec_id, qv, {sql_lsh_bucket("qv", num_planes, t * num_planes)} AS bucket FROM v) r
  ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE {sql_qcos("l.qv", "r.qv")} >= {threshold}
"""
        for t in range(num_tables)
    ]
    union = "\nUNION\n".join(per_table)  # UNION (not ALL): cross-table dedup
    return f"""
WITH v AS (
  SELECT vec_id, {sql_quantized("embedding")} AS qv FROM embeddings
)
{union}
"""


def sql_float_cos(a: str, b: str) -> str:
    """Float cosine mirroring similarity.cosine_similarity's fold: per-pair
    products of the raw FLOAT elements summed in list order.  Products are
    float32-rounded in both engines (Spark zip_with on float inputs ≡
    DuckDB FLOAT*FLOAT); used only where a float-path query is checked on
    id membership (score gaps ≫ float error on real data)."""
    dot = f"list_sum([{a}[i]*{b}[i] for i in range(1, len({a})+1)])"
    na = f"sqrt(list_sum([{a}[i]*{a}[i] for i in range(1, len({a})+1)]))"
    nb = f"sqrt(list_sum([{b}[i]*{b}[i] for i in range(1, len({b})+1)]))"
    return f"({dot} / ({na} * {nb}))"


def topk_float_cos_oracle(query_mod: int, k: int) -> str:
    """Float-cosine brute-force top-k (sim_topk_cosine twin) — checked on
    (query_id, neighbor_id) membership only: rank positions at the k
    boundary are separated by score gaps orders of magnitude above float
    accumulation error, while the scores themselves are not required to be
    bit-identical cross-engine."""
    return f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings WHERE vec_id % {query_mod} = 0
), c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings
), scored AS (
  SELECT q.query_id, c.neighbor_id, {sql_float_cos("qe", "ce")} AS score
  FROM c, q WHERE c.neighbor_id <> q.query_id
)
SELECT query_id, neighbor_id
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) <= {k}
"""


def lsh_bucketed_topk_oracle(query_mod: int, k: int, num_planes: int) -> str:
    """sim_lsh_bucketed_topk twin: the bucket is integer-exact (identical
    blocking recomputed), scoring is the float-cosine path — so like the
    float top-k this is checked on id membership."""
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {sql_quantized("embedding")} AS qv FROM embeddings
), b AS (
  SELECT vec_id, embedding, {sql_lsh_bucket("qv", num_planes)} AS bucket FROM v
), q AS (
  SELECT vec_id AS query_id, embedding AS qe, bucket
  FROM b WHERE vec_id % {query_mod} = 0
), scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {sql_float_cos("qe", "c.embedding")} AS score
  FROM b c JOIN q ON c.bucket = q.bucket
  WHERE c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) <= {k}
"""


def paraphrase_candidates_oracle(threshold: float, pairs_oracle: str | None = None) -> str:
    """Near-dup embedding pairs annotated with whether the two documents'
    normalized texts actually differ (paraphrase candidates).  *pairs_oracle*
    selects the pair source (default exact all-pairs; pass
    lsh_blocked_near_dup_oracle(...) for the scale path's twin)."""
    return f"""
WITH p AS ({pairs_oracle or embedding_near_dup_oracle(threshold)}),
fp AS (
  SELECT doc_id, md5(array_to_string({sql_tokens("text")}, ' ')) AS fp
  FROM documents
)
SELECT p.id_a, p.id_b, p.qcos, (fa.fp <> fb.fp) AS texts_differ
FROM p
JOIN fp fa ON p.id_a = fa.doc_id
JOIN fp fb ON p.id_b = fb.doc_id
"""


def sql_cell_rank(vec: str, qc: str) -> str:
    """Cell-ranking key dot(vec,c)/‖c‖ — same ordering as cosine for a
    fixed row (row norm is a positive constant); mirrors
    similarity._cell_score_structs."""
    return (
        f"CAST({sql_int_dot(vec, qc)} AS DOUBLE) / "
        f"sqrt(CAST({sql_int_dot(qc, qc)} AS DOUBLE))"
    )


def ivf_topk_oracle(query_mod: int, k: int, n_centroids: int, n_probe: int) -> str:
    """Mirrors similarity.ivf_topk: centroids = n lowest-id vectors,
    assignment = argmax dot/centroid-norm (ties -> lowest cell), probes =
    top n_probe cells per query, exact quantized-cosine rank inside cells."""
    return f"""
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         {sql_quantized("embedding")} AS qc
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
), c AS (
  SELECT vec_id AS neighbor_id, {sql_quantized("embedding")} AS cv FROM embeddings
), assign AS (
  SELECT neighbor_id, cv, cell FROM (
    SELECT c.neighbor_id, c.cv, cent.cell,
           row_number() OVER (PARTITION BY c.neighbor_id
                              ORDER BY {sql_cell_rank("cv", "qc")} DESC, cent.cell ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, {sql_quantized("embedding")} AS qv
  FROM embeddings WHERE vec_id % {query_mod} = 0
), probe AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cent.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cell_rank("qv", "qc")} DESC, cent.cell ASC) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= {n_probe}
), scored AS (
  SELECT p.query_id, a.neighbor_id, {sql_qcos("cv", "qv")} AS score
  FROM probe p JOIN assign a USING (cell)
  WHERE a.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def ivf_derived_refresh_oracle(
    query_mod: int, k: int, n_centroids: int, n_probe: int
) -> str:
    """Mirror of entry_training.sim_ivf_derived_refresh: the IVF index is
    BUILT pre-churn (so centroids come from the ORIGINAL corpus — frozen,
    like the maintained index's), then a single CDC commit deletes
    vec_id%10==7, negates vec_id%10==4's embedding, and inserts
    (vec_id+100000, reversed embedding) for vec_id%25==3; the search runs
    over the POST-churn corpus.  Negation and reversal are bit-exact
    float ops in both engines."""
    return f"""
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         {sql_quantized("embedding")} AS qc
  FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {n_centroids})
), corpus AS (
  SELECT vec_id,
         CASE WHEN vec_id % 10 = 4
              THEN list_transform(embedding, x -> -x)
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 10 <> 7
  UNION ALL
  SELECT vec_id + 100000, list_reverse(embedding)
  FROM embeddings WHERE vec_id % 25 = 3
), c AS (
  SELECT vec_id AS neighbor_id, {sql_quantized("embedding")} AS cv FROM corpus
), assign AS (
  SELECT neighbor_id, cv, cell FROM (
    SELECT c.neighbor_id, c.cv, cent.cell,
           row_number() OVER (PARTITION BY c.neighbor_id
                              ORDER BY {sql_cell_rank("cv", "qc")} DESC, cent.cell ASC) AS rn
    FROM c CROSS JOIN cent) WHERE rn = 1
), q AS (
  SELECT vec_id AS query_id, {sql_quantized("embedding")} AS qv
  FROM corpus WHERE vec_id % {query_mod} = 0
), probe AS (
  SELECT query_id, qv, cell FROM (
    SELECT q.query_id, q.qv, cent.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY {sql_cell_rank("qv", "qc")} DESC, cent.cell ASC) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= {n_probe}
), scored AS (
  SELECT p.query_id, a.neighbor_id, {sql_qcos("cv", "qv")} AS score
  FROM probe p JOIN assign a USING (cell)
  WHERE a.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def sql_hash_fraction(col: str, salt: str) -> str:
    """Mirror of sampling.hash_fraction: md5-derived uniform [0,1)."""
    expr = f"concat_ws('|', '{salt}', CAST({col} AS VARCHAR))"
    return f"{sql_md5_long(expr, 15)} / CAST({16 ** 15} AS DOUBLE)"


def train_test_split_oracle(test_fraction: float, salt: str) -> str:
    return f"""
SELECT doc_id,
       CASE WHEN {sql_hash_fraction("doc_id", salt)} < {test_fraction}
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def stratified_sample_oracle(
    fractions: dict[str, float], default_fraction: float, salt: str
) -> str:
    cases = " ".join(
        f"WHEN lang = '{v}' THEN CAST({p} AS DOUBLE)"
        for v, p in sorted(fractions.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {sql_hash_fraction("doc_id", salt)} <
      (CASE {cases} ELSE CAST({default_fraction} AS DOUBLE) END)
"""


def chunk_documents_oracle(chunk_tokens: int, stride: int) -> str:
    """Mirror of sampling.chunk_documents over documents."""
    return f"""
WITH base AS (
  SELECT doc_id, {sql_tokens("text")} AS w FROM documents
), st AS (
  SELECT doc_id, w, unnest(range(0, len(w), {stride})) AS s FROM base
)
SELECT doc_id,
       CAST(s // {stride} AS INT) AS chunk_id,
       CAST(len(w[s+1 : s+{chunk_tokens}]) AS INT) AS chunk_n_tokens,
       array_to_string(w[s+1 : s+{chunk_tokens}], ' ') AS chunk_text
FROM st
"""


def token_budget_oracle(key_col: str, budget: int, salt: str) -> str:
    """Mirror of sampling.token_budget_per_key over documents."""
    return f"""
WITH t AS (
  SELECT doc_id, {key_col},
         {sql_token_count("text")} AS n_tokens,
         {sql_hash_fraction("doc_id", salt)} AS hf
  FROM documents
)
SELECT doc_id, {key_col}, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(sum(n_tokens) OVER (
         PARTITION BY {key_col} ORDER BY hf, doc_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_tokens
FROM t
QUALIFY cum_tokens <= {budget}
"""


def cap_per_key_oracle(key_col: str, n: int, salt: str) -> str:
    """Mirror of sampling.cap_per_key over documents."""
    return f"""
SELECT doc_id, {key_col}, sample_rank FROM (
  SELECT doc_id, {key_col},
         row_number() OVER (
           PARTITION BY {key_col}
           ORDER BY {sql_hash_fraction("doc_id", salt)}, doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {n}
"""


def tfidf_top_terms_oracle(k: int) -> str:
    """Mirror of text.tfidf_top_terms over documents: tf/df ranking is a
    single IEEE division (identical both engines); hashed output columns
    are all integer/string."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({sql_tokens("text")}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS term_freq
  FROM toks WHERE term <> '' GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term)
SELECT doc_id, term, term_freq, doc_freq, rank FROM (
  SELECT tf.doc_id, tf.term, tf.term_freq, dfreq.doc_freq,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.term_freq AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE) DESC,
                    tf.term
         ) AS rank
  FROM tf JOIN dfreq USING (term)
) WHERE rank <= {k}
"""


def bm25_topk_oracle(
    terms: list[str],
    k: int,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """Mirror of text.bm25_topk over documents: every scoring factor is a
    ratio of exactly-representable integers (log-free Robertson idf,
    k1=6/5, b=3/4 folded into integer coefficients), each term
    contribution quantized to BIGINT before the per-doc sum — identical
    operation order to the Spark expression, so scores hash bit-equal.
    *docs_sql* swaps the corpus relation (must expose doc_id, text) —
    the maintained-index row scores against a CHURNED corpus CTE."""
    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH documents_in AS ({docs_sql}),
toks AS (
  SELECT doc_id, unnest({sql_tokens("text")}) AS term FROM documents_in
),
toks_ne AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks_ne GROUP BY doc_id),
stats AS (
  SELECT (SELECT SUM(dl) FROM dl) AS s,
         (SELECT COUNT(*) FROM documents_in) AS n
),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM toks_ne
  WHERE term IN ({terms_sql}) GROUP BY doc_id, term
),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(round(1000000.0
           * ((44.0 * stats.s * tf.tf)
              / (20.0 * stats.s * tf.tf + 6.0 * stats.s
                 + 18.0 * dl.dl * stats.n))
           * ((2.0 * stats.n - 2.0 * dfreq.df + 1.0)
              / (2.0 * dfreq.df + 1.0))
         ) AS BIGINT) AS c
  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_q,
       CAST(COUNT(*) AS BIGINT) AS n_terms
FROM contrib GROUP BY doc_id
ORDER BY score_q DESC, doc_id ASC LIMIT {k}
"""


def connected_components_oracle(pairs_sql: str) -> str:
    """Transitive closure over the (undirected) pair graph; component =
    min reachable id — exactly what min-label propagation converges to."""
    return f"""
WITH RECURSIVE
edges AS (
  SELECT id_a AS u, id_b AS v FROM ({pairs_sql})
  UNION
  SELECT id_b AS u, id_a AS v FROM ({pairs_sql})
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach(id, r) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
)
SELECT id AS doc_id, min(r) AS component FROM reach GROUP BY id
"""


def dedup_apply_oracle(pairs_sql: str) -> str:
    """Full document-level dedup: drop every doc whose component label
    differs from its own id (the cluster minimum survives; docs in no
    near-dup pair survive trivially)."""
    return f"""
WITH comp AS ({connected_components_oracle(pairs_sql)})
SELECT d.doc_id, d.lang, d.source
FROM documents d
LEFT JOIN comp c ON c.doc_id = d.doc_id
WHERE c.doc_id IS NULL OR c.component = d.doc_id
"""


def curate_pipeline_oracle(
    quality_threshold: float, test_fraction: float, salt: str
) -> str:
    """Composed curation: quality gate ∘ exact-dedup keep ∘ split — each
    stage reuses the already-verified oracle building blocks."""
    return f"""
WITH q AS ({QUALITY_ORACLE}),
k AS (SELECT keep_id AS doc_id FROM ({EXACT_DEDUP_ORACLE}))
SELECT d.doc_id, d.lang,
       CASE WHEN {sql_hash_fraction("d.doc_id", salt)} < {test_fraction}
            THEN 'test' ELSE 'train' END AS split,
       q.quality_score
FROM documents d
JOIN q USING (doc_id)
JOIN k USING (doc_id)
WHERE q.quality_score >= {quality_threshold}
"""


def pack_sequences_oracle(
    budget: int, num_shards: int, salt: str = "pack"
) -> str:
    """Mirror of sampling.pack_sequences over documents(n_tokens from
    whitespace tokenization)."""
    hashed = sql_md5_long(f"concat_ws('|', '{salt}', CAST(doc_id AS VARCHAR))", 15)
    shard = f"{hashed} % {num_shards}"
    return f"""
WITH base AS (
  SELECT doc_id, {sql_token_count("text")} AS n_tokens, {shard} AS shard
  FROM documents
), cum AS (
  SELECT doc_id, n_tokens, shard,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS bef
  FROM base
)
SELECT doc_id, n_tokens, shard,
       shard * 1000000 + (bef // {budget}) AS pack_id,
       bef - (bef // {budget}) * {budget} AS pack_offset
FROM cum
"""
