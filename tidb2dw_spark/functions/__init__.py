from .text import (
    tokenize,
    token_count,
    regex_token_count,
    lang_id,
    quality_features,
    doc_fingerprint,
)
from .dedup import (
    exact_dedup,
    minhash_signature,
    minhash_lsh_pairs,
    simhash,
    simhash_dup_pairs,
    ngram_jaccard_pairs,
)
from .sampling import (
    hash_fraction,
    stratified_sample,
    train_test_split,
)
from .similarity import (
    dot_product,
    cosine_similarity,
    quantized_cosine,
    embedding_near_dup_pairs,
    brute_force_topk,
    ivf_topk,
    lsh_bucketed_topk,
)

__all__ = [
    "tokenize",
    "token_count",
    "regex_token_count",
    "lang_id",
    "quality_features",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "ngram_jaccard_pairs",
    "hash_fraction",
    "stratified_sample",
    "train_test_split",
    "dot_product",
    "cosine_similarity",
    "brute_force_topk",
    "ivf_topk",
    "lsh_bucketed_topk",
]
