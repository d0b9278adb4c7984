from tdataframe_spark.ops.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64,
)
from tdataframe_spark.ops.similarity import cosine_topk

__all__ = [
    "exact_dedup_groups",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash64",
    "cosine_topk",
]
