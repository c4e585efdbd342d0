from laion_spark.operators.dedup import (
    exact_dedup,
    fingerprint,
    jaccard_similar_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    shared_window_pairs,
    shingles,
    simhash,
)
from laion_spark.operators.knn import knn_search, knn_search_parquet, topk_by_score
from laion_spark.operators.prefix import global_prefix_sum
from laion_spark.operators.similarity import (
    IVFIndex,
    RandomHyperplaneIndex,
    embedding_near_dup_pairs,
    knn_join,
)

__all__ = [
    "IVFIndex",
    "RandomHyperplaneIndex",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "fingerprint",
    "global_prefix_sum",
    "jaccard_similar_pairs",
    "knn_join",
    "knn_search",
    "knn_search_parquet",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "shared_window_pairs",
    "shingles",
    "simhash",
    "topk_by_score",
]
