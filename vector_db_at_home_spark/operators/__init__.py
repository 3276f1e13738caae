from .ann import ivf_build, ivf_load, ivf_save, ivf_search, recall_at_k
from .dedup import (
    cosine_neardup_bucketed,
    cosine_topk_pairs,
    cosine_topk_pairs_blocked,
    cross_corpus_contamination,
    decontaminate,
    exact_dedup,
    hyperplane_bucket_candidates,
    exact_dedup_stats,
    minhash_lsh_pairs,
    minhash_lsh_pairs_incremental,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from .featurize import (
    hash_embed_selfsearch,
    hashing_embed,
    hashing_embed_sparse,
)
from .bq import (
    binary_encode,
    bq_load,
    bq_save,
    bq_search,
    bq_sync_with_store,
    bq_topk,
    hamming_distance,
)
from .fuzzysearch import fuzzy_search_by_doc
from .hybrid import hybrid_search_rrf
from .knn import knn_join_blocked, knn_join_payload, knn_search, range_search
from .maintenance import (
    compact_saved_table,
    ivf_compact_saved,
    ivfsq_compact_saved,
    pq_compact_saved,
)
from .pq import ivfpq_search, pq_build, pq_load, pq_save, pq_search
from .sampling import (
    hash_sample,
    hash_split,
    mixture_resample,
    pack_documents,
    stratified_hash_sample,
)
from .skew import salted_aggregate, salted_broadcast_left
from .sq import (
    ivfsq_append,
    ivfsq_build,
    ivfsq_load,
    ivfsq_save,
    ivfsq_search,
    ivfsq_sync_with_store,
)
from .temporal import asof_join, range_join_binned
from .topk import top_k_per_group

__all__ = [
    "asof_join",
    "binary_encode",
    "bq_load",
    "bq_save",
    "bq_search",
    "bq_sync_with_store",
    "bq_topk",
    "hamming_distance",
    "range_search",
    "cosine_neardup_bucketed",
    "cosine_topk_pairs",
    "cosine_topk_pairs_blocked",
    "cross_corpus_contamination",
    "decontaminate",
    "exact_dedup",
    "hyperplane_bucket_candidates",
    "exact_dedup_stats",
    "fuzzy_search_by_doc",
    "hash_sample",
    "hash_split",
    "ivf_build",
    "ivf_load",
    "ivf_save",
    "ivfpq_search",
    "ivf_search",
    "ivfsq_append",
    "ivfsq_build",
    "ivfsq_load",
    "ivfsq_save",
    "ivfsq_search",
    "ivfsq_sync_with_store",
    "hybrid_search_rrf",
    "hash_embed_selfsearch",
    "hashing_embed",
    "hashing_embed_sparse",
    "knn_join_blocked",
    "knn_join_payload",
    "compact_saved_table",
    "ivf_compact_saved",
    "ivfsq_compact_saved",
    "pq_compact_saved",
    "knn_search",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_incremental",
    "mixture_resample",
    "ngram_jaccard_pairs",
    "pack_documents",
    "pq_build",
    "pq_load",
    "pq_save",
    "pq_search",
    "range_join_binned",
    "recall_at_k",
    "salted_aggregate",
    "salted_broadcast_left",
    "simhash_pairs",
    "top_k_per_group",
]
