"""Scale-path data-pipeline operators (LLM training-data prep) —
DataFrame→DataFrame, no driver materialization, composable at 100 TB.

These extend the reference's surface (which stops at scan/merge,
SURVEY §2.5) with the dedup / similarity / text / multimodal operators a
training-data pipeline needs. Design rules:

- hashing is md5-based (identical across engines → DuckDB-oracle-able),
- thresholds use integer cross-multiplication, not float division,
- every op is shuffle-conscious: LSH banding replaces all-pairs joins,
  per-row sequential float reductions keep results deterministic.
"""

from paimon_python_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    ngram_containment_pairs,
    minhash_containment_pairs,
    simhash_fingerprints,
    embedding_cosine_pairs,
    embedding_cosine_pairs_lsh,
    connected_components,
    duplicated_spans,
    contaminated_spans,
    excise_spans,
    fuzzy_dedup_survivors,
)
from paimon_python_spark.operators.sampling import (
    hash_sample,
    train_val_test_split,
    stratified_hash_sample,
    split_column,
    weighted_mix_sample,
    token_budget_mix,
    temperature_mix_rates,
    temperature_mix_sample,
    topn_per_group,
)
from paimon_python_spark.operators.packing import pack_concat_chunks
from paimon_python_spark.operators.skew import (
    with_salt,
    salted_join,
    exact_distinct_per_key,
)
from paimon_python_spark.operators.joins import binned_interval_join
from paimon_python_spark.operators._cache import (
    cache_scope,
    release_cached,
    shared,
)
from paimon_python_spark.operators.similarity import (
    assign_cells,
    cosine_similarity_col,
    brute_force_topk,
    lsh_bucket_topk,
    ivf_topk,
    kmeans_fit,
    kmeans_fit_mirror,
    hyperplane_signs,
    hyperplane_buckets_matmul,
    assign_cells_matmul,
    label_centroids,
    pq_codebooks_from_rows,
    pq_encode,
    pq_adc_topk,
    pq_rerank_topk,
    semantic_dedup,
    vector_quality_audit,
    prototypicality,
)

__all__ = [
    "exact_dedup",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_lsh",
    "connected_components",
    "duplicated_spans",
    "contaminated_spans",
    "excise_spans",
    "fuzzy_dedup_survivors",
    "assign_cells",
    "cosine_similarity_col",
    "brute_force_topk",
    "lsh_bucket_topk",
    "ivf_topk",
    "kmeans_fit",
    "kmeans_fit_mirror",
    "label_centroids",
    "hyperplane_signs",
    "hyperplane_buckets_matmul",
    "assign_cells_matmul",
    "pq_codebooks_from_rows",
    "pq_encode",
    "pq_adc_topk",
    "pq_rerank_topk",
    "semantic_dedup",
    "vector_quality_audit",
    "prototypicality",
    "hash_sample",
    "train_val_test_split",
    "stratified_hash_sample",
    "split_column",
    "weighted_mix_sample",
    "token_budget_mix",
    "temperature_mix_rates",
    "temperature_mix_sample",
    "topn_per_group",
    "pack_concat_chunks",
    "ngram_containment_pairs",
    "minhash_containment_pairs",
    "with_salt",
    "salted_join",
    "exact_distinct_per_key",
    "binned_interval_join",
    "cache_scope",
    "release_cached",
    "shared",
]
