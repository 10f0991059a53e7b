from anser_spark.operators.text import (
    with_token_count,
    with_quality_score,
    with_language_id,
    with_fingerprint,
    text_stats,
    text_profile,
)
from anser_spark.operators.dedup import (
    exact_dedup,
    minhash_signature,
    minhash_near_dup_pairs,
    minhash_dedup,
    with_simhash,
    ngram_jaccard_pairs,
    connected_components,
    dedup_clusters,
)
from anser_spark.operators.similarity import (
    cosine_top_k,
    with_norm,
    lsh_bucket_candidates,
    embedding_near_dup_pairs,
)
from anser_spark.operators.packing import pack_sequences
from anser_spark.operators.corpus import (
    hash_split,
    contaminated_pairs,
    decontaminate,
)
from anser_spark.operators.ranking import bm25_score, bm25_top_k, rank_fusion
from anser_spark.operators.quantize import (
    quantize_embeddings,
    quantization_report,
    quantized_cosine_top_k,
)

__all__ = [
    "with_token_count",
    "with_quality_score",
    "with_language_id",
    "with_fingerprint",
    "text_stats",
    "text_profile",
    "exact_dedup",
    "minhash_signature",
    "minhash_near_dup_pairs",
    "minhash_dedup",
    "with_simhash",
    "ngram_jaccard_pairs",
    "connected_components",
    "dedup_clusters",
    "cosine_top_k",
    "with_norm",
    "lsh_bucket_candidates",
    "embedding_near_dup_pairs",
    "pack_sequences",
    "hash_split",
    "contaminated_pairs",
    "decontaminate",
    "bm25_score",
    "bm25_top_k",
    "rank_fusion",
    "quantize_embeddings",
    "quantization_report",
    "quantized_cosine_top_k",
]
