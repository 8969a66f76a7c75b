from .signatures import with_minhash_signature
from .lsh import bands_table, candidate_pairs, bucket_stats
from .verify import estimate_jaccard, verify_pairs
from .cluster import connected_components
from .cluster_twostar import connected_components_twostar
from .exact import exact_dup_groups, dedup_exact
from .simhash import with_simhash, simhash_candidates
from .substring import containment_candidates, verify_containment, substring_dedup
from .similarity import (
    cosine_pairs,
    brute_force_topk,
    srp_cosine_pairs,
    ivf_topk,
    train_ivf_centroids,
    trained_ivf_topk,
)
from .ngram import ngrams_col, jaccard_col, ngram_jaccard_pairs
from .text import token_count, with_quality_score, with_lang_id, with_fingerprint
from .multimodal import extract_media_features, decode_media, fake_decode

__all__ = [
    "with_minhash_signature",
    "bands_table",
    "candidate_pairs",
    "bucket_stats",
    "estimate_jaccard",
    "verify_pairs",
    "connected_components",
    "connected_components_twostar",
    "exact_dup_groups",
    "dedup_exact",
    "with_simhash",
    "simhash_candidates",
    "containment_candidates",
    "verify_containment",
    "substring_dedup",
    "cosine_pairs",
    "brute_force_topk",
    "srp_cosine_pairs",
    "ivf_topk",
    "train_ivf_centroids",
    "trained_ivf_topk",
    "ngrams_col",
    "jaccard_col",
    "ngram_jaccard_pairs",
    "token_count",
    "with_quality_score",
    "with_lang_id",
    "with_fingerprint",
    "extract_media_features",
    "decode_media",
    "fake_decode",
]
