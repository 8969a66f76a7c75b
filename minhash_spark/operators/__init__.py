from .signatures import with_minhash_signature
from .lsh import bands_table, candidate_pairs
from .verify import estimate_jaccard, verify_pairs
from .cluster import connected_components
from .exact import exact_dup_groups, dedup_exact

__all__ = [
    "with_minhash_signature",
    "bands_table",
    "candidate_pairs",
    "estimate_jaccard",
    "verify_pairs",
    "connected_components",
    "exact_dup_groups",
    "dedup_exact",
]
