from .shingles import normalize_text, char_shingles, word_shingles, shingle_fn
from .kernels import hash_matrix, min_sketch_batch

__all__ = [
    "normalize_text",
    "char_shingles",
    "word_shingles",
    "shingle_fn",
    "hash_matrix",
    "min_sketch_batch",
]
