from .text import (
    tokens_col,
    with_token_stats,
    language_id,
    quality_score,
    doc_fingerprint,
)
from .dedup import exact_dedup, minhash_signatures, minhash_near_dup_pairs, simhash32
from .similarity import cosine_topk

__all__ = [
    "tokens_col",
    "with_token_stats",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash32",
    "cosine_topk",
]
