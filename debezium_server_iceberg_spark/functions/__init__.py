from .curation import (
    global_rank,
    gopher_rules,
    kmeans_lloyd_step,
    length_histogram,
    segment_dedup,
    temperature_mixture,
    unigram_logprob_score,
)
from .dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    minhash_signatures,
    simhash32,
    simhash64,
    simhash_near_dup_pairs,
)
from .multimodal import (
    as_binary_items,
    audio_features,
    frame_sample,
    image_features,
    resize_images,
)
from .similarity import cosine_pairs_blocked, cosine_topk, ivf_topk, lsh_bucketed_topk
from .text import (
    bpe_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    tokens_col,
    with_token_stats,
)

__all__ = [
    "tokens_col",
    "with_token_stats",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "bpe_token_count",
    "exact_dedup",
    "minhash_signatures",
    "minhash_near_dup_pairs",
    "simhash32",
    "simhash64",
    "simhash_near_dup_pairs",
    "cosine_topk",
    "cosine_pairs_blocked",
    "ivf_topk",
    "lsh_bucketed_topk",
    "as_binary_items",
    "image_features",
    "resize_images",
    "audio_features",
    "frame_sample",
    "segment_dedup",
    "gopher_rules",
    "temperature_mixture",
    "length_histogram",
    "kmeans_lloyd_step",
    "global_rank",
    "unigram_logprob_score",
]
