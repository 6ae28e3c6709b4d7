from .ann import (
    cosine_topk_blocked,
    cosine_topk_bruteforce,
    ivf_topk,
    kmeans_centroids,
    sign_lsh_buckets,
)
from .dedup import (
    dedup_exact,
    dedup_exact_keep,
    dedup_minhash,
    embedding_near_dup_pairs,
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    simhash_near_dup_pairs,
)
from .multimodal import extract_features, make_fake_media_df, resize_images, sample_frames
from .sessions import session_stats, sessionize

__all__ = [
    "cosine_topk_blocked",
    "cosine_topk_bruteforce",
    "dedup_exact",
    "dedup_exact_keep",
    "dedup_minhash",
    "embedding_near_dup_pairs",
    "extract_features",
    "ivf_topk",
    "kmeans_centroids",
    "make_fake_media_df",
    "minhash_candidate_pairs",
    "ngram_jaccard_pairs",
    "resize_images",
    "sample_frames",
    "session_stats",
    "sessionize",
    "sign_lsh_buckets",
    "simhash_near_dup_pairs",
]
