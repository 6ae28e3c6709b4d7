from .bloom import (
    bloom_contains,
    bloom_might_contain,
    bloom_partial_sketches,
    bloom_sketch,
    make_bloom_merge_agg,
    optimal_params,
)
from .kll import (
    KLL,
    kll_partial_sketches,
    kll_quantile,
    kll_sketch,
    make_kll_merge_agg,
)
from .tdigest import (
    TDigest,
    make_tdigest_merge_agg,
    tdigest_partial_sketches,
    tdigest_quantile,
    tdigest_sketch,
)
from .cms import (
    cms_partial_sketches,
    cms_point_estimate,
    cms_query,
    cms_sketch,
    make_cms_merge_agg,
)

__all__ = [
    "KLL",
    "TDigest",
    "kll_partial_sketches",
    "kll_quantile",
    "kll_sketch",
    "make_kll_merge_agg",
    "bloom_contains",
    "make_tdigest_merge_agg",
    "tdigest_partial_sketches",
    "tdigest_quantile",
    "tdigest_sketch",
    "bloom_might_contain",
    "bloom_partial_sketches",
    "bloom_sketch",
    "cms_partial_sketches",
    "cms_point_estimate",
    "cms_query",
    "cms_sketch",
    "make_bloom_merge_agg",
    "make_cms_merge_agg",
    "optimal_params",
]
