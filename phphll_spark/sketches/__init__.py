from .bloom import (
    bloom_contains,
    bloom_might_contain,
    bloom_partial_sketches,
    bloom_sketch,
    make_bloom_merge_agg,
    optimal_params,
)
from .cms import (
    cms_partial_sketches,
    cms_point_estimate,
    cms_query,
    cms_sketch,
    make_cms_merge_agg,
)

__all__ = [
    "bloom_contains",
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
