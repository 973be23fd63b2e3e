from vamana_spark.functions.vector import (
    as_double_array,
    cosine_distance,
    dot_product,
    l2_distance,
    l2_norm,
    pairwise_distance,
    squared_l2,
)

__all__ = [
    "as_double_array",
    "cosine_distance",
    "dot_product",
    "l2_distance",
    "l2_norm",
    "pairwise_distance",
    "squared_l2",
]
